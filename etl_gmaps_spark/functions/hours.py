"""Open-hours / popular-times map builders (SURVEY.md F9/F10).

The reference folds positional arrays into Go maps per place:
``getHours`` → map[day][]times (gmaps/entry.go:498-517) and
``getPopularTimes`` → map[day]map[hour]busy (gmaps/entry.go:519-568).
Spark-first: ``map_from_entries`` over ``transform`` lambdas — real
``MapType`` output, pure Catalyst expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DAY_NAMES = ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")


def day_name_expr(day_num: Column) -> Column:
    """1=Monday .. 7=Sunday (the dayOfWeek map, gmaps/entry.go:523-531)."""
    return F.element_at(F.array(*[F.lit(d) for d in DAY_NAMES]), day_num.cast("int"))


def hours_map(items: Column) -> Column:
    """F9: array<struct<day:string, times:array<string>>> →
    map<string, array<string>> (getHours, gmaps/entry.go:498-517)."""
    return F.map_from_entries(items)


def popular_times_map(items: Column) -> Column:
    """F10: array<struct<day:int, times:array<struct<hour:int,busy:int>>>>
    → map<string, map<int,int>> keyed by day NAME — the exact nested
    shape of getPopularTimes (gmaps/entry.go:519-568)."""
    return F.map_from_entries(
        F.transform(
            items,
            lambda it: F.struct(
                day_name_expr(it["day"]).alias("key"),
                F.map_from_entries(it["times"]).alias("value"),
            ),
        )
    )


def _sort_by_key(entries: Column) -> Column:
    """array_sort with a key-only comparator: map values (maps/arrays)
    are not orderable types, so the default struct ordering fails —
    keys are unique in a map, so comparing keys alone is total."""
    return F.array_sort(
        entries,
        lambda l, r: F.when(l["key"] < r["key"], -1).when(l["key"] > r["key"], 1).otherwise(0),
    )


def canonical_map_string(m: Column) -> Column:
    """Deterministic rendering of map<string, map<int,int>> for oracle
    hashing: entries sorted by day, inner by hour —
    'Monday:0=5,1=7;Tuesday:...'. Derived FROM the map column itself
    (map_entries), so the MapType genuinely materializes in the plan."""
    inner = lambda mv: F.array_join(  # noqa: E731
        F.transform(
            _sort_by_key(F.map_entries(mv)),
            lambda e: F.concat_ws("=", e["key"].cast("string"), e["value"].cast("string")),
        ),
        ",",
    )
    return F.array_join(
        F.transform(
            _sort_by_key(F.map_entries(m)),
            lambda e: F.concat_ws(":", e["key"], inner(e["value"])),
        ),
        ";",
    )


def canonical_hours_string(m: Column) -> Column:
    """Deterministic rendering of map<string, array<string>>:
    'Friday:08-17|18-20;Monday:...' (days sorted, times in order)."""
    return F.array_join(
        F.transform(
            _sort_by_key(F.map_entries(m)),
            lambda e: F.concat_ws(":", e["key"], F.array_join(e["value"], "|")),
        ),
        ";",
    )
