"""User-selected column projection with dependency closure (P10).

The reference lets a user pick output columns in the UI, then silently
widens the selection with every column those picks depend on before
projecting (0_AGENTE_GOSOM/src/core_logic.py:356-405): the origin-city
column is always kept, selecting the raw ``complete_address`` blob
pulls in all parsed address-part columns, and latitude/longitude are
paired (selecting one forces the other). Order is preserved and
duplicates collapse; columns absent from the frame are dropped from
the selection, and if nothing survives an empty frame with the
requested column names is returned.

Spark-first: the closure is pure driver-side list algebra over
``df.columns``; the projection itself is a single ``df.select`` so
Catalyst prunes the scan to exactly the closed set (``ReadSchema`` in
the physical plan shows only these columns reach the parquet reader —
at 100 TB the closure IS the column-pruning contract).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference defaults (core_logic.py:361-368): the parsed address parts
# forced in by selecting the raw address blob, and the paired geo cols
ADDRESS_PARTS = ["street", "city", "state", "zip", "country"]
DEFAULT_GROUPS: Mapping[str, Sequence[str]] = {"complete_address": ADDRESS_PARTS}
DEFAULT_PAIRS: Sequence[tuple[str, str]] = [("latitude", "longitude")]
DEFAULT_ALWAYS: Sequence[str] = ["search_origin_city"]


def closure_columns(
    selected: Sequence[str],
    *,
    always: Sequence[str] = DEFAULT_ALWAYS,
    groups: Mapping[str, Sequence[str]] = DEFAULT_GROUPS,
    pairs: Sequence[tuple[str, str]] = DEFAULT_PAIRS,
) -> list[str]:
    """Widen ``selected`` with its dependency closure, preserving order.

    Rules mirror core_logic.py:372-392: append ``always`` columns not
    already picked, expand each selected group key with its members,
    and complete any half-selected pair. Iterates to a fixed point so
    a group member may itself be a pair element.
    """
    cols = list(dict.fromkeys(selected))
    changed = True
    while changed:
        changed = False
        for c in always:
            if c not in cols:
                cols.append(c)
                changed = True
        for key, members in groups.items():
            if key in cols:
                for m in members:
                    if m not in cols:
                        cols.append(m)
                        changed = True
        for a, b in pairs:
            if a in cols and b not in cols:
                cols.append(b)
                changed = True
            if b in cols and a not in cols:
                cols.append(a)
                changed = True
    return cols


def project_columns(
    df: DataFrame,
    selected: Sequence[str],
    *,
    always: Sequence[str] = DEFAULT_ALWAYS,
    groups: Mapping[str, Sequence[str]] = DEFAULT_GROUPS,
    pairs: Sequence[tuple[str, str]] = DEFAULT_PAIRS,
) -> DataFrame:
    """Project ``df`` to the dependency closure of ``selected``.

    Columns in the closure but absent from ``df`` are dropped
    (core_logic.py:397); if nothing survives, an empty frame with the
    requested names (string-typed) is returned (core_logic.py:399-402).
    """
    cols = closure_columns(selected, always=always, groups=groups, pairs=pairs)
    existing = [c for c in cols if c in df.columns]
    if not existing:
        return df.sparkSession.createDataFrame(
            [], ", ".join(f"`{c}` string" for c in cols)
        )
    return df.select(*existing)


def with_origin_city(df: DataFrame, city: str) -> DataFrame:
    """Stamp the capitalized search-origin city (core_logic.py:356)."""
    return df.withColumn("search_origin_city", F.lit(city.capitalize()))
