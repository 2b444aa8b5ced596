"""Positional-path projection of untyped nested JSON (SURVEY.md P1/P2/X2).

The reference's core parser projects a 33-field struct out of untyped
nested JSON arrays via positional paths with a null-safe walker
(`getNthElementAndCast`, gmaps/entry.go:570-611) wrapped in a
panic-recover (entry.go:264-270). Here: the walker is a plain Python
helper, the whole-row projection is ONE Arrow-batched pandas UDF over
mapInPandas (one Python roundtrip per batch, not per field), and the
recover path emits a null row plus an _error column (dead-letter
analog, T5) instead of failing the job.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def get_nth(obj: Any, *idx: int) -> Any:
    """Null-safe positional walk: any miss (short array, non-array,
    None) returns None — the zero-value semantics of
    getNthElementAndCast (reference gmaps/entry.go:570-611)."""
    cur = obj
    for i in idx:
        if not isinstance(cur, list) or i >= len(cur) or i < -len(cur):
            return None
        cur = cur[i]
    return cur


# field -> (positional path, cast)
ENTRY_PATHS: dict[str, tuple[tuple[int, ...], type]] = {
    "title": ((1, 0), str),
    "category": ((1, 1, 0), str),
    "rating": ((2, 0), float),
    "review_count": ((2, 1), int),
    "lat": ((3, 0), float),
    "lon": ((3, 1), float),
}

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("rating", T.DoubleType(), True),
        T.StructField("review_count", T.LongType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("_error", T.StringType(), True),
    ]
)


def _cast(val: Any, typ: type) -> Any:
    if val is None:
        return None
    try:
        return typ(val)
    except (TypeError, ValueError):
        return None


def parse_entries(df: DataFrame, raw_col: str = "raw", keep_cols: list[str] | None = None) -> DataFrame:
    """P2: raw JSON blob column → typed entry struct, Arrow-batched.

    Rows that fail to parse produce all-null fields + _error (the
    panic-recover path) — quarantine them downstream, never crash the
    batch."""
    keep_cols = keep_cols or []
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep_cols] + ENTRY_SCHEMA.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # iterate raw python lists, not pdf.iterrows(): iterrows builds a
        # Series per row (~10x slower than the json parse itself)
        for pdf in batches:
            rows = []
            base_vals = [pdf[c].tolist() for c in keep_cols]
            for i, raw in enumerate(pdf[raw_col].tolist()):
                base = {c: vals[i] for c, vals in zip(keep_cols, base_vals)}
                try:
                    obj = json.loads(raw)
                    rows.append(
                        base
                        | {
                            f: _cast(get_nth(obj, *path), typ)
                            for f, (path, typ) in ENTRY_PATHS.items()
                        }
                        | {"_error": None}
                    )
                except Exception as exc:  # recover: null row + error
                    rows.append(
                        base | {f: None for f in ENTRY_PATHS} | {"_error": str(exc)[:200]}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------
# Full nested Entry projection (closes SURVEY.md P2; VERDICT r2 #4)
# ---------------------------------------------------------------------

_DAY_NAMES = {
    1: "Monday", 2: "Tuesday", 3: "Wednesday", 4: "Thursday",
    5: "Friday", 6: "Saturday", 7: "Sunday",
}

LINK_SOURCE_T = T.StructType(
    [T.StructField("link", T.StringType()), T.StructField("source", T.StringType())]
)
REVIEW_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("profile_picture", T.StringType()),
        T.StructField("rating", T.LongType()),
        T.StructField("description", T.StringType()),
        T.StructField("images", T.ArrayType(T.StringType())),
        T.StructField("when", T.StringType()),
    ]
)

# the complete Entry struct (reference gmaps/entry.go:59-96), re-typed
# as real Spark nested types: maps are MapType (not JSON strings),
# collections ArrayType<Struct>
FULL_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("link", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("category", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("open_hours", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField(
            "popular_times", T.MapType(T.StringType(), T.MapType(T.IntegerType(), T.IntegerType()))
        ),
        T.StructField("web_site", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("plus_code", T.StringType()),
        T.StructField("review_count", T.LongType()),
        T.StructField("review_rating", T.DoubleType()),
        T.StructField("reviews_per_rating", T.MapType(T.IntegerType(), T.IntegerType())),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("status", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("reviews_link", T.StringType()),
        T.StructField("thumbnail", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("price_range", T.StringType()),
        T.StructField("data_id", T.StringType()),
        T.StructField("cid", T.StringType()),
        T.StructField(
            "images",
            T.ArrayType(
                T.StructType(
                    [T.StructField("title", T.StringType()), T.StructField("image", T.StringType())]
                )
            ),
        ),
        T.StructField("reservations", T.ArrayType(LINK_SOURCE_T)),
        T.StructField("order_online", T.ArrayType(LINK_SOURCE_T)),
        T.StructField("menu", LINK_SOURCE_T),
        T.StructField(
            "owner",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("link", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "complete_address",
            T.StructType(
                [
                    T.StructField("borough", T.StringType()),
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("postal_code", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("country", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "about",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "options",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType()),
                                        T.StructField("enabled", T.BooleanType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("user_reviews", T.ArrayType(REVIEW_T)),
        T.StructField("_error", T.StringType()),
    ]
)

_FULL_FIELDS = [f.name for f in FULL_ENTRY_SCHEMA.fields if f.name != "_error"]


def _s(val: Any) -> str | None:
    return val if isinstance(val, str) else None


def _f(val: Any) -> float | None:
    return float(val) if isinstance(val, (int, float)) and not isinstance(val, bool) else None


def _i(val: Any) -> int | None:
    f = _f(val)
    return int(f) if f is not None else None


def _link_source(arr: Any, link: tuple[int, ...], source: tuple[int, ...]) -> list[dict]:
    """getLinkSource (entry.go:479-496): entries with an empty link OR
    source are dropped."""
    out = []
    for item in arr if isinstance(arr, list) else []:
        el = {"link": _s(get_nth(item, *link)) if link else _s(item),
              "source": _s(get_nth(item, *source))}
        if el["link"] and el["source"]:
            out.append(el)
    return out


def _hours(darray: list) -> dict | None:
    """getHours (entry.go:498-517): (34,1) items of [day, [times...]]."""
    items = get_nth(darray, 34, 1)
    if not isinstance(items, list):
        return None
    hours = {}
    for item in items:
        day = _s(get_nth(item, 0))
        times_i = get_nth(item, 1)
        times = [t if isinstance(t, str) else None for t in times_i] if isinstance(times_i, list) else []
        if day is not None:
            hours[day] = times
    return hours


def _popular_times(darray: list) -> dict | None:
    """getPopularTimes (entry.go:519-565): (84,0) items of
    [day_int, [[hour, traffic], ...]]; any malformed item nils the map."""
    items = get_nth(darray, 84, 0)
    if not isinstance(items, list):
        return None
    out = {}
    for it in items:
        if not isinstance(it, list):
            return None
        day = _i(get_nth(it, 0))
        if day is None or not 1 <= day <= 7:
            return None  # malformed/out-of-range day nils the map
        times_i = get_nth(it, 1)
        times = {}
        for t in times_i if isinstance(times_i, list) else []:
            if not isinstance(t, list):
                return None
            h, v = _i(get_nth(t, 0)), _i(get_nth(t, 1))
            if h is None or v is None:
                return None
            times[h] = v
        out[_DAY_NAMES[day]] = times
    return out


def _about(darray: list) -> list[dict]:
    """About sections (entry.go:389-413): (100,1) of [id, name, opts];
    an option is kept only when its name is non-empty; enabled is
    (j,2,1,0,0) == 1."""
    out = []
    for el in get_nth(darray, 100, 1) or []:
        opts = []
        for opt in get_nth(el, 2) or []:
            name = _s(get_nth(opt, 1))
            if name:
                opts.append({"name": name, "enabled": _f(get_nth(opt, 2, 1, 0, 0)) == 1.0})
        out.append({"id": _s(get_nth(el, 0)), "name": _s(get_nth(el, 1)), "options": opts})
    return out


def parse_reviews(reviews_i: Any) -> list[dict]:
    """parseReviews (entry.go:427-471): review rows under each (i,0);
    rows with an empty name are dropped; image urls strip their 2-char
    prefix; `when` is 'y-m-d' from a deep positional time triple."""
    out = []
    for i in range(len(reviews_i) if isinstance(reviews_i, list) else 0):
        el = get_nth(reviews_i, i, 0)
        name = _s(get_nth(el, 1, 4, 5, 0))
        if not name:
            continue
        t = get_nth(el, 2, 2, 0, 1, 21, 6, 8)
        when = None
        if isinstance(t, list) and len(t) >= 3:
            when = "-".join(str(int(x)) if isinstance(x, (int, float)) else str(x) for x in t[:3])
        images = []
        for j in range(len(get_nth(el, 2, 2, 0, 1, 21, 7) or [])):
            val = _s(get_nth(el, 2, 2, 0, 1, 21, 7, j))
            if val:
                images.append(val[2:])
        from urllib.parse import unquote

        pp = _s(get_nth(el, 1, 4, 5, 1))
        out.append(
            {
                "name": name,
                "profile_picture": unquote(pp) if pp else None,
                "rating": _i(get_nth(el, 2, 0, 0)),
                "description": _s(get_nth(el, 2, 15, 0, 0)),
                "images": images,
                "when": when,
            }
        )
    return out


def extract_reviews(raw: str | bytes) -> list[dict]:
    """extractReviews (entry.go:246-260): the extra-reviews page parse —
    strip the `)]}'` security prefix, reviews live at jd[2]."""
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", errors="replace")
    if raw.startswith(")]}'"):
        raw = raw[4:]
    try:
        jd = json.loads(raw)
    except Exception:
        return []
    return parse_reviews(get_nth(jd, 2))


def entry_from_json(raw: str) -> dict:
    """The full EntryFromJSON projection (entry.go:263-425), positional
    path for positional path, over one raw blob. Returns a dict shaped
    like FULL_ENTRY_SCHEMA (minus _error). Missing paths yield None
    (the Go zero values "" / 0 render identically through the CSV/JSON
    sinks)."""
    jd = json.loads(raw)
    if not isinstance(jd, list) or len(jd) < 7:
        raise ValueError("invalid json")
    darray = jd[6]
    if not isinstance(darray, list):
        raise ValueError("invalid json")

    title = _s(get_nth(darray, 11))
    categories = [
        c if isinstance(c, str) else None for c in (get_nth(darray, 13) or [])
    ]
    raw_addr = _s(get_nth(darray, 18)) or ""
    prefix = (title or "") + ","
    address = raw_addr[len(prefix):].strip() if raw_addr.startswith(prefix) else raw_addr.strip()

    owner_id = _s(get_nth(darray, 57, 2))
    order_online_arr = get_nth(darray, 75, 0, 1, 2)
    if not order_online_arr:
        order_online_arr = get_nth(darray, 75, 0, 0, 2)  # fallback layout

    return {
        "link": _s(get_nth(darray, 27)),
        "title": title,
        "categories": categories,
        "category": categories[0] if categories else None,
        "address": address or None,
        "open_hours": _hours(darray),
        "popular_times": _popular_times(darray),
        "web_site": _s(get_nth(darray, 7, 0)),
        "phone": _s(get_nth(darray, 178, 0, 0)),
        "plus_code": _s(get_nth(darray, 183, 2, 2, 0)),
        "review_count": _i(get_nth(darray, 4, 8)),
        "review_rating": _f(get_nth(darray, 4, 7)),
        "reviews_per_rating": {
            k: _i(get_nth(darray, 175, 3, k - 1)) or 0 for k in (1, 2, 3, 4, 5)
        },
        "latitude": _f(get_nth(darray, 9, 2)),
        "longitude": _f(get_nth(darray, 9, 3)),
        "status": _s(get_nth(darray, 34, 4, 4)),
        "description": _s(get_nth(darray, 32, 1, 1)),
        "reviews_link": _s(get_nth(darray, 4, 3, 0)),
        "thumbnail": _s(get_nth(darray, 72, 0, 1, 6, 0)),
        "timezone": _s(get_nth(darray, 30)),
        "price_range": _s(get_nth(darray, 4, 2)),
        "data_id": _s(get_nth(darray, 10)),
        "cid": _s(get_nth(jd, 25, 3, 0, 13, 0, 0, 1)),
        "images": [
            {"title": it["source"], "image": it["link"]}
            for it in _link_source(get_nth(darray, 171, 0), (3, 0, 6, 0), (2,))
        ],
        "reservations": _link_source(get_nth(darray, 46), (0,), (1,)),
        "order_online": _link_source(order_online_arr, (1, 2, 0), (0, 0)),
        "menu": {"link": _s(get_nth(darray, 38, 0)), "source": _s(get_nth(darray, 38, 1))},
        "owner": {
            "id": owner_id,
            "name": _s(get_nth(darray, 57, 1)),
            "link": f"https://www.google.com/maps/contrib/{owner_id}" if owner_id else None,
        },
        "complete_address": {
            "borough": _s(get_nth(darray, 183, 1, 0)),
            "street": _s(get_nth(darray, 183, 1, 1)),
            "city": _s(get_nth(darray, 183, 1, 3)),
            "postal_code": _s(get_nth(darray, 183, 1, 4)),
            "state": _s(get_nth(darray, 183, 1, 5)),
            "country": _s(get_nth(darray, 183, 1, 6)),
        },
        "about": _about(darray),
        # EntryFromJSON deliberately leaves UserReviews EMPTY (entry.go:
        # 422 allocates capacity len(reviewsI) but parses nothing); the
        # extra-reviews pages go through extract_reviews/parse_reviews
        "user_reviews": [],
    }


def parse_full_entries(
    df: DataFrame, raw_col: str = "raw", keep_cols: list[str] | None = None
) -> DataFrame:
    """P2 complete: raw blob column → the FULL nested Entry row, one
    Arrow-batched mapInPandas pass (never per-field Python roundtrips).
    Parse failures produce a null row + _error (panic-recover analog,
    entry.go:264-270) — dead-letter them downstream, never crash."""
    keep_cols = keep_cols or []
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep_cols] + FULL_ENTRY_SCHEMA.fields
    )
    names = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            base_vals = [pdf[c].tolist() for c in keep_cols]
            for i, raw in enumerate(pdf[raw_col].tolist()):
                base = {c: vals[i] for c, vals in zip(keep_cols, base_vals)}
                try:
                    rows.append(base | entry_from_json(raw) | {"_error": None})
                except Exception as exc:
                    rows.append(
                        base | {f: None for f in _FULL_FIELDS} | {"_error": str(exc)[:200]}
                    )
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(run, schema=out_schema)
