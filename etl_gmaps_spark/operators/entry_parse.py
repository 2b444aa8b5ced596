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
