"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compares row count, schema (column names + dtype family), and
an order-insensitive value hash. Usage:

    python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        s = out[c]
        if s.dtype == object:
            out[c] = s.map(
                lambda v: repr(sorted(v) if isinstance(v, (list, tuple)) else v)
                if v is not None
                else "<null>"
            )
        elif s.dtype.kind == "f":
            out[c] = s.round(6).map(lambda v: "%.6f" % v if pd.notna(v) else "<null>")
        else:
            out[c] = s.map(lambda v: str(v) if pd.notna(v) else "<null>")
    rows = sorted("\x01".join(r) for r in out.astype(str).itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def dtype_family(dt) -> str:
    k = getattr(dt, "kind", "o")
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts", "O": "obj"}.get(k, "obj")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from etl_gmaps_spark.session import get_spark

    spark = get_spark("check-contract", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oq = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oq:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oq[name]).fetch_df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        else:
            for c in got.columns:
                a, b = dtype_family(got[c].dtype), dtype_family(want[c].dtype)
                if a != b:
                    problems.append(f"dtype[{c}] {got[c].dtype} vs {want[c].dtype}")
        if not problems and canon_hash(got) != canon_hash(want):
            problems.append("value hash mismatch")
            merged = got.sort_values(sorted(got.columns)[0]).head(3)
            print(f"  spark head:\n{merged}")
            print(f"  duck head:\n{want.sort_values(sorted(want.columns)[0]).head(3)}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
