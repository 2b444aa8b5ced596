"""File sources (SURVEY.md S1, S5, S6, S10).

The reference reads query seeds line-by-line with an optional stable id
split on '#!#' (runner/jobs.go:71-131) and loads headerless CSV with a
fixed schema tolerating column-count drift (core_logic.py:466-483).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_query_lines(spark: SparkSession, path: str, id_sep: str = "#!#") -> DataFrame:
    """S1: line-file scan → (seed_id, query). Blank lines dropped; an
    optional leading stable id is split on ``id_sep`` (reference
    runner/jobs.go:84-101). Rows without an id get a deterministic one
    from the content hash (not a wall-clock uuid — replays are stable;
    md5 rather than xxhash64 so the id is engine-portable and DuckDB
    oracles can reproduce it)."""
    lines = spark.read.text(path)
    trimmed = lines.select(F.trim("value").alias("line")).filter(F.col("line") != "")
    parts = F.split("line", id_sep, 2)
    has_id = F.size(parts) == 2
    return trimmed.select(
        F.when(has_id, parts.getItem(0))
        .otherwise(F.md5("line"))
        .alias("seed_id"),
        F.when(has_id, parts.getItem(1)).otherwise(F.col("line")).alias("query"),
    )


def read_csv_with_drift(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
) -> DataFrame:
    """S10: headerless CSV with a fixed declared schema, tolerating
    rows whose column count drifts (reference core_logic.py:473-480
    truncates/pads). PERMISSIVE mode nulls missing trailing columns and
    drops extras; corrupt rows land in _corrupt for quarantine instead
    of failing the load (T5 dead-letter analog)."""
    full = T.StructType(schema.fields + [T.StructField("_corrupt", T.StringType(), True)])
    df = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return df


def quarantine_split(
    df: DataFrame, corrupt_col: str = "_corrupt", sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """T5: split a permissive load into (clean, dead_letter).

    Column-count drift (short row padded, long row truncated) is CLEAN —
    the reference explicitly tolerates it (core_logic.py:473-480). Only
    rows whose token count matches the schema yet still failed (a type
    parse error) are dead-lettered. Token counting is a naive split on
    ``sep`` (fixture-style CSV without quoted separators)."""
    df = df.cache()  # Spark disallows predicates on _corrupt over a raw scan
    n_fields = len(df.columns) - 1
    raw_arity = F.size(F.split(F.col(corrupt_col), sep))
    is_drift = F.col(corrupt_col).isNotNull() & (raw_arity != n_fields)
    clean = df.filter(F.col(corrupt_col).isNull() | is_drift).drop(corrupt_col)
    dead = df.filter(F.col(corrupt_col).isNotNull() & (raw_arity == n_fields))
    return clean, dead
