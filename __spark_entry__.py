"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship CDC LWW query on sf0.001
queries()     — operator catalog (etl_gmaps_spark/plans/queries.py)
oracle_sql()  — DuckDB-equivalent ANSI SQL per query
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_gmaps_spark.plans import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW CDC replay of a tokens binlog (sf0.001)."""
    return _catalog.QUERIES["cdc_lww_tokens"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
