"""Change-log source (SURVEY.md S2/T1): incremental, checkpoint-pushed.

The reference's queue poll is a destructive batched read — status flips
new→queued under FOR UPDATE SKIP LOCKED, ordered (priority, created_at)
(postgres/provider.go:148-244). The lake-native equivalent never
mutates the log: the consumer's position is the per-partition
checkpoint, and "claiming" a batch is just a pushed-down range filter
``lsn > last_lsn`` that Parquet/Iceberg answer with file skipping when
the log is LSN/epoch-partitioned (the layout bench.py writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_gmaps_spark.tableio.snapshot_table import SnapshotTable, bucket_expr


def read_changelog(spark: SparkSession, path: str, since_lsn: int | None = None) -> DataFrame:
    """Plain log read with an optional global low-water-mark pushdown
    (epoch/lsn range predicates reach the scan; with an epoch-
    partitioned layout this prunes whole directories)."""
    df = spark.read.parquet(path)
    if since_lsn is not None:
        df = df.filter(F.col("lsn") > since_lsn)
    return df


def read_pending(
    spark: SparkSession,
    path: str,
    table: SnapshotTable,
    key_col: str = "doc_id",
) -> DataFrame:
    """S2: events not yet reflected in the table, per partition.

    Joins the log against the (tiny, broadcast) per-partition checkpoint
    and keeps rows with ``lsn > last_lsn`` of their bucket — the
    non-destructive analog of claiming `new` rows. The global min over
    the checkpoint is also pushed into the scan so file skipping happens
    BEFORE the join (coarse prune scan-side, exact prune join-side).
    """
    rows = table.checkpoint_rows() or []
    n_buckets = table.snapshot()["n_buckets"]
    global_low = min((r["last_lsn"] for r in rows), default=None) if rows else None
    log = read_changelog(spark, path, since_lsn=global_low)
    if not rows:
        return log
    ckpt = spark.createDataFrame(
        [(int(r["partition"]), int(r["last_lsn"])) for r in rows],
        "partition int, last_lsn long",
    )
    withb = log.withColumn("_p", bucket_expr(key_col, n_buckets))
    joined = withb.join(F.broadcast(ckpt), withb["_p"] == ckpt["partition"], "left")
    return (
        joined.filter(F.col("last_lsn").isNull() | (F.col("lsn") > F.col("last_lsn")))
        .drop("_p", "partition", "last_lsn")
    )
