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


def list_log_epochs(spark: SparkSession, path: str) -> list[int]:
    """Metadata-only listing of the log's ``epoch=N`` partition
    directories (Hadoop FS, any scheme) — the same listing Spark's own
    partition discovery performs, no data files touched. At 10^7 epochs
    this is a driver-side directory scan, the cost a table format pays
    once per poll; epoch-range manifests would subsume it."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith("epoch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


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
    max_epochs: int | None = None,
) -> DataFrame:
    """S2: events not yet reflected in the table, per partition.

    Joins the log against the (tiny, broadcast) per-partition checkpoint
    and keeps rows with ``lsn > last_lsn`` of their bucket — the
    non-destructive analog of claiming `new` rows. The global min over
    the checkpoint is also pushed into the scan so file skipping happens
    BEFORE the join (coarse prune scan-side, exact prune join-side).

    ``max_epochs`` is the source-side fetch cap (SURVEY.md O4): the
    reference's ``maxDepth`` bounds how many result pages one job
    scrolls (gmaps/job.go:289-357); here one poll claims at most the K
    oldest epochs absent from the table's applied-epoch ledger. The cap
    becomes an ``epoch IN (...)`` predicate on the partition column —
    directory-level pruning, unclaimed epochs are never even listed for
    data files.
    """
    rows = table.checkpoint_rows() or []
    n_buckets = table.snapshot()["n_buckets"]
    global_low = min((r["last_lsn"] for r in rows), default=None) if rows else None
    log = read_changelog(spark, path, since_lsn=global_low)
    if max_epochs is not None:
        applied = table.applied_epochs()
        claim = [e for e in list_log_epochs(spark, path) if e not in applied][:max_epochs]
        log = log.filter(F.col("epoch").isin([int(e) for e in claim]))
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
