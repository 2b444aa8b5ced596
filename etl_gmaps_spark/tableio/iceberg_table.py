"""IcebergTable — same TableIO surface over a real Iceberg catalog.

Usable only when the iceberg-spark-runtime jar is on the session
classpath (not present in this sandbox — detected at runtime, tests
skip). Kept so the engine is a constructor change away from real
Iceberg on a cluster: `spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>` plus a hadoop
catalog conf, and `open_table(..., fmt="iceberg")`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_gmaps_spark.tableio.snapshot_table import CommitResult


def iceberg_available(spark: SparkSession) -> bool:
    # Class.forName, NOT attribute access: py4j resolves a missing class
    # path to a silent JavaPackage object instead of raising, so
    # `_jvm.org.apache.iceberg.Snapshot` reported the jar present on
    # every classpath (latent until round 4's gated e2e test ran it)
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.Snapshot"
        )
        return True
    except Exception:
        return False


# --- SQL generation (pure functions, unit-testable without the jar) ---
# The sandbox cannot EXECUTE these (no iceberg-spark-runtime), but
# tests/test_skew_and_maintenance.py parses every statement with
# Spark's own SQL parser, so the syntax is verified in-sandbox and only
# Iceberg-side resolution is deferred to a real cluster.

def create_table_sql(
    identifier: str, schema: T.StructType, key_col: str, n_buckets: int
) -> str:
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return (
        f"CREATE TABLE {identifier} ({cols}) USING iceberg "
        f"PARTITIONED BY (bucket({n_buckets}, {key_col}))"
    )


def add_column_sql(identifier: str, name: str, data_type: T.DataType) -> str:
    return f"ALTER TABLE {identifier} ADD COLUMN {name} {data_type.simpleString()}"


def merge_sql(
    identifier: str, key: str, payload_cols: list[str], op_col: str = "op",
    source_view: str = "_cdc_source",
) -> str:
    """The exactly-once apply statement (SnapshotTable.merge parity):
    delete winners drop the row, update winners replace the payload,
    unseen non-delete keys insert. ``payload_cols`` excludes ``op_col``.
    """
    sets = ", ".join(f"t.{c} = s.{c}" for c in payload_cols)
    cols = ", ".join(payload_cols)
    vals = ", ".join(f"s.{c}" for c in payload_cols)
    return f"""
        MERGE INTO {identifier} t USING {source_view} s
        ON t.{key} = s.{key}
        WHEN MATCHED AND s.{op_col} = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET {sets}
        WHEN NOT MATCHED AND s.{op_col} != 'D' THEN INSERT ({cols}) VALUES ({vals})
    """


class IcebergTable:
    """MERGE INTO / snapshot-properties implementation on Iceberg SQL.

    Mirrors SnapshotTable: the epoch ledger lives in snapshot summary
    via `spark.wap`-style commit properties; checkpoint parquet sits
    beside the table. Only exercised when the runtime jar exists.
    """

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier
        if not iceberg_available(spark):
            raise RuntimeError("iceberg-spark-runtime jar not on classpath")

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema: T.StructType,
        key_col: str = "doc_id",
        n_buckets: int = 16,
        base_df: DataFrame | None = None,
    ) -> "IcebergTable":
        spark.sql(create_table_sql(identifier, schema, key_col, n_buckets))
        t = cls(spark, identifier)
        if base_df is not None:
            base_df.writeTo(identifier).append()
        return t

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier)

    def schema(self) -> T.StructType:
        return self.read().schema

    def applied_epochs(self) -> set[int]:
        rows = self.spark.sql(
            f"SELECT summary FROM {self.identifier}.snapshots"
        ).collect()
        out: set[int] = set()
        for r in rows:
            summ = r.summary or {}
            # merge() stamps the epoch via spark.wap.id, which Iceberg
            # records in the snapshot summary as "wap.id" (the public
            # write-audit-publish mechanism); "cdc.epoch" is accepted
            # too for writers using the Java CommitMetadata API
            e = summ.get("cdc.epoch", summ.get("wap.id"))
            if e is not None:
                out.add(int(e))
        return out

    def commit_log(
        self,
        latest: int | None = None,
        status: str | None = None,
        epoch: int | None = None,
    ) -> list[dict]:
        """S4/O3 parity with SnapshotTable.commit_log: the job-ledger
        select (newest first, optional filters, LIMIT) answered from
        Iceberg's `.snapshots` metadata table."""
        rows = self.spark.sql(
            f"SELECT snapshot_id, summary FROM {self.identifier}.snapshots "
            "ORDER BY committed_at DESC"
        ).collect()
        out: list[dict] = []
        for r in rows:
            summ = r.summary or {}
            e = summ.get("cdc.epoch", summ.get("wap.id"))
            c = {
                "snapshot": r.snapshot_id,
                "status": "ok",
                "epochs": [int(e)] if e is not None else [],
                "events": int(summ.get("cdc.events", 0) or 0),
            }
            if status is not None and c["status"] != status:
                continue
            if epoch is not None and epoch not in c["epochs"]:
                continue
            out.append(c)
        return out[:latest] if latest else out

    def merge(
        self,
        winners: DataFrame,
        epoch: int | None = None,
        checkpoint_df: DataFrame | None = None,
        op_col: str = "op",
        extra_properties: dict[str, Any] | None = None,
        stats: dict[str, Any] | None = None,
        key_col: str | None = None,
    ) -> CommitResult:
        if epoch is not None and epoch in self.applied_epochs():
            return CommitResult(-1, -1, 0, 0, epoch)
        if epoch is not None:
            self.spark.conf.set("spark.wap.id", str(epoch))
        payload = [f.name for f in winners.schema.fields if f.name != op_col]
        target_cols = {f.name for f in self.schema().fields}
        for f in winners.schema.fields:
            if f.name not in target_cols and f.name != op_col:
                self.spark.sql(add_column_sql(self.identifier, f.name, f.dataType))
        winners.createOrReplaceTempView("_cdc_source")
        # explicit key_col wins; else the key-first convention
        key = key_col or [f.name for f in winners.schema.fields][0]
        try:
            self.spark.sql(merge_sql(self.identifier, key, payload, op_col))
        finally:
            if epoch is not None:
                # a lingering wap.id would stamp UNRELATED later commits
                # with this epoch, silently ledger-skipping them
                self.spark.conf.unset("spark.wap.id")
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).collect()[0][0]
        if epoch is not None:
            self.spark.sql(
                f"ALTER TABLE {self.identifier} SET TBLPROPERTIES ('cdc.last_epoch'='{epoch}')"
            )
        return CommitResult(-1, snap, -1, -1, epoch)
