"""Micro-batch replay driver (SURVEY.md §3.4, §7.1 steps 5-7).

Drives the change log through the table in epoch-sized commits:

    for epoch in epochs(log) ascending:
        skip if epoch in ledger            # exactly-once re-apply
        winners = LWW reduce over slice    # per-key max-LSN
        MERGE + checkpoint + ledger        # one atomic snapshot commit

Mirrors of the reference:
  * epoch skip = ON CONFLICT DO NOTHING on job UUID
    (postgres/provider.go:108-111) and result rows
    (postgres/resultwriter.go:83)
  * batch loop = the 50-row/60-s sink flush + 10-row queue claim cycle
    (resultwriter.go:26-48, provider.go:20,148-244)
  * done condition = exiter.isDone: processed == max
    (exiter/exiter.go:87-100)
  * per-partition checkpoint rows = the job lineage log
    (0_AGENTE_GOSOM/src/core_logic.py:488-514) + status flips
    (provider.go:152-165)

Crash-resume: the epoch ledger and checkpoint are written inside the
same snapshot commit as the data, so a crash at ANY point leaves the
table at the last fully-committed epoch; re-running the replayer skips
committed epochs and re-applies the in-flight one.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import monotonic

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_gmaps_spark.operators.lww import lww_winners
from etl_gmaps_spark.tableio.snapshot_table import SnapshotTable, bucket_expr

ENVELOPE_COLS = ("lsn", "epoch", "ts")


class InjectedCrash(RuntimeError):
    """Raised by the fail-injection hook in crash-resume tests."""


@dataclass
class ReplayMetrics:
    epochs_applied: int = 0
    epochs_skipped: int = 0
    events_processed: int = 0
    rows_upserted: int = 0
    elapsed_sec: float = 0.0
    per_epoch: list[dict] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_processed / self.elapsed_sec if self.elapsed_sec else 0.0


class Replayer:
    def __init__(
        self,
        table: SnapshotTable,
        key_col: str = "doc_id",
        lsn_col: str = "lsn",
        op_col: str = "op",
        epoch_col: str = "epoch",
        salt_buckets: int = 0,
    ):
        self.table = table
        self.key_col = key_col
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.epoch_col = epoch_col
        self.salt_buckets = salt_buckets

    # ------------------------------------------------------------ batch
    def apply_batch(self, batch: DataFrame, epoch: int | list[int]) -> dict:
        """LWW-reduce one epoch slice (or group of epochs committed as
        one snapshot) and commit it atomically."""
        epochs = [epoch] if isinstance(epoch, int) else list(epoch)
        applied = self.table.applied_epochs()
        if all(e in applied for e in epochs):
            return {"epoch": epochs[-1], "skipped": True, "events": 0, "rows": 0}

        # replayed-batch rows inside the slice are byte-identical dupes
        # (J2/T6 analog: first-writer set gate, deduper/hashmap.go:16-42)
        batch = batch.dropDuplicates([self.lsn_col])

        snap = self.table.snapshot()
        n_buckets = snap["n_buckets"]

        winners = lww_winners(
            batch, key_col=self.key_col, lsn_col=self.lsn_col, salt_buckets=self.salt_buckets
        )
        payload_cols = [c for c in batch.columns if c not in ENVELOPE_COLS and c != self.op_col]
        src = winners.select(self.op_col, *payload_cols)

        # per-partition lineage stats for this epoch (bucket = the salted
        # key partition; FIXTURES.md #4 schema)
        stats_df = (
            batch.withColumn("_p", bucket_expr(self.key_col, n_buckets))
            .groupBy("_p")
            .agg(
                F.max(self.lsn_col).alias("last_lsn"),
                F.count(F.lit(1)).alias("rows_applied"),
                F.sum(
                    F.coalesce(F.col("n_tok") * 4, F.lit(0)) + F.length(self.key_col) + 16
                ).alias("bytes"),
                F.max("ts").alias("updated_at"),
            )
            .select(
                F.col("_p").alias("partition"),
                "last_lsn",
                "rows_applied",
                "bytes",
                F.lit(int(epochs[-1])).cast("long").alias("epoch"),
                "updated_at",
            )
        )
        # stats are n_buckets rows — collect once, reuse for metrics so
        # the batch isn't scanned an extra time just to count it
        stats_rows = stats_df.collect()
        events = int(sum(r["rows_applied"] for r in stats_rows))
        prev = self.table.checkpoint()
        ckpt = _merge_checkpoint(prev, self.table.spark.createDataFrame(stats_rows, stats_df.schema))

        res = self.table.merge(
            src,
            epoch=epochs,
            checkpoint_df=ckpt,
            op_col=self.op_col,
            stats={"events": events},
        )
        return {
            "epoch": epochs[-1],
            "skipped": False,
            "events": events,
            "rows": events,
            "snapshot": res.snapshot_id,
            "buckets_rewritten": res.buckets_rewritten,
        }

    # -------------------------------------------------------------- run
    def run(
        self,
        log: DataFrame,
        fail_after_epochs: int | None = None,
        batch_epochs: int = 1,
    ) -> ReplayMetrics:
        """Replay the whole log; resumable and idempotent.

        ``fail_after_epochs`` injects a crash after N successful commits
        (test hook for the crash-resume scenario).
        """
        m = ReplayMetrics()
        t0 = monotonic()

        done = self.table.applied_epochs()
        epochs = [
            r[0]
            for r in log.select(self.epoch_col).distinct().orderBy(self.epoch_col).collect()
        ]
        pending = [e for e in epochs if e not in done]
        m.epochs_skipped = len(epochs) - len(pending)

        for group_start in range(0, len(pending), batch_epochs):
            group = [int(e) for e in pending[group_start : group_start + batch_epochs]]
            batch = log.filter(F.col(self.epoch_col).isin(group))
            info = self.apply_batch(batch, epoch=group)
            if not info["skipped"]:
                m.epochs_applied += len(group)
                m.events_processed += info["events"]
                m.rows_upserted += info["rows"]
            m.per_epoch.append(info)
            if fail_after_epochs is not None and m.epochs_applied >= fail_after_epochs:
                m.elapsed_sec = monotonic() - t0
                raise InjectedCrash(f"injected crash after {m.epochs_applied} epochs")
        m.elapsed_sec = monotonic() - t0
        return m

    def is_done(self, log: DataFrame) -> bool:
        """exiter.isDone analog: every epoch in the log is in the ledger."""
        done = self.table.applied_epochs()
        remaining = (
            log.select(self.epoch_col)
            .distinct()
            .filter(~F.col(self.epoch_col).isin([int(e) for e in done]) if done else F.lit(True))
            .count()
        )
        return remaining == 0


def _merge_checkpoint(prev: DataFrame | None, batch_stats: DataFrame) -> DataFrame:
    """Cumulative per-partition lineage: max lsn, summed rows/bytes."""
    if prev is None:
        return batch_stats
    p = prev.select(
        "partition",
        F.col("last_lsn").alias("p_lsn"),
        F.col("rows_applied").alias("p_rows"),
        F.col("bytes").alias("p_bytes"),
        F.col("epoch").alias("p_epoch"),
        F.col("updated_at").alias("p_at"),
    )
    j = batch_stats.join(p, "partition", "full_outer")
    return j.select(
        "partition",
        F.greatest(F.col("last_lsn"), F.col("p_lsn")).alias("last_lsn"),
        (F.coalesce("rows_applied", F.lit(0)) + F.coalesce("p_rows", F.lit(0))).alias("rows_applied"),
        (F.coalesce("bytes", F.lit(0)) + F.coalesce("p_bytes", F.lit(0))).alias("bytes"),
        F.coalesce("epoch", "p_epoch").alias("epoch"),
        F.coalesce(F.greatest("updated_at", "p_at"), F.col("updated_at"), F.col("p_at")).alias("updated_at"),
    )
