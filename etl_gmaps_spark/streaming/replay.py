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

from etl_gmaps_spark.tableio.snapshot_table import SnapshotTable, bucket_expr

ENVELOPE_COLS = ("lsn", "epoch", "ts")


def _utc(dt):
    """Session timezone is UTC; collected naive datetimes are UTC wall
    time — tag them so pyarrow/tz-aware comparisons are consistent."""
    from datetime import timezone

    if dt is None or dt.tzinfo is not None:
        return dt
    return dt.replace(tzinfo=timezone.utc)


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
        self._ckpt: dict[int, dict] | None = None  # partition -> lineage row

    def _merged_checkpoint_rows(self, stats: list[dict]) -> list[dict]:
        """Cumulative per-partition lineage, merged driver-side.

        The checkpoint is n_buckets rows — pushing it through Spark
        would cost a Python-worker-backed job per batch for nothing
        (plus ~150 ms per default partition). Seeded once from the last
        committed snapshot (crash-resume source of truth), then kept in
        memory and written via pyarrow inside each commit.
        """
        if self._ckpt is None:
            prev = self.table.checkpoint_rows()
            self._ckpt = {int(r["partition"]): dict(r) for r in prev} if prev is not None else {}
        for s in stats:
            p = s["partition"]
            old = self._ckpt.get(p)
            if old is None:
                self._ckpt[p] = dict(s)
            else:
                self._ckpt[p] = {
                    "partition": p,
                    "last_lsn": max(old["last_lsn"], s["last_lsn"]),
                    "rows_applied": old["rows_applied"] + s["rows_applied"],
                    "bytes": old["bytes"] + s["bytes"],
                    "epoch": s["epoch"],
                    "updated_at": max(
                        (t for t in (old.get("updated_at"), s.get("updated_at")) if t is not None),
                        default=None,
                    ),
                }
        return [dict(r) for r in self._ckpt.values()]

    # ------------------------------------------------------------ batch
    def apply_batch(self, batch: DataFrame, epoch: int | list[int]) -> dict:
        """LWW-reduce one epoch slice (or group of epochs committed as
        one snapshot) and commit it atomically."""
        epochs = [epoch] if isinstance(epoch, int) else list(epoch)
        applied = self.table.applied_epochs()
        if all(e in applied for e in epochs):
            return {"epoch": epochs[-1], "skipped": True, "events": 0, "rows": 0}

        snap = self.table.snapshot()
        n_buckets = snap["n_buckets"]

        # ONE primitive-only hash aggregation produces the per-key
        # lineage counters AND the winning lsn: the aggregation buffer
        # holds only longs/timestamps, so Spark plans a HashAggregate
        # with a map-side partial — a hot doc_id sends one row of
        # counters per map task into a shuffle of keys only (no token
        # payload; counters dedupe replayed byte-identical rows exactly
        # via count_distinct(lsn)). The winner ROWS come from a
        # semi-join of the batch against the tiny (key, last_lsn) set
        # (AQE broadcasts it when it fits — the payload then never
        # shuffles before the MERGE), plus a winner-sized max_by to
        # collapse replayed duplicates. See operators/lww.py for why
        # this beats a single max_by(struct(*), lsn) (SortAggregate).
        cols = batch.columns
        ev_bytes = F.coalesce(F.col("n_tok") * 4, F.lit(0)) + F.length(self.key_col) + 16
        aggs = [
            F.count(F.lit(1)).alias("_raw_rows"),
            F.count_distinct(F.col(self.lsn_col)).alias("rows_applied"),
            F.max(self.lsn_col).alias("last_lsn"),
            F.sum(ev_bytes).alias("_raw_bytes"),
            F.max("ts").alias("updated_at"),
        ]
        if self.salt_buckets and self.salt_buckets > 1:
            # explicit two-phase reduce for pathological hot keys: the
            # salt comes from the LSN, so one key's events spread over
            # salt_buckets reducers; per-salt distinct-lsn counts are
            # disjoint and SUM exactly in phase 2.
            salt = F.pmod(F.xxhash64(F.col(self.lsn_col)), F.lit(self.salt_buckets))
            partial = batch.groupBy(self.key_col, salt.alias("_salt")).agg(*aggs)
            per_key = (
                partial.groupBy(self.key_col)
                .agg(
                    F.sum("_raw_rows").alias("_raw_rows"),
                    F.sum("rows_applied").alias("rows_applied"),
                    F.max("last_lsn").alias("last_lsn"),
                    F.sum("_raw_bytes").alias("_raw_bytes"),
                    F.max("updated_at").alias("updated_at"),
                )
                .persist()
            )
        else:
            per_key = batch.groupBy(self.key_col).agg(*aggs).persist()
        stats_df = (
            per_key.withColumn("_p", bucket_expr(self.key_col, n_buckets))
            .groupBy("_p")
            .agg(
                F.max("last_lsn").alias("last_lsn"),
                F.sum("_raw_rows").alias("_raw_rows"),
                F.sum("rows_applied").alias("rows_applied"),
                F.sum("_raw_bytes").alias("_raw_bytes"),
                F.max("updated_at").alias("updated_at"),
            )
        )
        payload_cols = [c for c in cols if c not in ENVELOPE_COLS and c != self.op_col]
        win = per_key.select(F.col(self.key_col).alias("_w_key"), "last_lsn")
        cand = batch.alias("_b").join(
            win.alias("_w"),
            (F.col(f"_b.{self.key_col}") == F.col("_w._w_key"))
            & (F.col(f"_b.{self.lsn_col}") == F.col("_w.last_lsn")),
            "leftsemi",
        )
        row = F.struct(*[F.col(c) for c in cols])
        src = (
            cand.groupBy(self.key_col)
            .agg(F.max_by(row, F.col(self.lsn_col)).alias("_w"))
            .select(
                F.col(f"_w.{self.key_col}").alias(self.key_col),
                *[
                    F.col(f"_w.{c}").alias(c)
                    for c in [self.op_col, self.lsn_col] + payload_cols
                    if c != self.key_col
                ],
            )
        )
        stats_rows = [r.asDict() for r in stats_df.collect()]
        if any(r["_raw_rows"] != r["rows_applied"] for r in stats_rows):
            # rare path: the slice physically contains a replayed epoch —
            # recompute exact byte counts over dedup'd events
            dedup_stats = (
                batch.dropDuplicates([self.lsn_col])
                .withColumn("_p", bucket_expr(self.key_col, n_buckets))
                .groupBy("_p")
                .agg(F.sum(ev_bytes).alias("_bytes"))
                .collect()
            )
            by_p = {r["_p"]: r["_bytes"] for r in dedup_stats}
            for r in stats_rows:
                r["_raw_bytes"] = by_p.get(r["_p"], 0)
        stats = [
            {
                "partition": int(r["_p"]),
                "last_lsn": int(r["last_lsn"]),
                "rows_applied": int(r["rows_applied"]),
                "bytes": int(r["_raw_bytes"] or 0),
                "epoch": int(epochs[-1]),
                "updated_at": _utc(r["updated_at"]),
            }
            for r in stats_rows
        ]
        events = sum(r["rows_applied"] for r in stats)
        ckpt = self._merged_checkpoint_rows(stats)

        res = self.table.merge(
            src,
            epoch=epochs,
            checkpoint_df=ckpt,
            op_col=self.op_col,
            lsn_col=self.lsn_col,
            stats={"events": events},
            touched_buckets=[s["partition"] for s in stats],
        )
        per_key.unpersist()
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


