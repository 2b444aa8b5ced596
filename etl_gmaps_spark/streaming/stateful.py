"""Custom stateful streaming operator: an online per-key LWW gate.

The reference keeps an in-memory dedupe set that admits each href once
per session (`Deduper.AddIfNotExists`, deduper/hashmap.go:16-42, called
from gmaps/job.go:137 — SURVEY.md J2) so duplicate work is dropped
BEFORE fan-out. The CDC engine's streaming analog gates on LSN
monotonicity instead of set membership: per doc_id, pass an event only
if its lsn exceeds the highest lsn already seen on the stream, so
stale replays and out-of-order duplicates die at the source instead of
riding to the sink (where the table's row-level _lsn guard would drop
them anyway — this operator saves the shuffle+merge work for them).

Built on ``applyInPandasWithState`` (Arrow-batched, grouped state; no
per-row Python): state is ONE int64 per key. At 10^9 keys that is a
few GB of state store spread over the cluster — the same order as the
reference's FNV set per worker, but durable in the streaming
checkpoint and exactly-once across restarts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# State-store recipe for running the gate at scale (VERDICT r3 #8): the
# default HDFS-backed provider keeps every key's state on the JVM heap
# and writes FULL state snapshots into the streaming checkpoint each
# commit — at 10^9 keys that is GBs of heap and GBs per checkpoint. The
# RocksDB provider (in-tree since Spark 3.2) spills state to local SSD
# with bounded block-cache memory, and changelog checkpointing uploads
# only the per-batch delta, turning checkpoint cost O(state) → O(batch).
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def enable_rocksdb_state(spark: SparkSession) -> bool:
    """Point stateful queries at the RocksDB state store; returns False
    (leaving the session untouched) when the provider class is absent
    from the classpath, so callers can skip rather than fail. The conf
    is read at QUERY START, so flipping it between availableNow runs
    over one checkpoint is well-defined (the checkpoint records which
    provider wrote it)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            ROCKSDB_STATE_CONF["spark.sql.streaming.stateStore.providerClass"]
        )
    except Exception:
        return False
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    return True


def streaming_lww_gate(
    events: DataFrame, key_col: str = "doc_id", lsn_col: str = "lsn"
) -> DataFrame:
    """Admit only events whose lsn strictly exceeds the max lsn already
    admitted for their key. Emitted lsns per key are strictly increasing
    ACROSS micro-batches; within one micro-batch, byte-identical
    replayed duplicates are dropped, but same-lsn rows with DIFFERING
    payloads (an upstream bug) are all emitted deliberately — the
    divergence must stay visible downstream rather than a
    sort-order-dependent survivor masking it, so consumers needing a
    hard per-key total order still apply their own conflict rule (the
    sink's ``_lsn`` guard does). ``events`` must be a STREAMING
    DataFrame (``spark.readStream``)."""
    out_schema = events.schema
    col_order = [f.name for f in events.schema.fields]

    def gate(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        max_seen = state.get[0] if state.exists else -1
        chunks = list(pdfs)
        if not chunks:  # defensive: NoTimeout means data should exist
            state.update((max_seen,))
            return
        # concat the key's whole micro-batch before sorting: ratcheting
        # max_seen per Arrow chunk would make admission depend on the
        # (nondeterministic) chunk boundaries — a high lsn in an early
        # chunk would drop lower-but-unseen lsns in later chunks
        # drop intra-batch duplicates too: two byte-identical replayed
        # rows with the same lsn can land in ONE micro-batch, where the
        # state ratchet alone can't separate them — without this the
        # emitted stream would violate the strictly-increasing-lsn
        # contract (the sink's _lsn guard would mask it, but the whole
        # point of the gate is that duplicates die here). Stable sort +
        # full-row signature: only BYTE-IDENTICAL replayed rows
        # collapse; same-lsn rows with differing payloads (an upstream
        # bug) all survive, so the divergence stays visible downstream
        # instead of a quicksort-order-dependent survivor masking it.
        whole = pd.concat(chunks, ignore_index=True).sort_values(
            lsn_col, kind="stable"
        )
        dup = whole[lsn_col].duplicated(keep=False)
        if dup.any():
            # signature only over the (rare) duplicated-lsn rows; list
            # payloads (token arrays) are unhashable for a plain
            # drop_duplicates, so serialize per row — bounded by the
            # duplicate count, not the batch
            sig = whole.loc[dup].apply(
                lambda r: repr(
                    tuple(x.tolist() if hasattr(x, "tolist") else x for x in r)
                ),
                axis=1,
            )
            whole = whole.drop(index=sig.index[sig.duplicated()])
        fresh = whole[whole[lsn_col] > max_seen]
        if len(fresh):
            max_seen = int(fresh[lsn_col].max())
            yield fresh[col_order]
        state.update((max_seen,))

    return events.groupBy(key_col).applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType="max_lsn long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
