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
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_lww_gate(
    events: DataFrame, key_col: str = "doc_id", lsn_col: str = "lsn"
) -> DataFrame:
    """Admit only events whose lsn strictly exceeds the max lsn already
    admitted for their key; emitted rows per key have strictly
    increasing lsns across the whole stream. ``events`` must be a
    STREAMING DataFrame (``spark.readStream``)."""
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
        whole = pd.concat(chunks, ignore_index=True).sort_values(lsn_col)
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
