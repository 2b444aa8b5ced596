"""Single-threaded Python replay oracle (FIXTURES.md #6).

The golden-equality anchor, mirroring the reference's golden-file test
style (gmaps/entry_test.go:28-176: fully-specified expected output
asserted field by field). Sort all events by lsn, drop exact duplicate
lsns (replayed epochs), apply I/U/D last-writer-wins into a dict, emit
the final table. Deliberately trivial — no Spark, no cleverness — so it
can be trusted as ground truth for the distributed engine.
"""

from __future__ import annotations

from typing import Any

import pandas as pd


def replay_oracle(
    base: pd.DataFrame | None,
    log: pd.DataFrame,
    payload_cols: tuple[str, ...] = ("tokens", "n_tok", "source"),
) -> pd.DataFrame:
    """Replay ``log`` over ``base``; return expected final table.

    Extra payload columns present in ``log`` (schema evolution, e.g.
    ``lang``) are carried through; rows written before the column existed
    hold None.
    """
    extra = [
        c for c in log.columns if c not in ("lsn", "epoch", "op", "doc_id", "ts") and c not in payload_cols
    ]
    all_payload = list(payload_cols) + extra

    state: dict[str, dict[str, Any]] = {}
    if base is not None:
        for rec in base.to_dict("records"):
            row = {c: rec.get(c) for c in all_payload}
            state[rec["doc_id"]] = row

    seen_lsn: set[int] = set()
    events = log.sort_values("lsn").to_dict("records")
    for ev in events:
        lsn = ev["lsn"]
        if lsn in seen_lsn:  # replayed epoch → identical row, apply once
            continue
        seen_lsn.add(lsn)
        key = ev["doc_id"]
        if ev["op"] == "D":
            state.pop(key, None)
        else:  # I and U are both upserts; last writer (max lsn) wins
            state[key] = {c: ev.get(c) for c in all_payload}

    rows = [{"doc_id": k, **v} for k, v in state.items()]
    out = pd.DataFrame(rows, columns=["doc_id"] + all_payload)
    return out.sort_values("doc_id").reset_index(drop=True)
