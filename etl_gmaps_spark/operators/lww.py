"""Last-writer-wins reduce: per-key max-LSN winner (SURVEY.md A5/T7).

The reference keeps the *first* writer (pandas ``drop_duplicates(
subset=['link'], keep='first')`` and the FNV deduper gate,
deduper/hashmap.go:16-42); the north rule inverts this to max-LSN
last-writer-wins over the change stream.

Skew strategy (north rule: "skew salting on hot doc_id keys"):

``max_by`` is an algebraic aggregate, so Spark already performs a
map-side partial reduce — each map task collapses its local rows for a
hot key to ONE row before the shuffle, which is exactly the
"partial per (key, salt), final per key" two-phase plan with
salt = map-partition id. We therefore default to the single
``groupBy(key).agg(max_by(...))`` and let hash aggregation do the
two phases. ``salt_buckets > 1`` additionally makes the two phases
explicit (partial per (key, pmod(xxhash64(lsn), S)), final per key)
for the adversarial case where a single reducer's *final* merge of
per-map partials is still hot (e.g. 100k map tasks × 1 hot key);
both plans produce identical results (see tests/test_lww.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_winners(
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
    salt_buckets: int = 0,
) -> DataFrame:
    """One row per key: the full event row with the highest lsn.

    Duplicate lsns (replayed epochs) are byte-identical rows, so either
    copy winning is correct. Output schema == input schema.
    """
    cols = log.columns
    row = F.struct(*[F.col(c) for c in cols])
    if salt_buckets and salt_buckets > 1:
        # phase 1: partial winner per (key, salt) — spreads one hot key
        # over `salt_buckets` reducers; phase 2: final winner per key
        # over at most `salt_buckets` rows/key.
        salt = F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_buckets)).alias("_salt")
        partial = (
            log.groupBy(F.col(key_col), salt)
            .agg(F.max_by(row, F.col(lsn_col)).alias("_w"), F.max(lsn_col).alias("_max_lsn"))
        )
        final = partial.groupBy(key_col).agg(
            F.max_by(F.col("_w"), F.col("_max_lsn")).alias("_w")
        )
    else:
        final = log.groupBy(key_col).agg(F.max_by(row, F.col(lsn_col)).alias("_w"))
    return final.select(*[F.col(f"_w.{c}").alias(c) for c in cols])


def batch_replay(
    base: DataFrame | None,
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
    op_col: str = "op",
    payload_cols: tuple[str, ...] | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Whole-log replay in one shot: final table = base ⟕anti winners
    ∪ non-delete winners. The minimal end-to-end slice (SURVEY.md §7.1
    step 3); the incremental engine applies the same winners via
    MERGE-per-epoch instead (streaming/replay.py).
    """
    winners = lww_winners(log, key_col=key_col, lsn_col=lsn_col, salt_buckets=salt_buckets)
    if payload_cols is None:
        payload_cols = tuple(
            c for c in log.columns if c not in (key_col, lsn_col, op_col, "epoch", "ts")
        )
    upserts = winners.filter(F.col(op_col) != "D").select(key_col, *payload_cols)
    if base is None:
        return upserts
    survivors = base.join(winners.select(key_col), key_col, "left_anti")
    return survivors.unionByName(upserts, allowMissingColumns=True)
