"""Core correctness: batch replay == single-threaded oracle.

Golden final-state equality per SURVEY.md §5: per-row token-array
equality between the distributed engine and the trivial Python oracle.
"""

from __future__ import annotations

from etl_gmaps_spark.datagen import gen_base, gen_changelog
from etl_gmaps_spark.operators.lww import batch_replay, lww_winners
from etl_gmaps_spark.oracle import replay_oracle
from tests.conftest import assert_table_equal, canon


def test_batch_replay_matches_oracle(spark):
    base = gen_base(spark, n_docs=300, seed=42)
    log = gen_changelog(spark, n_docs=300, n_events=3000, seed=42, epoch_size=500)
    expected = replay_oracle(base.toPandas(), log.toPandas())
    final = batch_replay(base, log)
    assert_table_equal(final, expected)


def test_batch_replay_no_base(spark):
    log = gen_changelog(spark, n_docs=100, n_events=1500, seed=7, epoch_size=300)
    expected = replay_oracle(None, log.toPandas())
    assert_table_equal(batch_replay(None, log), expected)


def test_salted_equals_unsalted(spark):
    log = gen_changelog(spark, n_docs=200, n_events=2000, seed=9, epoch_size=400)
    plain = canon(lww_winners(log).toPandas())
    salted = canon(lww_winners(log, salt_buckets=8).toPandas())
    import pandas as pd

    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


def test_invariants(spark):
    """n_tok == size(tokens) on every non-delete winner (reference-style
    invariant assertions, gmaps/entry_test.go:149-170)."""
    from pyspark.sql import functions as F

    log = gen_changelog(spark, n_docs=200, n_events=2000, seed=42)
    final = batch_replay(None, log)
    bad = final.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
    assert final.filter(F.col("doc_id").isNull()).count() == 0
