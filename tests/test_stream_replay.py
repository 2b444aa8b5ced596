"""Structured-Streaming replay: availableNow over the epoch-partitioned
log must converge to the oracle state, and re-running after checkpoint
loss must be a no-op thanks to the table's epoch ledger."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from etl_gmaps_spark.datagen import gen_base, gen_changelog
from etl_gmaps_spark.oracle import replay_oracle
from etl_gmaps_spark.schemas import TARGET_SCHEMA
from etl_gmaps_spark.streaming.stream_replay import run_availablenow
from etl_gmaps_spark.tableio import SnapshotTable
from tests.conftest import assert_table_equal


def test_streaming_replay_matches_oracle(spark, tmp_path):
    base = gen_base(spark, n_docs=200, seed=21)
    log = gen_changelog(spark, n_docs=200, n_events=2000, seed=21, epoch_size=500, dup_epochs=())
    log_path = str(tmp_path / "log")
    log.write.partitionBy("epoch").parquet(log_path)
    schema = spark.read.parquet(log_path).schema

    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base)
    res = run_availablenow(spark, log_path, table, str(tmp_path / "ckpt"), schema=schema)
    assert res["events"] == 2000

    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)

    # checkpoint loss → full re-stream. Whether micro-batches are
    # ledger-skipped (same slicing) or re-applied (different slicing),
    # the row-level _lsn guard keeps the final state identical.
    shutil.rmtree(str(tmp_path / "ckpt"))
    run_availablenow(spark, log_path, table, str(tmp_path / "ckpt2"), schema=schema)
    assert_table_equal(table.read(), expected)


def test_row_level_guard_rejects_stale_replay(spark, tmp_path):
    """Deliver a NEWER batch first, then replay an OLDER overlapping
    slice out of order — the _lsn guard must keep every newer row and
    the tombstone must keep deleted keys dead (the failure mode that
    batch-level ledgers cannot catch)."""
    base = gen_base(spark, n_docs=50, seed=33)
    log = gen_changelog(spark, n_docs=50, n_events=600, seed=33, epoch_size=200, dup_epochs=())
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base)
    from etl_gmaps_spark.streaming.replay import Replayer

    r = Replayer(table)
    r.apply_batch(log.filter(F.col("lsn") > 300), epoch=901)  # newer half first
    r.apply_batch(log.filter(F.col("lsn") <= 400), epoch=902)  # overlapping older slice
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_streaming_replay_into_mor_table(spark, tmp_path):
    """The streaming sink path composes with merge-on-read: availableNow
    micro-batches write per-bucket deltas, reads reconcile, and the
    final state equals the oracle."""
    base = gen_base(spark, n_docs=150, seed=33)
    log = gen_changelog(
        spark, n_docs=150, n_events=1500, seed=33, epoch_size=500, dup_epochs=()
    )
    log_path = str(tmp_path / "log")
    log.write.partitionBy("epoch").parquet(log_path)
    schema = spark.read.parquet(log_path).schema

    table = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base, merge_mode="mor"
    )
    res = run_availablenow(spark, log_path, table, str(tmp_path / "ckpt"), schema=schema)
    assert res["events"] == 1500
    # deltas really were written (merge-on-read took effect)
    resolved = table._resolve(table.snapshot())
    assert any(e.get("deltas") for e in resolved.values())
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)
    # compact folds the stream's deltas; state unchanged
    table.compact()
    resolved = table._resolve(table.snapshot())
    assert not any(e.get("deltas") for e in resolved.values())
    assert_table_equal(table.read(), expected)


def test_streaming_lww_gate_drops_stale_events(spark, tmp_path):
    """applyInPandasWithState online gate (reference J2 deduper,
    deduper/hashmap.go): per key only strictly-increasing lsns pass,
    across micro-batch boundaries, with state in the checkpoint."""
    import pandas as pd

    from etl_gmaps_spark.streaming.stateful import streaming_lww_gate

    # two files read as separate micro-batches (maxFilesPerTrigger=1):
    # file 2 replays stale lsns from file 1 plus some fresh ones
    log_dir = tmp_path / "gate_log"
    b1 = pd.DataFrame(
        {"doc_id": ["a", "a", "b"], "lsn": [3, 1, 5], "payload": ["a3", "a1", "b5"]}
    )
    b2 = pd.DataFrame(
        {"doc_id": ["a", "a", "b", "c"], "lsn": [2, 7, 5, 1],
         "payload": ["stale", "a7", "dup", "c1"]}
    )
    log_dir.mkdir()
    b1.to_parquet(log_dir / "batch-000.parquet")
    b2.to_parquet(log_dir / "batch-001.parquet")

    stream = (
        spark.readStream.schema("doc_id string, lsn long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(log_dir))
    )
    q = (
        streaming_lww_gate(stream)
        .writeStream.format("memory")
        .queryName("gated")
        .option("checkpointLocation", str(tmp_path / "gate_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["lsn"]): r["payload"]
        for r in spark.table("gated").collect()
    }
    # batch1: a/1 then a/3 pass (sorted within batch), b/5 passes
    # batch2: a/2 stale (< 3), a/7 passes, b/5 duplicate, c/1 passes
    assert got == {
        ("a", 1): "a1", ("a", 3): "a3", ("b", 5): "b5",
        ("a", 7): "a7", ("c", 1): "c1",
    }
