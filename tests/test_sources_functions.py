"""Sources (S1/S2/S10) and scalar function library (F1-F16, P6/P8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gmaps_spark.datagen import gen_base, gen_changelog
from etl_gmaps_spark.schemas import TARGET_SCHEMA
from etl_gmaps_spark.sources import read_csv_with_drift, read_pending, read_query_lines
from etl_gmaps_spark.sources.files import quarantine_split
from etl_gmaps_spark.tableio import SnapshotTable


def test_read_query_lines(spark, tmp_path):
    p = tmp_path / "queries.txt"
    p.write_text("id1#!#coffee shop berlin\n\nplain query line\n  \nid2#!#bar madrid\n")
    rows = {r["seed_id"]: r["query"] for r in read_query_lines(spark, str(p)).collect()}
    assert rows["id1"] == "coffee shop berlin"
    assert rows["id2"] == "bar madrid"
    assert "plain query line" in rows.values() and len(rows) == 3


def test_csv_drift_tolerance(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "drift.csv"
    # row2 missing a column, row3 has an extra one, row4 malformed number
    p.write_text("a,1,2.5\nb,2\nc,3,4.5,EXTRA\nd,notanint,1.0\n")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    df = read_csv_with_drift(spark, str(p), schema)
    clean, dead = quarantine_split(df)
    got = {r["name"]: (r["n"], r["x"]) for r in clean.collect()}
    assert got["a"] == (1, 2.5)
    assert got["b"] == (2, None)  # short row padded with null
    assert dead.count() >= 1  # malformed row quarantined, not fatal


def test_read_pending_after_partial_apply(spark, tmp_path):
    from etl_gmaps_spark.streaming.replay import Replayer

    base = gen_base(spark, n_docs=100, seed=55)
    log = gen_changelog(spark, n_docs=100, n_events=1000, seed=55, epoch_size=250, dup_epochs=())
    log_path = str(tmp_path / "log")
    log.write.partitionBy("epoch").parquet(log_path)
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base)
    r = Replayer(table)
    for e in [0, 1]:
        r.apply_batch(spark.read.parquet(log_path).filter(F.col("epoch") == e), epoch=e)
    pending = read_pending(spark, log_path, table)
    assert pending.count() < 1000
    assert pending.agg(F.min("lsn")).collect()[0][0] > 250  # first epoch fully excluded
    # applying the pending set completes the replay
    r.apply_batch(pending, epoch=99)
    from etl_gmaps_spark.oracle import replay_oracle
    from tests.conftest import assert_table_equal

    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_read_pending_max_epochs_fetch_cap(spark, tmp_path):
    """O4: one poll claims at most the K oldest unapplied epochs
    (the reference's maxDepth scroll bound, gmaps/job.go:289-357),
    and the cap prunes at the partition-directory level."""
    from etl_gmaps_spark.streaming.replay import Replayer

    base = gen_base(spark, n_docs=100, seed=56)
    log = gen_changelog(spark, n_docs=100, n_events=1000, seed=56, epoch_size=250, dup_epochs=())
    log_path = str(tmp_path / "log")
    log.write.partitionBy("epoch").parquet(log_path)
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base)
    r = Replayer(table)
    r.apply_batch(spark.read.parquet(log_path).filter(F.col("epoch") == 0), epoch=0)

    capped = read_pending(spark, log_path, table, max_epochs=2)
    assert {row[0] for row in capped.select("epoch").distinct().collect()} == {1, 2}
    # the epoch cap reaches the scan as a partition filter, not a post-scan filter
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "epoch" in plan.split("PartitionFilters", 1)[1][:200]

    # uncapped poll still sees everything pending
    assert {row[0] for row in read_pending(spark, log_path, table)
            .select("epoch").distinct().collect()} == {1, 2, 3}


def test_replayer_run_max_epochs_resumes(spark, tmp_path):
    """O4 driver loop: run(max_epochs=N) applies the N oldest pending
    epochs and a later uncapped run finishes the log exactly-once."""
    from etl_gmaps_spark.oracle import replay_oracle
    from etl_gmaps_spark.streaming.replay import Replayer
    from tests.conftest import assert_table_equal

    base = gen_base(spark, n_docs=100, seed=57)
    log = gen_changelog(spark, n_docs=100, n_events=1000, seed=57, epoch_size=250, dup_epochs=())
    table = SnapshotTable.create(spark, str(tmp_path / "tbl"), TARGET_SCHEMA, base_df=base)
    r = Replayer(table)
    m1 = r.run(log, max_epochs=2)
    assert m1.epochs_applied == 2
    m2 = r.run(log, max_epochs=2)
    assert m2.epochs_applied == 2 and m2.epochs_skipped == 2
    m3 = r.run(log)  # nothing left
    assert m3.epochs_applied == 0 and m3.epochs_skipped == 4
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_scalar_functions(spark):
    from etl_gmaps_spark.functions import (
        clean_na,
        eligible_for_email,
        extract_emails,
        haversine_km,
        normalize_phone,
        plus_code,
        strip_security_prefix,
        valid_email,
    )

    df = spark.createDataFrame(
        [
            (
                "contact a@b.com or c@d.org, again a@b.com",
                "https://example.com",
                " +49 (0)30-123 ",
                " nan ",
                ")]}'{\"x\":1}",
            )
        ],
        "body string, website string, phone string, maybe string, raw string",
    )
    row = df.select(
        extract_emails(F.col("body")).alias("emails"),
        eligible_for_email(F.col("website")).alias("ok"),
        eligible_for_email(F.lit("http://facebook.com/x")).alias("not_ok"),
        valid_email(F.lit("a@b.com")).alias("v1"),
        valid_email(F.lit("nope")).alias("v2"),
        normalize_phone(F.col("phone")).alias("ph"),
        clean_na(F.col("maybe")).alias("na"),
        strip_security_prefix(F.col("raw")).alias("json"),
        F.round(haversine_km(F.lit(52.52), F.lit(13.405), F.lit(48.8566), F.lit(2.3522)), 0).alias("berlin_paris"),
        plus_code(F.lit(47.365590), F.lit(8.524997)).alias("olc"),
    ).collect()[0]
    assert row["emails"] == ["a@b.com", "c@d.org"]  # order-preserving dedupe
    assert row["ok"] is True and row["not_ok"] is False
    assert row["v1"] is True and row["v2"] is False
    assert row["ph"] == "+49030123"
    assert row["na"] is None
    assert row["json"] == '{"x":1}'
    assert 876.0 <= row["berlin_paris"] <= 880.0  # known distance ~877-880 km
    # hand-derived from the OLC spec digit algebra for these exact coords
    # (the +6W code often quoted for Zurich is a nearby cell's center)
    assert row["olc"] == "8FVC9G8F+6X"
