"""Round-2 surface tests: export sinks (S5/S6), map builders (F9/F10),
validity filter (P5), ledger query surface (S4/O3), multi-band LSH."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_write_csv_stringifies_nested(spark, tmp_path):
    """S5: array/struct cells land as compact JSON strings (the
    reference's stringify() cell encoding, gmaps/entry.go:195-231)."""
    from etl_gmaps_spark.sinks import write_csv

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"city": "X", "country": "US"})],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("cats", T.ArrayType(T.StringType())),
                T.StructField(
                    "addr",
                    T.StructType(
                        [
                            T.StructField("city", T.StringType()),
                            T.StructField("country", T.StringType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    out = str(tmp_path / "csv")
    write_csv(df, out, header=True)
    back = spark.read.option("header", "true").csv(out).collect()[0]
    assert back["cats"] == '["a","b"]'
    assert back["addr"] == '{"city":"X","country":"US"}'


def test_write_json_roundtrip_keeps_arrays(spark, tmp_path):
    """S6: JSON-lines sink keeps nested columns nested."""
    from etl_gmaps_spark.sinks import write_json

    df = spark.createDataFrame([(1, ["x", "y"])], "id long, words array<string>")
    out = str(tmp_path / "json")
    write_json(df, out)
    back = spark.read.schema("id long, words array<string>").json(out).collect()[0]
    assert back["words"] == ["x", "y"]


def test_popular_times_real_maptype(spark):
    """F10: the builder yields map<string, map<int,int>> — the exact
    getPopularTimes shape (gmaps/entry.go:519-568)."""
    from etl_gmaps_spark.functions import popular_times_map

    df = spark.createDataFrame(
        [(1, [(1, [(9, 40), (10, 80)]), (7, [(12, 55)])])],
        "id long, items array<struct<day:int, times:array<struct<hour:int,busy:int>>>>",
    )
    out = df.select(popular_times_map(F.col("items")).alias("pt"))
    dt = out.schema["pt"].dataType
    assert isinstance(dt, T.MapType)
    assert isinstance(dt.valueType, T.MapType)
    row = out.collect()[0]["pt"]
    assert row["Monday"] == {9: 40, 10: 80}
    assert row["Sunday"] == {12: 55}


def test_hours_map_real_maptype(spark):
    """F9: map<string, array<string>> (getHours, gmaps/entry.go:498-517)."""
    from etl_gmaps_spark.functions import hours_map

    df = spark.createDataFrame(
        [(1, [("Monday", ["8-12", "13-17"])])],
        "id long, items array<struct<day:string, times:array<string>>>",
    )
    out = df.select(hours_map(F.col("items")).alias("oh"))
    assert isinstance(out.schema["oh"].dataType, T.MapType)
    assert out.collect()[0]["oh"]["Monday"] == ["8-12", "13-17"]


def test_valid_entry_filter(spark):
    """P5 (Entry.Validate, gmaps/entry.go:145-155)."""
    from etl_gmaps_spark.functions import valid_entry

    df = spark.createDataFrame(
        [("t", "c"), ("", "c"), ("t", ""), (None, "c"), ("t", None)],
        "title string, category string",
    )
    kept = df.filter(valid_entry(F.col("title"), F.col("category"))).collect()
    assert [(r.title, r.category) for r in kept] == [("t", "c")]


def test_commit_log_query_surface(spark, tmp_path):
    """S4/O3: commit ledger select — newest first, status filter,
    LIMIT (web/sqlite/sqlite.go:59-101 analog)."""
    from etl_gmaps_spark.datagen import gen_base, gen_changelog
    from etl_gmaps_spark.schemas import TARGET_SCHEMA
    from etl_gmaps_spark.streaming.replay import Replayer
    from etl_gmaps_spark.tableio import SnapshotTable

    base = gen_base(spark, n_docs=100, seed=3)
    log = gen_changelog(spark, n_docs=100, n_events=1500, seed=3, epoch_size=500)
    table = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), TARGET_SCHEMA, n_buckets=4, base_df=base
    )
    Replayer(table).run(log)
    all_commits = table.commit_log()
    assert [c["snapshot"] for c in all_commits] == [4, 3, 2]  # newest first
    assert all(c["status"] == "ok" for c in all_commits)
    assert table.commit_log(latest=1)[0]["epochs"] == [2]
    assert table.commit_log(epoch=0)[0]["snapshot"] == 2
    assert table.commit_log(status="failed") == []
    assert sum(c["events"] for c in all_commits) == 1500


def test_embedding_lsh_multiband_recovers_pairs(spark):
    """Multi-band OR: pairs missed by one band's buckets are found by
    another; banded result ⊆ all-pairs result and catches the planted
    exact duplicates with certainty (sign-invariant scaling)."""
    from etl_gmaps_spark.operators.dedupe import embedding_cosine_pairs

    rows = []
    for i in range(30):
        v = [((i * 37 + d * 7919) % 200 - 100) / 100.0 for d in range(8)]
        rows.append((i, v))
        if i < 5:
            rows.append((100 + i, [x * 1.01 for x in v]))  # planted dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    allp = embedding_cosine_pairs(df, threshold=0.999)
    banded = embedding_cosine_pairs(df, threshold=0.999, lsh_planes=6, lsh_bands=3)
    allset = {(r.id_a, r.id_b) for r in allp.collect()}
    bandset = {(r.id_a, r.id_b) for r in banded.collect()}
    assert bandset <= allset
    planted = {(i, 100 + i) for i in range(5)}
    assert planted <= bandset  # scaled copies share every sign bucket


class TestColumnProjection:
    """P10: dependency-closure projection (core_logic.py:356-405)."""

    def test_closure_rules(self):
        from etl_gmaps_spark.operators.projection import closure_columns

        cols = closure_columns(["title", "complete_address", "latitude"])
        # group expansion, pair completion, always-kept, order preserved
        assert cols[:3] == ["title", "complete_address", "latitude"]
        for forced in ["street", "city", "state", "zip", "country",
                       "longitude", "search_origin_city"]:
            assert forced in cols
        assert len(cols) == len(set(cols))

    def test_closure_fixed_point_group_member_in_pair(self):
        from etl_gmaps_spark.operators.projection import closure_columns

        # a group member that is itself half of a pair must pull the
        # other half in on the second iteration
        cols = closure_columns(
            ["g"],
            always=[],
            groups={"g": ["a"]},
            pairs=[("a", "b")],
        )
        assert cols == ["g", "a", "b"]

    def test_project_drops_missing_and_prunes_unselected(self, spark):
        from etl_gmaps_spark.operators.projection import project_columns

        df = spark.createDataFrame(
            [(1, "t", "x")], "cid int, title string, acctbal string"
        )
        out = project_columns(df, ["cid", "latitude"], always=[])
        # latitude+longitude not in df -> dropped; acctbal/title unselected
        assert out.columns == ["cid"]

    def test_project_empty_selection_returns_named_empty(self, spark):
        from etl_gmaps_spark.operators.projection import project_columns

        df = spark.createDataFrame([(1,)], "cid int")
        out = project_columns(df, ["nope"], always=[])
        assert out.columns == ["nope"] and out.count() == 0
