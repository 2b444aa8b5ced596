"""Batch-4 catalog queries: near-dup families, email extraction,
scalar pack, OLC, streaming/evolution e2e. Oracle parity for these runs
in tools/check_contract.py (and the driver gate); here we assert the
semantic invariants at sf0.001 so pytest stays fast."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_gmaps_spark.plans import queries as catalog

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return catalog.QUERIES[name](spark, SF)


def test_ngram_jaccard_matches_minhash_verify(spark):
    """The prefix+positional-filtered exact trigram Jaccard (threshold
    0.5) finds the same near-dup PAIRS the bigram MinHash-LSH pipeline
    verifies (the planted dupes); jaccard values differ (trigram vs
    bigram) but every reported value clears the threshold."""
    direct = {(r.id_a, r.id_b): r.jaccard for r in q(spark, "ngram_jaccard_dedupe").collect()}
    lsh_pairs = {(r.id_a, r.id_b) for r in q(spark, "minhash_lsh_dedupe").collect()}
    assert lsh_pairs <= set(direct)
    assert all(v >= 0.5 for v in direct.values())


def test_simhash_hamming_pairs_consistent(spark):
    fps = {r.doc_id: r.simhash for r in q(spark, "simhash_fingerprint").collect()}
    pairs = q(spark, "simhash_hamming_pairs").collect()
    assert pairs
    for r in pairs:
        assert r.id_a < r.id_b
        assert bin(fps[r.id_a] ^ fps[r.id_b]).count("1") == r.hamming <= 1


def test_embedding_neardup_finds_planted(spark):
    rows = q(spark, "embedding_neardup").collect()
    got = {(r.id_a, r.id_b): r.cosine for r in rows}
    # every scaled copy pairs with its original at cosine exactly 1.0
    for i in range(15):
        assert got.get((i, i + 10000)) == pytest.approx(1.0), f"scaled pair {i} missing"
    # noisy copies pair with their originals above the threshold
    noisy = [k for k in got if k[1] >= 20000 and k[0] == k[1] - 20000]
    assert len(noisy) == 15
    # nothing between unrelated originals (max natural cosine ~0.51)
    assert not [k for k in got if k[0] < 10000 and k[1] < 10000]


def test_email_extract_shape(spark):
    rows = q(spark, "email_extract").collect()
    assert rows
    email_re = re.compile(r"^[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}$")
    for r in rows[:50]:
        es = r.emails.split(",")
        assert r.n_emails == len(es) == 2  # repeated address deduped
        assert all(email_re.match(e) for e in es)
        assert es == sorted(es)


def test_scalar_normalize(spark):
    r = q(spark, "scalar_normalize").filter(F.col("c_custkey") == 5).first()
    assert r.phone_digits.startswith("+1") and re.match(r"^\+\d+$", r.phone_digits)
    assert ", USA" in r.address and ", , " not in r.address  # null segment skipped
    assert " " in r.url_decoded and "%20" not in r.url_decoded
    assert not r.unwrapped.startswith(")]}'")


def test_olc_format_and_determinism(spark):
    rows = q(spark, "olc_encode").orderBy("c_custkey").limit(20).collect()
    olc_re = re.compile(r"^[23456789CFGHJMPQRVWX]{8}\+[23456789CFGHJMPQRVWX]{2}$")
    assert all(olc_re.match(r.olc) for r in rows)
    again = q(spark, "olc_encode").orderBy("c_custkey").limit(20).collect()
    assert [r.olc for r in rows] == [r.olc for r in again]


def test_stream_replay_e2e_matches_batch_engine(spark):
    """Streaming availableNow apply lands the same final state as the
    batch Replayer on the same (seed=7) log."""
    import tempfile

    from etl_gmaps_spark.datagen import gen_base, gen_changelog
    from etl_gmaps_spark.schemas import TARGET_SCHEMA
    from etl_gmaps_spark.streaming.replay import Replayer
    from etl_gmaps_spark.tableio import SnapshotTable

    stream_final = {
        r.doc_id: (r.n_tok, r.tok_sum, r.source)
        for r in q(spark, "stream_replay_e2e").collect()
    }
    wd = tempfile.mkdtemp(prefix="batch_twin_")
    base = gen_base(spark, n_docs=300, seed=7)
    log = gen_changelog(spark, n_docs=300, n_events=3000, seed=7, epoch_size=1000)
    table = SnapshotTable.create(spark, f"{wd}/tbl", TARGET_SCHEMA, n_buckets=8, base_df=base)
    Replayer(table).run(log)
    batch_final = {
        r.doc_id: (r.n_tok, r.tok_sum, r.source)
        for r in table.read()
        .select(
            "doc_id", "n_tok", "source",
            F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias("tok_sum"),
        )
        .select("doc_id", "n_tok", "tok_sum", "source")
        .collect()
    }
    assert stream_final == batch_final


def test_schema_evolution_e2e_has_lang(spark):
    df = q(spark, "schema_evolution_e2e")
    assert "lang" in df.columns
    pdf = df.toPandas()
    assert pdf["lang"].isna().any()  # pre-split rows backfilled null
    assert pdf["lang"].notna().any()  # post-split rows carry the column


def test_entry_parse_full_recover_and_values(spark):
    pdf = q(spark, "entry_parse_full").toPandas().set_index("doc_id")
    bad = pdf[pdf.index % 97 == 0]
    good = pdf[pdf.index % 97 != 0]
    assert bad["had_error"].all() and bad["title"].isna().all()
    assert not good["had_error"].any()
    some = good.iloc[0]
    did = good.index[0]
    assert some["rating"] == float((did * 7) % 50)
    assert some["review_count"] == (did * 13) % 1000
    assert some["lat"] == float((did * 3) % 180 - 90)


def test_line_file_scan_ids(spark):
    rows = q(spark, "line_file_scan").collect()
    assert len(rows) == 100  # blank lines dropped
    with_id = [r for r in rows if r.seed_id.startswith("seed-")]
    assert len(with_id) == 50
    for r in rows:
        assert r.query and "#!#" not in r.query


def test_drift_csv_deadletter_counts(spark):
    got = {r.bucket: r.n_rows for r in q(spark, "drift_csv_deadletter").collect()}
    # 200 rows: i%19==0 short (11 rows), else i%23==0 long (8), else i%31==0
    # type-error (6): short/long tolerated as clean, type errors quarantined
    assert got["dead_letter"] == sum(
        1 for i in range(200) if i % 19 != 0 and i % 23 != 0 and i % 31 == 0
    )
    assert got["clean"] + got["dead_letter"] == 200
