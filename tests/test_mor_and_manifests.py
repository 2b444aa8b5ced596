"""Round-3 table-format scale features: merge-on-read deltas,
manifest-based snapshot metadata, ledger roll-up, epoch watermark,
bucket-hash stamping, failed-commit lineage.

These target the two at-scale design risks VERDICT r2 named: uniform
batches turning bucket-CoW into whole-table rewrites per commit, and
snapshot JSON growing O(table × history).
"""

from __future__ import annotations

import json
import os

import datetime as _dt

import pytest
from pyspark.sql import functions as F

from etl_gmaps_spark.datagen import gen_base, gen_changelog
from etl_gmaps_spark.oracle import replay_oracle
from etl_gmaps_spark.schemas import TARGET_SCHEMA
from etl_gmaps_spark.streaming.replay import Replayer
from etl_gmaps_spark.tableio import BucketHashMismatch, EpochSet, SnapshotTable
from tests.conftest import assert_table_equal


def make_table(spark, tmp_path, base=None, n_buckets=8, **kw):
    return SnapshotTable.create(
        spark, str(tmp_path / "tbl"), TARGET_SCHEMA, key_col="doc_id",
        n_buckets=n_buckets, base_df=base, **kw,
    )


# ------------------------------------------------------------- MoR mode
def test_mor_replay_matches_oracle(spark, tmp_path):
    """The full replay scenario set (dup epochs, deletes, hot keys,
    out-of-order) produces byte-identical final state in MoR mode."""
    base = gen_base(spark, n_docs=300, seed=42)
    log = gen_changelog(spark, n_docs=300, n_events=3000, seed=42, epoch_size=500)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    m = Replayer(table).run(log)
    assert m.events_processed == 3000
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_mor_uniform_batch_write_amplification(spark, tmp_path):
    """THE MoR payoff: a small batch over a large table writes O(batch)
    bytes, while CoW rewrites every touched bucket. The batch touches
    all buckets uniformly (worst CoW case), so CoW ~rewrites the whole
    table and MoR writes ≲2x the batch's own parquet size."""
    n_docs, n_events = 4000, 200
    base = gen_base(spark, n_docs=n_docs, seed=9)
    log = gen_changelog(
        spark, n_docs=n_docs, n_events=n_events, seed=9,
        epoch_size=n_events, dup_epochs=(), hot_frac=0.0,
    )
    cow = SnapshotTable.create(
        spark, str(tmp_path / "cow"), TARGET_SCHEMA, n_buckets=8, base_df=base
    )
    mor = SnapshotTable.create(
        spark, str(tmp_path / "mor"), TARGET_SCHEMA, n_buckets=8, base_df=base,
        merge_mode="mor",
    )
    cow_bytes = Replayer(cow).run(log)  # noqa: F841 — commit stats below
    Replayer(mor).run(log)
    cow_commit = cow.commit_log(latest=1)[0]
    mor_commit = mor.commit_log(latest=1)[0]
    base_bytes = sum(
        os.path.getsize(f) for fl in cow.files_map(version=1).values() for f in fl
    )
    # CoW rewrote most of the table; MoR wrote a delta a fraction of it
    assert cow_commit["bytes_rewritten"] > 0.5 * base_bytes
    assert mor_commit["bytes_rewritten"] < 0.25 * cow_commit["bytes_rewritten"]
    # and both read back to the same state
    assert_table_equal(mor.read(), cow.read().toPandas())


def test_maintenance_plan_uses_manifest_sizes(spark, tmp_path, monkeypatch):
    """r4 watch item: manifests cache per-file sizes at write time, so
    maintenance_plan is a pure manifest walk — zero os.stat calls at
    10^5-bucket scale. Proven by making getsize explode: the plan must
    still produce the same answer. Legacy entries (no size keys) fall
    back to stat."""
    base = gen_base(spark, n_docs=100, seed=31)
    log = gen_changelog(spark, n_docs=100, n_events=1000, seed=31, epoch_size=250, dup_epochs=())
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, base_df=base, merge_mode="mor"
    )
    Replayer(table, auto_compact=False, gc_tombstones=False).run(log)

    resolved = table._resolve(table.snapshot())
    dirty = [e for e in resolved.values() if e.get("deltas")]
    assert dirty, "fixture produced no delta chains"
    for e in dirty:  # sizes cached at write time, and accurate
        assert e["delta_sizes"] == [os.path.getsize(f) for f in e["deltas"]]
        assert e["base_sizes"] == [os.path.getsize(f) for f in e["base"]]

    want = table.maintenance_plan(max_chain=2)

    import etl_gmaps_spark.tableio.snapshot_table as st_mod

    def boom(_path):
        raise AssertionError("maintenance_plan called os.stat despite cached sizes")

    monkeypatch.setattr(st_mod.os.path, "getsize", boom)
    assert table.maintenance_plan(max_chain=2) == want
    monkeypatch.undo()

    # legacy manifests (pre-size entries) still work via the stat path
    m_path = table.snapshot()["manifests"][-1]
    m = json.load(open(m_path))
    for e in m["buckets"].values():
        e.pop("base_sizes", None)
        e.pop("delta_sizes", None)
    with open(m_path, "w") as fh:
        json.dump(m, fh)
    table._manifest_cache.clear()
    assert table.maintenance_plan(max_chain=2) == want


def test_mor_compact_folds_deltas(spark, tmp_path):
    base = gen_base(spark, n_docs=200, seed=3)
    log = gen_changelog(spark, n_docs=200, n_events=2000, seed=3, epoch_size=500)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    # auto_compact off: this test exercises MANUAL compact() on intact
    # delta chains (the policy would fold them mid-replay)
    Replayer(table, auto_compact=False).run(log)
    before = table.read().toPandas()
    # deltas exist — assert on the resolved manifest, not path shape
    # (nonce'd data dirs made the old "/s1/ not in path" check vacuous)
    resolved = table._resolve(table.snapshot())
    assert any(e.get("deltas") for e in resolved.values())
    res = table.compact()
    assert res.buckets_rewritten > 0
    fm2 = {
        b: e for b, e in table._resolve(table.snapshot()).items()
    }
    assert all(not e.get("deltas") for e in fm2.values())  # all folded
    assert_table_equal(table.read(), before)
    # compaction is itself a ledger-visible commit
    assert table.commit_log(latest=1)[0].get("kind") == "compact"


def test_mor_crash_resume(spark, tmp_path):
    from etl_gmaps_spark.streaming.replay import InjectedCrash

    base = gen_base(spark, n_docs=150, seed=31)
    log = gen_changelog(spark, n_docs=150, n_events=1500, seed=31, epoch_size=300)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    with pytest.raises(InjectedCrash):
        Replayer(table).run(log, fail_after_epochs=2)
    m = Replayer(table).run(log)
    assert m.epochs_skipped >= 2
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_mor_requires_lsn(spark, tmp_path):
    table = make_table(spark, tmp_path, merge_mode="mor")
    src = spark.createDataFrame(
        [("doc-1", [1, 2], 2, "web", "U")],
        "doc_id string, tokens array<int>, n_tok int, source string, op string",
    )
    with pytest.raises(ValueError, match="lsn"):
        table.merge(src, lsn_col="missing_lsn")


# ----------------------------------------------------- manifest scaling
def test_snapshot_metadata_is_o_touched(spark, tmp_path):
    """v{N}.json carries a manifest LIST, so its size is O(touched
    buckets + 1) per commit, not O(table x history): after many commits
    the newest snapshot json stays flat while the per-commit manifest
    names only the touched buckets."""
    base = gen_base(spark, n_docs=800, seed=5)
    table = make_table(spark, tmp_path, base, n_buckets=16)
    r = Replayer(table)
    sizes = []
    for i in range(6):
        # each batch touches a handful of keys -> few buckets
        batch = spark.createDataFrame(
            [(f"doc-{i:08d}", [i], 1, "web", "U", 1000 + i, i, _dt.datetime(2023, 11, 14, 0, 0, i))],
            "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long, epoch long, ts timestamp",
        )
        r.apply_batch(batch, epoch=100 + i)
        sizes.append(os.path.getsize(os.path.join(table.meta_dir, f"v{table.snapshot()['version']}.json")))
    # metadata growth per commit is bounded (manifest list of paths),
    # nowhere near O(total files): ~constant within a small tolerance
    assert max(sizes) - min(sizes) < 2000, sizes
    # the last commit's own manifest lists only its touched bucket(s)
    last_manifest = table.snapshot()["manifests"][-1]
    with open(last_manifest) as fh:
        entries = json.load(fh)["buckets"]
    assert len(entries) <= 2
    # untouched buckets resolve through OLDER manifests (reused by path)
    assert len(table.files_map()) == 16
    # time-travel still works across the manifest chain
    assert table.read(version=2).count() > 0


def test_manifest_list_consolidation(spark, tmp_path):
    """Past MANIFEST_COMPACT_AT commits the manifest list folds to one
    consolidated manifest — resolution cost stays O(1) files."""
    from etl_gmaps_spark.tableio.snapshot_table import MANIFEST_COMPACT_AT

    base = gen_base(spark, n_docs=100, seed=7)
    table = make_table(spark, tmp_path, base, n_buckets=4)
    r = Replayer(table)
    for i in range(MANIFEST_COMPACT_AT + 2):
        batch = spark.createDataFrame(
            [(f"doc-{i % 50:08d}", [i], 1, "web", "U", 2000 + i, i, _dt.datetime(2023, 11, 14, 0, 0, i % 60))],
            "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long, epoch long, ts timestamp",
        )
        r.apply_batch(batch, epoch=200 + i)
    assert len(table.snapshot()["manifests"]) <= MANIFEST_COMPACT_AT
    assert table.read().count() > 0


def test_ledger_rollup_bounds_commit_list(spark, tmp_path):
    base = gen_base(spark, n_docs=60, seed=8)
    table = make_table(spark, tmp_path, base, n_buckets=4, ledger_keep=5)
    r = Replayer(table)
    for i in range(9):
        batch = spark.createDataFrame(
            [(f"doc-{i:08d}", [i], 1, "web", "U", 3000 + i, i, _dt.datetime(2023, 11, 14, 0, 1, i))],
            "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long, epoch long, ts timestamp",
        )
        r.apply_batch(batch, epoch=300 + i)
    props = table.properties()
    assert len(props["commits"]) == 5  # newest K kept in full
    ru = props["commits_rollup"]
    assert ru["commits"] == 4 and ru["events"] == 4  # older rows aggregated
    assert ru["first_snapshot"] == 2 and ru["last_snapshot"] == 5


def test_epoch_watermark_compaction(spark, tmp_path):
    """A contiguous epoch history stores ONE integer, not the list."""
    base = gen_base(spark, n_docs=100, seed=4)
    log = gen_changelog(spark, n_docs=100, n_events=2000, seed=4, epoch_size=200, dup_epochs=())
    table = make_table(spark, tmp_path, base, n_buckets=4)
    Replayer(table).run(log)
    props = table.properties()
    assert props["epoch_ranges"] == [[0, 10]]
    assert props["epochs"] == []  # fully compacted
    es = table.applied_epochs()
    assert isinstance(es, EpochSet)
    assert 9 in es and 10 not in es
    # a sparse out-of-band key stays explicit without touching the range
    batch = spark.createDataFrame(
        [("doc-00000001", [7], 1, "web", "U", 99999, 0, _dt.datetime(2023, 11, 14, 1, 0, 0))],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long, epoch long, ts timestamp",
    )
    Replayer(table).apply_batch(batch, epoch=1_000_000_123)
    props = table.properties()
    assert props["epoch_ranges"] == [[0, 10]]
    assert props["epochs"] == [1_000_000_123]


# --------------------------------------------------- hash stamp, lineage
def test_bucket_hash_mismatch_fails_loudly(spark, tmp_path):
    base = gen_base(spark, n_docs=40, seed=6)
    table = make_table(spark, tmp_path, base, n_buckets=4)
    # simulate a table persisted under a different hash function
    snap = table.snapshot()
    snap["bucket_hash"] = "xxhash64_v0"
    snap["version"] += 1
    table._commit_snapshot(snap)
    src = spark.createDataFrame(
        [("doc-00000001", [1], 1, "web", "U", 10, 0, _dt.datetime(2023, 11, 14, 2, 0, 0))],
        "doc_id string, tokens array<int>, n_tok int, source string, op string, lsn long, epoch long, ts timestamp",
    )
    with pytest.raises(BucketHashMismatch):
        table.merge(src, epoch=1)
    with pytest.raises(BucketHashMismatch):
        table.read_buckets([0])


def test_failed_commit_lineage(spark, tmp_path):
    """An apply that dies mid-write leaves a status='failed' ledger row
    (the reference job state machine's `failed`, web/job.go:11-16);
    resume applies the epoch and the ledger shows failed-then-ok."""
    base = gen_base(spark, n_docs=80, seed=12)
    log = gen_changelog(spark, n_docs=80, n_events=800, seed=12, epoch_size=400, dup_epochs=())
    table = make_table(spark, tmp_path, base, n_buckets=4)
    r = Replayer(table)
    e0 = log.filter(F.col("epoch") == 0)
    orig = table._write_buckets
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        raise OSError("disk full (injected)")

    table._write_buckets = boom
    with pytest.raises(OSError):
        r.apply_batch(e0, epoch=0)
    table._write_buckets = orig
    failed = table.commit_log(status="failed")
    assert len(failed) == 1 and failed[0]["epochs"] == [0]
    assert "disk full" in failed[0]["error"]
    # resume: the epoch applies cleanly; ledger shows both rows
    r2 = Replayer(table)
    r2.apply_batch(e0, epoch=0)
    ok = table.commit_log(status="ok")
    assert any(c.get("epochs") == [0] for c in ok)
    assert len(table.commit_log(status="failed")) == 1
    assert_table_equal(
        table.read(),
        replay_oracle(base.toPandas(), e0.toPandas()),
    )


def test_grouped_commit_detects_diluted_dup_epoch(spark, tmp_path):
    """One replayed epoch inside a 10-epoch grouped commit is only +10%
    raw rows — exactly at the old fixed 1.10 trip level, so it was
    missed and rows_applied silently counted the duplicate. The scaled
    threshold (0.4*raw/(k+1) with an HLL noise floor) must catch it:
    events_processed and the checkpoint lineage count each event once."""
    base = gen_base(spark, n_docs=200, seed=14)
    log = gen_changelog(
        spark, n_docs=200, n_events=2000, seed=14, epoch_size=200, dup_epochs=(2,)
    )
    table = make_table(spark, tmp_path, base, n_buckets=4)
    m = Replayer(table).run(log, batch_epochs=10)
    assert m.epochs_applied == 10
    assert m.events_processed == 2000  # the replayed epoch counted once
    import pandas as pd

    ckpt = pd.DataFrame(table.checkpoint_rows())
    assert ckpt["rows_applied"].sum() == 2000
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)


def test_mor_reconcile_windows_only_delta_buckets(spark, tmp_path):
    """Reads of a MoR table window ONLY the buckets that have deltas;
    pure-base buckets are scanned plain and unioned in. A 1-key delta
    on an 8-bucket table must not re-shuffle the other 7 buckets."""
    base = gen_base(spark, n_docs=400, seed=11)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    one = base.limit(1).collect()[0]
    batch = spark.createDataFrame(
        [(one["doc_id"], [1, 2, 3], 3, one["source"], 10_000, "U")],
        schema="doc_id string, tokens array<int>, n_tok int, source string, lsn long, op string",
    )
    table.merge(batch, epoch=1)
    snap = table.snapshot()
    resolved = table._resolve(snap)
    dirty = [b for b, e in resolved.items() if e.get("deltas")]
    assert len(dirty) == 1  # the delta touched exactly one bucket
    # optimizedPlan: AQE's executedPlan string is lazy (isFinalPlan=false)
    # and may elide subtrees; the optimized logical plan is stable.
    plan = table.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan  # clean buckets bypass the reconcile window
    assert plan.count("Window ") == 1
    # small delta => broadcast key-split: untouched base rows of the
    # dirty bucket leave via an ANTI join instead of entering the window
    assert "LeftAnti" in plan
    # correctness: the updated row wins, everything else unchanged
    got = table.read().filter(F.col("doc_id") == one["doc_id"]).collect()[0]
    assert got["tokens"] == [1, 2, 3]
    assert table.read().count() == 400


def test_mor_compact_bounded_buckets(spark, tmp_path):
    """compact(buckets=[...]) folds only the requested buckets' deltas
    — the incremental maintenance mode a 10^4-bucket table runs on the
    deepest delta chains — leaving other buckets' deltas intact and the
    table state unchanged."""
    base = gen_base(spark, n_docs=400, seed=17)
    log = gen_changelog(spark, n_docs=400, n_events=2000, seed=17, epoch_size=1000)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    Replayer(table, auto_compact=False).run(log)  # keep chains intact
    expected = replay_oracle(base.toPandas(), log.toPandas())
    resolved = table._resolve(table.snapshot())
    dirty = sorted(int(b) for b, e in resolved.items() if e.get("deltas"))
    assert len(dirty) >= 2
    target = dirty[:1]
    table.compact(buckets=target)
    resolved = table._resolve(table.snapshot())
    assert not resolved[str(target[0])].get("deltas")  # folded
    still_dirty = [int(b) for b, e in resolved.items() if e.get("deltas")]
    assert set(still_dirty) == set(dirty[1:])  # others untouched
    assert_table_equal(table.read(), expected)


def test_expire_snapshots_preserves_live_mor_deltas(spark, tmp_path):
    """Snapshot expiry must keep every base/delta file the RETAINED
    snapshots' manifests still reference — older s{N} dirs hold live
    MoR files, so liveness is manifest-resolved, not dir-aged."""
    base = gen_base(spark, n_docs=300, seed=29)
    log = gen_changelog(spark, n_docs=300, n_events=3000, seed=29, epoch_size=500)
    table = make_table(spark, tmp_path, base, merge_mode="mor")
    Replayer(table, auto_compact=False).run(log)  # keep live deltas
    expected = replay_oracle(base.toPandas(), log.toPandas())
    res = table.expire_snapshots(keep_last=1)
    assert res["removed_snapshots"] > 0
    # current state survives: every referenced base+delta file is intact
    resolved = table._resolve(table.snapshot())
    assert any(e.get("deltas") for e in resolved.values())
    for e in resolved.values():
        for f in list(e.get("base", [])) + list(e.get("deltas", [])):
            assert os.path.exists(f), f
    assert_table_equal(table.read(), expected)


def test_mor_rejects_null_lsn_values(spark, tmp_path):
    """A present-but-NULL lsn must fail as loudly as a missing column:
    CoW treats null source lsn as 'always wins', which no reconcile
    ordering can replicate — MoR refuses instead of diverging."""
    table = make_table(spark, tmp_path, merge_mode="mor")
    src = spark.createDataFrame(
        [("doc-1", [1], 1, "web", None, "U")],
        "doc_id string, tokens array<int>, n_tok int, source string, lsn long, op string",
    )
    with pytest.raises(ValueError, match="non-null lsn"):
        table.merge(src, epoch=1)


def test_resolve_migrates_legacy_files_layout(spark, tmp_path):
    """A snapshot written by pre-manifest code (inline 'files' map, no
    'manifests' key) must resolve to its real files — not silently as
    an empty table, which would let the next merge drop every row."""
    base = gen_base(spark, n_docs=50, seed=41)
    table = make_table(spark, tmp_path, base)
    snap = dict(table.snapshot())
    legacy_files = {b: list(fl) for b, fl in table.files_map().items()}
    snap.pop("manifests")
    snap["files"] = legacy_files
    entries = table._resolve(snap)
    assert entries == {b: {"base": fl, "deltas": []} for b, fl in legacy_files.items()}
    # and a snapshot with neither layout fails loudly
    snap.pop("files")
    with pytest.raises(ValueError, match="refusing"):
        table._resolve(snap)


def _one_row_src(spark, doc_id="doc-00000001", tokens=(1,), lsn=10, epoch=0):
    return spark.createDataFrame(
        [(doc_id, list(tokens), len(tokens), "web", "U", lsn, epoch,
          _dt.datetime(2023, 11, 14, 2, 0, 0))],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, lsn long, epoch long, ts timestamp",
    )


def test_merge_after_legacy_snapshot_keeps_untouched_buckets(spark, tmp_path):
    """ADVICE r3 (high): the first merge on a pre-manifest snapshot must
    materialize the migrated inline-'files' map as a manifest — not seed
    the manifest list empty, which silently dropped every bucket the
    commit didn't touch (1-key merge into 8 buckets left 1 bucket)."""
    base = gen_base(spark, n_docs=200, seed=7)
    table = make_table(spark, tmp_path, base, n_buckets=8)
    n_before = table.read().count()
    # rewrite v1.json in the legacy layout: inline 'files', no 'manifests'
    snap = table.snapshot()
    files = {b: fl for b, fl in table.files_map().items()}
    snap.pop("manifests")
    snap["files"] = files
    with open(os.path.join(table.meta_dir, "v1.json"), "w") as fh:
        json.dump(snap, fh)
    table._manifest_cache.clear()
    table.merge(_one_row_src(spark), epoch=1)
    assert len(table.files_map()) == 8  # every bucket survived
    assert table.read().count() == n_before  # upsert of an existing key
    assert "files" not in table.snapshot()  # migrated to manifests


def test_compact_after_legacy_snapshot_keeps_untouched_buckets(spark, tmp_path):
    """Same legacy-migration guarantee on the compact() path (it shares
    _next_manifests with merge). A legacy CoW table upgraded to MoR via
    one delta merge then compacted must keep all buckets."""
    base = gen_base(spark, n_docs=200, seed=17)
    table = make_table(spark, tmp_path, base, n_buckets=8, merge_mode="mor")
    n_before = table.read().count()
    snap = table.snapshot()
    files = {b: [f for f in e["base"]] for b, e in table._resolve(snap).items()}
    snap.pop("manifests")
    snap["files"] = files
    with open(os.path.join(table.meta_dir, "v1.json"), "w") as fh:
        json.dump(snap, fh)
    table._manifest_cache.clear()
    table.merge(_one_row_src(spark), epoch=1)  # writes one delta
    table.compact()
    assert len(table.files_map()) == 8
    assert table.read().count() == n_before


def test_losing_racer_cannot_clobber_winner_files(spark, tmp_path):
    """ADVICE r3 (medium): two racing writers target the same version;
    the loser's bucket write must land in its own attempt dir so its
    mode('overwrite') can never delete the winner's committed parquet
    files before the O_EXCL gate rejects it."""
    from etl_gmaps_spark.tableio import CommitConflict

    base = gen_base(spark, n_docs=100, seed=8)
    table = make_table(spark, tmp_path, base, n_buckets=4)
    stale = table.snapshot()  # what the loser read before losing
    table.merge(_one_row_src(spark), epoch=1)  # winner commits v2
    winner_files = [f for fl in table.files_map().values() for f in fl]
    assert winner_files and all(os.path.exists(f) for f in winner_files)
    loser = SnapshotTable(spark, table.root)
    seeded = (
        base.limit(10)
        .withColumn("_lsn", F.lit(1).cast("long"))
        .withColumn("_deleted", F.lit(False))
    )
    loser._write_buckets(seeded, version=2, key_col="doc_id", n_buckets=4)
    with pytest.raises(CommitConflict):
        loser._commit_snapshot({**stale, "version": 2})
    # the loser wrote AND lost — every committed file must still exist
    assert all(os.path.exists(f) for f in winner_files)
    assert table.read().count() == 100


def test_mor_seq_unaffected_by_digits_in_root_path(spark, tmp_path):
    """ADVICE r3 (low): the MoR commit sequence is recovered from the
    file path; the pattern must anchor to the table layout, or a root
    containing /s2024/ yields a constant sequence for every file and
    equal-lsn tie-breaks between commits go nondeterministic."""
    root = tmp_path / "s2024" / "tbl"
    base = gen_base(spark, n_docs=50, seed=3)
    table = SnapshotTable.create(
        spark, str(root), TARGET_SCHEMA, key_col="doc_id", n_buckets=4,
        base_df=base, merge_mode="mor",
    )
    # same key, SAME lsn, two commits: the later commit must win
    table.merge(_one_row_src(spark, tokens=(1,), lsn=5), epoch=1)
    table.merge(_one_row_src(spark, tokens=(2, 2), lsn=5), epoch=2)
    row = table.read().filter(F.col("doc_id") == "doc-00000001").collect()
    assert len(row) == 1 and row[0]["tokens"] == [2, 2]


def test_overwrite_remediates_bucket_hash_mismatch(spark, tmp_path):
    """ADVICE r3 (low): overwrite() rewrites every bucket under the
    current hash, so it must stamp the current bucket_hash — previously
    it carried the stale stamp forward and merges kept failing even
    after a full rewrite."""
    from etl_gmaps_spark.tableio.snapshot_table import BUCKET_HASH

    base = gen_base(spark, n_docs=40, seed=6)
    table = make_table(spark, tmp_path, base, n_buckets=4)
    snap = table.snapshot()
    snap["bucket_hash"] = "xxhash64_v0"
    snap["version"] += 1
    table._commit_snapshot(snap)
    with pytest.raises(BucketHashMismatch):
        table.merge(_one_row_src(spark), epoch=1)
    table.overwrite(table.read(include_meta=True))
    assert table.snapshot()["bucket_hash"] == BUCKET_HASH
    table.merge(_one_row_src(spark), epoch=1)  # now succeeds
    assert table.read().count() == 40


def test_auto_compact_bounds_delta_chains(spark, tmp_path):
    """VERDICT r3 #4: with the threshold policy ON, a long replay of
    small uniform MoR epochs keeps every bucket's delta chain below the
    trigger depth (reads stay ~O(base) file count instead of O(epochs)),
    compaction commits are ledger-visible, and the final state still
    equals the oracle."""
    base = gen_base(spark, n_docs=400, seed=23)
    n_buckets = 4
    log = gen_changelog(
        spark, n_docs=400, n_events=4000, seed=23, epoch_size=250,
        dup_epochs=(), hot_frac=0.0,
    )
    table = make_table(
        spark, tmp_path, base, n_buckets=n_buckets, merge_mode="mor"
    )
    max_chain = 4
    # huge ratio isolates the depth trigger so the assertion is exact
    Replayer(
        table, compact_max_chain=max_chain, compact_max_delta_ratio=1e9
    ).run(log)  # 16 epochs -> without the policy, chains reach depth 16
    resolved = table._resolve(table.snapshot())
    depths = {int(b): len(e.get("deltas", [])) for b, e in resolved.items()}
    assert max(depths.values()) < max_chain, depths
    # read cost: the reconcile window sees at most base + (max_chain-1)
    # delta files per bucket, not one file per epoch
    n_files = sum(
        len(e.get("base", [])) + len(e.get("deltas", [])) for e in resolved.values()
    )
    assert n_files <= 2 * n_buckets * max_chain
    # compaction surfaced in the ledger
    kinds = [c.get("kind") for c in table.commit_log()]
    assert "compact" in kinds
    expected = replay_oracle(base.toPandas(), log.toPandas())
    assert_table_equal(table.read(), expected)
