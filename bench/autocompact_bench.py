"""Auto-compaction policy, measured (round-4 follow-through to
BENCH/MOR.md §3: turn the pytest assertion into numbers).

Shape that needs the policy: a LONG run of SMALL uniform MoR epochs
over a big table — each epoch's delta/base ratio is tiny (the ratio
trigger never fires, correctly), but every epoch appends one delta
file per bucket, so without maintenance the reconcile window reads an
O(epochs)-deep chain per bucket. The depth trigger (chain >= 8)
bounds it.

Runs the SAME log twice into identical MoR tables — Replayer with
auto_compact on vs off — and reports replay wall, post-replay read
cost, live file count, deepest delta chain, and compaction commits.

Usage:
    taskset -c 0-9 python bench/autocompact_bench.py [n_docs] [n_epochs] [epoch_size]
Defaults 2_000_000 docs, 24 epochs x 20_000 events. One JSON line out.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from time import monotonic

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gmaps_spark.datagen import gen_base, gen_changelog
from etl_gmaps_spark.schemas import TARGET_SCHEMA
from etl_gmaps_spark.session import get_spark
from etl_gmaps_spark.streaming.replay import Replayer
from etl_gmaps_spark.tableio import SnapshotTable


def chain_stats(table: SnapshotTable) -> dict:
    resolved = table._resolve(table.snapshot())
    files = sum(
        len(e.get("base", [])) + len(e.get("deltas", [])) for e in resolved.values()
    )
    max_chain = max((len(e.get("deltas", [])) for e in resolved.values()), default=0)
    return {"live_files": files, "max_chain": max_chain}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    epoch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    n_events = n_epochs * epoch_size
    workdir = tempfile.mkdtemp(prefix="autocompact_", dir=os.environ.get("BENCH_DIR"))
    spark = get_spark("autocompact", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    try:
        base = gen_base(spark, n_docs=n_docs, seed=13)
        log = gen_changelog(
            spark, n_docs=n_docs, n_events=n_events, seed=13,
            epoch_size=epoch_size, dup_epochs=(), hot_frac=0.0,
        )
        log_path = os.path.join(workdir, "log")
        log.write.mode("overwrite").partitionBy("epoch").parquet(log_path)
        log = spark.read.parquet(log_path)

        out: dict[str, dict] = {}
        for policy in (False, True):
            table = SnapshotTable.create(
                spark, os.path.join(workdir, f"t{int(policy)}"), TARGET_SCHEMA,
                n_buckets=32, base_df=base, merge_mode="mor",
            )
            t0 = monotonic()
            # gc_tombstones off in BOTH legs: this A/B isolates the
            # delta-chain compaction policy; the (orthogonal) GC cadence
            # would fire its tombstone_stats aggregation at commit 16
            # and muddy the policy-off control's timing
            Replayer(table, auto_compact=policy, gc_tombstones=False).run(log)
            replay_sec = monotonic() - t0
            t0 = monotonic()
            rows = table.read().count()
            read_sec = monotonic() - t0
            compacts = sum(
                1 for c in table.snapshot()["properties"].get("commits", [])
                if c.get("kind") == "compact"
            )
            out["policy_on" if policy else "policy_off"] = {
                "replay_sec": round(replay_sec, 2),
                "read_sec": round(read_sec, 2),
                "final_rows": rows,
                "compact_commits": compacts,
                **chain_stats(table),
            }
        out["n_docs"], out["n_epochs"], out["epoch_size"] = n_docs, n_epochs, epoch_size
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(0 if main() is None else 0)
