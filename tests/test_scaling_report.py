"""The scaling-evidence report generators (bench/scaling.py) are part
of the graded surface: BENCH/BASELINE.md is produced by them from the
launch ledger. Pure-python tests — no Spark session.
"""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scaling",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench", "scaling.py"),
)
scaling = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(scaling)


def _row(mode, n_execs, n_events, sec):
    return {
        "merge_mode": mode,
        "n_execs": n_execs,
        "n_events": n_events,
        "replay_sec": sec,
        "events_per_sec": round(n_events / sec, 1),
        "final_rows": n_events // 45,
        "write_amplification": 0.03,
        "prof": {"write_buckets": sec * 0.6, "stats_collect": sec * 0.3,
                 "driver_other": sec * 0.1, "post_write": 0.0,
                 "snapshot_commit": 0.0, "batch_other": 0.0},
        "replay_repeats": [sec * 1.2, sec],
    }


@pytest.fixture()
def ledger(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling, "REPO", str(tmp_path))
    os.makedirs(tmp_path / "BENCH", exist_ok=True)
    path = tmp_path / "ledger.jsonl"
    rows = [
        # strong pair, cow: min T1=100 (second launch), min T4=28
        _row("cow", 1, 64_000_000, 120.0),
        _row("cow", 1, 64_000_000, 100.0),
        _row("cow", 4, 64_000_000, 31.0),
        _row("cow", 4, 64_000_000, 28.0),
        # weak level, cow: 1 exec at a quarter of the events
        _row("cow", 1, 16_000_000, 30.0),
        _row("cow", 1, 16_000_000, 26.5),
        # mor has a strong pair but no weak rows yet
        _row("mor", 1, 64_000_000, 110.0),
        _row("mor", 4, 64_000_000, 29.0),
    ]
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return path


def test_weak_report_min_per_level_and_marker_idempotent(ledger):
    out = os.path.join(scaling.REPO, "BENCH", "BASELINE.md")
    with open(out, "w") as fh:
        fh.write("# strong section stays\n")
    scaling.weak_report([str(ledger), "64000000"])
    body = open(out).read()
    assert body.startswith("# strong section stays\n")
    # min(26.5, 30.0) / min(28.0, 31.0) = 0.946
    assert "0.946" in body
    assert "### COW" in body
    # mor has no 16M rows -> no mor weak section
    assert "### MOR" not in body
    # idempotent: re-running replaces, never appends a second marker
    scaling.weak_report([str(ledger), "64000000"])
    assert open(out).read().count("<!-- scaling:weak -->") == 1
    assert open(out).read().count("### COW") == 1


def test_weak_report_requires_both_levels(ledger, tmp_path):
    empty = tmp_path / "empty.jsonl"
    empty.write_text(json.dumps(_row("cow", 1, 16_000_000, 30.0)) + "\n")
    with pytest.raises(SystemExit):
        scaling.weak_report([str(empty), "64000000"])


def test_strong_report_filters_weak_rows_out(ledger, monkeypatch):
    """The 16M weak launches share the ledger; the strong 64M report's
    min-per-level must never pick one up (they'd be absurdly fast)."""
    monkeypatch.setenv("RUNS_LEDGER", str(ledger))
    monkeypatch.setenv("BENCH_MERGE_MODE", "cow")
    monkeypatch.setenv("CURVE", "0")
    monkeypatch.setattr(sys, "argv", ["scaling.py", "64000000"])
    scaling.main()
    report = open(os.path.join(scaling.REPO, "BENCH", "BASELINE.md")).read()
    # T1 min must be the 100 s launch, not the 26.5 s 16M row
    assert "| 100.0 |" in report
    assert "26.5" not in report
    # efficiency = (64e6/28 / 64e6/100) / 4 = 0.893
    assert "0.893" in report


def _mor_ledger_rows():
    return [
        _row("mor", 1, 16_000_000, 28.0),
        _row("mor", 1, 16_000_000, 27.0),
    ]


def test_section_writers_preserve_each_other(ledger, monkeypatch):
    """Regression for the marker-truncation bug: the file layout is
    [cow strong head][mor section][weak section]; rewriting ANY one of
    the three must leave the other two intact (the old code split at
    its own marker and deleted everything after it)."""
    out = os.path.join(scaling.REPO, "BENCH", "BASELINE.md")
    # add mor weak rows so both weak sections render
    with open(ledger, "a") as fh:
        for r in _mor_ledger_rows():
            fh.write(json.dumps(r) + "\n")

    monkeypatch.setenv("RUNS_LEDGER", str(ledger))
    monkeypatch.setenv("CURVE", "0")
    monkeypatch.setattr(sys, "argv", ["scaling.py", "64000000"])

    # 1. cow strong -> head
    monkeypatch.setenv("BENCH_MERGE_MODE", "cow")
    scaling.main()
    # 2. mor strong -> mor section
    monkeypatch.setenv("BENCH_MERGE_MODE", "mor")
    scaling.main()
    # 3. weak -> weak section
    scaling.weak_report([str(ledger), "64000000"])
    body = open(out).read()
    assert "Scaling efficiency" in body              # cow head
    assert "MoR scaling efficiency" in body          # mor section
    assert "Weak scaling (Gustafson)" in body        # weak section

    # rewriting the cow head must keep mor AND weak
    monkeypatch.setenv("BENCH_MERGE_MODE", "cow")
    scaling.main()
    body = open(out).read()
    assert "MoR scaling efficiency" in body
    assert "Weak scaling (Gustafson)" in body

    # rewriting mor must keep weak (and the cow head)
    monkeypatch.setenv("BENCH_MERGE_MODE", "mor")
    scaling.main()
    body = open(out).read()
    assert body.count("<!-- scaling:mor -->") == 1
    assert "Weak scaling (Gustafson)" in body
    assert "Scaling efficiency" in body

    # rewriting weak must keep mor; canonical order mor-before-weak
    scaling.weak_report([str(ledger), "64000000"])
    body = open(out).read()
    assert body.count("<!-- scaling:weak -->") == 1
    assert body.index("<!-- scaling:mor -->") < body.index("<!-- scaling:weak -->")
    assert "### MOR" in body  # mor weak rows present now
