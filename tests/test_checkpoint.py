"""Checkpoint ledger: kill-and-resume with lineage intact."""

from __future__ import annotations

import pytest

from sparkjesse.checkpoint import (
    CheckpointLedger, LedgerEntry, plan_hash, run_with_checkpoints,
)


def test_plan_hash_sensitivity():
    a = plan_hash({"type": "object"})
    b = plan_hash({"type": "array"})
    assert a != b
    assert plan_hash({"type": "object"}) == a


def test_resume_skips_done(tmp_path):
    ledger = CheckpointLedger(str(tmp_path))
    ph, snap = plan_hash({"x": 1}), "snap-1"
    calls = []

    def process(pid):
        calls.append(pid)
        return {"docs": 10}

    out = run_with_checkpoints(["p0", "p1", "p2"], process, ledger,
                               plan=ph, snapshot=snap)
    assert out == {"ran": ["p0", "p1", "p2"], "skipped": []}
    out2 = run_with_checkpoints(["p0", "p1", "p2", "p3"], process, ledger,
                                plan=ph, snapshot=snap)
    assert out2 == {"ran": ["p3"], "skipped": ["p0", "p1", "p2"]}
    assert calls == ["p0", "p1", "p2", "p3"]


def test_killed_run_resumes_with_lineage(tmp_path):
    """Simulated kill: process raises on p1; restart finishes the rest;
    failed attempt + metrics rows remain visible in the ledger."""
    ledger = CheckpointLedger(str(tmp_path))
    ph, snap = plan_hash({"x": 2}), "snap-9"
    boom = {"armed": True}

    def process(pid):
        if pid == "p1" and boom["armed"]:
            raise RuntimeError("killed mid-run")
        return {"docs": 5, "pass": 5, "fail": 0}

    with pytest.raises(RuntimeError):
        run_with_checkpoints(["p0", "p1", "p2"], process, ledger,
                             plan=ph, snapshot=snap)
    # restart
    boom["armed"] = False
    out = run_with_checkpoints(["p0", "p1", "p2"], process, ledger,
                               plan=ph, snapshot=snap)
    assert out == {"ran": ["p1", "p2"], "skipped": ["p0"]}
    rows = ledger.metrics_rows()
    failed = [r for r in rows if r["status"] == "failed"]
    assert len(failed) == 1 and failed[0]["partition_id"] == "p1"
    done_p1 = [r for r in rows
               if r["partition_id"] == "p1" and r["status"] == "done"]
    assert done_p1[0]["attempt"] == 2  # lineage: second attempt recorded


def test_plan_change_invalidates(tmp_path):
    ledger = CheckpointLedger(str(tmp_path))
    snap = "snap-1"

    def process(pid):
        return {}

    run_with_checkpoints(["p0"], process, ledger,
                         plan=plan_hash({"v": 1}), snapshot=snap)
    out = run_with_checkpoints(["p0"], process, ledger,
                               plan=plan_hash({"v": 2}), snapshot=snap)
    assert out["ran"] == ["p0"]  # new plan ⇒ re-run

    out2 = run_with_checkpoints(["p0"], process, ledger,
                                plan=plan_hash({"v": 2}), snapshot="snap-2")
    assert out2["ran"] == ["p0"]  # new snapshot ⇒ re-run


def test_lineage_metrics_filters_and_dedupes(tmp_path):
    """Totals must come from the latest done attempt per partition of
    ONE lineage — old-lineage rows and superseded attempts are excluded
    (they would double-count after a schema/data change)."""
    ledger = CheckpointLedger(str(tmp_path))
    old_plan, new_plan = plan_hash({"v": 1}), plan_hash({"v": 2})
    # old lineage fully done
    ledger.record(LedgerEntry("p0", "done", old_plan, "s1", 1,
                              {"docs": 10, "fail": 1}))
    ledger.record(LedgerEntry("p1", "done", old_plan, "s1", 1,
                              {"docs": 10, "fail": 2}))
    # new lineage: p0 done twice (retry), p1 failed once then done
    ledger.record(LedgerEntry("p0", "done", new_plan, "s1", 1,
                              {"docs": 11, "fail": 0}))
    ledger.record(LedgerEntry("p0", "done", new_plan, "s1", 2,
                              {"docs": 12, "fail": 3}))
    ledger.record(LedgerEntry("p1", "failed", new_plan, "s1", 1,
                              {"error": "boom"}))
    ledger.record(LedgerEntry("p1", "done", new_plan, "s1", 2,
                              {"docs": 12, "fail": 4}))
    rows = ledger.lineage_metrics(new_plan, "s1")
    assert [(r["partition_id"], r["attempt"]) for r in rows] == \
        [("p0", 2), ("p1", 2)]
    assert sum(r["metrics"]["docs"] for r in rows) == 24
    assert sum(r["metrics"]["fail"] for r in rows) == 7
    # raw metrics_rows still sees everything (debug surface)
    assert len(ledger.metrics_rows()) == 6
