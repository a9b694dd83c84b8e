"""Incremental lineage: the Iceberg-manifest stand-in.

The table-wide ``snapshot_id`` re-validates everything on any append;
the manifest freezes batch membership at first sight and gives each
batch its own snapshot token, so a resumed run after an append
validates ONLY the new/changed batches — the incremental-read contract
Iceberg manifests provide (new snapshots append manifest entries, they
never rewrite old ones).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkjesse import sources
from sparkjesse.checkpoint import (CheckpointLedger, plan_hash,
                                   run_with_checkpoints)


def _write_files(spark, path, lo, hi):
    """One parquet file per (lo..hi) id — deterministic sizes/names."""
    for i in range(lo, hi):
        (spark.range(i * 100, i * 100 + 50)
         .withColumn("doc_id", F.concat(F.lit("d"), F.col("id")))
         .coalesce(1).write.mode("append").parquet(path))


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "docs")
    _write_files(spark, path, 0, 4)
    return path


def test_manifest_batches_stable_across_append(spark, table, tmp_path):
    mf = str(tmp_path / "manifest.json")
    m1 = sources.refresh_manifest(table, mf, files_per_batch=2)
    parts1 = dict(sources.manifest_partitions(m1))
    assert len(parts1) == 2  # 4 files / 2

    _write_files(spark, table, 4, 8)  # append 4 more files
    m2 = sources.refresh_manifest(table, mf)
    parts2 = dict(sources.manifest_partitions(m2))
    assert len(parts2) == 4
    # untouched batches keep their tokens — this is the whole point
    for pid, tok in parts1.items():
        assert parts2[pid] == tok
    # new batches exist with fresh ids
    assert set(parts2) - set(parts1) == {"batch-00002", "batch-00003"}


def test_incremental_run_validates_only_appended(spark, table, tmp_path):
    mf = str(tmp_path / "manifest.json")
    ledger = CheckpointLedger(str(tmp_path / "ledger"))
    plan = plan_hash({"inc": 1})
    calls: list[str] = []

    def run_once():
        manifest = sources.refresh_manifest(table, mf, files_per_batch=2)
        parts = sources.manifest_partitions(manifest)

        def process(pid):
            calls.append(pid)
            n = sources.read_manifest_partition(
                spark, table, manifest, pid).count()
            return {"docs": n, "fail": 0}

        return run_with_checkpoints(
            [p for p, _ in parts], process, ledger,
            plan=plan, snapshot=dict(parts)), dict(parts)

    out1, snaps1 = run_once()
    assert out1 == {"ran": ["batch-00000", "batch-00001"], "skipped": []}

    _write_files(spark, table, 4, 6)  # one new batch worth of files
    calls.clear()
    out2, snaps2 = run_once()
    assert out2["ran"] == ["batch-00002"]
    assert sorted(out2["skipped"]) == ["batch-00000", "batch-00001"]
    assert calls == ["batch-00002"]  # the append cost ONE batch, not 3

    # lineage totals: latest run per batch under current tokens
    rows = ledger.lineage_metrics(plan, snaps2)
    assert len(rows) == 3
    assert sum(r["metrics"]["docs"] for r in rows) == 6 * 50


def test_changed_file_revalidates_only_its_batch(spark, table, tmp_path):
    mf = str(tmp_path / "manifest.json")
    ledger = CheckpointLedger(str(tmp_path / "ledger"))
    plan = plan_hash({"inc": 2})

    manifest = sources.refresh_manifest(table, mf, files_per_batch=2)
    parts = sources.manifest_partitions(manifest)
    run_with_checkpoints([p for p, _ in parts],
                         lambda pid: {"docs": 1}, ledger,
                         plan=plan, snapshot=dict(parts))

    # rewrite one file of batch-00001 with different content/size
    victim = manifest["files"][2]["name"]
    full = os.path.join(table, victim)
    (spark.range(0, 9)
     .withColumn("doc_id", F.concat(F.lit("x"), F.col("id")))
     .toPandas().to_parquet(full))

    m2 = sources.refresh_manifest(table, mf)
    parts2 = sources.manifest_partitions(m2)
    out = run_with_checkpoints([p for p, _ in parts2],
                               lambda pid: {"docs": 1}, ledger,
                               plan=plan, snapshot=dict(parts2))
    assert out == {"ran": ["batch-00001"], "skipped": ["batch-00000"]}


def test_deleted_file_flips_token_and_read_skips_it(spark, table, tmp_path):
    mf = str(tmp_path / "manifest.json")
    m1 = sources.refresh_manifest(table, mf, files_per_batch=2)
    tok1 = dict(sources.manifest_partitions(m1))
    victim = m1["files"][0]["name"]
    os.remove(os.path.join(table, victim))

    m2 = sources.refresh_manifest(table, mf)
    tok2 = dict(sources.manifest_partitions(m2))
    assert tok2["batch-00000"] != tok1["batch-00000"]
    assert tok2["batch-00001"] == tok1["batch-00001"]
    # the read must not crash on the missing member
    n = sources.read_manifest_partition(
        spark, table, m2, "batch-00000").count()
    assert n == 50  # one surviving 50-row file


def test_validate_job_manifest_end_to_end(spark, tmp_path, monkeypatch,
                                          capsys):
    """tools/validate_job.py --manifest: first run validates all, an
    append re-submits and validates ONLY the new batch; totals cover
    the whole table. In-process (getOrCreate reuses the test session) —
    the --py-files packaging path is pinned by test_spark_submit."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from sparkjesse.generator import interleaved_documents
    from tools import validate_job

    inp = str(tmp_path / "docs")
    # exactly one FULL batch (files_per_batch=8): the append then lands
    # entirely in a new batch (a partially-full batch would absorb new
    # members and correctly re-run — full batches are the steady state
    # at 10^12 rows)
    interleaved_documents(spark, 400, seed=7).repartition(8) \
        .write.parquet(inp)

    argv = ["validate_job.py", "--input", inp,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ledger"),
            "--manifest", str(tmp_path / "manifest.json"),
            "--partitions", "4"]
    monkeypatch.setattr("sys.argv", argv)
    validate_job.main()
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["metrics"]["docs"] == 400
    n_first = len(r1["resume"]["ran"])
    assert n_first >= 1 and r1["resume"]["skipped"] == []

    interleaved_documents(spark, 100, seed=8).coalesce(8) \
        .write.mode("append").parquet(inp)
    validate_job.main()
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # everything from run 1 skipped; only appended batches ran
    assert len(r2["resume"]["skipped"]) == n_first
    assert len(r2["resume"]["ran"]) >= 1
    assert r2["metrics"]["docs"] == 500


def test_manifest_file_is_json_and_batch_size_frozen(spark, table, tmp_path):
    mf = str(tmp_path / "manifest.json")
    sources.refresh_manifest(table, mf, files_per_batch=2)
    # a later refresh with a DIFFERENT files_per_batch must not
    # reshuffle membership — the stored value wins
    m2 = sources.refresh_manifest(table, mf, files_per_batch=999)
    assert m2["files_per_batch"] == 2
    with open(mf, encoding="utf-8") as fh:
        on_disk = json.load(fh)
    assert on_disk == m2
