"""Deployment-mode evidence: the engine runs via
``spark-submit --py-files sparkjesse.zip`` with no repo on sys.path
(north rule: "all via spark-submit --py-files on multi-executor
clusters"; sandbox proxy: local master, the zip is the only source of
the package)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path, spark):
    spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not on PATH")
    # fixture input written by the in-process session
    from sparkjesse.generator import interleaved_documents
    inp = str(tmp_path / "docs")
    interleaved_documents(spark, 2000, seed=42).write.parquet(inp)

    sys.path.insert(0, REPO)
    from tools.package import build
    zip_path = build(str(tmp_path / "sparkjesse.zip"))

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "validate_job.py"),
         "--input", inp, "--output", out_dir,
         "--checkpoint", str(tmp_path / "ledger"),
         "--partitions", "8"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["metrics"]["docs"] == 2000
    assert os.path.exists(os.path.join(out_dir, "summary"))
    assert os.path.exists(os.path.join(out_dir, "violations"))
    # second submit resumes: the done partition is skipped
    proc2 = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "validate_job.py"),
         "--input", inp, "--output", out_dir,
         "--checkpoint", str(tmp_path / "ledger"),
         "--partitions", "8"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    result2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert result2["resume"]["ran"] == []
    assert len(result2["resume"]["skipped"]) == result2["partitions"] >= 1
    assert result2["metrics"]["docs"] == 2000


def test_batch_single_evaluation(spark, tmp_path):
    """The batch flow validates each input partition ONCE: with the
    annotated frame persisted, every sink after the first reads the
    cache (InMemoryTableScan), not a fresh parquet scan + re-validate,
    and totals come from the already-written summary files."""
    from pyspark.sql import functions as F
    from sparkjesse.engine import ValidationEngine
    from sparkjesse.generator import INTERLEAVED_SCHEMA, \
        interleaved_documents

    inp = str(tmp_path / "docs")
    interleaved_documents(spark, 1000, seed=42).write.parquet(inp)
    docs = spark.read.parquet(inp)
    res = ValidationEngine().validate(docs, INTERLEAVED_SCHEMA)
    ann = res.annotated.persist()
    try:
        out = str(tmp_path / "summary")
        res.key_aligned_summary(8).write.parquet(out)  # fills the cache
        plan = res.violations._jdf.queryExecution() \
            .executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan[:1200]
        row = (spark.read.parquet(out)
               .agg(F.sum("docs").alias("docs")).collect()[0])
        assert row["docs"] == 1000
    finally:
        ann.unpersist()
