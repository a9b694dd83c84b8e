"""Source abstraction: partition enumeration, per-batch reads,
snapshot lineage tokens, and a kill-mid-run resume at batch
granularity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkjesse import sources
from sparkjesse.checkpoint import (CheckpointLedger, plan_hash,
                                   run_with_checkpoints)
from sparkjesse.engine import ValidationEngine
from sparkjesse.generator import INTERLEAVED_SCHEMA, interleaved_documents


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tbl") / "docs")
    interleaved_documents(spark, 3000, seed=42, partitions=6) \
        .write.parquet(path)
    return path


def test_partition_enumeration_round_trips(spark, table):
    pids = sources.input_partitions(spark, table, files_per_batch=2)
    assert len(pids) >= 2
    total = 0
    for pid in pids:
        total += sources.read_partition(spark, table, pid,
                                        files_per_batch=2).count()
    assert total == spark.read.parquet(table).count()


def test_snapshot_id_changes_with_data(spark, table, tmp_path):
    s1 = sources.snapshot_id(table)
    assert s1 == sources.snapshot_id(table)  # stable
    other = str(tmp_path / "other")
    interleaved_documents(spark, 100, seed=1).write.parquet(other)
    assert sources.snapshot_id(other) != s1


def test_kill_mid_run_resumes_at_batch_granularity(spark, table, tmp_path):
    pids = sources.input_partitions(spark, table, files_per_batch=2)
    assert len(pids) >= 2
    ledger = CheckpointLedger(str(tmp_path / "ledger"))
    ph = plan_hash(INTERLEAVED_SCHEMA)
    snap = sources.snapshot_id(table)
    engine = ValidationEngine()
    done_counts = {}

    def process(pid):
        df = sources.read_partition(spark, table, pid, files_per_batch=2)
        res = engine.validate(df, INTERLEAVED_SCHEMA)
        t = res.totals()
        done_counts[pid] = t["docs"]
        if pid == pids[1]:
            raise RuntimeError("simulated kill")
        return t

    with pytest.raises(RuntimeError):
        run_with_checkpoints(pids, process, ledger, plan=ph, snapshot=snap)
    # lineage + metrics rows intact for the completed batch
    rows = ledger.metrics_rows()
    assert any(r["status"] == "done" and r["partition_id"] == pids[0]
               for r in rows)
    assert any(r["status"] == "failed" and r["partition_id"] == pids[1]
               for r in rows)

    # restart: first batch skipped, the rest complete
    def process2(pid):
        df = sources.read_partition(spark, table, pid, files_per_batch=2)
        return ValidationEngine().validate(df, INTERLEAVED_SCHEMA).totals()

    out = run_with_checkpoints(pids, process2, ledger, plan=ph,
                               snapshot=snap)
    assert out["skipped"] == [pids[0]]
    assert set(out["ran"]) == set(pids[1:])
    done = ledger.done_partitions(ph, snap)
    assert done == set(pids)
    # a changed plan re-runs everything
    assert ledger.done_partitions(plan_hash({"other": 1}), snap) == set()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key/count must sort-merge join
    with ZERO exchanges — the write-once-shuffle-never-again layout
    for repeated doc_id joins at scale."""
    from pyspark.sql import functions as F
    from sparkjesse.generator import interleaved_documents
    docs = interleaved_documents(spark, 2000, seed=42) \
        .select("doc_id", F.size("spans").alias("n_spans"))
    stats = docs.groupBy("doc_id").agg(F.sum("n_spans").alias("total"))
    # at the design scale neither join side is broadcastable; disable
    # auto-broadcast so the planner exercises the bucketed layout the
    # way a 10^12-row join would
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sources.write_bucketed(docs, "t_docs_b", bucket_col="doc_id",
                               buckets=8, sort_col="doc_id")
        sources.write_bucketed(stats, "t_stats_b", bucket_col="doc_id",
                               buckets=8, sort_col="doc_id")
        joined = spark.table("t_docs_b").join(spark.table("t_stats_b"),
                                              on="doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() > 0
        # aggregation on the bucket key also avoids the exchange
        agg = spark.table("t_docs_b").groupBy("doc_id").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_write_range_sorted_globally_ordered_files(spark, tmp_path):
    """Range-sorted output: every file's max(sort_col) <= the next
    file's min (global order across files), and a point predicate
    prunes to a subset of files via parquet zone maps."""
    out = str(tmp_path / "sorted")
    df = spark.range(0, 10_000).withColumnRenamed("id", "k") \
        .withColumn("k", (F.col("k") * 2654435761) % 10_000)
    sources.write_range_sorted(df, out, sort_col="k", partitions=8)

    import glob
    spans = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        one = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")).collect()[0]
        if one["lo"] is not None:
            spans.append((one["lo"], one["hi"]))
    assert len(spans) > 1
    spans.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, spans  # non-overlapping ranges

    # nothing lost in the rewrite
    back = spark.read.parquet(out)
    assert back.count() == 10_000


# --- Iceberg seam (round-4 VERDICT task 7) ---------------------------------
#
# The sandbox has no Iceberg runtime jar, so the `format("iceberg")`
# branch of read_table cannot run for real. These tests inject a fake
# session (the same pattern as the multimodal codec seam) to pin the
# dispatch contract: which format is asked for, what is passed to
# load(), when the parquet fallback engages, and when errors must
# propagate instead.


class _FakeReader:
    def __init__(self, log, fail_iceberg=False):
        self._log = log
        self._fail = fail_iceberg
        self._fmt = None

    def format(self, fmt):
        self._fmt = fmt
        return self

    def load(self, target):
        self._log.append(("load", self._fmt, target))
        if self._fail:
            raise RuntimeError("iceberg runtime not on classpath")
        return ("df", self._fmt, target)

    def parquet(self, target):
        self._log.append(("parquet", target))
        return ("df", "parquet", target)


class _FakeSpark:
    def __init__(self, log, fail_iceberg=False):
        self._log = log
        self._fail = fail_iceberg

    @property
    def read(self):
        return _FakeReader(self._log, self._fail)


def test_read_table_iceberg_dispatch_explicit():
    log = []
    out = sources.read_table(_FakeSpark(log), "cat.db.docs",
                             fmt="iceberg")
    assert out == ("df", "iceberg", "cat.db.docs")
    assert log == [("load", "iceberg", "cat.db.docs")]


def test_read_table_auto_routes_catalog_names_to_iceberg():
    # a target that is not a filesystem path must try iceberg first
    log = []
    out = sources.read_table(_FakeSpark(log), "cat.db.docs", fmt="auto")
    assert out == ("df", "iceberg", "cat.db.docs")


def test_read_table_auto_falls_back_to_parquet_on_iceberg_error():
    log = []
    out = sources.read_table(_FakeSpark(log, fail_iceberg=True),
                             "cat.db.docs", fmt="auto")
    assert out == ("df", "parquet", "cat.db.docs")
    # the iceberg attempt happened BEFORE the fallback
    assert log[0] == ("load", "iceberg", "cat.db.docs")
    assert log[1] == ("parquet", "cat.db.docs")


def test_read_table_explicit_iceberg_error_propagates():
    log = []
    with pytest.raises(RuntimeError, match="classpath"):
        sources.read_table(_FakeSpark(log, fail_iceberg=True),
                           "cat.db.docs", fmt="iceberg")


def test_read_table_auto_prefers_parquet_for_existing_paths(spark, table):
    # a real directory never tries iceberg: straight parquet scan
    df = sources.read_table(spark, table, fmt="auto")
    assert df.count() == 3000
