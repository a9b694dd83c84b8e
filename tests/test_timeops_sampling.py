"""Sessionization, as-of join, deterministic sampling, and
decontamination — hand-computed fixtures and invariant checks."""
from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sparkjesse import dedup, sampling, timeops


def _ts(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


# -- sessionize -------------------------------------------------------------

def test_sessionize_gap_splits_sessions(spark):
    rows = [
        (1, 10, _ts(0), 1.0),    # session 1
        (2, 10, _ts(10), 2.0),   # +10min  -> same session
        (3, 10, _ts(50), 4.0),   # +40min  -> new session
        (4, 20, _ts(0), 8.0),    # other key
    ]
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts", "v"])
    out = {(r["uid"], r["session_idx"]): r
           for r in timeops.sessionize(df, "uid", "ts", gap_minutes=30,
                                       id_col="event_id",
                                       agg_value_col="v").collect()}
    assert set(out) == {(10, 1), (10, 2), (20, 1)}
    s1 = out[(10, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_us"] == 10 * 60 * 1_000_000
    assert s1["total_value"] == 3.0
    assert out[(10, 2)]["n_events"] == 1
    assert out[(10, 2)]["duration_us"] == 0


def test_sessionize_boundary_gap_exactly_at_threshold_joins(spark):
    # gap == threshold is NOT > threshold -> same session
    rows = [(1, 1, _ts(0)), (2, 1, _ts(30))]
    df = spark.createDataFrame(rows, ["event_id", "uid", "ts"])
    out = timeops.sessionize(df, "uid", "ts", gap_minutes=30,
                             id_col="event_id").collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


# -- asof join --------------------------------------------------------------

@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)),   # after order 11 -> match
         (101, 1, _ts(30)),   # after order 12 -> latest wins
         (102, 1, _ts(5)),    # before any order -> NULL
         (103, 2, _ts(10))],  # key with no orders -> NULL
        ["event_id", "uid", "ts"])
    right = spark.createDataFrame(
        [(11, 1, _ts(7), 10.0),
         (12, 1, _ts(20), 20.0)],
        ["order_id", "uid", "ots", "amount"])
    return left, right


def test_asof_join_latest_at_or_before(spark, asof_frames):
    left, right = asof_frames
    out = {r["event_id"]: r for r in timeops.asof_join(
        left, right, "uid", "ts", "ots",
        ["order_id", "amount"]).collect()}
    assert out[100]["asof_order_id"] == 11
    assert out[100]["asof_amount"] == 10.0
    assert out[100]["asof_lag_us"] == 3 * 60 * 1_000_000
    assert out[101]["asof_order_id"] == 12  # latest, not first
    assert out[102]["asof_order_id"] is None
    assert out[103]["asof_order_id"] is None
    assert len(out) == 4  # left-join semantics: every left row kept


def test_asof_join_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame([(1, 5, _ts(7))],
                                 ["event_id", "uid", "ts"])
    right = spark.createDataFrame([(9, 5, _ts(7), 1.0)],
                                  ["order_id", "uid", "ots", "amount"])
    r = timeops.asof_join(left, right, "uid", "ts", "ots",
                          ["order_id", "amount"]).collect()[0]
    assert r["asof_order_id"] == 9 and r["asof_lag_us"] == 0


def test_asof_join_tolerance_nulls_stale_matches(spark, asof_frames):
    left, right = asof_frames
    out = {r["event_id"]: r for r in timeops.asof_join(
        left, right, "uid", "ts", "ots", ["order_id", "amount"],
        tolerance_minutes=5).collect()}
    assert out[100]["asof_order_id"] == 11      # 3min lag, in tolerance
    assert out[101]["asof_order_id"] is None    # 10min lag, stale
    assert out[101]["asof_lag_us"] is None


def test_asof_join_tie_on_right_ts_takes_max_first_payload(spark):
    left = spark.createDataFrame([(1, 5, _ts(9))],
                                 ["event_id", "uid", "ts"])
    right = spark.createDataFrame(
        [(7, 5, _ts(7), 1.0), (8, 5, _ts(7), 2.0)],
        ["order_id", "uid", "ots", "amount"])
    r = timeops.asof_join(left, right, "uid", "ts", "ots",
                          ["order_id", "amount"]).collect()[0]
    assert r["asof_order_id"] == 8  # deterministic: max order_id wins


# -- deterministic sampling --------------------------------------------------

def test_sample_is_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in sampling.deterministic_sample(
        df, "doc_id", 0.3).collect())
    b = sorted(r["doc_id"] for r in sampling.deterministic_sample(
        df.repartition(13), "doc_id", 0.3).collect())
    assert a == b and 400 < len(a) < 800  # ~600 expected


def test_stratified_sample_respects_per_stratum_fractions(spark):
    rows = [(i, "big" if i % 2 == 0 else "small") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(
        df, "lang", "doc_id", {"big": 0.5, "small": 0.05}).collect()
    by = {"big": 0, "small": 0}
    for r in out:
        by[r["lang"]] += 1
    assert 800 < by["big"] < 1200     # ~1000
    assert 40 < by["small"] < 180     # ~100


def test_split_is_disjoint_and_exhaustive(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = sampling.split(df, "doc_id",
                         weights={"train": 8, "val": 1, "test": 1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n"))
                 .collect()}
    assert sum(counts.values()) == 3000  # exhaustive, disjoint
    assert counts["train"] > 6 * (counts["val"] + counts["test"]) / 2
    # deterministic: same call twice -> identical assignment
    again = sampling.split(df, "doc_id",
                           weights={"train": 8, "val": 1, "test": 1})
    assert (out.exceptAll(again).count() == 0
            and again.exceptAll(out).count() == 0)


# -- decontamination ----------------------------------------------------------

def test_decontaminate_flags_overlapping_docs_only(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma epsilon"),   # shares 'alpha beta gamma'
         (2, "zeta eta theta iota")],        # clean
        ["doc_id", "text"])
    out = dedup.decontaminate_report(corpus, bench).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 1
    assert r["n_hit_shingles"] == 1 and r["n_shingles"] == 2
    assert r["hit_frac"] == 0.5
    assert r["example_shingle"] == "alpha beta gamma"


# --- epoch shuffle / mixture interleave --------------------------------

def test_epoch_shuffle_deterministic_across_partitioning(spark):
    df = spark.range(0, 500).withColumn(
        "doc_id", F.concat(F.lit("d"), F.col("id")))
    a = [r["doc_id"] for r in
         sampling.epoch_shuffle(df.repartition(1), "doc_id", epoch=1,
                                shards=4).select("doc_id").collect()]
    b = [r["doc_id"] for r in
         sampling.epoch_shuffle(df.repartition(13), "doc_id", epoch=1,
                                shards=7).select("doc_id").collect()]
    assert a == b                      # order is content-keyed, not
    assert sorted(a) == sorted(        # partitioning/shard dependent
        f"d{i}" for i in range(500))   # and it is a permutation
    c = [r["doc_id"] for r in
         sampling.epoch_shuffle(df, "doc_id", epoch=2,
                                shards=4).select("doc_id").collect()]
    assert c != a                      # epochs reorder


def test_epoch_shuffle_is_globally_range_ordered(spark):
    df = spark.range(0, 300).withColumn(
        "doc_id", F.concat(F.lit("x"), F.col("id")))
    out = sampling.epoch_shuffle(df, "doc_id", shards=5)
    ranks = [r["shuffle_rank"] for r in out.select("shuffle_rank")
             .collect()]
    assert ranks == sorted(ranks)      # shard concatenation = global order
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 1  # one range exchange, no joins


def test_mixture_interleave_weights_and_copies(spark):
    a = spark.range(0, 200).withColumn(
        "doc_id", F.concat(F.lit("a"), F.col("id")))
    b = spark.range(0, 200).withColumn(
        "doc_id", F.concat(F.lit("b"), F.col("id")))
    out = sampling.mixture_interleave(
        {"hi": (a, 2.5), "lo": (b, 0.25)}, "doc_id", epoch=0).cache()
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n"))
              .collect()}
    assert counts["hi"] >= 2 * 200          # 2 full copies + fraction
    assert counts["hi"] <= 3 * 200
    assert 0 < counts["lo"] < 200           # deterministic quarter-ish
    # copies of the same doc carry distinct ranks (spread, not adjacent)
    dup = (out.where(F.col("source") == "hi")
              .groupBy("doc_id")
              .agg(F.countDistinct("shuffle_rank").alias("k"),
                   F.count("*").alias("n")))
    assert dup.where(F.col("k") != F.col("n")).count() == 0
    # re-run is bit-identical (retry-safety / reproducibility)
    out2 = sampling.mixture_interleave(
        {"hi": (a, 2.5), "lo": (b, 0.25)}, "doc_id", epoch=0)
    r1 = [tuple(r) for r in out.select("doc_id", "source", "copy")
          .collect()]
    r2 = [tuple(r) for r in out2.select("doc_id", "source", "copy")
          .collect()]
    assert r1 == r2
    out.unpersist()
