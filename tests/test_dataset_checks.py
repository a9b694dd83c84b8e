"""Dataset-level checks vs known answers (and DuckDB-checkable shapes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkjesse import dataset_checks as dc


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_column_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (None, "a")],
        "x long, s string")
    stats = {r["column"]: r for r in dc.column_stats(df).collect()}
    assert stats["x"]["count"] == 4
    assert stats["x"]["nulls"] == 1
    assert stats["x"]["null_rate"] == 0.25
    assert stats["x"]["min"] == "1" and stats["x"]["max"] == "3"
    assert stats["s"]["approx_distinct"] == 2


def test_column_stats_on_real_parquet(docs):
    stats = {r["column"]: r for r in dc.column_stats(docs).collect()}
    assert stats["doc_id"]["count"] == 500
    assert stats["doc_id"]["nulls"] == 0
    # HLL at 2% rsd should land near 500 distinct ids
    assert abs(stats["doc_id"]["approx_distinct"] - 500) <= 25


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",), ("a",)], "k string")
    dups = dc.duplicate_keys(df, "k").collect()
    assert [(r["k"], r["occurrences"]) for r in dups] == [("a", 3)]
    m = dc.uniqueness_metrics(df, "k")
    assert (m["rows"], m["distinct"], m["duplicates"]) == (5, 3, 2)


def test_dangling_references(spark):
    facts = spark.createDataFrame(
        [(1, "m1"), (2, "m2"), (3, "m999"), (4, None)],
        "id long, ref string")
    dims = spark.createDataFrame([("m1",), ("m2",), ("m3",)], "media string")
    dangling = dc.dangling_references(facts, "ref", dims, "media")
    assert [r["id"] for r in dangling.collect()] == [3]
    # broadcast hint visible in plan
    plan = dangling._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_histogram_and_psi_ks_zero_drift(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("v"))
    h = dc.fixed_histogram(df, "v", lo=0, hi=100, buckets=10)
    rows = h.collect()
    assert len(rows) == 10
    assert all(abs(r["p"] - 0.1) < 1e-9 for r in rows)
    # identical distributions ⇒ psi == ks == 0
    rep = dc.drift_report(df, df, "v", lo=0, hi=100, buckets=10)
    assert rep["psi"] == pytest.approx(0.0, abs=1e-9)
    assert rep["ks"] == pytest.approx(0.0, abs=1e-9)


def test_array_length_profile(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0]), (4, None)],
        "id long, emb array<double>")
    rows = {r["length"]: (r["n"], r["ok"]) for r in
            dc.array_length_profile(df, "emb", expected=2).collect()}
    assert rows[2] == (2, True)
    assert rows[1] == (1, False)
    assert None in rows and rows[None][0] == 1
    # without expected: no ok column
    cols = dc.array_length_profile(df, "emb").columns
    assert cols == ["length", "n"]


def test_histogram_degenerate_range_fails_fast(spark):
    # hi == lo (constant column) must raise at plan-build time, not
    # abort the job mid-scan with an ANSI DIVIDE_BY_ZERO
    df = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    with pytest.raises(ValueError, match="must be > lo"):
        dc.fixed_histogram(df, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="buckets"):
        dc.fixed_histogram(df, "v", lo=0.0, hi=1.0, buckets=0)


def test_psi_ks_detect_shift(spark):
    base = spark.range(2000).select((F.col("id") % 100).alias("v"))
    cur = spark.range(2000).select(
        (F.col("id") % 50 + 50).alias("v"))  # mass moved to upper half
    rep = dc.drift_report(cur, base, "v", lo=0, hi=100, buckets=10)
    assert rep["psi"] > 0.5
    assert rep["ks"] == pytest.approx(0.5, abs=0.05)


def test_ks_matches_closed_form(spark):
    """Uniform [0,100) vs uniform [0,50): KS = 0.5 at x=50."""
    a = spark.range(1000).select((F.col("id") % 100).alias("v"))
    b = spark.range(1000).select((F.col("id") % 50).alias("v"))
    rep = dc.drift_report(a, b, "v", lo=0, hi=100, buckets=20)
    assert rep["ks"] == pytest.approx(0.5, abs=0.02)


def test_exact_ks_by_group(spark):
    cur = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (1, 2, 3)]
        + [("only_cur", 1.0)], ["grp", "value"])
    base = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)]      # identical to cur
        + [("b", float(v)) for v in (2, 3, 4)],   # shifted by one
        ["grp", "value"])
    from sparkjesse.dataset_checks import exact_ks_by_group
    rows = {r["grp"]: r for r in
            exact_ks_by_group(cur, base, "value", ["grp"]).collect()}
    assert rows["a"]["ks"] == 0.0
    # D = max|F_cur - F_base| over {1,2,3,4} = 1/3
    assert rows["b"]["ks"] == 0.333333
    assert (rows["b"]["n_cur"], rows["b"]["n_base"]) == (3, 3)
    assert "only_cur" not in rows  # one-sided groups omitted


def test_exact_ks_disjoint_supports_is_one(spark):
    cur = spark.createDataFrame([("g", float(v)) for v in (1, 2)],
                                ["grp", "value"])
    base = spark.createDataFrame([("g", float(v)) for v in (10, 11)],
                                 ["grp", "value"])
    from sparkjesse.dataset_checks import exact_ks_by_group
    row = exact_ks_by_group(cur, base, "value", ["grp"]).collect()[0]
    assert row["ks"] == 1.0
