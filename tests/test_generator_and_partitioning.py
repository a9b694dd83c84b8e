"""Interleaved-docs generator determinism + skew-aware repartitioning +
end-to-end validation of the north-star table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkjesse import dataset_checks as dc
from sparkjesse import partitioning as pt
from sparkjesse.engine import ValidationEngine
from sparkjesse.generator import (
    INTERLEAVED_SCHEMA, interleaved_documents, media_assets,
)


@pytest.fixture(scope="module")
def docs(spark):
    return interleaved_documents(spark, 2000, seed=42).cache()


def test_schema_matches_input_hint(docs):
    assert docs.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>>")


def test_deterministic(spark, docs):
    again = interleaved_documents(spark, 2000, seed=42)
    assert docs.exceptAll(again).count() == 0
    assert again.exceptAll(docs).count() == 0
    other_seed = interleaved_documents(spark, 2000, seed=43)
    assert docs.exceptAll(other_seed).count() > 0


def test_span_invariants(docs):
    """Per-row invariant material: kinds valid, text/media exclusivity,
    offsets strictly increasing (span-sequence order preserved)."""
    bad = docs.where(~F.forall(
        "spans",
        lambda s: s.getField("kind").isin("text", "image", "audio", "video")
        & (
            ((s.getField("kind") == "text")
             & s.getField("text").isNotNull()
             & s.getField("media_ref").isNull())
            | ((s.getField("kind") != "text")
               & s.getField("text").isNull()
               & s.getField("media_ref").isNotNull())
        )))
    assert bad.count() == 0
    # offsets strictly increasing within each doc
    unsorted = docs.where(
        F.exists(F.zip_with(
            F.slice("spans", 1, F.size("spans") - 1),
            F.slice("spans", 2, F.size("spans") - 1),
            lambda a, b: a.getField("offset") >= b.getField("offset")),
            lambda x: x)).count()
    assert unsorted == 0


def test_injected_quality_features(spark, docs):
    m = dc.uniqueness_metrics(docs, "doc_id")
    assert m["duplicates"] > 0           # hot keys + dup injection
    assets = media_assets(spark, 500, seed=42)
    refs = docs.select(F.explode("spans").alias("s")) \
               .select(F.col("s.media_ref").alias("ref")) \
               .where(F.col("ref").isNotNull())
    dangling = dc.dangling_references(refs, "ref", assets, "media_ref")
    n_refs = refs.count()
    n_dangling = dangling.count()
    assert 0 < n_dangling < 0.2 * n_refs


def test_validation_of_interleaved_table(docs):
    eng = ValidationEngine()
    res = eng.validate(docs, INTERLEAVED_SCHEMA)
    totals = res.totals()
    assert totals["docs"] == 2000
    assert totals["pass"] == 2000  # generator output conforms by design


def test_validation_catches_injected_violations(spark):
    eng = ValidationEngine()
    docs = interleaved_documents(spark, 100, seed=1)
    broken = docs.withColumn(
        "spans",
        F.transform("spans", lambda s: F.struct(
            F.when(F.lit(True), F.lit("blob")).alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            F.lit(-5).alias("offset"))))
    res = eng.validate(broken, INTERLEAVED_SCHEMA)
    assert res.totals()["fail"] == 100
    kinds = {r["error_type"] for r in res.violations.collect()}
    assert "not_in_range" in kinds  # enum + minimum violations


def test_skew_detection_and_salting(spark):
    docs = interleaved_documents(spark, 5000, seed=42, hot_rate=0.10)
    skew = pt.detect_hot_keys(docs, "doc_id", sample_fraction=1.0)
    assert skew.hot_keys, "hot keys should be detected"
    hot_names = {k for k, _ in skew.hot_keys}
    assert any(k in {f"d{i}" for i in range(8)} for k in hot_names)

    plain = docs.repartition(16, F.col("doc_id"))
    salted = pt.salted_repartition(docs, "doc_id", 16, skew=skew)
    assert pt.skew_factor(salted) < pt.skew_factor(plain)


def test_salting_no_hot_keys_is_stable(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    rep = pt.SkewReport(sampled_rows=1000, hot_keys=[], threshold=0.01)
    out = pt.salted_repartition(df, "k", 8, skew=rep)
    assert out.count() == 1000
    assert pt.skew_factor(out) < 2.0


def test_physical_summary_spreads_hot_key_with_row_entropy(spark):
    """The pairs frame inside key_aligned_summary is only (doc_id,
    valid) — a whole-row tiebreak would take ≤2 values per key, leaving
    a hot doc_id in ≤2 of 16 salt buckets. The engine derives the
    tiebreak from the SOURCE row's scalar columns instead, so 2000
    same-key rows (distinct uids) must spread across many partitions."""
    from sparkjesse.engine import ValidationEngine
    df = spark.range(2000).select(
        F.lit("hot").alias("doc_id"),
        F.col("id").alias("uid"),
        (F.col("id") % 97).alias("n"))
    res = ValidationEngine().validate(
        df, {"type": "object", "properties": {"n": {"minimum": 0}}})
    skew = pt.SkewReport(2000, [("hot", 2000)], 0.01)
    summ = res.key_aligned_summary(32, skew=skew, physical=True)
    spread = summ.where(F.col("docs") > 0).count()
    assert spread >= 8, f"hot key landed in only {spread} partitions"
    # and totals are intact
    assert summ.agg(F.sum("docs")).collect()[0][0] == 2000
