"""Multimodal plumbing: binary columns, Arrow batch signatures, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkjesse import multimodal as mm
from sparkjesse.similarity import brute_force_topk


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 30, seed=1).cache()


def test_synth_media_schema_and_determinism(spark, media):
    rows = media.orderBy("media_ref").collect()
    assert len(rows) == 30
    assert rows[0]["meta"]["mime"].endswith("/fake")
    again = mm.synth_media(spark, 30, seed=1).orderBy("media_ref").collect()
    assert [bytes(r["content"]) for r in rows] == \
        [bytes(r["content"]) for r in again]


def test_decode_media_parses_header(media):
    decoded = {r["media_ref"]: r for r in mm.decode_media(media).collect()}
    metas = {r["media_ref"]: r["meta"] for r in media.collect()}
    assert decoded.keys() == metas.keys()
    for ref, d in decoded.items():
        assert d["width"] == metas[ref]["width"]
        assert d["height"] == metas[ref]["height"]
        assert d["n_bytes"] == 13 + 256


def test_decode_media_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.decode_media(media, strict=True).collect()


def test_extract_features_shape_and_similarity_integration(media):
    feats = mm.extract_features(media, dim=16)
    rows = feats.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r["features"])
    # identical content ⇒ identical vector (determinism)
    f2 = {r["media_ref"]: list(r["features"])
          for r in mm.extract_features(media, dim=16).collect()}
    assert {r["media_ref"]: list(r["features"]) for r in rows} == f2
    # plumbing into similarity search works end-to-end
    emb = feats.withColumnRenamed("media_ref", "vec_id") \
               .withColumnRenamed("features", "embedding")
    top = brute_force_topk(emb.limit(2), emb, k=2)
    assert top.count() == 4


def test_frame_sample_plan_expression_only(media):
    plan = mm.frame_sample_plan(media, fps=2.0)
    rows = plan.collect()
    assert rows, "expected video rows"
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(
            (r["frame_idx"], r["offset_ms"]))
    for ref, frames in by_ref.items():
        idxs = [i for i, _ in sorted(frames)]
        offs = [o for _, o in sorted(frames)]
        assert idxs == list(range(len(frames)))
        assert offs == [i * 500 for i in range(len(frames))]


def test_frame_sample_plan_zero_duration_video(spark, media):
    # sequence(0, dur-1, step) THROWS on dur=0 rather than returning
    # an empty array — zero/negative/NULL durations must yield no
    # frames, not a job abort
    from pyspark.sql import functions as F

    weird = media.limit(3).withColumn(
        "media_kind", F.lit("video")).withColumn(
        "meta", F.struct(
            F.col("meta.width"), F.col("meta.height"),
            (F.monotonically_increasing_id() % 2)
            .cast("int").alias("duration_ms"),  # 0 or 1 ms
            F.col("meta.mime")))
    rows = mm.frame_sample_plan(weird, fps=1.0).collect()
    # only the dur=1 rows produce a frame (the one at offset 0)
    assert all(r["offset_ms"] == 0 for r in rows)
    assert 0 < len(rows) < 3


def test_decode_media_custom_codec_seam(media):
    """The production-codec seam: any ``bytes -> (w, h)`` callable runs
    through the SAME Arrow batch path as the built-in parser — schema
    and row set unchanged, dimensions come from the injected codec.
    (The 'real' codec here is a fake that reads the synthetic header
    and doubles the width — proving injection, not decoding.)"""
    import struct as _struct

    def fake_codec(b: bytes) -> tuple:
        _, w, h, _dur = _struct.unpack("<BHHI", b[4:13])
        return (w * 2, h)

    base = {r["media_ref"]: r for r in mm.decode_media(media).collect()}
    out = {r["media_ref"]: r for r in
           mm.decode_media(media, codec=fake_codec).collect()}
    assert set(out) == set(base)
    for ref, r in out.items():
        assert r["width"] == base[ref]["width"] * 2
        assert r["height"] == base[ref]["height"]
        assert r["checksum"] == base[ref]["checksum"]  # same batch path
    # strict WITH a codec is the production configuration — it runs
    # (strict WITHOUT one raising is pinned by
    # test_decode_media_strict_raises)
    n = mm.decode_media(media, strict=True, codec=fake_codec).count()
    assert n == len(base)
