"""Sequence packing (sparkjesse.packing).

The test oracle is a local Python reimplementation of the same
deterministic contract (stream = id % partitions, next-fit in id
order) — packing is a stateful fold, not SQL-expressible, so this is
one of the pytest-only operators (like streaming and k-means)."""

from __future__ import annotations

import pytest

from sparkjesse import packing


def local_pack(rows, partitions, capacity):
    """(id, n) -> {id: (part, pack_id, offset, oversize)} — the
    contract, written independently of the Spark fold."""
    out = {}
    streams = {}
    for i, n in sorted(rows):
        p = i % partitions
        pack_id, used, started = streams.get(p, (0, 0, False))
        if n > capacity:
            if started:
                pack_id += 1
            out[i] = (p, pack_id, 0, 1)
            streams[p] = (pack_id + 1, 0, False)
            continue
        if started and used + n > capacity:
            pack_id += 1
            used = 0
        out[i] = (p, pack_id, used, 0)
        streams[p] = (pack_id, used + n, True)
    return out


@pytest.fixture(scope="module")
def sized_docs(spark):
    # lengths cycle 1..37 so windows close at varying fill levels
    rows = [(i, 1 + (i * 13) % 37) for i in range(500)]
    return rows, spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_packing_matches_local_oracle(spark, sized_docs):
    rows, df = sized_docs
    got = {r["doc_id"]: (r["pack_part"], r["pack_id"], r["pack_offset"],
                         r["oversize"])
           for r in packing.pack_sequences(df, capacity=64,
                                           partitions=8).collect()}
    assert got == local_pack(rows, partitions=8, capacity=64)


def test_packing_respects_capacity_and_contiguity(spark, sized_docs):
    rows, df = sized_docs
    out = packing.pack_sequences(df, capacity=64, partitions=8).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["pack_part"], r["pack_id"]), []).append(r)
    for (_, _), docs in by_pack.items():
        docs.sort(key=lambda r: r["doc_id"])
        if any(d["oversize"] for d in docs):
            assert len(docs) == 1  # oversize docs pack alone
            continue
        assert sum(d["n_tokens"] for d in docs) <= 64
        # offsets are the running sum in id order (stream-concatenable)
        off = 0
        for d in docs:
            assert d["pack_offset"] == off
            off += d["n_tokens"]


def test_packing_oversize_isolated(spark):
    df = spark.createDataFrame(
        [(0, 10), (8, 999), (16, 10)], "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in
           packing.pack_sequences(df, capacity=64, partitions=8)
           .collect()}
    # all three ids hit stream 0; the oversize one gets its own window
    assert out[8]["oversize"] == 1 and out[8]["pack_offset"] == 0
    assert out[0]["pack_id"] < out[8]["pack_id"] < out[16]["pack_id"]


def test_packing_deterministic_across_layouts(spark, sized_docs):
    """Same (id, n) multiset, different input partitioning / row order
    ⇒ identical triples (the retry-safety / cluster-size invariance
    the module docstring promises)."""
    rows, df = sized_docs
    a = packing.pack_sequences(df.repartition(3), capacity=64,
                               partitions=8).collect()
    b = packing.pack_sequences(
        df.orderBy(df.doc_id.desc()).coalesce(1), capacity=64,
        partitions=8).collect()
    assert sorted(map(tuple, a), key=lambda t: t[0]) == \
        sorted(map(tuple, b), key=lambda t: t[0])


def test_pack_stats_fill_rate(spark, sized_docs):
    rows, df = sized_docs
    packed = packing.pack_sequences(df, capacity=64, partitions=8)
    stats = {r["pack_part"]: r for r in
             packing.pack_stats(packed, capacity=64).collect()}
    assert set(stats) == set(range(8))
    assert sum(r["n_docs"] for r in stats.values()) == 500
    for r in stats.values():
        assert 0.5 <= r["fill_rate"] <= 1.0  # next-fit fills decently
        assert r["n_oversize"] == 0
