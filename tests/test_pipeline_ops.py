"""Training-data pipeline ops: dedup, similarity, text analysis."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkjesse import dedup, similarity, textops


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Four base docs; doc 10 is a near-duplicate of doc 0 (one word
    changed), doc 11 is an exact duplicate of doc 1."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [
        (0, base),
        (1, "pack my box with five dozen liquor jugs while the band "
            "plays on and the crowd cheers loudly tonight"),
        (2, "sphinx of black quartz judge my vow said the wizard to "
            "the apprentice in the tall stone tower"),
        (3, "how vexingly quick daft zebras jump over fences near the "
            "old barn by the river in spring"),
        (10, base.replace("green", "blue")),
        (11, "pack my box with five dozen liquor jugs while the band "
             "plays on and the crowd cheers loudly tonight"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicate_groups(near_dup_docs):
    groups = dedup.exact_duplicate_groups(
        near_dup_docs, F.md5("text")).collect()
    assert len(groups) == 1
    assert groups[0]["group_size"] == 2
    assert groups[0]["keep_id"] == 1 and groups[0]["max_id"] == 11


def test_lsh_finds_near_duplicates(near_dup_docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.lsh_candidate_pairs(
                 near_dup_docs, bands=8, rows_per_band=1).collect()}
    assert (1, 11) in pairs        # exact dup always collides
    assert (0, 10) in pairs        # near-dup shares most shingles
    # dissimilar docs should not flood the candidate set
    assert (2, 3) not in pairs


def test_jaccard_verifies_candidates(near_dup_docs):
    pairs = dedup.lsh_candidate_pairs(near_dup_docs, bands=8,
                                      rows_per_band=1)
    verified = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ngram_jaccard_pairs(
                    near_dup_docs, pairs, min_jaccard=0.5).collect()}
    assert verified[(1, 11)] == 1.0
    assert 0.5 < verified[(0, 10)] < 1.0


def test_simhash_hamming_close_for_near_dups(near_dup_docs):
    fps = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(near_dup_docs, bits=16).collect()}
    assert fps[1] == fps[11]  # identical text → identical fingerprint
    ham = bin(fps[0] ^ fps[10]).count("1")
    assert ham <= 4  # one-word change flips few bits
    far = bin(fps[2] ^ fps[3]).count("1")
    assert far >= ham


@pytest.mark.parametrize("max_h", [3, 7])
def test_simhash_near_pairs_banded_perfect_recall(near_dup_docs, max_h):
    """Pigeonhole banding: EVERY pair within max_hamming must be found
    (any such pair agrees exactly on >=1 of max_hamming+1 bands) —
    compare against exhaustive pairwise hamming over the same banded
    fingerprints."""
    bands = max_h + 1
    fps = {r["doc_id"]: tuple(r[f"band{b}"] for b in range(bands))
           for r in dedup.simhash_banded(near_dup_docs, bits=64,
                                         bands=bands).collect()}
    ids = sorted(fps)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(bin(x ^ y).count("1")
                      for x, y in zip(fps[a], fps[b]))
            if ham <= max_h:
                expected[(a, b)] = ham
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(
               near_dup_docs, bits=64, max_hamming=max_h).collect()}
    assert got == expected  # perfect recall AND exact hammings
    assert got.get((1, 11)) == 0  # identical text always surfaces


def test_brute_force_topk_self_similarity(spark):
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    # vec 5 duplicated direction of vec 0
    rows.append((6, [2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = similarity.brute_force_topk(
        df.where(F.col("vec_id") == 0), df, k=1).collect()
    assert top[0]["neighbor_id"] == 6 and top[0]["cosine"] == 1.0


def test_cosine_zero_norm_yields_null_on_both_paths(spark):
    # Spark 4 runs ANSI mode by default: an unguarded dot/|a|/|b|
    # aborts the job with DIVIDE_BY_ZERO on the first all-zero
    # embedding. Both kernels must instead yield NULL for zero-norm
    # or NULL operands and agree exactly on valid rows.
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]),
         ([3.0, 4.0], [1.0, 0.0]),
         (None, [1.0, 1.0]),
         ([1.0, 2.0], [0.0, 0.0])],
        "a array<double>, b array<double>")
    expr = [r["c"] for r in df.select(
        similarity.cosine_col(F.col("a"), F.col("b")).alias("c"))
        .collect()]
    arrow = [r["c"] for r in df.select(
        similarity.cosine_pairs_udf(F.col("a"), F.col("b")).alias("c"))
        .collect()]
    assert expr == arrow
    assert expr[0] is None and expr[2] is None and expr[3] is None
    assert expr[1] == pytest.approx(0.6)


def test_ann_bucketed_matches_brute_force_for_same_bucket(spark):
    rows = [(i, [1.0 + i, 0.5, -0.25, 1.0] + [0.1] * 4)
            for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bf = similarity.brute_force_topk(df.where(F.col("vec_id") < 2), df, k=3)
    ann = similarity.ann_topk_bucketed(df.where(F.col("vec_id") < 2), df,
                                       k=3, bits=4)
    # all vectors share one sign bucket → ANN must equal brute force
    assert sorted(map(tuple, bf.collect())) == \
        sorted(map(tuple, ann.collect()))


def test_ann_multiprobe_recall_vs_brute_force(spark):
    """bits=8 single-probe collapses recall (256 buckets, one probed);
    Hamming-1 multi-probe must recover most of the exact top-k."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(queries, emb,
                                                  k=5).collect()}

    def recall(multiprobe: int) -> float:
        got = {(r["query_id"], r["neighbor_id"])
               for r in similarity.ann_topk_bucketed(
                   queries, emb, k=5, bits=8,
                   multiprobe=multiprobe).collect()}
        return len(got & truth) / len(truth)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0  # probing more (disjoint) buckets can only help
    # the sf embeddings are near-uniform (worst case for any LSH):
    # multi-probe must still beat the 9-of-256-buckets chance level ~4x
    assert r1 >= 4 * (9 / 256), (r0, r1)


def test_ann_multiprobe_rescues_hyperplane_straddlers(spark):
    """The failure mode multi-probe exists for: a query whose true
    nearest neighbor sits across ONE hyperplane (a near-zero leading
    dimension flips sign). Single-probe misses it; Hamming-1 probing
    finds it every time."""
    dims = 12
    corpus, queries = [], []
    for i in range(16):
        base = [1.0 if (i >> (d % 4)) & 1 else -1.0 for d in range(dims)]
        flip = i % 8
        base[flip] = 0.001            # sits on hyperplane `flip`
        q = list(base)
        q[flip] = -0.001              # nudged to the other side
        corpus.append((100 + i, base))
        queries.append((i, q))
    emb = spark.createDataFrame(corpus + queries,
                                ["vec_id", "embedding"])
    qdf = emb.where(F.col("vec_id") < 100)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(qdf, emb, k=1).collect()}
    assert truth == {(i, 100 + i) for i in range(16)}  # cosine ~1 partner

    def hits(multiprobe: int) -> int:
        got = {(r["query_id"], r["neighbor_id"])
               for r in similarity.ann_topk_bucketed(
                   qdf, emb, k=1, bits=8, multiprobe=multiprobe).collect()}
        return len(got & truth)

    assert hits(0) == 0    # every partner is across one hyperplane
    assert hits(1) == 16   # multi-probe recovers all of them


def test_embedding_near_duplicates_exact_sweep(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # block=None: the exact quadratic sweep, for small slices only
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.embedding_near_duplicates(
                 df, threshold=0.99, block=None).collect()}
    assert pairs == {(0, 1)}


def test_embedding_near_duplicates_blocked_default(spark):
    """Default = sign-bucket blocking: near-dups share their leading
    signs and are found; cross-bucket candidates are never scored."""
    rows = [(0, [1.0, 1.0, 1.0, 1.0]), (1, [0.99, 1.0, 1.0, 1.02]),
            (2, [-1.0, 1.0, 1.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["id_a"], r["id_b"])
             for r in dedup.embedding_near_duplicates(
                 df, threshold=0.9).collect()}
    assert pairs == {(0, 1)}
    # the blocked plan is an equijoin on the bucket, not a cross join
    plan = dedup.embedding_near_duplicates(df, threshold=0.9) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    ts = textops.token_stats(df).collect()[0]
    assert (ts["n_tokens"], ts["n_distinct"], ts["max_token_len"]) \
        == (3, 2, 2)
    assert ts["avg_token_len"] == 2.0
    q = textops.quality_features(df).collect()[0]
    assert q["n_chars"] == 8 and 0.0 <= q["quality_score"] <= 1.0


def test_language_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "the la der xyz"), (2, "el la de que")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_guess"]
           for r in textops.language_id(df).collect()}
    assert out[1] == "en"   # tie between en/es/de broken by priority
    assert out[2] == "es"


def test_fingerprints_stable(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    fp = textops.fingerprints(df).collect()[0]
    import hashlib
    assert fp["content_md5"] == hashlib.md5(b"a b c d e").hexdigest()
    assert fp["prefix_md5"] == hashlib.md5(b"a b c").hexdigest()
    assert fp["n_shingles"] == 3


def test_ivf_topk_probes_and_recall(spark):
    """IVF: corpus assigned to its nearest deterministic centroid,
    queries probe 2 cells. On clustered data (each query near one
    centroid direction) IVF recovers the exact top-k."""
    dims = 8
    # 4 well-separated centroid directions
    base = {0: [1.0] + [0.0] * 7, 1: [0.0, 1.0] + [0.0] * 6,
            2: [0.0, 0.0, 1.0] + [0.0] * 5,
            3: [0.0] * 3 + [1.0] + [0.0] * 4}
    rows = [(i, base[i]) for i in range(4)]  # centroids themselves
    # members: perturbed copies of each direction
    for i in range(4, 24):
        d = i % 4
        v = list(base[d])
        v[(d + 4) % dims] = 0.05 + 0.01 * (i % 5)
        rows.append((i, v))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id").isin([20, 21, 22, 23]))
    bf = {(r["query_id"], r["rank"]): r["neighbor_id"]
          for r in similarity.brute_force_topk(queries, emb,
                                               k=3).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in similarity.ivf_topk(queries, emb, k=3,
                                        n_centroids=4,
                                        nprobe=2).collect()}
    # every query's exact top-3 lives in its own cell -> identical
    assert ivf == bf
    # determinism: same result twice
    again = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in similarity.ivf_topk(queries, emb, k=3,
                                          n_centroids=4,
                                          nprobe=2).collect()}
    assert again == ivf


def test_simhash_is_zero_shuffle(spark):
    """simhash is a per-row fold: no Exchange anywhere in the plan
    (the legacy implementation shuffled #docs × #distinct-tokens
    exploded rows through a 16-column groupBy)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = dedup.simhash(docs, bits=16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1200]


def test_lsh_mega_cluster_streams_pairs(spark):
    """A 10k-copy duplicate cluster shares every band of its minhash
    signature. The pair stage must stream the ~5×10^7 pairs through a
    join — never collect_list a bucket and expand the quadratic pair
    set inside one row (a single-task OOM at web scale) — and
    first-match-band dedup must emit each unordered pair exactly once
    (all 4 bands agree here; a naive emit would count every pair 4×)."""
    n = 10_000
    boiler = ("the same boilerplate page crawled many times with "
              "identical tokens everywhere on it")
    dup = spark.range(n).select(F.col("id").alias("doc_id"),
                                F.lit(boiler).alias("text"))
    uniq = spark.range(n + 1, n + 2).select(
        F.col("id").alias("doc_id"),
        F.lit("completely different words in this unique "
              "document right here").alias("text"))
    pairs = dedup.lsh_candidate_pairs(dup.unionByName(uniq),
                                      bands=4, rows_per_band=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, plan[:1500]
    assert pairs.agg(F.count(F.lit(1))).collect()[0][0] \
        == n * (n - 1) // 2


def test_ivf_assignment_is_map_side(spark):
    """IVF index build must not shuffle the corpus: the only hash
    exchange is the final per-query top-k window, and the only other
    exchange broadcasts the tiny probe side."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    out = similarity.ivf_topk(q, emb, k=3, n_centroids=4, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert plan.count("BroadcastExchange") == 1, plan[:1500]


def test_ivf_broadcast_assignment_parity_at_256_centroids(spark):
    """The broadcast-matrix pandas-UDF assignment must agree with the
    literal-expression path BIT-FOR-BIT at a codebook size (256) where
    literal baking is only still feasible enough to serve as the
    reference: same fold order for dots/norms, same HALF_UP rounding,
    same id-ascending tie-break. Also pins the plan: no corpus shuffle
    (the only hash exchange is the top-k window) and one broadcast."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") >= 490)
    lit = similarity.ivf_topk(q, emb, k=3, n_centroids=256, nprobe=2,
                              literal_max=1024)
    bc = similarity.ivf_topk(q, emb, k=3, n_centroids=256, nprobe=2,
                             literal_max=16)
    rows_lit = sorted(tuple(r) for r in lit.collect())
    rows_bc = sorted(tuple(r) for r in bc.collect())
    assert rows_bc == rows_lit
    # after execution AQE's toString appends the Initial Plan section —
    # count exchanges in the final plan only
    plan = bc._jdf.queryExecution().executedPlan().toString() \
        .split("+- == Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert plan.count("BroadcastExchange") == 1, plan[:1500]
    assert "ArrowEvalPython" in plan  # the broadcast-matrix UDF


def test_kmeans_codebook_deterministic_and_tightens_cells(spark):
    """Fixed-iteration Lloyd: bit-identical across runs on the same
    layout, and the refined codebook must not WORSEN the quantization
    objective (mean cosine of each vector to its assigned centroid)
    versus the first-n seed."""
    import numpy as np
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb1 = similarity.kmeans_codebook(emb, n_centroids=16, n_iters=3)
    cb2 = similarity.kmeans_codebook(emb, n_centroids=16, n_iters=3)
    assert cb1 == cb2
    assert len(cb1) == 16 and len(cb1[0][1]) == 64

    vecs = np.asarray([r["embedding"] for r in
                       emb.select("embedding").collect()], dtype=np.float64)

    def objective(cb):
        C = np.asarray([v for _, v in cb])
        sims = (vecs @ C.T) / np.linalg.norm(vecs, axis=1)[:, None] \
            / np.linalg.norm(C, axis=1)[None, :]
        return float(sims.max(axis=1).mean())

    seed_rows = emb.orderBy("vec_id").limit(16) \
        .select("vec_id", "embedding").collect()
    seed = [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in seed_rows]
    assert objective(cb1) >= objective(seed) - 1e-9


def test_ivf_trained_end_to_end(spark):
    """ivf_topk(train_iters=2): Lloyd-refined codebook through the
    broadcast-matrix assignment, end to end — deterministic across
    runs, k rows per query, and recall vs brute force stays useful at
    nprobe=4/16 cells (training shifts cell boundaries, so exact
    recall parity with the seed codebook is NOT guaranteed — the
    quantization-objective improvement is pinned separately in
    test_kmeans_codebook_deterministic_and_tightens_cells)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    bf = {(r["query_id"], r["neighbor_id"])
          for r in similarity.brute_force_topk(q, emb, k=3).collect()}
    trained = similarity.ivf_topk(q, emb, k=3, n_centroids=16, nprobe=4,
                                  train_iters=2, literal_max=8)
    rows = trained.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(got & bf) / len(bf) >= 0.5
    again = sorted(tuple(r) for r in similarity.ivf_topk(
        q, emb, k=3, n_centroids=16, nprobe=4, train_iters=2,
        literal_max=8).collect())
    assert again == sorted(tuple(r) for r in rows)


# -- paragraph-level dedup ---------------------------------------------------

def test_paragraphs_windows_and_provenance(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")],
                               ["doc_id", "text"])
    rows = sorted(
        (r["doc_id"], r["para_idx"], r["para_text"])
        for r in dedup.paragraphs(df, para_tokens=4).collect())
    assert rows == [(1, 0, "a b c d"), (1, 1, "e f g h"), (1, 2, "i j")]


def test_paragraph_duplicate_groups(spark):
    boiler = "subscribe to our newsletter for updates every single day"
    rep = "copy copy copy copy copy copy copy copy"  # one 8-token window
    rows = [
        (1, boiler + " unique tail one two three four five six"),
        (2, boiler + " other ending seven eight nine ten eleven twelve"),
        (3, "entirely different document with no shared windows at all"),
        (4, rep + " " + rep),  # intra-doc repeat
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = {r["keep_doc"]: r for r in
              dedup.paragraph_duplicate_groups(df, para_tokens=8).collect()}
    # boilerplate window shared across docs 1 and 2 at para_idx 0
    g = groups[1]
    assert (g["group_size"], g["n_docs"], g["keep_para_idx"]) == (2, 2, 0)
    # intra-doc repeat: doc 4 holds both copies
    g4 = groups[4]
    assert (g4["group_size"], g4["n_docs"], g4["keep_para_idx"]) == (2, 1, 0)
    assert len(groups) == 2  # doc 3 contributes nothing


def test_token_windows_anchors_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], ["doc_id", "text"])
    rows = sorted((r["doc_id"], r["pos"], r["window_text"]) for r in
                  dedup.token_windows(df, span_tokens=4,
                                      stride=2).collect())
    # 7 tokens, span 4, stride 2 -> anchors at 0 and 2 only (pos 4
    # would need tokens 5..8); doc 2 (< span tokens) yields nothing
    assert rows == [(1, 0, "a b c d"), (1, 2, "c d e f")]


def test_duplicate_spans_cross_doc_and_keeper(spark):
    inj = "one two three four five six seven eight"
    rows = [
        (1, "lead in words then " + inj + " and a unique tail here"),
        (2, inj + " with an entirely different continuation text"),
        (3, "no shared material in this document at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = dedup.duplicate_spans(df, span_tokens=8).collect()
    # exactly one duplicated 8-token window: the injected span, which
    # starts at token 4 of doc 1 and token 0 of doc 2
    assert len(spans) == 1
    s = spans[0]
    assert (s["n_occurrences"], s["n_docs"]) == (2, 2)
    assert (s["keep_doc"], s["keep_pos"]) == (1, 4)


def test_duplicate_spans_winnow_detection_floor(spark):
    # winnowing theorem: any duplicated substring of span+winnow-1
    # tokens is caught regardless of its offset in either copy.
    # span=4, winnow=3 -> floor 6; embed 6-token duplicates at every
    # misaligned offset pair (the case that breaks position-striding:
    # offsets 2 vs 1 disagree mod 3).
    dup = "p q r s t u"
    for off1, off2 in [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)]:
        pre1 = " ".join(f"a{i}" for i in range(off1))
        pre2 = " ".join(f"b{i}" for i in range(off2))
        rows = [(1, (pre1 + " " + dup + " c d e").strip()),
                (2, (pre2 + " " + dup + " x y z v k").strip())]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        spans = dedup.duplicate_spans(df, span_tokens=4,
                                      winnow=3).collect()
        cross = [s for s in spans if s["n_docs"] == 2]
        assert cross, f"missed duplicate at offsets {(off1, off2)}"


def test_winnowed_windows_content_defined_and_density(spark):
    # identical docs select identical (pos, text) windows; selection
    # is a subset of the stride-1 windows; rightmost-min tie rule is
    # deterministic (same corpus twice -> same selection)
    text = " ".join(f"t{i % 7}" for i in range(40))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    sel = dedup.winnowed_windows(df, span_tokens=4, winnow=5).collect()
    by_doc = {}
    for r in sel:
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["pos"], r["window_text"]))
    assert by_doc[1] == by_doc[2]
    full = {(r["pos"], r["window_text"]) for r in
            dedup.token_windows(df.where("doc_id = 1"), span_tokens=4,
                                stride=1).collect()}
    assert by_doc[1] < full  # strict subset: winnowing dropped some


def test_span_dup_rate_counts_and_zero_window_docs(spark):
    rep = "c1 c2 c3 c4 c5 c6 c7 c8"
    rows = [(1, rep + " " + rep),                 # heavy intra-doc repeat
            (2, "all fresh words never repeated anywhere in corpus x9"),
            (3, "tiny")]                          # no full window
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.span_dup_rate(df, span_tokens=8).collect()}
    assert len(got) == 3  # count-preserving, one row per input doc
    # doc 1: 9 windows (16 tokens), window at pos 0 == window at pos 8
    assert got[1]["n_windows"] == 9 and got[1]["n_dup_windows"] == 2
    assert got[1]["dup_rate"] == pytest.approx(2 / 9, abs=1e-6)
    assert (got[2]["n_dup_windows"], got[2]["dup_rate"]) == (0, 0.0)
    assert (got[3]["n_windows"], got[3]["dup_rate"]) == (0, 0.0)


def test_remove_duplicate_spans_keeper_and_rewrite(spark):
    inj = "one two three four five six seven eight"
    rows = [
        (1, "lead in words then " + inj + " and a unique tail here"),
        (2, inj + " with an entirely different continuation text"),
        (3, "no shared material in this document at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, span_tokens=8).collect()}
    assert len(got) == 3
    # doc 1 holds the canonical (min doc, min pos) occurrence: intact
    assert got[1]["text"] == rows[0][1]
    assert got[1]["n_tokens_removed"] == 0
    # doc 2 loses exactly the injected 8 tokens, order preserved
    assert got[2]["text"] == "with an entirely different continuation text"
    assert got[2]["n_tokens_removed"] == 8
    # untouched doc passes through byte-identical
    assert got[3]["text"] == rows[2][1]
    assert got[3]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_whole_doc_copy_collapses(spark):
    # an exact copy of a >=span doc loses every token (all its windows
    # are non-keeper occurrences and their union covers the doc)
    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, span_tokens=8).collect()}
    assert got[1]["text"] == text and got[1]["n_tokens_removed"] == 0
    assert got[2]["text"] == "" and got[2]["n_tokens_removed"] == 12


def test_remove_duplicate_spans_intra_doc_repeat(spark):
    rep = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame([(1, rep + " " + rep)], ["doc_id", "text"])
    got = dedup.remove_duplicate_spans(df, span_tokens=8).collect()[0]
    # second occurrence (pos 8..15) dropped, keeper at pos 0 survives
    assert got["text"] == rep
    assert got["n_tokens_removed"] == 8


def test_remove_duplicate_spans_keeper_survives_overlap(spark):
    # round-4 ADVICE: span B's NON-keeper occurrence overlapping span
    # A's KEEPER occurrence must not destroy A's canonical copy.
    # span A = "a b c d": keeper doc1@0, dup doc2@3
    # span B = "c d e f": keeper doc0@0, dup doc1@2 (overlaps A@0)
    rows = [
        (0, "c d e f q r s t"),
        (1, "a b c d e f u v"),
        (2, "z z z a b c d w w w"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, span_tokens=4).collect()}
    # doc0: B's keeper — untouched
    assert got[0]["text"] == rows[0][1]
    assert got[0]["n_tokens_removed"] == 0
    # doc1: A's keeper tokens (0-3) are EXEMPT even though B's
    # non-keeper occurrence at pos 2 covers tokens 2-5; only the
    # non-keeper-only tokens (e, f) go
    assert got[1]["text"] == "a b c d u v"
    assert got[1]["n_tokens_removed"] == 2
    # doc2: A's non-keeper occurrence at pos 3 drops tokens 3-6
    assert got[2]["text"] == "z z z w w w"
    assert got[2]["n_tokens_removed"] == 4


def test_min_pos_encoding_guard_raises_past_bound(spark):
    # positions >= 2^20 would silently corrupt keeper coordinates;
    # the encoding must raise instead (round-4 ADVICE)
    from sparkjesse.dedup import _min_pos_enc
    ok = spark.createDataFrame([(7, 5), (2, 3)], ["doc_id", "pos"])
    assert (ok.agg(_min_pos_enc("doc_id", "pos").alias("e"))
              .collect()[0]["e"]) == (2 << 20) + 3
    bad = spark.createDataFrame([(1, 5), (1, 1 << 20)],
                                ["doc_id", "pos"])
    with pytest.raises(Exception, match="min-encoding"):
        bad.agg(_min_pos_enc("doc_id", "pos")).collect()


# -- multi-digest (>128-bit) SimHash ----------------------------------------

def _py_simhash_bands(text: str, bits: int, bands: int) -> tuple:
    """Reference reimplementation of simhash_banded's vote math."""
    import hashlib
    n_digests = (bits // 4 + 31) // 32
    votes = [0] * bits
    for tok in dict.fromkeys(text.split(" ")):
        hx = hashlib.md5(tok.encode()).hexdigest() + "".join(
            hashlib.md5(f"{d}:{tok}".encode()).hexdigest()
            for d in range(1, n_digests))
        for j in range(bits):
            nib = int(hx[j // 4], 16)
            votes[j] += 1 if (nib >> (j % 4)) & 1 else -1
    w = bits // bands
    out = []
    for b in range(bands):
        val = 0
        for k in range(w):
            if votes[b * w + k] > 0:
                val += 1 << k
        out.append(val)
    return tuple(out)


def test_simhash_multi_digest_python_parity(near_dup_docs):
    got = {r["doc_id"]: tuple(r[f"band{b}"] for b in range(8))
           for r in dedup.simhash_banded(near_dup_docs, bits=256,
                                         bands=8).collect()}
    for doc_id, text in [(r["doc_id"], r["text"])
                         for r in near_dup_docs.collect()]:
        assert got[doc_id] == _py_simhash_bands(text, 256, 8), doc_id


def test_simhash_multi_digest_extends_single_digest_prefix(near_dup_docs):
    """Bits 0..127 of the 256-bit fingerprint ARE the 128-bit
    fingerprint (stream 0 is the bare md5), band-for-band at equal
    band width — growing bits never changes the bits you already had."""
    narrow = {r["doc_id"]: tuple(r[f"band{b}"] for b in range(4))
              for r in dedup.simhash_banded(near_dup_docs, bits=128,
                                            bands=4).collect()}
    wide = {r["doc_id"]: tuple(r[f"band{b}"] for b in range(8))
            for r in dedup.simhash_banded(near_dup_docs, bits=256,
                                          bands=8).collect()}
    for doc_id, bs in narrow.items():
        assert wide[doc_id][:4] == bs


def test_simhash_wide_perfect_recall_256_bits(near_dup_docs):
    """Pigeonhole recall at bits=256 / bands=8: every pair within
    hamming 7 agrees exactly on >=1 of the 8 bands."""
    max_h = 7
    fps = {r["doc_id"]: tuple(r[f"band{b}"] for b in range(8))
           for r in dedup.simhash_banded(near_dup_docs, bits=256,
                                         bands=8).collect()}
    ids = sorted(fps)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(bin(x ^ y).count("1")
                      for x, y in zip(fps[a], fps[b]))
            if ham <= max_h:
                expected[(a, b)] = ham
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_pairs(
               near_dup_docs, bits=256, max_hamming=max_h).collect()}
    assert got == expected
    assert got.get((1, 11)) == 0


# -- duplicate clusters (connected components) --------------------------------

def test_duplicate_clusters_chain_and_cliques(spark):
    # chain 0-1-2-3-4 (diameter 4) + clique {10,11,12} + pair {20,21}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4),
         (10, 11), (10, 12), (11, 12),
         (20, 21)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_duplicate_clusters_end_to_end_keep_list(near_dup_docs):
    """pairs → components → keep-list: the full dedup pipeline."""
    from pyspark.sql import functions as F
    pairs = dedup.lsh_candidate_pairs(near_dup_docs, bands=8,
                                      rows_per_band=1)
    clusters = dedup.duplicate_clusters(pairs)
    # docs 0/10 and 1/11 are near/exact dups; keepers are 0 and 1
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got[10] == 0 and got[11] == 1
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id"))
    kept = (near_dup_docs.join(drop, on="doc_id", how="left_anti")
            .select("doc_id"))
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2, 3}


def test_top_tokens_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(1, "a b b c c c", "en"), (2, "c a a", "es")],
        ["doc_id", "text", "lang"])
    top = {(r["token"], r["n"], r["rank"])
           for r in textops.top_tokens(df, k=2).collect()}
    assert top == {("c", 4, 1), ("a", 3, 2)}
    grouped = {(r["lang"], r["rank"]): (r["token"], r["n"])
               for r in textops.top_tokens(df, k=1, by="lang").collect()}
    assert grouped == {("en", 1): ("c", 3), ("es", 1): ("a", 2)}
    # global top-k must be a TakeOrdered merge, not a full sort
    plan = (textops.top_tokens(df, k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_label_centroids_known_geometry(spark):
    # label 0: two opposite-ish vectors -> centroid between, cohesion<1
    # label 1: two identical vectors -> cohesion == 1.0
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.5, 0.5, 0.5, 0.5], 1),
        (4, [0.5, 0.5, 0.5, 0.5], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in
           similarity.label_centroids(df, dim=4).collect()}
    assert out[0]["n"] == 2 and out[1]["n"] == 2
    assert out[0]["centroid"] == [0.5, 0.5, 0.0, 0.0]
    # cos([1,0,0,0],[.5,.5,0,0]) = .5/(1*sqrt(.5)) = 0.707107
    assert out[0]["cohesion"] == pytest.approx(0.707107, abs=1e-6)
    assert out[1]["cohesion"] == pytest.approx(1.0, abs=1e-6)


def test_label_centroids_broadcast_no_embedding_shuffle(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.label_centroids(emb, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_simhash_banded_arrow_matches_expression(spark, sf_dir):
    """The Arrow fingerprint walk must be BIT-IDENTICAL to the
    Catalyst expression fold — same md5 nibbles, vote LUT, tie rule,
    multi-digest streams — at a >128-bit width (where 'auto' selects
    it), including a null-text row."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(120)
    null_row = base.limit(1).selectExpr(
        "doc_id + 1000000 as doc_id", "cast(null as string) as text")
    docs = base.union(null_row)
    expr = {r["doc_id"]: tuple(r)[1:] for r in
            dedup.simhash_banded(docs, bits=256, bands=8,
                                 impl="expr").collect()}
    arrow = {r["doc_id"]: tuple(r)[1:] for r in
             dedup.simhash_banded(docs, bits=256, bands=8,
                                  impl="arrow").collect()}
    assert expr == arrow
    auto = {r["doc_id"]: tuple(r)[1:] for r in
            dedup.simhash_banded(docs, bits=256, bands=8).collect()}
    assert auto == expr  # auto routes >128 bits to the arrow path


def test_minhash_arrow_matches_expression(spark):
    """The Arrow hashlib walk is bit-identical to the Catalyst fold on
    every edge the expression path has: null text (folds to the "~"
    init sentinel — least() ignores nulls), empty string, docs
    shorter than the shingle width (whole-text shingle), repeated
    tokens (array_distinct), multiple/leading/trailing spaces (split
    keeps empty tokens), and unicode."""
    rows = [("d0", None), ("d1", ""), ("d2", "one"), ("d3", "one two"),
            ("d4", "one two three"), ("d5", "a b c d e f g h"),
            ("d6", "dup dup dup dup dup"), ("d7", "a  b   c"),
            ("d8", " leading and trailing "), ("d9", "naïve café 官话"),
            ("d10", "x y z x y z x y z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for num_hashes, n in [(8, 3), (4, 2), (1, 5)]:
        expr = {r["doc_id"]: tuple(r)[1:] for r in
                dedup.minhash_signatures(
                    df, num_hashes=num_hashes, shingle_n=n,
                    impl="expr").collect()}
        arrow = {r["doc_id"]: tuple(r)[1:] for r in
                 dedup.minhash_signatures(
                     df, num_hashes=num_hashes, shingle_n=n,
                     impl="arrow").collect()}
        assert expr == arrow, (num_hashes, n)


def test_lsh_pairs_identical_under_both_minhash_impls(near_dup_docs):
    want = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(
        near_dup_docs, bands=8, rows_per_band=1).collect()}
    assert want  # non-trivial fixture


def test_cosine_pairs_udf_bit_identical_to_expression(spark):
    """The vectorized pairwise cosine must equal the expression fold
    BIT-FOR-BIT: it loops over dimensions so each pair's accumulator
    sees the same IEEE-double op sequence as the left fold. Pins
    random float32 vectors (several dims), row nulls, and
    length-mismatched pairs (null-poisoned in the expression).
    Zero-norm vectors are NOT compared: under Spark 4 ANSI mode the
    expression path RAISES DIVIDE_BY_ZERO while the UDF returns NaN —
    the UDF is the more forgiving of the two (documented in the
    docstring)."""
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(200):
        d = rnd.choice([4, 16, 16, 16, 33])
        rows.append((f"v{i}",
                     [rnd.uniform(-2, 2) for _ in range(d)],
                     [rnd.uniform(-2, 2) for _ in range(d)]))
    rows += [("nullrow", None, [1.0] * 4),
             ("mismatch", [1.0] * 4, [1.0] * 5)]
    df = spark.createDataFrame(
        rows, "id string, a array<float>, b array<float>")
    got = {r["id"]: (r["e"], r["u"]) for r in df.select(
        "id",
        similarity.cosine_col(F.col("a"), F.col("b")).alias("e"),
        similarity.cosine_pairs_udf(F.col("a"), F.col("b")).alias("u"))
        .collect()}
    for key, (e, u) in got.items():
        if e is None or (isinstance(e, float) and math.isnan(e)):
            assert u is None or (isinstance(u, float) and math.isnan(u)), \
                (key, e, u)
        else:
            assert e == u and str(e) == str(u), (key, e, u)


def test_brute_force_topk_impls_agree(spark):
    import random
    rnd = random.Random(11)
    vecs = [(f"v{i}", [rnd.uniform(-1, 1) for _ in range(16)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
    q = df.limit(5)
    a = sorted(map(tuple, similarity.brute_force_topk(
        q, df, k=4, impl="expr").collect()))
    b = sorted(map(tuple, similarity.brute_force_topk(
        q, df, k=4, impl="arrow").collect()))
    assert a == b


# -- product quantization ----------------------------------------------------

def _pq_fixture(spark, n=64, dim=8):
    """Clustered vectors: 4 well-separated centers, deterministic
    perturbations; ids 0..n-1."""
    import math as _math
    rows = []
    for i in range(n):
        c = i % 4
        base = [10.0 * c + (1.0 if j == c else 0.0) for j in range(dim)]
        pert = [0.01 * _math.sin(i * 31 + j * 7) for j in range(dim)]
        rows.append((i, [float(b + p) for b, p in zip(base, pert)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pq_train_shapes_and_determinism(spark):
    df = _pq_fixture(spark)
    cb1 = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    cb2 = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    assert cb1 == cb2  # fixed seeds, fixed iters, ordered combines
    assert [s for s, _ in cb1] == [0, 1, 2, 3]
    for _, book in cb1:
        assert [c for c, _ in book] == list(range(8))
        assert all(len(v) == 2 for _, v in book)  # dim 8 / m 4


def test_pq_train_rejects_indivisible_dim(spark):
    df = _pq_fixture(spark, dim=6)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(df, m=4, n_codes=4, n_iters=1)


def test_pq_encode_exact_on_centroid_grid(spark):
    # hand-built codebooks: 2 subspaces of width 1, codes {0.0, 10.0};
    # vectors sitting exactly on grid points encode to the exact codes
    cbs = [(0, [(0, [0.0]), (1, [10.0])]),
           (1, [(0, [0.0]), (1, [10.0])])]
    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [10.0, 0.0]), (3, [10.0, 10.0]),
         (4, [4.9, 5.1])],  # nearer 0 in sub 0, nearer 10 in sub 1
        ["vec_id", "embedding"])
    got = {r["vec_id"]: r["pq_code"] for r in
           similarity.pq_encode(df, cbs).collect()}
    assert got == {1: [0, 1], 2: [1, 0], 3: [1, 1], 4: [0, 1]}


def test_pq_topk_matches_exhaustive_adc(spark):
    df = _pq_fixture(spark, n=32)
    cbs = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    codes_df = similarity.pq_encode(df, cbs)
    queries = df.where(F.col("vec_id") < 3)
    got = similarity.pq_topk(queries, codes_df, cbs, k=5)
    got_rows = sorted((r["query_id"], r["rank"], r["neighbor_id"],
                       r["adist"]) for r in got.collect())

    # exhaustive python ADC oracle with the same rounding/tie rules
    import numpy as np
    cb = np.stack([np.asarray([v for _, v in book]) for _, book in cbs])
    m, k_codes, sub = cb.shape
    data = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in df.collect()}
    codes = {r["vec_id"]: r["pq_code"] for r in codes_df.collect()}
    want = []
    for q in range(3):
        lut = np.stack([
            np.round(((data[q][s * sub:(s + 1) * sub] - cb[s]) ** 2
                      ).sum(axis=1), 9) for s in range(m)])
        scored = sorted(
            (round(float(sum(lut[s][codes[v][s]] for s in range(m))), 9),
             v) for v in data)
        for rank, (d, v) in enumerate(scored[:5], start=1):
            want.append((q, rank, v, d))
    assert got_rows == sorted(want)


def test_pq_topk_recall_on_clustered_data(spark):
    # on well-separated clusters, PQ@k must retrieve same-cluster
    # members: the nearest neighbors of query i are the vecs with
    # matching i % 4
    df = _pq_fixture(spark, n=64)
    cbs = similarity.pq_train(df, m=4, n_codes=8, n_iters=3)
    codes_df = similarity.pq_encode(df, cbs)
    queries = df.where(F.col("vec_id").isin([0, 1, 2, 3]))
    got = similarity.pq_topk(queries, codes_df, cbs, k=8).collect()
    for r in got:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4, r


def test_ivfpq_index_and_full_probe_matches_pq(spark):
    # with nprobe = n_centroids (probe everything), IVF-PQ must equal
    # plain PQ top-k: the cell filter admits the whole corpus
    df = _pq_fixture(spark, n=32)
    coarse = similarity.kmeans_codebook(df, n_centroids=4, n_iters=2)
    pq = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    index = similarity.ivfpq_index(df, coarse_codebook=coarse,
                                   pq_codebooks=pq)
    assert set(index.columns) == {"vec_id", "cell", "pq_code"}
    queries = df.where(F.col("vec_id") < 3)
    full = similarity.ivfpq_topk(queries, index, coarse_codebook=coarse,
                                 pq_codebooks=pq, k=5, nprobe=4)
    plain = similarity.pq_topk(queries,
                               similarity.pq_encode(df, pq), pq, k=5)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_ivfpq_single_probe_stays_in_cluster(spark):
    # well-separated clusters: nprobe=1 finds same-cluster neighbors
    # and the probed-cell filter excludes other clusters' members
    df = _pq_fixture(spark, n=64)
    coarse = similarity.kmeans_codebook(df, n_centroids=4, n_iters=3)
    pq = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    index = similarity.ivfpq_index(df, coarse_codebook=coarse,
                                   pq_codebooks=pq)
    queries = df.where(F.col("vec_id").isin([0, 1]))
    got = similarity.ivfpq_topk(queries, index, coarse_codebook=coarse,
                                pq_codebooks=pq, k=8, nprobe=1).collect()
    cells = {r["vec_id"]: r["cell"] for r in index.collect()}
    for r in got:
        assert cells[r["neighbor_id"]] == cells[r["query_id"]], r
        assert r["neighbor_id"] % 4 == r["query_id"] % 4, r


def test_duplicate_spans_matches_local_oracle_random_corpora(spark):
    """Property check: duplicate_spans(winnow=1) against a pure-Python
    reference over seeded pseudo-random corpora (small vocab forces
    frequent collisions), including the winnowing guarantee — every
    long-duplicate pair the reference finds must survive winnowed
    detection."""
    import hashlib
    import random

    def py_spans(docs, n):
        occ = {}
        for did, text in docs:
            toks = text.split(" ")
            for p in range(len(toks) - n + 1):
                w = " ".join(toks[p:p + n])
                key = hashlib.md5(w.encode()).hexdigest()
                occ.setdefault(key, []).append((did, p))
        out = {}
        for key, hits in occ.items():
            if len(hits) > 1:
                keep = min(hits)
                out[key] = (len(hits), len({d for d, _ in hits}),
                            keep[0], keep[1])
        return out

    rng = random.Random(1234)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(6)]
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(3, 30))))
                for i in range(25)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        want = py_spans(docs, 4)
        got = {r["span_key"]: (r["n_occurrences"], r["n_docs"],
                               r["keep_doc"], r["keep_pos"])
               for r in dedup.duplicate_spans(df, span_tokens=4).collect()}
        assert got == want, f"trial {trial}"
        # winnow floor: every duplicated substring of >= 4+3-1 tokens
        # must still produce a cross-copy hit under winnow=3. Verify on
        # the duplicated windows the reference found whose doc texts
        # share a 6-token run.
        winnowed = {r["span_key"] for r in
                    dedup.duplicate_spans(df, span_tokens=4,
                                          winnow=3).collect()}
        assert winnowed <= set(want)  # winnowing only subsets


# -- n-gram LM quality scoring ------------------------------------------------

def test_ngram_lm_train_counts_and_pruning(spark):
    rows = [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog sat"),
            (4, "zz yy")]  # zz/yy appear once -> pruned at min_count=2
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = textops.ngram_lm_train(df, max_vocab=100, min_count=2)
    assert m["total"] == 11
    assert m["uni"] == {"the": 3, "cat": 2, "sat": 2}
    assert m["bi"] == {("the", "cat"): 2}


def test_ngram_lm_score_orders_natural_vs_garbage(spark):
    corpus = [(i, "the cat sat on the mat and the dog sat too")
              for i in range(10)]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    m = textops.ngram_lm_train(df, max_vocab=100, min_count=1)
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"),
         (101, "qq ww ee rr tt uu")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           textops.ngram_lm_score(probe, m).collect()}
    assert got[100]["lm_ppl"] < got[101]["lm_ppl"]
    assert got[100]["oov_rate"] == 0.0
    assert got[101]["oov_rate"] == 1.0


def test_ngram_lm_score_matches_hand_computation(spark):
    import math
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    m = textops.ngram_lm_train(df, max_vocab=10, min_count=1)
    # uni: a:2 b:2, bi: (a,b):2 (b,a):1, total 4, V=2, alpha=0.1
    got = textops.ngram_lm_score(df, m, alpha=0.1).collect()[0]
    p1 = (2 + 0.1) / (4 + 0.2)            # unigram start: P(a)
    p2 = (2 + 0.1) / (2 + 0.2)            # P(b|a)
    p3 = (1 + 0.1) / (2 + 0.2)            # P(a|b)
    p4 = p2                               # P(b|a)
    mean = sum(math.log2(p) for p in (p1, p2, p3, p4)) / 4
    assert got["lm_logprob"] == pytest.approx(round(mean, 6), abs=1e-6)
    assert got["lm_ppl"] == pytest.approx(round(2 ** (-mean), 6), abs=1e-5)


def test_ngram_lm_train_bigram_cap_is_topk(spark):
    # the broadcast-safety contract (round-4 VERDICT "What's wrong
    # #1"): the collected bigram set is bounded by max_bigrams BY
    # CONSTRUCTION, and the cap keeps the top-k by (count desc,
    # pair asc) — never an arbitrary subset
    rows = [(1, "a b a b a c"), (2, "a b a c b c"), (3, "a c a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = textops.ngram_lm_train(df, max_vocab=10, min_count=1)
    # bigram corpus counts: (a,b)=4 (b,a)=3 (a,c)=3 (c,a)=1 (c,b)=1
    # (b,c)=1
    assert full["bi"][("a", "b")] == 4 and full["bi"][("a", "c")] == 3
    capped = textops.ngram_lm_train(df, max_vocab=10, min_count=1,
                                    max_bigrams=3)
    assert len(capped["bi"]) == 3
    assert capped["bi"] == {("a", "b"): 4, ("a", "c"): 3, ("b", "a"): 3}
    # vocab restriction still applies IN SPARK before the cap
    restricted = textops.ngram_lm_train(df, max_vocab=2, min_count=1,
                                        max_bigrams=100)
    assert set(restricted["uni"]) == {"a", "b"}  # top-2 unigrams
    assert all(x in {"a", "b"} for p in restricted["bi"] for x in p)


def test_ngram_lm_score_empty_doc_is_null(spark):
    # ADVICE r4: '' / whitespace-only docs have zero tokens — they get
    # NULL scores, not the smoothed-unigram constant for a phantom
    # empty-string token
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    m = textops.ngram_lm_train(df, max_vocab=10, min_count=1)
    probe = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "a b")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           textops.ngram_lm_score(probe, m).collect()}
    for d in (1, 2):
        assert got[d]["lm_ppl"] is None
        assert got[d]["lm_logprob"] is None
        assert got[d]["oov_rate"] is None
    assert got[3]["lm_ppl"] is not None and got[3]["oov_rate"] == 0.0


def test_bpe_train_incremental_matches_naive_recount(spark):
    # the incremental pair-stat merge loop must reproduce the naive
    # full-recount algorithm EXACTLY (same merges, same order) on a
    # corpus rich enough to exercise overlap counting, tiebreaks, and
    # post-merge word collisions
    import random
    rng = random.Random(7)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(200)]
    rows = [(i, " ".join(rng.choices(words, k=12))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = textops.bpe_train(df, n_merges=40, min_count=1)

    # naive reference (the pre-round-5 algorithm, verbatim semantics)
    wc = (df.select(F.explode(F.split("text", " ")).alias("w"))
            .groupBy("w").count().collect())
    table = {tuple(r["w"]) + ("</w>",): r["count"] for r in wc}
    merges = []
    for _ in range(40):
        pairs: dict = {}
        for sym, n in table.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_table: dict = {}
        for sym, n in table.items():
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_table[tuple(out)] = new_table.get(tuple(out), 0) + n
        table = new_table
    assert got["merges"] == merges


def test_recall_at_k_arithmetic(spark):
    # hand case: q1 hits 2/3, q2 hits 0/2 (and is absent from approx)
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        ["query_id", "neighbor_id"])
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99)], ["query_id", "neighbor_id"])
    got = {r["query_id"]: r for r in
           similarity.recall_at_k(approx, exact).collect()}
    assert got[1]["n_exact"] == 3 and got[1]["n_hit"] == 2
    assert got[1]["recall"] == pytest.approx(round(2 / 3, 6))
    assert got[2]["n_hit"] == 0 and got[2]["recall"] == 0.0


def test_ann_stack_recall_floors(spark):
    # regression floors for the approximate stack on the real
    # embeddings fixture — catches recall drift the determinism
    # oracles cannot (a worse-but-valid neighbor set hashes fine).
    # Metrics are matched per comparison: the cosine sketch is scored
    # against exact cosine, and IVF cell-pruning against the
    # EXHAUSTIVE compressed-domain scan (both ADC), so each floor
    # isolates exactly one approximation's loss.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)

    exact = similarity.brute_force_topk(queries, emb, k=5)
    ann = similarity.ann_topk_bucketed(queries, emb, k=5, bits=4,
                                       multiprobe=1)
    r_ann = similarity.recall_at_k(ann, exact).agg(
        F.avg("recall")).collect()[0][0]
    assert r_ann >= 0.5, r_ann  # measured 0.55 at pinning time

    coarse = similarity.kmeans_codebook(emb, n_centroids=8, n_iters=2)
    pq = similarity.pq_train(emb, m=4, n_codes=16, n_iters=2)
    idx = similarity.ivfpq_index(emb, coarse_codebook=coarse,
                                 pq_codebooks=pq)
    exhaustive = similarity.pq_topk(
        queries, similarity.pq_encode(emb, pq), pq, k=5)
    r = {}
    for nprobe in (1, 4):
        iv = similarity.ivfpq_topk(queries, idx, coarse_codebook=coarse,
                                   pq_codebooks=pq, k=5, nprobe=nprobe)
        r[nprobe] = similarity.recall_at_k(iv, exhaustive).agg(
            F.avg("recall")).collect()[0][0]
    assert r[1] >= 0.6, r      # measured 0.725
    assert r[4] >= 0.8, r      # measured 0.875
    assert r[4] >= r[1], r     # more probes never lose recall here


def test_codebook_training_fails_fast_on_undersized_corpus(spark):
    # round-4 ADVICE: asking for more codes/centroids than the corpus
    # has rows must raise (matching the dim-divisibility check), not
    # silently train a smaller codebook whose shapes ripple downstream
    df = _pq_fixture(spark, n=8)
    with pytest.raises(ValueError, match="cannot seed"):
        similarity.pq_train(df, m=4, n_codes=16, n_iters=1)
    with pytest.raises(ValueError, match="cannot seed"):
        similarity.kmeans_codebook(df, n_centroids=16, n_iters=1)


def test_ivfpq_residual_index_and_recall(spark):
    # residual IVFADC on clustered data: same-cluster retrieval holds,
    # and the index/codebook pair round-trips through search
    df = _pq_fixture(spark, n=64)
    coarse = similarity.kmeans_codebook(df, n_centroids=4, n_iters=3)
    index, pq = similarity.ivfpq_index_residual(
        df, coarse_codebook=coarse, m=4, n_codes=8, pq_iters=2)
    assert set(index.columns) == {"vec_id", "cell", "pq_code"}
    queries = df.where(F.col("vec_id").isin([0, 1, 2, 3]))
    got = similarity.ivfpq_topk_residual(
        queries, index, coarse_codebook=coarse, pq_codebooks=pq,
        k=8, nprobe=1).collect()
    assert got  # non-empty
    for r in got:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4, r


def test_ivfpq_residual_tightens_adist_vs_raw(spark):
    # the point of residual coding: ADC distances to a vector's own
    # code shrink when PQ quantizes residuals instead of raw vectors
    df = _pq_fixture(spark, n=64)
    coarse = similarity.kmeans_codebook(df, n_centroids=4, n_iters=3)
    queries = df.where(F.col("vec_id").isin([0, 1, 2, 3]))

    raw_pq = similarity.pq_train(df, m=4, n_codes=8, n_iters=2)
    raw_idx = similarity.ivfpq_index(df, coarse_codebook=coarse,
                                     pq_codebooks=raw_pq)
    raw = {r["query_id"]: r["adist"] for r in similarity.ivfpq_topk(
        queries, raw_idx, coarse_codebook=coarse, pq_codebooks=raw_pq,
        k=1, nprobe=1).collect()}

    res_idx, res_pq = similarity.ivfpq_index_residual(
        df, coarse_codebook=coarse, m=4, n_codes=8, pq_iters=2)
    res = {r["query_id"]: r["adist"] for r in
           similarity.ivfpq_topk_residual(
               queries, res_idx, coarse_codebook=coarse,
               pq_codebooks=res_pq, k=1, nprobe=1).collect()}
    # self-distance under residual codes must not be worse on average
    assert sum(res.values()) <= sum(raw.values()) + 1e-9, (raw, res)


# -- BPE tokenizer -------------------------------------------------------------

def test_bpe_train_classic_example(spark):
    # the canonical Sennrich example: corpus of aaab-type words; the
    # most frequent adjacent pair merges first and deterministically
    rows = [(i, "aaab aaab aaab ab") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = textops.bpe_train(df, n_merges=3, min_count=1)
    # hand-derived: (a,a)=18 merges first (left-greedy: aaab -> aa,a,b);
    # then (a,b)=12 beats (b,</w>)=12 on the lexicographic tiebreak;
    # then (ab,</w>)=12
    assert m["merges"] == [("a", "a"), ("a", "b"), ("ab", "</w>")]
    # vocab: chars first (sorted), merge products after, contiguous ids
    assert m["vocab"]["</w>"] == 0 and m["vocab"]["a"] == 1
    assert sorted(m["vocab"].values()) == list(range(len(m["vocab"])))


def test_bpe_train_deterministic_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "xy xy uv uv")], ["doc_id", "text"])
    m1 = textops.bpe_train(df, n_merges=2, min_count=1)
    m2 = textops.bpe_train(df, n_merges=2, min_count=1)
    assert m1 == m2
    # both ('u','v') and ('x','y') have count 2; lexicographic
    # tiebreak picks ('u','v') first
    assert m1["merges"][0] == ("u", "v")


def test_bpe_encode_greedy_and_oov(spark):
    train = spark.createDataFrame(
        [(i, "hello hello hello world world") for i in range(4)],
        ["doc_id", "text"])
    m = textops.bpe_train(train, n_merges=50, min_count=1)
    probe = spark.createDataFrame(
        [(1, "hello world"), (2, "zzz")], ["doc_id", "text"])
    got = {r["doc_id"]: r["bpe_ids"] for r in
           textops.bpe_encode(probe, m).collect()}
    inv = {v: k for k, v in m["vocab"].items()}
    # trained words collapse to few symbols whose concatenation
    # round-trips the word (+ the end marker)
    hello = "".join(inv[i] for i in got[1])
    assert hello == "hello</w>world</w>"
    assert len(got[1]) <= 4  # heavily merged after 50 merges
    # unseen characters -> -1, never a crash
    assert all(i == -1 or inv[i] in ("z", "</w>", "zzz</w>")
               for i in got[2])


def test_bpe_segment_matches_encode_and_handles_nulls(spark):
    """bpe_segment (symbol output) and bpe_encode (id output) share
    _greedy_segment, so per word the joined symbols must equal the
    id sequence mapped back through the vocab; null words pass
    through as null."""
    train = spark.createDataFrame(
        [(i, "hello hello hello world world") for i in range(4)],
        ["doc_id", "text"])
    m = textops.bpe_train(train, n_merges=50, min_count=1)
    inv = {v: k for k, v in m["vocab"].items()}
    words = spark.createDataFrame(
        [("hello",), ("world",), ("held",), (None,)],
        "token string")
    seg = {r["token"]: r["bpe"] for r in
           textops.bpe_segment(words, m["merges"]).collect()}
    assert seg[None] is None
    for w in ("hello", "world", "held"):
        ids = {r["doc_id"]: r["bpe_ids"] for r in textops.bpe_encode(
            spark.createDataFrame([(1, w)], ["doc_id", "text"]),
            m).collect()}[1]
        assert seg[w].split(" ") == [inv.get(i, "?") for i in ids]


def test_bpe_segment_greedy_rank_order(spark):
    """The greedy rule applies the LOWEST-RANK merge first (not
    leftmost-first): with ranks [('b','c'), ('a','b')], 'abc' must
    become [a, bc</w>-ish], never [ab, c]."""
    words = spark.createDataFrame([("abc",), ("ab",)], "token string")
    seg = {r["token"]: r["bpe"] for r in textops.bpe_segment(
        words, [("b", "c"), ("a", "b")]).collect()}
    assert seg["abc"] == "a bc </w>"
    assert seg["ab"] == "ab </w>"
