"""Corpus-level text operators: TF-IDF, repetition signals, inverted
index, and the exact quantile pass — hand-computed tiny fixtures."""
from __future__ import annotations

import math

import pytest

from sparkjesse import dataset_checks as dc
from sparkjesse import textops


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [(1, "x x y"), (2, "y z")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_hand_computed(spark, tiny_docs):
    out = {(r["doc_id"], r["term"]): r
           for r in textops.tfidf_top_terms(tiny_docs, k=2).collect()}
    ln2 = round(2 * math.log(2.0 / 1.0), 6)
    r = out[(1, "x")]
    assert (r["tf"], r["df"], r["tfidf"], r["rank"]) == (2, 1, ln2, 1)
    r = out[(1, "y")]
    assert (r["tf"], r["df"], r["tfidf"], r["rank"]) == (1, 2, 0.0, 2)
    r = out[(2, "z")]
    assert (r["tf"], r["rank"]) == (1, 1)
    assert out[(2, "y")]["rank"] == 2


def test_tfidf_k_truncates_and_tie_breaks_by_term(spark):
    # all terms unique -> equal tfidf; rank must follow term asc
    df = spark.createDataFrame([(1, "c a b d")], ["doc_id", "text"])
    rows = textops.tfidf_top_terms(df, k=3).orderBy("rank").collect()
    assert [r["term"] for r in rows] == ["a", "b", "c"]
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_repetition_signals_hand_computed(spark):
    # 2-grams of "a b a b a": {a b: 2, b a: 2} -> tie, lexicographically
    # smallest wins; 3-grams: {a b a: 2, b a b: 1} -> dup 10/15 chars
    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    r = textops.repetition_signals(df, top_n=2, dup_n=3).collect()[0]
    assert r["top_gram"] == "a b"
    assert r["top_gram_count"] == 2
    assert r["top_ngram_char_frac"] == pytest.approx(6 / 12)
    assert r["dup_ngram_char_frac"] == pytest.approx(10 / 15)


def test_repetition_no_repeats_is_zero_dup(spark):
    df = spark.createDataFrame([(1, "q w e r t y")], ["doc_id", "text"])
    r = textops.repetition_signals(df).collect()[0]
    assert r["top_gram_count"] == 1
    assert r["dup_ngram_char_frac"] == 0.0


def test_repetition_empty_doc_null_fractions(spark):
    # empty text has zero gram chars: fractions are NULL, never an
    # ANSI DIVIDE_BY_ZERO job abort (Spark 4 default mode)
    df = spark.createDataFrame([(1, ""), (2, "x y x y")],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r
            for r in textops.repetition_signals(df).collect()}
    assert rows[1]["top_ngram_char_frac"] is None
    assert rows[1]["dup_ngram_char_frac"] is None
    assert rows[2]["top_ngram_char_frac"] is not None


def test_repetition_short_doc_single_shingle(spark):
    # doc shorter than n -> one whole-doc shingle, fraction 1.0
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    r = textops.repetition_signals(df, top_n=3, dup_n=3).collect()[0]
    assert r["top_gram"] == "a b"
    assert r["top_ngram_char_frac"] == 1.0


def test_inverted_index_max_df_drops_stopwords(spark):
    rows = [(1, "a b"), (2, "a c"), (3, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in
           textops.inverted_index(df, max_df=2).collect()}
    assert set(out) == {"b", "c"}  # 'a' (df=3) dropped pre-materialize
    assert out["b"]["df"] == 2 and out["b"]["postings"] == [1, 3]
    assert out["c"]["postings"] == [2]


def test_inverted_index_cap_truncates_to_first_ids(spark):
    rows = [(i, "tok") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textops.inverted_index(df, cap=3).collect()
    assert len(out) == 1
    assert out[0]["df"] == 10  # df counts ALL docs, cap only postings
    assert out[0]["postings"] == [0, 1, 2]


def test_column_quantiles_interpolates(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]],
                               ["v"])
    got = {r["prob"]: r["value"] for r in
           dc.column_quantiles(df, ["v"], probs=(0.25, 0.5, 0.75))
           .collect()}
    assert got == {0.25: 1.75, 0.5: 2.5, 0.75: 3.25}


def test_column_quantiles_multi_column_single_pass(spark):
    df = spark.createDataFrame([(1.0, 10.0), (3.0, 30.0)], ["a", "b"])
    rows = dc.column_quantiles(df, ["a", "b"], probs=(0.5,)).collect()
    got = {(r["column"], r["prob"]): r["value"] for r in rows}
    assert got == {("a", 0.5): 2.0, ("b", 0.5): 20.0}


def test_build_vocab_rank_and_pruning(spark):
    rows = [(1, "b b b a a c"), (2, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in
           textops.build_vocab(df, min_count=2).collect()}
    # counts: b=4, a=3, c=1 (pruned by min_count)
    assert set(out) == {"a", "b"}
    assert out["b"]["token_id"] == 0 and out["b"]["count"] == 4
    assert out["a"]["token_id"] == 1 and out["a"]["count"] == 3


def test_build_vocab_tie_breaks_by_token(spark):
    df = spark.createDataFrame([(1, "z y z y")], ["doc_id", "text"])
    out = {r["token"]: r["token_id"] for r in
           textops.build_vocab(df).collect()}
    assert out == {"y": 0, "z": 1}  # equal counts -> token asc


def test_encode_documents_preserves_order_and_oov(spark):
    df = spark.createDataFrame(
        [(1, "b a b unknown a")], ["doc_id", "text"])
    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1)], ["token", "token_id"])
    r = textops.encode_documents(df, vocab).collect()[0]
    assert r["ids"] == [1, 0, 1, -1, 0]  # order kept, OOV = -1
    assert r["n_oov"] == 1


def test_encode_with_capped_vocab_marks_tail_oov(spark):
    df = spark.createDataFrame([(1, "a a a b b c")], ["doc_id", "text"])
    vocab = textops.build_vocab(df, max_size=2)  # keeps a(0), b(1)
    r = textops.encode_documents(df, vocab).collect()[0]
    assert r["ids"] == [0, 0, 0, 1, 1, -1]
    assert r["n_oov"] == 1


def test_quality_filter_reasons_and_keep(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "a b"),                       # too few + short tokens
        (3, "the the the the the the the the the the"),  # stop + dup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in textops.quality_filter(
        df, min_tokens=5, max_tokens=100, min_avg_token_len=2.0,
        max_avg_token_len=12.0, max_stopword_ratio=0.5,
        min_distinct_ratio=0.2).collect()}
    assert out[1]["keep"] is True and out[1]["reasons"] == []
    assert out[2]["keep"] is False
    assert set(out[2]["reasons"]) == {"too_few_tokens",
                                      "avg_token_too_short"}
    assert out[3]["keep"] is False
    assert set(out[3]["reasons"]) == {"stopword_heavy",
                                      "low_lexical_diversity"}


def test_column_quantiles_approx_matches_exact_on_small_data(spark):
    # at default accuracy the sketch is exact for tiny inputs (error
    # <= 1/accuracy in rank), up to interpolation: approx returns an
    # observed value, exact interpolates -- use a prob hitting an
    # exact order statistic so both agree
    df = spark.createDataFrame([(float(v),) for v in range(1, 102)],
                               ["v"])
    ex = {r["prob"]: r["value"] for r in dc.column_quantiles(
        df, ["v"], probs=(0.5,)).collect()}
    ap = {r["prob"]: r["value"] for r in dc.column_quantiles(
        df, ["v"], probs=(0.5,), exact=False).collect()}
    assert ex == ap == {0.5: 51.0}


def test_encode_documents_null_text_yields_null_ids(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id long, text string")
    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1)], ["token", "token_id"])
    out = {r["doc_id"]: r for r in
           textops.encode_documents(df, vocab).collect()}
    assert out[1]["ids"] == [0, 1]
    assert out[2]["ids"] is None and out[2]["n_oov"] is None
