"""Deduplication operators for web-scale corpora.

Four families, each chosen for a different scale/recall trade-off:

* **Exact** — group on a content hash; shuffle volume is #distinct keys
  (map-side partial counts), the canonical first pass at 100 TB.
* **MinHash + LSH** — per-doc signatures are computed *row-local* (array
  expressions over shingles — no explode, no shuffle), then banded; the
  only shuffle is the band-bucket self-join, which touches just
  ``bands × rows`` small keys per doc. This is the standard
  shingle→minhash→band→bucket-join pipeline (Broder '97 / MMDS ch.3).
* **SimHash** — 16-bit Charikar fingerprints via md5-nibble bit votes;
  one explode + one groupBy, fingerprint join for near-dup buckets.
* **Embedding cosine** — near-dup pairs above a cosine threshold with a
  deterministic left-fold dot product (see ``similarity.py``).

Determinism contract: every hash is md5 over explicit strings, min-hash
signatures are *lexicographic minima of md5 hex digests* (total order is
identical in any engine), so the DuckDB oracle reproduces results
bit-for-bit — no engine-private hash (xxhash64/murmur) anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import shingles_col, tokens_col
from .similarity import cosine_col, sign_bucket

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _min_pos_enc(id_col: str, pos: Column | str) -> Column:
    """Lexicographic-min (doc, position) as ONE associative ``min``
    over an encoded long (``doc_id * 2^20 + pos``) — map-side
    combinable, identical semantics in any ANSI engine (vs min_by /
    struct ordering, which is engine-defined). Exact while
    ``pos < 2^20`` (≈1.05M — a ~1M-token document) and
    ``doc_id < 2^43`` (8.8e12, above the 10^12 north-star doc count).
    A position beyond the bound RAISES at execution time instead of
    silently corrupting keeper coordinates (and, downstream,
    ``remove_duplicate_spans`` deleting the wrong tokens): split or
    truncate megadocs upstream."""
    p = F.col(pos) if isinstance(pos, str) else pos
    guarded = F.when(p < (1 << 20), p).otherwise(F.raise_error(F.lit(
        "position >= 2^20 overflows the (doc,pos) min-encoding — "
        "split or truncate docs beyond ~1M tokens upstream")))
    return F.min(F.col(id_col) * F.lit(1 << 20) + guarded)


def exact_duplicate_groups(df: DataFrame, key: Column | str,
                           id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by an exact content key: one row per key with
    >1 occurrence, carrying the group size and the min/max member id
    (min id = canonical keeper). Aggregation-only — no row explosion."""
    k = F.col(key) if isinstance(key, str) else key
    return (df.select(k.alias("dup_key"), F.col(id_col))
              .groupBy("dup_key")
              .agg(F.count(F.lit(1)).alias("group_size"),
                   F.min(id_col).alias("keep_id"),
                   F.max(id_col).alias("max_id"))
              .where(F.col("group_size") > 1))


def paragraphs(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *,
               para_tokens: int = 8) -> DataFrame:
    """Split documents into paragraphs — fixed, non-overlapping
    ``para_tokens``-token windows — as (id, para_idx, para_text) rows.

    Expression-only (sequence → transform → explode): row count grows
    linearly (#docs × ~tokens/para_tokens), every row stays map-side,
    and the (doc_id, para_idx) composite key keeps provenance so any
    whole-doc dedup operator can run at paragraph granularity
    downstream (the standard training-data need beyond whole-doc
    dedup: boilerplate paragraphs repeat across otherwise-unique
    pages). Token windows rather than delimiter splits because the
    window is deterministic on any corpus — a real pipeline would
    first normalize real paragraph breaks to a delimiter and split on
    it with the same plan shape."""
    toks = tokens_col(text_col)
    n_paras = F.ceil(F.size(toks) / F.lit(para_tokens)).cast("int")
    para = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda i: F.struct(
            i.cast("int").alias("para_idx"),
            F.array_join(
                F.slice(toks, i * para_tokens + 1, para_tokens),
                " ").alias("para_text")))
    return (df.select(F.col(id_col), F.explode(para).alias("p"))
              .select(F.col(id_col), F.col("p.para_idx").alias("para_idx"),
                      F.col("p.para_text").alias("para_text")))


def paragraph_duplicate_groups(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", *,
                               para_tokens: int = 8) -> DataFrame:
    """Exact paragraph-level dedup: md5 each paragraph window and
    group — one row per paragraph repeated >1 time, with group size,
    how many distinct docs it spans, and the canonical keeper
    (lexicographically-min (doc_id, para_idx)). Same scale shape as
    ``exact_duplicate_groups``: the only shuffle is the hash groupBy
    (map-side partials; shuffle volume = #distinct paragraphs)."""
    p = paragraphs(df, text_col, id_col, para_tokens=para_tokens)
    # guarded (doc_id, para_idx) min-encoding — see _min_pos_enc for
    # the bound contract (para_idx < 2^20 ≈ 1M, doc_id < 2^43)
    enc = _min_pos_enc(id_col, "para_idx")
    return (p.groupBy(F.md5("para_text").alias("para_key"))
             .agg(F.count(F.lit(1)).alias("group_size"),
                  F.count_distinct(F.col(id_col)).alias("n_docs"),
                  enc.alias("__enc__"))
             .where(F.col("group_size") > 1)
             .select("para_key", "group_size", "n_docs",
                     F.floor(F.col("__enc__") / F.lit(1 << 20))
                     .alias("keep_doc"),
                     (F.col("__enc__") % F.lit(1 << 20)).cast("int")
                     .alias("keep_para_idx")))


def token_windows(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  span_tokens: int = 8, stride: int = 1) -> DataFrame:
    """Sliding token windows — ``span_tokens``-token spans anchored at
    every ``stride``-th token position — as (id, pos, window_text)
    rows. Expression-only (sequence → transform → explode), zero
    shuffle; row count is ~tokens/stride per doc.

    ``stride > 1`` is POSITION-anchored sampling: two copies of the
    same substring only share a strided window when their offsets
    agree mod ``stride``, so it is NOT a safe knob for cross-doc
    duplicate detection — use :func:`winnowed_windows`
    (content-defined selection, hard guarantee) for that. Strided
    windows are still the right tool for position-aligned uses
    (per-doc coverage estimates, fixture sampling). Documents shorter
    than ``span_tokens`` yield no windows (a whole-doc duplicate of a
    short doc is :func:`exact_duplicate_groups`'s job, not this
    one's). ``pos`` is the 0-based token offset of the window start."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = tokens_col(text_col)
    # drop sub-window docs BEFORE building the index sequence:
    # sequence(0, n-1) at n=0 would infer a descending step and yield
    # [0,-1], so the filter is load-bearing, not just tidy
    base = (df.select(F.col(id_col), toks.alias("__toks__"))
              .where(F.size("__toks__") >= span_tokens))
    t = F.col("__toks__")
    # number of full windows: floor((len - span) / stride) + 1 (>= 1
    # after the filter) — all per-row arithmetic
    n_wins = (F.floor((F.size(t) - span_tokens) / stride)
               .cast("int") + 1)
    wins = F.transform(
        F.sequence(F.lit(0), n_wins - 1),
        lambda i: F.struct(
            (i * stride).cast("int").alias("pos"),
            F.array_join(
                F.slice(t, i * stride + 1, span_tokens),
                " ").alias("window_text")))
    return (base.select(F.col(id_col), F.explode(wins).alias("w"))
                .select(F.col(id_col), F.col("w.pos").alias("pos"),
                        F.col("w.window_text").alias("window_text")))


def winnowed_windows(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", *,
                     span_tokens: int = 8,
                     winnow: int = 4) -> DataFrame:
    """Content-defined window selection — winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003; the MOSS fingerprinting
    algorithm): over the stride-1 window hashes, slide a ``winnow``-
    wide selection window and keep the RIGHTMOST MINIMAL hash in each.
    Because the selection depends only on window *content* (hash
    values and relative order), two copies of the same substring
    select the same windows no matter how each copy is offset — the
    property position-strided sampling lacks.

    Hard guarantee (winnowing theorem): every duplicated substring of
    at least ``span_tokens + winnow - 1`` tokens shares at least one
    selected window between its copies. Expected density of kept
    windows is 2/(winnow+1), so ``winnow`` is the safe cost knob for
    :func:`duplicate_spans` — ~2/(w+1) of the stride-1 row count with
    a provable detection floor instead of a silent mod-offset miss.

    Entirely per-row array expressions (transform / slice / reverse /
    array_position over the hash array) — zero shuffle, no UDF."""
    if winnow < 1:
        raise ValueError("winnow must be >= 1")
    if winnow == 1:
        return token_windows(df, text_col, id_col,
                             span_tokens=span_tokens, stride=1)
    toks = tokens_col(text_col)
    base = (df.select(F.col(id_col), toks.alias("__toks__"))
              .where(F.size("__toks__") >= span_tokens))
    t = F.col("__toks__")
    n_wins = F.size(t) - span_tokens + 1  # >= 1 after the filter
    texts = F.transform(
        F.sequence(F.lit(0), n_wins - 1),
        lambda i: F.array_join(F.slice(t, i + 1, span_tokens), " "))
    hs = F.transform(texts, F.md5)
    # selection-window starts: 0 .. max(n_wins - winnow, 0); each
    # keeps the rightmost minimal hash of slice(hs, s+1, winnow)
    # (slice truncates at the array end, so a short tail still
    # selects). rightmost-min = len(slice) - first-pos-in-reversed.
    def _sel(s: Column) -> Column:
        sl = F.slice(hs, s + 1, winnow)
        return (s + F.size(sl)
                - F.array_position(F.reverse(sl), F.array_min(sl))
                ).cast("int")
    sel = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(n_wins - winnow, F.lit(0))),
        _sel))
    return (base.select(F.col(id_col), texts.alias("__texts__"),
                        F.explode(sel).alias("pos"))
                .select(F.col(id_col), F.col("pos"),
                        F.element_at("__texts__", F.col("pos") + 1)
                         .alias("window_text")))


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", *,
                    span_tokens: int = 8, winnow: int = 1,
                    min_occurrences: int = 2) -> DataFrame:
    """Exact duplicated token *spans* across the corpus — the
    substring-level granularity below :func:`paragraph_duplicate_groups`
    (fixed windows) and :func:`exact_duplicate_groups` (whole docs).
    This is the scalable sliding-window-hash form of suffix-array
    training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better": repeated >=50-token spans): hash
    every window, group on the hash, keep hashes occurring
    ``min_occurrences``+ times. One row per duplicated span with its
    occurrence count, distinct-doc spread, and canonical keeper (the
    lexicographically-min (doc, pos), min-encoded exactly like
    :func:`paragraph_duplicate_groups` so any ANSI engine reproduces
    it bit-for-bit).

    ``winnow=1`` hashes every window (complete at span granularity);
    ``winnow=w>1`` selects ~2/(w+1) of the windows via
    :func:`winnowed_windows`, keeping the provable floor — every
    duplicated substring of ``span_tokens + winnow - 1``+ tokens is
    still caught. (A position-stride knob was rejected: both copies
    must agree on offset mod stride, which silently misses cross-doc
    duplicates — see :func:`token_windows`.)

    100 TB shape: the explode multiplies rows by ~tokens (× 2/(w+1)
    under winnowing — that is the cost knob); the only shuffle is the
    md5 groupBy with map-side partial aggregation, so exchange volume
    is #distinct windows, not #window occurrences. No window function,
    no join, no driver materialization."""
    w = winnowed_windows(df, text_col, id_col,
                         span_tokens=span_tokens, winnow=winnow)
    # guarded (doc_id, pos) min-encoding — _min_pos_enc documents the
    # exactness bound (pos < 2^20 ≈ 1M tokens, doc_id < 2^43)
    enc = _min_pos_enc(id_col, "pos")
    return (w.groupBy(F.md5("window_text").alias("span_key"))
             .agg(F.count(F.lit(1)).alias("n_occurrences"),
                  F.count_distinct(F.col(id_col)).alias("n_docs"),
                  enc.alias("__enc__"))
             .where(F.col("n_occurrences") >= min_occurrences)
             .select("span_key", "n_occurrences", "n_docs",
                     F.floor(F.col("__enc__") / F.lit(1 << 20))
                     .alias("keep_doc"),
                     (F.col("__enc__") % F.lit(1 << 20)).cast("int")
                     .alias("keep_pos")))


def span_dup_rate(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", *,
                  span_tokens: int = 8) -> DataFrame:
    """Per-document duplicated-span rate: the fraction of a doc's
    anchored windows whose exact text occurs anywhere else in the
    corpus (including other positions of the same doc). The standard
    per-doc quality signal built on :func:`duplicate_spans` — docs that
    are mostly boilerplate score near 1.0 and get filtered or
    downweighted before training.

    Plan: one md5 groupBy for global window counts, an equijoin of
    windows back onto those counts on the same key (AQE reuses the
    hash partitioning — no broadcast of the unbounded span table), and
    one groupBy(doc). Docs with no full window surface n_windows=0,
    dup_rate=0.0 via a count-preserving aggregation over the original
    frame, so the output has exactly one row per input doc."""
    w = token_windows(df, text_col, id_col,
                      span_tokens=span_tokens, stride=1)
    counts = (w.groupBy(F.md5("window_text").alias("span_key"))
               .agg(F.count(F.lit(1)).alias("n_occ")))
    per_doc = (w.select(F.col(id_col),
                        F.md5("window_text").alias("span_key"))
                .join(counts, "span_key")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_windows"),
                     F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
                      .alias("n_dup_windows")))
    return (df.select(id_col).join(per_doc, id_col, "left")
              .select(F.col(id_col),
                      F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                      F.coalesce("n_dup_windows", F.lit(0))
                       .alias("n_dup_windows"),
                      F.round(F.coalesce(F.col("n_dup_windows")
                                         / F.col("n_windows"), F.lit(0.0)),
                              6).alias("dup_rate")))


def remove_duplicate_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", *,
                           span_tokens: int = 8,
                           min_occurrences: int = 2) -> DataFrame:
    """The removal step of substring-level dedup (Lee et al. 2022
    §3.1, their ExactSubstr dedup): delete every occurrence of a
    duplicated ``span_tokens``-token span EXCEPT the canonical keeper
    (:func:`duplicate_spans`'s min-(doc,pos) occurrence), then rebuild
    each document from its surviving tokens. Overlapping duplicated
    windows merge naturally — a token is dropped if a non-keeper
    duplicated window covers it AND no keeper window covers it. The
    keeper exemption is load-bearing (round-4 ADVICE): without it, a
    DIFFERENT span's non-keeper occurrence overlapping span A's
    canonical copy would destroy A's keeper too, so a span could
    vanish from the corpus entirely. With it, every duplicated span's
    canonical occurrence survives intact (tokens shared between a
    keeper window and an overlapping non-keeper window are retained —
    deliberate under-removal in favor of the keep-one guarantee).
    Returns the full input frame with ``text`` rewritten plus
    ``n_tokens_removed`` for auditability; docs without duplicated
    spans pass through byte-identical.

    Plan: windows → one md5 groupBy (the :func:`duplicate_spans`
    exchange) → equijoin of window occurrences onto duplicated keys
    (same key, exchange reused under AQE) → per-doc collect of the
    (bounded-by-token-count) drop and keeper positions → one join back
    onto the corpus → expression-only token rebuild. No window
    function; the per-doc position arrays are the only collected
    structures and are capped by doc length, never by corpus size."""
    w = (token_windows(df, text_col, id_col,
                       span_tokens=span_tokens, stride=1)
         .select(F.col(id_col), "pos",
                 F.md5("window_text").alias("span_key")))
    dups = (w.groupBy("span_key")
             .agg(F.count(F.lit(1)).alias("n_occ"),
                  _min_pos_enc(id_col, "pos").alias("__enc__"))
             .where(F.col("n_occ") >= min_occurrences)
             .select("span_key",
                     F.floor(F.col("__enc__") / F.lit(1 << 20))
                      .alias("keep_doc"),
                     (F.col("__enc__") % F.lit(1 << 20)).cast("int")
                      .alias("keep_pos")))
    is_keeper = ((F.col(id_col) == F.col("keep_doc"))
                 & (F.col("pos") == F.col("keep_pos")))
    drops = (w.join(dups, "span_key")
              .groupBy(id_col)
              .agg(F.array_sort(F.array_compact(F.collect_set(
                       F.when(~is_keeper, F.col("pos")))))
                   .alias("__drops__"),
                   F.array_sort(F.array_compact(F.collect_set(
                       F.when(is_keeper, F.col("pos")))))
                   .alias("__keeps__")))
    toks = tokens_col(text_col)
    rebuilt = (df.join(drops, id_col, "left")
                 .withColumn("__toks__", toks))
    # token j survives unless some drop-start p covers it
    # (p <= j < p + span) and NO keeper-start covers it — per-row
    # array expressions only
    def covers(j):
        return lambda p: (p <= j) & (j < p + span_tokens)

    keep = F.filter(
        F.sequence(F.lit(0), F.size("__toks__") - 1),
        lambda j: ~F.coalesce(
            F.exists("__drops__", covers(j)), F.lit(False))
        | F.coalesce(F.exists("__keeps__", covers(j)), F.lit(False)))
    return (rebuilt
            .withColumn("__keep__", keep)
            .withColumn("n_tokens_removed",
                        (F.size("__toks__") - F.size("__keep__"))
                        .cast("int"))
            .withColumn(text_col,
                        F.array_join(F.transform(
                            "__keep__",
                            lambda j: F.element_at(
                                "__toks__", (j + 1).cast("int"))), " "))
            .drop("__drops__", "__keeps__", "__toks__", "__keep__"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature_cols(tokens: Column, *, num_hashes: int = 8,
                           shingle_n: int = 3) -> list[Column]:
    """``num_hashes`` min-hash signatures for one doc's token array.
    Hash ``i`` of a shingle is ``md5('{i}:' + shingle)``; the signature
    is the lexicographic minimum digest.

    Single-pass: ONE fold over the shingle array updates all
    ``num_hashes`` running minima at once (``aggregate`` over a
    ``zip_with``/``least`` accumulator), so shingles are materialized
    once and each shingle is hashed exactly ``num_hashes`` times —
    versus ``num_hashes`` independent ``array_min(transform(...))``
    trees, which re-derive the shingle array per hash (Catalyst CSE
    does not reliably merge them). Pure per-row expressions."""
    sh = F.array_distinct(shingles_col(tokens, shingle_n))
    # "~" (0x7E) sorts after every hex digit — the fold's +infinity
    init = F.array_repeat(F.lit("~"), num_hashes)

    def step(acc: Column, s: Column) -> Column:
        hashes = F.array(*[F.md5(F.concat(F.lit(f"{i}:"), s))
                           for i in range(num_hashes)])
        return F.zip_with(acc, hashes, lambda a, h: F.least(a, h))

    sigs = F.aggregate(sh, init, step)
    return [F.element_at(sigs, i + 1).alias(f"mh{i}")
            for i in range(num_hashes)]


def _minhash_signatures_arrow(df: DataFrame, text_col: str,
                              id_col: str, *, num_hashes: int,
                              shingle_n: int) -> DataFrame:
    """Arrow-batched minhash: BIT-IDENTICAL to the expression fold
    (same ``split(' ')`` empty-token behavior, same short-doc
    whole-text shingle, same ``md5('{i}:' + shingle)`` streams, same
    lexicographic-min rule, null text folds to the ``"~"`` init
    sentinel exactly like the expression) computed with hashlib inside
    ``mapInPandas``. MEASURED SLOWER than the expression fold (warmed
    sf0.1 A/B: expr ~0.5 s, arrow ~2.0 s): at 8 hashes the fold is
    JVM-native-md5-bound, not interpreter-bound, so per-call Python
    md5 overhead loses — the opposite of the 256-vote wide-SimHash
    case, where the interpreted vote fold dominates. Kept as a
    DIFFERENTIAL-TESTING twin (an independent reimplementation the
    parity test checks the expression against), not a fast path.
    Parity pinned by ``test_minhash_arrow_matches_expression``."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + [StructField(f"mh{i}", StringType()) for i in range(num_hashes)])
    prefixes = [f"{i}:".encode() for i in range(num_hashes)]

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: list[list] = [[] for _ in range(num_hashes)]
            for text in pdf[text_col]:
                if text is None:
                    # expression parity: null text folds to the "~"
                    # sentinel (md5(concat('{i}:', null)) is null and
                    # least() IGNORES nulls, so the init survives)
                    for c in cols:
                        c.append("~")
                    continue
                toks = text.split(" ")
                if len(toks) >= shingle_n:
                    sh = dict.fromkeys(
                        " ".join(toks[j:j + shingle_n])
                        for j in range(len(toks) - shingle_n + 1))
                else:
                    sh = {" ".join(toks): None}
                minima = [b"~"] * num_hashes
                for s in sh:
                    sb = s.encode()
                    for i in range(num_hashes):
                        h = hashlib.md5(prefixes[i] + sb).hexdigest() \
                            .encode()
                        if h < minima[i]:
                            minima[i] = h
                for i in range(num_hashes):
                    cols[i].append(minima[i].decode())
            out = {id_col: pdf[id_col]}
            for i in range(num_hashes):
                out[f"mh{i}"] = cols[i]
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(sign, schema)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, num_hashes: int = 8,
                       shingle_n: int = 3,
                       impl: str = "auto") -> DataFrame:
    """``impl``: "auto"/"expr" = the pure-Catalyst fold — measured
    ~4× FASTER than the Arrow walk at the default 8 hashes (JVM-native
    md5 dominates; see ``_minhash_signatures_arrow`` for the numbers
    and why wide SimHash goes the other way); "arrow" = the
    bit-identical hashlib walk, kept as a differential-testing twin."""
    if impl == "arrow":
        return _minhash_signatures_arrow(df, text_col, id_col,
                                         num_hashes=num_hashes,
                                         shingle_n=shingle_n)
    toks = tokens_col(text_col)
    return df.select(F.col(id_col),
                     *minhash_signature_cols(toks, num_hashes=num_hashes,
                                             shingle_n=shingle_n))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", *, bands: int = 4,
                        rows_per_band: int = 2,
                        shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of their min-hash
    signature, as (id_a < id_b) rows.

    Pair stage is a STREAMING equijoin on (band, band_key) — the same
    shape as ``simhash_near_pairs``. Identical documents share identical
    signatures in EVERY band, so real corpora have mega-buckets (one
    boilerplate page crawled 10^6 times); a ``collect_list`` + in-row
    expansion would build that bucket's entire quadratic pair set inside
    ONE row (~5×10^11 structs — a single-task OOM), while the join
    streams pairs through the operator pipeline and AQE can skew-split a
    hot bucket across tasks. One explicit bucket-keyed exchange is
    shared by both self-join sides (ReuseExchange — signatures folded
    once), and FIRST-MATCH-BAND dedup (each pair emitted only from its
    lowest agreeing band, checked against the carried band-key array)
    makes every pair unique by construction — the quadratic pair stream
    never crosses another shuffle and there is no global ``distinct``."""
    sigs = minhash_signatures(df, text_col, id_col,
                              num_hashes=bands * rows_per_band,
                              shingle_n=shingle_n)
    bkeys = F.array(*[
        F.md5(F.concat_ws(
            "|", *[F.col(f"mh{b * rows_per_band + r}")
                   for r in range(rows_per_band)]))
        for b in range(bands)
    ])
    banded = (sigs.select(F.col(id_col), bkeys.alias("bkeys"),
                          F.explode(F.sequence(
                              F.lit(0), F.lit(bands - 1))).alias("band"))
                  .withColumn("band_key",
                              F.element_at("bkeys", F.col("band") + 1)))
    banded = banded.repartition(F.col("band"), F.col("band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    cond = (F.col("a.band") == F.col("b.band")) \
        & (F.col("a.band_key") == F.col("b.band_key")) \
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # first-match-band dedup: suppress the emit when any EARLIER band
    # also agrees — each unordered pair surfaces exactly once
    for b2 in range(bands - 1):
        cond = cond & ~((F.lit(b2) < F.col("a.band"))
                        & (F.element_at(F.col("a.bkeys"), b2 + 1)
                           == F.element_at(F.col("b.bkeys"), b2 + 1)))
    return (a.join(b, cond)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            *, bits: int = 16) -> DataFrame:
    """Charikar SimHash over distinct tokens: token bit ``j`` comes from
    md5-hex nibble ``j//4`` of the token digest; each token votes ±1 per
    bit; fingerprint bit = (vote sum > 0). Returns (id, simhash) with a
    ``bits``-bit integer.

    Computed as a ZERO-SHUFFLE per-row fold — this is
    ``simhash_banded`` with a single band (identical vote math, proven
    by the shared implementation), so the operator stays map-side
    however big the table. The earlier explode + ``bits``-column groupBy
    shuffled #docs × #distinct-tokens rows for the same output."""
    assert bits % 4 == 0 and bits <= 60  # fits a non-negative signed long
    out = simhash_banded(df, text_col, id_col, bits=bits, bands=1)
    return out.select(F.col(id_col), F.col("band0").alias("simhash"))


def _simhash_banded_arrow(df: DataFrame, text_col: str,
                          id_col: str, *, bits: int,
                          bands: int) -> DataFrame:
    """Arrow-batched fingerprint fold: BIT-IDENTICAL to the expression
    path (same md5 hex nibbles, same ±1 vote LUT, same vote>0 bit
    rule, same multi-digest streams) but computed with hashlib + a
    numpy LUT inside ``mapInPandas``. Catalyst higher-order-function
    lambdas are interpreted per element, and a 256-bit fingerprint
    folds bits × distinct-tokens adds per doc — measured ~10× slower
    than this vectorized walk at 256 bits (BASELINE.md round-4 bench
    notes). Still ZERO shuffle, still scan-parallel; parity with the
    expression path is pinned by
    ``test_simhash_banded_arrow_matches_expression`` and the
    ``dd_simhash_wide`` DuckDB oracle recomputes it independently."""
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    positions = bits // 4
    n_digests = (positions + 31) // 32
    band_bits = bits // bands
    # ASCII hex char -> nibble value; LUT[n] = 4 ±1 votes (bit k of n)
    char_val = np.full(256, -1, dtype=np.int64)
    for i, c in enumerate("0123456789abcdef"):
        char_val[ord(c)] = i
    vote_lut = np.array([[1 if (n >> k) & 1 else -1 for k in range(4)]
                         for n in range(16)], dtype=np.int64)
    weights = (2 ** np.arange(band_bits, dtype=np.int64))
    schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + [StructField(f"band{b}", LongType()) for b in range(bands)])

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            rows = np.zeros((len(pdf), bands), dtype=np.int64)
            for r, text in enumerate(pdf[text_col]):
                if text is None:
                    continue  # null text -> all-zero bands (expr parity)
                votes = np.zeros(bits, dtype=np.int64)
                for t in dict.fromkeys(text.split(" ")):  # order-stable
                    hx = hashlib.md5(t.encode()).hexdigest()
                    for d in range(1, n_digests):
                        hx += hashlib.md5(
                            f"{d}:{t}".encode()).hexdigest()
                    nib = char_val[np.frombuffer(
                        hx[:positions].encode(), dtype=np.uint8)]
                    votes += vote_lut[nib].reshape(-1)
                bitset = (votes > 0).reshape(bands, band_bits)
                rows[r] = (bitset * weights).sum(axis=1)
            for b in range(bands):
                out[f"band{b}"] = rows[:, b]
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(fold, schema)


def simhash_banded(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *, bits: int = 64,
                   bands: int = 4, impl: str = "auto") -> DataFrame:
    """Banded SimHash fingerprints: ``(id, band0..band{bands-1})`` where
    band ``b`` holds bits ``[b·w, (b+1)·w)`` of a ``bits``-bit Charikar
    fingerprint (``w = bits/bands``). Same md5-nibble vote math as
    ``simhash``, but computed as a ZERO-SHUFFLE per-row fold (like the
    minhash signatures): one ``aggregate`` over the distinct-token
    array updates all ``bits`` vote counters at once, and a 16-entry
    literal lookup table turns each hex nibble into its 4 ±1 votes —
    one nibble extraction per 4 bits instead of four. No explode, no
    groupBy: the operator stays map-side however big the table, and
    per-band integers never overflow a signed long.

    ``bits > 128`` (one md5 is 32 nibbles) draws extra bits from
    INDEPENDENT md5 streams — stream ``d`` hashes ``'{d}:' + token``
    (stream 0 stays the bare ``md5(token)`` so every ≤128-bit
    fingerprint, and its oracle, is unchanged) — concatenated into one
    hex string the nibble walk reads straight through. At 10^12 docs
    this is how banding keys stay selective: 256-bit fingerprints in 8
    bands give 2^32 bucket keys per band instead of 2^16."""
    assert bits % bands == 0 and bits % 4 == 0
    band_bits = bits // bands
    assert band_bits <= 62
    # implementation dispatch: the expression fold wins below ~128
    # bits (no Python round-trip at all); past it the interpreted HOF
    # cost dominates and the Arrow walk is ~10× faster with identical
    # output ("auto" keeps every ≤128-bit caller, and its oracle,
    # byte-for-byte on the original path)
    if impl == "auto":
        impl = "arrow" if bits > 128 else "expr"
    if impl == "arrow":
        return _simhash_banded_arrow(df, text_col, id_col, bits=bits,
                                     bands=bands)
    positions = bits // 4
    n_digests = (positions + 31) // 32
    # vote_lut[n] = the 4 ±1 votes encoded by nibble value n (bit k of
    # n votes +1); indexed 1-based by instr's return (instr(HEX, c) =
    # nibble value + 1, so no off-by-one arithmetic in the hot path)
    vote_lut = F.array(*[
        F.array(*[F.lit(1 if (n >> k) & 1 else -1) for k in range(4)])
        for n in range(16)])

    def token_votes(tok: Column) -> Column:
        digest = F.concat(
            F.md5(tok),
            *[F.md5(F.concat(F.lit(f"{d}:"), tok))
              for d in range(1, n_digests)])
        # split to a char array ONCE instead of `positions` substring
        # calls — substring(digest, p, 1) rescans the string to char p,
        # O(positions^2) per token; the split walk is linear and
        # measured 3.3x faster end-to-end at 256 bits
        chars = F.slice(F.split(digest, ""), 1, positions)
        return F.flatten(F.transform(
            chars,
            lambda c: F.element_at(
                vote_lut, F.instr(F.lit(HEX), c).cast("int"))))

    toks = F.array_distinct(tokens_col(text_col))
    sums = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, token_votes(t),
                                  lambda a, v: a + v))
    band_cols = []
    for b in range(bands):
        val = F.lit(0).cast("long")
        for k in range(band_bits):
            j = b * band_bits + k
            val = val + F.when(F.element_at(sums, j + 1) > 0,
                               F.lit(2 ** k)).otherwise(0)
        band_cols.append(val.alias(f"band{b}"))
    return df.select(F.col(id_col), *band_cols)


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, bits: int = 64,
                       max_hamming: int = 3,
                       bands: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance with PIGEONHOLE
    banding: the fingerprint is split into ``max_hamming + 1`` bands,
    so any pair within ``max_hamming`` differing bits agrees *exactly*
    on at least one band — the per-band equijoin has perfect recall,
    and the join key space is ``bands × 2^(bits/bands)`` (4 × 65,536
    at the defaults) instead of one table-wide block. Pipeline: band
    explode → one bucket shuffle → in-bucket pair expansion with array
    lambdas (carrying both fingerprints, so hamming verification is
    inline — no join back to the fingerprint table) → distinct.

    At 10^12 docs, grow ``bits`` so buckets stay small (>128 bits
    draws from multiple md5 streams — see ``simhash_banded``); the
    pigeonhole guarantee needs only ``bands >= max_hamming + 1``
    regardless of ``bits``, so e.g. ``bits=256, bands=8`` keeps every
    band key inside a signed long while any ≤3-bit-different pair
    still agrees on ≥5 bands."""
    if bands is None:
        bands = max_hamming + 1
    fps = simhash_banded(df, text_col, id_col, bits=bits, bands=bands)
    fp = F.struct(*[F.col(f"band{b}") for b in range(bands)])
    bk = F.array(*[F.struct(F.lit(b).alias("band"),
                            F.col(f"band{b}").alias("bkey"))
                   for b in range(bands)])
    banded = (fps.select(F.col(id_col), fp.alias("fp"),
                         F.explode(bk).alias("bk"))
                 .select(F.col(id_col), F.col("fp"),
                         F.col("bk.band").alias("band"),
                         F.col("bk.bkey").alias("bkey")))
    # one explicit bucket-keyed exchange: both join sides canonicalize
    # to the SAME exchange, so ReuseExchange computes the fingerprint
    # fold ONCE and the equijoin reads co-located partitions — without
    # this, each self-join side would rescan the table and refold
    banded = banded.repartition(F.col("band"), F.col("bkey"))
    # pair stage: a STREAMING equijoin on (band, bkey). Near-dup
    # corpora have mega-clusters (one bucket holding hundreds of
    # copies); a collect_list + in-row pair expansion would build the
    # whole quadratic pair set of a cluster inside ONE row, while the
    # join streams pairs through the operator pipeline and AQE can
    # skew-split a hot bucket across tasks. (Contrast
    # ``lsh_candidate_pairs``: minhash band keys are md5 over the
    # signature, buckets stay small, in-row expansion wins there.)
    a, b = banded.alias("a"), banded.alias("b")
    cond = (F.col("a.band") == F.col("b.band")) \
        & (F.col("a.bkey") == F.col("b.bkey")) \
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # first-match-band dedup: a pair agreeing on k bands would surface
    # k times; emitting it only from its LOWEST matching band makes
    # every pair unique by construction — no global distinct, so the
    # quadratic pair stream never crosses another shuffle
    for b2 in range(bands - 1):
        cond = cond & ~((F.lit(b2) < F.col("a.band"))
                        & (F.col(f"a.fp.band{b2}")
                           == F.col(f"b.fp.band{b2}")))
    ham = F.lit(0)
    for k in range(bands):
        ham = ham + F.bit_count(
            F.col(f"a.fp.band{k}").bitwiseXOR(F.col(f"b.fp.band{k}")))
    return (a.join(b, cond)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     ham.cast("int").alias("hamming"))
             .where(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------

def duplicate_clusters(pairs: DataFrame, *, id_a: str = "id_a",
                       id_b: str = "id_b", node_col: str = "doc_id",
                       max_iters: int = 25) -> DataFrame:
    """Connected components over duplicate-pair edges: one row per node
    that appears in any pair, labeled ``cluster_id`` = the smallest
    member id of its component (the canonical keeper). This is the step
    between near-pair detection (LSH / SimHash / cosine) and actual
    dedup: drop every doc whose id ≠ its cluster_id.

    Min-label propagation: round ``r`` sets
    ``l(v) = min(l(v), min over neighbors l(u))`` — per round ONE
    edges⋈labels equijoin plus ONE min-groupBy, so shuffle volume stays
    linear in |E| and the labels frame (|V| rows) is the only iterated
    state. Rounds needed = component diameter; dedup graphs are cliques
    (identical docs — diameter 1) and short near-dup chains, so
    convergence is typically ≤ 5 rounds — the loop stops early via a
    monotone checksum (labels only ever decrease) and
    ``localCheckpoint`` truncates lineage each round so round R never
    replays rounds 1..R-1. For adversarial million-hop chain graphs
    swap in star-contraction (alternating large-star/small-star,
    O(log²) rounds) — same join/groupBy primitives, not needed for
    dedup workloads.

    Iterative ⇒ not expressible as one SQL statement; the driver twin
    uses a recursive CTE (exact same fixpoint on the small oracle
    corpus). Singleton docs (in no pair) are absent by construction —
    anti-join your corpus against the output to keep them."""
    sym = pairs.select(F.col(id_a).cast("long").alias("u"),
                       F.col(id_b).cast("long").alias("v"))
    edges = (sym.union(sym.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
                .repartition("u").localCheckpoint())
    labels = (edges.groupBy("u").agg(F.min("v").alias("__mn__"))
                   .select("u", F.least("u", "__mn__").alias("label"))
                   .localCheckpoint())
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        prop = (edges.join(labels, on="u")
                     .select(F.col("v").alias("node"), F.col("label")))
        labels = (labels.select(F.col("u").alias("node"), "label")
                        .union(prop)
                        .groupBy("node").agg(F.min("label").alias("label"))
                        .withColumnRenamed("node", "u")
                        .localCheckpoint())
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("u").alias(node_col),
                         F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id", *,
                        shingle_n: int = 3,
                        min_jaccard: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (id_a, id_b): the
    verification stage after LSH. Joins the (small) candidate set back
    to the docs twice; similarity on distinct shingle sets."""
    sh = (df.select(F.col(id_col),
                    F.array_distinct(
                        shingles_col(tokens_col(text_col), shingle_n))
                    .alias("sh")))
    j = (pairs
         .join(sh.select(F.col(id_col).alias("id_a"),
                         F.col("sh").alias("sh_a")), on="id_a")
         .join(sh.select(F.col(id_col).alias("id_b"),
                         F.col("sh").alias("sh_b")), on="id_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 4)
    return (j.select("id_a", "id_b", jac.alias("jaccard"))
             .where(F.col("jaccard") > F.lit(min_jaccard)))


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate_report(df: DataFrame, benchmark: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id", *,
                         shingle_n: int = 3,
                         min_hits: int = 1) -> DataFrame:
    """Training-set decontamination: flag corpus docs sharing word
    ``shingle_n``-grams with a benchmark/eval set (the standard n-gram
    overlap test, e.g. GPT-3 appendix C / PaLM §7). Returns one row
    per contaminated doc: ``(id, n_hit_shingles, n_shingles,
    hit_frac, example_shingle)`` with the lexicographically-smallest
    overlapping shingle as the audit sample.

    Scale: the benchmark side is distinct-shingled and BROADCAST —
    eval suites are ~10^5-10^7 shingles, tiny next to a 10^12-doc
    corpus — so the probe is a map-side hash join against the corpus'
    exploded distinct shingles: no shuffle of corpus rows at all, and
    the groupBy that re-aggregates hits is map-side combinable on
    ``id_col``. If the benchmark ever outgrows broadcast, drop the
    hint and the same plan degrades gracefully to a shuffled equijoin
    on the shingle."""
    sh = lambda c: F.array_distinct(  # noqa: E731
        shingles_col(tokens_col(c), shingle_n))
    bench_sh = (benchmark
                .select(F.explode(sh(text_col)).alias("shingle"))
                .distinct())
    doc = df.select(F.col(id_col), sh(text_col).alias("sh"))
    doc_sh = doc.select(id_col, F.size("sh").alias("n_shingles"),
                        F.explode("sh").alias("shingle"))
    hits = doc_sh.join(F.broadcast(bench_sh), "shingle")
    return (hits.groupBy(id_col, "n_shingles")
                .agg(F.count(F.lit(1)).alias("n_hit_shingles"),
                     F.min("shingle").alias("example_shingle"))
                .where(F.col("n_hit_shingles") >= min_hits)
                .select(id_col,
                        "n_hit_shingles", "n_shingles",
                        F.round(F.col("n_hit_shingles").cast("double")
                                / F.col("n_shingles").cast("double"), 4)
                        .alias("hit_frac"),
                        "example_shingle"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(df: DataFrame, emb_col: str = "embedding",
                              id_col: str = "vec_id", *,
                              threshold: float = 0.9,
                              block: Column | str | None = "sign",
                              block_bits: int = 4) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    BLOCKED BY DEFAULT: ``block="sign"`` buckets both sides by the
    deterministic ``similarity.sign_bucket`` hyperplane sketch and the
    self-join is an equijoin on the bucket — candidate volume drops
    ~2^bits and the join shuffles on a key instead of exploding a
    cross product. Near-duplicate embeddings (cosine ≥ 0.9) almost
    always share their leading-dimension signs, so recall loss is
    confined to vectors straddling a hyperplane. Pass a custom
    ``Column`` for a different blocking scheme, or ``block=None`` for
    the exact quadratic sweep — acceptable ONLY for small slices
    (verification sets, tests); at 10^12 rows an unblocked self-join
    is ~10^24 candidate pairs and must never be the default."""
    if isinstance(block, str):
        if block != "sign":
            raise ValueError(f"unknown block scheme {block!r}")
        block = sign_bucket(F.col(emb_col), bits=block_bits)
    cols = [F.col(id_col), F.col(emb_col)]
    if block is not None:
        cols.append(block.alias("__block__"))
    e = df.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    on = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block is not None:
        on = (F.col("a.__block__") == F.col("b.__block__")) & on
    cos = cosine_col(F.col(f"a.{emb_col}"), F.col(f"b.{emb_col}"))
    return (a.join(b, on)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.round(cos, 6).alias("cosine"))
             .where(F.col("cosine") >= threshold))
