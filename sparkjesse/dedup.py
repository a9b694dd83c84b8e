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
from .similarity import cosine_col

HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

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


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, num_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    toks = tokens_col(text_col)
    return df.select(F.col(id_col),
                     *minhash_signature_cols(toks, num_hashes=num_hashes,
                                             shingle_n=shingle_n))


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", *, bands: int = 4,
                        rows_per_band: int = 2,
                        shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of their min-hash
    signature. Emits ``bands`` (band, band_key) rows per doc, buckets by
    (band, band_key) via a self-join, returns distinct (id_a < id_b)
    pairs. At 10^12 docs the join key space is huge and uniform (md5),
    so the shuffle partitions evenly; hot boilerplate buckets are the
    *point* (they are the duplicates)."""
    sigs = minhash_signatures(df, text_col, id_col,
                              num_hashes=bands * rows_per_band,
                              shingle_n=shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(
                "|", *[F.col(f"mh{b * rows_per_band + r}")
                       for r in range(rows_per_band)])).alias("band_key"))
        for b in range(bands)
    ])
    banded = (sigs.select(F.col(id_col), F.explode(band_structs).alias("bk"))
                  .select(F.col(id_col), F.col("bk.band").alias("band"),
                          F.col("bk.band_key").alias("band_key")))
    # bucket-local pair expansion beats a self-join here: the input is
    # scanned (and signatures computed) ONCE, one shuffle groups ids per
    # (band, band_key), and pairs are generated per bucket with array
    # lambdas — pair count is inherently quadratic per bucket either way
    buckets = (banded.groupBy("band", "band_key")
                     .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
                     .where(F.size("ids") > 1))
    pairs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2,
                    F.greatest(F.size(F.col("ids")) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    return (buckets.select(F.explode(pairs).alias("p"))
                   .select("p.id_a", "p.id_b")
                   .distinct())


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _nibble(digest: Column, pos_1based: int) -> Column:
    """Hex nibble value 0..15 at a 1-based digest position, via a
    constant-string index — reproducible in any engine with strpos."""
    return (F.instr(F.lit(HEX), F.substring(digest, pos_1based, 1)) - 1) \
        .cast("int")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            *, bits: int = 16) -> DataFrame:
    """Charikar SimHash over distinct tokens: token bit ``j`` comes from
    md5-hex nibble ``j//4`` of the token digest; each token votes ±1 per
    bit; fingerprint bit = (vote sum > 0). One explode + one groupBy
    (shuffle volume = #docs × #distinct tokens, partial-aggregated
    map-side). Returns (id, simhash) with a ``bits``-bit integer."""
    assert bits % 4 == 0 and bits <= 64
    toks = F.array_distinct(tokens_col(text_col))
    exploded = df.select(F.col(id_col),
                         F.explode(toks).alias("tok"))
    digest = F.md5(F.col("tok"))
    votes = [
        (F.when((F.shiftright(_nibble(digest, j // 4 + 1), j % 4)
                 .bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1))
        for j in range(bits)
    ]
    agg = (exploded
           .select(F.col(id_col),
                   *[v.alias(f"v{j}") for j, v in enumerate(votes)])
           .groupBy(id_col)
           .agg(*[F.sum(f"v{j}").alias(f"s{j}") for j in range(bits)]))
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(0)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, bits: int = 16,
                       max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Blocks on the upper
    half of the fingerprint (two dups within ``max_hamming`` bits very
    likely share one half — proper banding would use 4 blocks) so the
    self-join never goes quadratic."""
    fps = simhash(df, text_col, id_col, bits=bits)
    half = bits // 2
    blocked = fps.withColumn("block", F.shiftright(F.col("simhash"), half))
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, on="block")
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .where(ham <= max_hamming)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     ham.alias("hamming")))


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
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(df: DataFrame, emb_col: str = "embedding",
                              id_col: str = "vec_id", *,
                              threshold: float = 0.9,
                              block: Column | None = None) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold. ``block`` (e.g. a
    sign-bucket from ``similarity.sign_bucket``) bounds the self-join;
    without it the join is quadratic and only fit for small partitions
    of a blocked pipeline."""
    cols = [F.col(id_col), F.col(emb_col)]
    if block is not None:
        cols.append(block.alias("__block__"))
    e = df.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    on = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block is not None:
        on = on & (F.col("a.__block__") == F.col("b.__block__"))
    cos = cosine_col(F.col(f"a.{emb_col}"), F.col(f"b.{emb_col}"))
    return (a.join(b, on)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.round(cos, 6).alias("cosine"))
             .where(F.col("cosine") >= threshold))
