"""Similarity search over embedding columns (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the full corpus; one shuffle for the per-query window.
  The baseline and the verifier for the approximate path.
* ``ann_topk_bucketed`` — LSH-flavored scale path: corpus and queries
  are bucketed by the sign pattern of the leading dimensions (a
  data-derived random-hyperplane sketch — deterministic, no RNG), the
  join is restricted to same-bucket candidates, so each query touches
  ~corpus/2^bits rows. At 10^12 rows the bucket column becomes the
  table's partition key so bucket joins are co-located scans.

Determinism contract: dot products are **left folds in index order over
doubles** (``F.aggregate`` over ``zip_with``), giving bit-identical
results in any engine that folds sequentially — the DuckDB oracle uses
``list_reduce`` with the same shape. Never rely on engine-native
``list_cosine_similarity`` style builtins whose accumulation order is
unspecified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Deterministic dot product: left fold of exact float×float
    products (each product is exact in double) in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|) with a fixed operation order (divide twice)."""
    return dot_col(a, b) / norm_col(a) / norm_col(b)


def brute_force_topk(queries: DataFrame, corpus: DataFrame, *,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query (cosine desc, neighbor id asc as
    the deterministic tiebreak). Query side is broadcast — the corpus is
    scanned once, map-side, with no corpus shuffle; the only shuffle is
    the per-query top-k window over #queries × #corpus scored rows
    (use a small/sampled query set, or the bucketed path below)."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(emb_col).alias("__qe__")))
    scored = (corpus.select(F.col(id_col).alias("neighbor_id"),
                            F.col(emb_col).alias("__ce__"))
              .join(q, F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_col(F.col("__qe__"), F.col("__ce__")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "cosine", "rank"))


def sign_bucket(emb: Column, *, bits: int = 4) -> Column:
    """Deterministic hyperplane sketch: bit i = (emb[i] > 0). Buckets
    the space into 2^bits cells; at scale, persist as a partition/
    cluster key so same-bucket joins are co-located."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(emb, i + 1) > 0,
                           F.lit(2 ** i)).otherwise(0)
    return out.cast("int")


def ivf_topk(queries: DataFrame, corpus: DataFrame, *,
             id_col: str = "vec_id", emb_col: str = "embedding",
             k: int = 3, n_centroids: int = 8,
             nprobe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the scale path for
    embedding search at 10^12 rows.

    * **Coarse quantizer**: ``n_centroids`` centroids chosen
      deterministically (the first ``n_centroids`` corpus vectors by
      id — a data-derived codebook with no RNG, so the DuckDB oracle
      reproduces the index bit-for-bit; swap in k-means centroids on a
      real deployment, the plan shape is identical).
    * **Index**: the codebook is collected to the driver (it is tiny
      by construction — real IVF codebooks are thousands of vectors)
      and baked into the plan as literals, so cell assignment is a
      ZERO-SHUFFLE map-side argmax over the corpus — no window, no
      8×-corpus exchange; at scale the assignment is persisted as the
      table's partition/cluster key so each probe is a
      partition-pruned scan.
    * **Search**: each query probes its ``nprobe`` nearest centroid
      cells (multi-probe recall guard) and scores only those cells'
      members — candidate volume ~``nprobe/n_centroids`` of the
      corpus.

    Ties on assignment break toward the lower centroid id (stable in
    both engines)."""
    cent_rows = (corpus.orderBy(F.col(id_col)).limit(n_centroids)
                 .select(id_col, emb_col).collect())  # tiny codebook
    cents = [(r[id_col], [float(x) for x in r[emb_col]])
             for r in cent_rows]

    def nearest_cells(emb: Column, n_cells: int) -> Column:
        """ids of the n_cells nearest centroids: sort an
        n_centroids-length literal-scored array — pure expressions."""
        scored = F.array(*[
            F.struct(
                (-F.round(cosine_col(
                    emb, F.array(*[F.lit(x) for x in vec])), 6))
                .alias("negsim"),
                F.lit(cid).alias("cent_id"))
            for cid, vec in cents])
        return F.transform(F.slice(F.sort_array(scored), 1, n_cells),
                           lambda c: c.getField("cent_id"))

    def assign(df: DataFrame, id_alias: str, emb_alias: str,
               n_cells: int) -> DataFrame:
        return (df.select(F.col(id_col).alias(id_alias),
                          F.col(emb_col).alias(emb_alias),
                          F.explode(nearest_cells(F.col(emb_col),
                                                  n_cells))
                          .alias("cent_id")))

    indexed = assign(corpus, "neighbor_id", "__ce__", 1)
    probes = F.broadcast(assign(queries, "query_id", "__qe__", nprobe))
    scored = (indexed.join(probes, on="cent_id")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_col(F.col("__qe__"), F.col("__ce__")),
                              6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "cosine", "rank"))


def ann_topk_bucketed(queries: DataFrame, corpus: DataFrame, *,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      k: int = 3, bits: int = 4,
                      multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket, MULTI-PROBED. ``multiprobe=1`` (default) probes the
    query's own bucket plus every Hamming-1 neighbor bucket
    (``bits + 1`` probes) — a near-neighbor that straddles one
    hyperplane still lands in a probed bucket, so ``bits`` can grow
    (finer candidate pruning, ~2^bits reduction) without the recall
    collapse a single-probe sketch suffers. Probed buckets are
    disjoint, so no candidate dedup is needed; the corpus is bucketed
    ONCE (at scale: persist the bucket as the table's partition/
    cluster key) and only the tiny query side is expanded
    ``bits + 1``-fold before the broadcast. ``multiprobe=0`` is the
    legacy single-bucket probe. Verify recall against
    ``brute_force_topk`` on samples (see tests)."""
    qb = sign_bucket(F.col(emb_col), bits=bits)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(emb_col).alias("__qe__"),
                       qb.alias("__home__"))
    if multiprobe >= 1:
        probes = F.array(
            F.col("__home__"),
            *[F.col("__home__").bitwiseXOR(F.lit(1 << i))
              for i in range(bits)])
        q = q.select("query_id", "__qe__",
                     F.explode(probes).alias("bucket"))
    else:
        q = q.withColumnRenamed("__home__", "bucket")
    q = F.broadcast(q)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(emb_col).alias("__ce__"),
                      sign_bucket(F.col(emb_col), bits=bits).alias("bucket"))
    scored = (c.join(q, on="bucket")
               .where(F.col("query_id") != F.col("neighbor_id"))
               .select("query_id", "neighbor_id",
                       F.round(cosine_col(F.col("__qe__"), F.col("__ce__")),
                               6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "cosine", "rank"))
