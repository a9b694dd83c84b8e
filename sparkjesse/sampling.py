"""Deterministic sampling for reproducible pipeline runs.

``df.sample()`` is seed-dependent on partitioning (a repartition or a
task retry changes which rows land where the RNG draws them), so a
10^12-row pipeline that must produce THE SAME sample on re-run needs
content-keyed sampling: hash a stable id, keep rows whose hash bucket
falls below the cut. Zero shuffle, zero state, retry-safe, and the
sample is a pure function of the data — two clusters of different
sizes produce byte-identical samples.

md5 (not xxhash64) so an external engine can reproduce the exact
sample for audit (the DuckDB oracle in ``__spark_entry__.py`` does).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(col: Column | str, *, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000): first 4 hex digits of
    md5(salt + value) — pure expression, whole-stage-codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
            % F.lit(BUCKETS))


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         *, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash. Same input ⇒ same
    sample, regardless of partitioning, parallelism, or retries."""
    cut = int(round(fraction * BUCKETS))
    return df.where(hash_bucket(id_col, salt=salt) < F.lit(cut))


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      fractions: Mapping[str, float] | float,
                      *, salt: str = "",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas in
    a training-mix). ``fractions`` is either one float for every
    stratum or a {stratum: fraction} map; unlisted strata fall back to
    ``default_fraction``. Still zero-shuffle: the per-stratum cut is a
    CASE expression, not a join."""
    if isinstance(fractions, (int, float)):
        return deterministic_sample(df, id_col, float(fractions),
                                    salt=salt)
    cut = F.lit(int(round(default_fraction * BUCKETS)))
    for stratum, frac in sorted(fractions.items()):
        cut = (F.when(F.col(strata_col) == stratum,
                      F.lit(int(round(frac * BUCKETS))))
                .otherwise(cut))
    return df.where(hash_bucket(id_col, salt=salt) < cut)


def epoch_shuffle(df: DataFrame, id_col: str, *, epoch: int = 0,
                  salt: str = "", shards: int = 64) -> DataFrame:
    """Deterministic global shuffle for training-data ordering.

    Training runs need the corpus in a pseudorandom order that is (a)
    different every epoch, (b) reproducible bit-for-bit on re-run /
    task retry / different cluster size, and (c) produced without a
    single-reducer global sort. ``orderBy(rand(seed))`` fails (a)+(b):
    Spark's rand() is seeded per-partition, so the order changes with
    partitioning and retries. Here the sort key is content-keyed —
    ``shuffle_rank = md5(salt|epoch|id)`` — a pure function of the row,
    so the order is THE SAME on any cluster; and
    ``repartitionByRange(shards) + sortWithinPartitions`` makes shard
    k's ranks all precede shard k+1's, so every shard writes in
    parallel and a reader concatenating shards 0..n-1 sees the exact
    global order. One sampled-boundary range exchange; md5 is uniform,
    so shards are skew-free by construction. The rank column stays on
    the output so consumers (and tests) can verify the order."""
    rank = F.md5(F.concat(F.lit(f"{salt}|{epoch}|"),
                          F.col(id_col).cast("string")))
    return (df.withColumn("shuffle_rank", rank)
              .repartitionByRange(shards, "shuffle_rank")
              .sortWithinPartitions("shuffle_rank"))


def mixture_interleave(parts: Mapping[str, tuple[DataFrame, float]],
                       id_col: str, *, epoch: int = 0, salt: str = "",
                       shards: int = 64) -> DataFrame:
    """Deterministic training-mix: weight each source and interleave.

    ``parts`` maps source name → (df, weight). Weight w ≤ 1 keeps a
    deterministic w-fraction of that source (content-keyed, so the
    same rows every run); w > 1 repeats the source ⌊w⌋ times plus a
    deterministic (w−⌊w⌋)-fraction — the standard oversampling of
    high-quality sources in LLM data mixes. Copies get distinct
    ``copy`` indices and distinct shuffle ranks (the copy index is in
    the rank salt), so repeats of a document are spread across the
    epoch instead of adjacent. Output carries ``source`` and ``copy``
    and is globally ordered by ``shuffle_rank`` (see
    ``epoch_shuffle``). All operators are unions + filters + one range
    exchange — no joins, no driver materialization, safe at 10^12
    rows."""
    pieces = []
    for name, (df, weight) in sorted(parts.items()):
        full, frac = int(weight), round(weight - int(weight), 9)
        for copy in range(full):
            pieces.append(df.withColumn("source", F.lit(name))
                            .withColumn("copy", F.lit(copy)))
        if frac > 0:
            pieces.append(
                deterministic_sample(df, id_col, frac,
                                     salt=f"{salt}|mix|{name}|{full}")
                .withColumn("source", F.lit(name))
                .withColumn("copy", F.lit(full)))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    rank = F.md5(F.concat_ws("|", F.lit(salt), F.lit(str(epoch)),
                             F.col("source"), F.col("copy"),
                             F.col(id_col).cast("string")))
    return (out.withColumn("shuffle_rank", rank)
               .repartitionByRange(shards, "shuffle_rank")
               .sortWithinPartitions("shuffle_rank"))


def split(df: DataFrame, id_col: str, *, weights: Mapping[str, float],
          salt: str = "") -> DataFrame:
    """Disjoint deterministic train/val/test split: adds a ``split``
    column assigning each row to exactly one named part by hash range.
    Weights are normalized; boundaries are cumulative buckets, so the
    parts are exactly disjoint and exhaustive (unlike three independent
    ``sample()`` calls, which overlap)."""
    total = float(sum(weights.values()))
    bucket = hash_bucket(id_col, salt=salt)
    expr: Optional[Column] = None
    acc = 0.0
    items = list(weights.items())  # caller order = hash-range order
    for name, wgt in items[:-1]:
        acc += wgt / total
        bound = int(round(acc * BUCKETS))
        cond = bucket < F.lit(bound)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(items[-1][0])
    split_col = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split_col)
