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
