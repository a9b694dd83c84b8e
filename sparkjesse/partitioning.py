"""Salted, skew-aware repartitioning (north rule).

Big validation passes repartition on ``hash(doc_id)`` so per-partition
summaries and the checkpoint ledger line up with stable key ranges. A few
hot doc_ids (duplicates, crawler artifacts) would make single partitions
straggle at 10^12 rows — so we *sample* key frequencies first and salt
only the hot keys, keeping everything else 1-pass co-partitioned.

Orchestration-only module: detection is a sampled groupBy (cheap), the
fix is a salt column + ``repartition(n, key, salt)``. AQE still handles
residual skew at runtime; this handles the pathological keys AQE can't
split (single-key hash partitions).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


@dataclass
class SkewReport:
    sampled_rows: int
    hot_keys: list  # [(key, est_count)]
    threshold: float


def detect_hot_keys(df: DataFrame, key: str, *, sample_fraction: float = 0.05,
                    hot_share: float = 0.002, target_rows: int = 500_000,
                    seed: int = 7) -> SkewReport:
    """Sample the key column and flag keys holding more than ``hot_share``
    of the sampled mass. One small job over a sampled projection — the
    full table is never shuffled for detection (and no ``limit``, which
    would funnel the sample through a single task). The default
    ``hot_share`` is 0.2%: at 10^12 rows a 0.2% key is 2×10^9 rows in
    one hash partition — far past straggler territory.

    ``target_rows`` caps the expected sample size: for sources with a
    cheap count (parquet/Iceberg metadata) the fraction shrinks so the
    detection job stays O(target) however big the table — at 10^12 rows
    a fixed 5% sample would itself be a 5×10^10-row job."""
    if target_rows:
        try:
            n = df.count()
            if n > 0:
                sample_fraction = min(sample_fraction,
                                      max(target_rows / n, 1e-6))
        except Exception:
            pass
    sample = df.select(key).sample(fraction=sample_fraction, seed=seed)
    counts = sample.groupBy(key).count()
    rows = counts.agg(F.sum("count")).collect()[0][0] or 0
    if rows == 0:
        return SkewReport(0, [], hot_share)
    thresh = max(2.0, rows * hot_share)
    hot = (counts.where(F.col("count") >= thresh)
                 .orderBy(F.desc("count")).limit(100).collect())
    return SkewReport(rows, [(r[key], r["count"]) for r in hot], hot_share)


def salted_repartition(df: DataFrame, key: str, num_partitions: int, *,
                       skew: SkewReport | None = None,
                       salt_buckets: int = 16,
                       sample_fraction: float = 0.05) -> DataFrame:
    """Repartition on ``hash(key)`` with per-hot-key salting. Cold keys get
    salt 0 (plan unchanged for them); hot keys spread across
    ``salt_buckets`` partitions via a deterministic hash of a tiebreak
    column set. Adds ``__salt__`` (callers may drop it)."""
    if skew is None:
        skew = detect_hot_keys(df, key, sample_fraction=sample_fraction)
    hot_values = [k for k, _ in skew.hot_keys]
    if hot_values:
        # tiebreak hashes only (key, row ordinal): hashing whole rows
        # (nested arrays!) costs ~7x the shuffle itself — and Spark's
        # subexpression elimination evaluates the hoisted hash for every
        # row, hot or not, so the tiebreak must be cheap unconditionally
        tiebreak = F.xxhash64(F.col(key), F.monotonically_increasing_id())
        salt = (F.when(F.col(key).isin(hot_values),
                       F.pmod(tiebreak, F.lit(salt_buckets)))
                .otherwise(F.lit(0))).cast("int")
    else:
        salt = F.lit(0)
    out = df.withColumn(SALT_COL, salt)
    return out.repartition(num_partitions, F.col(key), F.col(SALT_COL))


def partition_sizes(df: DataFrame) -> DataFrame:
    """Rows per physical partition — the skew evidence table."""
    return (df.select(F.spark_partition_id().alias("partition_id"))
              .groupBy("partition_id").count())


def skew_factor(df: DataFrame) -> float:
    """max/mean partition size; 1.0 = perfectly balanced."""
    rows = partition_sizes(df).agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg")).collect()[0]
    if not rows["avg"]:
        return 1.0
    return float(rows["mx"] / rows["avg"])
