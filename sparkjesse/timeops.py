"""Event-time operators: sessionization and as-of join.

Both are single-shuffle plans that scale by key partitioning:

- ``sessionize`` — gap-based sessions per key. One shuffle on the key,
  then two windows over the SAME (key)-partitioned sort — Catalyst
  collapses them into one sort, so the whole operator is
  shuffle → sort → project. No state beyond the window frame.
- ``asof_join`` — "latest right row at or before each left row". The
  classic distributed formulation: tag both sides, UNION on
  (key, time), and carry the last-seen right payload forward with
  ``last(..., ignorenulls=True)`` over a row-frame window. ONE shuffle
  on the key, no range-explosion join, works for any right/left
  cardinality ratio — this is how you as-of join two 10^12-row tables
  without a cross-bucket interval blowup. (A broadcast variant is
  pointless here: the window approach is already shuffle-minimal and
  the right side need not fit in memory.)

Determinism contract: all window sorts carry explicit tiebreaks
(side marker, then a caller id column), so results are reproducible
and oracle-comparable across engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Timezone-free epoch microseconds for TIMESTAMP and
    TIMESTAMP_NTZ alike. ``unix_micros`` rejects NTZ, and casting
    NTZ→TIMESTAMP would shift values by the session timezone (and
    non-uniformly across DST boundaries) — ``timestamp_diff`` against
    an epoch literal of the SAME type sidesteps both."""
    dtype = dict(df.dtypes)[ts_col]
    if dtype == "timestamp_ntz":
        zero = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", zero, F.col(ts_col))
    return F.unix_micros(F.col(ts_col))


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               *, gap_minutes: float = 30.0,
               id_col: Optional[str] = None,
               agg_value_col: Optional[str] = None) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_minutes``.

    Returns one row per session:
    ``(key, session_idx, n_events, session_start, session_end,
    duration_us[, total_value])`` — session_idx is 1-based in event
    order, duration in exact microseconds (integer — no float drift).

    Plan: one shuffle on ``key_col``; ``lag`` + running ``sum`` share
    one partitioned sort; the per-session aggregate is a map-side
    combinable groupBy on (key, session_idx) which AQE coalesces onto
    the same hash partitioning. ``id_col`` is the sort tiebreak for
    equal timestamps (required for cross-run determinism)."""
    order = [F.col(ts_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = int(gap_minutes * 60_000_000)
    t_us = epoch_us(df, ts_col)
    prev = F.lag(t_us).over(w)
    is_new = (prev.isNull() | ((t_us - prev) > F.lit(gap_us)))
    sess = df.select(
        F.col(key_col), F.col(ts_col), t_us.alias("_t_us"),
        *( [F.col(agg_value_col)] if agg_value_col else [] ),
        F.sum(is_new.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"))
    aggs = [F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.max("_t_us") - F.min("_t_us")).alias("duration_us")]
    if agg_value_col:
        aggs.append(F.round(F.sum(agg_value_col), 4).alias("total_value"))
    return sess.groupBy(key_col, "session_idx").agg(*aggs)


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              left_ts: str, right_ts: str,
              payload_cols: Sequence[str],
              *, left_id: Optional[str] = None,
              tolerance_minutes: Optional[float] = None) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key (NULL payload
    if none). Inclusive on equal timestamps (right rows sort before
    left rows at the same instant).

    Ties among right rows at the same (key, ts) resolve to the LAST
    row under ascending ``payload_cols[0]`` order — pass a unique id
    first in ``payload_cols`` for full determinism.

    ``tolerance_minutes`` nulls the payload when the matched right row
    is older than the tolerance (pandas ``merge_asof`` semantics).

    Scale: union-tag + forward-fill window ⇒ exactly ONE shuffle on
    ``key_col`` and no interval-join row expansion; both sides may be
    arbitrarily large and skew is bounded by the hottest single key."""
    lcols = [c for c in left.columns]
    l_tag = left.select(
        F.col(key_col).alias("_k"),
        epoch_us(left, left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
        F.lit(None).cast("long").alias("_rt"))
    r_tag = right.select(
        F.col(key_col).alias("_k"),
        epoch_us(right, right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        epoch_us(right, right_ts).alias("_rt"))
    u = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows (side 1) at equal ts ⇒
    # "at or before" inclusivity; among equal right rows the window's
    # last() keeps the one sorted last (max payload_cols[0])
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                  *[F.col(f"_r_{c}").asc_nulls_first()
                    for c in payload_cols[:1]])
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        "_k", "_t", "_side", "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
          for c in payload_cols],
        F.last("_rt", ignorenulls=True).over(w).alias("_rt"))
    out = filled.where(F.col("_side") == 1)
    if tolerance_minutes is not None:
        tol_us = int(tolerance_minutes * 60_000_000)
        in_tol = (F.col("_t") - F.col("_rt")) <= F.lit(tol_us)
        out = out.select(
            "_k", "_t", "_l", "_rt",
            *[F.when(in_tol, F.col(f"_r_{c}")).alias(f"_r_{c}")
              for c in payload_cols])
        out = out.withColumn(
            "_rt", F.when(in_tol, F.col("_rt")))
    return out.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in payload_cols],
        (F.col("_t") - F.col("_rt")).alias("asof_lag_us"))
