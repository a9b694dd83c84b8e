"""Structured Streaming validation.

The compiled validator plan is pure column expressions, so the SAME
``ValidationEngine.validate`` call works on a streaming DataFrame —
schema compilation happens once on the driver, each micro-batch is
validated inside Spark's streaming pipeline with zero per-row Python.
This module adds the streaming-specific shapes around it:

* ``validate_stream`` — annotate a stream with violations/valid.
* ``windowed_summary`` — event-time windowed pass/fail counts with a
  watermark for late data (the streaming analogue of the per-partition
  summary; state is bounded by the watermark).
* ``violations_sink`` — exploded violation rows ready for
  ``writeStream`` (append mode: one row per (doc, violation), no
  stateful operators, so it runs with exactly-once file sinks).

At the 10^12-doc design point the batch engine handles the backfill and
this runs the live tail — same schema, same compiled checks, same
violation-row contract.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .engine import ValidationEngine


def validate_stream(engine: ValidationEngine, stream_df: DataFrame,
                    schema_or_key: Union[str, dict], *,
                    doc_id_col: str = "doc_id",
                    draft: Optional[str] = None) -> DataFrame:
    """Annotated streaming DataFrame (input + violations + valid)."""
    return engine.validate(stream_df, schema_or_key, doc_id_col=doc_id_col,
                           draft=draft).annotated


def windowed_summary(annotated: DataFrame, *, time_col: str,
                     window: str = "1 minute",
                     watermark: str = "5 minutes") -> DataFrame:
    """Event-time windowed pass/fail counts. Watermarked so state is
    dropped once windows close — bounded memory on unbounded streams."""
    return (annotated
            .withWatermark(time_col, watermark)
            .groupBy(F.window(F.col(time_col), window).alias("window"))
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum(F.col("valid").cast("long")).alias("pass"),
                 F.sum((~F.col("valid")).cast("long")).alias("fail")))


def stateful_key_budget(annotated: DataFrame, *, key_col: str,
                        budget: int = 10,
                        idle_timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (Arrow-batched — never per-row Python): a cumulative per-key
    invalid-doc counter that flags the key once its failures exceed
    ``budget``. The streaming analogue of jesse's ``allowed_errors``
    budget, lifted from per-document to per-key (e.g. quarantine a
    crawler source whose documents keep failing validation).

    Emits one row per (micro-batch, key): ``(key, batch_docs,
    batch_fail, total_fail, quarantined)``. State is one long per key;
    with ``idle_timeout_ms > 0`` idle keys time out (processing-time),
    emit a final tombstone row (batch_docs = 0) and drop their state —
    bounded memory on unbounded key spaces."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("key string, batch_docs long, batch_fail long, "
                  "total_fail long, quarantined boolean")
    state_schema = "total_fail long"

    def update(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            (total,) = state.get
            state.remove()
            yield pd.DataFrame([{"key": k, "batch_docs": 0,
                                 "batch_fail": 0, "total_fail": total,
                                 "quarantined": total > budget}])
            return
        total = state.get[0] if state.exists else 0
        docs = fail = 0
        for pdf in pdfs:
            docs += len(pdf)
            fail += int((~pdf["valid"]).sum())
        total += fail
        state.update((total,))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame([{"key": k, "batch_docs": docs,
                             "batch_fail": fail, "total_fail": total,
                             "quarantined": total > budget}])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_timeout_ms > 0 else GroupStateTimeout.NoTimeout)
    return (annotated
            .select(F.col(key_col).alias("key"), F.col("valid"))
            .groupBy("key")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append", timeout))


def sessionize_stream(stream_df: DataFrame, *, key_col: str,
                      time_col: str, gap: str = "30 minutes",
                      watermark: str = "1 hour",
                      value_col: Optional[str] = None) -> DataFrame:
    """Streaming analogue of ``timeops.sessionize``: gap-based session
    windows via the native ``session_window`` operator — sessions
    close when no event arrives for ``gap``, and the watermark finalizes
    (and evicts state for) sessions older than the horizon, so memory
    stays bounded on unbounded streams. Emits one row per closed
    session: ``(key, session, n_events[, total_value])`` where
    ``session`` is the (start, end) struct.

    Semantics note vs the batch operator: ``session_window``'s end is
    last-event + gap (the window extent), while batch ``sessionize``
    reports last-event itself — both identify the SAME event grouping
    for a given gap; only the reported end differs, by exactly ``gap``.
    Use the batch operator for backfill and this for the live tail."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return (stream_df
            .withWatermark(time_col, watermark)
            .groupBy(F.col(key_col),
                     F.session_window(F.col(time_col), gap)
                      .alias("session"))
            .agg(*aggs))


def dedup_stream(stream_df: DataFrame, *, id_col: str = "doc_id",
                 time_col: str, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: exactly ONE arrival per ``id_col``
    survives within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — per-key state is evicted once
    the watermark passes, so memory stays bounded on unbounded streams
    while re-crawled/replayed duplicates inside the horizon are
    dropped; which duplicate wins is processing-order, not
    event-time-order). The streaming analogue of
    ``dedup.exact_duplicate_groups``; run it BEFORE validation so
    duplicate documents are validated (and billed) once."""
    return (stream_df
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark([id_col]))


def violations_sink(annotated: DataFrame, *,
                    doc_id_col: str = "doc_id") -> DataFrame:
    """Exploded violation rows for ``writeStream`` (append-safe: a
    stateless projection of each micro-batch)."""
    return (annotated
            .where(F.size("violations") > 0)
            .select(F.col(doc_id_col).alias("doc_id"),
                    F.explode("violations").alias("v"))
            .select("doc_id", "v.error_kind", "v.error_type", "v.path",
                    "v.schema_ptr", "v.value_json", "v.detail"))
