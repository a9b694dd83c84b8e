"""Sequence packing for LLM training pipelines.

After tokenization (``textops.encode_documents``) a training pipeline
concatenates documents into fixed-size context windows ("packing") so
no window wastes compute on padding. This module assigns each document
a ``(pack_part, pack_id, pack_offset)`` triple — which worker-local
stream, which window within it, and the token offset inside that
window — with a deterministic greedy next-fit pass.

Scale shape (the part that must survive 10^12 docs):

* Packing is inherently SEQUENTIAL — window boundaries depend on every
  previous document — so a global pack would serialize the corpus
  through one task. Instead documents are assigned to ``partitions``
  independent streams by a deterministic key (``doc_id % partitions``,
  NOT a sampled range partitioner and NOT Spark's internal hash — both
  engines and any retry reproduce it), and each stream packs ITS
  documents in ascending id order. Streams never interact: the ONE
  shuffle is the repartition, and the packing itself is an
  Arrow-batched cumulative fold (``mapInPandas``) that carries
  (pack_id, offset) across batches of the same partition — O(1) state,
  never a collected list.
* Documents longer than ``capacity`` get a window of their own and are
  flagged ``oversize`` (the trainer decides: split, truncate, or
  drop); they never poison the running window.
* Determinism: for fixed ``partitions`` and ``capacity`` the triple is
  a pure function of the (id, n_tokens) multiset — retry-safe and
  reproducible across cluster sizes, the same property the sampling
  and salting modules guarantee (pinned by
  ``tests/test_packing.py::test_packing_deterministic_across_layouts``).

Reference scope note: jesse (the validation reference) has no packing
stage; this is north-star training-pipeline surface (SURVEY §2.6)
alongside dedup/encode/quality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(df: DataFrame, length_col: str = "n_tokens",
                   id_col: str = "doc_id", *,
                   capacity: int = 2048,
                   partitions: int = 32) -> DataFrame:
    """Assign ``(id, n_tokens, pack_part, pack_id, pack_offset,
    oversize)`` with greedy next-fit packing per deterministic stream.

    ``pack_id`` is dense per stream (0, 1, 2, ...); ``pack_offset`` is
    the document's first token position inside its window. Next-fit
    (close the window on first overflow) rather than first-fit keeps
    state O(1) and — unlike first-fit — never reorders documents, so a
    pack is always a contiguous id-ascending run within its stream and
    downstream readers can stream-concatenate without a sort.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("n_tokens", LongType()),
        StructField("pack_part", LongType()),
        StructField("pack_id", LongType()),
        StructField("pack_offset", LongType()),
        StructField("oversize", LongType()),  # 0/1 (arrow-friendly)
    ])

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # several streams can hash into one Spark partition; rows
        # arrive sorted (__part__, id), so resetting state on a stream
        # change keeps every stream's packing independent of which
        # Spark partition hosts it (== independent of cluster layout)
        pack_id, used = 0, 0
        started = False
        cur_part = None
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            lens = pdf["__len__"].to_numpy()
            parts = pdf["__part__"].to_numpy()
            rows = {id_col: ids, "n_tokens": lens,
                    "pack_part": parts,
                    "pack_id": [], "pack_offset": [], "oversize": []}
            for p, n in zip(parts, lens):
                if p != cur_part:
                    cur_part = p
                    pack_id, used, started = 0, 0, False
                n = int(n)
                over = 1 if n > capacity else 0
                if over:
                    # oversize doc: its own window, then a fresh one
                    if started:
                        pack_id += 1
                    rows["pack_id"].append(pack_id)
                    rows["pack_offset"].append(0)
                    rows["oversize"].append(1)
                    pack_id += 1
                    used, started = 0, False
                    continue
                if started and used + n > capacity:
                    pack_id += 1
                    used = 0
                rows["pack_id"].append(pack_id)
                rows["pack_offset"].append(used)
                rows["oversize"].append(0)
                used += n
                started = True
            yield pd.DataFrame(rows)

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(length_col).cast("long").alias("__len__"),
        F.pmod(F.col(id_col).cast("long"), F.lit(partitions))
         .cast("long").alias("__part__"))
    # one shuffle: deterministic stream assignment + in-stream id order
    arranged = (src.repartition(partitions, "__part__")
                   .sortWithinPartitions(F.asc("__part__"),
                                         F.asc(id_col)))
    return arranged.mapInPandas(pack, out_schema)


def pack_stats(packed: DataFrame, *, capacity: int) -> DataFrame:
    """Per-stream packing-efficiency report: windows, docs, fill rate
    (mean used/capacity over non-oversize windows), oversize count —
    one tiny row per stream (map-side-combined aggregates)."""
    per_pack = (packed.groupBy("pack_part", "pack_id")
                .agg(F.sum("n_tokens").alias("used"),
                     F.count(F.lit(1)).alias("docs"),
                     F.max("oversize").alias("oversize")))
    return (per_pack.groupBy("pack_part")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum("docs").alias("n_docs"),
                 F.round(F.avg(F.when(F.col("oversize") == 0,
                                      F.col("used") / capacity)), 6)
                  .alias("fill_rate"),
                 F.sum("oversize").alias("n_oversize")))
