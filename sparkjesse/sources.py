"""Table sources and input-partition enumeration.

The design target is Iceberg (`spark.read.format("iceberg")`, snapshot
ids for checkpoint lineage); this sandbox has no Iceberg runtime jar,
so the same contract is provided over parquet directories:

* ``read_table`` — format-dispatched scan (iceberg when available,
  parquet fallback).
* ``input_partitions`` — enumerate resumable input batches: Iceberg
  would expose its partition list; for parquet the data files ARE the
  partition units (one ledger row per file group, matching the
  checkpoint contract "per Iceberg partition").
* ``read_partition`` — scan one enumerated batch.
* ``snapshot_id`` — lineage token for the ledger: Iceberg snapshot id,
  or a digest of (file name, size) pairs for parquet — any data change
  changes the token, forcing re-validation on resume.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path_or_table: str, *,
               fmt: str = "auto") -> DataFrame:
    if fmt == "iceberg" or (fmt == "auto" and not os.path.exists(
            path_or_table)):
        try:
            return spark.read.format("iceberg").load(path_or_table)
        except Exception:
            if fmt == "iceberg":
                raise
    return spark.read.parquet(path_or_table)


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, name), path))
    return sorted(out)


def input_partitions(spark: SparkSession, path: str, *,
                     files_per_batch: int = 8) -> list[str]:
    """Resumable batch ids for a parquet directory: groups of data
    files, stable across runs (sorted name order). ``files_per_batch``
    trades ledger granularity against per-batch scheduling overhead —
    at 10^12 rows you want batches of a few hundred GB."""
    files = _parquet_files(path)
    return [f"batch-{i // files_per_batch:05d}"
            for i in range(0, len(files), files_per_batch)]


def partition_files(path: str, partition_id: str, *,
                    files_per_batch: int = 8) -> list[str]:
    files = _parquet_files(path)
    idx = int(partition_id.split("-")[1])
    start = idx * files_per_batch
    return files[start:start + files_per_batch]


def read_partition(spark: SparkSession, path: str, partition_id: str, *,
                   files_per_batch: int = 8) -> DataFrame:
    members = partition_files(path, partition_id,
                              files_per_batch=files_per_batch)
    return spark.read.parquet(*[os.path.join(path, m) for m in members])


def snapshot_id(path: str) -> str:
    """Lineage token: digest of (relative name, size) of every data
    file — the parquet stand-in for an Iceberg snapshot id."""
    h = hashlib.sha256()
    for rel in _parquet_files(path):
        st = os.stat(os.path.join(path, rel))
        h.update(f"{rel}:{st.st_size};".encode())
    return h.hexdigest()[:16]


def write_bucketed(df: DataFrame, table_name: str, *,
                   bucket_col: str = "doc_id", buckets: int = 64,
                   sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a HASH-BUCKETED table: files are laid out by
    ``hash(bucket_col) % buckets`` and the layout is recorded in the
    catalog, so two tables bucketed the same way join — and a single
    table aggregates on the bucket key — WITHOUT an exchange. At the
    10^12-row design point this is the lever for repeated doc_id
    joins (annotated docs ⋈ violations ⋈ media assets): the shuffle is
    paid once at write time, never again per query. ``sort_col``
    additionally sorts within buckets so sort-merge joins skip their
    sort. (Iceberg's bucket partition transform plays the same role;
    the sandbox catalog uses Spark's native bucketing over parquet.)"""
    w = df.write.mode(mode).bucketBy(buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def write_range_sorted(df: DataFrame, path: str, *,
                       sort_col: str, partitions: int = 64,
                       mode: str = "overwrite") -> None:
    """Persist GLOBALLY range-sorted output: rows are range-partitioned
    on ``sort_col`` (sampled range boundaries → one exchange) and
    sorted within each partition, so file k's values all precede file
    k+1's. Two scale effects at 10^12 rows: (1) parquet min/max zone
    maps become perfectly selective — a point/range predicate on
    ``sort_col`` prunes to O(1) files instead of scanning everything;
    (2) downstream consumers get merge-ready sorted runs without a
    global sort of their own. This is the parquet stand-in for
    Iceberg's sort-order table property. Unlike ``orderBy`` +
    ``coalesce(1)`` (a single-reducer anti-pattern), every partition
    writes in parallel."""
    (df.repartitionByRange(partitions, sort_col)
       .sortWithinPartitions(sort_col)
       .write.mode(mode).parquet(path))
