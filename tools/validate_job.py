"""spark-submit entry point: validate an interleaved-docs table.

    spark-submit --py-files dist/sparkjesse.zip tools/validate_job.py \
        --input /path/to/docs_parquet --output /path/to/out \
        [--checkpoint /path/to/ledger] [--partitions 256]

Reads the interleaved table, applies salted skew-aware repartitioning
on hash(doc_id), validates with the full draft4 constraint set,
writes the per-partition summary + exploded violations as parquet, and
records one checkpoint-ledger row per input partition batch so a killed
run resumes where it left off (north rule). Only ``sparkjesse`` from
the --py-files zip is imported — no repo-path assumptions.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--manifest", default=None,
                    help="manifest JSON path → incremental lineage: "
                         "batch membership is frozen at first sight, so "
                         "a resumed run after an append validates ONLY "
                         "the new/changed batches (requires "
                         "--checkpoint)")
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--schema-json", default=None,
                    help="path to a JSON-Schema file; default: the "
                         "interleaved draft4 constraint set")
    args = ap.parse_args()

    from sparkjesse.checkpoint import (CheckpointLedger, plan_hash,
                                       run_with_checkpoints)
    from sparkjesse.engine import ValidationEngine
    from sparkjesse.generator import INTERLEAVED_SCHEMA
    from sparkjesse.partitioning import detect_hot_keys
    from sparkjesse import sources

    spark = SparkSession.builder.appName("sparkjesse-validate").getOrCreate()
    if args.schema_json:
        with open(args.schema_json, encoding="utf-8") as fh:
            schema = json.load(fh)
    else:
        schema = INTERLEAVED_SCHEMA

    engine = ValidationEngine()

    manifest = None
    if args.manifest:
        if not args.checkpoint:
            ap.error("--manifest requires --checkpoint")
        manifest = sources.refresh_manifest(args.input, args.manifest)

    def process(pid: str) -> dict:
        if manifest is not None:
            docs = sources.read_manifest_partition(
                spark, args.input, manifest, pid)
        else:
            docs = sources.read_partition(spark, args.input, pid)
        # bare parquet scan — a metadata count is cheap, so cap the
        # skew-detection sample
        skew = detect_hot_keys(docs, "doc_id", target_rows=500_000)
        res = engine.validate(docs, schema)
        # single evaluation per batch: the annotated frame is persisted,
        # so the input partition is scanned + validated ONCE; the
        # summary and violations sinks both read the cache, and totals
        # come from the summary files already on disk — at the
        # 10^12-row design point re-validating per sink would triple
        # the bill
        ann = res.annotated.persist()
        try:
            res.key_aligned_summary(args.partitions, skew=skew) \
               .write.mode("overwrite") \
               .parquet(f"{args.output}/summary/{pid}")
            res.violations.write.mode("overwrite") \
               .parquet(f"{args.output}/violations/{pid}")
            row = (spark.read.parquet(f"{args.output}/summary/{pid}")
                   .agg(F.sum("docs").alias("docs"),
                        F.sum("fail").alias("fail"))
                   .collect()[0])
        finally:
            ann.unpersist()
        return {"docs": int(row["docs"] or 0), "fail": int(row["fail"] or 0)}

    if manifest is not None:
        parts = sources.manifest_partitions(manifest)
        pids = [p for p, _ in parts]
        snapshot: "str | dict" = dict(parts)
    else:
        pids = sources.input_partitions(spark, args.input)
        snapshot = sources.snapshot_id(args.input)
    if args.checkpoint:
        ledger = CheckpointLedger(args.checkpoint)
        plan = plan_hash(schema)
        out = run_with_checkpoints(pids, process, ledger,
                                   plan=plan, snapshot=snapshot)
        # totals: latest done attempt per partition of THIS lineage only
        # (old-lineage / multi-attempt rows would double-count)
        rows = ledger.lineage_metrics(plan, snapshot)
        total = {"docs": sum(r["metrics"].get("docs", 0) for r in rows),
                 "fail": sum(r["metrics"].get("fail", 0) for r in rows)}
        print(json.dumps({"resume": out, "partitions": len(pids),
                          "metrics": total}))
    else:
        totals = [process(pid) for pid in pids]
        print(json.dumps({"partitions": len(pids),
                          "metrics": {
                              "docs": sum(t["docs"] for t in totals),
                              "fail": sum(t["fail"] for t in totals)}}))


if __name__ == "__main__":
    main()
