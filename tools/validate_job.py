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

    def process(pid: str) -> dict:
        docs = sources.read_partition(spark, args.input, pid)
        skew = detect_hot_keys(docs, "doc_id")
        res = engine.validate(docs, schema)
        # violations are written map-side from the input partitions;
        # only the narrow (doc_id, valid) pairs shuffle for the
        # key-aligned summary
        res.key_aligned_summary(args.partitions, skew=skew) \
           .write.mode("overwrite").parquet(f"{args.output}/summary/{pid}")
        res.violations.write.mode("overwrite") \
           .parquet(f"{args.output}/violations/{pid}")
        row = (res.annotated
               .agg(F.count(F.lit(1)).alias("docs"),
                    F.sum((~F.col("valid")).cast("long")).alias("fail"))
               .collect()[0])
        return {"docs": int(row["docs"]), "fail": int(row["fail"] or 0)}

    pids = sources.input_partitions(spark, args.input)
    if args.checkpoint:
        ledger = CheckpointLedger(args.checkpoint)
        out = run_with_checkpoints(
            pids, process, ledger,
            plan=plan_hash(schema),
            snapshot=sources.snapshot_id(args.input))
        rows = ledger.metrics_rows()
        total = {"docs": sum(r["metrics"].get("docs", 0) for r in rows
                             if r["status"] == "done"),
                 "fail": sum(r["metrics"].get("fail", 0) for r in rows
                             if r["status"] == "done")}
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
