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
    from sparkjesse.partitioning import salted_repartition

    spark = SparkSession.builder.appName("sparkjesse-validate").getOrCreate()
    if args.schema_json:
        with open(args.schema_json, encoding="utf-8") as fh:
            schema = json.load(fh)
    else:
        schema = INTERLEAVED_SCHEMA

    docs = spark.read.parquet(args.input)
    docs = salted_repartition(docs, "doc_id", args.partitions) \
        .drop("__salt__")
    engine = ValidationEngine()

    def process(_pid: str) -> dict:
        res = engine.validate(docs, schema)
        res.summary.write.mode("overwrite") \
           .parquet(f"{args.output}/summary")
        res.violations.write.mode("overwrite") \
           .parquet(f"{args.output}/violations")
        row = (res.annotated
               .agg(F.count(F.lit(1)).alias("docs"),
                    F.sum((~F.col("valid")).cast("long")).alias("fail"))
               .collect()[0])
        return {"docs": int(row["docs"]), "fail": int(row["fail"] or 0)}

    if args.checkpoint:
        ledger = CheckpointLedger(args.checkpoint)
        out = run_with_checkpoints(
            [args.input], process, ledger,
            plan=plan_hash(schema), snapshot=args.input)
        print(json.dumps({"resume": out,
                          "metrics": ledger.metrics_rows()[-1]["metrics"]}))
    else:
        print(json.dumps(process(args.input)))


if __name__ == "__main__":
    main()
