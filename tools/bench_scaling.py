"""Scaling-efficiency evidence for the north rule (N → 4N ≥ 0.8).

The sandbox has no multi-node cluster, so the two-cluster-size criterion
is evidenced the sanctioned way: the SAME flagship job (generate the
interleaved table + full draft4 validation + per-partition summary) at
two local parallelism levels — local[8] (N) and local[32] (4N) — on
identical input, reporting throughput at both and the scaling
efficiency  eff = (docs/sec@32 / docs/sec@8) / 4.

Each run is a fresh subprocess (fresh JVM) so the two measurements don't
share warm state. Session startup is excluded from the timed region;
generation + validation + aggregation are included (that IS the job).

Writes BENCH_SCALING.json at the repo root and prints it.

Usage: python tools/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from sparkjesse.engine import ValidationEngine
from sparkjesse.generator import INTERLEAVED_SCHEMA, interleaved_documents
from sparkjesse.partitioning import salted_repartition

cores = {cores}
n_docs = {n_docs}
spark = (SparkSession.builder.master(f"local[{{cores}}]")
         .appName(f"scale-{{cores}}")
         .config("spark.sql.shuffle.partitions", str(cores * 2))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM/codegen paths on a tiny run, outside the timed region
warm = interleaved_documents(spark, 1000, seed=7, partitions=cores)
ValidationEngine().validate(warm, INTERLEAVED_SCHEMA).summary.collect()

t0 = time.perf_counter()
docs = interleaved_documents(spark, n_docs, seed=42,
                             partitions=cores * 4)
docs = salted_repartition(docs, "doc_id", cores * 4).drop("__salt__")
res = ValidationEngine().validate(docs, INTERLEAVED_SCHEMA)
row = res.summary.agg(F.sum("docs").alias("docs"),
                      F.sum("fail").alias("fail")).collect()[0]
sec = time.perf_counter() - t0
print("RESULT " + json.dumps({{"cores": cores, "sec": round(sec, 3),
  "docs": int(row["docs"]), "docs_per_sec": round(row["docs"] / sec, 1)}}))
"""


def run(cores: int, n_docs: int) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cores=cores, n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run cores={cores} failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    eff = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3)
    result = {
        "job": "interleaved generate + full draft4 validate + "
               "per-partition summary",
        "n_docs": n_docs,
        "N": r8, "4N": r32,
        "scaling_efficiency_N_to_4N": eff,
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
