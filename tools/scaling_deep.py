#!/usr/bin/env python
"""Deep-fixpoint scaling: the multi-round colour loop at two parallelism
levels (the replicated-corpus protocol in scaling_bench.py converges in
ONE iteration, so it times the pipeline, not the loop).

Corpus: N_CHAINS directed bnode chains of diameter 26 (13 refinement
rounds), generated distributively (range + sequence explode — no
driver-side rows).  Protocol matches scaling_bench.py: same input, fixed
shuffle partitions, interleaved level rounds, per-level minimum.

Usage: python tools/scaling_deep.py          # orchestrate, print JSON
       python tools/scaling_deep.py --child N
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CHAINS = int(os.environ.get("SPARK_GRAFT_DEEP_CHAINS", "8000"))
LEVELS = tuple(int(x) for x in
               os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(","))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))


def child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from blabel_spark.canon.distributed import canonicalize
    from blabel_spark.spark_util import get_spark
    spark = get_spark(f"deep-scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=32)
    chains = spark.range(N_CHAINS).select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(24))).alias("i"))
    deep = chains.select(
        F.concat(F.lit("chain-"), "id").alias("graph_id"),
        F.concat(F.lit("_:c"), "id", F.lit("_n"), "i").alias("subj"),
        F.lit("<p>").alias("pred"),
        F.concat(F.lit("_:c"), "id", F.lit("_n"), F.col("i") + 1)
        .alias("obj")).localCheckpoint(True)
    n = deep.count()
    t0 = time.time()
    res = canonicalize(spark, deep, route="fixpoint")
    res.labelled.write.format("noop").mode("overwrite").save()
    secs = round(time.time() - t0, 2)
    print(json.dumps({
        "cpus": cpus, "n_triples": n, "secs": secs,
        "triples_per_sec": round(n / secs, 1),
        "iterations": res.metrics["colour_iterations"]}))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    raw = []
    for _ in range(REPEATS):
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, __file__, "--child", str(cpus)],
                capture_output=True, text=True, check=True,
                env={**os.environ, "PYTHONPATH": os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))})
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            raw.append(json.loads(line))
    # summary from explicitly chosen fields only (see scaling_bench.py:
    # copying the min run's dict can mix fields from different runs)
    results = {}
    for cpus in LEVELS:
        runs = [r for r in raw if r["cpus"] == cpus]
        secs = min(r["secs"] for r in runs)
        results[cpus] = {
            "cpus": cpus,
            "n_triples": runs[0]["n_triples"],
            "iterations": runs[0]["iterations"],
            "secs": secs,
            "triples_per_sec": round(runs[0]["n_triples"] / secs, 1),
        }
    n, n4 = LEVELS
    speedup = results[n]["secs"] / results[n4]["secs"]
    print(json.dumps({
        "protocol": f"deep fixpoint ({results[n]['iterations']} colour "
                    f"iterations), local[{n}] vs local[{n4}], "
                    f"{REPEATS} interleaved rounds, per-level minimum",
        "n_chains": N_CHAINS,
        "runs": results,
        "raw_runs": raw,
        "speedup": round(speedup, 2),
        "scaling_efficiency": round(speedup / (n4 / n), 3),
    }))


if __name__ == "__main__":
    main()
