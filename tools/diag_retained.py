#!/usr/bin/env python
"""Diagnose the sf1 deep-loop degradation: does retained block-manager
state from a finished big canonicalize (checkpoint blocks + broadcasts
held alive by the still-referenced result plans) degrade a subsequent
fixpoint loop in the same JVM?

Phase 1 replicates sf1_run.py's prelude (9.15M-triple fixpoint), phase 2
runs the 40k-chain deep class and prints the in-order per-round log.
With ``cleanup`` in argv, phase 1's state is explicitly released first
(drop refs, unpersist every persistent RDD, JVM GC) — flat rounds in the
cleanup variant and growing rounds without it confirm the retained-state
root cause.

Usage: PYTHONPATH=/root/repo python tools/diag_retained.py 32 [cleanup]
"""
import gc
import json
import os
import sys
import time

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
do_cleanup = "cleanup" in sys.argv[2:]
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from pyspark.sql import functions as F  # noqa: E402

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.ops.triples_view import build_triples  # noqa: E402
from blabel_spark.spark_util import get_spark  # noqa: E402

spark = get_spark("diag-retained", cpus=cpus)
jsc = spark.sparkContext._jsc


def storage():
    infos = spark._jsparkSession.sparkContext().getRDDStorageInfo()
    return {"n_rdds": len(infos),
            "mem_mb": round(sum(i.memSize() for i in infos) / 2**20, 1),
            "disk_mb": round(sum(i.diskSize() for i in infos) / 2**20, 1)}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


base = build_triples(spark, "/root/testdata/sf0.1")
corpus = (base.select(
    F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r"), "*")
    .select(F.concat(F.lit("r"), F.col("r").cast("string"), F.lit("_"),
                     "graph_id").alias("graph_id"),
            "subj", "pred", "obj")
    .localCheckpoint(True))
corpus.count()

t0 = time.time()
res_fix = canonicalize(spark, corpus, route="fixpoint")
noop(res_fix.labelled)
print(json.dumps({"phase": "prelude", "wall_s": round(time.time() - t0, 3),
                  "storage": storage()}), flush=True)

if do_cleanup:
    del res_fix, corpus, base
    gc.collect()
    for jrdd in jsc.getPersistentRDDs().values():
        jrdd.unpersist(False)
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    print(json.dumps({"phase": "cleanup", "storage": storage()}),
          flush=True)

n_chains = 40_000
deep = (spark.range(n_chains).select(
    F.concat(F.lit("chain-"), F.col("id").cast("string")).alias("graph_id"),
    F.col("id").cast("string").alias("i"),
    F.explode(F.sequence(F.lit(0), F.lit(25))).alias("j"))
    .select("graph_id",
            F.concat(F.lit("_:c"), "i", F.lit("_n"),
                     F.col("j").cast("string")).alias("subj"),
            F.lit("<p>").alias("pred"),
            F.concat(F.lit("_:c"), "i", F.lit("_n"),
                     (F.col("j") + 1).cast("string")).alias("obj"))
    .localCheckpoint(True))
n_deep = deep.count()
t0 = time.time()
res_deep = canonicalize(spark, deep, route="fixpoint")
noop(res_deep.labelled)
out = {"phase": "deep", "cleanup": do_cleanup, "n_triples": n_deep,
       "wall_s": round(time.time() - t0, 3),
       "rounds": [{k: e.get(k) for k in
                   ("iteration", "t_round_s", "n_jobs", "n_stages")}
                  for e in res_deep.metrics["iterations_log"]],
       "storage_after": storage()}
print(json.dumps(out), flush=True)
