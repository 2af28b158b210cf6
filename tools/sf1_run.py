#!/usr/bin/env python
"""sf1-scale (~9.15M triples) headline run — the first 10× datum beyond
sf0.1 (memory headroom, AQE behaviour on real shuffle sizes).

No sf1 parquet exists in the sandbox, so the corpus is derived
deterministically from sf0.1: the triples view replicated 10× with a
copy-prefixed graph_id (graphs are the canonicalizer's unit, and bnode
keys are interned per (graph_id, term), so each copy is an independent
isomorphic graph — exactly what a 10× corpus of conversation-sized
documents looks like).  The deep class likewise scales to 40k chains
(1.04M triples, 13 colour rounds), generated Spark-side.

Prints one JSON line; also runs a metamorphic TEST spot-check
(corpus_variants route-parity) on a sample and reports its status counts.

Usage: SPARK_DRIVER_MEMORY=32g python tools/sf1_run.py [cpus]
"""
import json
import os
import sys
import time

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

from pyspark.sql import functions as F  # noqa: E402

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.ops.triples_view import build_triples  # noqa: E402
from blabel_spark.spark_util import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("sf1-run", cpus=cpus)
out = {"cpus": cpus,
       "driver_memory": os.environ["SPARK_DRIVER_MEMORY"]}

base = build_triples(spark, "/root/testdata/sf0.1")
corpus = (base.select(
    F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r"), "*")
    .select(F.concat(F.lit("r"), F.col("r").cast("string"), F.lit("_"),
                     "graph_id").alias("graph_id"),
            "subj", "pred", "obj")
    # a real 100 TB scan arrives with thousands of input splits; the 10x
    # explode of a 6-partition sf0.1 scan does not — spread the derived
    # corpus across the cores once so prep's pre-shuffle passes (probe,
    # CC map side) run at core-count parallelism, as they would at scale
    .repartition(cpus)
    .localCheckpoint(True))
n = corpus.count()
out["n_triples"] = n

def storage_mb():
    infos = spark._jsparkSession.sparkContext().getRDDStorageInfo()
    return round(sum(i.memSize() for i in infos) / 2**20, 1)


t0 = time.time()
res_auto = canonicalize(spark, corpus)
noop(res_auto.labelled)
out["auto_wall_s"] = round(time.time() - t0, 3)
out["auto_tps"] = round(n / out["auto_wall_s"], 1)
# session hygiene between phases: a consumed result's checkpoint blocks
# are dead weight for the rest of the session
out["storage_mb_before_release"] = storage_mb()
res_auto.unpersist()

t0 = time.time()
res_fix = canonicalize(spark, corpus, route="fixpoint")
noop(res_fix.labelled)
out["fixpoint_wall_s"] = round(time.time() - t0, 3)
out["fixpoint_tps"] = round(n / out["fixpoint_wall_s"], 1)
out["fixpoint_phases"] = {
    k: res_fix.metrics[k]
    for k in ("t_prep_s", "t_loop_s", "t_leaf_kernel_s",
              "t_comp_mux_s", "t_mux_s")}
out["fixpoint_iterations"] = res_fix.metrics["colour_iterations"]
res_fix.unpersist()
out["storage_mb_after_release"] = storage_mb()

# deep class at 10x: 40k chains x diameter 26 -> 13 rounds, 1.04M triples
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
out["deep_n_triples"] = n_deep
out["deep_wall_s"] = round(time.time() - t0, 3)
out["deep_tps"] = round(n_deep / out["deep_wall_s"], 1)
out["deep_iterations"] = res_deep.metrics["colour_iterations"]
out["deep_round_s"] = [e["t_round_s"]
                       for e in res_deep.metrics["iterations_log"]]
out["deep_round_stages"] = sorted({e.get("n_stages")
                                   for e in
                                   res_deep.metrics["iterations_log"]})
res_deep.unpersist()

# metamorphic route-parity spot check on a corpus sample (cli `test`
# machinery): 20 graphs x 4 variants through BOTH engine routes
from blabel_spark.testing import metamorphic_report  # noqa: E402
sample_ids = [r["graph_id"] for r in
              corpus.select("graph_id").distinct().limit(20).collect()]
sample = corpus.where(F.col("graph_id").isin(sample_ids))
rep = metamorphic_report(spark, sample, lean=False).localCheckpoint(True)
out["metamorphic_status"] = {
    r["status"]: r["n"]
    for r in rep.groupBy("status").agg(F.count("*").alias("n")).collect()}

print(json.dumps(out))
