#!/usr/bin/env python
"""One timed run of a benchmark class in a fresh process, against whatever
``blabel_spark`` PYTHONPATH resolves — the child half of the interleaved
A/B protocol (tools/ab_run.py).  Prints ONE JSON line.

Classes:
  deep      4000 chains x diameter 26 -> ~13 colour rounds (the loop
            machinery benchmark; graphs are tiny so route must be forced)
  fixpoint  forced distributed fixpoint over the derived sf-dir corpus
            (prep + 1-2 rounds + mux tail; t_mux is the tail metric)

Env: AB_CPUS (32), AB_CHAINS (4000), AB_SF_DIR (/root/testdata/sf0.1).
A smaller warm-up pass of the same class runs first so JIT/session warmup
never lands in the timed window (the round-2 protocol).
"""
import hashlib
import json
import os
import sys
import time

klass = sys.argv[1] if len(sys.argv) > 1 else "deep"
cpus = int(os.environ.get("AB_CPUS", "32"))

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.spark_util import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def labels_md5(res):
    rows = sorted(map(tuple, res.labels.collect()))
    return hashlib.md5(repr(rows).encode()).hexdigest()


spark = get_spark("ab-child", cpus=cpus)

if klass == "deep":
    from blabel_spark.synthetic import chain

    def build(n_chains):
        rows = []
        for i in range(n_chains):
            rows.extend((f"chain-{i}", s, p, o)
                        for s, p, o in chain(26, tag=f"c{i}_"))
        df = spark.createDataFrame(
            rows, "graph_id string, subj string, pred string, obj string"
        ).localCheckpoint(True)
        df.count()
        return df

    warm = build(400)
    noop(canonicalize(spark, warm, route="fixpoint").labelled)

    deep = build(int(os.environ.get("AB_CHAINS", "4000")))
    n = deep.count()
    t0 = time.time()
    res = canonicalize(spark, deep, route="fixpoint")
    noop(res.labelled)
    wall = round(time.time() - t0, 3)
    rounds = [e["t_round_s"] for e in res.metrics["iterations_log"]]
    out = {"class": "deep", "n_triples": n, "wall_s": wall,
           "triples_per_sec": round(n / wall, 1),
           "iters": res.metrics["colour_iterations"],
           "round_s_min": min(rounds), "round_s_max": max(rounds),
           "t_prep_s": res.metrics["t_prep_s"],
           "t_loop_s": res.metrics["t_loop_s"],
           "t_mux_s": res.metrics.get("t_mux_s"),
           "labels_md5": labels_md5(res)}
elif klass == "fixpoint":
    from blabel_spark.ops.triples_view import build_triples
    sf_dir = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
    warm = build_triples(spark, "/root/testdata/sf0.01").localCheckpoint(True)
    warm.count()
    noop(canonicalize(spark, warm, route="fixpoint").labelled)

    triples = build_triples(spark, sf_dir).localCheckpoint(True)
    n = triples.count()
    t0 = time.time()
    res = canonicalize(spark, triples, route="fixpoint")
    noop(res.labelled)
    wall = round(time.time() - t0, 3)
    out = {"class": "fixpoint", "sf_dir": sf_dir, "n_triples": n,
           "wall_s": wall, "triples_per_sec": round(n / wall, 1),
           "t_prep_s": res.metrics["t_prep_s"],
           "t_loop_s": res.metrics["t_loop_s"],
           "t_leaf_kernel_s": res.metrics["t_leaf_kernel_s"],
           "t_comp_mux_s": res.metrics["t_comp_mux_s"],
           "t_mux_s": res.metrics["t_mux_s"],
           "labels_md5": labels_md5(res)}
else:
    raise SystemExit(f"unknown class {klass}")

print(json.dumps(out))
