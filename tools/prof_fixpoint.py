#!/usr/bin/env python
"""Profile the forced distributed fixpoint at a given SF dir.

Usage: python tools/prof_fixpoint.py [sf_dir] [cpus]
Prints the canonicalize metrics dict (t_prep_s / t_loop_s / t_mux_s /
iterations_log) plus total wall — the feedback loop for mux-tail work.
"""
import json
import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.ops.triples_view import build_triples  # noqa: E402
from blabel_spark.spark_util import get_spark  # noqa: E402

spark = get_spark("prof-fixpoint", cpus=cpus)
triples = build_triples(spark, sf_dir).localCheckpoint(True)
n = triples.count()
# warm the JVM/JIT the same way bench.py does (auto route runs first
# there), so fixpoint numbers are comparable run to run
t0 = time.time()
warm = canonicalize(spark, triples)
warm.labelled.write.format("noop").mode("overwrite").save()
warm_wall = round(time.time() - t0, 3)
t0 = time.time()
res = canonicalize(spark, triples, route="fixpoint")
res.labelled.write.format("noop").mode("overwrite").save()
wall = round(time.time() - t0, 3)
print(json.dumps({"n_triples": n, "wall_s": wall,
                  "auto_wall_s": warm_wall,
                  "triples_per_sec": round(n / wall, 1),
                  **res.metrics}, default=str))
