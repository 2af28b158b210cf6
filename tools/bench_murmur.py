#!/usr/bin/env python
"""Hash-family cost on a HIGH-VOCABULARY corpus: md5 (codegen) vs
murmur3_128 (JVM UDF via the companion jar; Arrow fallback when absent).

The sf corpora repeat terms heavily, which flatters any memoized Python
path; this bench derives the sf0.1 triples view and rewrites every term
to a unique-ified variant (~10x the distinct-term count) so static
hashing pays full per-distinct cost, then times full canonicalization
under both families (forced fixpoint — the route where static hashing
is a per-term column expression).

Usage: python tools/bench_murmur.py [sf_dir] [cpus]
Prints one JSON line: {"md5": s, "murmur3_128": s, "ratio": r, ...}
"""
import json
import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blabel_spark.canon.distributed import canonicalize  # noqa: E402
from blabel_spark.ops.triples_view import build_triples  # noqa: E402
from blabel_spark.spark_util import get_spark  # noqa: E402

spark = get_spark("bench-murmur", cpus=cpus)
base = build_triples(spark, sf_dir)


def unique_ify(c):
    """Ground terms made ~unique per row (suffix = row hash) — bnodes
    keep their names so graph structure and routing are unchanged."""
    h = F.abs(F.xxhash64("graph_id", "subj", "pred", "obj")) % 100_000_000
    return F.when(F.col(c).startswith("_:"), F.col(c)) \
            .otherwise(F.concat(F.col(c), F.lit("#u"), h.cast("string")))


triples = base.select("graph_id", unique_ify("subj").alias("subj"),
                      unique_ify("pred").alias("pred"),
                      unique_ify("obj").alias("obj")).localCheckpoint(True)
n = triples.count()
n_terms = triples.select(
    F.countDistinct("subj") + F.countDistinct("pred")
    + F.countDistinct("obj")).collect()[0][0]
base_terms = base.select(
    F.countDistinct("subj") + F.countDistinct("pred")
    + F.countDistinct("obj")).collect()[0][0]

out = {"n_triples": n, "distinct_terms": int(n_terms),
       "base_distinct_terms": int(base_terms), "cpus": cpus}
# warm the JVM once
canonicalize(spark, triples, route="fixpoint") \
    .labelled.write.format("noop").mode("overwrite").save()
for fam in ("md5", "murmur3_128", "md5"):
    t0 = time.time()
    res = canonicalize(spark, triples, route="fixpoint", hash_name=fam)
    res.labelled.write.format("noop").mode("overwrite").save()
    key = fam if fam not in out else fam + "_2"
    out[key] = round(time.time() - t0, 2)
out["md5_best"] = min(out["md5"], out["md5_2"])
out["ratio_vs_md5"] = round(out["murmur3_128"] / out["md5_best"], 3)
print(json.dumps(out))
