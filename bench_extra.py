#!/usr/bin/env python
"""Extra measurements for the optimization round (bench.py is FROZEN).

Noop-sink isolation per query (guide §1.4) with per-query job labels
(guide §1.5), repeated N times in ONE session, minima and medians
reported.  Usage:

    python bench_extra.py [reps] [query ...]

Prints one JSON line per rep and a summary.  Also times the canonicalize
family exactly as bench.py does (same construction, same localCheckpoint
staging) so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from blabel_spark.canon.distributed import canonicalize
    from blabel_spark.ops.triples_view import build_triples
    from blabel_spark.queries import QUERIES
    from blabel_spark.spark_util import get_spark

    spark = get_spark("blabel-bench-extra")
    sc = spark.sparkContext

    canon_family = {
        "canonicalize_full": None, "canonicalize_fixpoint": None,
        "canonicalize_fixpoint_deep": None,
    }
    triples = None
    deep = None

    def run_query(name: str) -> float:
        nonlocal triples, deep
        sc.setJobDescription(f"bench_extra: {name}")
        if name in canon_family:
            if triples is None:
                triples = build_triples(spark, sf_dir).localCheckpoint(True)
                triples.count()
            if name == "canonicalize_full":
                t0 = time.time()
                res = canonicalize(spark, triples)
                force(res.labelled)
                dt = time.time() - t0
                res.unpersist()
                return dt
            if name == "canonicalize_fixpoint":
                t0 = time.time()
                res = canonicalize(spark, triples, route="fixpoint")
                force(res.labelled)
                dt = time.time() - t0
                _last_metrics[name] = res.metrics
                res.unpersist()
                return dt
            if name == "canonicalize_fixpoint_deep":
                if deep is None:
                    from blabel_spark.synthetic import chain
                    n_chains = max(int(4000 * (sf / 0.1)), 50)
                    rows = []
                    for i in range(n_chains):
                        rows.extend((f"chain-{i}", s, p, o)
                                    for s, p, o in chain(26, tag=f"c{i}_"))
                    deep = spark.createDataFrame(
                        rows,
                        "graph_id string, subj string, pred string, obj string"
                    ).localCheckpoint(True)
                    deep.count()
                t0 = time.time()
                res = canonicalize(spark, deep, route="fixpoint")
                force(res.labelled)
                dt = time.time() - t0
                _last_metrics[name] = res.metrics
                res.unpersist()
                return dt
        t0 = time.time()
        force(QUERIES[name](spark, sf_dir))
        return time.time() - t0

    names = only or (list(canon_family) + [
        "wl_refinement_round", "connected_components", "graph_dup_census",
        "trivial_nonlean", "pricing_summary", "top_revenue_orders",
        "customer_nation_rollup", "exact_dedup", "minhash_signatures",
        "lsh_candidate_pairs", "simhash", "token_stats", "lang_id",
        "knn_brute_force", "lsh_bucket_stats", "dedup_keepers",
        "stratified_sample"])

    _last_metrics: dict = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        rep = {}
        for n in names:
            dt = round(run_query(n), 3)
            rep[n] = dt
            samples[n].append(dt)
        print(json.dumps({"rep": r, "queries": rep}))
        sys.stdout.flush()
    summary = {n: {"min": min(v), "med": sorted(v)[len(v) // 2]}
               for n, v in samples.items()}
    print(json.dumps({"summary": summary, "sf": sf}))
    if _last_metrics:
        print(json.dumps({"canon_metrics": {
            k: {kk: vv for kk, vv in m.items() if kk != "iterations_log"}
            for k, m in _last_metrics.items()}}, default=str))
        for k, m in _last_metrics.items():
            if "iterations_log" in m:
                print(json.dumps({k + "_iterations": m["iterations_log"]},
                                 default=str))


if __name__ == "__main__":
    main()
