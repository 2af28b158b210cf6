#!/usr/bin/env python
"""spark-submit entry point for the transcript → knowledge-graph job
(north_rule: "ships via spark-submit --py-files").

    zip -r /tmp/blabel_spark.zip blabel_spark
    spark-submit --master <cluster> --py-files /tmp/blabel_spark.zip \
        jobs/build_kg.py --transcripts <parquet dir> --out <dir> \
        [--checkpoint <dir>] [--lean] [--hash md5]

Reads the transcript table (conv_id, turn_idx, role, text, tool, ts),
extracts (subj, pred, obj) triples, optionally leans each conversation
graph, canonicalizes blank-node labels (auto-routed; mid-fixpoint
checkpoint/resume when --checkpoint is given), and materializes the
partitioned triple table + per-partition lineage/metrics + snapshot
manifest via sources.io.materialize_kg.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="build_kg")
    ap.add_argument("--transcripts", required=True,
                    help="input transcript parquet dir")
    ap.add_argument("--out", required=True, help="output KG dir")
    ap.add_argument("--checkpoint", default=None,
                    help="fixpoint checkpoint dir (forces the resumable "
                         "fixpoint route)")
    ap.add_argument("--lean", action="store_true")
    ap.add_argument("--hash", default="md5")
    args = ap.parse_args(argv)

    # spark-submit owns master/deploy config; --py-files ships the package
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("blabel-build-kg")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from blabel_spark.canon.distributed import canonicalize
    from blabel_spark.datagen import gazetteer
    from blabel_spark.extract.pipeline import extract_triples
    from blabel_spark.sources.io import materialize_kg

    transcripts = spark.read.parquet(args.transcripts)
    triples = extract_triples(spark, transcripts, gazetteer())
    if args.lean:
        from blabel_spark.lean.distributed import lean_graphs
        triples, _witness = lean_graphs(spark, triples)
    res = canonicalize(spark, triples, hash_name=args.hash,
                       checkpoint_dir=args.checkpoint)
    run_id = materialize_kg(spark, res.labelled, triples, args.out,
                            {k: v for k, v in res.metrics.items()
                             if isinstance(v, (int, float, str))})
    print(json.dumps({"run_id": run_id, "metrics": {
        k: v for k, v in res.metrics.items()
        if isinstance(v, (int, float, str))}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
