#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries into
plans/r06/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans.py <tag> [query ...]

Queries that RUN the engine while building their DataFrame (the
canonicalize family executes the fixpoint loop eagerly) are captured as
the explain of the RETURNED DataFrame — the iterative state is
checkpointed, so the plan shows the consumer-side shape (joins, folds,
exchanges of the final assembly), which is what the per-query plan diff
tracks.  The in-loop per-round plan is additionally captured for the
canonical fixpoint under <query>__round_<tag>.txt via the canon metrics
hook.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from blabel_spark.queries import QUERIES
    from blabel_spark.spark_util import get_spark
    spark = get_spark("plan-capture")
    if not names:
        names = list(QUERIES)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # pragma: no cover
            plan = f"ERROR capturing {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
