"""Distributed leaning: per-graph core computation.

The reference processes corpora one document at a time through its leaning
stack (RunNQuadsTest.java:257-451); the Spark translation keeps that shape:
conversations/documents are embarrassingly parallel, each graph's core is
computed whole-graph inside one Arrow-batched ``applyInPandas`` group.
Leaning cannot be decomposed per bnode-component (a component can map into
a DIFFERENT component of the same graph — e.g. an edge folding into a
longer chain), so the group key is graph_id, not (graph_id, comp).

For graphs too large for one task, the join-based trivial-non-lean filter
(the q_trivial_nonlean query, SURVEY J5) distributes as a pre-pass; the
residual search still runs per graph — same trade-off as the canonical
labeller's branch-and-bound kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OUT_SCHEMA = ("graph_id string, kind string, a string, b string, c string")


def _kernel_fn(budget: int):
    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from blabel_spark.lean.local import LeanBudgetExceeded, lean_graph
        graph_id = pdf["graph_id"].iloc[0]
        triples = list(zip(pdf["subj"], pdf["pred"], pdf["obj"]))
        rows = []
        try:
            res = lean_graph(triples, budget=budget)
            for s, p, o in res.lean:
                rows.append((graph_id, "t", s, p, o))
            for k, v in sorted(res.core_map.items()):
                rows.append((graph_id, "w", k, v, ""))
        except LeanBudgetExceeded:
            # over-budget graphs are flagged and re-routed to the
            # distributed BFS join-chain solver by lean_graphs (the
            # reference escalates through its leaning configs the same
            # way; per-document timeout reporting at
            # RunNQuadsTest.java:296-320)
            for s, p, o in sorted(set(triples)):
                rows.append((graph_id, "t", s, p, o))
            rows.append((graph_id, "w", "__budget_exceeded__", "", ""))
        return pd.DataFrame(rows,
                            columns=["graph_id", "kind", "a", "b", "c"])
    return _kernel


def lean_graphs(spark: SparkSession, triples: DataFrame,
                bfs_fallback: bool = True,
                kernel_budget: int = 200_000,
                bfs_max_rows: int = 2_000_000
                ) -> tuple[DataFrame, DataFrame]:
    """Returns (lean_triples, witness) DataFrames.

    lean_triples: (graph_id, subj, pred, obj) — the per-graph cores.
    witness:      (graph_id, bnode, target) — complete core maps.

    Graphs whose DFS kernel search exceeds its budget (combinatorially
    hard, not merely large) are re-run through the distributed BFS
    join-chain solver (lean.bfs) when ``bfs_fallback`` — its huge
    partial-solution table is sharded across executors, which is exactly
    the resource the single-task kernel lacks.  A graph that exhausts
    BOTH budgets passes through unleaned with a ``__budget_exceeded__``
    witness row.
    """
    out = (triples.select("graph_id", "subj", "pred", "obj")
           .groupBy("graph_id")
           .applyInPandas(_kernel_fn(kernel_budget), _OUT_SCHEMA)
           ).localCheckpoint(True)
    lean = (out.where(F.col("kind") == "t")
            .select("graph_id", F.col("a").alias("subj"),
                    F.col("b").alias("pred"), F.col("c").alias("obj")))
    witness = (out.where(F.col("kind") == "w")
               .select("graph_id", F.col("a").alias("bnode"),
                       F.col("b").alias("target")))

    over = [r["graph_id"] for r in
            out.where((F.col("kind") == "w")
                      & (F.col("a") == "__budget_exceeded__"))
            .select("graph_id").distinct().collect()]
    if over and bfs_fallback:
        from blabel_spark.lean.bfs import BFSBudgetExceeded, bfs_lean_graph
        lean = lean.where(~F.col("graph_id").isin(over))
        witness = witness.where(~F.col("graph_id").isin(over))
        extra_lean, extra_wit = [], []
        for g in sorted(over):
            gtri = triples.where(F.col("graph_id") == g) \
                          .select("subj", "pred", "obj")
            try:
                lean_df, core = bfs_lean_graph(spark, gtri,
                                               max_rows=bfs_max_rows)
                extra_lean.append(lean_df.select(
                    F.lit(g).alias("graph_id"), "subj", "pred", "obj"))
                extra_wit.extend((g, k, v) for k, v in sorted(core.items()))
            except BFSBudgetExceeded:
                extra_lean.append(gtri.dropDuplicates().select(
                    F.lit(g).alias("graph_id"), "subj", "pred", "obj"))
                extra_wit.append((g, "__budget_exceeded__", ""))
        for df in extra_lean:
            lean = lean.union(df)
        if extra_wit:
            witness = witness.union(spark.createDataFrame(
                extra_wit, "graph_id string, bnode string, target string"))
    return lean, witness
