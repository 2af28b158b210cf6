"""Distributed leaning: per-graph core computation.

The reference processes corpora one document at a time through its leaning
stack (RunNQuadsTest.java:257-451); the Spark translation keeps that shape:
conversations/documents are embarrassingly parallel, each graph's core is
computed whole-graph inside one Arrow-batched ``applyInPandas`` group.
Leaning cannot be decomposed per bnode-component (a component can map into
a DIFFERENT component of the same graph — e.g. an edge folding into a
longer chain), so the group key is graph_id, not (graph_id, comp).

Escalation ladder, mirroring the reference's staged stack
(GraphLeaning.java:121-140 trivial fixpoint → search):

1. ``trivial_prepass`` — the join-based trivial-non-lean filter (SURVEY
   J5, rarest-edge probing) applied DISTRIBUTED, with a simultaneity
   guard so independently-accepted mappings cannot invalidate each
   other; shrinks graphs too large for one task before any kernel sees
   them (opt-in via ``prepass_rows``).
2. the DFS kernel per graph (``applyInPandas``).
3. graphs whose kernel search exceeds its budget re-route to the BFS
   join-chain solver (lean.bfs) — the partial-solution table is the
   distributed object.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OUT_SCHEMA = ("graph_id string, kind string, a string, b string, c string")


def trivial_prepass(spark: SparkSession, triples: DataFrame,
                    max_passes: int = 8
                    ) -> tuple[DataFrame, DataFrame]:
    """Distributed trivial-non-lean elimination to (bounded) fixpoint:
    per pass, every blank node probes candidate dominators on its RAREST
    edge only (GraphLeaning.java:836-850), exact edge-set containment is
    verified on surviving pairs, and a mapping b→y is accepted only when
    neither y nor any value of b's edges is itself dominated this pass —
    simultaneously-applied mappings therefore cannot invalidate each
    other's containments (a stricter, order-free version of the local
    kernel's sequential guard, lean/local.py:96-124).

    Returns (reduced triples, witness (graph_id, bnode, target))."""
    cur = triples.select("graph_id", "subj", "pred", "obj") \
                 .dropDuplicates().localCheckpoint(True)
    wit_parts: list[DataFrame] = []
    for _ in range(max_passes):
        edges = (
            cur.select("graph_id", F.col("subj").alias("node"),
                       F.concat(F.lit("+|"), "pred", F.lit("|"), "obj")
                       .alias("e"),
                       F.col("obj").alias("val"))
            .union(cur.select("graph_id", F.col("obj").alias("node"),
                              F.concat(F.lit("-|"), "pred", F.lit("|"),
                                       "subj").alias("e"),
                              F.col("subj").alias("val")))
            .distinct()
        ).localCheckpoint(True)
        cnt = edges.groupBy("graph_id", "node").agg(F.count("*").alias("n"))
        bedges = edges.where(F.col("node").startswith("_:"))
        freq = edges.groupBy("graph_id", "e").agg(F.count("*").alias("f"))
        rare = (bedges.join(freq, ["graph_id", "e"])
                .groupBy("graph_id", "node")
                .agg(F.min_by("e", F.struct("f", "e")).alias("e"))
                .select("graph_id", F.col("node").alias("x"), "e"))
        cand = (rare.join(edges.select("graph_id",
                                       F.col("node").alias("y"), "e"),
                          ["graph_id", "e"])
                .where(F.col("x") != F.col("y"))
                .select("graph_id", "x", "y"))
        xe = bedges.select("graph_id", F.col("node").alias("x"), "e")
        ye = edges.select("graph_id", F.col("node").alias("y"), "e")
        matched = (cand.join(xe, ["graph_id", "x"])
                   .join(ye, ["graph_id", "y", "e"], "left_semi")
                   .groupBy("graph_id", "x", "y")
                   .agg(F.count("*").alias("n_match")))
        cx = cnt.select("graph_id", F.col("node").alias("x"),
                        F.col("n").alias("n_x"))
        # identical-twin rule: equal edge sets keep the smaller name
        cy = cnt.select("graph_id", F.col("node").alias("y"),
                        F.col("n").alias("n_y"))
        dom_pairs = (matched.join(cx, ["graph_id", "x"])
                     .join(cy, ["graph_id", "y"])
                     .where((F.col("n_match") == F.col("n_x"))
                            & (~((F.col("n_x") == F.col("n_y"))
                                 & F.col("y").startswith("_:")
                                 & (F.col("y") > F.col("x"))))))
        dominated = dom_pairs.select("graph_id", F.col("x").alias("b")) \
                             .distinct().localCheckpoint(True)
        if dominated.limit(1).count() == 0:
            break
        # simultaneity guard: drop (b→y) when y is dominated or any edge
        # value of b is dominated
        dset_y = dominated.select("graph_id", F.col("b").alias("y"))
        safe = dom_pairs.join(dset_y, ["graph_id", "y"], "left_anti")
        bad_vals = (bedges.select("graph_id", F.col("node").alias("x"),
                                  "val")
                    .join(dominated.select("graph_id",
                                           F.col("b").alias("val")),
                          ["graph_id", "val"], "left_semi")
                    .select("graph_id", "x").distinct())
        safe = safe.join(bad_vals, ["graph_id", "x"], "left_anti")
        accepted = (safe.groupBy("graph_id", "x")
                    .agg(F.min("y").alias("y"))).localCheckpoint(True)
        if accepted.limit(1).count() == 0:
            break
        wit_parts.append(accepted.select(
            "graph_id", F.col("x").alias("bnode"),
            F.col("y").alias("target")))
        sm = accepted.select("graph_id", F.col("x").alias("_sb"),
                             F.col("y").alias("_st"))
        om = accepted.select("graph_id", F.col("x").alias("_ob"),
                             F.col("y").alias("_ot"))
        cur = (cur.join(sm, on=[cur.graph_id == sm.graph_id,
                                cur.subj == sm._sb], how="left")
               .drop(sm.graph_id).drop("_sb")
               .join(om, on=[cur.graph_id == om.graph_id,
                             cur.obj == om._ob], how="left")
               .drop(om.graph_id).drop("_ob")
               .select("graph_id",
                       F.coalesce("_st", "subj").alias("subj"), "pred",
                       F.coalesce("_ot", "obj").alias("obj"))
               .dropDuplicates()).localCheckpoint(True)
    if wit_parts:
        wit = wit_parts[0]
        for p in wit_parts[1:]:
            wit = wit.union(p)
        # transitive composition (GraphLeaning.transitiveClosure:448-483):
        # a pass-k target may itself be remapped in a later pass; chain
        # length is bounded by the pass count
        m = wit.select("graph_id", F.col("bnode").alias("_b"),
                       F.col("target").alias("_t")).localCheckpoint(True)
        for _ in range(len(wit_parts)):
            wit = (wit.join(m, on=[wit.graph_id == m.graph_id,
                                   wit.target == m._b], how="left")
                   .drop(m.graph_id).drop("_b")
                   .select("graph_id", "bnode",
                           F.coalesce("_t", "target").alias("target")))
    else:
        wit = spark.createDataFrame(
            [], "graph_id string, bnode string, target string")
    return cur, wit


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
                bfs_max_rows: int = 2_000_000,
                prepass: bool = False
                ) -> tuple[DataFrame, DataFrame]:
    """Returns (lean_triples, witness) DataFrames.

    lean_triples: (graph_id, subj, pred, obj) — the per-graph cores.
    witness:      (graph_id, bnode, target) — complete core maps.

    ``prepass=True`` runs the distributed trivial-non-lean filter first
    (for corpora whose graphs are too large to hand a task whole); its
    witness composes with the kernel's.

    Graphs whose DFS kernel search exceeds its budget (combinatorially
    hard, not merely large) are re-run through the distributed BFS
    join-chain solver (lean.bfs) when ``bfs_fallback`` — its huge
    partial-solution table is sharded across executors, which is exactly
    the resource the single-task kernel lacks.  A graph that exhausts
    BOTH budgets passes through unleaned with a ``__budget_exceeded__``
    witness row.
    """
    pre_wit = None
    if prepass:
        triples, pre_wit = trivial_prepass(spark, triples)
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
    if pre_wit is not None:
        # compose pre-pass eliminations through the kernel's map: an
        # eliminated bnode's target may itself have been remapped by the
        # residual search
        kw = witness.select("graph_id", F.col("bnode").alias("_b"),
                            F.col("target").alias("_t"))
        pre_comp = (pre_wit.join(kw, on=[pre_wit.graph_id == kw.graph_id,
                                         pre_wit.target == kw._b],
                                 how="left")
                    .drop(kw.graph_id).drop("_b")
                    .select("graph_id", "bnode",
                            F.coalesce("_t", "target").alias("target")))
        witness = witness.union(pre_comp)
    return lean, witness
