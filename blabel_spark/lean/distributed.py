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
        # edge identity interned to a 128-bit xxhash64 long pair (the S4
        # flyweight trick, same budget as canon.distributed._ikey): the
        # containment joins/groupBys below run up to ``max_passes`` times
        # over THE OVERSIZED-GRAPH PATH, so their shuffle keys must be
        # fixed-width longs, not "±|pred|term" concat strings (reference
        # anchor: GraphLeaning.indexAllEdges interns Edge hashcodes,
        # GraphLeaning.java:485-514).  Node/val stay strings — they are
        # short bnode labels needed for the witness decode.
        def _ekey(sign: int, pred: str, other: str) -> tuple:
            return (F.xxhash64(F.lit(1), "graph_id", F.lit(sign),
                               F.col(pred), F.col(other)),
                    F.xxhash64(F.lit(2), "graph_id", F.lit(sign),
                               F.col(pred), F.col(other)))
        sp0, sp1 = _ekey(1, "pred", "obj")
        so0, so1 = _ekey(-1, "pred", "subj")
        edges = (
            cur.select("graph_id", F.col("subj").alias("node"),
                       sp0.alias("e0"), sp1.alias("e1"),
                       F.col("obj").alias("val"))
            .union(cur.select("graph_id", F.col("obj").alias("node"),
                              so0.alias("e0"), so1.alias("e1"),
                              F.col("subj").alias("val")))
            .distinct()
        ).localCheckpoint(True)
        E = ["e0", "e1"]
        cnt = edges.groupBy("graph_id", "node").agg(F.count("*").alias("n"))
        bedges = edges.where(F.col("node").startswith("_:"))
        freq = edges.groupBy("graph_id", *E).agg(F.count("*").alias("f"))
        rare = (bedges.join(freq, ["graph_id", *E])
                .groupBy("graph_id", "node")
                .agg(F.min_by(F.struct(*E), F.struct("f", *E)).alias("e"))
                .select("graph_id", F.col("node").alias("x"),
                        F.col("e.e0").alias("e0"), F.col("e.e1").alias("e1")))
        cand = (rare.join(edges.select("graph_id",
                                       F.col("node").alias("y"), *E),
                          ["graph_id", *E])
                .where(F.col("x") != F.col("y"))
                .select("graph_id", "x", "y"))
        xe = bedges.select("graph_id", F.col("node").alias("x"), *E)
        ye = edges.select("graph_id", F.col("node").alias("y"), *E)
        matched = (cand.join(xe, ["graph_id", "x"])
                   .join(ye, ["graph_id", "y", *E], "left_semi")
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
        # accepted shares lineage (and therefore attribute ids) with cur,
        # so the mapping application renames its join keys outright —
        # df.col-based self-join disambiguation is not reliable here
        sm = accepted.select(F.col("graph_id").alias("_sg"),
                             F.col("x").alias("_sb"),
                             F.col("y").alias("_st"))
        om = accepted.select(F.col("graph_id").alias("_og"),
                             F.col("x").alias("_ob"),
                             F.col("y").alias("_ot"))
        cur = (cur.join(sm, on=[F.col("graph_id") == F.col("_sg"),
                                F.col("subj") == F.col("_sb")], how="left")
               .drop("_sg", "_sb")
               .join(om, on=[F.col("graph_id") == F.col("_og"),
                             F.col("obj") == F.col("_ob")], how="left")
               .drop("_og", "_ob")
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
        m = wit.select(F.col("graph_id").alias("_mg"),
                       F.col("bnode").alias("_b"),
                       F.col("target").alias("_t")).localCheckpoint(True)
        for _ in range(len(wit_parts)):
            wit = (wit.join(m, on=[F.col("graph_id") == F.col("_mg"),
                                   F.col("target") == F.col("_b")],
                            how="left")
                   .drop("_mg", "_b")
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
                prepass: bool | str = "auto",
                kernel_graph_rows: int = 100_000,
                max_bfs_graphs: int = 64
                ) -> tuple[DataFrame, DataFrame]:
    """Returns (lean_triples, witness) DataFrames.

    lean_triples: (graph_id, subj, pred, obj) — the per-graph cores.
    witness:      (graph_id, bnode, target) — complete core maps.

    Scale routing (``prepass="auto"``, the default): one size probe
    decides the ladder, mirroring ``canonicalize(route="auto")``.  When
    every graph fits a task (≤ ``kernel_graph_rows`` rows) the corpus
    goes straight to the per-graph DFS kernel — the reference's
    per-document regime.  Otherwise the distributed trivial-non-lean
    filter runs FIRST (the reference's staged stack runs its trivial
    stage unconditionally before search, GraphLeaning.java:121-140),
    shrinking oversized graphs before any kernel sees them; graphs
    still over the threshold afterwards never enter ``applyInPandas``
    (a merely-huge graph would otherwise OOM one task) — they go to
    the BFS solver when their residual pattern count permits, else
    pass through flagged.  ``prepass=True``/``False`` forces the stage
    on/off.

    Graphs whose DFS kernel search exceeds its budget (combinatorially
    hard, not merely large) are re-run through the distributed BFS
    join-chain solver (lean.bfs) when ``bfs_fallback`` — its huge
    partial-solution table is sharded across executors, which is exactly
    the resource the single-task kernel lacks.  The driver processes at
    most ``max_bfs_graphs`` such graphs (each is a driver-coordinated
    join chain); any beyond the cap — and any graph that exhausts BOTH
    budgets — passes through unleaned with a ``__budget_exceeded__``
    witness row, the reference's per-document timeout behaviour
    (RunNQuadsTest.java:296-320).  No driver-side collect in this
    function is larger than ``max_bfs_graphs`` ids + the witness maps.
    """
    tri = triples.select("graph_id", "subj", "pred", "obj")
    pre_wit = None
    if prepass == "auto":
        biggest = (tri.groupBy("graph_id").agg(F.count("*").alias("n"))
                   .agg(F.max("n").alias("m")).collect()[0]["m"]) or 0
        run_pre = biggest > kernel_graph_rows
    else:
        run_pre = bool(prepass)
        biggest = None
    if run_pre:
        tri, pre_wit = trivial_prepass(spark, tri)

    # graphs still too large for one task bypass the kernel entirely
    if run_pre or biggest is None or biggest > kernel_graph_rows:
        big_ids = (tri.groupBy("graph_id").agg(F.count("*").alias("n"))
                   .where(F.col("n") > kernel_graph_rows)
                   .select("graph_id").localCheckpoint(True))
        n_big = big_ids.count()
    else:
        big_ids, n_big = None, 0

    small = tri if not n_big else \
        tri.join(F.broadcast(big_ids), "graph_id", "left_anti")
    out = (small.groupBy("graph_id")
           .applyInPandas(_kernel_fn(kernel_budget), _OUT_SCHEMA)
           ).localCheckpoint(True)
    lean = (out.where(F.col("kind") == "t")
            .select("graph_id", F.col("a").alias("subj"),
                    F.col("b").alias("pred"), F.col("c").alias("obj")))
    witness = (out.where(F.col("kind") == "w")
               .select("graph_id", F.col("a").alias("bnode"),
                       F.col("b").alias("target")))

    # bounded collect: kernel-flagged (hard) graphs first — they are the
    # BFS solver's intended case — then oversized ones, up to the cap
    over = [r["graph_id"] for r in
            out.where((F.col("kind") == "w")
                      & (F.col("a") == "__budget_exceeded__"))
            .select("graph_id").distinct()
            .limit(max_bfs_graphs + 1).collect()]
    big_list = [] if big_ids is None else \
        [r["graph_id"] for r in big_ids.limit(max_bfs_graphs + 1).collect()]
    todo = []
    if bfs_fallback:
        todo = sorted(over)[:max_bfs_graphs]
        todo += sorted(set(big_list) - set(todo))[:max_bfs_graphs - len(todo)]

    if todo:
        from blabel_spark.lean.bfs import BFSBudgetExceeded, bfs_lean_graph
        redo = spark.createDataFrame([(g,) for g in todo],
                                     "graph_id string")
        # kernel output of re-routed graphs is replaced by BFS output;
        # anti-join against the (≤ max_bfs_graphs)-row id table, never a
        # driver-built isin over an unbounded list
        lean = lean.join(F.broadcast(redo), "graph_id", "left_anti")
        witness = witness.join(F.broadcast(redo), "graph_id", "left_anti")
        extra_lean, extra_wit = [], []
        for g in todo:
            gtri = tri.where(F.col("graph_id") == g) \
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

    # oversized graphs NOT processed above (beyond the cap, or
    # bfs_fallback off) pass through unleaned, flagged — id set stays a
    # DataFrame, nothing unbounded reaches the driver
    if n_big:
        done = spark.createDataFrame([(g,) for g in todo],
                                     "graph_id string") if todo else \
            spark.createDataFrame([], "graph_id string")
        rest = big_ids.join(F.broadcast(done), "graph_id", "left_anti")
        lean = lean.union(
            tri.join(F.broadcast(rest), "graph_id", "left_semi")
            .dropDuplicates())
        witness = witness.union(rest.select(
            "graph_id", F.lit("__budget_exceeded__").alias("bnode"),
            F.lit("").alias("target")))
    if pre_wit is not None:
        # compose pre-pass eliminations through the kernel's map: an
        # eliminated bnode's target may itself have been remapped by the
        # residual search
        kw = witness.select(F.col("graph_id").alias("_kg"),
                            F.col("bnode").alias("_b"),
                            F.col("target").alias("_t"))
        pre_comp = (pre_wit.join(kw, on=[F.col("graph_id") == F.col("_kg"),
                                         F.col("target") == F.col("_b")],
                                 how="left")
                    .drop("_kg", "_b")
                    .select("graph_id", "bnode",
                            F.coalesce("_t", "target").alias("target")))
        witness = witness.union(pre_comp)
    return lean, witness
