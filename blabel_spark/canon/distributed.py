"""Distributed canonical labelling: the DataFrame colour-refinement fixpoint.

Re-expresses the reference's per-graph algorithm (GraphColouring.runColouring,
GraphColouring.java:463-666 + GraphLabelling.call, GraphLabelling.java:61-192)
as ONE iterative join→groupBy loop over the whole corpus at once:

* state is a single ``(graph_id, comp, bnode, h0, h1)`` table — one Spark
  job per iteration, all graphs/components refine simultaneously;
* every 16-byte colour travels as TWO sign-flipped int64 columns (see
  hashing.py / pair_kernels.py): primitive types end-to-end, numpy kernels
  zero-copy, and signed ordering == the algorithm's hex ordering;
* messages whose other end is ground are constant across rounds and are
  computed once; only bnode→bnode edges join the colour table per round;
* the A1 neighbourhood fold is repartition + sortWithinPartitions + one
  mapInPandas segmented-numpy fold (the previous colour is unioned in as a
  message row and sorts into place);
* components that reach a fixpoint leave the loop (their colours freeze);
* components whose fixpoint does not discriminate every bnode (automorphic
  residue) are finished by the branch-and-bound kernel from ``canon.local``
  inside one ``applyInPandas`` call per component;
* order-insensitive hash folds (whole-graph hash, upg graph hash) are
  per-byte sums mod 256: numpy partial sums per Arrow batch, JVM merge;
* optional ``salt_buckets`` switches the fold to a range-bucketed
  collect_list variant that splits a hub bnode's aggregation across
  buckets (salted repartitioning for skewed hub entities).

Scale notes (100 TB / 1000 executors): loop state and message tables
shuffle on (graph_id, comp, bnode) — high-cardinality, uniform keys; AQE
handles stragglers; per-iteration ``localCheckpoint`` truncates lineage so
plans stay constant-size; iteration count is driven by the largest
component diameter, not corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blabel_spark.hashing import BLANK_PAIR, MINUS_PAIR, MIN_LONG, PLUS_PAIR
from blabel_spark.pair_kernels import (
    combine2_pairs_udf,
    combine3_pairs_udf,
    fold_messages,
    fold_pair_array_udf,
    hash_int_pair_udf,
    md5_pair,
    pair_hex,
    unordered_sum_pairs,
)

TRIPLE_COLS = ("graph_id", "subj", "pred", "obj")


def is_bnode_col(c):
    return F.col(c).startswith("_:")


@dataclass
class CanonResult:
    labelled: DataFrame         # (graph_id, subj, pred, obj) canonical
    labels: DataFrame           # (graph_id, bnode, label)
    metrics: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# connected components of blank nodes (HashGraph.blankNodePartition,
# HashGraph.java:260-304) — label propagation to fixpoint, component id =
# minimum bnode (the reference's pivot).
# ---------------------------------------------------------------------------

def bnode_components(btri: DataFrame, max_iter: int = 64) -> DataFrame:
    """(graph_id, bnode) → comp for every bnode in btri.

    Each round does min-label propagation over edges AND a pointer-doubling
    jump (comp ← comp[comp]), so convergence takes O(log diameter) rounds
    — a 2^64-diameter chain would be needed to hit ``max_iter``, and
    hitting it raises instead of silently returning a split partition
    (components split across fake pivots would give conflicting canonical
    labels downstream)."""
    nodes = (
        btri.select("graph_id", F.col("subj").alias("bnode"))
        .where(is_bnode_col("subj"))
        .union(btri.select("graph_id", F.col("obj").alias("bnode"))
               .where(is_bnode_col("obj")))
        .distinct()
    )
    edges = (
        btri.where(is_bnode_col("subj") & is_bnode_col("obj")
                   & (F.col("subj") != F.col("obj")))
        .select("graph_id", F.col("subj").alias("a"), F.col("obj").alias("b"))
        .distinct()
    )
    sym = edges.union(edges.select("graph_id", F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    sym = sym.localCheckpoint(True)

    comp = nodes.withColumn("comp", F.col("bnode")).localCheckpoint(True)
    for _ in range(max_iter):
        compr = comp.select(F.col("graph_id").alias("g"),
                            F.col("bnode").alias("n"),
                            F.col("comp").alias("nbr_comp"))
        nbr_min = (
            sym.join(compr, on=[sym.graph_id == compr.g, sym.a == compr.n])
            .select(F.col("g").alias("graph_id"), F.col("b").alias("bnode"),
                    "nbr_comp")
            .groupBy("graph_id", "bnode")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        stepped = (
            comp.join(nbr_min, ["graph_id", "bnode"], "left")
            .select("graph_id", "bnode", F.col("comp").alias("old"),
                    F.least("comp", F.coalesce("nbr_comp", "comp"))
                    .alias("comp"))
        )
        # pointer doubling: comp ← min(comp, comp[comp]) — the jump is what
        # turns O(diameter) propagation into O(log diameter)
        parent = comp.select(F.col("graph_id").alias("g"),
                             F.col("bnode").alias("pn"),
                             F.col("comp").alias("pp"))
        new = (
            stepped.join(parent, on=[stepped.graph_id == parent.g,
                                     stepped.comp == parent.pn], how="left")
            .select("graph_id", "bnode", "old",
                    F.least("comp", F.coalesce("pp", "comp")).alias("comp"))
            .withColumn("changed", F.col("old") != F.col("comp"))
            .drop("old")
        ).localCheckpoint(True)
        n_changed = new.where("changed").count()
        comp = new.drop("changed")
        if n_changed == 0:
            return comp
    raise RuntimeError(
        f"bnode_components failed to converge in {max_iter} rounds — "
        "input graph pathologically deep or corrupted")


# ---------------------------------------------------------------------------
# preparation
# ---------------------------------------------------------------------------

def _prepare_bnode_triples(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (bnode-touching triples with comp + static pair columns,
    ground triples)."""
    tri = triples.select(*TRIPLE_COLS)
    has_b = is_bnode_col("subj") | is_bnode_col("obj")
    ground = tri.where(~has_b)
    btri = tri.where(has_b)

    comp = bnode_components(btri)
    anchor = F.when(is_bnode_col("subj"), F.col("subj")).otherwise(F.col("obj"))
    p0, p1 = md5_pair(F.col("pred"))
    s0, s1 = md5_pair(F.col("subj"))
    o0, o1 = md5_pair(F.col("obj"))
    btri = (
        btri.withColumn("_anchor", anchor)
        .join(comp.withColumnRenamed("bnode", "_anchor"),
              ["graph_id", "_anchor"])
        .drop("_anchor")
        .withColumn("p0", p0).withColumn("p1", p1)
        .withColumn("ss0", F.when(~is_bnode_col("subj"), s0))
        .withColumn("ss1", F.when(~is_bnode_col("subj"), s1))
        .withColumn("os0", F.when(~is_bnode_col("obj"), o0))
        .withColumn("os1", F.when(~is_bnode_col("obj"), o1))
    )
    return btri, ground


def _edge_views(btri: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the J1 message workload into static and dynamic parts.

    Subject bnodes receive combineOrdered(h(obj), h(pred), PLUS); object
    bnodes combineOrdered(h(subj), h(pred), MINUS) (GraphColouring.java:
    505-534).  Ground-other-end messages are constant across rounds —
    computed once here; bnode→bnode edges carry their pred/marker pairs
    and join the colour table each round.
    """
    def side(bcol, ocol, os0, os1, mk):
        return btri.where(is_bnode_col(bcol)).select(
            "graph_id", "comp", F.col(bcol).alias("bnode"),
            F.col(ocol).alias("other"),
            F.col(os0).alias("ot0"), F.col(os1).alias("ot1"),
            "p0", "p1",
            F.lit(mk[0]).alias("mk0"), F.lit(mk[1]).alias("mk1"))

    edges = side("subj", "obj", "os0", "os1", PLUS_PAIR) \
        .union(side("obj", "subj", "ss0", "ss1", MINUS_PAIR))
    static = edges.where(F.col("ot0").isNotNull())
    m = combine3_pairs_udf("ot0", "ot1", "p0", "p1", "mk0", "mk1")
    static_msgs = static.select(
        "graph_id", "comp", "bnode",
        m.getField("h0").alias("m0"), m.getField("h1").alias("m1"))
    bb_edges = edges.where(F.col("ot0").isNull()) \
                    .drop("ot0", "ot1")
    return static_msgs, bb_edges


def _iteration_messages(static_msgs: DataFrame, bb_edges: DataFrame,
                        lab: DataFrame) -> DataFrame:
    other_lab = lab.select(F.col("graph_id").alias("g"),
                           F.col("bnode").alias("n"),
                           F.col("h0").alias("oc0"), F.col("h1").alias("oc1"))
    m = combine3_pairs_udf("oc0", "oc1", "p0", "p1", "mk0", "mk1")
    dyn = (
        bb_edges
        .join(other_lab, on=[bb_edges.graph_id == other_lab.g,
                             bb_edges.other == other_lab.n])
        .select("graph_id", "comp", "bnode",
                m.getField("h0").alias("m0"), m.getField("h1").alias("m1"))
    )
    return static_msgs.union(dyn)


def _next_colors(msgs: DataFrame, lab: DataFrame,
                 salt_buckets: int = 0) -> DataFrame:
    """A1: sort(messages + own previous colour), combineOrdered-fold
    (GraphColouring.java:542-548).  Previous colours are unioned in as
    message rows and sort into place.

    Default path: repartition+sort + segmented numpy fold (fold_messages).
    Salted path: range-bucket messages by their leading byte so a hub
    bnode's collect happens in ``salt_buckets`` balanced groups whose
    bucket-ordered arrays are re-sorted once per bnode and folded.
    """
    key = ["graph_id", "comp", "bnode"]
    prev_rows = lab.select(*key, F.col("h0").alias("m0"),
                           F.col("h1").alias("m1"))
    all_msgs = msgs.union(prev_rows)
    if salt_buckets and salt_buckets > 1:
        bucket = (F.shiftrightunsigned(
            F.col("m0").bitwiseXOR(F.lit(MIN_LONG)), 56)
            * salt_buckets / 256).cast("int")
        per_bucket = (
            all_msgs.withColumn("bucket", bucket)
            .groupBy(*key, "bucket")
            .agg(F.sort_array(F.collect_list(
                F.struct(F.col("m0").alias("h0"), F.col("m1").alias("h1"))))
                .alias("arr"))
        )
        merged = (
            per_bucket.groupBy(*key)
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "arr"))),
                lambda x: x["arr"])).alias("msgs"))
        )
        folded = merged.select(
            *key, fold_pair_array_udf(F.col("msgs")).alias("c"))
        return folded.select(*key, F.col("c.h0").alias("h0"),
                             F.col("c.h1").alias("h1"))
    return fold_messages(all_msgs)


def _kernel_colors(btri_kernel: DataFrame) -> DataFrame:
    """Finish automorphic components with the local branch-and-bound kernel
    (GraphColouring.traverse + minimum-leaf selection, GraphColouring.java:
    137-141,180-253), one applyInPandas group per (graph_id, comp)."""
    schema = ("graph_id string, comp string, bnode string, "
              "h0 long, h1 long")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from blabel_spark.canon.local import (
            _Colouring, graph_sort_key, is_bnode)
        from blabel_spark.hashing import BLANK_HASH as BH
        from blabel_spark.hashing import enc_pair, hash_string
        graph_id = pdf["graph_id"].iloc[0]
        comp = pdf["comp"].iloc[0]
        triples = list(zip(pdf["subj"], pdf["pred"], pdf["obj"]))
        static: dict[str, bytes] = {}
        colors: dict[str, bytes] = {}
        for t in triples:
            for term in t:
                if is_bnode(term):
                    colors[term] = BH
                elif term not in static:
                    static[term] = hash_string(term)
        col = _Colouring(triples=triples, static=static, colors=colors,
                         path=[], leaves={}, colour_iters=[])
        col.execute()
        best = min(col.leaves, key=graph_sort_key)
        leaf = col.leaves[best][0]
        pairs = [enc_pair(c) for c in leaf.colors.values()]
        return pd.DataFrame({
            "graph_id": graph_id, "comp": comp,
            "bnode": list(leaf.colors.keys()),
            "h0": [p[0] for p in pairs],
            "h1": [p[1] for p in pairs],
        })

    return (btri_kernel.select("graph_id", "comp", "subj", "pred", "obj")
            .groupBy("graph_id", "comp").applyInPandas(run, schema))


# ---------------------------------------------------------------------------
# the driver loop
# ---------------------------------------------------------------------------

def canonicalize(spark: SparkSession, triples: DataFrame, *,
                 dip: bool = True, upg: bool = True,
                 max_iterations: int = 64,
                 salt_buckets: int = 0,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 5) -> CanonResult:
    """Canonically label blank nodes of every graph in ``triples``.

    Input schema: (graph_id, subj, pred, obj) strings in N3 convention.
    Semantics match canon.local.label_graph (itself golden-tested against
    the reference), including dip/upg muxing.

    With ``checkpoint_dir`` set, the loop state is committed every
    ``checkpoint_every`` iterations and a restarted run resumes from the
    last commit (colours are pure functions of the previous round, so
    replay is idempotent; see sources.io.FixpointCheckpoint).
    """
    import time as _time
    _t0 = _time.time()
    metrics: dict = {}
    # P6-style validation (reference predicates are always IRIs; a bnode
    # predicate would silently hash as a static term here while the local
    # oracle rejects it — fail loudly instead)
    if triples.where(is_bnode_col("pred")).limit(1).count():
        raise ValueError("blank node in predicate position")
    # RDF graphs are triple SETS (the reference loads into HashGraph /
    # TreeSet structures); duplicate input rows would otherwise fold twice
    # into the unordered graph/upg hashes and shift every label
    triples = triples.select(*TRIPLE_COLS).dropDuplicates()
    btri, ground = _prepare_bnode_triples(triples)
    btri = btri.localCheckpoint(True)
    metrics["bnode_triples"] = btri.count()
    metrics["t_prep_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    ckpt = None
    restored = None
    if checkpoint_dir:
        from blabel_spark.sources.io import FixpointCheckpoint
        ckpt = FixpointCheckpoint(spark, checkpoint_dir)
        restored = ckpt.restore()

    static_msgs, bb_edges = _edge_views(btri)
    static_msgs = static_msgs.localCheckpoint(True)
    bb_edges = bb_edges.localCheckpoint(True)

    if restored is not None:
        it, lab, conv_prev, res_df, kern_df = restored
        metrics["resumed_from_iteration"] = it
        resolved = [res_df] if res_df is not None else []
        kernel_parts = [kern_df] if kern_df is not None else []
        active = conv_prev.select("graph_id", "comp").localCheckpoint(True)
    else:
        lab = (
            btri.select("graph_id", "comp", F.col("subj").alias("bnode"))
            .where(is_bnode_col("subj"))
            .union(btri.select("graph_id", "comp",
                               F.col("obj").alias("bnode"))
                   .where(is_bnode_col("obj")))
            .distinct()
            .withColumn("h0", F.lit(BLANK_PAIR[0]))
            .withColumn("h1", F.lit(BLANK_PAIR[1]))
        ).localCheckpoint(True)

        conv_prev = (lab.groupBy("graph_id", "comp")
                     .agg(F.lit(1).alias("prev_nc")))

        resolved: list[DataFrame] = []
        kernel_parts: list[DataFrame] = []
        active = None  # None = every component is active
        it = 0
    while True:
        it += 1
        sm = static_msgs if active is None else \
            static_msgs.join(active, ["graph_id", "comp"], "left_semi")
        msgs = _iteration_messages(sm, bb_edges, lab)
        new_lab = _next_colors(msgs, lab, salt_buckets).localCheckpoint(True)

        conv = (
            new_lab.groupBy("graph_id", "comp")
            .agg(F.countDistinct("h0", "h1").alias("nc"),
                 F.count("*").alias("nb"))
            .join(conv_prev, ["graph_id", "comp"])
            .withColumn("status",
                        F.when(F.col("nc") == F.col("nb"), "discrete")
                        .when(F.col("nc") <= F.col("prev_nc"), "stalled")
                        .otherwise("active"))
        ).localCheckpoint(True)

        counts = {r["status"]: r["n"] for r in
                  conv.groupBy("status").agg(F.count("*").alias("n")).collect()}
        done_comps = conv.where(F.col("status") == "discrete") \
                         .select("graph_id", "comp")
        stall_comps = conv.where(F.col("status") == "stalled") \
                          .select("graph_id", "comp")

        if counts.get("discrete"):
            resolved.append(
                new_lab.join(done_comps, ["graph_id", "comp"], "left_semi"))
        if counts.get("stalled"):
            kernel_parts.append(
                btri.join(stall_comps, ["graph_id", "comp"], "left_semi"))

        n_active = counts.get("active", 0)
        if n_active == 0 or it >= max_iterations:
            if n_active and it >= max_iterations:
                # over-budget components fall back to the kernel (the
                # reference uses wall-clock timeouts per document,
                # RunNQuadsTest.java:76)
                kernel_parts.append(btri.join(
                    conv.where(F.col("status") == "active")
                    .select("graph_id", "comp"),
                    ["graph_id", "comp"], "left_semi"))
                metrics["over_budget_comps"] = n_active
            break

        active = conv.where(F.col("status") == "active") \
                     .select("graph_id", "comp")
        lab = new_lab.join(active, ["graph_id", "comp"], "left_semi") \
                     .localCheckpoint(True)
        conv_prev = conv.where(F.col("status") == "active") \
            .select("graph_id", "comp", F.col("nc").alias("prev_nc"))

        if ckpt is not None and it % checkpoint_every == 0:
            res_u = resolved[0] if resolved else None
            for p in (resolved[1:] if resolved else []):
                res_u = res_u.union(p)
            ker_u = kernel_parts[0] if kernel_parts else None
            for p in (kernel_parts[1:] if kernel_parts else []):
                ker_u = ker_u.union(p)
            ckpt.commit(it, lab, conv_prev, res_u, ker_u)

    metrics["colour_iterations"] = it
    metrics["t_loop_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    # leaf colours: distributed-discrete ∪ kernel output
    parts = list(resolved)
    if kernel_parts:
        kb = kernel_parts[0]
        for p in kernel_parts[1:]:
            kb = kb.union(p)
        parts.append(_kernel_colors(kb))
    if not parts:
        empty = spark.createDataFrame(
            [], "graph_id string, bnode string, label string")
        return CanonResult(triples.select(*TRIPLE_COLS).dropDuplicates(),
                           empty, metrics)
    leaf = parts[0]
    for p in parts[1:]:
        leaf = leaf.union(p)
    leaf = leaf.localCheckpoint(True)
    metrics["t_leaf_kernel_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    # ---- per-component canonical hash + mux (GraphColouring.java:121-168,
    # GraphLabelling.java:100-119) ----------------------------------------
    slab = leaf.select(F.col("graph_id").alias("g"), F.col("bnode").alias("n"),
                       F.col("h0").alias("sc0"), F.col("h1").alias("sc1"))
    olab = leaf.select(F.col("graph_id").alias("g"), F.col("bnode").alias("n"),
                       F.col("h0").alias("oc0"), F.col("h1").alias("oc1"))
    tm = combine3_pairs_udf(
        F.coalesce("sc0", "ss0"), F.coalesce("sc1", "ss1"),
        F.col("p0"), F.col("p1"),
        F.coalesce("oc0", "os0"), F.coalesce("oc1", "os1"))
    th = (
        btri
        .join(slab, on=[btri.graph_id == slab.g, btri.subj == slab.n],
              how="left").drop("g", "n")
        .join(olab, on=[btri.graph_id == olab.g, btri.obj == olab.n],
              how="left").drop("g", "n")
        .select("graph_id", "comp",
                tm.getField("h0").alias("t0"), tm.getField("h1").alias("t1"))
    )
    ghc = unordered_sum_pairs(th, ["graph_id", "comp"], "t0", "t1",
                              "g0", "g1", extra_init=BLANK_PAIR)

    # duplicate-component key: with set-semantic input (deduped above) and
    # injective leaf colours, (g0, g1) is the unordered fold over the
    # component's exact distinct labelled triple set — the distributed
    # analogue of the oracle's graphs_seen TreeSet equality
    # (GraphLabelling.java:100-119); (nt, nb) guard the astronomically
    # rare md5 digest collision between non-isomorphic components
    sizes = (btri.groupBy("graph_id", "comp").agg(F.count("*").alias("nt"))
             .join(leaf.groupBy("graph_id", "comp")
                   .agg(F.count("*").alias("nb")), ["graph_id", "comp"]))
    dup_w = Window.partitionBy("graph_id", "g0", "g1", "nt", "nb") \
                  .orderBy("comp")
    comp_mux = (
        ghc.join(sizes, ["graph_id", "comp"])
        .withColumn("rank", F.row_number().over(dup_w))
        # duplicate mux ints: first copy 0, then count+1 = 2, 3, ...
        # (GraphLabelling.java:100-119 passing count+1 to getCanonicalGraph)
        .withColumn("mux_i",
                    F.when(F.col("rank") == 1, F.lit(0))
                    .otherwise(F.col("rank")) if dip else F.lit(0))
        .withColumn("contributes",
                    F.lit(True) if dip else (F.col("rank") == 1))
        .withColumn("mx", hash_int_pair_udf(F.col("mux_i")))
        .withColumn("cb", combine2_pairs_udf("g0", "g1", "mx.h0", "mx.h1"))
        .select("graph_id", "comp", F.col("cb.h0").alias("cb0"),
                F.col("cb.h1").alias("cb1"), "contributes")
    ).localCheckpoint(True)

    colored = (
        leaf.join(comp_mux, ["graph_id", "comp"])
        .withColumn("cc", combine2_pairs_udf("h0", "h1", "cb0", "cb1"))
        .select("graph_id", "bnode",
                F.col("cc.h0").alias("h0"), F.col("cc.h1").alias("h1"))
    )

    # ---- upg: graph-level unique hash (GraphLabelling.java:137-150) -------
    if upg:
        gs0, gs1 = md5_pair(F.col("subj"))
        gp0, gp1 = md5_pair(F.col("pred"))
        go0, go1 = md5_pair(F.col("obj"))
        gm = combine3_pairs_udf("a0", "a1", "b0", "b1", "c0", "c1")
        ground_th = (ground.select(
            "graph_id", gs0.alias("a0"), gs1.alias("a1"),
            gp0.alias("b0"), gp1.alias("b1"),
            go0.alias("c0"), go1.alias("c1"))
            .select("graph_id", gm.getField("h0").alias("t0"),
                    gm.getField("h1").alias("t1")))
        comb_h = comp_mux.where("contributes").select(
            "graph_id", F.col("cb0").alias("t0"), F.col("cb1").alias("t1"))
        ghash = unordered_sum_pairs(ground_th.union(comb_h), ["graph_id"],
                                    "t0", "t1", "gh0", "gh1",
                                    extra_init=BLANK_PAIR)
        colored = (
            colored.join(ghash, "graph_id")
            .withColumn("fc", combine2_pairs_udf("h0", "h1", "gh0", "gh1"))
            .select("graph_id", "bnode",
                    F.col("fc.h0").alias("h0"), F.col("fc.h1").alias("h1"))
        )

    labels = colored.select(
        "graph_id", "bnode",
        F.concat(F.lit("_:SK00"), pair_hex(F.col("h0"), F.col("h1")))
        .alias("label"),
    ).localCheckpoint(True)
    metrics["t_mux_s"] = round(_time.time() - _t0, 3)

    # ---- relabel the full graph (GraphColouring.labelBlankNodes) ----------
    tri = triples.select(*TRIPLE_COLS)
    sl = labels.select(F.col("graph_id").alias("g"), F.col("bnode").alias("n"),
                       F.col("label").alias("s_l"))
    ol = labels.select(F.col("graph_id").alias("g"), F.col("bnode").alias("n"),
                       F.col("label").alias("o_l"))
    labelled = (
        tri
        .join(sl, on=[tri.graph_id == sl.g, tri.subj == sl.n], how="left")
        .drop("g", "n")
        .join(ol, on=[tri.graph_id == ol.g, tri.obj == ol.n], how="left")
        .drop("g", "n")
        .select("graph_id",
                F.coalesce("s_l", "subj").alias("subj"),
                "pred",
                F.coalesce("o_l", "obj").alias("obj"))
        .dropDuplicates()
    )
    return CanonResult(labelled, labels, metrics)
