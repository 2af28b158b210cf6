"""Distributed canonical labelling: the DataFrame colour-refinement fixpoint.

Re-expresses the reference's per-graph algorithm (GraphColouring.runColouring,
GraphColouring.java:463-666 + GraphLabelling.call, GraphLabelling.java:61-192)
as ONE iterative join→groupBy loop over the whole corpus at once:

* state is a single ``(graph_id, comp, bnode, color)`` table — one Spark job
  per iteration, all graphs/components refine simultaneously;
* components that reach a fixpoint leave the loop (their colours freeze),
  so late iterations touch only the shrinking active residue;
* components whose fixpoint does not discriminate every bnode (automorphic
  residue — regular subgraphs) are finished by the branch-and-bound kernel
  from ``canon.local`` inside one ``applyInPandas`` call per component —
  branching search is inherently sequential and stays component-local;
* all order-insensitive hash folds (whole-graph hash, upg graph hash) are
  per-byte sums mod 256 and run as plain JVM ``sum`` aggregations with
  map-side partial aggregation (see spark_util.unordered_sum_agg);
* the order-sensitive folds run as Arrow-batched vectorized pandas UDFs;
* optional message-salting splits a hub bnode's neighbour aggregation into
  range-partitioned buckets whose sorted sub-lists concatenate back into
  the globally sorted list (combineOrdered needs the global sort order,
  GraphColouring.java:542-548) — two small shuffles instead of one skewed.

Scale notes (100 TB / 1000 executors): the loop state and message tables
shuffle on (graph_id, comp, bnode) — high-cardinality, uniform keys; AQE
handles stragglers; per-iteration ``localCheckpoint`` truncates lineage so
plans stay constant-size; transcripts corpora are embarrassingly parallel
over graphs, so iteration count is driven by the *largest* component
diameter, not corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from blabel_spark.hashing import BLANK_HASH, MINUS, PLUS, hash_int
from blabel_spark.spark_util import (
    combine2_udf,
    combine3_udf,
    fold_ordered_udf,
    md5_binary,
    unordered_sum_agg,
)

TRIPLE_COLS = ("graph_id", "subj", "pred", "obj")


def is_bnode_col(c):
    return F.col(c).startswith("_:")


@F.pandas_udf(BinaryType())
def hash_int_udf(i: pd.Series) -> pd.Series:
    """Guava hashInt as a column (md5 of 4 little-endian bytes)."""
    import hashlib
    return i.map(lambda v: hashlib.md5(
        (int(v) & 0xFFFFFFFF).to_bytes(4, "little")).digest())


@dataclass
class CanonResult:
    labelled: DataFrame         # (graph_id, subj, pred, obj) canonical
    labels: DataFrame           # (graph_id, bnode, label, color)
    metrics: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# connected components of blank nodes (HashGraph.blankNodePartition,
# HashGraph.java:260-304) — label propagation to fixpoint, component id =
# minimum bnode (the reference's pivot).
# ---------------------------------------------------------------------------

def bnode_components(btri: DataFrame, max_iter: int = 50) -> DataFrame:
    """(graph_id, bnode) → comp for every bnode in btri."""
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
    # undirected
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
        new = (
            comp.join(nbr_min, ["graph_id", "bnode"], "left")
            .select("graph_id", "bnode",
                    F.least("comp", F.coalesce("nbr_comp", "comp"))
                    .alias("comp"),
                    (F.col("comp") != F.least(
                        "comp", F.coalesce("nbr_comp", "comp")))
                    .alias("changed"))
        ).localCheckpoint(True)
        n_changed = new.where("changed").count()
        comp = new.drop("changed")
        if n_changed == 0:
            break
    return comp


# ---------------------------------------------------------------------------
# the fixpoint
# ---------------------------------------------------------------------------

def _prepare_bnode_triples(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (bnode-touching triples with comp + static hash columns,
    ground triples)."""
    tri = triples.select(*TRIPLE_COLS)
    has_b = is_bnode_col("subj") | is_bnode_col("obj")
    ground = tri.where(~has_b)
    btri = tri.where(has_b)

    comp = bnode_components(btri)
    anchor = F.when(is_bnode_col("subj"), F.col("subj")).otherwise(F.col("obj"))
    btri = (
        btri.withColumn("_anchor", anchor)
        .join(comp.withColumnRenamed("bnode", "_anchor"),
              ["graph_id", "_anchor"])
        .drop("_anchor")
        .withColumn("pred_h", md5_binary(F.col("pred")))
        .withColumn("s_static", F.when(~is_bnode_col("subj"),
                                       md5_binary(F.col("subj"))))
        .withColumn("o_static", F.when(~is_bnode_col("obj"),
                                       md5_binary(F.col("obj"))))
    )
    return btri, ground


def _edge_views(btri: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the J1 message workload into its static and dynamic parts.

    Each triple endpoint that is a bnode receives one message per round:
    subject bnodes combineOrdered(h(obj), h(pred), PLUS), object bnodes
    combineOrdered(h(subj), h(pred), MINUS) (GraphColouring.java:505-534).
    Messages whose other end is ground (IRI/literal) are CONSTANT across
    rounds — compute them once (static_msgs).  Only bnode→bnode edges
    (bb_edges) need the per-round join against the colour table; in
    star-shaped KG data these are a small fraction of all edges, so the
    per-iteration shuffle shrinks accordingly.
    """
    plus, minus = F.lit(PLUS), F.lit(MINUS)
    subj_e = btri.where(is_bnode_col("subj")).select(
        "graph_id", "comp", F.col("subj").alias("bnode"),
        F.col("obj").alias("other"), F.col("o_static").alias("other_static"),
        "pred_h", plus.alias("marker"))
    obj_e = btri.where(is_bnode_col("obj")).select(
        "graph_id", "comp", F.col("obj").alias("bnode"),
        F.col("subj").alias("other"), F.col("s_static").alias("other_static"),
        "pred_h", minus.alias("marker"))
    edges = subj_e.union(obj_e)
    static_msgs = (
        edges.where(F.col("other_static").isNotNull())
        .select("graph_id", "comp", "bnode",
                combine3_udf(F.col("other_static"), F.col("pred_h"),
                             F.col("marker")).alias("msg"))
    )
    bb_edges = edges.where(F.col("other_static").isNull()) \
                    .drop("other_static")
    return static_msgs, bb_edges


def _iteration_messages(static_msgs: DataFrame, bb_edges: DataFrame,
                        lab: DataFrame) -> DataFrame:
    """Per-round J1 messages: static part unioned with the dynamic part
    (bnode→bnode edges joined against the previous round's colours)."""
    other_lab = lab.select(F.col("graph_id").alias("g"),
                           F.col("bnode").alias("n"),
                           F.col("color").alias("other_color"))
    dyn = (
        bb_edges
        .join(other_lab, on=[bb_edges.graph_id == other_lab.g,
                             bb_edges.other == other_lab.n])
        .select("graph_id", "comp", "bnode",
                combine3_udf(F.col("other_color"), F.col("pred_h"),
                             F.col("marker")).alias("msg"))
    )
    return static_msgs.union(dyn)


def _next_colors(msgs: DataFrame, lab: DataFrame,
                 salt_buckets: int = 0) -> DataFrame:
    """A1: per-bnode aggregation — sort(messages + own previous colour),
    combineOrdered-fold (GraphColouring.java:542-548).

    With salting, messages are range-bucketed by their leading byte so each
    bucket's sorted sub-list concatenates (in bucket order) into the global
    sorted list; the skewed single-key aggregation becomes two balanced ones.
    """
    key = ["graph_id", "comp", "bnode"]
    if salt_buckets and salt_buckets > 1:
        bucket = (F.conv(F.hex(F.substring(F.col("msg"), 1, 1)), 16, 10)
                  .cast("int") * salt_buckets / 256).cast("int")
        per_bucket = (
            msgs.withColumn("bucket", bucket)
            .groupBy(*key, "bucket")
            .agg(F.sort_array(F.collect_list("msg")).alias("arr"))
        )
        merged = (
            per_bucket.groupBy(*key)
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "arr"))),
                lambda x: x["arr"])).alias("msgs"))
        )
    else:
        merged = msgs.groupBy(*key).agg(F.collect_list("msg").alias("msgs"))

    prev = lab.select(*key, F.col("color").alias("prev"))
    return (
        merged.join(prev, key)
        .withColumn("sorted", F.array_sort(
            F.concat(F.col("msgs"), F.array(F.col("prev")))))
        .select(*key, fold_ordered_udf(F.col("sorted")).alias("color"))
    )


def _kernel_colors(btri_kernel: DataFrame) -> DataFrame:
    """Finish automorphic components with the local branch-and-bound kernel,
    one applyInPandas group per (graph_id, comp).  Returns the chosen
    canonical leaf's colours (pre-mux), mirroring GraphColouring.traverse +
    minimum-leaf selection (GraphColouring.java:137-141,180-253)."""
    schema = "graph_id string, comp string, bnode string, color binary"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from blabel_spark.canon.local import (
            _Colouring, graph_sort_key, is_bnode)
        from blabel_spark.hashing import BLANK_HASH as BH, hash_string
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
        return pd.DataFrame({
            "graph_id": graph_id, "comp": comp,
            "bnode": list(leaf.colors.keys()),
            "color": list(leaf.colors.values()),
        })

    return (btri_kernel.select("graph_id", "comp", "subj", "pred", "obj")
            .groupBy("graph_id", "comp").applyInPandas(run, schema))


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
    btri, ground = _prepare_bnode_triples(triples)
    btri = btri.localCheckpoint(True)
    metrics["bnode_triples"] = btri.count()
    metrics["ground_triples"] = ground.count()
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
        # initial state: every bnode coloured with the blank hash
        lab = (
            btri.select("graph_id", "comp", F.col("subj").alias("bnode"))
            .where(is_bnode_col("subj"))
            .union(btri.select("graph_id", "comp",
                               F.col("obj").alias("bnode"))
                   .where(is_bnode_col("obj")))
            .distinct()
            .withColumn("color", F.lit(BLANK_HASH))
        ).localCheckpoint(True)

        conv_prev = (lab.groupBy("graph_id", "comp")
                     .agg(F.lit(1).alias("prev_nc"))).localCheckpoint(True)

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
            .agg(F.countDistinct("color").alias("nc"),
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
        # no blank nodes anywhere: pass everything through
        empty = spark.createDataFrame(
            [], "graph_id string, bnode string, label string, color binary")
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
                       F.col("color").alias("s_color"))
    olab = leaf.select(F.col("graph_id").alias("g"), F.col("bnode").alias("n"),
                       F.col("color").alias("o_color"))
    th = (
        btri
        .join(slab, on=[btri.graph_id == slab.g, btri.subj == slab.n], how="left")
        .drop("g", "n")
        .join(olab, on=[btri.graph_id == olab.g, btri.obj == olab.n], how="left")
        .drop("g", "n")
        .select("graph_id", "comp",
                combine3_udf(F.coalesce("s_color", "s_static"),
                             F.col("pred_h"),
                             F.coalesce("o_color", "o_static")).alias("th"),
                )
    )
    ghc = unordered_sum_agg(th, ["graph_id", "comp"], "th", "ghc",
                            extra_init=BLANK_HASH)

    sizes = (btri.groupBy("graph_id", "comp").agg(F.count("*").alias("nt"))
             .join(leaf.groupBy("graph_id", "comp")
                   .agg(F.count("*").alias("nb")), ["graph_id", "comp"]))
    dup_w = Window.partitionBy("graph_id", F.hex(F.col("ghc")), "nt", "nb") \
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
        .withColumn("comb", combine2_udf(F.col("ghc"),
                                         hash_int_udf(F.col("mux_i"))))
        .select("graph_id", "comp", "comb", "contributes")
    ).localCheckpoint(True)

    colored = (
        leaf.join(comp_mux, ["graph_id", "comp"])
        .withColumn("color", combine2_udf(F.col("color"), F.col("comb")))
    )

    # ---- upg: graph-level unique hash (GraphLabelling.java:137-150) -------
    if upg:
        ground_th = ground.select(
            "graph_id",
            combine3_udf(md5_binary(F.col("subj")), md5_binary(F.col("pred")),
                         md5_binary(F.col("obj"))).alias("h"))
        comb_h = comp_mux.where("contributes").select("graph_id", F.col("comb").alias("h"))
        ghash = unordered_sum_agg(ground_th.union(comb_h), ["graph_id"],
                                  "h", "ghash", extra_init=BLANK_HASH)
        colored = (
            colored.join(ghash, "graph_id")
            .withColumn("color", combine2_udf(F.col("color"), F.col("ghash")))
        )

    labels = colored.select(
        "graph_id", "bnode",
        F.concat(F.lit("_:SK00"), F.lower(F.hex(F.col("color"))))
        .alias("label"),
        "color",
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
