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
from itertools import count as _itercount

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blabel_spark.hashing import MIN_LONG, enc_pair, get_hash_family
from blabel_spark.pair_kernels import (
    combine2_pairs_sql,
    combine3_pairs_sql,
    fold_messages,
    fold_pair_array_udf,
    hash_int_pair_udf_for,
    md5_pair,
    pair_hex,
    term_pair_exprs,
    unordered_sum_pairs_sql,
)

TRIPLE_COLS = ("graph_id", "subj", "pred", "obj")

# per-call sequence for fixpoint job-group names (see the loop)
_FIXPOINT_SEQ = _itercount()


def is_bnode_col(c):
    return F.col(c).startswith("_:")


def _mb(df: DataFrame, n_rows: int | None, limit: int) -> DataFrame:
    """Conditionally broadcast a dimension table whose exact row count is
    already known from a prior action.  Checkpointed tables report no
    size stats, so without the hint AQE plans every join against them as
    a full exchange of the big side.  Above ``limit`` rows the table may
    not fit executor memory and the plain co-partitioned shuffle join is
    the correct plan — the fallback keeps the 10^12-triple case honest
    while the per-component/per-bnode tables (≪ triples) ride broadcast
    hash joins whenever they fit."""
    if n_rows is not None and n_rows <= limit:
        return F.broadcast(df)
    return df


# checkpoint-release helpers live in blabel_spark.ckpt_util (shared with
# ops.dedup's cluster loop — ADVICE r5); the private aliases remain the
# names this module's call sites and tests use
from blabel_spark.ckpt_util import ckpt_rdd as _ckpt_rdd  # noqa: E402
from blabel_spark.ckpt_util import release as _release  # noqa: E402


@dataclass
class CanonResult:
    labelled: DataFrame         # (graph_id, subj, pred, obj) canonical
    labels: DataFrame           # (graph_id, bnode, label)
    metrics: dict = field(default_factory=dict)
    # checkpoint RDD handles still backing labelled/labels (btri, the CC
    # node table, the per-bnode label table).  Intermediates superseded
    # during the run are released before the result is returned.
    _retained: list = field(default_factory=list, repr=False)

    def unpersist(self, blocking: bool = False) -> None:
        """Release every checkpoint block still held for this result.
        Call once ``labelled``/``labels`` have been consumed (written or
        collected) — afterwards they can no longer be recomputed.  The
        session-hygiene hook for long-lived sessions running many
        corpora: without it each finished canonicalize keeps
        corpus-scale state in the block manager until a driver full-GC
        lets the ContextCleaner collect it."""
        for h in self._retained:
            if h is None:
                continue
            try:
                h.unpersist(blocking)
            except Exception:  # pragma: no cover
                pass
        self._retained = []


# ---------------------------------------------------------------------------
# connected components of blank nodes (HashGraph.blankNodePartition,
# HashGraph.java:260-304) — label propagation to fixpoint, component id =
# minimum bnode (the reference's pivot).
# ---------------------------------------------------------------------------

def _cc_kernel(btri: DataFrame) -> DataFrame:
    """Per-graph union-find — the reference's in-memory partition
    (HashGraph.blankNodePartition, HashGraph.java:260-304) inside one
    applyInPandas group per graph.  Right whenever single graphs fit a
    task (the transcript north-star case: a graph is one conversation);
    component id = minimum member bnode (pivot semantics)."""
    schema = "graph_id string, bnode string, comp string"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["graph_id"].iloc[0]
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, o in zip(pdf["subj"], pdf["obj"]):
            bs, bo = s.startswith("_:"), o.startswith("_:")
            if bs:
                parent.setdefault(s, s)
            if bo:
                parent.setdefault(o, o)
            if bs and bo:
                ra, rb = find(s), find(o)
                if ra != rb:
                    parent[rb] = ra
        groups: dict[str, list[str]] = {}
        for n in parent:
            groups.setdefault(find(n), []).append(n)
        rows = []
        for members in groups.values():
            m = min(members)
            rows.extend((g, n, m) for n in members)
        return pd.DataFrame(rows, columns=["graph_id", "bnode", "comp"])

    return (btri.select("graph_id", "subj", "obj")
            .groupBy("graph_id").applyInPandas(run, schema)
            .localCheckpoint(True))


def bnode_components(btri: DataFrame, max_iter: int = 64,
                     max_kernel_graph: int = 2_000_000,
                     graph_rows_bound: int | None = None) -> DataFrame:
    """(graph_id, bnode) → comp for every bnode in btri.

    Routing: when every graph fits one task (≤ ``max_kernel_graph``
    bnode-touching rows — the conversation-scale regime the north star
    targets), components come from the per-graph union-find kernel in ONE
    pass.  Oversized graphs fall back to the iterative loop below: each
    round does min-label propagation over edges AND a pointer-doubling
    jump (comp ← comp[comp]), so convergence takes O(log diameter) rounds
    — a 2^64-diameter chain would be needed to hit ``max_iter``, and
    hitting it raises instead of silently returning a split partition
    (components split across fake pivots would give conflicting canonical
    labels downstream).

    ``graph_rows_bound``: a caller-known UPPER bound on per-graph rows
    (canonicalize's routing probe already computes one) — when it is
    under ``max_kernel_graph`` the kernel route is taken without the
    probe aggregation here (one fewer corpus-wide job); otherwise the
    exact btri-row probe still decides."""
    if max_kernel_graph:
        if graph_rows_bound is not None and \
                graph_rows_bound <= max_kernel_graph:
            return _cc_kernel(btri)
        biggest = (btri.groupBy("graph_id").agg(F.count("*").alias("n"))
                   .agg(F.max("n").alias("m")).collect()[0]["m"]) or 0
        if biggest <= max_kernel_graph:
            return _cc_kernel(btri)
    ks0, ks1 = _ikey("graph_id", "subj")
    ko0, ko1 = _ikey("graph_id", "obj")
    nodes = (
        btri.where(is_bnode_col("subj"))
        .select("graph_id", F.col("subj").alias("bnode"),
                ks0.alias("k0"), ks1.alias("k1"))
        .union(btri.where(is_bnode_col("obj"))
               .select("graph_id", F.col("obj").alias("bnode"),
                       ko0.alias("k0"), ko1.alias("k1")))
        .distinct()
    )
    # edges keyed by interned node ids (join/shuffle on fixed-width longs;
    # the propagated comp label stays the min bnode STRING — the
    # reference's pivot semantics)
    edges = (
        btri.where(is_bnode_col("subj") & is_bnode_col("obj")
                   & (F.col("subj") != F.col("obj")))
        .select(ks0.alias("a0"), ks1.alias("a1"),
                ko0.alias("b0"), ko1.alias("b1"))
        .distinct()
    )
    sym = edges.union(edges.select(F.col("b0").alias("a0"),
                                   F.col("b1").alias("a1"),
                                   F.col("a0").alias("b0"),
                                   F.col("a1").alias("b1")))
    sym = sym.localCheckpoint(True)
    sym_h = _ckpt_rdd(sym)

    comp = nodes.withColumn("comp", F.col("bnode")).localCheckpoint(True)
    # each round's state supersedes the previous round's checkpoint the
    # moment the changed-count job materializes it — release superseded
    # blocks immediately so the loop retains O(1) tables, not O(rounds)
    prev_h = _ckpt_rdd(comp)
    pk0, pk1 = _ikey("graph_id", "comp")
    try:
        for _ in range(max_iter):
            # pointer doubling fused into the propagation join: besides the
            # real (symmetric) edges, every node contributes a virtual edge
            # comp(b) → b, so the min-aggregation sees comp(comp(b)) in the
            # SAME join — one shuffle per round, O(log diameter) rounds
            pointer = comp.select(pk0.alias("a0"), pk1.alias("a1"),
                                  F.col("k0").alias("b0"),
                                  F.col("k1").alias("b1"))
            compr = comp.select(F.col("k0").alias("n0"), F.col("k1").alias("n1"),
                                F.col("comp").alias("nbr_comp"))
            nbrs = sym.union(pointer)
            nbr_min = (
                nbrs.join(compr, on=[nbrs.a0 == compr.n0, nbrs.a1 == compr.n1])
                .groupBy("b0", "b1")
                .agg(F.min("nbr_comp").alias("nbr_comp"))
            )
            # lazy checkpoint + one action: the changed-count job materializes
            # the round's state and truncates lineage — one job per round,
            # not an eager-checkpoint job plus a count job
            new = (
                comp.join(nbr_min, on=[comp.k0 == nbr_min.b0,
                                       comp.k1 == nbr_min.b1], how="left")
                .select("graph_id", "bnode", "k0", "k1",
                        F.least("comp", F.coalesce("nbr_comp", "comp"))
                        .alias("comp"),
                        (F.col("comp") != F.least(
                            "comp", F.coalesce("nbr_comp", "comp")))
                        .alias("changed"))
            ).localCheckpoint(False)
            n_changed = new.where("changed").count()
            _release([prev_h])
            prev_h = _ckpt_rdd(new)
            comp = new.drop("changed")
            if n_changed == 0:
                # the final comp table stays (it IS the return value); only
                # the edge table dies with the loop
                _release([sym_h])
                return comp.drop("k0", "k1")
    except BaseException:
        # non-convergence (or any mid-loop failure) must not leak the
        # edge/round checkpoint blocks (ADVICE r5)
        _release([sym_h, prev_h])
        raise
    raise RuntimeError(
        f"bnode_components failed to converge in {max_iter} rounds — "
        "input graph pathologically deep or corrupted")


# ---------------------------------------------------------------------------
# preparation
# ---------------------------------------------------------------------------

SEP = "\x01"  # cannot occur inside an N3 term


def _ikey(*cols) -> tuple:
    """Flyweight term interning (S4, LabelRDFGraph.java:220-221 analogue):
    a deterministic 128-bit key for a (graph, term) or (graph, comp) tuple
    as two independently-seeded xxhash64 columns — pure codegen (native
    JVM hash, far cheaper than md5), no dictionary shuffle, stable across
    restarts (checkpoint-resume safe).  The fixpoint loop then shuffles,
    joins and sorts fixed-width longs instead of N3 strings; 128 bits keep
    the accidental-collision probability negligible at 10^12-row scale
    (same budget the colour digests already accept)."""
    return (F.xxhash64(F.lit(1), *[F.col(c) for c in cols]),
            F.xxhash64(F.lit(2), *[F.col(c) for c in cols]))



def _prepare_bnode_triples(triples: DataFrame, tp=md5_pair,
                           broadcast_rows: int = 0,
                           graph_rows_bound: int | None = None
                           ) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Split into (bnode-touching triples with comp, static hash pairs and
    interned key columns, ground triples, bnode→comp table, n_bnodes).

    btri columns beyond the triple: comp, (ck0, ck1) interned component
    key, (p0, p1) pred hash, (ss0, ss1)/(os0, os1) static term hashes when
    subj/obj is ground (null otherwise), (ks0, ks1)/(ko0, ko1) interned
    bnode keys when subj/obj is blank (null otherwise)."""
    tri = triples.select(*TRIPLE_COLS)
    has_b = is_bnode_col("subj") | is_bnode_col("obj")
    ground = tri.where(~has_b)
    btri = tri.where(has_b)

    comp = bnode_components(btri, graph_rows_bound=graph_rows_bound)
    # the bnode→comp table has one row per blank node (≪ triples): its
    # count is the n_bnodes metric AND the broadcast decision for the
    # decoration join below, which otherwise exchanges the whole btri set
    n_bnodes = comp.count()
    p0, p1 = tp(F.col("pred"))
    s0, s1 = tp(F.col("subj"))
    o0, o1 = tp(F.col("obj"))
    c0, c1 = _ikey("graph_id", "comp")
    k_s0, k_s1 = _ikey("graph_id", "subj")
    k_o0, k_o1 = _ikey("graph_id", "obj")
    # parallelism reset BEFORE the ten hash projections: the parquet scan
    # yields few input partitions at small SF (6 at sf0.1), and since the
    # comp decoration is a broadcast join nothing downstream would ever
    # re-exchange — every tail scan of the checkpointed btri (edge build,
    # per-triple hashes, relabel) would run at scan parallelism.  One
    # round-robin exchange of the raw strings here buys core-count
    # parallelism for the hash computation and every later btri pass.
    # Gated (ADVICE r4): skip when the comp join will NOT broadcast (its
    # shuffle re-exchanges btri on the join key anyway) or when the input
    # already has full parallelism — both would make this a wasted full
    # exchange of the raw triple strings at triple scale.  (Keying this
    # exchange on (ck0, ck1) instead was tried and is USELESS: localCheckpoint
    # under AQE captures UnknownPartitioning, so downstream aggregations
    # cannot see the co-partitioning — the mux tail repartitions itself.)
    parts = int(btri.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    comp_broadcasts = n_bnodes <= broadcast_rows
    if comp_broadcasts and btri.rdd.getNumPartitions() < parts:
        btri = btri.repartition(parts)
    # decoration join on the INTERNED anchor key, not the (graph_id,
    # anchor-string) pair: in the non-broadcast regime this join exchanges
    # and compares the full btri set, and hashing/sorting two fixed-width
    # longs is far cheaper than N3 strings (sf1 measured the string-keyed
    # variant as the single largest prep job).  The anchor of a row is its
    # subject when blank, else its (then necessarily blank) object, so the
    # key reuses the k_s/k_o interning exprs computed for btri anyway.
    ca0, ca1 = _ikey("graph_id", "bnode")
    comp_keyed = comp.select(ca0.alias("_a0"), ca1.alias("_a1"), "comp")
    ak0 = F.when(is_bnode_col("subj"), k_s0).otherwise(k_o0)
    ak1 = F.when(is_bnode_col("subj"), k_s1).otherwise(k_o1)
    btri = (
        btri.withColumn("_a0", ak0).withColumn("_a1", ak1)
        .join(_mb(comp_keyed, n_bnodes, broadcast_rows), ["_a0", "_a1"])
        .drop("_a0", "_a1")
        .withColumn("ck0", c0).withColumn("ck1", c1)
        .withColumn("p0", p0).withColumn("p1", p1)
        .withColumn("ss0", F.when(~is_bnode_col("subj"), s0))
        .withColumn("ss1", F.when(~is_bnode_col("subj"), s1))
        .withColumn("os0", F.when(~is_bnode_col("obj"), o0))
        .withColumn("os1", F.when(~is_bnode_col("obj"), o1))
        .withColumn("ks0", F.when(is_bnode_col("subj"), k_s0))
        .withColumn("ks1", F.when(is_bnode_col("subj"), k_s1))
        .withColumn("ko0", F.when(is_bnode_col("obj"), k_o0))
        .withColumn("ko1", F.when(is_bnode_col("obj"), k_o1))
    )
    return btri, ground, comp, n_bnodes


def _edge_views(btri: DataFrame, plus_pair=None,
                minus_pair=None) -> DataFrame:
    """The J1 message workload as ONE directed-edge table.

    Subject bnodes receive combineOrdered(h(obj), h(pred), PLUS); object
    bnodes combineOrdered(h(subj), h(pred), MINUS) (GraphColouring.java:
    505-534).  Rows with a ground other end (ot non-null) are the static
    messages — their value is constant across rounds and a pure-codegen
    combine at every scan; bnode→bnode rows (ok non-null) join the colour
    table each round.  Returned un-deduplicated: the caller dedups and
    checkpoints the single table once (set semantics: a duplicate input
    triple is exactly a duplicate edge row here, while distinct edges
    stay distinct even when their message values coincide).
    """
    def side(bcol, bk, ok, ot, mk):
        return btri.where(is_bnode_col(bcol)).select(
            "ck0", "ck1",
            F.col(f"{bk}0").alias("bk0"), F.col(f"{bk}1").alias("bk1"),
            F.col(f"{ok}0").alias("ok0"), F.col(f"{ok}1").alias("ok1"),
            F.col(f"{ot}0").alias("ot0"), F.col(f"{ot}1").alias("ot1"),
            "p0", "p1",
            F.lit(mk[0]).alias("mk0"), F.lit(mk[1]).alias("mk1"))

    return side("subj", "ks", "ko", "os", plus_pair) \
        .union(side("obj", "ko", "ks", "ss", minus_pair))


def _iteration_messages(static_msgs: DataFrame, bb_edges: DataFrame,
                        lab: DataFrame, lab_rows: int | None = None,
                        broadcast_rows: int = 0) -> DataFrame:
    # the other end's interned key (ok) is globally unique (128-bit over
    # graph_id+term), so the colour lookup joins on two longs only.  The
    # colour table shrinks as components converge and rides a broadcast
    # while it fits (lab_rows is exact, carried from the previous round's
    # convergence aggregation); above ``broadcast_rows`` — the 10^12-row
    # regime where no executor holds the colour table — the join becomes
    # a shuffle-hash build of the colour side against ``bb_edges``, which
    # was checkpointed pre-partitioned on (ok0, ok1) so ONLY the per-bnode
    # colour table exchanges each round and the edge table (triple-scale)
    # never re-shuffles across rounds.
    other_lab = lab.select(F.col("bk0").alias("_n0"),
                           F.col("bk1").alias("_n1"),
                           F.col("h0").alias("oc0"),
                           F.col("h1").alias("oc1"))
    if lab_rows is not None and lab_rows <= broadcast_rows:
        other_lab = F.broadcast(other_lab)
    else:
        other_lab = other_lab.hint("shuffle_hash")
    m0, m1 = combine3_pairs_sql("oc0", "oc1", "p0", "p1", "mk0", "mk1")
    dyn = (
        bb_edges
        .join(other_lab, on=[bb_edges.ok0 == other_lab._n0,
                             bb_edges.ok1 == other_lab._n1])
        .select("ck0", "ck1", "bk0", "bk1",
                m0.alias("m0"), m1.alias("m1"))
    )
    return static_msgs.union(dyn)


def _next_colors(msgs: DataFrame, lab: DataFrame,
                 salt_buckets: int = 0,
                 lab_rows: int | None = None) -> DataFrame:
    """A1: sort(messages + own previous colour), combineOrdered-fold
    (GraphColouring.java:542-548).  Previous colours are unioned in as
    message rows and sort into place.

    Default path: repartition+sort + segmented numpy fold (fold_messages).
    Salted path: range-bucket messages by their leading byte so a hub
    bnode's collect happens in ``salt_buckets`` balanced groups whose
    bucket-ordered arrays are re-sorted once per bnode and folded.
    """
    key = ["ck0", "ck1", "bk0", "bk1"]
    prev_rows = lab.select(*key, F.col("h0").alias("m0"),
                           F.col("h1").alias("m1"),
                           F.lit(True).alias("is_prev"))
    all_msgs = msgs.withColumn("is_prev", F.lit(False)).union(prev_rows)
    if salt_buckets and salt_buckets > 1:
        bucket = (F.shiftrightunsigned(
            F.col("m0").bitwiseXOR(F.lit(MIN_LONG)), 56)
            * salt_buckets / 256).cast("int")
        per_bucket = (
            all_msgs.withColumn("bucket", bucket)
            .groupBy(*key, "bucket")
            .agg(F.sort_array(F.collect_list(
                F.struct(F.col("m0").alias("h0"), F.col("m1").alias("h1"),
                         F.col("is_prev"))))
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
                             F.col("c.h1").alias("h1"),
                             F.col("c.oh0").alias("oh0"),
                             F.col("c.oh1").alias("oh1"))
    # late rounds shrink to a few active components: size the fold's
    # exchange to the known active-bnode count so a small round pays a
    # handful of Python-worker roundtrips instead of the full default
    # partition count (capped at the default — 10^12-row rounds are
    # unaffected; ≥ ~20k bnodes per task keeps Arrow batches efficient).
    # The target is used DIRECTLY (round 5 rounded it up to a multiple of
    # the core count against second-wave stragglers, but when target <
    # cores every task is < 20k bnodes by construction and the measured
    # ~4 ms/task Python-runner overhead dominates: 32 tasks where 6
    # suffice cost ~120 ms of pure launch overhead per round).
    parts = None
    if lab_rows:
        spark = msgs.sparkSession
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
        parts = min(default, max(1, lab_rows // 20_000 + 1))
    return fold_messages(all_msgs, parts)


def _kernel_colors(btri_kernel: DataFrame,
                   hash_name: str = "md5") -> DataFrame:
    """Finish automorphic components with the local branch-and-bound kernel
    (GraphColouring.traverse + minimum-leaf selection, GraphColouring.java:
    137-141,180-253), one applyInPandas group per (graph_id, comp)."""
    schema = ("graph_id string, comp string, bnode string, "
              "h0 long, h1 long")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from blabel_spark.canon.local import (
            _Colouring, graph_sort_key, is_bnode)
        from blabel_spark.hashing import enc_pair, get_hash_family
        hf = get_hash_family(hash_name)
        BH = hf.blank
        graph_id = pdf["graph_id"].iloc[0]
        comp = pdf["comp"].iloc[0]
        triples = sorted(set(zip(pdf["subj"], pdf["pred"], pdf["obj"])))
        static: dict[str, bytes] = {}
        colors: dict[str, bytes] = {}
        for t in triples:
            for term in t:
                if is_bnode(term):
                    colors[term] = BH
                elif term not in static:
                    static[term] = hf.hash_string(term)
        col = _Colouring(triples=triples, static=static, colors=colors,
                         path=[], leaves={}, colour_iters=[], hf=hf)
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

DEFAULT_MAX_ITERATIONS = 64
DEFAULT_SALT_BUCKETS = "auto"


def _lazy_checkpoint_ok(spark: SparkSession) -> bool:
    """Whether per-round LAZY localCheckpoints are sound on this session.

    ``RDD.doCheckpoint`` recursion stops at the first checkpoint-marked
    RDD unless ``spark.checkpoint.checkpointAllMarkedAncestors`` is set
    (a static conf — ``spark_util.get_spark`` sets it): with two stacked
    lazy checkpoints (colours under the convergence table) the inner one
    would never truncate and per-round plans DOUBLE (diagnosed from event
    logs in round 4: job stage counts growing ~3/round, "Broadcasting
    large task binary" warnings).  On foreign sessions the loop falls
    back to an eager (own-job) colour checkpoint — two jobs per round."""
    return (spark.sparkContext.getConf().get(
        "spark.checkpoint.checkpointAllMarkedAncestors", "false")
        == "true")


def _warn_by_graph_ignores(metrics: dict, checkpoint_dir, max_iterations,
                           salt_buckets) -> None:
    """The per-graph kernel route has no mid-fixpoint state, so
    fixpoint-only knobs are inert there.  A run the user believes is
    resumable via ``checkpoint_dir`` is not — say so loudly and record it
    in metrics instead of silently dropping the options.  The non-default
    tests reference the same DEFAULT_* constants as the canonicalize
    signature, so a changed default cannot silently drift this check."""
    ignored = []
    if checkpoint_dir:
        ignored.append("checkpoint_dir")
    if max_iterations != DEFAULT_MAX_ITERATIONS:
        ignored.append("max_iterations")
    if salt_buckets not in (DEFAULT_SALT_BUCKETS, 0):
        ignored.append("salt_buckets")
    if ignored:
        import warnings
        metrics["ignored_options"] = ignored
        warnings.warn(
            f"canonicalize took the per-graph kernel route; options "
            f"{ignored} only apply to the distributed fixpoint and were "
            f"ignored (pass route='fixpoint' to force the resumable path)",
            stacklevel=3)

def canonicalize(spark: SparkSession, triples: DataFrame, *,
                 dip: bool = True, upg: bool = True,
                 hash_name: str = "md5",
                 max_iterations: int = DEFAULT_MAX_ITERATIONS,
                 salt_buckets: int | str = DEFAULT_SALT_BUCKETS,
                 route: str = "auto",
                 kernel_graph_rows: int = 100_000,
                 broadcast_rows: int = 2_000_000,
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

    Routing (``route="auto"``): when every graph fits one task
    (≤ ``kernel_graph_rows`` rows — the per-document regime the reference
    always runs in, and the north-star transcript case where one graph is
    one conversation) the corpus is labelled by the per-graph kernel in a
    single embarrassingly-parallel pass; the distributed pair fixpoint
    below handles graphs too large for a task and any run that needs
    mid-fixpoint checkpointing.  Both paths are bit-identical (parity
    tests assert it); ``route="fixpoint"`` / ``route="by_graph"`` force a
    path.

    ``broadcast_rows``: per-component / per-bnode dimension tables whose
    exact counts are known (from actions the loop performs anyway) join
    via broadcast when at most this many rows — above it every such join
    falls back to the co-partitioned exchange.  2M rows ≈ 100-300 MB
    broadcast, safe for ordinary executors; tune down for small ones.
    """
    import time as _time
    _t0 = _time.time()
    metrics: dict = {}
    # F2 hash-family selection (-s, LabelRDFGraph.java:150-161): any
    # 16-byte family rides the int64-pair engine; wider families (sha1/
    # sha256/sha512) go through the per-graph kernel path instead
    hf = get_hash_family(hash_name)
    if hf.n_bytes != 16:
        res = canonicalize_by_graph(spark, triples, hash_name=hash_name,
                                    dip=dip, upg=upg)
        _warn_by_graph_ignores(res.metrics, checkpoint_dir, max_iterations,
                               salt_buckets)
        return res
    # ONE probe pass serves P6 validation (bnode predicates fail loudly,
    # as in the local oracle) and the routing decision
    probe = (triples.groupBy("graph_id")
             .agg(F.count("*").alias("n"),
                  F.max(F.when(is_bnode_col("pred"), 1).otherwise(0))
                  .alias("badp"))
             .agg(F.max("n").alias("maxn"), F.max("badp").alias("badp"))
             .collect()[0])
    if probe["badp"]:
        raise ValueError("blank node in predicate position")
    biggest = probe["maxn"] or 0
    metrics["max_graph_rows"] = int(biggest)
    if route == "by_graph" or (
            route == "auto" and checkpoint_dir is None
            and biggest <= kernel_graph_rows):
        res = canonicalize_by_graph(spark, triples, hash_name=hash_name,
                                    dip=dip, upg=upg)
        res.metrics.update(metrics)
        res.metrics["t_total_s"] = round(_time.time() - _t0, 3)
        _warn_by_graph_ignores(res.metrics, checkpoint_dir, max_iterations,
                               salt_buckets)
        return res

    tp = term_pair_exprs(hash_name)
    blank_pair = enc_pair(hf.blank)
    plus_pair = enc_pair(hf.plus)
    minus_pair = enc_pair(hf.minus)
    # duplicate-mux digest: pure codegen for md5 (hash_int_pair_sql),
    # Arrow UDF only for the non-default 16-byte families
    if hash_name == "md5":
        from blabel_spark.pair_kernels import hash_int_pair_sql
        mx_exprs = hash_int_pair_sql
    else:
        _udf = hash_int_pair_udf_for(hash_name)

        def mx_exprs(c):
            p = _udf(c)
            return p.getField("h0"), p.getField("h1")
    # RDF graphs are triple SETS (the reference loads into HashGraph /
    # TreeSet structures), but a whole-corpus dropDuplicates here would
    # cost an extra full-input shuffle.  Set semantics are instead
    # enforced inside shuffles that already exist: the edge views dedupe
    # during their one-time materialization (narrow all-long tables), the
    # graph/upg hash folds run over deduplicated per-triple hash rows,
    # the kernels normalize their groups to sets, and the labelled output
    # is dropDuplicates'd
    triples = triples.select(*TRIPLE_COLS)
    btri, ground, node_comp, n_bnodes = _prepare_bnode_triples(
        triples, tp, broadcast_rows, graph_rows_bound=biggest)
    btri = btri.localCheckpoint(True)
    # checkpoint-block bookkeeping: handles whose blocks back the FINAL
    # result (released only by CanonResult.unpersist) vs loop-era state
    # released the moment its last consumer materializes
    result_handles = [_ckpt_rdd(btri), _ckpt_rdd(node_comp)]
    metrics["bnode_triples"] = btri.count()
    metrics["n_bnodes"] = n_bnodes
    metrics["t_prep_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    ckpt = None
    restored = None
    if checkpoint_dir:
        from blabel_spark.sources.io import FixpointCheckpoint
        ckpt = FixpointCheckpoint(spark, checkpoint_dir)
        restored = ckpt.restore()

    # set semantics for the message workload: the edge views dedupe per
    # side (a static row can never equal a bnode→bnode row — the ot/ok
    # nullability differs — so per-side dedup == dedup of the union) and
    # each side materializes ONCE in its loop shape:
    # * static messages are pre-combined to (ck, bk, m) — their value is
    #   constant across rounds, and materializing the combine here keeps
    #   the ~200-node combine3 lane tree OUT of every round's plan
    #   analysis and map stage (round 5 recomputed it per round);
    # * bnode→bnode edges are pre-partitioned on the colour lookup key:
    #   when the colour table outgrows broadcast_rows, each round's
    #   shuffle-hash join then exchanges only the (per-bnode, shrinking)
    #   colour table — never this (triple-scale) side.
    edges_raw = _edge_views(btri, plus_pair, minus_pair)
    sm0, sm1 = combine3_pairs_sql("ot0", "ot1", "p0", "p1", "mk0", "mk1")
    static_msgs = (
        edges_raw.where(F.col("ot0").isNotNull())
        .drop("ok0", "ok1").dropDuplicates()
        .select("ck0", "ck1", "bk0", "bk1",
                sm0.alias("m0"), sm1.alias("m1"))
    ).localCheckpoint(True)
    bb_edges = (
        edges_raw.where(F.col("ot0").isNull())
        .drop("ot0", "ot1").dropDuplicates()
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")),
                     "ok0", "ok1")
    ).localCheckpoint(True)
    # loop-era checkpoints: dead once `leaf` (their last consumer)
    # materializes
    loop_handles = [_ckpt_rdd(static_msgs), _ckpt_rdd(bb_edges)]

    if salt_buckets == "auto":
        # hub probe: a bnode's per-round fold size == its message count,
        # and degree ≤ 2 × its graph's rows — when even the biggest graph
        # is below the salting threshold no bnode can be a hub and the
        # probe is skipped outright.  Otherwise one aggregation over the
        # checkpointed edge table decides whether the salted two-stage
        # fold is worth its extra shuffle — degree-skewed hub entities
        # are exactly the north_rule's "salted repartitioning" case, and
        # the decision must not rely on a human noticing the skew.
        if 2 * biggest < (1 << 17):
            salt_buckets = 0
            metrics["max_bnode_degree_bound"] = 2 * biggest
        else:
            deg = (static_msgs.select("bk0", "bk1")
                   .union(bb_edges.select("bk0", "bk1"))
                   .groupBy("bk0", "bk1")
                   .agg(F.count("*").alias("n"))
                   .agg(F.max("n").alias("m")).collect()[0]["m"]) or 0
            metrics["max_bnode_degree"] = int(deg)
            salt_buckets = 0 if deg < (1 << 17) else \
                min(256, int(deg) >> 15)
    metrics["salt_buckets"] = int(salt_buckets)

    CK = ["ck0", "ck1"]
    if restored is not None:
        it, lab, conv_prev, res_df, kern_df = restored
        metrics["resumed_from_iteration"] = it
        resolved = [res_df] if res_df is not None else []
        kernel_parts = [kern_df] if kern_df is not None else []
        active = conv_prev.select(*CK).localCheckpoint(True)
        loop_handles.append(_ckpt_rdd(active))
        n_act = conv_prev.count()
        n_lab_rows = lab.count()
        prev_round = []
    else:
        # node_comp already holds exactly one row per (graph, bnode): the
        # initial colour table is pure codegen over it — no distinct
        # exchange over the edge endpoints
        lc0, lc1 = _ikey("graph_id", "comp")
        lb0, lb1 = _ikey("graph_id", "bnode")
        lab = (
            node_comp.select(lc0.alias("ck0"), lc1.alias("ck1"),
                             lb0.alias("bk0"), lb1.alias("bk1"))
            .withColumn("h0", F.lit(blank_pair[0]))
            .withColumn("h1", F.lit(blank_pair[1]))
        ).localCheckpoint(True)

        conv_prev = lab.groupBy(*CK).agg(F.lit(1).alias("prev_nc"))
        # round 1 is the initial colour table's only consumer: retire it
        # with that round like any other superseded round state
        prev_round = [(_ckpt_rdd(lab), False)]
        # free upper bound for round-1 broadcast decisions (components ≤
        # bnodes); the exact count lands in metrics after round 1
        n_act = n_bnodes
        n_lab_rows = n_bnodes

        resolved: list[DataFrame] = []
        kernel_parts: list[DataFrame] = []
        active = None  # None = every component is active
        it = 0
    metrics["n_components"] = n_act
    # per-iteration observability: one entry per round with component
    # status counts and wall times (the "per-partition lineage + metrics"
    # north_rule line, at fixpoint granularity)
    iter_log: list[dict] = []
    _sc = spark.sparkContext
    # per-CALL nonce in the job-group name: statusTracker matches groups
    # by string over the whole application, so a bare "it{N}" collides
    # with every earlier canonicalize in the session and inflates the
    # recorded job/stage counts for early rounds (prior runs all have a
    # round N, fewer reach round N+5 — the decaying-counts signature)
    _run_tag = next(_FIXPOINT_SEQ)
    while True:
        it += 1
        _it_t0 = _time.time()
        # every job this round fires (eager-fallback checkpoint + status
        # collect, or just the collect on the lazy path) runs under a
        # per-round job group: iterations_log records the round's job and
        # stage counts, which MUST stay flat across rounds — growth is the
        # lazy-checkpoint lineage bug (see _lazy_checkpoint_ok), and the
        # regression test pins exactly this invariant.
        _grp = f"blabel-fixpoint-r{_run_tag}-it{it}"
        # setJobGroup clobbers three thread-local properties — snapshot
        # and restore ALL of them, not just the group id, so a caller's
        # job description / interruptOnCancel survive the loop (ADVICE r5)
        _prev_props = {p: _sc.getLocalProperty(p) for p in (
            "spark.jobGroup.id", "spark.job.description",
            "spark.job.interruptOnCancel")}
        _sc.setJobGroup(_grp, "colour-refinement round")
        sm = static_msgs if active is None else \
            static_msgs.join(_mb(active, n_act, broadcast_rows),
                             CK, "left_semi")
        msgs = _iteration_messages(sm, bb_edges, lab, n_lab_rows,
                                   broadcast_rows)
        # ONE driver-sequenced job per round (was three: eager fold
        # checkpoint + eager convergence checkpoint + status collect).
        # Both checkpoints are LAZY: the single status collect below runs
        # fold → audit → status as one job, materializing both tables'
        # cached blocks for every later consumer; lineage still truncates
        # at materialization, so plans stay constant-size across rounds.
        # The reference's loop likewise does colouring + partition rebuild
        # + termination test in one in-memory pass per round
        # (GraphColouring.java:463-666) — this is its driver-barrier
        # analogue: iteration count scales with component diameter, so
        # per-round fixed latency is the loop's only serial section.
        # CAUTION: lazy is only sound when doCheckpoint recurses past the
        # first marked RDD (spark.checkpoint.checkpointAllMarkedAncestors,
        # set by spark_util.get_spark) — otherwise the colour table under
        # the marked convergence table would never truncate and per-round
        # plans double in size; on foreign sessions fall back to an eager
        # (own-job) colour checkpoint, i.e. two jobs per round.
        new_lab = _next_colors(msgs, lab, salt_buckets, n_lab_rows) \
            .localCheckpoint(not _lazy_checkpoint_ok(spark))

        # convergence + refinement audit riding the fold output: the fold
        # passes each bnode's previous colour through (oh columns), so we
        # verify every round strictly REFINES the partition (each new
        # class lies inside one old class ⇔ #distinct(old,new) pairs ==
        # #distinct new) with no extra join against the previous state.
        # An md5 collision that merges classes while the component still
        # grows would otherwise keep status 'active' and silently diverge
        # from the oracle (GraphColouring.java:563-635 recovers
        # deterministically — here violating components route to the
        # kernel, which has that recovery).  Staged two-level aggregation
        # instead of multi-countDistinct: Spark plans the latter as an
        # Expand that triples the bnode rows before the exchange, while
        # these stages collapse rows map-side at every step.
        pair_cnt = (new_lab.groupBy(*CK, "oh0", "oh1", "h0", "h1")
                    .agg(F.count("*").alias("npair")))
        newc = (pair_cnt.groupBy(*CK, "h0", "h1")
                .agg(F.sum("npair").alias("nb_h"),
                     F.count("*").alias("n_old")))
        # the previous round's class count rides the SAME aggregation as
        # tagged union rows instead of a per-round broadcast join: every
        # active component contributes exactly one prev row (conv_prev is
        # derived from the previous conv, or the round-1 seed), so
        # max(prev_nc) recovers it and count(nb_h) still counts only the
        # real colour-class rows — one fewer broadcast build per round,
        # same status arithmetic.
        nul = F.lit(None).cast("long")
        conv = (
            newc.select(*CK, "nb_h", "n_old", nul.alias("prev_nc"))
            .union(conv_prev.select(
                *CK, nul.alias("nb_h"), nul.alias("n_old"),
                F.col("prev_nc").cast("long")))
            .groupBy(*CK)
            .agg(F.count("nb_h").alias("nc"), F.sum("nb_h").alias("nb"),
                 F.sum("n_old").alias("ncross"),
                 F.max("prev_nc").alias("prev_nc"))
            .withColumn("status",
                        F.when(F.col("ncross") != F.col("nc"), "stalled")
                        .when(F.col("nc") == F.col("nb"), "discrete")
                        .when(F.col("nc") <= F.col("prev_nc"), "stalled")
                        .otherwise("active"))
        ).localCheckpoint(False)

        try:
            crows = conv.groupBy("status") \
                .agg(F.count("*").alias("n"),
                     F.sum("nb").alias("b")).collect()
        finally:
            for _p, _v in _prev_props.items():
                _sc.setLocalProperty(_p, _v)
        _st = _sc.statusTracker()
        _jids = _st.getJobIdsForGroup(_grp)
        _jinfos = [_st.getJobInfo(j) for j in _jids]
        counts = {r["status"]: int(r["n"]) for r in crows}
        bcounts = {r["status"]: int(r["b"]) for r in crows}
        if it == 1 and restored is None:
            metrics["n_components"] = sum(counts.values())
        iter_log.append({"iteration": it,
                         "t_round_s": round(_time.time() - _it_t0, 3),
                         "n_jobs": len(_jids),
                         "n_stages": sum(len(i.stageIds) for i in _jinfos
                                         if i is not None),
                         **{f"n_{k}": int(v) for k, v in counts.items()}})
        done_comps = conv.where(F.col("status") == "discrete").select(*CK)
        stall_comps = conv.where(F.col("status") == "stalled").select(*CK)

        if counts.get("discrete"):
            resolved.append(new_lab.drop("oh0", "oh1")
                            .join(_mb(done_comps, counts["discrete"],
                                      broadcast_rows), CK, "left_semi"))
        if counts.get("stalled"):
            kernel_parts.append(btri.join(
                _mb(stall_comps, counts["stalled"], broadcast_rows),
                CK, "left_semi"))

        # the previous round's checkpoints are superseded the moment this
        # round's status collect materializes the new pair: release them
        # NOW unless a resolved/kernel view still reads them (those are
        # consumed when `leaf` materializes) — the loop then retains O(1)
        # round tables instead of O(rounds), which at corpus scale is the
        # difference between a bounded block-manager footprint and
        # memory-squeezing dead state for the rest of the session
        for h, contributed in prev_round:
            (loop_handles.append(h) if contributed else _release([h]))
        prev_round = [(_ckpt_rdd(new_lab),
                       bool(counts.get("discrete"))),
                      (_ckpt_rdd(conv),
                       bool(counts.get("discrete"))
                       or bool(counts.get("stalled")))]

        n_active = counts.get("active", 0)
        if n_active == 0 or it >= max_iterations:
            if n_active and it >= max_iterations:
                # over-budget components fall back to the kernel (the
                # reference uses wall-clock timeouts per document,
                # RunNQuadsTest.java:76)
                kernel_parts.append(btri.join(
                    _mb(conv.where(F.col("status") == "active")
                        .select(*CK), n_active, broadcast_rows),
                    CK, "left_semi"))
                metrics["over_budget_comps"] = n_active
            break

        active = conv.where(F.col("status") == "active").select(*CK)
        # lazy view over the checkpointed new_lab: both consumers (message
        # join, previous-colour rows) rescan it through a broadcast
        # semi-join — cheaper than materializing a fourth table per round
        lab = new_lab.drop("oh0", "oh1") \
            .join(_mb(active, n_active, broadcast_rows), CK, "left_semi")
        conv_prev = conv.where(F.col("status") == "active") \
            .select(*CK, F.col("nc").alias("prev_nc"))
        n_act = n_active
        n_lab_rows = bcounts.get("active", 0)

        if ckpt is not None and it % checkpoint_every == 0:
            res_u = resolved[0] if resolved else None
            for p in (resolved[1:] if resolved else []):
                res_u = res_u.union(p)
            ker_u = kernel_parts[0] if kernel_parts else None
            for p in (kernel_parts[1:] if kernel_parts else []):
                ker_u = ker_u.union(p)
            ckpt.commit(it, lab, conv_prev, res_u, ker_u)

    metrics["colour_iterations"] = it
    metrics["iterations_log"] = iter_log
    metrics["t_loop_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()
    # final-round tables feed the resolved/kernel views consumed by leaf
    # below (incl. the over-budget path's conv reference) — release them
    # with the rest of the loop-era state once leaf has materialized
    loop_handles.extend(h for h, _ in prev_round)

    # leaf colours: distributed-discrete ∪ kernel output (interned schema)
    parts = list(resolved)
    if kernel_parts:
        kb = kernel_parts[0]
        for p in kernel_parts[1:]:
            kb = kb.union(p)
        kc = _kernel_colors(kb, hash_name)
        c0, c1 = _ikey("graph_id", "comp")
        b0, b1 = _ikey("graph_id", "bnode")
        parts.append(kc.select(c0.alias("ck0"), c1.alias("ck1"),
                               b0.alias("bk0"), b1.alias("bk1"),
                               "h0", "h1"))
    if not parts:
        # bnode-free corpus: the result references none of our state
        empty = spark.createDataFrame(
            [], "graph_id string, bnode string, label string")
        _release(loop_handles + result_handles)
        return CanonResult(triples.select(*TRIPLE_COLS).dropDuplicates(),
                           empty, metrics)
    leaf = parts[0]
    for p in parts[1:]:
        leaf = leaf.union(p)
    leaf = leaf.localCheckpoint(True)
    n_leaf = leaf.count()
    # leaf (just materialized) was the last consumer of every loop-era
    # table: the edge tables, the initial colours and each round's
    # surviving new_lab/conv blocks all die here
    _release(loop_handles)
    # per-component broadcast bound: exact after a fresh round 1; on a
    # resumed run only the still-active count was seen, so fall back to
    # the safe per-bnode upper bound (components ≤ bnodes)
    n_comps = metrics["n_components"] if restored is None else n_leaf
    metrics["t_leaf_kernel_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    # ---- per-component canonical hash + mux (GraphColouring.java:121-168,
    # GraphLabelling.java:100-119) ----------------------------------------
    # btrij: triple hash columns decorated with their endpoints' leaf
    # colours, joined on interned long keys — all fixed-width longs, no
    # strings; consumed once by the per-triple hash below.  leaf is
    # per-bnode (≪ triples): broadcast when it fits so the decoration is
    # map-side and btri is never re-exchanged — the distributed analogue
    # of GraphColouring.labelBlankNodes's O(triples) single pass over an
    # in-memory colour map (GraphColouring.java:433-451); above
    # broadcast_rows both joins fall back to shuffles.
    slab = _mb(
        leaf.select(F.col("bk0").alias("_s0"), F.col("bk1").alias("_s1"),
                    F.col("h0").alias("sc0"), F.col("h1").alias("sc1")),
        n_leaf, broadcast_rows)
    olab = _mb(
        leaf.select(F.col("bk0").alias("_o0"), F.col("bk1").alias("_o1"),
                    F.col("h0").alias("oc0"), F.col("h1").alias("oc1")),
        n_leaf, broadcast_rows)
    btrij = (
        btri
        .join(slab, on=[btri.ks0 == slab._s0, btri.ks1 == slab._s1],
              how="left").drop("_s0", "_s1")
        .join(olab, on=[btri.ko0 == olab._o0, btri.ko1 == olab._o1],
              how="left").drop("_o0", "_o1")
        .select("graph_id", "ck0", "ck1", "p0", "p1", "ss0", "ss1",
                "os0", "os1", "sc0", "sc1", "oc0", "oc1")
    )

    tm0, tm1 = combine3_pairs_sql(
        F.coalesce("sc0", "ss0"), F.coalesce("sc1", "ss1"),
        F.col("p0"), F.col("p1"),
        F.coalesce("oc0", "os0"), F.coalesce("oc1", "os1"))
    # per-triple hash rows, deduplicated (set semantics; distinct triples
    # have distinct (t0, t1) because leaf colours are injective, so this
    # 4-long dropDuplicates IS triple dedup, far narrower than shuffling
    # the string triples).  This one exchange is the tail's structural
    # minimum: a pre-keyed single-exchange variant (repartition on
    # (ck0, ck1) feeding both the distinct and the fold) measured a
    # consistent +13% REGRESSION in an interleaved A/B at sf0.1 — the
    # fold's second exchange is already collapsed by partial aggregation
    # (per-partition lane sums ≈ n_comps × n_partitions rows at any
    # scale), so the explicit keying only forfeits map-side dedup and the
    # balanced 4-key hash (BENCH.md round 5).
    th = btrij.select("ck0", "ck1", tm0.alias("t0"), tm1.alias("t1")) \
        .dropDuplicates()
    cd0, cd1 = _ikey("graph_id", "comp")
    # ONE aggregation over the per-bnode comp table yields BOTH the
    # (graph_id, comp) decode dictionary AND the component's bnode count
    # (the groupBy is the distinct) — replaces a distinct + a separate
    # leaf-side sizes aggregation + their two broadcast joins with one
    comp_sizes = (node_comp.groupBy("graph_id", "comp")
                  .agg(F.count("*").alias("nb"))
                  .withColumn("ck0", cd0).withColumn("ck1", cd1))
    # the component hash fold also emits the component's triple count
    # (nt) from the same two passes — no separate aggregation over th
    ghc = unordered_sum_pairs_sql(th, ["ck0", "ck1"], "t0", "t1",
                                  "g0", "g1", extra_init=blank_pair,
                                  count_col="nt") \
        .join(_mb(comp_sizes, n_comps, broadcast_rows), ["ck0", "ck1"])

    # duplicate-component key: with set-semantic input (deduped above) and
    # injective leaf colours, (g0, g1) is the unordered fold over the
    # component's exact distinct labelled triple set — the distributed
    # analogue of the oracle's graphs_seen TreeSet equality
    # (GraphLabelling.java:100-119); (nt, nb) guard the astronomically
    # rare md5 digest collision between non-isomorphic components
    dup_w = Window.partitionBy("graph_id", "g0", "g1", "nt", "nb") \
                  .orderBy("comp")
    comp_mux = (
        ghc
        .withColumn("rank", F.row_number().over(dup_w))
        # duplicate mux ints: first copy 0, then count+1 = 2, 3, ...
        # (GraphLabelling.java:100-119 passing count+1 to getCanonicalGraph)
        .withColumn("mux_i",
                    F.when(F.col("rank") == 1, F.lit(0))
                    .otherwise(F.col("rank")) if dip else F.lit(0))
        .withColumn("contributes",
                    F.lit(True) if dip else (F.col("rank") == 1))
        .withColumns(dict(zip(("mx0", "mx1"), mx_exprs(F.col("mux_i")))))
        .select("graph_id", "ck0", "ck1", "contributes",
                *(c.alias(n) for c, n in zip(combine2_pairs_sql(
                    "g0", "g1", F.col("mx0"), F.col("mx1")),
                    ("cb0", "cb1"))))
    ).localCheckpoint(True)
    comp_mux_h = _ckpt_rdd(comp_mux)
    metrics["t_comp_mux_s"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()

    # ---- upg: graph-level unique hash (GraphLabelling.java:137-150),
    # merged into the per-component mux table so every downstream consumer
    # needs ONE compact join + ONE combine3 (combine2(combine2(h,cb),gh)
    # == combine3(h,cb,gh), identical lane arithmetic) ---------------------
    if upg:
        gs0, gs1 = tp(F.col("subj"))
        gp0, gp1 = tp(F.col("pred"))
        go0, go1 = tp(F.col("obj"))
        gm0, gm1 = combine3_pairs_sql("a0", "a1", "b0", "b1", "c0", "c1")
        ground_th = (ground.select(
            "graph_id", gs0.alias("a0"), gs1.alias("a1"),
            gp0.alias("b0"), gp1.alias("b1"),
            go0.alias("c0"), go1.alias("c1"))
            .select("graph_id", gm0.alias("t0"), gm1.alias("t1"))
            .dropDuplicates())
        comb_h = comp_mux.where("contributes").select(
            "graph_id", F.col("cb0").alias("t0"), F.col("cb1").alias("t1"))
        ghash = unordered_sum_pairs_sql(ground_th.union(comb_h),
                                        ["graph_id"], "t0", "t1",
                                        "gh0", "gh1",
                                        extra_init=blank_pair)
        # per-graph table, rows ≤ n_components
        mux = comp_mux.join(_mb(ghash, n_comps, broadcast_rows),
                            "graph_id") \
            .select("ck0", "ck1", "cb0", "cb1", "gh0", "gh1")

        def final_pair(h0, h1):
            return combine3_pairs_sql(h0, h1, F.col("cb0"), F.col("cb1"),
                                      F.col("gh0"), F.col("gh1"))
    else:
        mux = comp_mux.select("ck0", "ck1", "cb0", "cb1")

        def final_pair(h0, h1):
            return combine2_pairs_sql(h0, h1, F.col("cb0"), F.col("cb1"))

    # final per-bnode label: ONE final_pair fold over the per-bnode leaf
    # table — the final colour is a pure function of (leaf colour,
    # component mux row), so computing it per triple occurrence (as a
    # fused in-row relabel would) repeats the same fold once per edge
    fc0, fc1 = final_pair(F.col("h0"), F.col("h1"))
    leaf_final = (
        leaf.join(_mb(mux, n_comps, broadcast_rows), ["ck0", "ck1"])
        .select("bk0", "bk1",
                F.concat(F.lit("_:SK00"), pair_hex(fc0, fc1))
                .alias("label"))
    ).localCheckpoint(True)
    # leaf_final (just materialized) supersedes both the raw leaf colours
    # and the per-component mux table — release them; the result now rides
    # on exactly three checkpoints: btri, node_comp, leaf_final
    _release([_ckpt_rdd(leaf), comp_mux_h])
    result_handles.append(_ckpt_rdd(leaf_final))
    # bnode decode dictionary: the CC node table already holds one row per
    # distinct (graph, bnode) and is checkpointed — attach keys by codegen,
    # no extra distinct shuffle
    dk0, dk1 = _ikey("graph_id", "bnode")
    bnode_dict = node_comp.select("graph_id", "bnode",
                                  dk0.alias("bk0"), dk1.alias("bk1"))
    labels = (leaf_final
              .join(_mb(bnode_dict, n_bnodes, broadcast_rows),
                    ["bk0", "bk1"])
              .select("graph_id", "bnode", "label"))
    metrics["t_mux_s"] = round(_time.time() - _t0, 3)

    # ---- relabel (GraphColouring.labelBlankNodes): two map-side joins of
    # the original triples against the per-bnode label dictionary on
    # interned long keys — no per-triple hash folds, no string-keyed joins
    sl = _mb(leaf_final.select(F.col("bk0").alias("_s0"),
                               F.col("bk1").alias("_s1"),
                               F.col("label").alias("_slab")),
             n_leaf, broadcast_rows)
    ol = _mb(leaf_final.select(F.col("bk0").alias("_o0"),
                               F.col("bk1").alias("_o1"),
                               F.col("label").alias("_olab")),
             n_leaf, broadcast_rows)
    labelled = (
        btri
        .join(sl, on=[btri.ks0 == sl._s0, btri.ks1 == sl._s1], how="left")
        .join(ol, on=[btri.ko0 == ol._o0, btri.ko1 == ol._o1], how="left")
        .select("graph_id",
                F.coalesce("_slab", "subj").alias("subj"),
                "pred",
                F.coalesce("_olab", "obj").alias("obj"))
        .union(ground)
        .dropDuplicates()
    )
    return CanonResult(labelled, labels, metrics,
                       _retained=result_handles)


# ---------------------------------------------------------------------------
# per-graph kernel canonicalizer — the reference's per-document execution
# shape (RunNQuadsTest.java:257-451): each graph is labelled whole by the
# golden-tested local kernel inside one Arrow-batched applyInPandas group.
# Used for hash families wider than 16 bytes (sha1/sha256/sha512, which do
# not fit the int64-pair fixpoint representation) and available as a
# general fallback; graphs are embarrassingly parallel across the cluster
# but each graph must fit a single task.
# ---------------------------------------------------------------------------

def canonicalize_by_graph(spark: SparkSession, triples: DataFrame, *,
                          hash_name: str = "md5", dip: bool = True,
                          upg: bool = True, max_leaves: int | None = None,
                          n_buckets: int | None = None) -> CanonResult:
    out_schema = ("graph_id string, kind string, a string, b string, "
                  "c string")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from blabel_spark.canon.local import (
            HashCollisionError, SearchBudgetExceeded, label_graph)
        rows = []
        # one Arrow group carries MANY graphs (bucketed below) — per-graph
        # scheduling overhead is amortized, essential when the corpus is
        # millions of conversation-sized graphs
        for g, gpdf in pdf.groupby("graph_id", sort=False):
            trips = list(zip(gpdf["subj"], gpdf["pred"], gpdf["obj"]))
            try:
                res = label_graph(trips, dip=dip, upg=upg,
                                  hash_name=hash_name,
                                  max_leaves=max_leaves)
            except (SearchBudgetExceeded, HashCollisionError) as e:
                # a pathological graph must not sink the corpus job: pass
                # its triples through unlabelled and report it, the
                # reference's per-document timeout behaviour
                # (RunNQuadsTest.java:296-320)
                rows.extend((g, "t", s, p, o)
                            for s, p, o in sorted(set(trips)))
                rows.append((g, "e", type(e).__name__, str(e)[:200], ""))
                continue
            rows.extend((g, "t", s, p, o) for s, p, o in res.graph)
            rows.extend((g, "l", n, "_:SK00" + c.hex(), "")
                        for n, c in sorted(res.colors.items()))
        return pd.DataFrame(rows,
                            columns=["graph_id", "kind", "a", "b", "c"])

    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions")) * 4
    # no input dedupe needed: label_graph normalizes its group to a set
    out = (triples.select(*TRIPLE_COLS)
           .withColumn("_b", F.pmod(F.xxhash64("graph_id"),
                                    F.lit(n_buckets)))
           .groupBy("_b").applyInPandas(run, out_schema)
           ).localCheckpoint(True)
    labelled = (out.where(F.col("kind") == "t")
                .select("graph_id", F.col("a").alias("subj"),
                        F.col("b").alias("pred"), F.col("c").alias("obj")))
    labels = (out.where(F.col("kind") == "l")
              .select("graph_id", F.col("a").alias("bnode"),
                      F.col("b").alias("label")))
    metrics = {"mode": "by_graph", "hash_name": hash_name}
    n_failed = out.where(F.col("kind") == "e").count()
    if n_failed:
        metrics["failed_graphs"] = n_failed
        metrics["failed_sample"] = [
            (r["graph_id"], r["a"])
            for r in out.where(F.col("kind") == "e").limit(5).collect()]
    return CanonResult(labelled, labels, metrics,
                       _retained=[_ckpt_rdd(out)])
