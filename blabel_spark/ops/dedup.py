"""Deduplication operators for training-data pipelines (SURVEY brief).

All operators are pure DataFrame/Catalyst expressions — no Python in the
hot path — and are designed around shuffle-minimal plans:

* exact dedup: one hash-groupBy (map-side partial aggregation);
* MinHash: per-row signature computation is a codegen expression over
  character shingles (no explode, no shuffle), then LSH banding turns the
  quadratic all-pairs problem into an equi-join on band keys;
* SimHash: per-token votes aggregated with one groupBy; 16-bit fingerprint
  assembled from conditional sums;
* n-gram Jaccard verifies LSH candidate pairs only (never all pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash (md5)."""
    return (
        docs.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"))
        .agg(F.count("*").alias("n_docs"),
             F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def _shingles(text_col: str, k: int, unit: str) -> Column:
    """Array of k-shingles: ``unit="char"`` slides a k-char window (fine
    for natural text); ``unit="word"`` joins k consecutive whitespace
    tokens — the right granularity when the token vocabulary is small
    relative to document length (char shingles then collide on every
    frequent substring and near-dup detection degenerates to all-pairs)."""
    text = F.col(text_col)
    if unit == "char":
        idx = F.sequence(F.lit(1),
                         F.greatest(F.length(text) - (k - 1), F.lit(1)))
        return F.transform(idx, lambda i: text.substr(i, F.lit(k)))
    words = F.filter(F.split(text, " "), lambda w: F.length(w) > 0)
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(words, i, k), " "))


def minhash_signatures(docs: DataFrame, n_hashes: int = 4, k: int = 5,
                       text_col: str = "text",
                       unit: str = "char") -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signature over k-shingles (char or
    word, see _shingles).  The shingle array is materialized into one
    column first so the n_hashes per-seed transforms share it instead of
    re-deriving it per seed."""
    with_sh = docs.select("doc_id",
                          _shingles(text_col, k, unit).alias("_sh"))
    cols = []
    for s in range(n_hashes):
        # NB: the lambda must take exactly one arg — F.transform passes the
        # array index to a second parameter, which would clobber a captured
        # default.  transform() consumes the lambda eagerly, so closing over
        # the loop variable via `seed` is safe.
        seed = F.lit(f"s{s}|")
        hashes = F.transform(F.col("_sh"),
                             lambda x: F.md5(F.concat(seed, x)))
        cols.append(F.array_min(hashes).alias(f"h{s}"))
    return with_sh.select("doc_id", *cols)


def lsh_candidate_pairs(docs: DataFrame, n_hashes: int = 4, k: int = 5,
                        band_chars: int = 4, unit: str = "char",
                        signatures: DataFrame | None = None) -> DataFrame:
    """Near-dup candidates: docs sharing a banded MinHash prefix.  The
    band join is an equi-join on (band_id, band_key) — at 100 TB this is
    the only way near-dup detection scales (candidate pairs ≪ n²).

    Pass ``signatures`` (a minhash_signatures() result) to reuse one
    signature computation across banding and downstream verification —
    signature hashing dominates the cost, so consumers should compute it
    once."""
    sig = signatures if signatures is not None \
        else minhash_signatures(docs, n_hashes, k, unit=unit)
    # one posexplode pass — a union of per-band selects would re-evaluate
    # the signature plan once per band.  The band table is materialized
    # once before the self-join: signature hashing dominates the cost and
    # a broadcast (or stats-free) self-join would otherwise evaluate the
    # whole shingle+md5 plan on BOTH sides (the round-6 before-plan showed
    # two full signature subtrees).  The table is (doc_id, band_id,
    # band_key) — n_hashes rows per doc, far narrower than the corpus.
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(
            *[F.substring(F.col(f"h{s}"), 1, band_chars)
              for s in range(n_hashes)])).alias("band_id", "band_key")) \
        .localCheckpoint(True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def shingle_input_docs(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Docs that appear on either side of a candidate pair — the ONLY
    rows the Jaccard verify stage needs to shingle.  Candidate sets are
    typically a few percent of the corpus, so semi-joining here keeps the
    k×-expansion explode off the other ~95% (at 100 TB the difference is
    materializing the whole corpus k times vs just the pair members)."""
    ids = (pairs.select(F.col("doc_a").alias("doc_id"))
           .union(pairs.select(F.col("doc_b").alias("doc_id")))
           .distinct())
    return docs.join(ids, "doc_id", "left_semi")


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, k: int = 5,
                  text_col: str = "text", unit: str = "char") -> DataFrame:
    """Jaccard similarity over distinct k-shingles for the given candidate
    pairs only (never all pairs, never shingling docs outside the pairs)."""
    # materialized once: the shingle relation feeds the per-doc counts AND
    # both sides of the intersection join.  Restricted to pair members
    # BEFORE the explode — shingling the full corpus to verify a small
    # candidate set is a linear-but-needless k× materialization.
    shingles = shingle_input_docs(docs, pairs).select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(text_col, k, unit)))
        .alias("sh")).localCheckpoint(True)
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = shingles.select(F.col("doc_id").alias("_docb"),
                         F.col("sh").alias("sh2"))
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("_docb"))
              & (F.col("sh") == F.col("sh2")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left").na.fill({"n_inter": 0})
        .join(ca, "doc_a").join(cb, "doc_b")
        .withColumn("jaccard",
                    F.round(F.col("n_inter")
                            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def simhash16(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over whitespace tokens.

    Each token contributes ±1 votes on 16 bits taken nibble-wise from the
    first 4 hex chars of md5(token); fingerprint bit j is 1 iff the vote
    sum is positive.  One explode + one groupBy with 16 conditional sums —
    shuffle keyed by doc_id only.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), " ")).alias("tok")) \
        .where(F.length("tok") > 0) \
        .withColumn("h", F.md5(F.col("tok")))
    bit_cols = []
    for j in range(16):
        nib_i, r = divmod(j, 4)
        nib = F.expr(
            f"locate(substring(h, {nib_i + 1}, 1), '{HEX}') - 1")
        bit = (nib.cast("int") / (2 ** (3 - r))).cast("int") % 2
        bit_cols.append(F.sum(F.when(bit == 1, 1).otherwise(-1))
                        .alias(f"v{j}"))
    votes = toks.groupBy("doc_id").agg(*bit_cols)
    fp = None
    for j in range(16):
        term = F.when(F.col(f"v{j}") > 0, 2 ** j).otherwise(0)
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("int").alias("simhash"))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.9,
                        n_bits: int = 16, n_tables: int = 12,
                        dim: int = 64, seed: int = 42,
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded sign-LSH.

    AND within a table (all ``n_bits`` hyperplane signs must agree — the
    band), OR across ``n_tables`` independently-seeded tables: a pair is
    a candidate iff it shares a bucket in ANY table.  Candidates come
    from a bucketed self-equi-join per table key — work is
    Σ_t Σ_bucket size², never the C(n,2) all-pairs join — then exact
    cosine verification on the de-duplicated candidate set.

    Operating point: with p = 1 - acos(cos_sim)/π per bit, pair recall
    is 1 - (1 - p^n_bits)^n_tables.  At the defaults (16 bits × 12
    tables) a cosine-0.9 pair (p ≈ 0.856) is caught with probability
    ≈ 0.65, a 0.95 pair ≈ 0.91, a 0.99 pair ≈ 1.0 — while each table's
    2^16 buckets keep Σ bucket² ≈ n²/65536 on spread data, so the
    candidate volume stays ≈ 12 n²/65536 ≪ C(n,2).  A single 6-bit
    table (the former default) caught a cosine-0.9 pair only ~39% of
    the time while its 64 buckets degenerated toward n²/64 candidates
    at corpus scale — strictly dominated; raise n_tables (recall) or
    n_bits (candidate budget) independently as the corpus demands.

    The 100 TB shape: (table_id, bucket) is the shuffle key — 12×
    duplication of (vec_id, vector) rows, skewed buckets split by AQE,
    candidate pairs de-duplicated BEFORE the vectors are fetched for
    verification, and the threshold filter runs before any output
    materializes.

    Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold
    (cosine rounded to 4 decimals before the threshold test, so the
    result is reproducible across float orderings).
    """
    from blabel_spark.ops.similarity import cosine
    cand = embedding_candidate_pairs(emb, n_bits, n_tables, dim, seed,
                                     vec_col)
    va = emb.select(F.col("vec_id").alias("id_a"),
                    F.col(vec_col).alias("_va"))
    vb = emb.select(F.col("vec_id").alias("id_b"),
                    F.col(vec_col).alias("_vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b",
                    F.round(cosine(F.col("_va"), F.col("_vb")), 4)
                    .alias("sim"))
            .where(F.col("sim") >= threshold))


def _cluster_kernel(edges: DataFrame) -> DataFrame:
    """Single-task union-find over a (distinct, directed) pair-edge table
    that fits one task — the same min-pivot semantics as the iterative
    loop (keeper = minimum member), one Spark job instead of one per
    propagation round."""
    import pandas as pd
    t = edges.schema["a"].dataType.simpleString()
    schema = f"doc_id {t}, keeper_doc_id {t}"

    def run(batches):
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["a"], pdf["b"]):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # parent the larger root under the smaller so a
                    # class root IS its minimum member (pivot semantics)
                    parent[max(ra, rb)] = min(ra, rb)
        if parent:
            yield pd.DataFrame({"doc_id": list(parent),
                                "keeper_doc_id": [find(n) for n in parent]})

    return edges.coalesce(1).mapInPandas(run, schema)


def dedup_clusters(pairs: DataFrame, max_iter: int = 32,
                   kernel_max_pairs: int = 2_000_000) -> DataFrame:
    """Near-duplicate CLUSTERS from pairwise matches: connected
    components over the (doc_a, doc_b) pair graph, each document mapped
    to its cluster keeper (minimum doc id) — the final stage of a dedup
    pipeline (keep one representative per cluster, drop the rest).
    Pairs may come from any of the pair producers (LSH+Jaccard, SimHash,
    embedding near-dups) or their union.

    Routing (mirrors canon.distributed.bnode_components): when the
    distinct pair graph fits one task (≤ ``kernel_max_pairs`` edges — the
    common case, since candidate budgets keep pairs ≪ corpus), a
    single-task union-find resolves every cluster in ONE job.  Larger
    pair graphs take min-label propagation with pointer doubling fused
    into the propagation join: one shuffle per round,
    O(log cluster-diameter) rounds, every round a join over pairs —
    never over the corpus.  Raises after ``max_iter`` rounds instead of
    returning a split cluster.

    Returns (doc_id, keeper_doc_id) for every document that appears in
    at least one pair; docs without a match keep themselves by
    construction and are not emitted.
    """
    from blabel_spark.ckpt_util import ckpt_rdd as _ckpt_rdd
    from blabel_spark.ckpt_util import release as _release
    edges = pairs.select(F.col("doc_a").alias("a"),
                         F.col("doc_b").alias("b")).distinct() \
        .localCheckpoint(True)
    edges_h = _ckpt_rdd(edges)
    if edges.count() <= kernel_max_pairs:
        return _cluster_kernel(edges)
    sym = edges.union(edges.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    comp = (sym.select(F.col("a").alias("doc_id")).distinct()
            .withColumn("comp", F.col("doc_id")).localCheckpoint(True))
    # release each round's superseded checkpoint immediately (same O(1)
    # retained-state discipline as canon.distributed.bnode_components)
    prev_h = _ckpt_rdd(comp)
    try:
        for _ in range(max_iter):
            pointer = comp.select(F.col("comp").alias("a"),
                                  F.col("doc_id").alias("b"))
            compr = comp.select(F.col("doc_id").alias("n"),
                                F.col("comp").alias("nbr_comp"))
            nbrs = sym.union(pointer)
            nbr_min = (nbrs.join(compr, on=[nbrs.a == compr.n])
                       .groupBy("b")
                       .agg(F.min("nbr_comp").alias("nbr_comp")))
            # lazy checkpoint + one action per round (the changed-count
            # job materializes the state and truncates lineage)
            new = (comp.join(nbr_min, on=[comp.doc_id == nbr_min.b],
                             how="left")
                   .select("doc_id",
                           F.least("comp", F.coalesce("nbr_comp", "comp"))
                           .alias("comp"),
                           (F.col("comp") != F.least(
                               "comp", F.coalesce("nbr_comp", "comp")))
                           .alias("changed"))).localCheckpoint(False)
            n_changed = new.where("changed").count()
            _release([prev_h])
            prev_h = _ckpt_rdd(new)
            comp = new.drop("changed")
            if n_changed == 0:
                _release([edges_h])
                return comp.select("doc_id",
                                   F.col("comp").alias("keeper_doc_id"))
    except BaseException:
        # a mid-loop failure must not leak the edge/round checkpoints
        # (ADVICE r5)
        _release([edges_h, prev_h])
        raise
    _release([edges_h, prev_h])
    raise RuntimeError(
        f"dedup_clusters failed to converge in {max_iter} rounds — "
        "pathologically deep pair graph")


def embedding_candidate_pairs(emb: DataFrame, n_bits: int = 16,
                              n_tables: int = 12, dim: int = 64,
                              seed: int = 42,
                              vec_col: str = "embedding") -> DataFrame:
    """Distinct (id_a, id_b) banded sign-LSH candidate pairs — the
    pre-verification stage of embedding_near_dups, exposed so the
    candidate budget (≪ C(n,2)) can be asserted independently."""
    from blabel_spark.ops.similarity import _bucket_array_col
    # one pass computes all L buckets (width-routed: literal codegen or
    # the Arrow tensor kernel — see similarity._bucket_array_col); one
    # posexplode emits the (table_id, bucket) join keys
    keyed = emb.select(
        "vec_id",
        F.posexplode(_bucket_array_col(F.col(vec_col), dim, n_bits,
                                       n_tables, seed))
        .alias("table_id", "bucket"))
    left = keyed.select(F.col("vec_id").alias("id_a"), "table_id", "bucket")
    right = keyed.select(F.col("vec_id").alias("id_b"), "table_id", "bucket")
    return (left.join(right, ["table_id", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def select_keepers(clusters: DataFrame, scores: DataFrame) -> DataFrame:
    """Quality-aware keeper selection — the step after ``dedup_clusters``
    in a real pipeline: instead of keeping the minimum doc id, keep the
    BEST-scoring member of every near-dup cluster (tie-break min doc id,
    so the choice is total and deterministic).

    ``clusters``: (doc_id, keeper_doc_id) as produced by
    ``dedup_clusters`` — the CC keeper is reused as the cluster id.
    ``scores``: (doc_id, quality) — any deterministic score, e.g.
    ``ops.textstats.quality_score``.

    Scale shape: the member table is pair-graph-sized (docs that matched
    at least once, ≪ corpus); the score attach is an equi-join on doc_id
    and the argmax is one per-cluster window over members only — no
    corpus-scale shuffle, clusters are shallow by construction.

    Returns (doc_id, cluster_id, keeper_doc_id, keep).
    """
    from pyspark.sql import Window
    members = clusters.select(
        "doc_id", F.col("keeper_doc_id").alias("cluster_id"))
    # LEFT join (ADVICE r5): a cluster member with no score row must
    # still appear in the output — its NULL quality sorts last under the
    # descending order (Spark's default), so it can only become keeper
    # when the whole cluster is unscored, and then the doc-id tie-break
    # keeps the choice total and deterministic
    m = members.join(scores.select("doc_id", "quality"), "doc_id", "left")
    w = (Window.partitionBy("cluster_id")
         .orderBy(F.desc("quality"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (m.withColumn("keeper_doc_id", F.first("doc_id").over(w))
            .select("doc_id", "cluster_id", "keeper_doc_id",
                    (F.col("doc_id") == F.col("keeper_doc_id"))
                    .alias("keep")))
