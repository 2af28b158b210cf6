"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one pass, the 100 TB plan is a
broadcast of the (tiny) query vector against a scan of the embedding table
(no shuffle until the final top-k, which is a tree-aggregated TakeOrdered).

Scale path: sign-LSH bucketing — each vector keyed by the sign pattern of
its leading dimensions; a query probes only its own bucket (optionally
hamming-1 neighbours), turning an O(n) scan into an O(n / 2^bits) one.
Everything is codegen expressions (zip_with / aggregate); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns in double precision
    (elements promoted element-wise, sequential fold — deterministic)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10,
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbours of one stored vector.  The single
    query row is broadcast; ties broken by vec_id for determinism."""
    q = (emb.where(F.col("vec_id") == query_vec_id)
         .select(F.col(vec_col).alias("qvec")))
    scored = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label",
                F.round(cosine(F.col(vec_col), F.col("qvec")), 4)
                .alias("sim"))
    )
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k)


def sign_lsh_buckets(emb: DataFrame, n_bits: int = 8,
                     vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) where bucket = sign pattern of the first n_bits
    dimensions — a degenerate but deterministic random-hyperplane LSH
    (the hyperplanes are the coordinate axes)."""
    bits = [F.when(F.element_at(F.col(vec_col), i + 1) >= 0, "1")
            .otherwise("0") for i in range(n_bits)]
    return emb.select("vec_id", "label",
                      F.concat(*bits).alias("bucket"))


def lsh_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10,
             n_bits: int = 8, vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only vectors sharing the query's LSH bucket."""
    buckets = sign_lsh_buckets(emb, n_bits, vec_col)
    with_b = emb.join(buckets.select("vec_id", "bucket"), "vec_id")
    qb = with_b.where(F.col("vec_id") == query_vec_id) \
               .select(F.col("bucket").alias("qbucket"),
                       F.col(vec_col).alias("qvec"))
    cand = (with_b.where(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qb), F.col("bucket") == F.col("qbucket")))
    return (cand.select("vec_id", "label",
                        F.round(cosine(F.col(vec_col), F.col("qvec")), 4)
                        .alias("sim"))
            .orderBy(F.desc("sim"), F.asc("vec_id")).limit(k))


def bucket_stats(emb: DataFrame, n_bits: int = 6) -> DataFrame:
    """LSH bucket census — the skew diagnostic for the ANN path."""
    return (sign_lsh_buckets(emb, n_bits)
            .groupBy("bucket")
            .agg(F.count("*").alias("n_vecs"),
                 F.countDistinct("label").alias("n_labels")))
