"""Derived RDF-triples view over the driver's TPC-H-ish test tables.

The driver's correctness gate cross-checks Spark queries against DuckDB on
the same parquet; the blabel-style operators need a triples relation, so we
derive one deterministically from orders/lineitem/customer: orders and
customers become blank nodes (the canonicalizer's subject matter), parts
and customer-ids become IRIs, statuses/segments become literals.  Graphs
are formed by bucketing order keys so each graph is a small multi-order
subgraph joined through shared customer bnodes.

The same construction exists as DuckDB SQL (TRIPLES_CTE) for oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_GRAPHS = 200

TRIPLES_CTE = f"""
WITH triples AS (
  SELECT 'g' || CAST(o_orderkey % {N_GRAPHS} AS VARCHAR) AS graph_id,
         '_:o' || CAST(o_orderkey AS VARCHAR) AS subj,
         '<rel:placed_by>' AS pred,
         '_:c' || CAST(o_custkey AS VARCHAR) AS obj
  FROM orders
  UNION ALL
  SELECT 'g' || CAST(o_orderkey % {N_GRAPHS} AS VARCHAR),
         '_:o' || CAST(o_orderkey AS VARCHAR),
         '<rel:status>',
         '"' || o_orderstatus || '"'
  FROM orders
  UNION ALL
  SELECT 'g' || CAST(l_orderkey % {N_GRAPHS} AS VARCHAR),
         '_:o' || CAST(l_orderkey AS VARCHAR),
         '<rel:has_part>',
         '<part:' || CAST(l_partkey AS VARCHAR) || '>'
  FROM lineitem
  UNION ALL
  SELECT 'g' || CAST(c_custkey % {N_GRAPHS} AS VARCHAR),
         '<cust:' || CAST(c_custkey AS VARCHAR) || '>',
         '<rel:segment>',
         '"' || c_mktsegment || '"'
  FROM customer
)
"""


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def build_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side twin of TRIPLES_CTE (column pruning reaches the scans:
    each branch reads only 2-3 columns of its table)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    g = lambda key: F.concat(F.lit("g"), (F.col(key) % N_GRAPHS).cast("string"))

    t1 = orders.select(
        g("o_orderkey").alias("graph_id"),
        F.concat(F.lit("_:o"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("<rel:placed_by>").alias("pred"),
        F.concat(F.lit("_:c"), F.col("o_custkey").cast("string")).alias("obj"))
    t2 = orders.select(
        g("o_orderkey").alias("graph_id"),
        F.concat(F.lit("_:o"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("<rel:status>").alias("pred"),
        F.concat(F.lit('"'), F.col("o_orderstatus"), F.lit('"')).alias("obj"))
    t3 = lineitem.select(
        g("l_orderkey").alias("graph_id"),
        F.concat(F.lit("_:o"), F.col("l_orderkey").cast("string")).alias("subj"),
        F.lit("<rel:has_part>").alias("pred"),
        F.concat(F.lit("<part:"), F.col("l_partkey").cast("string"),
                 F.lit(">")).alias("obj"))
    t4 = customer.select(
        g("c_custkey").alias("graph_id"),
        F.concat(F.lit("<cust:"), F.col("c_custkey").cast("string"),
                 F.lit(">")).alias("subj"),
        F.lit("<rel:segment>").alias("pred"),
        F.concat(F.lit('"'), F.col("c_mktsegment"), F.lit('"')).alias("obj"))
    return t1.union(t2).union(t3).union(t4)
