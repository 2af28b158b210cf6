"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: derive an RDF triples view
from the sf0.001 tables and canonically label every graph's blank nodes
with the distributed colour-refinement engine (blabel semantics,
golden-tested against the reference's BlabelTest labels).

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text
analysis) with DuckDB oracles; see blabel_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triples view over sf0.001 → canonical blank-node labels."""
    from blabel_spark.canon.distributed import canonicalize
    from blabel_spark.ops.triples_view import build_triples

    triples = build_triples(spark, "/root/testdata/sf0.001")
    return canonicalize(spark, triples).labelled


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blabel_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from blabel_spark.queries import ORACLES
    return dict(ORACLES)
