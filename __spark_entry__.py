"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: derive an RDF triples view
from the sf0.001 tables and canonically label every graph's blank nodes
with the distributed colour-refinement engine (blabel semantics,
golden-tested against the reference's BlabelTest labels).

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / ANN / text
analysis): 42 registered queries, each with a DuckDB oracle — live SQL
where expressible, outputs precomputed by the independent local oracles
for the non-SQL flagships (tools/gen_flagship_oracles.py), including a
bit-exact per-bnode label comparison that forces the distributed
fixpoint route; see blabel_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``blabel_spark`` importable in Spark's Python workers.

    Driver sys.path does not propagate to workers; shipping the package
    zip via addPyFile is the local-mode equivalent of
    ``spark-submit --py-files`` and works on a real cluster unchanged.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import shutil
    import tempfile
    archive = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), "blabel_spark_pkg"), "zip",
        root_dir=_REPO_ROOT, base_dir="blabel_spark")
    spark.sparkContext.addPyFile(archive)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triples view over sf0.001 → canonical blank-node labels."""
    _ship_package(spark)
    from blabel_spark.canon.distributed import canonicalize
    from blabel_spark.ops.triples_view import build_triples

    triples = build_triples(spark, "/root/testdata/sf0.001")
    return canonicalize(spark, triples).labelled


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blabel_spark.queries import QUERIES

    def shipped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)
        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from blabel_spark.queries import ORACLES
    return dict(ORACLES)
