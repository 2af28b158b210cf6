"""Distributed leaning: per-graph core computation.

The reference processes corpora one document at a time through its leaning
stack (RunNQuadsTest.java:257-451); the Spark translation keeps that shape:
conversations/documents are embarrassingly parallel, each graph's core is
computed whole-graph inside one Arrow-batched ``applyInPandas`` group.
Leaning cannot be decomposed per bnode-component (a component can map into
a DIFFERENT component of the same graph — e.g. an edge folding into a
longer chain), so the group key is graph_id, not (graph_id, comp).

For graphs too large for one task, the join-based trivial-non-lean filter
(the q_trivial_nonlean query, SURVEY J5) distributes as a pre-pass; the
residual search still runs per graph — same trade-off as the canonical
labeller's branch-and-bound kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OUT_SCHEMA = ("graph_id string, kind string, a string, b string, c string")


def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from blabel_spark.lean.local import LeanBudgetExceeded, lean_graph
    graph_id = pdf["graph_id"].iloc[0]
    triples = list(zip(pdf["subj"], pdf["pred"], pdf["obj"]))
    rows = []
    try:
        res = lean_graph(triples)
        for s, p, o in res.lean:
            rows.append((graph_id, "t", s, p, o))
        for k, v in sorted(res.core_map.items()):
            rows.append((graph_id, "w", k, v, ""))
    except LeanBudgetExceeded:
        # over-budget graphs pass through unleaned, flagged in the witness
        # channel (the reference times out per document and reports it,
        # RunNQuadsTest.java:296-320)
        for s, p, o in sorted(set(triples)):
            rows.append((graph_id, "t", s, p, o))
        rows.append((graph_id, "w", "__budget_exceeded__", "", ""))
    return pd.DataFrame(rows, columns=["graph_id", "kind", "a", "b", "c"])


def lean_graphs(spark: SparkSession, triples: DataFrame
                ) -> tuple[DataFrame, DataFrame]:
    """Returns (lean_triples, witness) DataFrames.

    lean_triples: (graph_id, subj, pred, obj) — the per-graph cores.
    witness:      (graph_id, bnode, target) — complete core maps.
    """
    out = (triples.select("graph_id", "subj", "pred", "obj")
           .groupBy("graph_id").applyInPandas(_kernel, _OUT_SCHEMA)
           ).localCheckpoint(True)
    lean = (out.where(F.col("kind") == "t")
            .select("graph_id", F.col("a").alias("subj"),
                    F.col("b").alias("pred"), F.col("c").alias("obj")))
    witness = (out.where(F.col("kind") == "w")
               .select("graph_id", F.col("a").alias("bnode"),
                       F.col("b").alias("target")))
    return lean, witness
