"""Corpus-run analysis reporter — the Spark-native counterpart of the
reference's ``AnalyseNQuadsResults`` (cli/AnalyseNQuadsResults.java:141-325):
re-aggregate a benchmark/lineage run into per-mode corpus totals, error
splits, argmax documents (largest / most blank nodes / slowest) and
runtime histograms.

Input is a per-document runs DataFrame with columns
``(mode, doc, triples, bnodes, runtime_ms)`` where a negative runtime
marks a timeout/error row (the reference's TSV convention,
RunNQuadsTest.java:296-320); ``read_bench_tsv`` parses the reference's
own TSV format into that shape, and ``runs_from_metrics`` adapts this
engine's lineage/metrics tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Binner bin edges (AnalyseNQuadsResults.java:26-28)
DEFAULT_BINS = [(0, 9), (10, 99), (100, 999), (1000, 9999),
                (10000, 99999), (100000, 1000000)]

RUNS_SCHEMA = ("mode string, doc string, triples long, bnodes long, "
               "runtime_ms long")


def read_bench_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Parse a reference-format bench TSV (``LEAN doc triples bnodes ms …``
    / ``LABEL doc triples bnodes ms …`` rows, RunNQuadsTest.java:307,341,
    plus the ``TEST doc triples bnodes ms OKAY|ERROR…`` rows of the
    metamorphic harness, RunNQuadsTest.java:385-415) into the runs shape.
    Distributed line parse — one regex projection, no Python.  TEST rows
    keep the negative-runtime-on-error convention, so the error split
    downstream needs no special casing."""
    lines = spark.read.text(path)
    # the reference writes an occasional doubled tab (worked around in
    # AnalyseNQuadsResults.java:161)
    c = F.split(F.regexp_replace(F.col("value"), "\t\t", "\t"), "\t")
    return (lines
            .where(F.col("value").startswith("LEAN")
                   | F.col("value").startswith("LABEL")
                   | F.col("value").startswith("TEST"))
            .select(c.getItem(0).alias("mode"),
                    c.getItem(1).alias("doc"),
                    c.getItem(2).cast("long").alias("triples"),
                    c.getItem(3).cast("long").alias("bnodes"),
                    c.getItem(4).cast("long").alias("runtime_ms")))


def runs_from_metrics(metrics: DataFrame, mode: str = "LABEL") -> DataFrame:
    """Adapt a lineage_metrics table (sources/io.lineage_metrics) to the
    runs shape: one row per graph partition."""
    return metrics.select(
        F.lit(mode).alias("mode"),
        F.col("graph_id").alias("doc"),
        F.col("n_in").cast("long").alias("triples"),
        F.lit(0).cast("long").alias("bnodes"),
        F.coalesce(F.col("runtime_ms"), F.lit(0)).cast("long")
        .alias("runtime_ms")
        if "runtime_ms" in metrics.columns else
        F.lit(0).cast("long").alias("runtime_ms"))


def corpus_summary(runs: DataFrame) -> DataFrame:
    """Per-mode corpus aggregates with the ok/error split
    (AnalyseNQuadsResults.java:165-215): negative runtime = error row."""
    err = F.col("runtime_ms") < 0
    return (runs.groupBy("mode").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(err, 1).otherwise(0)).alias("n_errors"),
        F.sum(F.when(~err, F.col("triples")).otherwise(0))
        .alias("ok_triples"),
        F.sum(F.when(~err, F.col("bnodes")).otherwise(0)).alias("ok_bnodes"),
        F.sum(F.when(~err, F.col("runtime_ms")).otherwise(0))
        .alias("ok_time_ms"),
        F.sum(F.when(err, F.col("triples")).otherwise(0))
        .alias("err_triples"),
        F.sum(F.when(err, -F.col("runtime_ms")).otherwise(0))
        .alias("err_time_ms")))


def argmax_docs(runs: DataFrame) -> DataFrame:
    """The reference's slowest/biggest-document trackers
    (AnalyseNQuadsResults.java:110-130, 427-430) as one row per
    (mode, criterion)."""
    out = None
    for crit, col in (("max_triples", F.col("triples")),
                      ("max_bnodes", F.col("bnodes")),
                      ("slowest", F.abs(F.col("runtime_ms")))):
        w = Window.partitionBy("mode").orderBy(F.desc_nulls_last("_v"),
                                               F.asc("doc"))
        top = (runs.withColumn("_v", col)
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1)
               .select("mode", F.lit(crit).alias("criterion"), "doc",
                       "triples", "bnodes", "runtime_ms"))
        out = top if out is None else out.union(top)
    return out


def runtime_histogram(runs: DataFrame) -> DataFrame:
    """Per-mode runtime histogram over the reference's Binner edges."""
    ms = F.abs(F.col("runtime_ms"))
    bin_col = None
    for lo, hi in reversed(DEFAULT_BINS):
        label = f"{lo}-{hi}"
        bin_col = F.when((ms >= lo) & (ms <= hi), label) \
            if bin_col is None else \
            F.when((ms >= lo) & (ms <= hi), label).otherwise(bin_col)
    bin_col = F.when(ms > DEFAULT_BINS[-1][1],
                     f">{DEFAULT_BINS[-1][1]}").otherwise(bin_col)
    return (runs.groupBy("mode", bin_col.alias("bin"))
            .agg(F.count("*").alias("n_docs"))
            .orderBy("mode", "bin"))


def analyse_run(runs: DataFrame) -> dict[str, DataFrame]:
    """Full AnalyseNQuadsResults report as three DataFrames."""
    return {
        "summary": corpus_summary(runs),
        "argmax": argmax_docs(runs),
        "runtime_hist": runtime_histogram(runs),
    }
