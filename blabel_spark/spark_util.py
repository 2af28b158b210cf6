"""SparkSession helpers and shared column kernels.

Binary colours are 16-byte md5 digests throughout.  Two families of
column-level helpers live here:

* JVM-side byte-lane arithmetic: a 16-byte binary column is split into 16
  integer lanes (hex/conv — all whole-stage-codegen expressions) so that the
  order-insensitive Guava ``combineUnordered`` fold (per-byte sum mod 256,
  reference HashGraph.java:165-221) becomes a plain ``sum`` aggregation —
  no shuffle of collected lists, no Python, scales to arbitrarily large
  groups.
* Arrow-batched pandas UDFs for the order-sensitive ``combineOrdered``
  folds, which are not decomposable into per-lane SQL aggregates.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, IntegerType

HASH_BYTES = 16


def get_spark(app: str = "blabel-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local[-mode] session with the settings we also want on a cluster:
    AQE (runtime skew-join splitting + partition coalescing), Arrow for all
    pandas-UDF exchange."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


# ---------------------------------------------------------------------------
# JVM-side binary helpers
# ---------------------------------------------------------------------------

def md5_binary(col: Column) -> Column:
    """16-byte md5 digest of a string column, computed JVM-side."""
    return F.unhex(F.md5(F.encode(col, "UTF-8")))


def byte_lane(col: Column, i: int) -> Column:
    """i-th byte (0-based) of a binary column as an int (codegen-only)."""
    return F.conv(F.hex(F.substring(col, i + 1, 1)), 16, 10).cast("long")


def byte_lanes(col: Column) -> list[Column]:
    return [byte_lane(col, i) for i in range(HASH_BYTES)]


def lanes_to_binary(cols: list[Column]) -> Column:
    """Reassemble 16 int lanes (each 0..255) into a 16-byte binary."""
    return F.unhex(F.concat(*[F.lpad(F.hex(c), 2, "0") for c in cols]))


def unordered_sum_agg(df: DataFrame, keys: list[str], bin_col: str,
                      out_col: str, extra_init: bytes | None = None) -> DataFrame:
    """groupBy(keys).combineUnordered(bin_col) as 16 JVM sum-mod-256 lanes.

    Implements Guava combineUnordered (per-byte sum) as a distributable,
    partial-aggregatable ``sum`` — the map-side combine is free.  The 16
    byte lanes are extracted in ONE Arrow pass (lanes_udf) rather than 16
    hex/conv expression chains per row.  If ``extra_init`` is given it is
    added into every group (the reference seeds its running graph hash
    with the blank hash, HashGraph.java:166).
    """
    with_lanes = df.withColumn("_lanes", lanes_udf(F.col(bin_col)))
    lanes = [F.sum(F.element_at(F.col("_lanes"), i + 1))
             for i in range(HASH_BYTES)]
    if extra_init is not None:
        lanes = [l + int(extra_init[i]) for i, l in enumerate(lanes)]
    lanes = [(l % 256).cast("int") for l in lanes]
    agg = with_lanes.groupBy(*[F.col(k) for k in keys]).agg(
        *[l.alias(f"_lane{i}") for i, l in enumerate(lanes)])
    return agg.select(
        *keys,
        lanes_to_binary([F.col(f"_lane{i}") for i in range(HASH_BYTES)])
        .alias(out_col))


# ---------------------------------------------------------------------------
# Arrow-batched combineOrdered kernels
# ---------------------------------------------------------------------------

def _stack(series: pd.Series):
    import numpy as np
    return np.frombuffer(b"".join(series.tolist()), dtype=np.uint8).reshape(
        -1, HASH_BYTES)


@F.pandas_udf(BinaryType())
def combine2_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """combineOrdered(a, b) row-wise (Guava per-byte r=r*37^x, zero-init)."""
    import numpy as np
    if len(a) == 0:
        return pd.Series([], dtype=object)
    ma, mb = _stack(a), _stack(b)
    r = (ma * np.uint8(37)) ^ mb
    return pd.Series([r[j].tobytes() for j in range(r.shape[0])])


@F.pandas_udf(BinaryType())
def combine3_udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
    """combineOrdered(a, b, c) row-wise — the edge-message hash
    (GraphColouring.java:524-528)."""
    import numpy as np
    if len(a) == 0:
        return pd.Series([], dtype=object)
    ma, mb, mc = _stack(a), _stack(b), _stack(c)
    t37 = np.uint8(37)
    r = (((ma * t37) ^ mb) * t37) ^ mc
    return pd.Series([r[j].tobytes() for j in range(r.shape[0])])


@F.pandas_udf(ArrayType(IntegerType()))
def lanes_udf(b: pd.Series) -> pd.Series:
    """Split a 16-byte binary column into its 16 byte lanes (one Arrow
    pass; feeds the JVM-side per-lane sum aggregation)."""
    import numpy as np
    if len(b) == 0:
        return pd.Series([], dtype=object)
    m = _stack(b).astype(np.int32)
    return pd.Series(list(m))


@F.pandas_udf(BinaryType())
def fold_ordered_udf(lists: pd.Series) -> pd.Series:
    """combineOrdered-fold of a pre-sorted array<binary> column — the
    neighbourhood aggregation kernel (GraphColouring.java:542-548).
    Left-zero-padding is a fold no-op, enabling full vectorization."""
    from blabel_spark.hashing import fold_sorted_lists_ordered
    if len(lists) == 0:
        return pd.Series([], dtype=object)
    return pd.Series(fold_sorted_lists_ordered(lists.tolist()))
