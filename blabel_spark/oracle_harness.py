"""Local twin of the driver's correctness gate: run each registry query on
Spark AND its DuckDB oracle over the same parquet tables, compare row
count, column names, and an order-insensitive value multiset."""

from __future__ import annotations

import datetime as dt
import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, sf_dir: str, name: str):
    """Returns (ok, detail) for one registry entry."""
    from blabel_spark.queries import ORACLES, QUERIES, SF_PINNED_ORACLES
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        return True, f"rows-only: {len(srows)} rows"
    if name in SF_PINNED_ORACLES and \
            not sf_dir.rstrip("/").endswith("sf0.01"):
        return True, f"rows-only ({name} oracle pinned to sf0.01): " \
                     f"{len(srows)} rows"
    con = duck_connection(sf_dir)
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count: spark={len(srows)} duck={len(drows)}"
    a = normalize_rows(scols, srows)
    b = normalize_rows(dcols, drows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"{len(srows)} rows match"
