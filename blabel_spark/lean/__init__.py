from blabel_spark.lean.local import LeanResult, lean_graph  # noqa: F401
