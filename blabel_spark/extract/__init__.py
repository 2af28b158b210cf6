from blabel_spark.extract.pipeline import (  # noqa: F401
    detect_mentions,
    extract_triples,
    link_and_assemble,
    normalize_turns,
)
