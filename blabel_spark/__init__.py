"""blabel_spark: PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of aidhog/blabel (canonical
blank-node labelling of RDF graphs via hash-based colour refinement) as an
idiomatic Spark pipeline, plus the transcript→triple extraction stages and
the large-scale training-data operators (dedup, similarity, text stats)
described in SURVEY.md.
"""

__version__ = "0.1.0"
