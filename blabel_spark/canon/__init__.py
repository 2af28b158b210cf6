from blabel_spark.canon.local import (  # noqa: F401
    HashCollisionError,
    LabellingResult,
    blank_node_components,
    is_bnode,
    label_graph,
    render,
)
