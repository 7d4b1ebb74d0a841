from bluegraph_spark.operators.cooccurrence import (
    cooccurrence_edges,
    occurrences_from_node_property,
    occurrences_from_edges,
)

__all__ = [
    "cooccurrence_edges",
    "occurrences_from_node_property",
    "occurrences_from_edges",
]
