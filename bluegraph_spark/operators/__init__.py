from bluegraph_spark.operators.cooccurrence import (
    cooccurrence_edges,
    keep_top_n_nodes,
    occurrences_from_aggregator,
    occurrences_from_edges,
    occurrences_from_node_property,
)

__all__ = [
    "cooccurrence_edges",
    "keep_top_n_nodes",
    "occurrences_from_aggregator",
    "occurrences_from_edges",
    "occurrences_from_node_property",
]
