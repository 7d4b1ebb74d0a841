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
    # analytics (import from submodules for the full result dataclasses)
    "pagerank",
    "connected_components",
    "label_propagation",
    "louvain",
    "triangle_counts",
    "shortest_paths",
    "top_neighbors",
    "minimum_spanning_forest",
    "betweenness_centrality",
    "closeness_centrality",
]

from bluegraph_spark.operators.centrality_bridge import (  # noqa: E402
    betweenness_centrality,
    closeness_centrality,
)
from bluegraph_spark.operators.components import connected_components  # noqa: E402
from bluegraph_spark.operators.louvain import louvain  # noqa: E402
from bluegraph_spark.operators.lpa import label_propagation  # noqa: E402
from bluegraph_spark.operators.mst import minimum_spanning_forest  # noqa: E402
from bluegraph_spark.operators.pagerank import pagerank  # noqa: E402
from bluegraph_spark.operators.paths import shortest_paths, top_neighbors  # noqa: E402
from bluegraph_spark.operators.triangles import triangle_counts  # noqa: E402
