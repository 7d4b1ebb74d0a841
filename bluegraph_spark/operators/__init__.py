"""Operator namespace.

Import analytics operators from their submodules (the result dataclasses
live there too)::

    from bluegraph_spark.operators.pagerank import pagerank
    from bluegraph_spark.operators.louvain import louvain
    from bluegraph_spark.operators.paths import shortest_paths, top_neighbors
    from bluegraph_spark.operators.mst import minimum_spanning_forest
    from bluegraph_spark.operators.components import connected_components
    from bluegraph_spark.operators.lpa import label_propagation
    from bluegraph_spark.operators.triangles import triangle_counts
    from bluegraph_spark.operators.centrality_bridge import (
        betweenness_centrality, closeness_centrality)

Top-level function re-exports are deliberately NOT provided for operators
whose function name equals its module name (pagerank, louvain, …): binding
them here would shadow the submodules on the package object and silently
break ``import bluegraph_spark.operators.pagerank as m``-style imports.
The co-occurrence builders (distinct names) are re-exported as before.
"""

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
