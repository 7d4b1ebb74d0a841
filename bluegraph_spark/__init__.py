"""bluegraph_spark — a from-scratch, PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of BlueBrain/BlueGraph
(reference: /root/reference) Spark-first: property graphs are pairs of
DataFrames, co-occurrence edge generation is a shuffle self-join instead of an
O(n^2) multiprocessing scan, and the iterative analytics (PageRank, connected
components, label propagation, triangle counting) are DataFrame-only driver
loops with per-superstep checkpointing.

Nothing in this package is ported from the reference implementation; reference
file:line citations in docstrings identify the *semantics* being matched.
"""

from bluegraph_spark.session import get_session
from bluegraph_spark.pgframe import SparkPGFrame

__all__ = ["get_session", "SparkPGFrame"]
__version__ = "0.1.0"
