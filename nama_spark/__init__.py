"""nama_spark — a from-scratch PySpark-native record-linkage / entity-resolution
engine with the capabilities of bradhackinen/nama (blocking → pairwise scoring →
transitive clustering → evaluation), re-expressed Spark-first.

Reference semantics are cited per-function as ``file:line`` against
``/root/reference`` (bradhackinen/nama snapshot 2025-05-23). The architecture is
NOT a port: the engine is DataFrame/Catalyst end-to-end, with Arrow-batched
pandas UDFs only where built-in operators cannot express the semantics
(embedding projection, Jaro-Winkler, constrained greedy clustering).
"""

__version__ = "0.1.0"

from nama_spark.session import get_spark  # noqa: F401
