"""scio_db_spark — a PySpark-native analytics & stream-processing engine.

Re-expresses the capability surface of the reference Beam/SCIO pipeline
(albertols/scio-db) on DataFrame / SQL / Catalyst / Structured Streaming,
plus the standard relational operator surface and large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
plumbing, text analysis).

Spark-first design: every operator is declared as a logical plan
(Column expressions / DataFrame transformations) so Catalyst handles
predicate pushdown, column pruning, join strategy selection and AQE.
Python-level code exists only where Spark has no primitive: the
stateful TTL dedup processor and the side-effecting HTTP sink.
"""

from scio_db_spark.session import SessionFactory, get_spark

__all__ = ["SessionFactory", "get_spark"]

__version__ = "0.1.0"
