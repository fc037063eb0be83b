"""columnar_database_project_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``rTarunKumar-1/columnar-database-project`` (an adaptive Parquet
storage layer — zone-map row-group pruning, LRU block cache, access
logging, LSTM prefetch — delegating SQL to DuckDB), re-expressed
Spark-first:

- The delegated SQL surface is Spark SQL / the DataFrame API (Catalyst
  does parse/optimize/pushdown natively).
- The native storage surface (microblock index, block cache, access
  log, ML prefetch) is rebuilt as driver-side components around Spark's
  Parquet reader and persist/unpersist block management.
- Beyond reference parity: large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is copied from the reference; file:line citations in
docstrings point at the behavior being re-expressed.
"""

__version__ = "0.1.0"

from columnar_database_project_spark.session import get_spark  # noqa: F401
from columnar_database_project_spark.engine import MicroBlockEngine  # noqa: F401
