"""fanstats_producer_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of AJ2O/fanstats-producer.

The reference (/root/reference, MIT) is a scheduled Twitter->S3 ETL producer
whose query layer is delegated to Glue+Athena (reference src/main.py:4-5,
main.tf:300-314).  This package owns all three layers natively in Spark:

- P-layer (producer): sources/ — NDJSON ingest with the reference's pinned
  tweet schema, source-side predicates, pagination/cap semantics, and the
  date/topic-partitioned sink layout (main.py:64-81, 84-112, 122-160).
- Q-layer (query surface): operators/ + functions/ — the full relational
  surface the reference delegates to Athena, expressed with the DataFrame
  API so Catalyst/AQE plan it (joins, aggs, windows, set ops, scalar
  function families, JSON/array/map handling).
- X-layer (LLM-data-pipeline extensions): dedup (exact/MinHash/SimHash/
  Jaccard), vector similarity search, multimodal binary columns, text
  analysis (sentiment, key phrases, language id, quality, fingerprints).

Everything is DataFrame-first: declarative plans, broadcast hints for small
dimensions, partition-pruning-friendly layouts, and Arrow-batched pandas
UDFs only where built-ins cannot express the semantics.
"""

from fanstats_producer_spark.session import get_spark
from fanstats_producer_spark.io import TABLES, load, register_views

__all__ = ["get_spark", "load", "register_views", "TABLES"]
