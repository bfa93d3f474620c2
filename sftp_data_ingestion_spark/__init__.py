"""sftp_data_ingestion_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``levialmeidaz/sftp-data-ingestion`` (a 4-stage SFTP -> PostgreSQL ELT
pipeline), re-expressed Spark-first:

* the reference's Python file/parse layer becomes DataFrame sources
  (:mod:`sftp_data_ingestion_spark.sources`),
* its PostgreSQL relational layer (cleaning CASE cascades, window dedup,
  ON CONFLICT merge, batched archive) becomes pure Column expressions and
  DataFrame operators on Catalyst
  (:mod:`sftp_data_ingestion_spark.functions`,
  :mod:`sftp_data_ingestion_spark.operators`),
* plus LLM-training-data extensions (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale
  (:mod:`sftp_data_ingestion_spark.ext`).

Every operator cites the reference file:line it re-implements so parity
can be audited against ``/root/reference``.
"""

__version__ = "0.1.0"

from sftp_data_ingestion_spark.session import get_spark  # noqa: F401
