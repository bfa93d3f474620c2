"""Declared query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 (plus the LLM-data
extension surface) is declared here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible,
a DuckDB oracle string the driver runs side-by-side at sf0.01.

Importing this package populates :data:`QUERIES` / :data:`ORACLES`.
"""

from __future__ import annotations

from sftp_data_ingestion_spark.queries.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# modules register themselves on import (order = report order)
from sftp_data_ingestion_spark.queries import q_cleaning  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_pipeline  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_relational  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_text  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_similarity  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_multimodal  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_temporal  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_sampling  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_extra  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_profile  # noqa: F401,E402
from sftp_data_ingestion_spark.queries import q_streaming  # noqa: F401,E402
