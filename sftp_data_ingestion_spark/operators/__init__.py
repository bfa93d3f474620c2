"""Relational operators: conform, clean, dedup, merge, archive, top-k."""

from sftp_data_ingestion_spark.operators.conform import (  # noqa: F401
    conform_headers,
    header_valid,
    with_lineage,
)
from sftp_data_ingestion_spark.operators.clean import clean_staging  # noqa: F401
from sftp_data_ingestion_spark.operators.dedup import latest_per_key  # noqa: F401
from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins  # noqa: F401
from sftp_data_ingestion_spark.operators.archive import move_to_archive  # noqa: F401
from sftp_data_ingestion_spark.operators.pipeline import (  # noqa: F401
    run_upsert_pipeline,
    staging_to_delta,
)
