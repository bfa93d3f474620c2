"""Relational operators: conform, clean, dedup, merge, archive, top-k."""

from sftp_data_ingestion_spark.operators.conform import (  # noqa: F401
    conform_headers,
    header_valid,
    with_lineage,
)
from sftp_data_ingestion_spark.operators.clean import clean_staging  # noqa: F401
from sftp_data_ingestion_spark.operators.dedup import latest_per_key  # noqa: F401
from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins  # noqa: F401
from sftp_data_ingestion_spark.operators.upsert_partitioned import (  # noqa: F401
    read_dw,
    upsert_partitioned,
    write_dw_partitioned,
)
from sftp_data_ingestion_spark.operators.archive import move_to_archive  # noqa: F401
from sftp_data_ingestion_spark.operators.pipeline import (  # noqa: F401
    run_upsert_pipeline,
    staging_to_delta,
)
from sftp_data_ingestion_spark.operators.backfill import (  # noqa: F401
    demote_typed_to_staging,
)
from sftp_data_ingestion_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_join_overlap,
)
from sftp_data_ingestion_spark.operators.skew import (  # noqa: F401
    salted_count_sum,
    salted_join_hot_keys,
)
