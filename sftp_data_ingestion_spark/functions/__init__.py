"""Pure Column-expression builders — the engine's scalar function library.

Everything here compiles to JVM-side Catalyst expressions (whole-stage
codegen, no Python in the hot path). Each builder also has a ``*_sql``
twin emitting the equivalent DuckDB SQL so correctness oracles are
generated from the same source of truth.
"""

from sftp_data_ingestion_spark.functions.cleaning import (  # noqa: F401
    clean_uf,
    clean_uf_sql,
    digits_only,
    digits_only_sql,
    digits_to_int,
    digits_to_int_sql,
    nfe_key_44,
    nfe_key_44_sql,
    null_if_blank,
    null_if_blank_sql,
    parse_date_multi,
    parse_date_multi_sql,
    parse_decimal,
    parse_decimal_sql,
    parse_timestamp_multi,
    parse_timestamp_multi_sql,
    strip_digits_to_null,
    strip_digits_to_null_sql,
)
