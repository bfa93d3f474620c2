"""S13 — dynamic backfill demotion: typed table -> staging strings.

The reference's backfill is a PL/pgSQL metaprogram
(``/root/reference/sql/insert_publicpedidos_to_staging:1-46``): it
introspects ``information_schema.columns`` for the staging table,
left-joins the typed source table's columns (J2), and emits a
``to_char`` per source dtype — ``timestamp -> 'DD/MM/YYYY HH24:MI:SS'``,
``date -> 'DD/MM/YYYY'``, ``time -> 'HH24:MI:SS'``, anything else
``::text`` — with special-cased constants/renames and ``NULL::text``
for columns the source lacks.

Spark version: the same metaprogram over ``df.schema`` (driver-side
dict ops — J2 needs no join at runtime), emitting ONE Project node of
``date_format``/``cast`` expressions. Scan-local, zero shuffle, rides
whole-stage codegen at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sftp_data_ingestion_spark.functions.cleaning import (
    demote_date,
    demote_time,
    demote_timestamp,
)


def demote_column(df: DataFrame, source: str) -> Column:
    """One source column -> staging string, by source dtype (F11)."""
    dtype = df.schema[source].dataType
    c = F.col(source)
    if isinstance(dtype, T.TimestampType | T.TimestampNTZType):
        return demote_timestamp(c)
    if isinstance(dtype, T.DateType):
        return demote_date(c)
    # PG TIME has no Spark scalar type; DayTimeIntervalType is the
    # closest carrier — format via a midnight-anchored timestamp.
    if isinstance(dtype, T.DayTimeIntervalType):
        return demote_time(F.lit("1970-01-01").cast("timestamp") + c)
    return c.cast("string")


def demote_typed_to_staging(
    df: DataFrame,
    dest_columns: Sequence[str],
    renames: Mapping[str, str] | None = None,
    constants: Mapping[str, str] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``dest_columns`` as all-string staging rows.

    ``renames``: dest column -> source column (the reference's
    ``cnpj_cpf_dest``/``grau_de_risco`` remappings, :28-33).
    ``constants``: dest column -> literal string (the reference's
    ``'0'`` / ``'arquivo_backup_banco'`` special cases, :25-27).
    Dest columns with no source column become NULL strings (:36).
    """
    renames = dict(renames or {})
    constants = dict(constants or {})
    have = set(df.columns)
    out: list[Column] = []
    for dest in dest_columns:
        if dest in constants:
            out.append(F.lit(constants[dest]).alias(dest))
            continue
        source = renames.get(dest, dest)
        if source in have:
            out.append(demote_column(df, source).alias(dest))
        else:
            out.append(F.lit(None).cast("string").alias(dest))
    return df.select(out)
