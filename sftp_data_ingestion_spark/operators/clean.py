"""The 41-expression typed cleaning projection (P3).

One ``select`` reproducing the reference's ``src`` CTE
(``/root/reference/python/03_upsert_dw_pedidos.py:22-171``): every
staging string column coerced to its warehouse type via the builders in
:mod:`sftp_data_ingestion_spark.functions.cleaning`.

All pure Column expressions -> a single Project node under whole-stage
codegen; at 100 TB this runs scan-local with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.functions.cleaning import (
    _NOT_ALPHA,
    digits_only,
    null_if_blank,
    parse_date_multi,
    parse_decimal,
    parse_timestamp_multi,
)

# plain NULLIF(TRIM(...)) text columns (python/03_upsert_dw_pedidos.py:24-25,131-159)
TEXT_COLS: list[str] = [
    "id", "pedido", "serie_nfe", "numero_nfe", "remessa",
    "nome_destinatario", "endereco_completo", "cep", "cd", "transportador",
    "lead_time", "status_prazo", "id_ult_ocr", "ultima_ocorrencia",
    "chave_ult_ocr", "tipo_entrega", "agrupador", "endereco", "numero",
    "bairro", "cidades", "etiquetas", "cod_vendedor", "qtd_itens",
    "grau_risco", "tipo_operacao", "arquivo_origem",
]

DATE_COLS = ["data_nfe", "data_prev_entrega", "data_prev_entrega_original"]


def _parse_data_insercao(c: Column) -> Column:
    """Two-branch control-timestamp parse (python/03_upsert_dw_pedidos.py:163-168):
    DD/MM/YYYY[ time] or ISO[ time], else NULL (caller applies the default)."""
    t = F.trim(c)
    dmy = F.try_to_timestamp(
        F.when(t.contains(" "), t).otherwise(F.concat(t, F.lit(" 00:00:00"))),
        F.lit("dd/MM/yyyy HH:mm:ss"),
    )
    iso_in = F.replace(t, F.lit("T"), F.lit(" "))
    # length dispatch under the ISO guard (see cleaning._iso_dispatch:
    # one parse per row instead of a failed-try coalesce chain)
    from sftp_data_ingestion_spark.functions.cleaning import _iso_dispatch

    iso = _iso_dispatch(iso_in)
    return (
        F.when(t.rlike(r"^\d{2}/\d{2}/\d{4}( \d{2}:\d{2}:\d{2})?$"), dmy)
        .when(t.rlike(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$"), iso)
        .otherwise(F.lit(None).cast("timestamp"))
    )


def _parse_data_insercao_sql(e: str) -> str:
    """DuckDB twin of :func:`_parse_data_insercao`."""
    t = f"TRIM({e})"
    dmy_in = f"CASE WHEN contains({t}, ' ') THEN {t} ELSE {t} || ' 00:00:00' END"
    return f"""CASE
  WHEN regexp_matches({t}, '^\\d{{2}}/\\d{{2}}/\\d{{4}}( \\d{{2}}:\\d{{2}}:\\d{{2}})?$')
    THEN try_strptime({dmy_in}, '%d/%m/%Y %H:%M:%S')
  WHEN regexp_matches({t}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}([ T]\\d{{2}}:\\d{{2}}(:\\d{{2}})?)?$')
    THEN COALESCE(try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d %H:%M:%S'),
                  try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d %H:%M'),
                  try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d'))
  ELSE NULL END"""


def clean_staging_sql(relation: str, default_insercao_sql: str = "now()") -> str:
    """DuckDB twin of :func:`clean_staging`: the full 41-expression
    typed projection as one SELECT over ``relation``, built from the
    same ``*_sql`` builders the Column path uses — so the driver's
    oracle exercises the identical branch structure."""
    from sftp_data_ingestion_spark.functions.cleaning import (
        clean_uf_sql,
        digits_to_int_sql,
        nfe_key_44_sql,
        null_if_blank_sql,
        parse_date_multi_sql,
        parse_decimal_sql,
        parse_timestamp_multi_sql,
        strip_digits_to_null_sql,
    )

    exprs: list[str] = [
        f"{nfe_key_44_sql('chave_nfe')} AS chave_nfe",
        *[f"{parse_date_multi_sql(c)} AS {c}" for c in DATE_COLS],
        f"{parse_timestamp_multi_sql('data_ultima_ocr', iso_extras=True)} AS data_ultima_ocr",
        f"{parse_timestamp_multi_sql('chegada_transportadora', iso_extras=False)} AS chegada_transportadora",
        f"{null_if_blank_sql('data_ultima_ocr')} AS data_ultima_ocr_raw",
        f"{parse_decimal_sql('valor_nfe', 15, 2)} AS valor_nfe",
        f"{parse_decimal_sql('peso', 12, 3)} AS peso",
        f"{digits_to_int_sql('qtd_volumes')} AS qtd_volumes",
        f"{digits_to_int_sql('cod_cd')} AS cod_cd",
        f"{strip_digits_to_null_sql('cnpj_cpf_transportadora')} AS cnpj_cpf_transportadora",
        f"{strip_digits_to_null_sql('cpf_destinatario')} AS cpf_destinatario",
        f"{clean_uf_sql('uf')} AS uf",
        f"COALESCE({_parse_data_insercao_sql('data_insercao')}, {default_insercao_sql}) AS data_insercao",
        *[f"{null_if_blank_sql(c)} AS {c}" for c in TEXT_COLS],
    ]
    return "SELECT\n  " + ",\n  ".join(exprs) + f"\nFROM {relation}"


def clean_staging(df: DataFrame, default_insercao: Column | None = None) -> DataFrame:
    """staging (41 strings) -> typed fact-shaped DataFrame.

    ``default_insercao`` is the fallback for an unparseable
    ``data_insercao`` — ``now()`` in production
    (python/03_upsert_dw_pedidos.py:169), injectable for deterministic
    tests. Keeps ``data_ultima_ocr`` as the parsed timestamp plus
    ``data_ultima_ocr_raw`` (F9, :84).

    Physically this is TWO Project nodes, not one: the gated
    regex-extraction columns (NFe key, digit strips, UF) reference
    their ``regexp_replace`` result in both the gate condition and
    the value, and a single projection evaluates that regex TWICE per
    row (measured: subexpression elimination does not fire across the
    CASE boundary — 4.61 s vs 2.81 s for the bare extraction on the
    100x derivation). Aliasing the extraction in an inner select and
    gating in the outer evaluates it once: CollapseProject refuses to
    inline a non-cheap alias referenced more than once, so the two
    Projects survive optimization — pinned in
    tests/test_plans.py::test_cleaning_extractions_single_eval —
    while both stay inside one WholeStageCodegen (no materialization,
    still scan-local and shuffle-free at any scale)."""
    if default_insercao is None:
        default_insercao = F.current_timestamp()
    pre = df.select(
        "*",
        digits_only(F.col("chave_nfe")).alias("_dx_chave"),
        digits_only(F.col("qtd_volumes")).alias("_dx_qtd_volumes"),
        digits_only(F.col("cod_cd")).alias("_dx_cod_cd"),
        F.trim(digits_only(F.col("cnpj_cpf_transportadora"))).alias(
            "_dx_cnpj"
        ),
        F.trim(digits_only(F.col("cpf_destinatario"))).alias("_dx_cpf"),
        F.upper(F.regexp_replace(F.col("uf"), _NOT_ALPHA, "")).alias(
            "_dx_uf"
        ),
    )

    def _len44(d: Column) -> Column:
        return F.when(F.length(d) == 44, d).otherwise(
            F.lit(None).cast("string")
        )

    cols: list[Column] = [
        _len44(F.col("_dx_chave")).alias("chave_nfe"),
        *[parse_date_multi(F.col(c)).alias(c) for c in DATE_COLS],
        parse_timestamp_multi(F.col("data_ultima_ocr"), iso_extras=True).alias(
            "data_ultima_ocr"
        ),
        parse_timestamp_multi(
            F.col("chegada_transportadora"), iso_extras=False
        ).alias("chegada_transportadora"),
        null_if_blank(F.col("data_ultima_ocr")).alias("data_ultima_ocr_raw"),
        parse_decimal(F.col("valor_nfe"), 15, 2).alias("valor_nfe"),
        parse_decimal(F.col("peso"), 12, 3).alias("peso"),
        F.nullif(F.col("_dx_qtd_volumes"), F.lit("")).try_cast("int").alias(
            "qtd_volumes"
        ),
        F.nullif(F.col("_dx_cod_cd"), F.lit("")).try_cast("int").alias(
            "cod_cd"
        ),
        F.nullif(F.col("_dx_cnpj"), F.lit("")).alias(
            "cnpj_cpf_transportadora"
        ),
        F.nullif(F.col("_dx_cpf"), F.lit("")).alias("cpf_destinatario"),
        F.when(
            F.length("_dx_uf").between(2, 3), F.col("_dx_uf")
        ).otherwise(F.lit(None).cast("string")).alias("uf"),
        F.coalesce(_parse_data_insercao(F.col("data_insercao")), default_insercao).alias(
            "data_insercao"
        ),
        *[null_if_blank(F.col(c)).alias(c) for c in TEXT_COLS],
    ]
    return pre.select(cols)
