"""JDBC warehouse sink: merge-SQL generation parity with the
reference's ON CONFLICT statement, and stage-then-merge orchestration
(execution injected — no database/driver in this container)."""

import pytest

from sftp_data_ingestion_spark.io import jdbc_sink as js

COLS = ["chave_nfe", "valor_nfe", "data_ultima_ocr", "status_prazo",
        "data_insercao"]


def _sql():
    return js.jdbc_upsert_sql(
        table="dw.fat_pedidos",
        staging_table="staging.delta",
        columns=COLS,
        key="chave_nfe",
        newer_col="data_ultima_ocr",
        newer_wins_cols=["data_ultima_ocr", "status_prazo"],
        greatest_cols=["data_insercao"],
    )


def test_upsert_sql_shape():
    sql = _sql()
    # reference statement anatomy (03_upsert_dw_pedidos.py:182-246)
    assert 'ON CONFLICT ("chave_nfe") DO UPDATE' in sql
    assert 'WHERE s."chave_nfe" IS NOT NULL' in sql  # P4 gate (:200)
    # newer-wins: CASE guarded by the strictly-newer comparison
    assert (
        '"status_prazo" = CASE WHEN EXCLUDED."data_ultima_ocr" > '
        '"dw"."fat_pedidos"."data_ultima_ocr" THEN EXCLUDED."status_prazo" '
        'ELSE "dw"."fat_pedidos"."status_prazo" END' in sql
    )
    # greatest policy (F14)
    assert (
        '"data_insercao" = GREATEST("dw"."fat_pedidos"."data_insercao", '
        'EXCLUDED."data_insercao")' in sql
    )
    # fill-the-blanks for everything else
    assert (
        '"valor_nfe" = COALESCE(EXCLUDED."valor_nfe", '
        '"dw"."fat_pedidos"."valor_nfe")' in sql
    )
    # the key itself is never re-set
    assert '"chave_nfe" = ' not in sql.split("SET")[1]


def test_upsert_sql_quotes_identifiers():
    sql = js.jdbc_upsert_sql(
        "t", "s", ["key", 'we"ird'], "key", "key"
    )
    assert '"we""ird"' in sql


def test_upsert_via_jdbc_requires_executor(spark):
    df = spark.range(1).withColumnRenamed("id", "chave_nfe")
    with pytest.raises(ValueError, match="run_sql"):
        js.upsert_via_jdbc(df, "jdbc:x", "t", key="chave_nfe",
                           newer_col="chave_nfe")


def test_upsert_via_jdbc_stages_then_merges(spark, monkeypatch):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["chave_nfe", "status_prazo"]
    )
    staged = {}

    def fake_write(frame, url, table, mode, properties, num_partitions,
                   batchsize):
        staged.update(url=url, table=table, mode=mode,
                      n=frame.count(), batchsize=batchsize)

    monkeypatch.setattr(
        js, "write_jdbc",
        lambda frame, url, table, mode="append", properties=None,
        num_partitions=None, batchsize=10_000: fake_write(
            frame, url, table, mode, properties, num_partitions, batchsize
        ),
    )
    ran = []
    sql = js.upsert_via_jdbc(
        df, "jdbc:postgresql://wh/db", "dw.fat_pedidos",
        key="chave_nfe", newer_col="data_ultima_ocr",
        run_sql=ran.append,
    )
    # staging load happened first, overwrite mode, derived table name
    assert staged == {
        "url": "jdbc:postgresql://wh/db",
        "table": "dw.fat_pedidos_delta_stage",
        "mode": "overwrite", "n": 2, "batchsize": 10_000,
    }
    # then exactly one server-side merge statement
    assert ran == [sql]
    assert "ON CONFLICT" in sql
    assert '"dw"."fat_pedidos_delta_stage"' in sql
