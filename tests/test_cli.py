"""Golden end-to-end test (SURVEY §5.2(3)): the four-stage pipeline
through the CLI — ingest -> load -> upsert -> archive — on dirty
reference-shaped CSVs, plus full-idempotency on rerun."""

import datetime as dt
import json
from decimal import Decimal

from sftp_data_ingestion_spark.cli import main

HDR = ("ID;Data Inserção;Pedido;Data Nfe;Valor Nfe;Peso;Qtd. Volumes;UF;"
       "Chave NFe;Data Última Ocr.;Status Prazo")
K1, K2 = "1" * 44, "2" * 44


def _setup_remote(tmp_path):
    remote = tmp_path / "remote"
    remote.mkdir()
    (remote / "pedidos_1.csv").write_text(
        f"{HDR}\n"
        f"1;02/01/2024 10:00:00;P-1;25/12/2024;1.234,56;12,345;3 un; sp ;{K1};05/01/2024 08:00:00;NO PRAZO\n"
        f"2;02/01/2024 10:00:00;P-2;26/12/2024;999,99;1,5;1;RJ;{K2};06/01/2024 09:30:00;ATRASADO\n"
        f"3;02/01/2024 10:00:00;P-3;;;;;XX-BAD;BADKEY;;\n",
        encoding="utf-8",
    )
    (remote / "pedidos_2.csv").write_text(
        f"{HDR}\n"
        f"9;03/01/2024 11:00:00;P-1-upd;25/12/2024;1.234,56;12,345;3;SP;{K1};07/01/2024 10:00:00;ENTREGUE\n",
        encoding="utf-8",
    )
    return remote


def test_four_stage_golden_run(spark, tmp_path):
    remote = _setup_remote(tmp_path)
    argv = [
        "run-all",
        "--source", str(remote),
        "--landing", str(tmp_path / "novos"),
        "--warehouse", str(tmp_path / "wh"),
    ]
    assert main(argv) == 0

    dw = spark.read.parquet(str(tmp_path / "wh" / "dw"))
    rows = {r["chave_nfe"]: r.asDict() for r in dw.collect()}
    assert set(rows) == {K1, K2}  # BADKEY row excluded from DW

    r1 = rows[K1]
    assert r1["pedido"] == "P-1-upd"          # newer occurrence won
    assert r1["status_prazo"] == "ENTREGUE"
    assert r1["valor_nfe"] == Decimal("1234.56")   # pt-BR decimal
    assert r1["peso"] == Decimal("12.345")
    assert r1["qtd_volumes"] == 3                  # "3 un" -> 3
    assert r1["uf"] == "SP"
    assert r1["data_nfe"] == dt.date(2024, 12, 25)
    assert r1["data_ultima_ocr"] == dt.datetime(2024, 1, 7, 10, 0)
    assert rows[K2]["uf"] == "RJ"

    hist = spark.read.parquet(str(tmp_path / "wh" / "hist"))
    assert hist.count() == 4                  # ALL rows archived (P4:
    assert spark.read.parquet(               # bad keys reach hist)
        str(tmp_path / "wh" / "bronze")).count() == 0

    # full-pipeline idempotency: rerun with no new remote files
    # (materialize BEFORE the rerun — the upsert swap replaces the
    # files the old DataFrame references)
    before = sorted(map(str, dw.collect()))
    assert main(argv) == 0
    dw2 = spark.read.parquet(str(tmp_path / "wh" / "dw"))
    assert sorted(map(str, dw2.collect())) == before
    assert spark.read.parquet(str(tmp_path / "wh" / "hist")).count() == 4


def test_stage_commands_individually(spark, tmp_path):
    remote = _setup_remote(tmp_path)
    landing = str(tmp_path / "novos")
    wh = str(tmp_path / "wh")
    assert main(["ingest", "--source", str(remote), "--landing", landing]) == 0
    assert main(["load", "--landing", landing, "--warehouse", wh]) == 0
    assert main(["upsert", "--warehouse", wh]) == 0
    assert main(["archive", "--warehouse", wh, "--batch-id", "T1"]) == 0
    assert spark.read.parquet(f"{wh}/dw").count() == 2
    hist = spark.read.parquet(f"{wh}/hist")
    assert hist.where("batch_id = 'T1'").count() == 4
    # archive retry with the same batch id: idempotent
    assert main(["archive", "--warehouse", wh, "--batch-id", "T1"]) == 0
    assert spark.read.parquet(f"{wh}/hist").count() == 4


def test_upsert_without_bronze_is_noop(tmp_path):
    assert main(["upsert", "--warehouse", str(tmp_path / "empty_wh")]) == 0


def test_upsert_bucketed_path(spark, tmp_path):
    import os

    remote = _setup_remote(tmp_path)
    landing = str(tmp_path / "novos")
    wh = str(tmp_path / "wh")
    assert main(["ingest", "--source", str(remote), "--landing", landing]) == 0
    assert main(["load", "--landing", landing, "--warehouse", wh]) == 0
    # bootstrap lays out the bucketed DW
    assert main(["upsert", "--warehouse", wh, "--buckets", "8"]) == 0
    dw_dir = f"{wh}/dw"
    assert any(e.startswith("dw_bucket=") for e in os.listdir(dw_dir))
    dw = spark.read.parquet(dw_dir)
    assert dw.drop("dw_bucket").count() == 2      # same DW as plain path
    # second run merges through the pruned path and stays idempotent
    assert main(["upsert", "--warehouse", wh, "--buckets", "8"]) == 0
    spark.catalog.refreshByPath(dw_dir)
    dw2 = {r["chave_nfe"]: r["pedido"]
           for r in spark.read.parquet(dw_dir).collect()}
    assert dw2[K1] == "P-1-upd" and len(dw2) == 2


def test_curate_command(spark, tmp_path, capsys):
    import json

    out_dir = str(tmp_path / "curated")
    assert main([
        "curate",
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir,
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["curate"]
    assert stats["docs_in"] > 0
    assert stats["docs_out"] > 0
    assert stats["docs_in"] == (stats["docs_out"] + stats["dropped_low_quality"]
                                + stats["dropped_near_dup"])
    curated = spark.read.parquet(out_dir)
    assert curated.count() == stats["docs_out"]
    assert {"quality", "n_tokens"} <= set(curated.columns)
    assert stats["total_tokens"] > 0


def test_compact_command(spark, tmp_path, capsys):
    import json

    wh = str(tmp_path / "wh")
    bronze = f"{wh}/bronze"
    for b in range(6):
        spark.createDataFrame(
            [(b, f"r{b}")], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(bronze)
    before = spark.read.parquet(bronze).sort("id").collect()

    assert main(["compact", "--warehouse", wh]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["compact"]
    assert stats["bronze"]["compacted"] and stats["bronze"]["files_after"] == 1
    assert "hist" not in stats  # absent table skipped

    spark.catalog.refreshByPath(bronze)
    assert spark.read.parquet(bronze).sort("id").collect() == before


def test_scrub_command(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    spark.createDataFrame(
        [(0, "a b c x y z"), (1, "a b c p q r")], "doc_id long, text string"
    ).write.parquet(src)
    assert main(["scrub", "--documents", src, "--output", out]) == 0
    rep = json.loads(capsys.readouterr().out)["scrub"]
    assert rep["docs"] == 2 and rep["chunks_removed"] == 2
    got = {
        r["doc_id"]: r["clean_text"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {0: "x y z", 1: "p q r"}


def test_skew_command(spark, tmp_path, capsys):
    src = str(tmp_path / "ev")
    rows = [("hot",)] * 8 + [("a",), ("b",)]
    spark.createDataFrame(rows, "k string").write.parquet(src)
    assert main(
        ["skew", "--input", src, "--keys", "k", "--target-rows", "2"]
    ) == 0
    rep = json.loads(capsys.readouterr().out)["skew"]
    assert rep["max_key_rows"] == 8 and rep["recommended_salts"] == 4
