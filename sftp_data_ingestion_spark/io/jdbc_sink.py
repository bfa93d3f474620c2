"""Optional JDBC warehouse sink — parity with the reference's
PostgreSQL terminal store.

The engine's native store is Parquet with atomic swap (SURVEY-
sanctioned; ``io/sinks.py``), but a user migrating off the reference
may keep the PostgreSQL warehouse. This stage reproduces the
reference's load shape on top of Spark:

* bulk append via Spark's JDBC writer (plays the role of ``COPY``,
  ``/root/reference/python/02_load_stage_pedidos.py:179-196``) —
  parallel by partition, batched inserts;
* upsert via *stage-then-merge*: Spark JDBC has no ON CONFLICT mode,
  so the delta bulk-loads into a staging table and ONE server-side
  ``INSERT ... ON CONFLICT (key) DO UPDATE`` statement merges it —
  the exact statement shape of
  ``/root/reference/python/03_upsert_dw_pedidos.py:182-246``, with
  the same three column policies (newer-wins / GREATEST /
  fill-the-blanks) generated from the same policy spec that drives
  the in-Spark merge (``operators/merge.py``).

No JDBC driver or database ships in this container, so the statement
EXECUTION is injected (``run_sql``) — deployments pass a psycopg2 /
JayDeBeApi / py4j-DriverManager callable; tests inject a recorder.
The SQL *generation* is pure and fully tested.

Scale notes: ``num_partitions`` bounds concurrent warehouse
connections (each Spark partition opens one); ``batchsize`` is the
rows-per-roundtrip dial. The merge statement itself is one
transaction server-side — same as the reference — so Spark
parallelism never races the uniqueness invariant.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    batchsize: int = 10_000,
) -> None:
    """Bulk-load a DataFrame over JDBC (the COPY-role bulk path).

    ``num_partitions`` caps writer parallelism (= open connections);
    ``batchsize`` sets rows per INSERT batch."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    ).option("batchsize", str(batchsize))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def _q(ident: str) -> str:
    """Quote a SQL identifier (defense against reserved words; the
    column names here come from the engine's own schemas)."""
    return '"' + ident.replace('"', '""') + '"'


def _q_table(name: str) -> str:
    """Quote a possibly schema-qualified table name part by part
    (``dw.fat_pedidos`` -> ``"dw"."fat_pedidos"``) — reserved words
    and mixed case in table names get the same defense columns do,
    and caller-supplied staging names cannot smuggle raw SQL."""
    return ".".join(_q(p) for p in name.split("."))


def jdbc_upsert_sql(
    table: str,
    staging_table: str,
    columns: Sequence[str],
    key: str,
    newer_col: str,
    newer_wins_cols: Sequence[str] = (),
    greatest_cols: Sequence[str] = (),
    set_once_cols: Sequence[str] = (),
) -> str:
    """Generate the server-side merge statement — the reference's
    ``ON CONFLICT`` upsert (03_upsert_dw_pedidos.py:182-246) with its
    column policies, parameterized the same way as the in-Spark
    :func:`operators.merge.upsert_newer_wins`:

    * ``newer_wins_cols``: replaced only when the incoming
      ``newer_col`` is strictly newer (NULL comparison keeps old);
    * ``greatest_cols``: ``GREATEST(old, new)``;
    * ``set_once_cols``: OMITTED from the SET clause — an existing row
      keeps its value unconditionally (the reference's statement
      leaves ``data_nfe`` / ``data_prev_entrega_original`` out of SET
      for exactly this effect);
    * everything else: ``COALESCE(new, old)`` — fill the blanks.

    The NULL-key gate (``WHERE key IS NOT NULL``, :200) is included;
    the staging table must already be deduped to one row per key
    (U3), exactly as the in-Spark path requires."""
    qt = _q_table(table)
    qs = _q_table(staging_table)
    cols = ", ".join(_q(c) for c in columns)
    sels = ", ".join(f"s.{_q(c)}" for c in columns)
    newer = (
        f"EXCLUDED.{_q(newer_col)} > {qt}.{_q(newer_col)}"
    )
    sets = []
    for c in columns:
        if c == key or c in set_once_cols:
            continue
        if c in newer_wins_cols:
            sets.append(
                f"{_q(c)} = CASE WHEN {newer} THEN EXCLUDED.{_q(c)} "
                f"ELSE {qt}.{_q(c)} END"
            )
        elif c in greatest_cols:
            sets.append(
                f"{_q(c)} = GREATEST({qt}.{_q(c)}, EXCLUDED.{_q(c)})"
            )
        else:
            sets.append(
                f"{_q(c)} = COALESCE(EXCLUDED.{_q(c)}, {qt}.{_q(c)})"
            )
    set_clause = ",\n  ".join(sets)
    return (
        f"INSERT INTO {qt} ({cols})\n"
        f"SELECT {sels} FROM {qs} s\n"
        f"WHERE s.{_q(key)} IS NOT NULL\n"
        f"ON CONFLICT ({_q(key)}) DO UPDATE\nSET\n  {set_clause};"
    )


def upsert_via_jdbc(
    delta: DataFrame,
    url: str,
    table: str,
    key: str,
    newer_col: str,
    newer_wins_cols: Sequence[str] = (),
    greatest_cols: Sequence[str] = (),
    staging_table: str | None = None,
    run_sql: Callable[[str], None] | None = None,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    batchsize: int = 10_000,
) -> str:
    """Stage-then-merge upsert into a JDBC warehouse: bulk-load the
    (pre-deduped) delta into ``staging_table`` (overwrite), then run
    ONE server-side merge statement via ``run_sql``. Returns the
    statement executed (for logging/audit).

    ``run_sql`` is the deployment's SQL executor (e.g. a psycopg2
    ``cursor.execute`` inside a transaction) — required because Spark
    JDBC cannot express ON CONFLICT and no driver ships here."""
    if run_sql is None:
        raise ValueError(
            "upsert_via_jdbc needs run_sql: a callable executing one "
            "SQL statement against the warehouse (e.g. psycopg2 "
            "cursor.execute) — Spark's JDBC writer cannot run "
            "ON CONFLICT merges itself"
        )
    staging_table = staging_table or f"{table}_delta_stage"
    write_jdbc(
        delta,
        url,
        staging_table,
        mode="overwrite",
        properties=properties,
        num_partitions=num_partitions,
        batchsize=batchsize,
    )
    sql = jdbc_upsert_sql(
        table,
        staging_table,
        delta.columns,
        key,
        newer_col,
        newer_wins_cols,
        greatest_cols,
    )
    run_sql(sql)
    return sql
