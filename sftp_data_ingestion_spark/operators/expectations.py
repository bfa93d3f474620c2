"""Data-quality expectations: declarative rule checks that audit a
table in one pass per rule CLASS, not one scan per rule.

The reference enforces quality ad hoc (header gate, NULL-key filter,
44-digit NFe gate — ``/root/reference/python/02_processa_pedidos.py``);
the warehouse-native generalization is an expectations suite: declare
rules, get back one violation count per rule, fail or quarantine on
nonzero. Rule classes and their plan shapes:

* row rules (``not_null``, ``in_range``, ``in_set``, ``rlike``):
  each compiles to a 0/1 Column; ALL of them aggregate in a single
  scan of the table (one HashAggregate over sums of flags — adding a
  rule adds an expression, not a pass);
* ``unique``: one groupBy on the key counting groups with >1 row;
* ``foreign_key``: an anti-join against the dimension's key column —
  broadcast when the dimension is small, the usual dim-FK case.

Output is long format ``(rule, n_violations)`` so the suite result is
itself a small auditable table (write it next to the batch lineage).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str = ""
    args: tuple = field(default_factory=tuple)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", col)


def in_range(name: str, col: str, lo, hi) -> Rule:
    """Violated when the value is non-NULL and outside [lo, hi]
    (NULL-ness is ``not_null``'s job, not a range violation)."""
    return Rule(name, "in_range", col, (lo, hi))


def in_set(name: str, col: str, values: tuple) -> Rule:
    return Rule(name, "in_set", col, tuple(values))


def rlike(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, "rlike", col, (pattern,))


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", cols[0], tuple(cols))


def foreign_key(name: str, col: str, dim: DataFrame, dim_col: str) -> Rule:
    r = Rule(name, "foreign_key", col)
    object.__setattr__(r, "args", (dim, dim_col))
    return r


def _row_flag(rule: Rule):
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.args
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.args))
    if rule.kind == "rlike":
        return c.isNotNull() & ~c.rlike(rule.args[0])
    raise ValueError(rule.kind)


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns ``(rule, n_violations)`` rows in
    no guaranteed order (it is a result set, sort downstream)."""
    row_rules = [r for r in rules if r.kind in ("not_null", "in_range", "in_set", "rlike")]
    legs: list[DataFrame] = []
    if row_rules:
        agg = df.agg(
            *[
                F.coalesce(
                    F.sum(_row_flag(r).cast("long")), F.lit(0)
                ).alias(r.name)
                for r in row_rules
            ]
        )
        names = ", ".join(f"'{r.name}', {r.name}" for r in row_rules)
        legs.append(
            agg.select(
                F.expr(
                    f"stack({len(row_rules)}, {names}) AS (rule, n_violations)"
                )
            )
        )
    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.args)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(
                    F.coalesce(
                        F.sum(F.col("__n") - 1), F.lit(0)
                    ).alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            legs.append(dup)
        elif r.kind == "foreign_key":
            dim, dim_col = r.args
            # rename the dim key so the condition stays unambiguous
            # when fact and dimension share the column name (the
            # normal FK case)
            dim_keys = F.broadcast(
                dim.select(F.col(dim_col).alias("__dim_key")).distinct()
            )
            orphan = (
                df.where(F.col(r.col).isNotNull())
                .join(
                    dim_keys,
                    F.col(r.col) == F.col("__dim_key"),
                    "anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            legs.append(orphan)
    if not legs:  # empty suite: empty report, stable schema
        return df.sparkSession.createDataFrame(
            [], "rule string, n_violations long"
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
