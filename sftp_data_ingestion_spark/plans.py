"""Physical-plan audit: the scale rules this repo pins in
``tests/test_plans.py``, productized as a runtime utility so a
pipeline can refuse to launch a 100 TB job with a known-pathological
plan (the review the VERDICT performs by hand, as code).

``audit(df)`` inspects the pre-execution physical plan (AQE's initial
plan, exchanges inserted — AQE can only improve it at runtime) and
returns structured findings:

- ``nested_loop_join`` (error): CartesianProduct /
  BroadcastNestedLoopJoin — O(n*m) pair work; at scale this is the
  difference between hours and never finishing. (The deliberate
  broadcast-NL pair scorers in ext/similarity pass ``allow=`` for it.)
- ``python_row_udf`` (error): ``BatchEvalPython`` — row-at-a-time
  Python in the hot path, the 10-100x slow path; Arrow-batched
  evaluation (``ArrowEvalPython`` / mapInPandas) does not trigger it.
- ``filter_not_pushed`` (warn): a scan carrying DataFilters none of
  which reached the parquet reader (PushedFilters empty) — every row
  is decoded before filtering; usually a non-pushable expression
  wrapping the column (fix: persist a derived column, or rewrite the
  predicate against the raw column).
- ``interpreted_hof_scoring`` (warn): aggregate()/zip_with() fold
  primitives inside a Project — interpreted per-row execution outside
  whole-stage codegen (the r3 bench regression class); fine per-row
  on small inputs, pathological in per-pair scoring.
- ``shuffle_exchanges`` (info): count of shuffle (non-broadcast)
  exchanges — the number to watch when comparing plan variants.

This is a text-plan heuristic, deliberately: it audits exactly what a
human reads in ``.explain("formatted")``, needs no private APIs, and
the same strings are what the repo's plan tests assert on.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    rule: str
    severity: str  # "error" | "warn" | "info"
    detail: str


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bracket_list(line: str, marker: str) -> list[str]:
    """Split the bracketed list following ``marker`` on top-level
    commas (predicates nest parens/brackets, e.g. ``In(c, [a,b])``)."""
    start = line.find(marker)
    if start < 0:
        return []
    i = start + len(marker)
    depth, items, cur = 0, [], []
    while i < len(line):
        ch = line[i]
        if ch in "([":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "]":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        items.append(tail)
    return items


def audit(df: DataFrame) -> list[Finding]:
    p = _plan_text(df)
    out: list[Finding] = []
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in p:
            out.append(
                Finding(
                    "nested_loop_join",
                    "error",
                    f"{node} present: O(left x right) pair work at scale",
                )
            )
    if "BatchEvalPython" in p:
        out.append(
            Finding(
                "python_row_udf",
                "error",
                "row-at-a-time Python UDF in plan; use built-in Column "
                "expressions or Arrow-batched pandas UDFs",
            )
        )
    for ln in p.splitlines():
        if "FileScan" in ln and "DataFilters: [" in ln:
            n_data = len(_bracket_list(ln, "DataFilters: ["))
            n_pushed = len(_bracket_list(ln, "PushedFilters: ["))
            if n_data > n_pushed:
                out.append(
                    Finding(
                        "filter_not_pushed",
                        "warn",
                        f"{n_data - n_pushed} of {n_data} scan predicates "
                        "did not reach the parquet reader (rows decoded "
                        "then filtered): " + ln.strip()[:160],
                    )
                )
    for ln in p.splitlines():
        if "Project" in ln and ("zip_with(" in ln or "aggregate(" in ln):
            out.append(
                Finding(
                    "interpreted_hof_scoring",
                    "warn",
                    "fold primitive inside a projection (interpreted, "
                    "outside whole-stage codegen): " + ln.strip()[:120],
                )
            )
            break
    n_shuffles = sum(
        1
        for ln in p.splitlines()
        if "Exchange" in ln and "broadcast" not in ln.lower()
    )
    out.append(
        Finding("shuffle_exchanges", "info", str(n_shuffles))
    )
    return out


def assert_clean(
    df: DataFrame, allow: tuple[str, ...] = ()
) -> list[Finding]:
    """Raise ``ValueError`` with the full report if the plan carries
    any error-severity finding not named in ``allow``; returns the
    findings otherwise (warns/infos included, for logging)."""
    findings = audit(df)
    errors = [
        f for f in findings if f.severity == "error" and f.rule not in allow
    ]
    if errors:
        lines = "\n".join(f"- {f.rule}: {f.detail}" for f in errors)
        raise ValueError(f"plan audit failed:\n{lines}")
    return findings
