"""Physical-plan audit helpers: the ".explain and iterate" loop as code.

These make scale hygiene *testable*: column pruning reached the scan,
filters pushed down, no surprise shuffles, whole-stage codegen covers the
JVM-side operators.  Used by the test suite and handy at a REPL:

    >>> plan_report(df)
    {'exchanges': 1, 'read_schema': ['l_partkey'], 'codegen': True, ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap kind)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hashpartitioning|"
                          r"rangepartitioning|RoundRobinPartitioning)", plan))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) file scan — the column-pruning
    ground truth."""
    plan = explain_str(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    cols = []
    for part in m.group(1).split(","):
        name = part.split(":")[0].strip()
        if name:
            cols.append(name)
    return cols


def pushed_filters(df: DataFrame) -> str:
    plan = explain_str(df, "formatted")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return m.group(1) if m else ""


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    plan = explain_str(df, "formatted")
    return "WholeStageCodegen" in plan or "*(1)" in explain_str(df, "simple")


def plan_report(df: DataFrame) -> dict:
    return {
        "exchanges": count_exchanges(df),
        "read_schema": read_schema_columns(df),
        "pushed_filters": pushed_filters(df),
        "codegen": uses_whole_stage_codegen(df),
    }
