"""Physical-plan audit helpers: assert the plan you meant to write.

``plan_summary`` extracts the scale-relevant facts from a DataFrame's
physical plan — parquet pushed filters, read schemas (column pruning),
join strategies, exchange count — so tests can pin them:

    s = plan_summary(df)
    assert any("l_shipdate" in f for f in s["pushed_filters"])
    assert s["sort_merge_joins"] == 0        # dims should broadcast
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["explain_formatted", "plan_summary"]


def explain_formatted(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, returned instead of printed."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_summary(df: DataFrame) -> dict:
    plan = explain_formatted(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return {
        "pushed_filters": [p for p in pushed if p],
        "read_schemas": schemas,
        "scans": plan.count("Scan parquet"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": plan.count("ReusedExchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "plan": plan,
    }
