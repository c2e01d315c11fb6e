"""Capture ``.explain("formatted")`` for registry queries.

Usage::

    python tools/capture_plans.py OUTDIR [name ...]

With no names, captures every registry query (planning only — no
execution).  Each query's formatted physical plan goes to
``OUTDIR/<name>.txt`` plus a one-line summary (exchange count, join
strategies, python-eval nodes) to ``OUTDIR/_summary.tsv`` so the hot
plans can be triaged without opening each file.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from plda_spark.session import get_spark


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    # PLAN_BCAST_THRESHOLD=-1 disables broadcast joins so the summary
    # shows the at-scale join landscape AQE's local broadcasts mask.
    bcast = os.environ.get("PLAN_BCAST_THRESHOLD")
    if bcast is not None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    qs = entrymod.all_queries()
    if not names:
        names = sorted(qs)
    rows = []
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - triage tool
            plan = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        rows.append(
            (
                name,
                len(re.findall(r"\bExchange\b", plan)),
                len(re.findall(r"SortMergeJoin", plan)),
                len(re.findall(r"BroadcastHashJoin", plan)),
                len(re.findall(r"ShuffledHashJoin", plan)),
                len(re.findall(r"BatchEvalPython", plan)),
                len(re.findall(r"ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)),
                len(re.findall(r"\bWindow\b", plan)),
                len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
            )
        )
    with open(os.path.join(outdir, "_summary.tsv"), "w") as fh:
        fh.write("name\texchanges\tsmj\tbhj\tshj\tbatch_py\tarrow_py\twindow\tnljoin\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
