"""Time individual registry queries with the noop sink (guide §1.4).

Usage::

    python tools/time_queries.py name [name ...] [--runs N]

Runs each named query ``N`` times (default 3) after one untimed warm
run, prints per-run wall seconds and the min — the same steady-state
methodology as bench.py, isolated so one query can be iterated on
without paying the full bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from plda_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.all_queries()
    for name in args:
        spark.sparkContext.setJobDescription(name)

        def go() -> None:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        go()  # untimed warm run
        times = []
        for _ in range(runs):
            t0 = time.time()
            go()
            times.append(time.time() - t0)
        print(
            f"{name}: min={min(times):.3f}  runs="
            + ",".join(f"{t:.3f}" for t in times),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
