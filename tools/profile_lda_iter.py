"""Sub-phase profile of one LDA training iteration at scale.

Splits the per-iteration wall time of the train loop (train.py:300-331)
into: model broadcast, sweep job + localCheckpoint, payload-row collect
(the `where(doc_id<0)` scan inside `_aggregate_model`), and the
driver-side sparse sum — so perf work targets the real bottleneck
instead of the total.

Usage: python tools/profile_lda_iter.py [n_docs] [avg_len] [vocab] [k] [iters]
"""

from __future__ import annotations

import json
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark import TaskContext
from pyspark.sql import functions as F

from plda_spark.lda import train as T
from plda_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    avg_len = int(sys.argv[2]) if len(sys.argv) > 2 else 333
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 6

    spark = get_spark("lda-iter-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    P = sc.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rng = np.random.Generator(np.random.PCG64(1234 + pid))
        for pdf in batches:
            lens = rng.poisson(avg_len, len(pdf)).clip(min=1)
            occ = [
                (rng.random(n) ** 2 * V).astype(np.int32).clip(max=V - 1)
                for n in lens
            ]
            yield pd.DataFrame({"doc_id": pdf["id"], "word_occ": occ})

    packed = spark.range(n_docs, numPartitions=P).mapInPandas(
        gen, schema="doc_id long, word_occ array<int>"
    )
    t0 = time.time()
    df_z = packed.mapInPandas(T._zinit_fn(K, V, 42), schema=T._SWEEP_SCHEMA)
    df_z = df_z.localCheckpoint(eager=True)
    t_init = time.time() - t0
    nwk, _ = T._aggregate_model(df_z, V, K)

    rows = []
    for it in range(iters):
        t0 = time.time()
        bn = sc.broadcast(nwk)
        bk = sc.broadcast(nwk.sum(axis=0))
        t_bc = time.time() - t0

        t0 = time.time()
        swept = df_z.where(F.col("doc_id") >= 0).mapInPandas(
            T._sweep_fn(bn, bk, 0.1, 0.01, 42, it, False), schema=T._SWEEP_SCHEMA
        )
        new_z = swept.localCheckpoint(eager=True)
        t_sweep = time.time() - t0

        df_z.unpersist()
        df_z = new_z

        t0 = time.time()
        pdf = df_z.where(F.col("doc_id") < 0).select("z").toPandas()
        t_collect = time.time() - t0

        t0 = time.time()
        flat = np.zeros(V * K, dtype=np.int64)
        for buf in pdf["z"]:
            a = np.frombuffer(buf, dtype=np.int32).astype(np.int64)
            flat[a[0::2]] += a[1::2]
        nwk = flat.reshape(V, K)
        t_sum = time.time() - t0

        bn.destroy()
        bk.destroy()
        rows.append(
            {
                "iter": it,
                "broadcast_s": round(t_bc, 3),
                "sweep_ckpt_s": round(t_sweep, 3),
                "payload_scan_s": round(t_collect, 3),
                "driver_sum_s": round(t_sum, 3),
                "total_s": round(t_bc + t_sweep + t_collect + t_sum, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"init_s": round(t_init, 2), "cores": P, "iters": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
