"""Small-file compaction — the unglamorous operation every long-lived
100 TB lake actually needs.  Streaming ingests (one file per micro-batch
partition), incremental dedup ledgers, and per-increment appends all
accrete thousands of tiny parquet files; at read time each file costs a
footer fetch + task schedule, and a 100k-file day makes listing alone
the bottleneck.  Compaction rewrites a dataset into files near a target
size, preserving content exactly (row-for-row) and, for partitioned
layouts, preserving the partition directory structure.

Scale shape: ONE listing pass (Hadoop FileSystem API — works on HDFS /
S3A / local alike) sizes the input, the file count comes from
``ceil(bytes / target_file_bytes)`` (on-disk bytes of the SAME codec are
the right estimator for output bytes), and the rewrite is one
round-robin ``repartition(n)`` — a single all-to-all shuffle whose
output tasks each write exactly one ~target-size file.  Partitioned
datasets bin-pack WITHIN each partition directory: per-directory byte
totals come from the same listing, each partition value gets
``ceil(dir_bytes / target)`` output files via a salt column, and the
``repartition(partition_cols + salt)`` shuffle co-locates exactly one
output file's rows per task — so a skewed partition gets many files and
a tiny one gets one, with no global sort and no driver data pass.

Deliberately content-neutral: no implicit sorting or clustering (use
``sources.zorder.write_zordered`` when read-locality is the goal), no
schema changes, no compression changes unless asked.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_parquet", "dataset_file_stats"]


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every DATA file under ``path`` (recursive),
    skipping _SUCCESS/_metadata/hidden files — via the Hadoop
    FileSystem API so HDFS/S3A/local all work."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def dataset_file_stats(spark: SparkSession, path: str) -> dict:
    """One listing pass → ``{n_files, total_bytes, min_bytes, max_bytes,
    mean_bytes}`` — the numbers that tell you whether a dataset needs
    compacting at all (mean far under the row-group sweet spot ⇒ yes)."""
    files = _list_data_files(spark, path)
    sizes = [s for _, s in files]
    n = len(sizes)
    return {
        "n_files": n,
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if n else 0,
        "max_bytes": max(sizes) if n else 0,
        "mean_bytes": (sum(sizes) // n) if n else 0,
    }


def _partition_dir_of(file_path: str, partition_cols: list[str]) -> tuple:
    """The partition-value tuple encoded in a file's directory path
    (``…/col1=v1/col2=v2/part-….parquet``), in partition_cols order.
    Raises if a declared partition column is absent — compacting with
    the wrong column list would silently merge partitions."""
    kv = {}
    for comp in file_path.split("/")[:-1]:
        key, eq, val = comp.partition("=")
        if eq:
            kv[key] = val
    try:
        return tuple(kv[c] for c in partition_cols)
    except KeyError as exc:
        raise ValueError(
            f"file {file_path} has no partition directory for column "
            f"{exc.args[0]!r}; partition_cols={partition_cols} does not "
            "match the dataset layout"
        ) from None


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 512 << 20,
    partition_cols: list[str] | None = None,
    compression: str | None = None,
) -> dict:
    """Rewrite the parquet dataset at ``in_path`` to ``out_path`` with
    files near ``target_file_bytes``, content byte-identical row-for-row
    (no sort, no schema change).  ``partition_cols`` (must match the
    input's ``partitionBy`` layout) preserves the directory structure
    and bin-packs within each partition.  Returns a before/after report
    ``{files_before, bytes_before, n_output_files (planned),
    files_after, bytes_after}``.

    ``out_path`` must differ from ``in_path``: compact-in-place would
    destroy the input on a mid-write failure; swap directories (or
    table pointers) atomically AFTER the report comes back clean.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be > 0")
    if in_path.rstrip("/") == out_path.rstrip("/"):
        raise ValueError(
            "compact_parquet refuses in-place compaction (a mid-write "
            "failure would destroy the input); write to a sibling path "
            "and swap afterwards"
        )
    files = _list_data_files(spark, in_path)
    if not files:
        raise ValueError(f"no data files under {in_path}")
    bytes_before = sum(s for _, s in files)
    df = spark.read.parquet(in_path)

    writer_opts = {}
    if compression is not None:
        writer_opts["compression"] = compression

    if not partition_cols:
        n_out = max(1, math.ceil(bytes_before / target_file_bytes))
        (
            df.repartition(n_out)
            .write.options(**writer_opts)
            .mode("overwrite")
            .parquet(out_path)
        )
    else:
        # Per-partition byte totals from the SAME listing, then a salt
        # in [0, files_for_this_partition) assigned via a broadcast map
        # join; repartition(cols + salt) puts exactly one output file's
        # rows in each task.  Row-hash salting (not round-robin) keeps
        # the assignment deterministic under retries.
        per_dir: dict[tuple, int] = {}
        for fpath, sz in files:
            key = _partition_dir_of(fpath, partition_cols)
            per_dir[key] = per_dir.get(key, 0) + sz
        plan_rows = [
            (*key, max(1, math.ceil(sz / target_file_bytes)))
            for key, sz in per_dir.items()
        ]
        # partition values parsed from dir names are strings; compare
        # against the column cast to string so typed partition columns
        # (int dates etc.) still match
        plan_schema = ", ".join(
            [f"__pv_{c} string" for c in partition_cols] + ["__n_files int"]
        )
        plan = spark.createDataFrame(plan_rows, plan_schema)
        cond = [
            df[c].cast("string").eqNullSafe(F.col(f"__pv_{c}"))
            for c in partition_cols
        ]
        data_cols = [c for c in df.columns if c not in set(partition_cols)]
        salted = (
            df.join(F.broadcast(plan), cond, "left")
            .withColumn(
                "__salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in data_cols]),
                    F.greatest(F.col("__n_files"), F.lit(1)),
                ).cast("int"),
            )
            .drop(*[f"__pv_{c}" for c in partition_cols], "__n_files")
        )
        n_out = sum(r[-1] for r in plan_rows)
        (
            salted.repartition(*partition_cols, "__salt")
            .drop("__salt")
            .write.options(**writer_opts)
            .partitionBy(*partition_cols)
            .mode("overwrite")
            .parquet(out_path)
        )

    after = dataset_file_stats(spark, out_path)
    return {
        "files_before": len(files),
        "bytes_before": bytes_before,
        "n_output_files": n_out,
        "files_after": after["n_files"],
        "bytes_after": after["total_bytes"],
    }
