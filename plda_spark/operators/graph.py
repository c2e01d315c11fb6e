"""Graph analytics over edge DataFrames: PageRank power iteration.

Dedup clustering already walks graphs (operators.dedup.connected_components
— min-label propagation); this module adds rank-style analytics for link
graphs a crawl-curation pipeline carries (host linkage, citation graphs,
doc-reference graphs).  Public formulation per Page et al., "The PageRank
Citation Ranking" (1999), in the classic simplified form the Spark
examples use: no dangling-mass redistribution, so total rank can be < 1
when sinks exist (rank ORDER is unaffected).

No reference parity (the reference is an LDA trainer, plda); this is an
engine extension (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    ``r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u)``, starting
    from the uniform vector.  Returns ``(node, rank)``.

    Scale shape (Pregel-style, holds at any |E|): per iteration exactly
    ONE shuffle join of edges with the |V|-row rank vector on ``src``
    plus one ``groupBy(dst)`` partial-aggregated sum — the edge set
    itself is the only big operand and it is never collected; callers
    running many iterations should ``persist()`` ``edges`` so each
    iteration rereads a cached copy instead of the source scan.  Only
    the scalar |V| touches the driver.  Lineage is cut with a lazy
    ``localCheckpoint`` every 5 iterations so long runs do not accrete
    a deep plan.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # (src, dst, outdeg) — the per-iteration join operand, persisted once.
    ew = e.join(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    ).persist()
    n = nodes.count()  # scalar |V| only — never the rows
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 5 == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
