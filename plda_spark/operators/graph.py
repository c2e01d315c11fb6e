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
    (with outdegrees) is the only big operand: it is persisted for the
    run and released before returning, exactly the
    ``connected_components`` discipline, so no iteration re-executes
    the edge scan or the outdeg aggregation.  Only the scalar |V|
    touches the driver.  The loop runs eagerly (the result is a
    materialized localCheckpoint) with lineage cut every 5 iterations.
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
    # (src, dst, outdeg) — the per-iteration join operand, persisted for
    # the run and released before returning (connected_components
    # discipline: cached once, no per-iteration re-aggregation).
    ew = e.join(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    ).persist()
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()  # scalar |V| only — never the rows
    if n == 0:
        ew.unpersist()
        raise ValueError("pagerank: empty edge set (no nodes)")
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    try:
        for i in range(n_iter):
            ranks = _pagerank_step(nodes, ew, ranks, base, damping)
            if (i + 1) % 5 == 0 and i + 1 < n_iter:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks.localCheckpoint(eager=True)
    finally:
        ew.unpersist()


def _pagerank_step(
    nodes: DataFrame, ew: DataFrame, ranks: DataFrame, base: float, damping: float
) -> DataFrame:
    """One power-iteration update (separate so plan-shape tests can pin
    the per-iteration plan: equi-join + partial-aggregated sum, never a
    nested loop)."""
    contribs = (
        ew.join(ranks, ew["src"] == ranks["node"])
        .select("dst", (F.col("rank") / F.col("outdeg")).alias("__c"))
        .groupBy("dst")
        .agg(F.sum("__c").alias("__s"))
    )
    return nodes.join(contribs, nodes["node"] == contribs["dst"], "left").select(
        "node",
        (F.lit(base) + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))).alias(
            "rank"
        ),
    )
