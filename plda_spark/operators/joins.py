"""Join helpers for scale: salted equi-join for skewed keys.

AQE's skew-join splitting (enabled in :mod:`plda_spark.session`) handles
most skew at runtime; explicit salting remains the tool when a single
hot key exceeds what AQE can split (e.g. one key owning 30% of a 100 TB
fact table) or when AQE is unavailable (streaming joins).

``salted_join`` produces results identical to a plain inner equi-join
(verified against the DuckDB oracle) while spreading each hot key over
``salt`` shuffle partitions: the big side gets a random salt in
[0, salt), the small side is exploded ``salt``× so every (key, salt)
bucket finds its match.  Cost: small side inflates by ``salt``; use for
genuinely skewed keys only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_join", "as_of_join", "range_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join on ``on`` with the shuffle key salted ``salt`` ways.

    Result equals ``big.join(small, on)`` row-for-row; only the physical
    key distribution changes.
    """
    big_s = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [on, "__salt"]).drop("__salt")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: Column | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (time-series
    point-in-time lookup — the operator Spark's join zoo lacks).

    Implementation is the union-window ("piggyback") plan, not a range
    join: tag both inputs, union them, and carry the last-seen right
    payload forward with ``last(..., ignorenulls=True)`` over a window
    partitioned by the key and ordered by time.  Cost is ONE shuffle of
    |L|+|R| rows on the key — no range explode, no per-row probe, no
    broadcast — so it scales to arbitrarily large fact/quote tables as
    long as single keys fit a task (the same per-key-ordering contract
    every windowed operator has; salt hot keys first if not).

    Left rows with no prior right row keep NULL right columns (left-join
    semantics).  Ties at equal timestamps match (``<=``); among right
    rows sharing one timestamp the winner is the last by ``tiebreak``
    (pass a column name for determinism).  ``tolerance`` (a Column
    interval or double, compared against ``left_ts - right_ts``) voids
    matches older than the bound, like pandas ``merge_asof``.

    Right columns are emitted with a ``right_`` prefix (except the key).
    """
    r_payload = [c for c in right.columns if c != on]
    order = [F.col("__ts"), F.col("__side")] + (
        [F.col(tiebreak).asc_nulls_first()] if tiebreak else []
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
        *([F.col(tiebreak)] if tiebreak and tiebreak not in (on,) else []),
    )
    l_cols = [F.col(c) for c in left.columns]
    lt = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *([F.lit(None).cast(right.schema[tiebreak].dataType).alias(tiebreak)]
          if tiebreak and tiebreak not in left.columns else []),
    )
    u = lt.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull()
                & ((F.col("__ts") - F.col(f"__m.{right_ts}")) <= tolerance),
                F.col("__m"),
            ),
        )
    out = [F.col(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"right_{c}") for c in r_payload
    ]
    return matched.select(*out)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: str | None = None,
) -> DataFrame:
    """Point-in-interval join: each ``points`` row matches every
    ``intervals`` row with ``start <= point < end`` (optionally also
    equi-keyed on ``on``) — IP→range lookups, time-validity joins,
    genomic overlap.

    A naive theta join is a (possibly keyed) nested-loop — O(|P|·|I|)
    per key.  This plan BINS the domain instead: each interval explodes
    onto the fixed-width bins it covers (``sequence`` over
    ``floor(start/w)..floor((end-1)/w)``), each point hashes to exactly
    one bin, and the join becomes an EQUI-join on (bin [, on]) with the
    precise range predicate as a post-filter.  Cost: shuffle of
    |P| + Σ_i ceil(len_i/w) rows and per-bin candidate products — linear
    in data for bounded interval length.  Pick ``bin_width`` near the
    typical interval length: wider bins = fewer interval replicas but
    more false candidates; narrower = the reverse.  Intervals spanning
    many bins replicate accordingly (cost is explicit, never quadratic).

    Output: all ``points`` columns plus the matching interval's columns
    (overlapping names prefixed ``right_``).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p_bin = F.floor(F.col(point_col) / bin_width)
    i_bins = F.sequence(
        F.floor(F.col(start_col) / bin_width),
        F.floor((F.col(end_col) - 1) / bin_width),
    )
    taken = set(points.columns)
    rename = {c: (f"right_{c}" if c in taken and c != on else c)
              for c in intervals.columns}
    iv = intervals.select(
        *[F.col(c).alias(rename[c]) for c in intervals.columns],
        F.explode(i_bins).alias("__bin"),
    )
    pt = points.withColumn("__bin", p_bin)
    keys = ["__bin"] + ([on] if on else [])
    return (
        pt.join(iv, keys)
        .where(
            (F.col(rename[start_col]) <= F.col(point_col))
            & (F.col(point_col) < F.col(rename[end_col]))
        )
        .drop("__bin")
    )
