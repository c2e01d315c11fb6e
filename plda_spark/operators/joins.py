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

__all__ = ["salted_join", "as_of_join", "range_join", "interval_overlap_join", "fuzzy_pairs", "fuzzy_join"]


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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks, for the same ``on`` key, the
    latest right row with ``right_ts <= left_ts`` (``direction=
    "backward"``, the default), the earliest right row with ``right_ts
    >= left_ts`` (``"forward"``), or whichever of the two is closer in
    time with backward winning exact ties (``"nearest"``) — the
    time-series point-in-time lookup Spark's join zoo lacks, with the
    same three directions as pandas ``merge_asof``.

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

    ``forward`` is the same union-window plan scanned in descending time
    order; ``nearest`` runs both scans — two sorts but ONE shuffle, the
    second window reuses the key partitioning — and keeps the closer
    match per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    r_payload = [c for c in right.columns if c != on]
    tb = [F.col(tiebreak).asc_nulls_first()] if tiebreak else []
    order_b = [F.col("__ts").asc(), F.col("__side").asc(), *tb]
    order_f = [F.col("__ts").desc(), F.col("__side").asc(), *tb]
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

    def scan(order: list[Column], name: str) -> Column:
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__r", ignorenulls=True).over(w).alias(name)

    def gate(m: Column, backward: bool) -> Column:
        """NULL out matches beyond the tolerance bound."""
        if tolerance is None:
            return m
        delta = (
            (F.col("__ts") - m[right_ts]) if backward else (m[right_ts] - F.col("__ts"))
        )
        return F.when(m.isNotNull() & (delta <= tolerance), m)

    if direction == "backward":
        matched = u.select("*", scan(order_b, "__m")).where(F.col("__side") == 1)
        matched = matched.withColumn("__m", gate(F.col("__m"), backward=True))
    elif direction == "forward":
        matched = u.select("*", scan(order_f, "__m")).where(F.col("__side") == 1)
        matched = matched.withColumn("__m", gate(F.col("__m"), backward=False))
    else:  # nearest
        matched = u.select("*", scan(order_b, "__mb"), scan(order_f, "__mf")).where(
            F.col("__side") == 1
        )
        mb = gate(F.col("__mb"), backward=True)
        mf = gate(F.col("__mf"), backward=False)
        # Closer match wins; exact ties go backward (pandas semantics).
        matched = matched.withColumn(
            "__m",
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(
                (F.col("__ts") - mb[right_ts]) <= (mf[right_ts] - F.col("__ts")), mb
            )
            .otherwise(mf),
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


def _deletion_variants(col: Column, max_dist: int) -> Column:
    """Array of every string reachable from ``col`` by deleting at most
    ``max_dist`` characters (the string itself included).

    SymSpell's symmetric-delete lemma: ``lev(s, t) <= d`` implies the
    d-deletion neighborhoods of ``s`` and ``t`` intersect, so an
    equi-join on these keys is a COMPLETE candidate filter for edit
    distance ``d`` — no pair within distance d is ever missed.  Built by
    composing the 1-deletion transform d times; pure JVM expressions
    (``transform``/``flatten``), no Python.  Key count is
    O(len^d) per string, which is the scheme's documented cost — it fits
    short entity strings (names, titles, SKUs), not page-length text.
    """
    out = F.array(col)
    for _ in range(max_dist):
        one_del = F.flatten(
            F.transform(
                out,
                lambda v: F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length(v), F.lit(1))),
                        lambda j: F.concat(
                            F.substring(v, F.lit(1), j - 1),
                            F.substring(v, j + 1, F.length(v)),
                        ),
                    ),
                    lambda _x: F.length(v) > 0,
                ),
            )
        )
        out = F.array_distinct(F.concat(out, one_del))
    return out


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``col`` strings are within Levenshtein
    distance ``max_dist`` (typo-pair / entity-duplicate detection).

    The naive plan is an all-pairs theta join — O(n²) levenshtein calls.
    This plan blocks with SymSpell deletion-neighborhood keys
    (:func:`_deletion_variants`): explode each string's ≤d-deletion set,
    self-equi-join on the variant, then verify candidates with the exact
    ``levenshtein`` post-filter.  One shuffle of n·O(len^d) slim
    (variant, id, string) rows; candidate groups are bounded by variant
    frequency, never by n — linear scan behavior at 100 TB for
    bounded-length keys.  Completeness is the lemma above, so results
    equal the brute-force oracle row-for-row.

    Returns ``(id_a, id_b, name_a, name_b, dist)`` with ``id_a < id_b``.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(col).alias("__s"),
        F.explode(_deletion_variants(F.col(col), max_dist)).alias("__v"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, (F.col("a.__v") == F.col("b.__v")) & (F.col("a.__id") < F.col("b.__id")))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("name_a"),
            F.col("b.__s").alias("name_b"),
            F.levenshtein("a.__s", "b.__s").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
        .distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Inner join matching rows whose key strings are within Levenshtein
    distance ``max_dist`` — approximate record linkage across two tables
    (e.g. crawl titles vs. catalog names).

    Same deletion-neighborhood blocking as :func:`fuzzy_pairs`; each
    side explodes its ≤d-deletion keys, candidates meet in an equi-join,
    and the exact distance predicate verifies.  Right columns that
    collide with left names are prefixed ``right_``; a ``dist`` column
    is appended.

    Inputs must have group-able column types (the retry-proof candidate
    dedup groups whole rows): map-typed columns — directly or inside a
    struct — are rejected with a clear error; project them away or to
    ``map_entries`` arrays first.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    for side, df in (("left", left), ("right", right)):
        for fld in df.schema.fields:
            if "map<" in fld.dataType.simpleString():
                raise TypeError(
                    f"fuzzy_join {side} column {fld.name!r} contains a map "
                    "type, which cannot be grouped for the content-hash "
                    "candidate dedup; drop it or convert with map_entries() "
                    "before joining"
                )
    # Determinism contract: candidate dedup is keyed on md5-of-full-row,
    # never on monotonically_increasing_id — a cached/retried upstream
    # with nondeterministic row order could re-assign positional ids
    # mid-query, but a content hash is stable under any recomputation.
    # Duplicate input rows (same hash) are collapsed BEFORE the variant
    # explosion with their multiplicity recorded, and the inner-join
    # multiplicity (n_left · n_right copies per matched pair) is
    # restored at the end — identical results to joining the raw rows,
    # and cheaper: duplicates explode their deletion variants once.
    # (Requires group-able column types; map-typed columns would need a
    # projection first.)
    lcols = left.columns
    la = (
        left.groupBy(*lcols)
        .agg(F.count(F.lit(1)).alias("__ln"))
        .withColumn("__lid", F.md5(F.to_json(F.struct(*lcols))))
    )
    taken = set(lcols)
    rename = {c: (f"right_{c}" if c in taken else c) for c in right.columns}
    ra = (
        right.groupBy(*right.columns)
        .agg(F.count(F.lit(1)).alias("__rn"))
        .withColumn("__rid", F.md5(F.to_json(F.struct(*right.columns))))
        .select(
            *[F.col(c).alias(rename[c]) for c in right.columns], "__rn", "__rid"
        )
    )
    lk = la.withColumn(
        "__v", F.explode(_deletion_variants(F.col(left_col), max_dist))
    )
    rk = ra.withColumn(
        "__v", F.explode(_deletion_variants(F.col(rename[right_col]), max_dist))
    )
    return (
        lk.join(rk, "__v")
        .drop("__v")
        # verify BEFORE deduplicating: the exact-distance filter is a
        # cheap per-row predicate, so the dedup shuffle carries only
        # true matches instead of every unverified candidate
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(rename[right_col])))
        .where(F.col("dist") <= max_dist)
        .dropDuplicates(["__lid", "__rid"])
        # restore the multiplicity of duplicate input rows
        .withColumn(
            "__m", F.explode(F.sequence(F.lit(1), F.col("__ln") * F.col("__rn")))
        )
        .drop("__lid", "__rid", "__ln", "__rn", "__m")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: str | None = None,
) -> DataFrame:
    """Interval-OVERLAP join (range x range, the two-sided sibling of
    :func:`range_join`): each ``left`` interval matches every ``right``
    interval it overlaps — half-open semantics, ``l_start < r_end AND
    r_start < l_end`` — optionally also equi-keyed on ``on``.  The
    time-range/genomic-overlap workhorse a point-in-interval join
    cannot express.

    Plan: BOTH sides explode onto fixed-width bins; candidates meet by
    bin equi-join.  An overlapping pair would meet once per SHARED bin,
    so each pair is emitted only in its canonical bin — the bin of
    ``greatest(l_start, r_start)`` (the overlap's first instant), which
    both sides provably cover — making the join duplicate-free WITHOUT
    a distinct (no wide dedup shuffle).  Cost: shuffle of
    Σ ceil(len/w) replicas per side + per-bin candidate products —
    linear for bounded interval length, never the O(|L|·|R|)
    nested-loop a theta join plans.  Pick ``bin_width`` near the
    typical interval length (same trade as ``range_join``).

    Output: all ``left`` columns plus the matching right interval's
    columns (overlapping names prefixed ``right_``).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def bins(start: str, end: str):
        # Last covered bin of the half-open [start, end):
        # ceil(end/w) - 1.  On integer endpoints this is identical to
        # the classic floor((end-1)/w); on CONTINUOUS endpoints the
        # integer formula loses coverage (ADVICE r5: [10.2,11.4) vs
        # [11.2,12.5) at w=1 shared no bin and the pair was silently
        # dropped, and sub-unit intervals built inverted descending
        # sequence() ranges).  greatest() guards the degenerate
        # end <= start row: one bin is emitted and the overlap
        # predicate below rejects any match.
        lo = F.floor(F.col(start) / bin_width)
        return F.sequence(
            lo, F.greatest(F.ceil(F.col(end) / bin_width) - 1, lo)
        )

    taken = set(left.columns)
    rename = {c: (f"right_{c}" if c in taken and c != on else c)
              for c in right.columns}
    lv = left.select("*", F.explode(bins(left_start, left_end)).alias("__bin"))
    rv = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns],
        F.explode(bins(right_start, right_end)).alias("__bin"),
    )
    keys = ["__bin"] + ([on] if on else [])
    rs, re_ = rename[right_start], rename[right_end]
    canonical = F.floor(
        F.greatest(F.col(left_start), F.col(rs)) / bin_width
    )
    return (
        lv.join(rv, keys)
        .where(
            (F.col(left_start) < F.col(re_))
            & (F.col(rs) < F.col(left_end))
            & (F.col("__bin") == canonical)
        )
        .drop("__bin")
    )
