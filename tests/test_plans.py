"""Plan-shape regression tests: pushdown, pruning, and join strategy
must stay what the scale design requires (SURVEY.md §4 — Catalyst does
the optimizing; these tests pin that it actually happens)."""

from plda_spark.plans import plan_summary


def test_q1_pushes_filter_and_prunes_columns(spark):
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert any("l_shipdate" in f for f in s["pushed_filters"])
    # 17-column table pruned to the 7 columns the query touches.
    assert all(schema.count(",") <= 6 for schema in s["read_schemas"])


def test_q3_broadcasts_dimensions(spark):
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["q3_top_revenue_orders"](spark, "/root/testdata/sf0.001"))
    assert any("c_mktsegment" in f for f in s["pushed_filters"])
    assert s["broadcast_hash_joins"] >= 2
    assert s["sort_merge_joins"] == 0


def test_token_stats_prunes_to_two_columns(spark):
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["text_token_stats"](spark, "/root/testdata/sf0.001"))
    assert s["read_schemas"] and all(
        schema.count(",") == 1 for schema in s["read_schemas"]
    )  # doc_id + text only


def test_tfidf_does_not_broadcast_vocab_sized_relations(spark):
    """tf_idf's df_counts table is vocabulary-sized at web scale; an
    explicit broadcast hint there OOMs the cluster.  With the auto
    threshold disabled, any BroadcastHashJoin left in the plan can only
    come from an explicit hint — there must be none."""
    import __spark_entry__ as e

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = plan_summary(e.all_queries()["text_tfidf"](spark, "/root/testdata/sf0.001"))
        assert s["broadcast_hash_joins"] == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_collocations_broadcasts_only_the_scalar_total(spark):
    """collocations joins two vocabulary-sized unigram marginals — no
    hint allowed on those; the only forced broadcast is the 1-row
    t_total."""
    import __spark_entry__ as e

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = plan_summary(
            e.all_queries()["text_collocations"](spark, "/root/testdata/sf0.001")
        )
        assert s["broadcast_hash_joins"] <= 1  # the 1-row total only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pack_sequences_window_is_sharded(spark):
    """The running-sum window must carry a partitionBy (hash-prefix
    shards) — an unpartitioned window funnels the whole corpus through a
    single task at scale."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["sample_pack_sequences"](spark, "/root/testdata/sf0.001")
    )
    assert "hashpartitioning(__shard" in s["plan"]
    assert "SinglePartition" not in s["plan"]


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must join with NO Exchange on
    either side — the shuffle is paid once at write time (the durable
    co-location story for repeated fact-to-fact joins at scale)."""
    from plda_spark.sources.bucketed import read_bucketed, write_bucketed
    from plda_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed(li, "t_lineitem_b", "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    try:
        a = read_bucketed(spark, "t_orders_b")
        b = read_bucketed(spark, "t_lineitem_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, a["o_orderkey"] == b["l_orderkey"])
            s = plan_summary(j)
            assert s["exchanges"] == 0
            assert "Bucketed: true" in s["plan"]
            assert s["sort_merge_joins"] >= 1  # formatted plan names the node twice
            # Same rows as the plain (shuffled) join.
            plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            assert j.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_as_of_join_is_one_shuffle_no_join(spark):
    """The as-of operator must keep the union-window shape: ONE exchange
    on the key, no join operator at all (a range/theta join here would
    explode at scale)."""
    from pyspark.sql import functions as F

    from plda_spark.operators import joins

    q = spark.range(10).select(
        F.col("id").alias("sym"), F.col("id").alias("ts"), F.lit(1.0).alias("px")
    )
    t = spark.range(10).select(F.col("id").alias("sym"), F.col("id").alias("ts"))
    s = plan_summary(joins.as_of_join(t, q, on="sym"))
    # formatted explain names each node twice (tree + details), so one
    # physical Exchange == 2 matches.
    assert s["exchanges"] == 2
    assert s["broadcast_hash_joins"] == 0 and s["sort_merge_joins"] == 0


def test_contamination_broadcasts_benchmark_not_corpus(spark):
    """The benchmark shingle set rides a broadcast semi-join so the
    corpus side never shuffles; the corpus-side aggregation is the only
    exchange."""
    import __spark_entry__ as e
    from plda_spark.operators.dedup import contamination

    docs = e.load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where("doc_id % 97 = 0")
    s = plan_summary(contamination(docs, bench, n=5))
    # one physical BroadcastHashJoin (tree + details = 2 matches)
    assert s["broadcast_hash_joins"] == 2
    assert s["sort_merge_joins"] == 0


def test_stratified_sample_is_scan_plus_filter(spark):
    """Pure per-row predicate: no exchange, and column pruning reaches
    the scan."""
    import __spark_entry__ as e
    from plda_spark.operators.sampling import stratified_hash_sample

    docs = e.load_table(spark, "/root/testdata/sf0.001", "documents")
    s = plan_summary(
        stratified_hash_sample(docs.select("doc_id", "source"), "source",
                               {"wiki": 100, "web": 10})
    )
    assert s["exchanges"] == 0
    assert all(schema.count(",") <= 1 for schema in s["read_schemas"])


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The binned range join must plan as an equi-join on the bin key
    (+ post-filter) — never a nested-loop/cartesian theta join, which is
    O(|P|*|I|) per key at scale."""
    from pyspark.sql import functions as F

    from plda_spark.operators import joins

    pts = spark.range(1000).select(F.col("id").alias("p"))
    iv = spark.range(100).select(
        (F.col("id") * 10).alias("lo"), (F.col("id") * 10 + 15).alias("hi")
    )
    s = plan_summary(joins.range_join(pts, iv, "p", "lo", "hi", bin_width=16))
    assert "NestedLoop" not in s["plan"] and "Cartesian" not in s["plan"]
    assert s["broadcast_hash_joins"] + s["sort_merge_joins"] >= 1


def test_pivot_pinned_values_is_single_scan(spark):
    """With pivot values pinned, the plan is one scan + one aggregation
    pass — no second job/scan to discover distinct pivot values."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["rel_pivot_daily_events"](spark, "/root/testdata/sf0.001")
    )
    assert s["plan"].count("Scan parquet") <= 2  # one scan (tree + details)


def test_window_analytics_single_sort_exchange(spark):
    """All five analytic functions share one (custkey, orderdate) sort:
    exactly one exchange in the plan."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["rel_window_analytics"](spark, "/root/testdata/sf0.001")
    )
    # formatted explain names each node twice (tree + details).
    assert s["exchanges"] == 2


def test_bm25_stays_scan_plus_scalar_agg(spark):
    """BM25 must be a corpus scan + ONE 1-row stats aggregate broadcast
    back — no explode of the token stream, no shuffle of the corpus, no
    sort-merge join."""
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["text_bm25"](spark, "/root/testdata/sf0.001"))
    assert "Generate" not in s["plan"]          # no explode
    assert s["sort_merge_joins"] == 0
    assert s["broadcast_hash_joins"] == 0       # cross-join of a 1-row stats frame
    assert "BroadcastNestedLoopJoin" in s["plan"]
    assert s["read_schemas"] and all(
        schema.count(",") <= 1 for schema in s["read_schemas"]
    )  # doc_id + text at most (the stats branch prunes to text alone)


def test_pagerank_iteration_has_no_cartesian(spark):
    """Each PageRank iteration must stay an equi-join + partial agg —
    never a nested-loop/cartesian over edges x ranks.  (pagerank()
    itself returns a materialized checkpoint, so the pin targets the
    per-iteration step plan.)"""
    from pyspark.sql import functions as F
    from plda_spark.operators import graph

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    ew = edges.join(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src"
    )
    ranks = nodes.select("node", F.lit(1.0 / 3).alias("rank"))
    s = plan_summary(graph._pagerank_step(nodes, ew, ranks, 0.05, 0.85))
    assert "Cartesian" not in s["plan"]
    assert "BroadcastNestedLoopJoin" not in s["plan"]
    assert "partial_sum" in s["plan"] or "partial_count" in s["plan"]


def test_key_skew_uses_take_ordered_not_global_sort(spark):
    """Top-k over the key histogram must plan as TakeOrdered, never a
    full Sort of all distinct keys."""
    from plda_spark.operators import stats

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    s = plan_summary(stats.key_skew(df, "k", k=5))
    assert "TakeOrderedAndProject" in s["plan"]


def test_rolling_daily_preaggregates_before_window(spark):
    """The RANGE-frame window must consume the (key, day) pre-aggregate,
    not raw events (partial_count before the exchange proves map-side
    combine)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_rolling_daily"](spark, "/root/testdata/sf0.001")
    )
    assert "partial_count" in s["plan"]
    assert "Window" in s["plan"]


def test_retention_cohorts_is_two_shuffles(spark):
    """The retention triangle must shuffle exactly twice (per-user week
    sets, then the (cohort, offset) aggregation) — a min-week window
    after a (user, week) distinct would add a third exchange that
    re-sorts every user row at 100 TB."""
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["events_retention"](spark, "/root/testdata/sf0.001"))
    # formatted plans list each Exchange twice (tree + detail section)
    assert s["exchanges"] == 4, s["plan"]
    # only user_id + ts leave the scan
    assert all(schema.count(",") <= 1 for schema in s["read_schemas"])


def test_funnel_filters_before_the_shuffle(spark):
    """The funnel fold must shuffle only (user, ts, step) triples for
    the step types — the event-type filter has to reach the parquet
    scan, and there is exactly ONE exchange over event data (the
    summary join is a broadcast over <= |steps| rows)."""
    import __spark_entry__ as e

    s = plan_summary(e.all_queries()["events_funnel"](spark, "/root/testdata/sf0.001"))
    assert any("event_type" in f for f in s["pushed_filters"]), s["pushed_filters"]
    assert s["sort_merge_joins"] == 0


def test_ewma_is_one_shuffle(spark):
    from plda_spark.operators import stats

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "k string, t int, v double"
    )
    s = plan_summary(stats.ewma(df, "k", "t", "v"))
    # one physical Exchange (tree + detail section = 2 matches)
    assert s["exchanges"] == 2, s["plan"]


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A day-equality read of a date-partitioned write must prune at
    the directory level: the predicate appears under PartitionFilters
    and the scan touches exactly one partition's files."""
    import pyspark.sql.functions as F

    from plda_spark.sources import read_partitioned, write_partitioned_by_day
    from plda_spark.sources.tables import load_table

    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_partitioned_by_day(ev, path)
    one_day = read_partitioned(
        spark, path, F.col("event_date") == "2024-01-03"
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # pruning is real: the one-day scan reads fewer files than the full scan
    full = read_partitioned(spark, path)
    n_day = one_day.count()
    assert 0 < n_day < full.count()
    got_days = one_day.select("event_date").distinct().collect()
    # partition-column type inference reads the directory value back as a date
    assert [str(r["event_date"]) for r in got_days] == ["2024-01-03"]


def test_dedup_spans_single_span_scan_no_cartesian(spark):
    """Span dedup must never degrade to a nested-loop join, and the
    span-construction subplan must appear at most twice (once feeding
    the first-occurrence agg, once as the join probe — NOT a third time
    for the per-doc totals, which ride the same flagged aggregation)."""
    import __spark_entry__ as e

    df = e.all_queries()["dedup_spans"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # posexplode of the span array is the span-construction fingerprint
    assert plan.count("Generate posexplode") <= 2


def test_cross_dedup_is_anti_join_no_corpus_broadcast(spark):
    """Cross-corpus dedup must be an anti equi-join on slim band rows —
    never a pair join and never a broadcast of a corpus-sized relation
    (band/signature tables may broadcast only under AQE size evidence at
    tiny SF; the pinned invariant is the join TYPE)."""
    import __spark_entry__ as e

    df = e.all_queries()["dedup_cross"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def _non_scalar_nested_loop_joins(df):
    """Unconditioned/cross joins in the optimized logical plan whose
    BOTH sides can exceed one row — i.e. real nested-loop risk.  A join
    against a 1-row global aggregate (``maxRows == 1``) is the standard
    lazy scalar-attach idiom: it broadcasts one row and costs O(n), so
    it is allowed; anything larger is reported."""
    bad = []

    def walk(node):
        if node.getClass().getSimpleName() == "Join":
            jt = node.joinType().toString()
            cond = node.condition()
            if jt == "Cross" or not cond.isDefined():
                sides_scalar = []
                for side in (node.left(), node.right()):
                    mr = side.maxRows()
                    sides_scalar.append(mr.isDefined() and int(mr.get()) <= 1)
                if not any(sides_scalar):
                    bad.append(node.nodeName())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def test_lm_kn_count_tables_never_nested_loop(spark):
    """The N_bb/V scalars ride the plan as a broadcast 1-ROW aggregate
    (lazy scalar attach — round-11 optimization replacing two eager
    .count() corpus scans per call); the pin now allows exactly that
    shape while still refusing any nested-loop join whose both sides
    can exceed one row."""
    import __spark_entry__ as e

    for name in ("text_lm_score_kn", "text_lm_score_kn3"):
        df = e.all_queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert _non_scalar_nested_loop_joins(df) == [], name


def test_gopher_and_c4_are_pruned_scans(spark):
    """Both page-rule operators are pure per-row projections: the scan
    must read ONLY (doc_id, text) — 2 of documents' 5 columns — and the
    plan must contain no exchange at all."""
    import __spark_entry__ as e

    for name in ("text_gopher_filters", "text_c4_clean"):
        df = e.all_queries()[name](spark, "/root/testdata/sf0.001")
        s = plan_summary(df)
        assert s["read_schemas"] and all(
            schema.count(",") == 1 for schema in s["read_schemas"]
        ), (name, s["read_schemas"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, name


def test_gopher_repetition_fanout_contract(spark):
    """The Arrow repetition pass injects a repartition ONLY when the
    input is an exchange-free scan with fewer partitions than cores
    (tiny-file case); an input that already fills the cluster — or has
    any upstream exchange — passes through with no added shuffle."""
    import pyspark.sql.functions as F

    import pytest

    from plda_spark.operators import text

    par = spark.sparkContext.defaultParallelism
    if par < 2:
        pytest.skip("fan-out contract is vacuous on a 1-core runner")
    wide = spark.range(1000, numPartitions=par).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = text.gopher_repetition(wide)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    narrow = spark.range(1000, numPartitions=1).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = text.gopher_repetition(narrow)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # exactly the fan-out repartition


def test_triangles_bounded_exchanges_no_cartesian(spark):
    """The degree-ordered adjacency-intersection triangle count (the
    bench's slowest row) must keep its rewrite honest: exactly 4
    equi-joins (edge x degree twice, oriented-edge x adjacency twice),
    at most 5 physical exchanges (degree agg, the join exchanges,
    adjacency build, final agg — formatted plans list each twice), the
    per-edge intersection inside codegen (array_intersect), a map-side
    partial_sum, and NEVER a cartesian/nested-loop or wedge
    materialization (explode)."""
    from plda_spark.operators import graph

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 3)], "src long, dst long"
    )
    s = plan_summary(graph.triangles(edges))
    plan = s["plan"]
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Explode" not in plan  # no wedge set is ever materialized
    assert s["sort_merge_joins"] + s["broadcast_hash_joins"] == 4
    assert s["exchanges"] <= 10  # 5 physical, each listed twice
    assert "array_intersect" in plan
    assert "partial_sum" in plan


def test_domain_filter_broadcasts_list_never_regex_scans(spark):
    """The blocklist side must be a broadcast equi-join (semi for the
    hit set, anti for the survivors) — never a nested-loop or a
    list-sized shuffle; the corpus scans once per join branch."""
    from plda_spark.operators import web

    df = spark.createDataFrame(
        [(0, "https://a.example.com/x"), (1, "https://b.org/y")],
        "doc_id long, url string",
    )
    s = plan_summary(web.domain_filter(df, ["example.com", "bad.net"]))
    plan = s["plan"]
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert s["broadcast_hash_joins"] >= 1  # list side broadcast
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_drop_boilerplate_is_scan_plus_one_aggregation(spark):
    """Block scoring rides the Arrow scan pass; the only shuffle is the
    per-page reassembly aggregation (no window, no global sort)."""
    from plda_spark.sources import warc

    df = spark.createDataFrame(
        [("u1", "<p>hello world</p>")], "url string, html string"
    )
    s = plan_summary(warc.drop_boilerplate(df))
    plan = s["plan"]
    assert "Window" not in plan
    assert s["exchanges"] <= 2  # ONE physical exchange (tree + detail)
    assert "partial_" in plan  # map-side combine before it


def test_compact_unpartitioned_is_single_roundrobin_no_sort(spark, tmp_path):
    """Unpartitioned compaction must plan as scan + ONE round-robin
    exchange — no sort, no aggregation (content-neutral bin-packing)."""
    from plda_spark.sources.tables import load_table

    src = str(tmp_path / "small")
    load_table(spark, "/root/testdata/sf0.001", "orders").repartition(
        8
    ).write.parquet(src)
    df = spark.read.parquet(src).repartition(2)  # the compaction rewrite plan
    s = plan_summary(df)
    assert s["exchanges"] <= 2  # one physical (tree + detail)
    assert "RoundRobinPartitioning" in s["plan"] or "ROUND_ROBIN" in s["plan"]
    assert "Sort" not in s["plan"].replace("SortMergeJoin", "")


def test_weighted_sample_uses_window_group_limit(spark):
    """The per-group weighted top-k must plan as WindowGroupLimit (per
    partition top-k), never a full per-group sort of all rows."""
    from plda_spark.operators.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [(0, "g", 1.0), (1, "g", 2.0)], "doc_id long, grp string, wt double"
    )
    s = plan_summary(weighted_sample_per_group(df, "grp", 5, "wt"))
    assert "WindowGroupLimit" in s["plan"]


def test_interval_overlap_join_is_equi_join(spark):
    """The overlap join must plan as a bin equi-join (SMJ/BHJ) with the
    range predicate as a post-filter — never a cartesian/nested-loop."""
    from plda_spark.operators.joins import interval_overlap_join

    l = spark.createDataFrame([(0, 0, 5)], "lid long, ls long, le long")
    r = spark.createDataFrame([(1, 3, 9)], "rid long, rs long, re long")
    s = plan_summary(interval_overlap_join(l, r, "ls", "le", "rs", "re", 4))
    assert "Cartesian" not in s["plan"]
    assert "BroadcastNestedLoopJoin" not in s["plan"]
    assert s["sort_merge_joins"] + s["broadcast_hash_joins"] >= 1


def test_leakage_safe_split_no_forced_broadcast(spark):
    """The held-out digest side is corpus-proportional: the leak join
    must NOT carry a planner-forced broadcast hint (ResolvedHint) — at
    local sizes AQE may still choose BHJ, which is fine."""
    from plda_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame([(0, "t")], "doc_id long, text string")
    plan = leakage_safe_split(df)._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in plan and "UnresolvedHint" not in plan


def test_image_neardup_is_banded_equi_join(spark):
    """Image dHash near-dup must find candidates through the band
    equi-join only — no cartesian/nested-loop pair generation and no
    per-row Python: one Arrow decode pass (ArrowEvalPython/MapInPandas),
    JVM bit-packing, then a shuffled self-join on (band, bucket)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["multimodal_image_neardup"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly ONE equi-join (broadcast at toy scale, shuffled at 100 TB;
    # the adaptive formatted plan may list the node twice)
    assert 1 <= s["sort_merge_joins"] + s["broadcast_hash_joins"] <= 2
    assert "BatchEvalPython" not in plan  # Arrow-batched, never row-at-a-time


def test_containment_is_prefix_equi_join_only(spark):
    """Asymmetric containment: candidates must come from the shingle
    equi-join (prefix x full), never a cartesian/nested-loop."""
    from plda_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = plan_summary(dedup.containment_pairs(docs, threshold=0.8, n=3))
    assert "Cartesian" not in s["plan"]
    assert "BroadcastNestedLoopJoin" not in s["plan"]


def test_kn3_never_broadcasts_vocab_sized_tables(spark):
    """The trigram/context/continuation count tables are vocab-power-
    sized at web scale; with the auto threshold off, no hint may force
    them broadcast (same contract as tf_idf / collocations)."""
    import __spark_entry__ as e

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s = plan_summary(
            e.all_queries()["text_lm_score_kn3"](spark, "/root/testdata/sf0.001")
        )
        assert s["broadcast_hash_joins"] == 0
        assert "Cartesian" not in s["plan"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_rake_is_fold_plus_keyed_joins(spark):
    """RAKE: phrase split stays a per-row fold (no window, no Python);
    scoring joins on (doc_id, word) only."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_rake_keywords"](spark, "/root/testdata/sf0.001")
    )
    assert "Cartesian" not in s["plan"]
    assert "BatchEvalPython" not in s["plan"]
    assert "ArrowEvalPython" not in s["plan"]
    assert "MapInPandas" not in s["plan"]


def test_kmv_probes_touch_only_sketch_rows(spark):
    """KMV estimates run off the rollup: the only cross join allowed is
    the two 1-row merged-sketch frames in the intersection probe."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_kmv_probes"](spark, "/root/testdata/sf0.001")
    )
    assert "BatchEvalPython" not in s["plan"]


def test_hilbert_and_readability_are_pure_projections(spark):
    """Hilbert indices and readability scores are per-row arithmetic:
    zero exchanges, no Python, and column pruning reaches the scan."""
    import __spark_entry__ as e

    for name in ("layout_hilbert", "text_readability"):
        s = plan_summary(e.all_queries()[name](spark, "/root/testdata/sf0.001"))
        assert s["exchanges"] == 0, name
        assert "BatchEvalPython" not in s["plan"], name
        assert "MapInPandas" not in s["plan"], name


def test_bootstrap_is_one_aggregation_no_explode(spark):
    """All replica partials ride ONE hash aggregate — never a
    rows x replicas explode (the naive shape that multiplies the scan)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_bootstrap_ci"](spark, "/root/testdata/sf0.001")
    )
    # the only Generate allowed is the stack() unpivot of the 1-ROW
    # aggregate result (tree + details = 2 matches); a corpus-side
    # explode would add more
    assert s["plan"].count("Generate") <= 2
    assert "BatchEvalPython" not in s["plan"]
    # one scan feeds the aggregate (tree + details = 2 matches)
    assert s["plan"].count("Scan parquet") <= 2


def test_audio_neardup_is_banded_equi_join(spark):
    """Same contract as the image pin: candidates only through the
    (band, bucket) equi-join, one Arrow decode, no cartesian."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["multimodal_audio_neardup"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "Cartesian" not in s["plan"]
    assert "BroadcastNestedLoopJoin" not in s["plan"]
    assert 1 <= s["sort_merge_joins"] + s["broadcast_hash_joins"] <= 2
    assert "BatchEvalPython" not in s["plan"]


def test_bloom_probes_scan_log_once_no_python(spark):
    """Bloom rollup + probe: the raw events log is scanned once, the
    merged filter reaches the probes as a broadcast 1-row aggregate,
    and everything is JVM expressions (no Arrow/Python stage)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_bloom_probes"](spark, "/root/testdata/sf0.001")
    )
    # ONE parquet scan node (the formatted plan prints each node in
    # both the tree and the details section, hence <= 2 occurrences)
    assert s["scans"] <= 2
    assert "BatchEvalPython" not in s["plan"]
    assert "ArrowEvalPython" not in s["plan"]
    assert "Cartesian" not in s["plan"]
    # the only nested-loop node is the 1-row merged-filter broadcast
    assert s["plan"].count("BroadcastNestedLoopJoin") <= 2


def test_matryoshka_scans_prefix_then_joins_shortlist(spark):
    """Two-stage matryoshka search: the full corpus rides ONLY the
    prefix-scored stage; full-dim vectors come back through an
    equi-join on the |queries|·shortlist candidate set — no cartesian
    against the full-width table, no Python."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["sim_matryoshka_topk"](spark, "/root/testdata/sf0.001")
    )
    assert "BatchEvalPython" not in s["plan"]
    assert s["broadcast_hash_joins"] + s["sort_merge_joins"] >= 1
    # stage-1 broadcast of the query batch is the only nested loop
    assert s["plan"].count("CartesianProduct") == 0


def test_ngram_novelty_is_two_keyed_exchanges(spark):
    """Novelty = one n-gram-keyed window + one doc-keyed aggregation:
    no joins at all (first-owner via window min), no Python, no
    broadcast of the corpus-sized gram table."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_ngram_novelty"](spark, "/root/testdata/sf0.001")
    )
    assert s["broadcast_hash_joins"] == 0
    assert s["sort_merge_joins"] == 0
    assert "Cartesian" not in s["plan"]
    assert "BatchEvalPython" not in s["plan"]
    assert "ArrowEvalPython" not in s["plan"]


def test_phrase_search_touches_only_query_tokens(spark):
    """Phrase retrieval must IN-filter the index on the phrase's own
    tokens BEFORE any regrouping (search cost ~ |phrase| x df, never
    corpus size), join only the tiny broadcast slots table, and keep
    the positional-intersection fold in JVM expressions."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_index_phrase"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the phrase's literal tokens appear as an IN condition on the index
    assert "scan" in plan and "table" in plan
    assert plan.count("SortMergeJoin") == 0


def test_assoc_rules_joins_are_broadcast_after_pruning(spark):
    """All rule-statistics joins (item supports, basket count) must be
    broadcast — only the basket self-join may shuffle — and no Python
    reaches the plan."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["events_assoc_rules"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # broadcast-nested-loop only for the 1-row n_users crossJoin
    # (formatted plans list each node twice: tree + details)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert s["broadcast_hash_joins"] >= 3


def test_frontier_schedule_is_one_exchange_no_python(spark):
    """The schedule is ONE host-keyed window: a single hash exchange on
    the host key, no joins, no Python in the plan."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["web_frontier_schedule"](spark, "/root/testdata/sf0.001")
    )
    assert "BatchEvalPython" not in s["plan"] and "ArrowEvalPython" not in s["plan"]
    assert s["broadcast_hash_joins"] == 0 and s["sort_merge_joins"] == 0
    assert s["exchanges"] <= 2  # one hash partitioning (+AQE read)


def test_ks_test_aggregates_before_the_ecdf_window(spark):
    """The raw event stream must be reduced by the (value) groupBy
    BEFORE any window — the plan has a partial-aggregate under the
    exchange and no Python anywhere."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_ks_test"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_winsorize_broadcasts_cuts_never_sorts_corpus(spark):
    """The percentile cut table joins back as a BROADCAST; the corpus
    itself is never globally sorted."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["curation_winsorize"](spark, "/root/testdata/sf0.001")
    )
    assert s["broadcast_hash_joins"] >= 1
    assert s["sort_merge_joins"] == 0
    assert "BatchEvalPython" not in s["plan"] and "ArrowEvalPython" not in s["plan"]


def test_psi_aggregates_before_bin_windows(spark):
    """PSI reduces the stream to <= bins rows with a hash aggregate
    before any window; the min/max join is a broadcast; no Python."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_psi"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    # the 1-row min/max rides a BROADCAST nested-loop (keyless join
    # against one row — never a shuffled cartesian)
    assert "BroadcastNestedLoopJoin" in plan


def test_weighted_quantiles_window_is_partitioned(spark):
    """The cumulative-weight window must be PARTITIONED BY the group —
    an unpartitioned window here would funnel the corpus through one
    task (the exact failure the drift tests now guard against)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_weighted_quantiles"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # every Window node declares a partition spec (look for the
    # unpartitioned shape: a window whose partition list is empty
    # renders as "Window [..], [..v ASC..]" with no partitionBy column
    # — the hashpartitioning exchange below it is the witness)
    assert "hashpartitioning(__g" in plan


def test_link_prediction_no_cartesian_and_caps_before_join(spark):
    """Wedge enumeration is an equi-join on the center (never a
    cartesian product), and the degree-cap filter sits under it."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["graph_link_prediction"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert s["sort_merge_joins"] + s["broadcast_hash_joins"] + plan.count(
        "ShuffledHashJoin"
    ) >= 3  # wedge join + anti-join + degree joins


def test_vocab_coverage_broadcasts_the_vocab(spark):
    """The vocab side of the coverage join is broadcast-sized by
    construction (top-2000 tokens) — the corpus explode must never
    shuffle against it with a sort-merge join."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_vocab_coverage"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert s["broadcast_hash_joins"] >= 1
    assert "CartesianProduct" not in s["plan"]


def test_rrf_rank_windows_are_per_system(spark):
    """RRF's rank windows partition by system (and query when given):
    the plan repartitions on the system key, never one global task."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_rrf_fusion"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "hashpartitioning(system" in plan or "hashpartitioning(__" in plan
    assert "CartesianProduct" not in plan


def test_spearman_aggregates_before_marginal_windows(spark):
    """Spearman reduces to (a, b) pair counts with a hash aggregate
    before the marginal rank windows run; no Python, no cartesian."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_spearman"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_top_paths_is_one_window_no_self_join(spark):
    """The n-gram path build is ONE user-partitioned lead window — the
    classic formulation self-joins the event table length-1 times;
    this plan must contain no join at all."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["events_top_paths"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert s["sort_merge_joins"] == 0 and s["broadcast_hash_joins"] == 0
    assert "Join" not in plan
    assert "Window" in plan and "TakeOrdered" in plan


def test_curriculum_window_is_salted_two_level_rank(spark):
    """The in-phase order must be a TWO-LEVEL rank: the row_number
    window partitioned by (phase, salt) — 256 md5-prefix buckets per
    phase — with broadcast per-bucket offsets. A window partitioned by
    phase ALONE caps parallelism at n_phases (4 single-task spill
    sorts of ~N/4 rows each at corpus scale)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["sample_curriculum"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the big window's exchange is keyed by BOTH phase and the salt
    assert "hashpartitioning(phase" in plan and "__salt" in plan
    # offsets come back via broadcast, never a shuffled join
    assert s["sort_merge_joins"] == 0
    assert s["broadcast_hash_joins"] >= 1


def test_sessionize_is_one_window_exchange_plus_agg(spark):
    """Batch sessionization: ONE user-keyed exchange + ONE sort feed
    BOTH window expressions (lag + running session count share the
    (user)x(ts, id) spec), then one partial-aggregated session rollup
    — the event table is never joined to itself or re-sorted."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["events_sessions"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert s["sort_merge_joins"] == 0 and s["broadcast_hash_joins"] == 0
    assert "Join" not in plan
    # window exchange keyed by user; exactly 2 exchanges total
    # (window + the map-side-combined session aggregation)
    assert "hashpartitioning(__u" in plan
    # formatted plans list each node twice (tree + details): 2 == ONE
    # physical Exchange — the (user, session) aggregation reuses the
    # window's hashpartitioning(user) (a superset-key aggregation over
    # a subset-key partitioning needs no second shuffle)
    assert s["exchanges"] == 2, s["exchanges"]
    assert plan.count("(4) Sort") or plan.count("Sort") >= 1


def test_balanced_sample_rank_is_salted(spark):
    """balanced_sample shares the curriculum's two-level rank: the
    in-class window exchange must be keyed by BOTH the class and the
    md5-prefix salt, with the cap and offsets arriving by broadcast."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["sample_balanced"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(lang" in plan and "__salt" in plan
    assert s["sort_merge_joins"] == 0
    assert s["broadcast_hash_joins"] >= 1


def test_nb_eval_no_python_no_cartesian(spark):
    """The NB pipeline stays JVM-side end-to-end: no Python eval, no
    cartesian product beyond the broadcast |labels|/1-row spines (those
    plan as BroadcastNestedLoopJoin), and the dense likelihood table is
    joined on the token key, never broadcast at vocab size."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["classify_nb"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # per-doc argmax window is partitioned (never a global sort)
    assert "hashpartitioning(__id" in plan


def test_funnel_latency_single_shuffle_fold(spark):
    """Latency funnel keeps the funnel's ONE-shuffle contract: step
    filter BEFORE the exchange, the state machine is a JVM aggregate
    fold (no Python), transitions explode from the per-user frame —
    the event table is never self-joined."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["events_funnel_latency"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert s["sort_merge_joins"] == 0
    assert "CartesianProduct" not in plan
    # the step-type filter reaches the scan
    assert any("event_type" in p for p in s["pushed_filters"]), s[
        "pushed_filters"
    ]


def test_pit_features_is_one_range_window_no_join(spark):
    """Point-in-time features must be ONE user-keyed RANGE window —
    the classic as-of SELF-JOIN formulation would shuffle the event
    table twice and explode on active users; this plan has no join."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["events_pit_features"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # formatted plans list each node twice (tree + details): 2 == ONE
    # physical Exchange
    assert s["exchanges"] == 2, s["exchanges"]
    assert "hashpartitioning(user_id" in plan
    assert "Window" in plan


def test_anova_is_one_aggregation_no_window_no_join(spark):
    """anova_f (and by extension every member of the new inference
    quartet's moment path) must reduce to aggregations only — a rank-
    window or join here would mean the test started buffering rows."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_anova_f"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "Join" not in plan
    assert "HashAggregate" in plan


def test_levene_broadcasts_medians(spark):
    """levene_bf joins the k-row median table back BROADCAST — a
    sort-merge join would shuffle the corpus a third time."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_levene_bf"](spark, "/root/testdata/sf0.001")
    )
    assert s["broadcast_hash_joins"] >= 1
    assert s["sort_merge_joins"] == 0
    assert "Window" not in s["plan"]


def test_ols_and_pca_are_single_aggregations(spark):
    """ols2 / pca2_summary: the model fit IS one aggregation — no
    join, no window, no Python, and the scan prunes to exactly the
    model columns."""
    import __spark_entry__ as e

    for name, cols in [
        ("ml_ols", ("l_quantity", "l_discount", "l_extendedprice")),
        ("ml_pca2", ("embedding",)),
    ]:
        s = plan_summary(
            e.all_queries()[name](spark, "/root/testdata/sf0.001")
        )
        plan = s["plan"]
        assert "Join" not in plan and "Window" not in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # formatted plans list each node twice (tree + details):
        # 2 == ONE physical parquet scan
        assert s["scans"] == 2, name
        schema = s["read_schemas"][0]
        for c in cols:
            assert c in schema, (name, c, schema)


def test_item_item_cf_broadcasts_supports(spark):
    """rec_item_cf: the ONLY shuffle join is the basket self-join on
    the user key; item supports join back broadcast (a-priori prunes
    them to ≤|items| rows), and the top-k window is keyed by item."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["rec_item_cf"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert s["broadcast_hash_joins"] >= 3  # cap + 2 support joins
    assert "hashpartitioning(item" in plan  # the rank window key
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kendall_pairs_over_checkpointed_cells(spark):
    """kendall_tau's |cells|^2 comparison must run over the ONE
    materialized cell table — the returned plan reads the checkpoint
    (no parquet scan at all), and the theta join is the documented
    bounded nested loop over aggregated rows, never raw data."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_kendall_tau"](
            spark, "/root/testdata/sf0.001"
        )
    )
    plan = s["plan"]
    assert s["scans"] == 0, s["scans"]  # all inputs are the checkpoint
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_logreg_result_is_one_final_aggregation(spark):
    """logreg2's returned frame is the final likelihood pass alone:
    one parquet scan, literal coefficients, no join/window/Python
    (the 5 IRLS rounds already ran eagerly as scalar-only jobs)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["ml_logreg"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert s["scans"] == 2  # tree + details: ONE physical scan
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_textrank_iterates_over_checkpointed_edges(spark):
    """textrank's returned plan must iterate over the CHECKPOINTED
    edge/out-strength frames (scans of the raw documents appear only
    for the final digest join spine, not once per round), stay
    JVM-side, and key the rank window by doc."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_textrank"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan
    # every input (sentence frame, edges, out-strengths) is a
    # checkpoint: the returned plan reads NO parquet at all
    assert s["scans"] == 0, s["scans"]


def test_clustering_explodes_intersections_no_cartesian(spark, monkeypatch):
    """clustering_coefficients must stay on the oriented-intersection
    core: explode (Generate) for corner attribution, equi-joins only,
    no Python eval anywhere.  The round-11 lazy localCheckpoints hide
    the triangle subplan from the final frame's plan, so checkpointing
    is no-opped here to keep the WHOLE pipeline inspectable."""
    import pyspark.sql.classic.dataframe as D

    import __spark_entry__ as e

    monkeypatch.setattr(
        D.DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    s = plan_summary(
        e.all_queries()["graph_clustering"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # the exploded intersection
    assert "array_intersect" in plan


def test_assortativity_is_joins_plus_one_scalar_agg(spark):
    """assortativity: two node-keyed degree joins feeding ONE scalar
    corr aggregation — no window, no cartesian, nothing survives the
    final agg."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["graph_assortativity"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "covar_pop(" in plan


def test_roc_auc_window_runs_over_the_cell_frame(spark):
    """classify_auc: the only Window is the U cumsum over the
    per-distinct-score cell aggregation — never over raw rows — and
    nothing Python touches the plan."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["classify_auc"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one physical Window, fed by the groupBy(v) aggregate (cells) —
    # the formatted plan names each node twice (tree + details)
    assert plan.count("Window") == 2


def test_decision_stump_window_over_cells_no_python(spark):
    """ml_decision_stump: the cumulative window and the argmin sort
    run over the per-value cell aggregation (bounded by max_distinct),
    never raw rows; no Python eval, no cartesian beyond the broadcast
    1-row totals."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["ml_decision_stump"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Window") == 2  # one physical node (tree+details)
    assert "TakeOrderedAndProject" in plan  # bounded argmin, no global sort


def test_posthoc_one_corpus_aggregation_then_tiny_join(spark):
    """stats_posthoc: the corpus collapses to |groups| moment rows in
    ONE aggregation; everything after (pair join, Holm windows) runs
    on the tiny group/pair frames — exactly one scan of events, no
    Python eval."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_posthoc"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the eager localCheckpoint inside anova_posthoc already ran the
    # single corpus aggregation; the returned plan rides the
    # materialized |groups| rows — NO parquet scan survives
    assert s["scans"] == 0
    assert "Scan ExistingRDD" in plan


def test_bass_and_page_hinkley_are_rollup_plans(spark):
    """events_bass / stats_page_hinkley: one corpus aggregation to the
    |days| rollup, windows only over that rollup, no joins of the
    event table to itself, no Python eval."""
    import __spark_entry__ as e

    for name in ("events_bass", "stats_page_hinkley"):
        s = plan_summary(
            e.all_queries()[name](spark, "/root/testdata/sf0.001")
        )
        plan = s["plan"]
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # formatted plans name each node twice (tree + details), so 2
        # occurrences == ONE physical parquet scan
        assert s["scans"] == 2, name
        assert s["sort_merge_joins"] == 0, name


def test_source_jsd_joins_vocab_table_not_corpus(spark):
    """text_source_jsd: the token-keyed pair join runs over the
    (source, token) aggregation, so the documents table is scanned
    once per side of the self-join at most — and the disjoint-mass
    closed form means NO full-outer join appears anywhere."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["text_source_jsd"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FullOuter" not in plan
    # only source + text are read from documents
    assert all(sc.count(",") <= 1 for sc in s["read_schemas"])


def test_kmeans_fit_final_pass_is_one_scan_no_python(spark):
    """ml_kmeans_fit's returned frame is the final assignment pass:
    one parquet scan (the fold-expression assign), one aggregation,
    no Python eval anywhere — the per-round mean collects already ran
    eagerly inside the operator."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["ml_kmeans_fit"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert s["scans"] == 2  # tree + details = ONE physical scan
    assert s["sort_merge_joins"] == 0


def test_round9_scalar_readouts_are_single_scan_rollups(spark):
    """The round-9 one-row diagnostics (G-test, GPD tail, Wilson CIs,
    PR-AUC, burstiness, centralization) must stay one-parquet-scan
    rollup plans with no Python eval — the corpus collapses at the
    first aggregation and never comes back."""
    import __spark_entry__ as e

    for name in (
        "stats_gtest",
        "stats_gpd_tail",
        "stats_wilson_ci",
        "classify_pr_auc",
        "events_burstiness",
        "graph_centralization",
    ):
        s = plan_summary(
            e.all_queries()[name](spark, "/root/testdata/sf0.001")
        )
        plan = s["plan"]
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        # formatted plans name each node twice: 2 == ONE physical scan
        assert s["scans"] == 2, (name, s["scans"])


def _physical_scan_ids(plan: str) -> set:
    """Distinct parquet scan NODES: the formatted plan names each node
    once in the tree and once in the details, and InMemoryRelation
    details embed their cached child plan's text — so a raw substring
    count over-counts persisted plans; the (n) node ids do not."""
    import re

    return set(re.findall(r"\((\d+)\) Scan parquet", plan))


def test_hurst_branches_ride_the_persisted_daily_series(spark):
    """stats_hurst: one parquet scan builds the |days| series; every
    block-size branch reads the persisted frame (InMemoryTableScan),
    never the corpus — and no Python eval."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_hurst"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(_physical_scan_ids(plan)) == 1  # ONE physical corpus scan
    assert "InMemoryTableScan" in plan
    assert s["sort_merge_joins"] == 0


def test_storey_rides_persisted_ranked_frame(spark):
    """stats_storey: the one-vs-rest screen's two corpus aggregations
    (per-group + complement moments) are the ONLY parquet scans; the
    pi0 branch reads the persisted ranked frame, not the corpus."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_storey"](spark, "/root/testdata/sf0.001")
    )
    plan = s["plan"]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(_physical_scan_ids(plan)) <= 2  # the screen's moment pair
    assert "InMemoryTableScan" in plan
    assert s["sort_merge_joins"] == 0


def test_seasonality_and_dominant_period_are_rollup_first(spark):
    """stats_seasonal_strength rides the persisted |days|
    decomposition (bounded physical scans, persisted reuse visible);
    stats_dominant_period collapses to ONE persisted |days| rollup
    shared by the ACF branches and the Bartlett day count (round 10:
    was 5 corpus scans)."""
    import __spark_entry__ as e

    s = plan_summary(
        e.all_queries()["stats_seasonal_strength"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "BatchEvalPython" not in s["plan"]
    assert "InMemoryTableScan" in s["plan"]
    assert len(_physical_scan_ids(s["plan"])) <= 3  # decompose stages
    s2 = plan_summary(
        e.all_queries()["stats_dominant_period"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert "BatchEvalPython" not in s2["plan"]
    assert len(_physical_scan_ids(s2["plan"])) == 1  # ONE corpus scan
    assert "InMemoryTableScan" in s2["plan"]
    assert s2["sort_merge_joins"] == 0


def test_round10_new_ops_are_single_pass_rollups(spark):
    """The round-10 additions stay rollup-first: mood/cvm/gev/script
    collapse the corpus in ONE aggregation pass (mood's cell frame is
    persisted for its median/fold branches); heaps has exactly the
    designed two scans (the vocabulary min-bucket exchange + the
    shuffle-free size() mass rollup); nothing evaluates Python."""
    import __spark_entry__ as e

    expected_scans = {
        "stats_mood_median": 1,
        "stats_cvm": 1,
        "stats_gev_maxima": 1,
        "text_script_mix": 1,
        "text_heaps": 2,
        "classify_mcc": 2,  # the label join's two corpus sides
        "stats_friedman": 1,  # persisted |days|*k cell frame
        "stats_kpss": 1,      # persisted |days| rollup + lag windows
        "stats_partial_corr": 1,  # ONE ten-sum moment aggregation
        # two RANGE-FILTERED scans (one per date range) — each pushes
        # its own day predicate to the scan, which prunes better than
        # one cached full scan would (the stats_hist_ks shape)
        "stats_hist_cvm": 2,
    }
    for name, scans in expected_scans.items():
        s = plan_summary(
            e.all_queries()[name](spark, "/root/testdata/sf0.001")
        )
        plan = s["plan"]
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert len(_physical_scan_ids(plan)) <= scans, (
            name,
            sorted(_physical_scan_ids(plan)),
        )


def test_round11_new_ops_are_single_pass_rollups(spark):
    """The round-11 additions keep the drift-family plan shape:
    ad_two_sample collapses the corpus in ONE cell aggregation (the
    stats_cvm contract); hist_ad_ranges has exactly the two
    range-filtered rollup scans of its KS/CvM siblings; nothing
    evaluates Python."""
    import __spark_entry__ as e

    expected_scans = {
        "stats_ad": 1,
        "stats_hist_ad": 2,
        "tok_byte_bpe": 1,  # pure per-row JVM folds over one scan
        # ONE leaf-count corpus aggregation; the compression rounds
        # run over checkpoint-cut rollup RDDs, never the corpus
        "stats_qdigest": 1,
        # chunk digests checkpoint-cut after one scan; ladder levels,
        # losers, and the maximal filter all ride digest-width rows
        "dedup_longest_spans": 1,
    }
    for name, scans in expected_scans.items():
        s = plan_summary(
            e.all_queries()[name](spark, "/root/testdata/sf0.001")
        )
        plan = s["plan"]
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert len(_physical_scan_ids(plan)) <= scans, (
            name,
            sorted(_physical_scan_ids(plan)),
        )


def test_hits_plan_stays_linear_in_iterations(spark):
    """HITS cuts lineage after each half-step aggregation: without the
    per-half-step localCheckpoint the auth/hub trees QUADRUPLE per
    iteration (the 1-row normalizing sum and the attach each embed the
    aggregate, and the next half-step embeds the result again) — at
    n_iter=3 that was a 566-Exchange physical plan whose correctness
    leaned entirely on runtime exchange reuse.  Pin the final plan to
    the post-cut shape: a handful of exchanges over RDD leaves, and no
    growth between n_iter=2 and n_iter=3."""
    from plda_spark.operators import graph

    e = spark.createDataFrame([(1, 3), (2, 3), (3, 4)], "src long, dst long")
    n2 = plan_summary(graph.hits(e, n_iter=2))["exchanges"]
    n3 = plan_summary(graph.hits(e, n_iter=3))["exchanges"]
    assert n3 == n2, (n2, n3)
    assert n3 <= 12, n3
