"""Plan-shape regression tests: pushdown, pruning, and join strategy
must stay what the scale design requires (SURVEY.md §4 — Catalyst does
the optimizing; these tests pin that it actually happens)."""

from plda_spark.plans import plan_summary


def test_q1_pushes_filter_and_prunes_columns(spark):
    import __spark_entry__ as e

    s = plan_summary(e.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    assert any("l_shipdate" in f for f in s["pushed_filters"])
    # 17-column table pruned to the 7 columns the query touches.
    assert all(schema.count(",") <= 6 for schema in s["read_schemas"])


def test_q3_broadcasts_dimensions(spark):
    import __spark_entry__ as e

    s = plan_summary(e.queries()["q3_top_revenue_orders"](spark, "/root/testdata/sf0.001"))
    assert any("c_mktsegment" in f for f in s["pushed_filters"])
    assert s["broadcast_hash_joins"] >= 2
    assert s["sort_merge_joins"] == 0


def test_token_stats_prunes_to_two_columns(spark):
    import __spark_entry__ as e

    s = plan_summary(e.queries()["text_token_stats"](spark, "/root/testdata/sf0.001"))
    assert s["read_schemas"] and all(
        schema.count(",") == 1 for schema in s["read_schemas"]
    )  # doc_id + text only
