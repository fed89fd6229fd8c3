"""Plan-shape and semantics checks for the testdata edge derivations."""

from pyspark.sql import functions as F


def test_events_edges_bucket_expression_shallow(spark):
    """The global-order bucketing must not build an O(n_ranges)-deep
    CASE chain (VERDICT r3 §wrong №4: a 10⁴-partition session would get
    a 10⁴-deep expression tree in every consumer). With the
    repartitionByRange + spark_partition_id derivation the analyzed
    plan contains no quantile-boundary CASE cascade."""
    from webgraph_algo_rs_spark.sources.tables import events_user_edges

    edges = events_user_edges(spark, "/root/testdata/sf0.001", n_ranges=64)
    plan = edges._jdf.queryExecution().analyzed().toString()
    assert plan.count("CASE WHEN") <= 4, plan[:2000]
    # and the derivation still yields the canonical graph: consecutive
    # (ts, event_id)-ordered events, self-loops dropped
    rows = edges.agg(
        F.sum("weight").alias("w"), F.count(F.lit(1)).alias("e")
    ).first()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ordered = (
        ev.select("ts", "event_id", "user_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    expect = sum(
        1
        for a, b in zip(ordered, ordered[1:])
        if a["user_id"] != b["user_id"]
    )
    assert int(rows["w"]) == expect


def test_events_edges_match_sql_oracle(spark):
    """events_user_edges must equal its single-window SQL twin
    (EVENTS_USER_EDGES_SQL) row-for-row at any n_ranges."""
    from webgraph_algo_rs_spark.sources.tables import (
        EVENTS_USER_EDGES_SQL,
        events_user_edges,
        load_table,
    )

    load_table(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView(
        "events"
    )
    want = {
        (r["src_vertex"], r["dst_vertex"]): r["weight"]
        for r in spark.sql(EVENTS_USER_EDGES_SQL).collect()
    }
    for n_ranges in (1, 7, 64):
        got = {
            (r["src_vertex"], r["dst_vertex"]): r["weight"]
            for r in events_user_edges(
                spark, "/root/testdata/sf0.001", n_ranges=n_ranges
            ).collect()
        }
        assert got == want, f"n_ranges={n_ranges}"
