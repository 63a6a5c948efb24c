"""Co-located join via bucketed tables: both sides bucketed on the join key
join WITHOUT a shuffle — the physical plan contains no Exchange. This is the
100 TB strategy for repeated fact-fact joins (SURVEY §4 / task brief)."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("SET spark.sql.sources.bucketing.enabled=true")
    # spark.sql.warehouse.dir is static — bucketed tables land in the
    # default ./spark-warehouse (gitignored), dropped at the end
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
    )

    joined = (
        spark.table("li_b")
        .join(
            spark.table("ord_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side: the only Exchange allowed
    # is the final single-key aggregation
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, f"bucketed join shuffled:\n{plan}"

    # results equal the unbucketed join
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    got = {(r.o_orderpriority, round(r.qty, 2)) for r in joined.collect()}
    want = {(r.o_orderpriority, round(r.qty, 2)) for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_approx_distinct_error_bound(spark):
    """HLL++ rsd=0.02 stays within 5% of exact on this data. The declared
    query emits exact counts plus in-query range-check booleans at a
    deliberately loose ±20% (~10x rsd — so a regenerated-testdata draw can't
    spuriously fail the driver gate); this test pins the TIGHT 5% raw-sketch
    error bound independently, and that the query's checks agree."""
    from execute_sync_spark.plans import workload

    rows = workload.q_approx_distinct(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.approx_parts_ok and r.approx_orders_ok for r in rows)

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    both = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("ep"),
        F.countDistinct("l_orderkey").alias("eo"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
    ).collect()
    exact = {r.l_returnflag: (r.ep, r.eo) for r in both}
    for r in both:
        assert abs(r.ap - r.ep) / r.ep < 0.05
        assert abs(r.ao - r.eo) / r.eo < 0.05
    # the query's exact columns match the direct aggregation
    got = {r.l_returnflag: (r.n_parts, r.n_orders) for r in rows}
    assert got == exact
