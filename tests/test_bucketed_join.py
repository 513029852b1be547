"""Bucketed co-located join: pre-bucketing both sides of a recurring
join on the join key eliminates its shuffle entirely — the standard
layout for repeated big-table joins at 100 TB (SURVEY.md §2.1/S6 note).
This pins that the engine's session config actually produces the
exchange-free plan, not just that we claim it."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    tag = uuid.uuid4().hex[:8]
    orders_t, cust_t = f"orders_b_{tag}", f"cust_b_{tag}"
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 150).alias("o_custkey"),
        (F.col("id") * 1.5).alias("o_totalprice"),
    )
    cust = spark.range(0, 150).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("c_name"),
    )
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(orders_t)
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(cust_t)
    )
    yield orders_t, cust_t
    spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
    spark.sql(f"DROP TABLE IF EXISTS {cust_t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, cust_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(orders_t)
            .join(
                spark.table(cust_t),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_name")
            .agg(F.sum("o_totalprice").alias("total"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both scans are bucketed on the join key → the join itself
        # needs NO exchange; the only exchange is the final groupBy on
        # a different key
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, join_part[:600]
        assert "SelectedBucketsCount" in plan
        # and it computes the right thing
        rows = {r["c_name"]: r["total"] for r in joined.collect()}
        assert len(rows) == 150
        # customer 0 gets orders 0,150,...,1950
        expect = sum(i * 1.5 for i in range(0, 2000, 150))
        assert rows["c0"] == pytest.approx(expect)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
