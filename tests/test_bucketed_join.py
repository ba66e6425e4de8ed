"""Bucketing evidence (SURVEY.md §4 / north_rule scale mechanics):
writing both join sides bucketed by the join key lets the sort-merge
join run with ZERO Exchange — the co-located-join strategy for the
repeated fact⋈fact joins of a 100 TB pipeline (vs paying the shuffle
on every query)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketwh")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh}'")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet(
        "/root/testdata/sf0.01/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").format("parquet")
     .saveAsTable("bucketdemo.orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").format("parquet")
     .saveAsTable("bucketdemo.lineitem_b"))
    return "bucketdemo"


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    # broadcast off: at this sf the small side would broadcast and the
    # test wouldn't demonstrate the bucketed (co-located) join path the
    # big-fact⋈fact case needs at 100 TB
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql("""
            SELECT o.o_orderkey, o.o_totalprice,
                   sum(l.l_quantity) AS qty
            FROM bucketdemo.orders_b o
            JOIN bucketdemo.lineitem_b l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        """)
        got = sorted(map(tuple, df.collect()))
        # AQE finalizes the plan only after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # both sides pre-bucketed
        assert "SelectedBucketsCount" in plan
        plain = spark.sql("""
            SELECT o.o_orderkey, o.o_totalprice,
                   sum(l.l_quantity) AS qty
            FROM parquet.`/root/testdata/sf0.01/orders.parquet` o
            JOIN parquet.`/root/testdata/sf0.01/lineitem.parquet` l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        """)
        assert got == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
