"""Partition-pruning evidence (SURVEY.md §4 / north_rule scale
mechanics): a date-partitioned layout — the standard Common-Crawl
warc_ts organization at 10^12 rows — must (1) prune statically when
the query filters on the partition column, and (2) prune DYNAMICALLY
(DPP) when the partition column is only constrained through a join
with a filtered dimension, so a day-scoped job touches those
partitions' files and no others."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def day_partitioned(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evpart") / "events_by_day")
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    (e.withColumn("day", F.to_date("ts"))
     .write.mode("overwrite").partitionBy("day").parquet(path))
    return path


def test_static_partition_pruning(spark, day_partitioned):
    e = spark.read.parquet(day_partitioned)
    days = [r.day for r in e.select("day").distinct().collect()]
    assert len(days) > 3  # layout actually split by day
    one = sorted(days)[1]
    q = e.filter(F.col("day") == F.lit(one)).select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day equality must land in PartitionFilters (pruned at the
    # FileIndex — no data files of other days are opened), NOT in
    # PushedFilters/DataFilters (which would read-then-drop).
    # (df.inputFiles() is relation-level, pre-pruning, so the plan
    # section is the correct evidence.)
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan[:1500]
    pf_body = pf[1].split("]", 1)[0]
    assert "day" in pf_body and "=" in pf_body, pf_body
    # and the filter is NOT also a post-scan data filter
    assert q.count() == e.filter(F.col("day") == F.lit(one)).count()


def test_dynamic_partition_pruning(spark, day_partitioned):
    fact = spark.read.parquet(day_partitioned)
    # small dimension: pick 2 of the days through a non-partition
    # attribute, so the fact filter is only derivable AT RUNTIME
    dim = (fact.select("day").distinct().orderBy("day").limit(2)
           .withColumn("tag", F.lit("keep")))
    dim_path = day_partitioned + "_dim"
    dim.write.mode("overwrite").parquet(dim_path)
    dimr = spark.read.parquet(dim_path)
    q = (fact.join(dimr.filter(F.col("tag") == "keep"), "day")
         .groupBy("day").agg(F.count("*").alias("n")))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert q.count() == 2  # one row per kept day


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime row-level filtering (the non-partition sibling of DPP):
    a selective dim filter on the join key side injects a bloom filter
    into the fact scan so non-joining rows die at the scan, not at the
    shuffle. The two size thresholds are lowered ONLY because this
    fact table is tiny — at 100 TB the 10 GB application-side default
    fires on its own. Results must be identical with and without the
    filter."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    o = (spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
         .filter(F.col("o_totalprice") > 400000))

    def run():
        return (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("l_quantity"), 2).alias("qty")))

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".creationSideThreshold": "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        q = run()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:1500]
        with_bloom = sorted(map(tuple, q.collect()))
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = sorted(map(tuple, run().collect()))
        assert with_bloom == without and with_bloom
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
