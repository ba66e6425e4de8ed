"""Join-skew salting (SURVEY.md §4 / 100 TB mechanics): when one join
key holds most of the fact rows, a plain shuffled join serializes that
key's partition. The standard defusal — salt the fact side's key with
a deterministic shard, replicate the dim side across all shards — must
produce byte-identical results while spreading the hot key over N
partitions. (AQE's skew-join handles sort-merge cases at runtime; the
explicit pattern is for aggregations-after-join and GPU/UDF stages
where AQE can't split.)"""

from __future__ import annotations

from pyspark.sql import functions as F

N_SALT = 8


def test_salted_join_balances_hot_key(spark):
    # fact: 20k rows for ONE hot key + 2k spread over 100 cold keys
    fact = spark.range(22000).select(
        F.when(F.col("id") < 20000, F.lit(7))
        .otherwise((F.col("id") % 100) + 100).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(300).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )

    plain = (fact.join(dim, "k")
             .groupBy("k", "name").agg(F.sum("v").alias("s")))

    # salt: deterministic shard from another column; dim replicated xN
    salted_fact = fact.withColumn(
        "salt", F.pmod(F.xxhash64("v"), F.lit(N_SALT)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
    salted = (salted_fact.join(salted_dim, ["k", "salt"])
              .groupBy("k", "name").agg(F.sum("v").alias("s")))

    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect()))

    # the hot key's rows really spread: count distinct salts it uses
    spread = (salted_fact.filter(F.col("k") == 7)
              .select("salt").distinct().count())
    assert spread == N_SALT


def test_aqe_skew_join_runtime_split(spark):
    """The runtime complement to explicit salting: AQE's skew-join
    detects the hot key's oversized shuffle partition AFTER the map
    stage and splits it (SortMergeJoin(skew=true) + 'AQEShuffleRead
    ... skewed' in the final plan), with results identical to the
    unsplit join. Thresholds are lowered only because this fact table
    is tiny — the 256 MB default fires on its own at 100 TB. Explicit
    salting (test above) remains for aggregations-after-join and
    UDF stages AQE can't split."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin"
        ".skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def build():
        fact = spark.range(200000).select(
            F.when(F.col("id") < 180000, F.lit(7))
            .otherwise(F.col("id") % 100 + 100).alias("k"),
            (F.col("id") % 1000).alias("v"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(300).select(
            F.col("id").alias("k"),
            F.concat(F.lit("n"), F.col("id")).alias("name"))
        return fact.join(dim, "k").select("k", "name", "v", "pad")

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = build()
        skewed = sorted(map(tuple, j.collect()))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan  # AQEShuffleRead split the partition
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = sorted(map(tuple, build().collect()))
        assert skewed == plain and len(skewed) == 200000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
