"""AQE skew-join splitting: prove the runtime re-plan actually engages
on a skewed shuffle join (SURVEY.md §4 skew row) — not just that the
config is set. Thresholds are lowered so the t-small-scale skew crosses
them; on a real cluster the defaults (256MB advisory) do the same for
multi-GB hot partitions."""

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark, tsmall_path):
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )}
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "4096")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # one mega key owning most rows on both sides of a shuffle join
        left = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string"))
            .alias("payload"))
        right = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"))
        joined = left.join(right, "k").groupBy().agg(F.count("*").alias("n"))
        [row] = joined.collect()  # force AQE final plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        # correctness under the split: 18000 rows match on k=0 both sides
        # (18000^2) plus 2000 distinct singleton keys matching themselves
        assert row["n"] == 18000 * 18000 + 2000
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
