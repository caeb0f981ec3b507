"""Bucketing for co-located joins: two tables bucketed on the join key
join WITHOUT any Exchange (shuffle) in the physical plan — the layout
strategy that makes repeated large-fact joins cheap at 100 TB."""

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, tsmall_path):
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("orders_bucketed"))
    (customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable("customer_bucketed"))

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("orders_bucketed")
        cb = spark.table("customer_bucketed")
        joined = (ob.join(cb, ob.o_custkey == cb.c_custkey)
                  .groupBy("c_mktsegment")
                  .agg(F.count("*").alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself reads co-located buckets: no Exchange below it
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part
        # sanity: result matches the plain (shuffled) join
        plain = (orders.join(customer,
                             orders.o_custkey == customer.c_custkey)
                 .groupBy("c_mktsegment").agg(F.count("*").alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
