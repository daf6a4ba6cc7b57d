package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (builder prompt: "repartition()/bucketing for
  * co-located joins"): both sides bucketed by the join key into the same
  * bucket count join WITHOUT any shuffle exchange — the physical layout
  * that makes repeated fact-fact joins affordable at 100 TB (pay the
  * shuffle once at write time, never again at read time).
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    Tables.customer(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")

    def joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
            col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")

    // disable auto-broadcast so the test exercises the co-located
    // shuffle-join path (at real fact-fact scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
             plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n${plan.take(600)}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle either side:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"))

      // and it computes the right thing
      val viaBuckets = joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
              col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions") {
    // the second physical-layout lever at 100 TB: a date-partitioned
    // fact joined to a filtered dimension must read ONLY the partitions
    // the dim's surviving keys name — Catalyst injects the dim's key set
    // as a runtime partition filter (DPP), so the pruning needs no
    // literal predicate on the fact side at all
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim's filter column must be INDEPENDENT of the join key once
    // read back from storage — a filter expressible as f(day) would be
    // constraint-propagated onto the fact as a STATIC partition filter,
    // which is pruning but not DPP (the run-time kind this test pins)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppd")
    spark.range(30)
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
                       col("id").cast("int")).as("day"),
              pmod(col("id"), lit(7)).as("tag"))
      .write.mode("overwrite").parquet(dimDir.toString)
    val dim = spark.read.parquet(dimDir.toString).filter(col("tag") === 4)
    val q = fact.join(dim, Seq("day"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a DPP subquery in the fact scan's PartitionFilters:\n" +
        plan.take(1200))
    val n = q.collect()(0).getLong(0)
    // tag = id % 7 == 4 over ids 0..29 → days 5, 12, 19, 26 of January
    val expect = Tables.events(spark, sf0001)
      .filter(to_date(col("ts")).isin("2024-01-05", "2024-01-12",
                                      "2024-01-19", "2024-01-26")).count()
    assert(n === expect, "pruned read must still count every kept day")
  }
}
