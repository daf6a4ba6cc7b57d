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
}
