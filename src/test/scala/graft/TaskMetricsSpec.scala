package graft

import graft.ops.TaskMetrics
import org.apache.spark.sql.functions._

class TaskMetricsSpec extends SparkSpec {

  private def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("a groupBy measurably shuffles; a narrow projection does not") {
    val (_, agg) = TaskMetrics.measure(spark) {
      runNoop(Tables.lineitem(spark, sf0001)
        .groupBy("l_suppkey").agg(sum("l_quantity")))
    }
    assert(agg.shuffleWriteBytes > 0, s"groupBy should shuffle: $agg")
    val (_, proj) = TaskMetrics.measure(spark) {
      runNoop(Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity") * 2))
    }
    assert(proj.shuffleWriteBytes === 0, s"projection must not shuffle: $proj")
    assert(proj.inputRecords > 0)
  }

  test("aggregate-then-join shuffles less than join-then-aggregate") {
    // the denormalize_patient design claim, measured: pre-aggregating
    // orders to one row per customer before the join moves less data
    // than joining raw orders and aggregating after
    val c = Tables.customer(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (_, good) = TaskMetrics.measure(spark) {
        val stats = o.groupBy(col("o_custkey").as("c_custkey"))
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
        runNoop(c.join(stats, Seq("c_custkey"), "left"))
      }
      val (_, naive) = TaskMetrics.measure(spark) {
        runNoop(c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n"), sum("o_totalprice").as("s")))
      }
      assert(good.shuffleWriteBytes < naive.shuffleWriteBytes,
        s"pre-agg should move less: $good vs $naive")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed join reads zero shuffle bytes (quantitative proof)") {
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_m")
    Tables.customer(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_m")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (_, m) = TaskMetrics.measure(spark) {
        runNoop(spark.table("orders_m").join(spark.table("customer_m"),
          col("o_custkey") === col("c_custkey")))
      }
      assert(m.shuffleWriteBytes === 0 && m.shuffleReadBytes === 0,
        s"bucketed join shuffled: $m")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
