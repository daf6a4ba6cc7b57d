package graft

import graft.functions.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    val spark2 = spark
    import spark2.implicits._
    // heavily skewed: 90% of rows share key "hot"
    val big = (1 to 1000).map(i =>
      (if (i % 10 == 0) s"k$i" else "hot", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", "H"), ("k10", "T"), ("k20", "U"))
      .toDF("key", "name")
    val plain = big.join(small, "key")
    val salted = SkewOps.saltedJoin(big, small, "key", 8, col("v"))
    assert(salted.count() === plain.count())
    assert(salted.select("key", "v", "name")
      .except(plain.select("key", "v", "name")).count() === 0)
    assert(plain.select("key", "v", "name")
      .except(salted.select("key", "v", "name")).count() === 0)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val spark2 = spark
    import spark2.implicits._
    // AQE is the conf-driven alternative to manual salting: same skewed
    // shape, but the runtime re-plans the sort-merge join with the hot
    // partition split into sub-partitions. Thresholds lowered so the
    // ~90%-hot key trips the skew detector at test scale.
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      // force a shuffle join: AQE must not just broadcast the small side
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // small side: ONE row per key — a many-to-many hot×hot join would
      // explode quadratically and OOM the test JVM
      val big = (1 to 20000).map(i =>
        (if (i % 100 == 0) s"k$i" else "hot", i.toLong)).toDF("key", "v")
      val small = ("hot" +: (1 to 20000).filter(_ % 100 == 0).map(i => s"k$i"))
        .map(k => (k, s"n$k")).toDF("key", "name")
      val joined = big.hint("merge").join(small, "key")
      // materialize THIS QueryExecution (count() would spawn its own and
      // leave joined's adaptive plan un-finalized)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n${plan.take(1200)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt is deterministic and within range") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v")
    val salts = df.select(SkewOps.salt(8, col("v")).as("s"))
    val r = salts.agg(min("s"), max("s")).collect()(0)
    assert(r.getLong(0) >= 0 && r.getLong(1) <= 7)
    // stable across evaluations (no rand())
    assert(salts.collect().toSeq === salts.collect().toSeq)
  }
}
