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
