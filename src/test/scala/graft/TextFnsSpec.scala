package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {

  test("rollingHash is order-sensitive, deterministic, equal on equal docs") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),   // same sequence -> same hash
      (3L, "d c b a"),   // same bag, different order -> different hash
      (4L, "a b c")
    ).toDF("id", "text")
      .select(col("id"), TextFns.rollingHash(TextFns.tokens(col("text"))).as("h"))
    val h = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
    assert(h(1L) !== h(4L))
    // stable across evaluations
    assert(df.collect().map(_.getLong(1)).toSeq ===
           df.collect().map(_.getLong(1)).toSeq)
  }

  test("lang_id prediction is deterministic and covers the marker languages") {
    val out = graft.operators.TextAnalysis.langId.fn(spark, sf0001)
    val preds = out.select("predicted").distinct().collect()
      .map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "und")))
    // markers 'the'/'a' are in the synthetic vocab -> english must appear
    assert(preds.contains("en"))
  }
}
