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

  test("misra-gries: bounded counters, catches every provable heavy hitter") {
    import graft.operators.TextAnalysis
    // 50×a + 30×b + 40 singletons, n=120; cap=4 ⇒ guaranteed to retain
    // every item with freq > 120/5 = 24
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"x$i")
    val got = TextAnalysis.misraGries(data.iterator, 4).toMap
    assert(got.size <= 4, "capacity exceeded")
    assert(got.contains("a") && got.contains("b"),
      s"guaranteed heavy hitters evicted: $got")
    // MG counts undercount by at most n/(cap+1), never overcount
    assert(got("a") <= 50 && got("a") >= 50 - 120 / 5)
    assert(got("b") <= 30 && got("b") >= 30 - 120 / 5)
  }

  test("text_heavy_hitters equals the naive full-vocabulary aggregate") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.textHeavyHitters.fn(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) } // query no longer presentation-sorts
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * TextAnalysis.HhThreshold > n)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq === want.toSeq,
      "two-pass MG + exact recount must equal the naive plan")
    assert(got.nonEmpty, "corpus has heavy tokens at the 1/200 threshold")
  }

  test("count-min: estimates dominate exact counts; shard tables merge by addition") {
    import graft.functions.TextFns
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    def cms(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array((0 until 4).map { r =>
        struct(lit(r).as("r"),
          pmod(TextFns.saltedHash(col("token"), s"#cm$r", 15),
               lit(256)).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // mergeability — THE property a distributed sketch rests on: the CMS
    // of the union is the cellwise SUM of per-shard CMS tables
    val full = cms(toks).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = cms(toks.filter(col("doc_id") % 2 === 0))
    val b = cms(toks.filter(col("doc_id") % 2 =!= 0))
    val merged = a.withColumnRenamed("cnt", "ca")
      .join(b.withColumnRenamed("cnt", "cb"), Seq("r", "bucket"), "full_outer")
      .select(col("r"), col("bucket"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full, "shard CMS tables must sum to the full table")
    // domination: est >= exact for EVERY vocabulary token, not just the
    // heavy ones the driver query reports (only collisions inflate)
    val out = graft.operators.TextAnalysis.textCountmin.fn(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS must never underestimate: ${r}")
    }
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
