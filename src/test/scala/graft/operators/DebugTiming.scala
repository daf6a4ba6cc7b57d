package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-level timing probe: `sbt "Test/runMain graft.DebugTiming"`. */
object DebugTiming {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val d = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()

    val sh = Dedup.shingleHashes(spark, d)
    time("shingleHashes")(noop(sh))
    time("shingleHashes x2 (warm)")(noop(sh))
    val ex = sh
    time("posting counts")(noop(ex.groupBy("sgl").agg(count(lit(1)))))
    time("posting collect_list")(noop(
      ex.groupBy("sgl").agg(collect_list(col("doc_id")))))
    val posting = ex.groupBy("sgl").agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, 1024))
    val pairArr = flatten(transform(col("docs"), (a, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        b => struct(a.as("doc_a"), b.as("doc_b")))))
    val pairs = posting.select(explode(pairArr).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("pairs stage")(noop(pairs))
    time("full dedup_ngram")(noop(
      Dedup.dedupNgram.fn(spark, d)))
    time("full dedup_minhash")(noop(
      Dedup.dedupMinhash.fn(spark, d)))
    val shArr = Dedup.shingled(spark, d)
    time("shingled arrays")(noop(shArr))
    // probe the PRODUCTION pipeline stages: portable hashes + the same
    // band construction dedup_minhash runs (an xxhash64 stand-in would
    // change both the arithmetic and the bucket distribution the probe
    // exists to diagnose)
    val bands2 = Dedup.minhashBands(Dedup.minhashSignaturesExpr(spark, d))
    val cand2 = bands2.as("a").join(bands2.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("minhash candidates")(noop(cand2))
    time("minhash signatures (expr)")(noop(
      Dedup.minhashSignaturesExpr(spark, d)))
    time("minhash signatures (agg)")(noop(Dedup.minhashSignatures(
      Dedup.shingleHashesPortable(spark, d).select("doc_id", "sgl"))))
  }
}
