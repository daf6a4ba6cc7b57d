package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-attribution probe for the r11 optimization round:
  * times individual subplans of hot queries so the expensive stage is
  * measured, not guessed (guide §1). Not part of any suite. */
object ProbeStages {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()

    // dedup_ngram pipeline stage attribution
    val exN = Dedup.shingleHashesWithCount(spark, d)
      .withColumnRenamed("n_sgl", "n")
    val posting = exN
      .groupBy("sgl")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n"))))
        .as("docs"))
      .filter(size(col("docs")).between(2, 1024))
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("docs"))))
    }
    val pairs = posting
      .select(pairGen.as(Seq("doc_a", "na", "doc_b", "nb")))
    val agg = pairs.groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))

    // narrow variant: posting lists of bare ids, sizes joined post-agg
    val postingNarrow = Dedup.shingleHashesWithCount(spark, d)
      .select("doc_id", "sgl")
      .groupBy("sgl")
      .agg(array_sort(collect_list(struct(col("doc_id")))).as("docs"))
      .filter(size(col("docs")).between(2, 1024))
    val pairGenN = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("docs"))))
    }
    val pairsN = postingNarrow.select(pairGenN.as(Seq("doc_a", "doc_b")))
    val aggN = pairsN.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val sizes = Dedup.shingleHashesWithCount(spark, d)
      .groupBy("doc_id").agg(first(col("n_sgl")).as("n"))
    val jacN = aggN
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)

    val full = Dedup.dedupNgram.fn(spark, d)
    for (i <- 1 to 3) {
      time(s"shingles scan r$i")(noop(exN))
      time(s"posting (struct) r$i")(noop(posting))
      time(s"posting (narrow) r$i")(noop(postingNarrow))
      time(s"pairs wide r$i")(noop(pairs))
      time(s"pairs narrow r$i")(noop(pairsN))
      time(s"pair agg wide r$i")(noop(agg))
      time(s"pair agg narrow r$i")(noop(aggN))
      time(s"jaccard narrow full r$i")(noop(jacN))
      time(s"dedup_ngram current full r$i")(noop(full))
    }
    println("[probe] pair rows = " + pairs.count())
    println("[probe] agg rows  = " + agg.count())
    spark.stop()
  }
}
