package graft.operators

import org.apache.spark.sql.SparkSession

/** One-off: does runtime exchange reuse fire for the rewritten
  * basket/cooccur plans? Prints the EXECUTED plan's ReusedExchange /
  * Scan counts (the formatted pre-execution dump cannot show AQE-stage
  * reuse). r11 optimization evidence tool; not part of any suite. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (name <- Seq("market_basket", "rec_item_cooccur")) {
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).size
      val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(p)
        .map(_.group(1)).toSeq
      println(s"[reuse] $name ReusedExchange=${c("ReusedExchange")} " +
        s"scans=${c("Scan parquet")} exchanges=${c("Exchange hashpartitioning")} " +
        s"stageOcc=${stageIds.size} stageDistinct=${stageIds.distinct.size}")
    }
    spark.stop()
  }
}
