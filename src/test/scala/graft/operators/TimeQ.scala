package graft.operators

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: `sbt "Test/runMain graft.operators.TimeQ <sfDir> <name>..."`
  * runs each named catalog query three times against the given testdata
  * dir (noop sink, full evaluation) so warm-vs-cold JIT effects are
  * visible — the bench harness reports one sample per query, which can
  * misattribute first-touch compilation cost to whichever query runs
  * early. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args.drop(1); i <- 1 to 3) {
      val q = graft.SparkEntry.catalog.find(_.name == n)
        .getOrElse(sys.error(s"no such query: $n"))
      val t0 = System.nanoTime()
      q.fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
