package graft.operators

import org.apache.spark.sql.SparkSession

/** One-off r11 probe: what does a plan-build-time `spark.read.parquet`
  * cost (footer schema inference + file index) vs a reader with the
  * schema supplied? Drives the Tables schema-memoization decision. */
object ProbeRead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String, reps: Int)(f: => A): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      println(f"[proberead] $name%-28s ${(System.nanoTime() - t0) / 1e6 / reps}%8.2f ms/call x$reps")
    }
    // warm
    (1 to 3).foreach(_ => spark.read.parquet(s"$d/lineitem.parquet").schema)
    val sch = spark.read.parquet(s"$d/lineitem.parquet").schema
    t("read.parquet (infer)", 50)(spark.read.parquet(s"$d/lineitem.parquet").schema)
    t("read.schema(parquet)", 50)(spark.read.schema(sch).parquet(s"$d/lineitem.parquet").schema)
    t("infer+analyze filter", 20)(
      spark.read.parquet(s"$d/lineitem.parquet").select("l_orderkey").queryExecution.optimizedPlan)
    t("schema+analyze filter", 20)(
      spark.read.schema(sch).parquet(s"$d/lineitem.parquet").select("l_orderkey").queryExecution.optimizedPlan)
    spark.stop()
  }
}
