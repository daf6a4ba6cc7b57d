package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Three full passes at the target sf, reporting each query's MIN.
    // One-sample timing is unusable here: JIT + whole-stage-codegen
    // compilation lands on whichever query touches a plan shape first
    // (measured: join_range 7.4s cold vs 1.1s warm at sf0.1), and with
    // 80+ queries the generated-class cache (weak refs) churns under GC
    // so even a "warmed" second pass shows multi-second outliers. The
    // per-query min over passes is the steady-state number — the one
    // that tracks plan quality rather than compiler scheduling — and is
    // stable across rounds.
    def onePass(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces full evaluation of every column (count() lets
        // Catalyst prune the projections away)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    val passes = Seq.fill(3)(onePass())
    val results = passes.flatten
      .groupMapReduce(_._1)(_._2)(math.min)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // sbt wraps stdout in [info] prefixes, which broke the driver's JSON
    // recovery in round 1 ("parsed": null) — also persist to a file so the
    // perf gate has a machine-readable artifact regardless of log framing
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
  }
}
