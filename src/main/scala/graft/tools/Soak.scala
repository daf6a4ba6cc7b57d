package graft.tools

/** Scale soak: times a named subset of the query catalog at one sf dir.
  *
  * Run it at sf0.1 and at the [[ScaleGen]]-generated sf1, then compare:
  * the measured exponent log10(t_sf1 / t_sf0.1) is the empirical scaling
  * of the whole plan (1.0 = linear). Results feed docs/SCALE.md.
  *
  * Reports cold (first pass) and min-over-passes per query, same columns
  * as [[graft.Bench]], so training/memoized-artifact cost is visible.
  *
  * Usage: runMain graft.tools.Soak <sfDir> <outFile> <query>[,<query>...]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val names = args(2).split(",").toSeq
    val spark = graft.GraftSession.local()
    spark.conf.set("spark.sql.codegen.cache.maxEntries", "4096")
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    def onePass(): Seq[(String, Double)] = names.map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[soak] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val passes = Seq.fill(2)(onePass())
    val cold = passes.head.toMap
    val best = passes.flatten.groupMapReduce(_._1)(_._2)(math.min)
    def jmap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        s"\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val line =
      s"""{"sf":"$sfDir","total":${best.values.sum},""" +
      s""""queries":${jmap(best)},"queries_cold":${jmap(cold)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    println(line)
    spark.stop()
  }
}
