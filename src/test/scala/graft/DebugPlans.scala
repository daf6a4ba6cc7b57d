package graft

/** Ad-hoc plan dump helper: `sbt "Test/runMain graft.DebugPlans <query>"`. */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val name = args.headOption.getOrElse("filter_pred")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(s"=== $name executedPlan ===")
    println(df.queryExecution.executedPlan.toString)
  }
}
