package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}

/** One-off scan: which catalog queries plan an UNPARTITIONED window, and
  * does each such window sit above an Aggregate (bounded frame)?
  * `sbt "Test/runMain graft.DebugWindows"`.
  */
object DebugWindows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    SparkEntry.catalog.filterNot(_.eager).foreach { q =>
      try {
        val plan = q.fn(spark, sf).queryExecution.optimizedPlan
        val bare = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
        if (bare.nonEmpty) {
          val info = bare.map { w =>
            val aggs = w.collect { case a: Aggregate => a }.size
            val nodes = w.child.collect { case n => n.nodeName }.distinct.mkString(",")
            s"aggsBelow=$aggs below=[$nodes]"
          }.mkString(" | ")
          println(s"BAREWIN ${q.name} :: $info")
        }
      } catch {
        case e: Throwable => println(s"ERROR ${q.name} :: ${e.getMessage}")
      }
    }
    println("DONE")
  }
}
