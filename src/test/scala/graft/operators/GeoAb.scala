package graft.operators

/** A/B evidence for docs/SCALE.md: the spread-fixture kNN and DBSCAN
  * under the ADAPTIVE derived cell vs the pre-round-11 FIXED 2° grid
  * (h = 0 forced). Usage:
  *   Test/runMain graft.operators.GeoAb <sfDir>
  */
object GeoAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkSpec.session
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[geoab] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm shared infra once
    time("warmup dbscan adaptive") {
      Geo.dbscanPlan(spark, d, Geo.spreadSelf).count()
    }
    time("knn adaptive") { Geo.knnPlanAt(spark, d, None).count() }
    time("knn FIXED 2-deg") { Geo.knnPlanAt(spark, d, Some(0)).count() }
    time("dbscan adaptive") {
      Geo.dbscanPlan(spark, d, Geo.spreadSelf).count()
    }
    time("dbscan FIXED 2-deg") {
      Geo.dbscanPlan(spark, d, Geo.spreadSelf, Some(0), Some(false)).count()
    }
  }
}
