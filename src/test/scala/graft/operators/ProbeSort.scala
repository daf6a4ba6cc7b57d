package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 probe: how much does a final presentation sort cost on a
  * LIGHT query (one whose final stage is just an aggregate merge)? */
object ProbeSort {
  def time[A](name: String)(f: => A): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
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

    // agg_groupby's shape without its final sort
    val base = graft.Tables.lineitem(spark, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
           avg("l_extendedprice").as("avg_price"),
           count(lit(1)).as("n"))
    for (i <- 1 to 4) {
      time(s"agg only r$i")(noop(base))
      time(s"agg + orderBy r$i")(noop(base.orderBy("l_returnflag", "l_linestatus")))
      time(s"agg + rep1 sortWithin r$i")(noop(
        base.repartition(1).sortWithinPartitions("l_returnflag", "l_linestatus")))
    }
    spark.stop()
  }
}
