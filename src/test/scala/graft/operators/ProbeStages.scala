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

    val sets = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_suppkey").as("s"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val adj = sets.select(col("s"), explode(col("parts")).as("p"))
    val posting = adj
      .groupBy("p")
      .agg(array_sort(collect_list(struct(col("s")))).as("sups"))
      .filter(size(col("sups")).between(2, 1024))
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("sups"))))
    }
    val pairs = posting.select(pairGen.as(Seq("s_a", "s_b")))
    val agg = pairs.groupBy("s_a", "s_b").agg(count(lit(1)).as("inter"))
    for (i <- 1 to 3) {
      time(s"collect_set sets r$i")(noop(sets))
      time(s"posting lists r$i")(noop(posting))
      time(s"pair generate only r$i")(noop(pairs))
      time(s"pair agg full r$i")(noop(agg))
    }
    println("[probe] pairs rows = " + pairs.count())
    spark.stop()
  }
}
