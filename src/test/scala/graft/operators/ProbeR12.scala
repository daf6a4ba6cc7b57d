package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 stage probes: dq_reconciliation decimal hot loop, jaccard pair
  * aggregate key packing, dq_fd_violations branches. */
object ProbeR12 {
  def time[A](name: String)(f: => A): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
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
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)

    // --- dq_reconciliation stages
    val li = graft.Tables.lineitem(spark, d).select(col("l_orderkey"),
      (graft.Tables.money(col("l_extendedprice")) * 100).cast("long").as("cents"),
      floor(lit(1000000) * col("l_discount") + lit(0.5)).cast("long").as("d_ppm"),
      floor(lit(1000000) * col("l_tax") + lit(0.5)).cast("long").as("t_ppm"))
    val cDec = li.select(col("l_orderkey"),
        (col("cents").cast(dec38) * (lit(1000000L) - col("d_ppm"))
          * (lit(1000000L) + col("t_ppm"))).as("pico"))
      .groupBy("l_orderkey").agg(sum(col("pico")).as("line_pico"))
    // split-long variant: m = (1e6-d)(1e6+t) fits long (<=1.1e12);
    // pico = cents*m needs >64 bits -> sum hi/lo long parts, combine per order
    val mEx = (lit(1000000L) - col("d_ppm")) * (lit(1000000L) + col("t_ppm"))
    val cLong = li.select(col("l_orderkey"),
        (col("cents") * (mEx % 1048576L)).as("lo"),
        (col("cents") * (mEx.cast("long") / 1048576L).cast("long")).as("hi"))
      .groupBy("l_orderkey")
      .agg(sum(col("lo")).as("slo"), sum(col("hi")).as("shi"))
      .select(col("l_orderkey"),
        (col("shi").cast(dec38) * lit(1048576L) + col("slo").cast(dec38))
          .as("line_pico"))
    val full = graft.operators.Pipeline.dqReconciliation.fn(spark, d)
    for (i <- 1 to 3) {
      time(s"recon li scan only r$i")(noop(li))
      time(s"recon dec agg r$i")(noop(cDec))
      time(s"recon split-long agg r$i")(noop(cLong))
      time(s"recon full r$i")(noop(full))
    }
    // equivalence check
    val diff = cDec.as("a").join(cLong.as("b"), "l_orderkey")
      .filter(col("a.line_pico") =!= col("b.line_pico")).count()
    println(s"[probe] recon split-long mismatches = $diff")

    // --- jaccard pair agg: (s_a, s_b) two-col vs packed single long
    val sets = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_suppkey").as("s"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val adj = sets.select(col("s"), explode(col("parts")).as("p"))
    val posting = adj.groupBy("p")
      .agg(array_sort(collect_list(struct(col("s")))).as("sups"))
      .filter(size(col("sups")).between(2, 1024))
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("sups"))))
    }
    val twoCol = posting.select(pairGen.as(Seq("s_a", "s_b")))
      .groupBy("s_a", "s_b").agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= 2)
    val packed = posting.select(pairGen.as(Seq("s_a", "s_b")))
      .select((col("s_a") * 4294967296L + col("s_b")).as("sk"))
      .groupBy("sk").agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= 2)
      .select((col("sk") / 4294967296L).cast("long").as("s_a"),
              (col("sk") % 4294967296L).as("s_b"), col("inter"))
    for (i <- 1 to 3) {
      time(s"jacc pairs twoCol r$i")(noop(twoCol))
      time(s"jacc pairs packed r$i")(noop(packed))
    }
    spark.stop()
  }
}
