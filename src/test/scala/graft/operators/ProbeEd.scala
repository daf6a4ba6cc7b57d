package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for dedup_edit_distance (r12 §1 probe). */
object ProbeEd {
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

    val EditPrefix = 128
    val WinNbrs = 3
    val t = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val seq = t.select(col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("sk"),
      substring(col("text"), 1, EditPrefix).as("p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("blk").orderBy("sk", "doc_id")
    val cand = seq
      .select(col("doc_id").as("a"), col("p").as("pa"),
        array((1 to WinNbrs).map(i =>
          struct(lead(col("doc_id"), i).over(w).as("b"),
                 lead(col("p"), i).over(w).as("pb"))): _*).as("nxt"))
      .select(col("a"), col("pa"), explode(col("nxt")).as("n"))
      .filter(col("n.b").isNotNull)
      .select(least(col("a"), col("n.b")).as("doc_a"),
              greatest(col("a"), col("n.b")).as("doc_b"),
              col("pa"), col("n.pb").as("pb"))
    val lev = cand
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb")).cast("long").as("dist"),
        greatest(length(col("pa")), length(col("pb")))
          .cast("long").as("ml"))
    val full = Dedup.dedupEditDistance.fn(spark, d)
    val noSort = {
      val simPpm = expr("(1000000 * (ml - dist)) div nullif(ml, 0)")
      lev.select(col("doc_a"), col("doc_b"), col("dist"),
        simPpm.cast("long").as("sim_ppm"),
        (simPpm >= 700000L).as("verified"))
    }
    for (i <- 1 to 3) {
      time(s"seq project r$i")(noop(seq))
      time(s"window cand r$i")(noop(cand))
      time(s"cand+lev r$i")(noop(lev))
      time(s"no final sort r$i")(noop(noSort))
      time(s"full query r$i")(noop(full))
    }
    println("[probe] cand rows = " + cand.count())
    spark.stop()
  }
}
