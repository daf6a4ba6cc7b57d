package graft

import org.apache.spark.sql.functions._

/** VERDICT r6 #3: [[graft.operators.Streaming.markovStationary]]'s
  * driver-side |types|² matrix is bounded by design (the event-type
  * domain), but the bound must be ENFORCED — on a frame whose event_type
  * is effectively an id column the operator has to refuse with a message
  * naming the distributed alternative, not OOM the driver mid-collect. */
class MarkovGuardSpec extends SparkSpec {

  test("markov_stationary refuses a high-cardinality event_type domain") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("markov-guard")
    // an events table where event_type is an id: 1500 distinct values,
    // comfortably past the 1024 cap
    (1 to 1500).toDF("i")
      .select(
        (col("i") % 7).cast("long").as("user_id"),
        concat(lit("type_"), col("i")).as("event_type"),
        expr("timestamp_micros(cast(i as long) * 1000000)").as("ts"),
        col("i").cast("long").as("event_id"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      operators.Streaming.markovStationary.fn(spark, dir.toString)
    }
    assert(e.getMessage.contains("1500 distinct"))
    assert(e.getMessage.contains("1024"))
    // the error must point at the distributed formulation, not dead-end
    assert(e.getMessage.contains("distributed"))
  }

  test("the guard passes the real fixture through untouched") {
    val df = operators.Streaming.markovStationary.fn(spark, sf0001)
    assert(df.count() > 0)
  }
}
