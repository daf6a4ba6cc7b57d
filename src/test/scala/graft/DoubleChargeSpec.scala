package graft

import org.apache.spark.sql.functions._

/** The fixture's continuous prices never collide, so the driver gate only
  * exercises dq_double_charge's clean-feed row. This spec drives the
  * DETECTOR direction on a synthetic orders table with a planted
  * double-submit (same customer, same cents, 2 days apart) and a planted
  * benign repeat (same amount, 400 days apart). */
class DoubleChargeSpec extends SparkSpec {

  test("dq_double_charge flags the tight repeat, not the slow one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("double-charge")
    Seq(
      // the double-submit: customer 1, $25.00, 2 days apart
      (1L, 25.00, "1995-03-01"),
      (1L, 25.00, "1995-03-03"),
      // the benign repeat: customer 2, $40.00, 400 days apart
      (2L, 40.00, "1995-01-01"),
      (2L, 40.00, "1996-02-05"),
      // singletons
      (3L, 10.00, "1995-06-01"),
      (4L, 11.00, "1995-07-01"))
      .toDF("o_custkey", "o_totalprice", "d")
      .select(col("o_custkey"), col("o_totalprice"),
        to_date(col("d")).as("o_orderdate"),
        monotonically_increasing_id().as("o_orderkey"))
      .write.parquet(s"$dir/orders.parquet")
    val rows = operators.Pipeline.dqDoubleCharge.fn(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // level 1: two singleton groups, none suspicious; level 2: two
    // repeat groups, exactly ONE within the 7-day window
    assert(rows.toSeq.sortBy(_._1) === Seq((1L, 2L, 0L), (2L, 2L, 1L)))
  }
}
