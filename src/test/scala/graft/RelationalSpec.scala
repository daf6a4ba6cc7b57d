package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per group") {
    val rows = Relational.approxDistinctRaw(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_cust").toDouble
      val exact = r.getAs[Long]("exact_cust").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx sketch tracks the exact quantiles per group") {
    val exact = Relational.aggQuantile.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val sketch = Relational.quantileSketchRaw(spark, sf0001).collect()
    assert(sketch.nonEmpty)
    sketch.foreach { r =>
      val e = exact(r.getString(0))
      Seq("median_qty", "p90_qty", "median_price").foreach { c =>
        val ev = e.getAs[Double](c)
        val sv = r.getAs[Double](c)
        // GK sketch bounds RANK error; on these distributions the value
        // error at accuracy 10000 stays within 2%
        assert(math.abs(sv - ev) <= 0.02 * math.abs(ev).max(1.0),
          s"${r.getString(0)}.$c: sketch=$sv exact=$ev")
      }
    }
  }

  test("stratified sample respects per-stratum fractions (seeded)") {
    val totals = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.sampleStratified.fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = Map("F" -> 0.1, "O" -> 0.5, "P" -> 1.0)
    fracs.foreach { case (k, f) =>
      val expected = totals(k) * f
      val got = sampled.getOrElse(k, 0L).toDouble
      assert(math.abs(got - expected) <= math.max(10, 0.5 * expected),
        s"stratum $k: got $got expected ~$expected")
    }
    // fraction 1.0 stratum must be complete
    assert(sampled("P") === totals("P"))
  }

  test("entry (flagship) returns top-20 revenue rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 20)
    // revenue strictly ordered desc
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs === revs.sorted.reverse)
  }
}
