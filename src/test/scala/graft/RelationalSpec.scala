package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per group") {
    val rows = Relational.aggApproxDistinct.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_cust").toDouble
      val exact = r.getAs[Long]("exact_cust").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("entry (flagship) returns top-20 revenue rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 20)
    // revenue strictly ordered desc
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs === revs.sorted.reverse)
  }
}
