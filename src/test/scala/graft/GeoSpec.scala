package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

/** Adaptive-cell geo machinery: the dense-cell DBSCAN rewrite must be
  * value-equal to plain ring enumeration (it is an exact plan choice,
  * not a semantics change), and the derivation/clamp arithmetic must
  * hold its documented invariants.
  */
class GeoSpec extends SparkSpec {

  test("dense-cell DBSCAN plan equals ring enumeration (exact rewrite)") {
    // same forced cell (diagonal ≤ R), dense rule on vs off — the
    // core/border/noise census must be identical on the spread corpus
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val (densePlan, enumPlan) = Geo.dbscanBothPlans(spark, d)
      val a = densePlan.collect().map(_.toSeq).toSeq
      val b = enumPlan.collect().map(_.toSeq).toSeq
      assert(a === b, s"dense-cell rewrite diverged at $d")
      val r = a.head
      assert(r(0).asInstanceOf[Long] ==
        r(1).asInstanceOf[Long] + r(2).asInstanceOf[Long] +
        r(3).asInstanceOf[Long], "core+border+noise must partition")
    }
  }

  test("clampRing keeps the R-coverage ring inside the clamp") {
    // base cell 2e6; ring(h, r) = ceil(r / (2e6 >> h))
    def ring(h: Int, r: Long): Long = {
      val e = 2000000L >> h; (r + e - 1) / e
    }
    for (h <- 0 to 16; r <- Seq(200000L, 2000000L)) {
      val c = Geo.clampRing(h, r)
      assert(c <= h && c >= 0)
      assert(ring(c, r) <= 8, s"h=$h r=$r clamped to $c, ring ${ring(c, r)}")
      // maximality: the clamp only backs off when it must
      if (c < h) assert(ring(c + 1, r) > 8)
    }
    // classic: R = base cell → ring = 2^h, clamp at h=3
    assert(Geo.clampRing(0, 2000000L) == 0)
    assert(Geo.clampRing(5, 2000000L) == 3)
  }

  test("derived cell is the committed 2° on the lattice fixtures") {
    // the committed corpora sit far below the per-cell budget, so the
    // consumers' round-10 plan shape (2° cells, 3×3) is preserved
    assert(Geo.adaptiveCellOf(spark, sf0001) == 2000000L)
    assert(Geo.adaptiveCellOf(spark, "/root/testdata/sf0.01") == 2000000L)
  }
}
