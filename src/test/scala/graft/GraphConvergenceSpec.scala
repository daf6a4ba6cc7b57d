package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Convergence guarantees of the iterative graph operators on adversarial
  * synthetic graphs whose peel depth / diameter exceed the fixed round
  * constants the round-5 implementations used (KcoreRounds = 8,
  * BfsRounds = 6): the plateau-guarded loops must (a) keep iterating past
  * those constants, proving the old truncation would have silently
  * returned an unconverged answer, and (b) land on the exactly-known
  * fixpoint. Graphs are built small (driver-side Seq → DataFrame) — the
  * point is depth, not volume.
  */
class GraphConvergenceSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    // undirected: materialize both directions, as the operators expect
    (pairs ++ pairs.map { case (a, b) => (b, a) })
      .toDF("src", "dst").localCheckpoint()
  }

  test("kcorePeel converges past the old 8-round constant on a deep-peel chain") {
    // path 1-2-...-16 attached to a triangle {17,18,19} via 16-17:
    // the 2-core is exactly the triangle, but the peel removes ONE path
    // vertex per round (only the current endpoint has degree < 2), so
    // convergence needs ~16 rounds — the old fixed 8-round unroll would
    // have reported half the path's non-core vertices as core members
    val path = (1L to 15L).map(i => (i, i + 1))
    val attach = Seq((16L, 17L))
    val tri = Seq((17L, 18L), (18L, 19L), (19L, 17L))
    val e = edgesDf(path ++ attach ++ tri)
    val (deg, rounds) = Pipeline.kcorePeel(e, k = 2, maxRounds = 64)
    assert(rounds > 8,
      s"peel depth must exceed the old fixed constant, got $rounds rounds")
    val core = deg.filter(col("d") >= 2).select("vid")
      .collect().map(_.getLong(0)).toSet
    assert(core === Set(17L, 18L, 19L),
      s"converged 2-core must be exactly the triangle, got $core")
  }

  test("iterated double-self-reference checkpoints keep plan statistics bounded") {
    // localCheckpoint PRESERVES statistics from the original plan, so a
    // loop that joins its checkpoint against itself doubles the
    // sizeInBytes bit-length every round — plain localCheckpoint dies
    // with 'BigInteger would overflow supported range' at ~31 rounds
    // (found by this suite's 40-deep peel). The stats-truncating
    // checkpoint must survive 40 such rounds with constant-size stats.
    import spark.implicits._
    var df = Seq((1L, 1L), (2L, 1L)).toDF("id", "x")
    for (_ <- 1 to 40) {
      val j = df.as("a").join(df.as("b"), Seq("id"))
        .select(col("id"), (col("a.x") + col("b.x")).as("x"))
      df = PlanUtil.checkpointTruncated(j)
      val bits = df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      assert(bits < 256, s"stats must not compound across rounds: $bits bits")
    }
    assert(df.count() === 2)
  }

  test("kcorePeel converges in one extra round when nothing peels") {
    // a clique K4 IS its own 3-core: round 1 peels nothing, round 1's
    // count probe certifies the fixpoint immediately
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val (deg, rounds) = Pipeline.kcorePeel(edgesDf(k4), 3, 64)
    assert(rounds === 1)
    assert(deg.filter(col("d") >= 3).count() === 4)
  }

  test("kcorePeel requires convergence within the round cap") {
    val path = (1L to 15L).map(i => (i, i + 1))
    val tri = Seq((16L, 17L), (17L, 18L), (18L, 16L), (15L, 16L))
    val ex = intercept[IllegalArgumentException] {
      Pipeline.kcorePeel(edgesDf(path ++ tri), 2, maxRounds = 5)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("bfsDistances converges past the old 6-round horizon on a long chain") {
    import spark.implicits._
    // path 1-2-...-16: diameter 15 from source 1 — the old fixed 6-round
    // unroll reaches only 7 of 16 vertices; the guarded loop must reach
    // all 16 with dist(v) = v - 1 exactly
    val e = edgesDf((1L to 15L).map(i => (i, i + 1)))
    val src = Seq((1L, 0L)).toDF("vid", "dist")
    val (dist, rounds) = Pipeline.bfsDistances(e, src, maxRounds = 64)
    assert(rounds > 6,
      s"diameter must exceed the old fixed horizon, got $rounds rounds")
    val d = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d.size === 16, s"all 16 vertices must be reached, got ${d.size}")
    assert((1L to 16L).forall(v => d(v) === v - 1),
      "BFS distances on a chain must equal position - 1")
  }

  test("bfsDistances requires convergence within the round cap") {
    import spark.implicits._
    val e = edgesDf((1L to 15L).map(i => (i, i + 1)))
    val src = Seq((1L, 0L)).toDF("vid", "dist")
    val ex = intercept[IllegalArgumentException] {
      Pipeline.bfsDistances(e, src, maxRounds = 5)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("driver queries render measured-round oracles after running") {
    // run the real queries at sf0.001, then the oracleGen artifact must
    // exist and unroll at least one round
    Pipeline.graphKcore.fn(spark, sf0001).collect()
    Pipeline.graphShortestPath.fn(spark, sf0001).collect()
    val ko = Pipeline.graphKcore.oracleNow
    val bo = Pipeline.graphShortestPath.oracleNow
    assert(ko.exists(_.contains("d1 AS")), "kcore oracle must be rendered")
    assert(bo.exists(_.contains("d1 AS")), "bfs oracle must be rendered")
  }

  test("graph_hits rescale invariant: every side tops at exactly 1e6") {
    // the per-round normalization contract: after the final rescale,
    // scores are positive, bounded by 1,000,000, and each side's max IS
    // 1,000,000 (the top node defines the scale). A drifting rescale
    // (overflow, lost DIV widening, max taken over the wrong frame)
    // breaks one of these before it breaks the value oracle.
    val out = Pipeline.graphHits.fn(spark, sf0001)
      .groupBy("side")
      .agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet === Set("hub", "authority"))
    out.foreach { case (side, (lo, hi)) =>
      assert(lo > 0, s"$side: scores must stay positive, got $lo")
      assert(hi === 1000000L, s"$side: top score must be exactly 1e6, got $hi")
    }
  }
}
