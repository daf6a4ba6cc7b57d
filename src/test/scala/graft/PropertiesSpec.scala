package graft

import graft.functions.expressions.CosineSimilarity
import graft.plans.SchemaFlattener
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY.md §5 item 3). Expression-level
  * properties evaluate CosineSimilarity directly (no Spark job per
  * sample); the flatten round-trip runs a handful of DataFrame cases.
  */
class PropertiesSpec extends SparkSpec {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    CosineSimilarity(
      Literal.create(new GenericArrayData(a.toArray), ArrayType(DoubleType)),
      Literal.create(new GenericArrayData(b.toArray), ArrayType(DoubleType)))
      .eval(null).asInstanceOf[Double]

  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(2, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))
  private def nonZero(v: List[Double]) = v.exists(x => math.abs(x) > 1e-9)

  test("cosine is bounded, symmetric, and 1 on self") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (x, y) = (a.take(n), b.take(n))
      if (!nonZero(x) || !nonZero(y)) true
      else {
        val c = cos(x, y)
        c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 &&
          math.abs(c - cos(y, x)) < 1e-12 &&
          math.abs(cos(x, x) - 1.0) < 1e-9
      }
    })
  }

  test("cosine is scale-invariant") {
    check(Prop.forAll(vecGen, Gen.chooseNum(0.1, 1000.0)) { (a, k) =>
      if (!nonZero(a)) true
      else math.abs(cos(a, a.map(_ * k)) - 1.0) < 1e-9
    })
  }

  test("flatten(nest(row)) round-trips values") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.long, Gen.alphaStr, Gen.chooseNum(-1e6, 1e6)))
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("id", "s", "x")
      val nested = df.select(col("id"),
        struct(col("s"), struct(col("x")).as("inner")).as("obj"))
      val flat = SchemaFlattener.flatten(nested)
      flat.columns.toSeq == Seq("id", "obj_s", "obj_inner_x") &&
        flat.select(col("id"), col("obj_s").as("s"), col("obj_inner_x").as("x"))
          .except(df).count() == 0
    }, n = 5)
  }

  test("salted aggregation equals plain groupBy on random data") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(-1000, 1000)))
    check(Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (s"k$k", v.toLong, i.toLong) }
        .toDF("key", "v", "rid")
      val salted = graft.functions.SkewOps
        .saltedSumCount(df, col("key"), col("v"), 4, col("rid"))
        .select(col("k"), col("total"), col("n"))
      val plain = df.groupBy(col("key").as("k"))
        .agg(sum("v").as("total"), count(lit(1)).as("n"))
      salted.except(plain).count() == 0 && plain.except(salted).count() == 0
    }, n = 5)
  }

  test("k-means centroids: unit norm, count = min(k, n), deterministic") {
    import graft.operators.Vectors
    val rnd = new scala.util.Random(5)
    val sample = Array.fill(300)(Array.fill(16)(rnd.nextGaussian()))
    val c1 = Vectors.trainCentroids(sample, 8, 5)
    val c2 = Vectors.trainCentroids(sample.map(_.clone), 8, 5)
    assert(c1.length === 8)
    c1.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"centroid norm $norm")
    }
    // same sample → bit-identical index (the reproducibility contract)
    c1.zip(c2).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // fewer points than k degrades gracefully
    assert(Vectors.trainCentroids(sample.take(3), 8, 5).length === 3)
  }

  test("misra-gries containment and error bound hold on random streams") {
    import graft.operators.TextAnalysis.misraGries
    val streamGen: Gen[(List[String], Int)] = for {
      cap <- Gen.chooseNum(2, 16)
      n <- Gen.chooseNum(1, 400)
      // skewed alphabet: small ids are frequent, so heavy hitters exist
      items <- Gen.listOfN(n, Gen.chooseNum(0, 40).map(i => s"t${i * i / 41}"))
    } yield (items, cap)
    check(Prop.forAll(streamGen) { case (items, cap) =>
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size }
      val got = misraGries(items.iterator, cap).toMap
      val n = items.size
      val bound = n / (cap + 1)
      // (1) bounded counters, (2) every item with freq > n/(cap+1)
      // survives, (3) counts never overcount and undercount ≤ bound
      got.size <= cap &&
        exact.forall { case (k, c) =>
          c <= bound || got.contains(k) } &&
        got.forall { case (k, c) =>
          c <= exact(k) && c >= exact(k) - bound }
    }, n = 200)
  }

  test("centroidFast (production avg) agrees with the oracle fold to 1e-9") {
    import graft.operators.Vectors
    import org.apache.spark.sql.functions._
    val oracle = Vectors.vectorCentroid.fn(spark, sf0001)
      .select(col("label"), col("dim"), col("n"), col("m"))
    val fast = Vectors.centroidFast(Tables.embeddings(spark, sf0001))
      .select(col("label"), col("dim"), col("n").as("n2"), col("m").as("m2"))
    val joined = oracle.join(fast, Seq("label", "dim")).collect()
    assert(joined.nonEmpty && joined.length % 64 == 0)
    joined.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("n2"))
      val (m, m2) = (r.getAs[Double]("m"), r.getAs[Double]("m2"))
      assert(math.abs(m - m2) <= 1e-9 * math.max(1.0, math.abs(m)),
        s"(${r.get(0)}, ${r.get(1)}): fold $m vs avg $m2")
    }
  }

  test("int8 quantization: codes in [-127,127], error bounded by scale/2") {
    val rows = graft.operators.Vectors.vectorQuantize.fn(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val codes = r.getAs[String]("q8").split('|').map(_.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"vec ${r.getLong(0)}: code out of range")
      assert(codes.exists(c => math.abs(c) == 127),
        s"vec ${r.getLong(0)}: max-magnitude element should hit ±127")
      assert(r.getAs[Double]("max_err") <= scale / 2 + 1e-12,
        s"vec ${r.getLong(0)}: dequantization error exceeds scale/2")
    }
  }

  test("pattern_seq matches are strictly ordered chains, equal to a direct scan") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Streaming.patternSeq.fn(spark, sf0001).collect()
    assert(out.nonEmpty, "fixture should contain view->click->purchase chains")
    out.foreach { r =>
      val v = r.getAs[java.sql.Timestamp]("view_ts")
      val c = r.getAs[java.sql.Timestamp]("click_ts")
      val p = r.getAs[java.sql.Timestamp]("purchase_ts")
      assert(!c.before(v), s"view must not follow click: $r")
      assert(!p.before(c), s"click must not follow purchase: $r")
    }
    // exact semantics cross-check: simulate the automaton directly over
    // one matched user's ordered event stream and compare match sets
    val uid = out.head.getAs[Long]("user_id")
    val evs = Tables.events(spark, sf0001)
      .filter(col("user_id") === uid)
      .select("ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._3))
    var seenView = false
    var seenQualClick = false
    val expected = scala.collection.mutable.Set.empty[Long]
    evs.foreach { case (_, tpe, id) =>
      if (tpe == "purchase" && seenQualClick) expected += id
      if (tpe == "click" && seenView) seenQualClick = true
      if (tpe == "view") seenView = true
    }
    val got = out.filter(_.getAs[Long]("user_id") == uid)
      .map(_.getAs[Long]("event_id")).toSet
    assert(got === expected.toSet,
      s"window-carried matches must equal the direct automaton for user $uid")
  }

  test("window running sum's last value equals the group sum") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(-1000, 1000)))
    check(Prop.forAll(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v.toLong, i) }.toDF("k", "v", "seq")
      val w = Window.partitionBy("k").orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastRunning = df.withColumn("run", sum("v").over(w))
        .groupBy("k").agg(max_by(col("run"), col("seq")).as("last_run"))
      val direct = df.groupBy("k").agg(sum("v").as("total"))
      lastRunning.join(direct, "k")
        .filter(col("last_run") =!= col("total")).count() == 0
    }, n = 5)
  }

  test("agg_bitmap_distinct equals countDistinct exactly") {
    import org.apache.spark.sql.functions._
    val bitmap = graft.operators.Relational.aggBitmapDistinct
      .fn(spark, sf0001)
      .select("event_type", "n_users")
    val exact = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    assert(bitmap.join(exact, "event_type")
      .filter(col("n_users") =!= col("n_exact")).count() === 0)
    assert(bitmap.count() > 0)
  }

  test("sweep-line peak equals brute-force max interval overlap") {
    // the session_concurrency kernel, checked against the O(n*m)
    // definition on random interval sets (one day, integer ms)
    val ivGen = Gen.listOfN(40, for {
      st <- Gen.chooseNum(0L, 1000L)
      len <- Gen.chooseNum(0L, 200L)
    } yield (st, st + len))
    check(Prop.forAll(ivGen) { ivs =>
      // sweep: +1 at st, -1 at en+1, per-instant totals in order
      val deltas = ivs.flatMap { case (s0, e0) => Seq((s0, 1), (e0 + 1, -1)) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (ms, dd) => (ms, dd.map(_._2).sum) }
      var cur = 0; var peak = 0
      deltas.foreach { case (_, dd) => cur += dd; if (cur > peak) peak = cur }
      // brute force: max over all interval endpoints of containing count
      val points = ivs.flatMap { case (s0, e0) => Seq(s0, e0) }.distinct
      val brute =
        if (points.isEmpty) 0
        else points.map(t => ivs.count { case (s0, e0) =>
          s0 <= t && t <= e0 }).max
      peak == brute
    }, n = 60)
  }

  test("Theil-Sen slope shrugs off an outlier that drags OLS") {
    // y = 2x on 20 points plus one massive outlier: the median slope
    // stays near 2 while the OLS slope is pulled far away
    val xs = (0 until 20).map(_.toLong)
    val ys = xs.map(_ * 2)
    val (ox, oy) = (30L, 100000L)
    val ax = xs :+ ox
    val ay = ys :+ oy
    val slopes = for {
      i <- ax.indices; j <- ax.indices if ax(i) < ax(j)
    } yield (ay(j) - ay(i)).toDouble / (ax(j) - ax(i)).toDouble
    val sorted = slopes.sorted
    val sen =
      if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
    val n = ax.size.toDouble
    val (sx, sy) = (ax.sum.toDouble, ay.sum.toDouble)
    val sxy = ax.zip(ay).map { case (a, b) => a.toDouble * b }.sum
    val sxx = ax.map(a => a.toDouble * a).sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(sen - 2.0) < 0.5, s"sen=$sen")
    assert(ols > 100, s"ols=$ols should be dragged by the outlier")
  }

  test("MMR selection is more diverse than pure top-k") {
    // on a pool with two tight clusters, the greedy lambda=1/2 MMR pick
    // must have a lower max pairwise similarity than the top-k prefix
    def cosv(a: Seq[Double], b: Seq[Double]): Double = cos(a, b)
    val clusterA = (0 until 5).map(i =>
      Seq(1.0, 0.001 * i, 0.0, 0.0))          // near-dups, highest rel
    val clusterB = (0 until 5).map(i =>
      Seq(0.0, 0.0, 1.0, 0.001 * i))          // orthogonal cluster
    val q = Seq(1.0, 0.0, 0.2, 0.0)
    val pool = (clusterA ++ clusterB).zipWithIndex
      .map { case (v, i) => (i.toLong, v, cosv(v, q)) }
      .sortBy { case (id, _, rel) => (-rel, id) }
    def maxPairSim(sel: Seq[(Long, Seq[Double], Double)]): Double =
      (for { i <- sel.indices; j <- sel.indices if i < j }
        yield cosv(sel(i)._2, sel(j)._2)).max
    val topk = pool.take(3)
    // greedy MMR, k=3
    var sel = Seq(pool.head)
    while (sel.size < 3) {
      val rem = pool.filterNot(p => sel.exists(_._1 == p._1))
      val pick = rem.map { c =>
        val pen = sel.map(s0 => cosv(c._2, s0._2)).max
        (c, 0.5 * c._3 - 0.5 * pen)
      }.maxBy { case (c, m) => (m, -c._1) }._1
      sel = sel :+ pick
    }
    assert(maxPairSim(sel) < maxPairSim(topk),
      s"mmr=${maxPairSim(sel)} topk=${maxPairSim(topk)}")
  }

  /** Writes a minimal documents fixture and returns its directory. */
  private def docsFixture(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, lit}
    val dir = java.nio.file.Files.createTempDirectory("props-docs")
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("corpus_interleave: arithmetic rank is a permutation equal to the global sort, unbalanced sources") {
    // the driver fixture has EQUAL source sizes, which never exercises
    // the min(cnt, r-1) truncation — this fixture does: 5/3/1 docs
    val rows = (1L to 5L).map(i => (i, s"a text $i", "src_a")) ++
      (6L to 8L).map(i => (i, s"b text $i", "src_b")) ++
      Seq((9L, "c text 9", "src_c"))
    val out = operators.Corpus.corpusInterleave
      .fn(spark, docsFixture(rows))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // pos is a permutation of 1..n
    assert(out.map(_._4).sorted.toSeq == (1L to 9L).toSeq)
    // and equals the rank of (src_pos, source) under the global sort —
    // the single-partition plan the arithmetic replaces
    val expected = out.sortBy { case (_, src, r, _) => (r, src) }
      .zipWithIndex.map { case ((id, _, _, _), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, _, _, pos) =>
      assert(pos == expected(id), s"doc $id: pos $pos != ${expected(id)}")
    }
    // round-robin law: every source with >= r docs appears exactly once
    // among any full rotation (positions of rank r form a contiguous run)
    val byRank = out.groupBy(_._3)
    byRank.foreach { case (_, docs) =>
      val ps = docs.map(_._4).sorted
      assert(ps.last - ps.head == ps.length - 1,
        s"rank positions not contiguous: ${ps.mkString(",")}")
    }
  }

  test("dedup_keepfirst: within/cross-doc drops and the NULL digest of a fully-deduped doc") {
    val seg = (1 to 8).map(i => s"w$i").mkString(" ")
    val other = (9 to 16).map(i => s"w$i").mkString(" ")
    // doc 1: segment repeated twice -> the second instance drops
    // doc 2: both segments already seen -> zero kept, digest NULL
    // doc 3: fresh text -> fully kept
    val dir = docsFixture(Seq(
      (1L, s"$seg $seg", "s"), (2L, s"$other $seg", "s"),
      (3L, (17 to 20).map(i => s"w$i").mkString(" "), "s"),
      (4L, other, "s")))
    val out = operators.Dedup.dedupKeepfirst.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.isNullAt(4)))
      .toMap
    assert(out(1L) == ((2L, 1L, 8L, false)))  // second copy dropped in-doc
    assert(out(2L) == ((2L, 1L, 8L, false)))  // 'other' is doc 2's to keep:
    // doc 2 precedes doc 4 and introduces 'other' first globally
    assert(out(3L) == ((1L, 1L, 4L, false)))  // short doc = one segment
    assert(out(4L) == ((1L, 0L, 0L, true)),   // everything seen before
      s"doc 4 should digest to NULL: ${out(4L)}")
    // conservation: total kept across docs = distinct segment count
    assert(out.values.map(_._2).sum == 3) // seg, other, doc-3 text
  }
}
