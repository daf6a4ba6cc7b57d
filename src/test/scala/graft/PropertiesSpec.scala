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
}
