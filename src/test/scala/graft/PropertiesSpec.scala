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
}
