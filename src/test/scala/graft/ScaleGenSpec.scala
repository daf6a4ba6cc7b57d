package graft

import org.apache.spark.sql.functions._

/** The realistic-duplication fixture generator (ScaleGen docs mode) is
  * load-bearing for docs/SCALE.md's dedup-decade claims, so its declared
  * properties are locked here: family-size distribution, replica-0
  * fidelity, and the near-dup vs cross-original similarity separation
  * that makes measured exponents reflect plans instead of the generator.
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("scalegen-docs")
    tools.ScaleGen.generateDocs(spark, sf0001, d.toString, m = 4)
    d.toString
  }

  test("family sizes follow the declared skewed 1..5 distribution") {
    // construction key: original = doc_id // 5 (maxFam stride)
    val fams = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy((col("doc_id") / 5).cast("long").as("orig"))
      .agg(count(lit(1)).as("fam"))
      .groupBy("fam").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fams.keySet == Set(1L, 2L, 3L, 5L), s"sizes: $fams")
    val total = fams.values.sum.toDouble
    // 60/20/10/10 within sampling noise of a few hundred originals
    assert(math.abs(fams(1L) / total - 0.6) < 0.08, s"$fams")
    assert(math.abs(fams(2L) / total - 0.2) < 0.06, s"$fams")
  }

  private lazy val docDom: Long =
    Tables.documents(spark, sf0001).agg(max("doc_id")).head().getLong(0) + 1

  test("original 0 replica 0 preserves the source corpus byte-for-byte") {
    val src = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val gen = spark.read.parquet(s"$dir/documents.parquet")
      // the _o=0 block's rep-0 rows carry doc_id' = src_id * 5
      .filter(col("doc_id") % 5 === 0 &&
              col("doc_id") / 5 < lit(docDom))
      .select((col("doc_id") / 5).cast("long").as("doc_id"),
              col("text").as("gen_text"))
    val joined = src.join(gen, "doc_id")
    assert(joined.count() == src.count())
    assert(joined.filter(col("text") =!= col("gen_text")).count() == 0)
  }

  test("within-family token overlap is high, cross-original overlap low") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val withKeys = docs
      .select(col("doc_id"), (col("doc_id") / 5).cast("long").as("orig"),
              col("toks"))
    // replica pairs within one family vs pairs across different originals
    // derived from the same source doc (orig % 500 equal, orig differs)
    val a = withKeys.as("a")
    val b = withKeys.as("b")
    def jac = (size(array_intersect(col("a.toks"), col("b.toks")))
      .cast("double") /
      size(array_union(col("a.toks"), col("b.toks"))))
    val within = a.join(b, col("a.orig") === col("b.orig") &&
        col("a.doc_id") < col("b.doc_id"))
      .agg(avg(jac)).head().getDouble(0)
    val cross = a.join(b,
        col("a.orig") % docDom === col("b.orig") % docDom &&
        col("a.orig") < col("b.orig"))
      .agg(avg(jac)).head().getDouble(0)
    // ~25% perturbation per replica keeps family members similar (two
    // non-zero replicas perturb independently, compounding to ~0.5 set
    // Jaccard); ~70% substitution puts distinct originals far below any
    // dedup threshold — the separation is what the soak needs
    assert(within > 0.45, s"within-family avg jaccard $within")
    assert(cross < 0.3, s"cross-original avg jaccard $cross")
    assert(within - cross > 0.2, s"separation $within vs $cross")
  }
}
