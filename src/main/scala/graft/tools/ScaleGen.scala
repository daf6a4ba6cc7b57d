package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** sf1 fixture generator for the scale soak (docs/SCALE.md).
  *
  * The driver fixtures stop at sf0.1 (/root/repo/TESTDATA.md); the 100 TB
  * claims in the module Scaladocs otherwise rest on plan shape alone. This
  * fans the sf0.1 tables out K× (default 10 → "sf1") with the SAME shape
  * the driver generator uses across its own scale factors (measured in
  * TESTDATA: nation/region constant, events keep their one-month time range
  * while user count and density grow 10×, everything else grows 10×):
  *
  *  - keys shift per replica by each key's own domain size, so foreign
  *    keys stay dense and consistent (orders.o_custkey still lands in
  *    customer, lineitem.l_orderkey in orders, ...);
  *  - document text is word-perturbed per replica (deterministic hash,
  *    ~25% of words) so near-dup candidate growth stays corpus-like — 10
  *    verbatim copies of every doc would inflate posting lists 10× and
  *    candidate pairs 100×, turning the soak's measured exponent into an
  *    artifact of the generator rather than of the plans;
  *  - embeddings get small deterministic per-replica noise for the same
  *    reason (identical vectors collapse every LSH/IVF bucket walk);
  *  - event timestamps get sub-second deterministic jitter so the 10×
  *    densified stream does not contain 10-way exact-tie bursts.
  *
  * Everything is a narrow K-way fan-out (posexplode of a K-array) — no
  * shuffle, no driver-side data; the only collects are one max() per key
  * domain. Output: <dst>/<table>.parquet directories, readable by the
  * same [[graft.Tables]] loaders.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir] [dstDir] [k]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    // mode "docs": realistic-duplication documents-only fixture —
    //   runMain graft.tools.ScaleGen docs <srcDir> <dstDir> <m>
    // default: full-table K-way fan-out —
    //   runMain graft.tools.ScaleGen [srcDir] [dstDir] [k]
    if (args.headOption.contains("docs")) {
      val spark = graft.GraftSession.local()
      generateDocs(spark, args(1), args(2), args(3).toInt)
      spark.stop()
    } else {
      val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
      val dst = args.lift(1).getOrElse("data/sf1")
      val k = args.lift(2).map(_.toInt).getOrElse(10)
      val spark = graft.GraftSession.local()
      generate(spark, src, dst, k)
      spark.stop()
    }
  }

  /** REALISTIC-DUPLICATION document fixture (VERDICT r6 #4): the default
    * K-way fan-out is honest for relational/graph/event tables but makes
    * the documents table degenerate for PAIR-LISTING dedup at large K —
    * every source doc becomes a K-clique of near-dups, so the true pair
    * set grows as K² and a pair query is output-bound by the GENERATOR
    * (docs/SCALE.md "What sf10 is and is not good for").
    *
    * This mode scales the corpus the way real corpora grow: MORE
    * ORIGINALS, small duplicate families. Each source doc spawns `m`
    * distinct originals (heavy ~70% word substitution keyed by the
    * original index — cross-original shingle Jaccard lands far below any
    * dedup threshold), and each original draws a family size from a
    * skewed 1..5 distribution (60% singletons, avg ≈ 1.8; replicas are
    * the standard ~25% perturbation). True near-dup pairs therefore grow
    * LINEARLY with corpus size (≈1.5 per original), so a measured
    * sf-decade exponent on this fixture reflects the PLAN, not the
    * generator. Output: <dst>/documents.parquet only — the dedup family
    * reads nothing else.
    *
    * Everything is the same narrow two-level fan-out discipline as
    * [[generate]]: posexplode of literal arrays, no shuffle, no
    * driver-side data beyond one max(). */
  def generateDocs(spark: SparkSession, src: String, dst: String,
                   m: Int, maxFam: Int = 5): Unit = {
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val docDom =
      documents.agg(F.max(F.col("doc_id"))).head().getLong(0) + 1L
    val fanned = documents
      // level 1: m distinct originals per source doc
      .withColumn("_o", F.explode(F.array((0 until m).map(F.lit): _*)))
      .withColumn("orig_text", F.when(F.col("_o") === 0, F.col("text"))
        .otherwise(F.expr(
          """array_join(transform(split(text, ' '), w ->
               CASE WHEN pmod(hash(w, doc_id, _o, 'orig'), 100) < 70
                    THEN concat(w, '@', _o) ELSE w END), ' ')""")))
      // level 2: skewed family size — 60% singletons, avg ≈ 1.8,
      // max 5 (realistic web-corpus duplication, not a clique)
      .withColumn("_fam", F.expr(
        """CASE pmod(hash(doc_id, _o, 'fam'), 10)
             WHEN 6 THEN 2 WHEN 7 THEN 2 WHEN 8 THEN 3 WHEN 9 THEN 5
             ELSE 1 END"""))
      .withColumn("_d", F.explode(F.array((0 until maxFam).map(F.lit): _*)))
      .filter(F.col("_d") < F.col("_fam"))
    val out = fanned.select(
      // unique, near-dense ids: original stride docDom·m, replica stride 1
      ((F.col("doc_id") + F.col("_o").cast("long") * docDom)
        * maxFam + F.col("_d")).as("doc_id"),
      F.when(F.col("_d") === 0, F.col("orig_text")).otherwise(F.expr(
        """array_join(transform(split(orig_text, ' '), w ->
             CASE WHEN pmod(hash(w, doc_id, _o, _d), 100) < 25
                  THEN concat(w, '~', _d) ELSE w END), ' ')"""))
        .as("text"),
      F.col("lang"), F.col("source"))
      .withColumn("n_chars", F.length(F.col("text")))
    out.write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }

  def generate(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    def rd(name: String): DataFrame =
      if (name == "events") graft.Tables.events(spark, src)
      else spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    /** Domain size of a key column = max+1 (fixture keys are dense from 0
      * or 1), so replica r shifts by r*domain and stays dense. */
    def dom(df: DataFrame, col: String): Long =
      df.agg(F.max(F.col(col))).head().getLong(0) + 1L
    /** K replicas as a narrow fan-out; `_r` is the replica index. */
    def fan(df: DataFrame): DataFrame =
      df.withColumn("_r", F.explode(F.array((0 until k).map(F.lit): _*)))
    def shift(c: String, domain: Long) =
      (F.col(c) + F.col("_r").cast("long") * domain).as(c)

    // dimensions that do NOT scale with sf (TESTDATA pattern)
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    val customer = rd("customer")
    val custDom = dom(customer, "c_custkey")
    wr(fan(customer).select(shift("c_custkey", custDom), F.col("c_name"),
        F.col("c_nationkey"), F.col("c_acctbal"), F.col("c_mktsegment")),
      "customer")

    val supplier = rd("supplier")
    val suppDom = dom(supplier, "s_suppkey")
    wr(fan(supplier).select(shift("s_suppkey", suppDom), F.col("s_name"),
        F.col("s_nationkey"), F.col("s_acctbal")),
      "supplier")

    val part = rd("part")
    val partDom = dom(part, "p_partkey")
    wr(fan(part).select(shift("p_partkey", partDom), F.col("p_name"),
        F.col("p_brand"), F.col("p_type"), F.col("p_size"),
        F.col("p_retailprice")),
      "part")

    val orders = rd("orders")
    val ordDom = dom(orders, "o_orderkey")
    wr(fan(orders).select(shift("o_orderkey", ordDom),
        shift("o_custkey", custDom), F.col("o_orderstatus"),
        F.col("o_totalprice"), F.col("o_orderdate"), F.col("o_orderpriority")),
      "orders")

    wr(fan(rd("lineitem")).select(shift("l_orderkey", ordDom),
        shift("l_partkey", partDom), shift("l_suppkey", suppDom),
        F.col("l_linenumber"), F.col("l_quantity"), F.col("l_extendedprice"),
        F.col("l_discount"), F.col("l_tax"), F.col("l_returnflag"),
        F.col("l_linestatus"), F.col("l_shipdate")),
      "lineitem")

    val events = rd("events")
    val evDom = dom(events, "event_id")
    val userDom = dom(events, "user_id")
    wr(fan(events).select(shift("event_id", evDom),
        // same one-month range, 10× denser; deterministic sub-second jitter
        // breaks the K-way exact ties replication would otherwise create
        F.when(F.col("_r") === 0, F.col("ts")).otherwise(F.expr(
          "ts + make_interval(0,0,0,0,0,0, pmod(hash(event_id,_r),1000)/1000.0)"
        )).as("ts"),
        shift("user_id", userDom), F.col("event_type"), F.col("value"),
        F.col("props")),
      "events")

    val documents = rd("documents")
    val docDom = dom(documents, "doc_id")
    val perturbed = F.expr(
      // replica 0 is the original corpus byte-for-byte; later replicas
      // substitute ~25% of words with replica-specific variants, keeping
      // length/shingle distributions while bounding verbatim duplication
      """array_join(transform(split(text, ' '), w ->
           CASE WHEN pmod(hash(w, doc_id, _r), 100) < 25
                THEN concat(w, '~', _r) ELSE w END), ' ')""")
    wr(fan(documents).select(shift("doc_id", docDom),
        F.when(F.col("_r") === 0, F.col("text")).otherwise(perturbed).as("text"),
        F.col("lang"), F.col("source"), F.col("n_chars"))
        .withColumn("n_chars", F.length(F.col("text"))),
      "documents")

    val embeddings = rd("embeddings")
    val vecDom = dom(embeddings, "vec_id")
    wr(fan(embeddings).select(shift("vec_id", vecDom),
        F.when(F.col("_r") === 0, F.col("embedding")).otherwise(F.expr(
          // ±0.01 deterministic noise per dimension: same cluster geometry,
          // no exact-duplicate vectors
          """transform(embedding, (x, i) ->
               cast(x + pmod(hash(vec_id, _r, i), 1000)/50000.0 - 0.01
                    as float))""")).as("embedding"),
        F.col("label")),
      "embeddings")
  }
}
