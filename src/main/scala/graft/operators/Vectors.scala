package graft.operators

import graft.PlanUtil.TimedCheckpoint
import graft.{ArtifactCaches, Q, Tables}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (builder prompt
  * north-star; SURVEY.md §2.11): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH bucketed variant as the scale
  * path.
  *
  * Scale posture:
  *  - brute force: one broadcast of the (single-row) query vector, a
  *    narrow per-row cosine projection, then `orderBy(..).limit(k)` which
  *    Catalyst plans as TakeOrderedAndProject — per-partition top-k merged
  *    at the driver; no global sort, no all-to-all shuffle.
  *  - LSH: each vector hashes to an 8-bit bucket via sign(v·hⱼ) against 8
  *    fixed hyperplanes; the query probes its own bucket plus all buckets
  *    within Hamming distance 2 (multiprobe, 37/256). At 100 TB the
  *    bucket column is a partition/cluster key, so a probe reads ~14% of
  *    the data instead of all of it; more planes shrink that fraction.
  *  - IVF: data-dependent cells (nearest centroid) with NProbe-cell reads.
  */
object Vectors {

  private val Dim = 64
  private val NPlanes = 8

  /** Fixed pseudo-random hyperplanes (seeded — deterministic across runs,
    * the "trained" part of the index). */
  private[operators] lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Exact brute-force cosine top-20 against the vec_id=0 query vector. */
  val vectorTopk: Q = Q(
    "vector_topk",
    """WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id, label,
      |  list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
      |  (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv]))) AS cosine
      |FROM e, q
      |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(20)
  }

  /** 8-bit LSH bucket signature for a (double) vector column. Uses the
    * native cosine expression for the sign test (sign(cos) ≡ sign(dot),
    * norms being positive) so bucket assignment stays in codegen instead
    * of 8 interpreted HOF folds per row. */
  private[graft] def bucketOf(v: org.apache.spark.sql.Column) =
    (0 until NPlanes).map { j =>
      val h = typedlit(planes(j))
      when(cosine(v, h) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** Query-side multiprobe offsets: the query's own bucket plus every
    * bucket within Hamming distance 2 (1+8+28 = 37 of the 256 buckets ≈
    * 14% of the corpus — sub-linear, tunable via probe radius). */
  private val probeOffsets: Seq[Int] = 0 +:
    (0 until NPlanes).map(1 << _) ++:
    (for { i <- 0 until NPlanes; j <- (i + 1) until NPlanes }
      yield (1 << i) | (1 << j))

  /** The LSH oracle is full ANSI SQL: the seeded hyperplanes are a fixed
    * trained artifact, so they inline as literals. Each literal routes
    * through CAST('…' AS DOUBLE): DuckDB parses a bare ≥17-significant-
    * digit numeric as DECIMAL first and its DECIMAL→DOUBLE conversion is
    * off by an ulp (docs/ORACLE_PARITY.md), while the VARCHAR→DOUBLE
    * path is correctly-rounded strtod — Double.toString being shortest
    * round-trip, the bits then match Spark's `typedlit` planes exactly.
    * Sign tests and cosines are the same left-fold float arithmetic on
    * both sides, so the hash-compare is exact, like [[vectorTopk]]. */
  /** Render a hyperplane set as DuckDB VALUES rows (each component
    * routed through CAST('…' AS DOUBLE) — see [[lshOracleSql]] for why).
    * The ONE renderer for every plane-inlining oracle (vector_ann_lsh
    * here, dedup_cosine_lsh in [[Dedup]]) — a drifting second copy would
    * silently break one oracle's bit-exact hash compare. */
  private[operators] def planesSql(ps: Seq[Seq[Double]]): String =
    ps.zipWithIndex.map { case (p, j) =>
      s"($j, [${p.map(x => s"CAST('$x' AS DOUBLE)").mkString(",")}])"
    }.mkString(",\n    ")

  private def lshOracleSql: String = {
    val planeRows = planesSql(planes)
    s"""WITH planes AS (SELECT j, pv FROM (VALUES
       |    $planeRows) p(j, pv)),
       |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |eb AS (SELECT vec_id, first(label) AS label, first(v) AS v,
       |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM (SELECT vec_id, label, v, j,
       |               list_sum([v[i]*pv[i] FOR i IN range(1, len(v)+1)]) AS dotp
       |             FROM e CROSS JOIN planes)
       |       GROUP BY vec_id),
       |qb AS (SELECT qv,
       |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS qbucket
       |       FROM (SELECT qv, j,
       |               list_sum([qv[i]*pv[i] FOR i IN range(1, len(qv)+1)]) AS dotp
       |             FROM q CROSS JOIN planes)
       |       GROUP BY qv),
       |probe AS (SELECT qv, xor(qbucket, m) AS bucket
       |          FROM qb CROSS JOIN (SELECT unnest([${probeOffsets.mkString(",")}]) AS m))
       |SELECT vec_id, label,
       |  list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
       |  (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv]))) AS cosine
       |FROM eb JOIN probe USING (bucket)
       |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin
  }

  /** LSH-bucketed approximate top-20 for the same query: probe the 37
    * Hamming-≤2 buckets, exact cosine within the probed set. Oracle =
    * the identical banding computation in DuckDB with the trained
    * hyperplanes inlined ([[lshOracleSql]]); VectorsSpec additionally
    * measures recall vs [[vectorTopk]]. */
  val vectorAnnLsh: Q = Q("vector_ann_lsh", lshOracleSql) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
      .withColumn("qbucket", bucketOf(col("qv")))
      .select(col("qv"), explode(array(probeOffsets.map(m =>
        col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    e.join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"), col("label"), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(20)
  }

  /** The SQL API surface as a driver-visible query: the SAME brute-force
    * top-k as [[vectorTopk]], but authored entirely in `spark.sql` text
    * over a temp view, with the native `cosine_sim` expression resolved
    * through the [[graft.plans.GraftExtensions]] function registry — the
    * path a SQL-first user of this engine takes. Identical oracle,
    * identical plan shape (broadcast single-row query side +
    * TakeOrderedAndProject); hash-equality with the DataFrame variant is
    * the registration-correctness proof. */
  val sqlVectorTopk: Q = Q("sql_vector_topk", vectorTopk.oracle.get) { (s, d) =>
    graft.plans.GraftExtensions.register(s)
    // namespaced view: the session is the user's — don't squat on `emb`
    Tables.embeddings(s, d).createOrReplaceTempView("graft_emb")
    s.sql("""SELECT e.vec_id, e.label, cosine_sim(e.embedding, q.qv) AS cosine
            |FROM graft_emb e CROSS JOIN
            |  (SELECT CAST(embedding AS array<double>) AS qv FROM graft_emb
            |   WHERE vec_id = 0) q
            |WHERE e.vec_id <> 0
            |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin)
  }

  private def knnLshOracleSql(ppt: Int): String =
    s"""WITH ${Dedup.cosLshCandSql("<>", "vec_id", "nn_id", ppt)},
       |r AS (SELECT vec_id, nn_id, cosine,
       |        CAST(row_number() OVER (PARTITION BY vec_id
       |          ORDER BY cosine DESC, nn_id) AS INT) AS nn_rank
       |      FROM cand)
       |SELECT vec_id, nn_rank, nn_id, cosine FROM r WHERE nn_rank <= 3
       |ORDER BY vec_id, nn_rank""".stripMargin

  /** kNN JOIN: every vector's top-3 nearest neighbors — the kNN-graph
    * construction that embedding clustering, semantic dedup, and
    * retrieval-index bootstrapping all start from. Both sides are the
    * full corpus, so unlike [[vectorTopkBatch]] (broadcast query batch)
    * nothing fits in a broadcast: candidates come from the same
    * multi-table sign-LSH as [[Dedup.dedupCosineLsh]] (8 tables × 6
    * bits, OR-of-ANDs), then a per-vector ranked window keeps the top 3.
    *
    * Plan shape at 100 TB: band rows are one narrow codegen pass; the
    * candidate join shuffles keyed by (tbl, sig) with Σ|bucket|² bounded
    * pair work; the rank window shuffles only surviving (id, id, cosine)
    * rows keyed by vec_id. Planes-per-table is the cost knob, tables the
    * recall knob. Vectors whose buckets collide with no one emit no rows
    * (the LSH recall tradeoff — VectorsSpec measures neighbor recall vs
    * the brute-force baseline); the exact-but-quadratic alternative is a
    * guarded all-pairs join like [[Dedup.dedupCosine]]. Oracle: the
    * shared LSH SQL core with both pair orientations + the same ranked
    * window in DuckDB — bit-exact cosines, deterministic nn_id
    * tie-break. */
  val knnJoinLsh: Q = Q(
    "knn_join_lsh",
    knnLshOracleSql(6)
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // bits-per-table AUTO-SIZES from the corpus footer count — max(6,
    // ⌈log2(n/16)⌉) (Dedup.cosLshPpt), the rule docs/SCALE.md measured
    // (exponent 1.28 at a fixed 6 bits at sf1, 0.79 once sized, 0.75
    // across sf1→sf10 at auto 14 bits); `graft.lsh.planesPerTable`
    // is the explicit override, and the oracle re-renders post-run from
    // the width actually used
    val bands = Dedup.cosLshBands(e, Dedup.cosLshPpt(s, d))
    // each unordered pair pays its cosine ONCE (a < b, as in
    // dedupCosineLsh), then both directed edges emit from a one-pass
    // explode — bit-exact vs the oracle's <> join because cosine is
    // symmetric at the bit level (per-term products and the norm product
    // commute). r12: candidates come from the same (tbl, sig)-bucketed
    // collect_list + OrderedPairs shape as dedupCosineLsh (bands
    // computed and shuffled once, no self-join sort; array_sort keeps
    // the a < b orientation and operand order, cosines bit-identical).
    val buckets = bands
      .groupBy("tbl", "sig")
      .agg(array_sort(collect_list(
        struct(col("vec_id"), col("v"), col("nrm")))).as("docs"))
      .filter(size(col("docs")) >= 2)
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("docs"))))
    }
    val cand = buckets
      .select(pairGen.as(Seq("va", "v_a", "na", "vb", "v_b", "nb")))
      // cosine BEFORE the pair dedup, as in dedupCosineLsh: multi-table
      // re-collisions re-verify map-side, the exchange carries only
      // (id, id, cosine)
      .select(col("va"), col("vb"),
              (dotNative(col("v_a"), col("v_b")) /
                (col("na") * col("nb"))).as("c"))
      .select(explode(array(
        struct(col("va").as("vec_id"), col("vb").as("nn_id"),
               col("c").as("cosine")),
        struct(col("vb").as("vec_id"), col("va").as("nn_id"),
               col("c").as("cosine")))).as("e"))
      .select(col("e.vec_id").as("vec_id"), col("e.nn_id").as("nn_id"),
              col("e.cosine").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cosine"), asc("nn_id"))
    // pair dedup FUSED into the ranking pass: a duplicate (the same pair
    // re-colliding in another table) has bit-identical (cosine, nn_id),
    // so duplicates are ADJACENT in the window order and a lag probe
    // marks all but the first — one vec_id-keyed exchange total, instead
    // of a full-candidate (vec_id, nn_id) dedup shuffle followed by the
    // window shuffle (with the half-join above: 5.4s → 3.5s at sf0.1).
    // The rank window after the filter reuses the same partitioning and
    // sort.
    cand
      .withColumn("dup",
        lag(col("nn_id"), 1).over(w) === col("nn_id") &&
        lag(col("cosine"), 1).over(w) === col("cosine"))
      .filter(!coalesce(col("dup"), lit(false)))
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= 3)
      .select(col("vec_id"), col("nn_rank"), col("nn_id"), col("cosine"))
  }.copy(oracleGen = Some(() => Some(knnLshOracleSql(
    Dedup.lastCosLshPpt.get().getOrElse(6)))))

  private val IvfK = 16
  private val IvfIters = 5
  private val IvfSampleCap = 4096
  private val IvfNProbe = 3

  /** Seeded spherical k-means (Lloyd's iterations over L2-normalized
    * vectors, cosine ≡ dot): the IVF "training" step. Runs driver-side
    * over a BOUNDED sample — that is the textbook shape (IVF indexes
    * train on a sample; only the assignment pass touches the full
    * corpus), so the collect is capped, not a scale leak. Deterministic:
    * the sample order seeds the initial centroids and the iteration count
    * is fixed, so the same corpus always yields the same index. */
  private[graft] def trainCentroids(sample: Array[Array[Double]],
                                    k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val xs = sample.map(normalize)
    val kk = k.min(xs.length)
    // deterministic farthest-first (maxmin) seeding: start from the first
    // sample point, then repeatedly take the point least similar to any
    // chosen seed — one seed per well-separated cluster, unlike take(k),
    // which can drop several seeds into one cluster that Lloyd's never
    // splits apart
    val seeds = scala.collection.mutable.ArrayBuffer(xs(0))
    val maxSim = xs.map(dot(_, xs(0))).toArray
    while (seeds.length < kk) {
      val next = maxSim.indices.minBy(maxSim(_))
      seeds += xs(next)
      var i = 0
      while (i < xs.length) {
        val s = dot(xs(i), xs(next))
        if (s > maxSim(i)) maxSim(i) = s
        i += 1
      }
    }
    var cents = seeds.toArray
    for (_ <- 0 until iters) {
      val dim = xs(0).length
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      xs.foreach { x =>
        var best = 0; var bestDot = Double.NegativeInfinity; var j = 0
        while (j < kk) {
          val dj = dot(x, cents(j))
          if (dj > bestDot) { bestDot = dj; best = j }
          j += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = (0 until kk).map { j =>
        if (counts(j) == 0) cents(j) else normalize(sums(j))
      }.toArray
    }
    cents
  }

  /** Train IVF centroids for an embedding frame (`v` = array<double>).
    * The sample is a deterministic hash filter (narrow predicate — no
    * sort, no full scan materialized) capped at [[IvfSampleCap]] rows.
    * EAGER: the collect runs Spark jobs at plan-build time — callers of
    * [[vectorAnnIvf]] see `Q.eager = true`. Training is memoized per
    * cache key (training is deterministic for a given corpus), so only
    * the first build of an index pays. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Cache key of the most recently trained keyed index — consumed by
    * [[ivfOracleSql]]'s post-run oracle generator. */
  @volatile private var lastIvfKey: Option[String] = None

  /** See [[Tables.fingerprint]] — keyed to the embeddings table. */
  private[graft] def embeddingsFingerprint(s: SparkSession, dir: String): String =
    Tables.fingerprint(s, dir, "embeddings")

  /** Raw trained centroid arrays (the artifact itself — for native
    * assignment expressions and post-run oracle rendering); memoized per
    * cache key like every trained index. */
  private[operators] def ivfCentroidArrays(emb: DataFrame, k: Int = IvfK,
      cacheKey: Option[String] = None): Array[Array[Double]] = {
    def train(): Array[Array[Double]] = {
      val sample = emb.select(col("v"))
        .filter(pmod(xxhash64(col("vec_id")), lit(7)) === 0)
        .limit(IvfSampleCap)
        .collect().map(_.getSeq[Double](0).toArray)
      trainCentroids(
        if (sample.nonEmpty) sample
        else emb.select(col("v")).limit(IvfSampleCap)
               .collect().map(_.getSeq[Double](0).toArray),
        k, IvfIters)
    }
    cacheKey match {
      case Some(key) =>
        val c = ArtifactCaches.memo("vectors.ivf", centroidCache)(
          s"$key#$k")(_ => train())
        lastIvfKey = Some(s"$key#$k")
        c
      case None => train()
    }
  }

  /** The most recently trained (or cache-served) IVF centroids — the
    * shared artifact behind every centroid-inlined generated oracle. */
  private[operators] def cachedIvfCentroids: Option[Array[Array[Double]]] =
    lastIvfKey.flatMap(k => Option(centroidCache.get(k)))

  private[graft] def ivfCentroids(emb: DataFrame, k: Int = IvfK,
                                  cacheKey: Option[String] = None): DataFrame = {
    val cents = ivfCentroidArrays(emb, k, cacheKey)
    val spark = emb.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "cv")
  }

  /** Nearest-centroid cell per vector: broadcast the k centroids, one
    * narrow pass, `max_by` picks the cell — the full-corpus assignment
    * step of an IVF build. */
  private[graft] def assignCells(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), cosine(col("v"), col("cv"))).as("cell"),
           first(col("label")).as("label"), first(col("v")).as("v"))

  /** The query's `nProbe` nearest cells (+ the query vector itself). */
  private[graft] def probeCells(q: DataFrame, centroids: DataFrame,
                                nProbe: Int): DataFrame =
    q.crossJoin(broadcast(centroids))
      .select(col("qv"), col("cid"), cosine(col("qv"), col("cv")).as("csim"))
      .orderBy(desc("csim"), asc("cid")).limit(nProbe)
      .select(col("cid").as("cell"), col("qv"))

  /** DuckDB mirror of the IVF query with the TRAINED centroids inlined
    * as literals — rendered post-run (training is deterministic per
    * corpus, so the centroids ARE a fixed artifact of the run, exactly
    * like the seeded LSH planes; they just aren't known until the query
    * has trained). Same CAST('…' AS DOUBLE) literal route and the same
    * left-fold cosine as [[lshOracleSql]], so assignment (`arg_max` ≡
    * Spark `max_by`), probe, and the final ranking hash-compare
    * bit-exactly. */
  /** The one DuckDB cosine renderer for centroid-inlined oracles — the
    * same left-fold float arithmetic as the native `cosine_sim`
    * expression, bit-exact (docs/ORACLE_PARITY.md). */
  private[operators] def cosSql(a: String, b: String): String =
    s"list_sum([$a[i]*$b[i] FOR i IN range(1, len($a)+1)]) / " +
      s"(sqrt(list_sum([x*x FOR x IN $a])) * sqrt(list_sum([x*x FOR x IN $b])))"

  private[operators] def ivfOracleSql(cents: Seq[Seq[Double]]): String = {
    def cos(a: String, b: String) = cosSql(a, b)
    s"""WITH cents AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(cents)}) c(j, pv)),
       |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |asg AS (SELECT vec_id, arg_max(cid, cs) AS cell,
       |          first(label) AS label, first(v) AS v
       |        FROM (SELECT vec_id, label, v, cid, ${cos("v", "cv")} AS cs
       |              FROM e CROSS JOIN cents)
       |        GROUP BY vec_id),
       |probe AS (SELECT cid AS cell, qv
       |          FROM (SELECT qv, cid, ${cos("qv", "cv")} AS cs
       |                FROM q CROSS JOIN cents)
       |          ORDER BY cs DESC, cid LIMIT $IvfNProbe)
       |SELECT vec_id, label, ${cos("v", "qv")} AS cosine
       |FROM asg JOIN probe USING (cell)
       |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin
  }

  /** IVF (inverted-file) ANN: coarse-quantize every vector to its
    * nearest centroid cell, probe only the query's `IvfNProbe` nearest
    * cells. Centroids come from seeded spherical k-means over a bounded
    * deterministic sample ([[trainCentroids]]) — data-adaptive, so cells
    * track the corpus's cluster structure instead of a blind modulo
    * sample. Plan shape at 100 TB: the n×k assignment is a broadcast of k
    * centroids over one narrow pass; `cell` becomes a partition/cluster
    * key so a probe reads NProbe/k of the data (DedupSpec proves the
    * partition prune on a persisted index). Oracle: [[ivfOracleSql]],
    * generated after training — the full pipeline (assignment, probe,
    * ranking) is value-checked, not rows-only. */
  val vectorAnnIvf: Q = Q.noOracle("vector_ann_ivf") { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val centroids = ivfCentroids(emb.filter(col("vec_id") =!= 0),
                                 cacheKey = Some(embeddingsFingerprint(s, d)))
    val cells = assignCells(emb.filter(col("vec_id") =!= 0), centroids)
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    cells.join(broadcast(probeCells(q, centroids, IvfNProbe)), Seq("cell"))
      .select(col("vec_id"), col("label"),
              cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(20)
  }.copy(
    eager = true, // index training collects a sample at plan-build
    oracleGen = Some(() =>
      cachedIvfCentroids.map(cs => ivfOracleSql(cs.map(_.toSeq).toSeq))))

  /** DuckDB mirror of [[vectorIndexStats]]: the same trained-centroid
    * inlining and `arg_max` assignment as [[ivfOracleSql]], then
    * per-cell stats over integer-milli quantized member→centroid
    * cosines. */
  private def indexStatsOracleSql(cents: Seq[Seq[Double]]): String =
    s"""WITH cents AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(cents)}) c(j, pv)),
       |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |asg AS (SELECT vec_id, arg_max(cid, cs) AS cell, first(v) AS v
       |        FROM (SELECT vec_id, v, cid, ${cosSql("v", "cv")} AS cs
       |              FROM e CROSS JOIN cents)
       |        GROUP BY vec_id),
       |m AS (SELECT a.cell,
       |        CAST(floor(1000 * (${cosSql("a.v", "c.cv")})) AS BIGINT) AS mc
       |      FROM asg a JOIN cents c ON a.cell = c.cid)
       |SELECT CAST(cell AS INT) AS cell, count(*) AS n_vectors,
       |  CAST(min(mc) AS BIGINT) AS min_mcos,
       |  CAST(max(mc) AS BIGINT) AS max_mcos,
       |  CAST(sum(mc) AS DOUBLE) / count(*) AS mean_mcos
       |FROM m GROUP BY 1 ORDER BY cell""".stripMargin

  /** IVF index health census — the observability query an ANN serving
    * team runs after every index build: per cell, the member count
    * (balance: a mega-cell means probes over-read, empties mean wasted
    * centroids) and the min/max/mean cosine of members to their OWN
    * centroid (cohesion: a low mean flags a cell whose members the
    * centroid represents badly — the quantization-error signal that
    * triggers re-training). Cosines are quantized to integer millis
    * BEFORE aggregation (the text_perplexity discipline), so sums are
    * exact BIGINTs — order-independent at any parallelism — and the mean
    * is one exact int/int division. Plan: the same broadcast n×k
    * assignment pass as [[vectorAnnIvf]] plus one partial+final
    * aggregate keyed by cell; nothing corpus-sized shuffles. Oracle:
    * [[indexStatsOracleSql]], rendered post-run from the same memoized
    * centroids the query trained. */
  val vectorIndexStats: Q = Q.noOracle("vector_index_stats") { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") =!= 0)
    val centroids = ivfCentroids(emb,
                                 cacheKey = Some(embeddingsFingerprint(s, d)))
    assignCells(emb, centroids)
      .join(broadcast(centroids), col("cell") === col("cid"))
      .select(col("cell"),
        floor(lit(1000) * cosine(col("v"), col("cv"))).cast("long").as("mc"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
           min(col("mc")).as("min_mcos"), max(col("mc")).as("max_mcos"),
           (sum(col("mc")).cast("double") / count(lit(1))).as("mean_mcos"))
      .select(col("cell").cast("int").as("cell"), col("n_vectors"),
              col("min_mcos"), col("max_mcos"), col("mean_mcos"))
  }.copy(
    eager = true, // shares the trained-centroid cache with vectorAnnIvf
    oracleGen = Some(() =>
      cachedIvfCentroids.map(cs => indexStatsOracleSql(cs.map(_.toSeq).toSeq))))

  /** Batched exact top-3 neighbors for a SET of query vectors (vec_id <
    * 5) — the realistic ANN serving shape (queries arrive in batches, not
    * one at a time). Plan: broadcast the query batch, one narrow cosine
    * pass, per-query top-k via ranked window (shuffle keyed by query id). */
  val vectorTopkBatch: Q = Q(
    "vector_topk_batch",
    """WITH q AS (SELECT vec_id AS q_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings WHERE vec_id >= 5),
      |s AS (SELECT q.q_id, e.vec_id,
      |        list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
      |        (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv]))) AS cosine
      |      FROM e, q),
      |r AS (SELECT q_id, vec_id, cosine,
      |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      |      FROM s)
      |SELECT q_id, vec_id, cosine, CAST(rn AS INT) AS rn
      |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
    val e = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("vec_id"))
    e.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Symmetric int8 quantization of the embedding column — the standard
    * 4× storage/bandwidth shrink for a 100 TB vector corpus (serve int8,
    * rescale on read): scale = max|v|/127, qᵢ = ⌊vᵢ/scale + ½⌋. Uses
    * floor(x+0.5) rather than round() because round's half-up/half-even
    * behavior is engine-specific while floor is exact in both engines.
    * Narrow projection, zero shuffles; max_err is the per-vector
    * dequantization error bound (≤ scale/2), computed in the same pass.
    * Output stringifies the int8 array ('|' join — driver-compare
    * limitation on array columns). */
  val vectorQuantize: Q = Q(
    "vector_quantize",
    """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) / 127 AS scale FROM e),
      |q AS (SELECT vec_id, v, scale,
      |        CASE WHEN scale = 0 THEN [CAST(0 AS INT) FOR x IN v]
      |             ELSE [CAST(floor(x / scale + 0.5) AS INT) FOR x IN v]
      |        END AS q8 FROM m)
      |SELECT vec_id, scale,
      |  array_to_string(q8, '|') AS q8,
      |  list_max([abs(q8[i] * scale - v[i]) FOR i IN range(1, len(v)+1)]) AS max_err
      |FROM q ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("scale", array_max(transform(col("v"), abs(_))) / 127)
      // zero-vector guard: scale 0 would make x/scale NaN and the ANSI
      // int cast abort the whole job for one degenerate row — emit
      // all-zero codes instead (max_err is then trivially 0)
      .withColumn("q8",
        when(col("scale") === 0,
          transform(col("v"), _ => lit(0)))
        .otherwise(transform(col("v"),
          x => floor(x / col("scale") + 0.5).cast("int"))))
    e.select(
      col("vec_id"), col("scale"),
      array_join(col("q8"), "|").as("q8"),
      array_max(zip_with(col("q8"), col("v"),
        (q, x) => abs(q * col("scale") - x))).as("max_err")
    )
  }

  /** Per-DIMENSION embedding health census — the pre-indexing audit a
    * vector corpus gets before anyone trains IVF/PQ on it: for each of
    * the 64 dimensions, the count, exact quantized sum and sum-of-squares
    * (mean/variance derive exactly), the min/max, and how many values sit
    * within ±0.01 of zero. Dead dimensions (all near zero), rogue
    * dimensions (extreme max), and collapsed variance all show up here —
    * the failure modes that silently ruin PQ codebooks and cosine
    * separability. Parity discipline: every value is quantized ONCE to
    * integer milli-units (`floor(1000·x)`, exact in IEEE doubles on both
    * engines) and all aggregates are then BIGINT sums — order-independent
    * and engine-exact, the integer-sufficient-statistics idiom the DQ
    * family uses.
    *
    * Plan: posexplode to (dim, q) — a 64× narrow fan-out of a 2-column
    * projection — then one partial+final aggregation on the 64-value
    * `dim` key. Output is O(dims) rows regardless of corpus size; at
    * 100 TB this is a single map-combine pass. */
  val vectorDimStats: Q = Q(
    "vector_dim_stats",
    """WITH x AS (SELECT CAST(i AS INT) AS dim,
      |  CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS BIGINT) AS q
      |  FROM embeddings CROSS JOIN range(1, 65) t(i))
      |SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(q) AS BIGINT) AS sum_milli,
      |  CAST(sum(q * q) AS BIGINT) AS sumsq_milli,
      |  min(q) AS min_milli, max(q) AS max_milli,
      |  CAST(sum(CASE WHEN abs(q) <= 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_near_zero
      |FROM x GROUP BY dim ORDER BY dim""".stripMargin
  ) { (s, d) =>
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("int").as("dim"),
        floor(lit(1000) * col("x").cast("double")).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_milli"),
        sum(col("q") * col("q")).as("sumsq_milli"),
        min(col("q")).as("min_milli"), max(col("q")).as("max_milli"),
        sum(when(abs(col("q")) <= 10, 1).otherwise(0)).as("n_near_zero"))
  }

  /** Embedding-distribution DRIFT between two index generations — the
    * vector-space sibling of the dq drift triad: per dimension, the
    * mean of the even-id generation vs the odd-id generation and the
    * absolute shift in micro-units. A re-embedded corpus (new encoder
    * checkpoint) whose per-dimension means move is the canonical "ANN
    * index must be retrained" signal; this is the query that fires
    * before recall silently degrades.
    *
    * Exactness under the engine-parity rules: values quantize once to
    * milli-units OFFSET BY +1000 so every sum stays nonnegative —
    * Spark's `div` truncates toward zero while DuckDB's `//` floors,
    * and they agree only on nonnegative operands (the attributionLinear
    * discipline); the offset cancels in the subtraction AFTER the
    * division. One posexplode + one dim-keyed partial+final aggregate —
    * the [[vectorDimStats]] plan with a generation split riding as
    * conditional sums. */
  val vectorCentroidDrift: Q = Q(
    "vector_centroid_drift",
    """WITH x AS (SELECT vec_id % 2 AS gen, CAST(i AS INT) AS dim,
      |    CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE))
      |         AS BIGINT) + 1000 AS q
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |g AS (SELECT dim,
      |    CAST(sum(CASE WHEN gen = 0 THEN q END) AS BIGINT) AS sum0,
      |    CAST(count(CASE WHEN gen = 0 THEN 1 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN gen = 1 THEN q END) AS BIGINT) AS sum1,
      |    CAST(count(CASE WHEN gen = 1 THEN 1 END) AS BIGINT) AS n1
      |  FROM x GROUP BY dim)
      |SELECT dim, n0, n1,
      |  (sum0 * 1000) // n0 - 1000000 AS mean0_micro,
      |  (sum1 * 1000) // n1 - 1000000 AS mean1_micro,
      |  abs((sum0 * 1000) // n0 - (sum1 * 1000) // n1) AS drift_micro
      |FROM g WHERE n0 > 0 AND n1 > 0 ORDER BY dim""".stripMargin
  ) { (s, d) =>
    val m0 = expr("(sum0 * 1000) div n0")
    val m1 = expr("(sum1 * 1000) div n1")
    Tables.embeddings(s, d)
      .select((col("vec_id") % 2).as("gen"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("gen"), (col("pos") + 1).cast("int").as("dim"),
        (floor(lit(1000) * col("x").cast("double")).cast("long") + 1000)
          .as("q"))
      .groupBy("dim")
      .agg(sum(when(col("gen") === 0, col("q"))).as("sum0"),
        count(when(col("gen") === 0, 1)).as("n0"),
        sum(when(col("gen") === 1, col("q"))).as("sum1"),
        count(when(col("gen") === 1, 1)).as("n1"))
      // degenerate-corpus guard (ADVICE r7): on a single-parity corpus one
      // generation is empty — DuckDB's // raises division-by-zero while
      // Spark's div yields NULL; excluding empty generations keeps both
      // engines on the same (defined) arithmetic, like dq_profile_drift
      .filter(col("n0") > 0 && col("n1") > 0)
      .select(col("dim"), col("n0"), col("n1"),
        (m0 - 1000000).as("mean0_micro"),
        (m1 - 1000000).as("mean1_micro"),
        abs(m0 - m1).as("drift_micro"))
  }

  /** Per-label embedding centroid (class prototypes — the building block
    * for centroid classification, cluster drift monitoring, and IVF
    * seeding): mean of each dimension over the label's vectors.
    * Plan: posexplode to (label, dim, x) rows — a 64× narrow fan-out —
    * then one partial+final aggregation keyed by (label, dim); dim count
    * is fixed, so group count = labels × 64 regardless of corpus size.
    * Parity note: a plain `avg` sums floating point in partition order,
    * which differs between engines in the last ulp; for the oracle gate
    * the sum is a LEFT FOLD OVER THE SORTED VALUE LIST in both engines —
    * bit-exact. At 100 TB call [[centroidFast]] instead (plain `avg`,
    * partial+final, no collect_list; production centroids don't need
    * last-ulp determinism — PropertiesSpec proves 1e-9 agreement). */
  val vectorCentroid: Q = Q(
    "vector_centroid",
    """WITH x AS (SELECT label, i,
      |  CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN range(1, 65) t(i))
      |SELECT label, CAST(i AS INT) AS dim,
      |  CAST(count(*) AS BIGINT) AS n,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(x))),
      |              (acc, v) -> acc + v) / count(*) AS m
      |FROM x GROUP BY label, i ORDER BY label, dim""".stripMargin
  ) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("label"), (col("pos") + 1).as("dim"),
              col("xf").cast("double").as("x"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("x"))).as("xs"))
      .select(col("label"), col("dim").cast("int").as("dim"), col("n"),
        (aggregate(col("xs"), lit(0.0), (acc, v) => acc + v) / col("n"))
          .as("m"))
  }

  /** One exact Lloyd (k-means) iteration from deterministic seeds — the
    * training step IVF coarse quantizers run repeatedly: assign every
    * vector to its nearest seed, then report the per-cluster census an
    * index trainer reads before the next iteration — member count,
    * posting share (the IMBALANCE diagnostic: a skewed share_ppm means
    * skewed posting lists and ragged probe latency), mean squared
    * distance (the inertia term k is chosen by), and how far the
    * recomputed centroid moved from its seed (the convergence signal).
    * Seeds are the k=8 lowest `vec_id`s — deterministic, no RNG.
    *
    * Exactness: the [[vectorCentroidDrift]] discipline — components
    * quantize ONCE to offset milli-units (floor(1000x)+1000, nonnegative
    * so floor-div conventions agree), distances are exact BIGINT sums of
    * squares, the argmin tie-breaks on seed id (min-struct in Spark ≡
    * the oracle's min-join), and per-cluster sums widen to
    * DECIMAL(38,0)/HUGEINT before the floor-div means so a 10¹²-vector
    * cluster cannot wrap int64. All outputs ship as BIGINT.
    *
    * Plan: ONE pass builds the (vec_id, dim, q) frame; the seed frame is
    * 8×64 rows and BROADCASTS to both the assignment join (the O(n·k·d)
    * kmeans kernel, partial-aggregated on (vec_id, seed) map-side) and
    * the drift join; everything downstream is keyed by vec_id or seed —
    * no corpus-sized exchange beyond the two keyed aggregates. */
  val vectorKmeansStep: Q = Q(
    "vector_kmeans_step",
    """WITH q AS (SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE))
      |         AS BIGINT) + 1000 AS q
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |sid AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
      |sq AS (SELECT q.vec_id AS seed, q.dim, q.q AS sq
      |       FROM q JOIN sid ON q.vec_id = sid.vec_id),
      |d AS (SELECT q.vec_id, sq.seed,
      |        CAST(sum((q.q - sq.sq) * (q.q - sq.sq)) AS BIGINT) AS d2
      |      FROM q JOIN sq ON q.dim = sq.dim GROUP BY 1, 2),
      |m AS (SELECT vec_id, min(d2) AS best FROM d GROUP BY 1),
      |asg AS (SELECT d.vec_id, min(d.seed) AS seed, min(d.d2) AS d2
      |        FROM d JOIN m ON d.vec_id = m.vec_id AND d.d2 = m.best
      |        GROUP BY 1),
      |cm AS (SELECT a.seed, q.dim,
      |         (1000 * sum(q.q)) // count(*) AS mean_micro
      |       FROM asg a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2),
      |dr AS (SELECT cm.seed,
      |         CAST(sum(abs(cm.mean_micro - 1000 * sq.sq)) AS BIGINT)
      |           AS drift
      |       FROM cm JOIN sq ON sq.seed = cm.seed AND sq.dim = cm.dim
      |       GROUP BY 1),
      |c AS (SELECT seed, CAST(count(*) AS BIGINT) AS n, sum(d2) AS inertia
      |      FROM asg GROUP BY 1)
      |SELECT c.seed AS cluster, c.n,
      |  CAST((1000000 * c.n) // (SELECT count(*) FROM embeddings)
      |       AS BIGINT) AS share_ppm,
      |  CAST(c.inertia // c.n AS BIGINT) AS mean_d2,
      |  dr.drift AS drift_micro
      |FROM c JOIN dr ON dr.seed = c.seed ORDER BY cluster""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables.embeddings(s, d)
    val q = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        (floor(lit(1000) * col("x").cast("double")).cast("long") + 1000)
          .as("q"))
    val sid = emb.select(col("vec_id").as("svid")).orderBy("svid").limit(8)
    val sq = q.join(broadcast(sid), col("vec_id") === col("svid"))
      .select(col("svid").as("seed"), col("dim"), col("q").as("sq"))
    val dist = q.join(broadcast(sq), Seq("dim"))
      .groupBy("vec_id", "seed")
      .agg(sum((col("q") - col("sq")) * (col("q") - col("sq"))).as("d2"))
    val asg = dist.groupBy("vec_id")
      .agg(min(struct(col("d2"), col("seed"))).as("b"))
      .select(col("vec_id"), col("b.seed").as("seed"), col("b.d2").as("d2"))
    val c = asg.groupBy("seed")
      .agg(count(lit(1)).as("n"),
           sum(col("d2").cast(DecimalType(38, 0))).as("inertia"))
    val cm = asg.join(q, Seq("vec_id"))
      .groupBy("seed", "dim")
      .agg(sum(col("q")).cast(DecimalType(38, 0)).as("sum_q"),
           count(lit(1)).as("cn"))
      .select(col("seed"), col("dim"),
        expr("(1000 * sum_q) div cn").as("mean_micro"))
    val dr = cm.join(broadcast(sq), Seq("seed", "dim"))
      .groupBy("seed")
      .agg(sum(abs(col("mean_micro") - lit(1000) * col("sq"))).as("drift"))
    val tot = emb.agg(count(lit(1)).as("tot"))
    c.join(broadcast(dr), Seq("seed")).crossJoin(broadcast(tot))
      .select(col("seed").as("cluster"), col("n"),
        expr("(1000000 * n) div tot").cast("long").as("share_ppm"),
        expr("inertia div n").cast("long").as("mean_d2"),
        col("drift").cast("long").as("drift_micro"))
  }

  /** LABEL-COHERENCE AUDIT via nearest-centroid classification — the
    * label-quality census a curated embedding corpus runs before
    * trusting its labels for supervised work (and the evaluation half of
    * centroid classification): per label, how many member vectors sit
    * closer to ANOTHER label's centroid than their own, and the mean
    * own-centroid distance. High misassignment marks label noise or
    * collapsed classes; this fixture's near-isotropic labels score high
    * — which is the honest readout, reported per label.
    *
    * Exactness: components quantize ONCE to offset milli-units
    * (floor(1000x) + 1000 — nonnegative, the [[vectorCentroidDrift]]
    * discipline, so the centroid floor-division agrees between Spark's
    * truncating `div` and DuckDB's flooring `//`; the offset cancels in
    * the (vector − centroid) difference). Centroids are micro-unit
    * integers, distances are exact BIGINT sums of squares, and the
    * argmin tie-breaks on label — bit-deterministic end to end. The
    * per-label distance sum widens internally (HUGEINT on DuckDB,
    * DECIMAL(38,0) on Spark — 1e12 vectors × ~2.6e14 per-vector
    * distance clears int64) and ships as the floor-div mean, BIGINT;
    * the division stays in the exact wide-integer domain on both
    * engines (a DECIMAL `//` would round at scale-0 before flooring).
    *
    * Plan: one posexplode → (label, dim) partial+final aggregate (a
    * |labels|×64-row frame) → centroid ARRAYS rebuilt per label and
    * broadcast — the corpus then streams through ONE narrow projection
    * with a 10-row broadcast cross (per-vector work = |labels| codegen
    * dot-kernels, no shuffle) and a vector-keyed argmin aggregate whose
    * key count equals the corpus, partial+final. At 100 TB: corpus
    * touched twice (centroid pass + audit pass), nothing else grows. */
  val vectorLabelCoherence: Q = Q(
    "vector_label_coherence",
    """WITH q AS (SELECT vec_id, label,
      |    [CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT) + 1000
      |     FOR x IN embedding] AS qv
      |  FROM embeddings),
      |dq AS (SELECT label AS clabel, i AS dim, qv[i] AS v
      |       FROM q CROSS JOIN range(1, 65) t(i)),
      |cd AS (SELECT clabel, dim,
      |         (1000 * CAST(sum(v) AS BIGINT)) // count(*) AS c
      |       FROM dq GROUP BY 1, 2),
      |ca AS (SELECT clabel, list(c ORDER BY dim) AS carr
      |       FROM cd GROUP BY 1),
      |dist AS (SELECT q.vec_id, q.label, ca.clabel,
      |    list_sum([(1000 * q.qv[i] - ca.carr[i])
      |              * (1000 * q.qv[i] - ca.carr[i])
      |              FOR i IN range(1, 65)]) AS d
      |  FROM q CROSS JOIN ca),
      |pv AS (SELECT vec_id, label,
      |    min(d * 16 + clabel) % 16 AS nearest,
      |    min(CASE WHEN clabel = label THEN d END) AS own_d
      |  FROM dist GROUP BY 1, 2)
      |SELECT label, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(CASE WHEN nearest <> label THEN 1 END) AS BIGINT)
      |    AS n_misassigned,
      |  CAST((1000000 * count(CASE WHEN nearest <> label THEN 1 END))
      |       // count(*) AS BIGINT) AS mis_ppm,
      |  CAST(sum(own_d) // count(*) AS BIGINT) AS mean_own_dist
      |FROM pv GROUP BY label ORDER BY label""".stripMargin
  ) { (s, d) =>
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(toDouble(col("embedding")),
          x => floor(x * 1000).cast("long") + 1000).as("qv"))
    val cents = q
      .select(col("label").as("clabel"),
        posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("clabel"), (col("pos") + 1).as("dim"))
      .agg(expr("(1000 * sum(v)) div count(*)").as("c"))
      .groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        e => e.getField("c")).as("carr"))
    val dist = q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        aggregate(
          zip_with(col("qv"), col("carr"),
            (a, b) => (a * 1000 - b) * (a * 1000 - b)),
          lit(0L), (acc, v) => acc + v).as("d"))
    // integer-encoded argmin (labels < 16, d < 2^48): min(d*16 + label)
    // carries the tie-break in the low bits — no struct-ordering
    // portability surface, same exact answer on both engines
    val pv = dist.groupBy("vec_id", "label")
      .agg((min(col("d") * 16 + col("clabel")) % 16).as("nearest"),
           min(when(col("clabel") === col("label"), col("d"))).as("own_d"))
    pv.groupBy("label")
      .agg(count(lit(1)).as("n"),
        count(when(col("nearest") =!= col("label"), 1)).as("n_misassigned"),
        sum(col("own_d"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("sd"))
      .select(col("label"), col("n"), col("n_misassigned"),
        expr("(1000000 * n_misassigned) div n").cast("long").as("mis_ppm"),
        expr("sd div n").cast("long").as("mean_own_dist"))
  }

  /** PRODUCTION centroid path: the same (label, dim, n, m) frame as
    * [[vectorCentroid]] but with a plain `avg` — partial+final hash
    * aggregation, map-side combine, NO per-group collect_list — at the
    * cost of last-ulp float determinism (avg accumulates in partition
    * order). This is the path to run at 100 TB; the oracle query keeps
    * the sorted fold only because the driver's hash compare needs
    * bit-exact doubles. PropertiesSpec asserts both paths agree to 1e-9
    * relative on every (label, dim). */
  def centroidFast(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("label"), (col("pos") + 1).cast("int").as("dim"),
              col("xf").cast("double").as("x"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), avg(col("x")).as("m"))

  // ---- Product quantization (Jégou et al. 2011: split the vector into
  // M subspaces, k-means each, represent every vector as M codebook
  // indices; search via asymmetric distance computation (ADC) — the
  // query precomputes its distance to every codebook centroid, so
  // scoring a vector is M table lookups instead of a D-dim loop).

  private val PqM = 16       // subspaces
  private val PqSub = Dim / PqM // dims per subspace
  private val PqK = 32       // centroids per subspace codebook
  private val PqIters = 5
  private[graft] val PqCand = 100   // ADC candidate pool
  private[graft] val PqTopK = 10    // exact-reranked output

  /** Plain-L2 Lloyd's k-means with deterministic farthest-first seeding —
    * the PQ codebook trainer. Unlike [[trainCentroids]] (spherical,
    * cosine objective) the centroids are unnormalized MEANS: PQ
    * reconstructs subvectors, so magnitude matters. Pure driver-side
    * function over a bounded sample; deterministic for a given sample. */
  private[graft] def trainCentroidsL2(sample: Array[Array[Double]],
                                      k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val kk = k.min(sample.length)
    val seeds = scala.collection.mutable.ArrayBuffer(sample(0))
    val minD = sample.map(d2(_, sample(0)))
    while (seeds.length < kk) {
      val next = minD.indices.maxBy(minD(_))
      seeds += sample(next)
      var i = 0
      while (i < sample.length) {
        val dd = d2(sample(i), sample(next))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
    }
    var cents = seeds.toArray
    for (_ <- 0 until iters) {
      val dim = sample(0).length
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { x =>
        var best = 0; var bestD = Double.PositiveInfinity; var j = 0
        while (j < kk) {
          val dj = d2(x, cents(j))
          if (dj < bestD) { bestD = dj; best = j }
          j += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = (0 until kk).map { j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(_ / counts(j))
      }.toArray
    }
    cents
  }

  /** Trained PQ codebooks `[m][code][dim]` per corpus, memoized like the
    * IVF centroids (training is deterministic: hash-filtered bounded
    * sample, fixed seeding and iteration count). */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Array[Double]]]]()
  @volatile private var lastPqKey: Option[String] = None

  private def pqCodebooks(emb: DataFrame, cacheKey: String)
      : Array[Array[Array[Double]]] = {
    def train(): Array[Array[Array[Double]]] = {
      val sample = {
        val s1 = emb.select(col("v"))
          .filter(pmod(xxhash64(col("vec_id")), lit(7)) === 0)
          .limit(IvfSampleCap)
          .collect().map(_.getSeq[Double](0).toArray)
        if (s1.nonEmpty) s1
        else emb.select(col("v")).limit(IvfSampleCap)
          .collect().map(_.getSeq[Double](0).toArray)
      }
      Array.tabulate(PqM) { m =>
        trainCentroidsL2(
          sample.map(_.slice(m * PqSub, (m + 1) * PqSub)), PqK, PqIters)
      }
    }
    val cb = ArtifactCaches.memo("vectors.pq", pqCache)(cacheKey)(
      _ => train())
    lastPqKey = Some(cacheKey)
    cb
  }

  /** Codebook rows as DuckDB VALUES — (m, code, centroid), each component
    * through the CAST('…' AS DOUBLE) route ([[planesSql]] discipline). */
  private def pqCbSql(cbs: Array[Array[Array[Double]]]): String =
    (for { m <- cbs.indices; j <- cbs(m).indices } yield
      s"($m, $j, [${cbs(m)(j).map(x => s"CAST('$x' AS DOUBLE)").mkString(",")}])"
    ).mkString(",\n    ")

  /** DuckDB mirror of [[vectorPq]] with the trained codebooks inlined:
    * same per-subspace assignment (row_number over (distance, code) ≡
    * Spark's least-of-structs), same micro-quantized ADC lookup values
    * computed from the data-side query vector, same exact-L2 rerank. All
    * float accumulation is DuckDB `list_sum` ≡ the native expressions'
    * left-to-right loops, so the compare is bit-exact. */
  private def pqOracleSql(cbs: Array[Array[Array[Double]]]): String =
    s"""WITH cb AS (SELECT m, code, cv FROM (VALUES
       |    ${pqCbSql(cbs)}) c(m, code, cv)),
       |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |sub AS (SELECT vec_id, m, v[m*$PqSub+1 : m*$PqSub+$PqSub] AS sv
       |        FROM e CROSS JOIN (SELECT unnest([${(0 until PqM).mkString(",")}]) AS m)),
       |asg AS (SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, code) AS rn
       |    FROM (SELECT s.vec_id, s.m, c.code,
       |            list_sum([(s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i])
       |                      FOR i IN range(1, len(s.sv)+1)]) AS dd
       |          FROM sub s JOIN cb c ON s.m = c.m))
       |  WHERE rn = 1),
       |qd AS (SELECT c.m, c.code,
       |         CAST(floor(1000000.0 * list_sum(
       |           [(q.qv[c.m*$PqSub+i]-c.cv[i])*(q.qv[c.m*$PqSub+i]-c.cv[i])
       |            FOR i IN range(1, $PqSub+1)])) AS BIGINT) AS mqd
       |       FROM cb c CROSS JOIN q),
       |adc AS (SELECT vec_id, CAST(sum(mqd) AS BIGINT) AS adc_micro
       |        FROM asg JOIN qd USING (m, code) GROUP BY 1),
       |cand AS (SELECT vec_id, adc_micro FROM adc
       |         ORDER BY adc_micro, vec_id LIMIT $PqCand)
       |SELECT e.vec_id, e.label, cand.adc_micro,
       |  list_sum([(e.v[i]-q.qv[i])*(e.v[i]-q.qv[i])
       |            FOR i IN range(1, len(e.v)+1)]) AS l2_sq
       |FROM cand JOIN e USING (vec_id) CROSS JOIN q
       |ORDER BY l2_sq, vec_id LIMIT $PqTopK""".stripMargin

  /** Product-quantization ANN: encode every vector as [[PqM]] codebook
    * indices, score candidates by ADC lookup, exact-rerank the top
    * [[PqCand]]. THE memory-bound regime's index — [[PqM]] code bytes
    * per vector (16 B vs 256 B of floats, a 16× compression; 10 B
    * bit-packed at K=32) is what lets a 10⁹-vector index live in RAM.
    * Measured recall@10 vs exact L2 on the real embeddings:
    * 10/8/8 of 10 at sf0.001/0.01/0.1 (DedupSpec locks the floor).
    *
    * Plan shape — the part that matters at 100 TB: because codebooks and
    * the query's ADC lookup tables are DRIVER-SIDE literals (training is
    * the eager step, like IVF), the entire encode+score pass is ONE
    * NARROW whole-stage-codegen projection over the corpus — per-subspace
    * argmin as `least()` over (distance, code) structs of the native
    * [[graft.functions.expressions.L2Squared]] kernel, ADC as
    * `element_at` on literal arrays summed as exact BIGINTs — feeding
    * straight into TakeOrderedAndProject([[PqCand]]). ZERO shuffles, zero
    * joins before the candidate cut; the exact rerank touches only the
    * [[PqCand]]-row pool the scan carried through (no second corpus
    * scan). PlanAuditSpec locks the no-exchange-before-TakeOrdered
    * shape. Oracle: [[pqOracleSql]], codebooks inlined post-run. */
  /** The query's per-(subspace, code) ADC lookup table: micro-quantized
    * L2 from the query's m-th subvector to every codebook centroid —
    * ascending-index loop, the same left-to-right order as the
    * [[L2Squared]] kernel and DuckDB's `list_sum`. */
  private[graft] def pqQueryLut(cbs: Array[Array[Array[Double]]],
                                qv: Array[Double]): Array[Array[Long]] =
    Array.tabulate(cbs.length) { m =>
      cbs(m).map { cv =>
        var ss = 0.0; var i = 0
        while (i < PqSub) {
          val dd = qv(m * PqSub + i) - cv(i); ss += dd * dd; i += 1
        }
        math.floor(1000000.0 * ss).toLong
      }
    }

  /** The stateless ADC scoring expression over a `v: array<double>`
    * column — the native [[graft.functions.expressions.PqAdc]] kernel:
    * encode (per-subspace L2 argmin, ties to the lowest code ≡ the
    * oracle's ORDER BY dd, code) and the [[PqM]] exact-BIGINT LUT
    * lookups fused into one codegen loop. A `least()`-over-structs
    * composition computes the same value but drops out of codegen on
    * the struct comparisons — 2.65 s vs 0.42 s for the PQ query at
    * sf0.1 (min-of-3). A pure narrow projection, which is what makes PQ
    * serving work UNCHANGED on a stream: StreamingSpec scores a
    * MemoryStream with this very column and asserts bit-equality with
    * the batch scan. */
  private[graft] def pqAdcColumn(cbs: Array[Array[Array[Double]]],
                                 qd: Array[Array[Long]])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.expressions.PqAdc(
      Bridge.expression(col("v")), cbs, qd))
  }

  /** Train (or fetch memoized) codebooks + the query LUT for a dataset
    * dir — the eager driver-side step shared by [[vectorPq]] and the
    * streaming-scorer spec. */
  private[graft] def pqArtifacts(s: SparkSession, d: String)
      : (Array[Array[Array[Double]]], Array[Double], Array[Array[Long]]) = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val cbs = pqCodebooks(emb.filter(col("vec_id") =!= 0),
                          embeddingsFingerprint(s, d) + "#pq")
    val qv: Array[Double] = emb.filter(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    (cbs, qv, pqQueryLut(cbs, qv))
  }

  val vectorPq: Q = Q.noOracle("vector_pq") { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    // codebook training + the one-row query collect run at plan-build
    // (eager, like IVF); the ADC tables become literal arrays
    val (cbs, qv, qd) = pqArtifacts(s, d)
    val adc = pqAdcColumn(cbs, qd)
    corpus
      .select(col("vec_id"), col("label"), col("v"), adc.as("adc_micro"))
      .orderBy(asc("adc_micro"), asc("vec_id"))
      .limit(PqCand)
      .select(col("vec_id"), col("label"), col("adc_micro"),
              l2Sq(col("v"), typedlit(qv.toSeq)).as("l2_sq"))
      .orderBy(asc("l2_sq"), asc("vec_id"))
      .limit(PqTopK)
  }.copy(
    eager = true, // codebook training + query collect at plan-build
    oracleGen = Some(() =>
      lastPqKey.flatMap(k => Option(pqCache.get(k))).map(pqOracleSql)))

  // ---- IVFADC (Jégou et al. 2011 §IV): coarse quantizer + product
  // quantization of the RESIDUALS — the architecture a memory-bound
  // billion-vector index actually deploys (FAISS IVFxx,PQyy): the coarse
  // cells prune the scan to nProbe/k of the corpus, the residual PQ
  // codes make each stored vector M bytes, and ADC scores candidates
  // with M table lookups.

  private val IvfPqProbe = 5

  /** Driver-side nearest coarse cell: squared-L2 argmin, strict `<`
    * first-minimum — the same tie discipline as the native
    * [[graft.functions.expressions.NearestCentroid]] kernel. */
  private def nearestCellL2(v: Array[Double],
                            cents: Array[Array[Double]]): Int = {
    var best = Double.PositiveInfinity
    var cell = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var s = 0.0
      var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      if (s < best) { best = s; cell = j }
      j += 1
    }
    cell
  }

  /** Trained IVFADC index per corpus: (coarse centroids, residual PQ
    * codebooks), memoized like the flat-PQ codebooks. Residual codebooks
    * train on sample residuals (v − coarse[cell(v)]) — the residual
    * distribution is what PQ must cover, not the raw vectors (this is
    * the whole point of IVFADC: residuals are smaller and better
    * centered, so the same M·K budget quantizes them more finely). */
  private val ivfPqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Double]], Array[Array[Array[Double]]])]()
  @volatile private var lastIvfPqKey: Option[String] = None

  private def ivfPqIndex(emb: DataFrame, cacheKey: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    def train(): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
      val sample = {
        val s1 = emb.select(col("v"))
          .filter(pmod(xxhash64(col("vec_id")), lit(7)) === 0)
          .limit(IvfSampleCap)
          .collect().map(_.getSeq[Double](0).toArray)
        if (s1.nonEmpty) s1
        else emb.select(col("v")).limit(IvfSampleCap)
          .collect().map(_.getSeq[Double](0).toArray)
      }
      val coarse = trainCentroidsL2(sample, IvfK, IvfIters)
      val residuals = sample.map { v =>
        val c = coarse(nearestCellL2(v, coarse))
        Array.tabulate(v.length)(i => v(i) - c(i))
      }
      val cbs = Array.tabulate(PqM) { m =>
        trainCentroidsL2(
          residuals.map(_.slice(m * PqSub, (m + 1) * PqSub)), PqK, PqIters)
      }
      (coarse, cbs)
    }
    val idx = ArtifactCaches.memo("vectors.ivfpq", ivfPqCache)(cacheKey)(
      _ => train())
    lastIvfPqKey = Some(cacheKey)
    idx
  }

  /** DuckDB mirror of [[vectorIvfPq]] with the trained coarse centroids
    * AND residual codebooks inlined post-run: the same strict-first-min
    * cell assignment (`ORDER BY dd, cid`), the same top-[[IvfPqProbe]]
    * probe, the same two-subtraction residual arithmetic, micro-quantized
    * per-cell ADC tables recomputed from the same literals, candidate cut
    * and exact-L2 rerank — every float op is the identical left-to-right
    * fold, so the hash compare is bit-exact. */
  private def ivfPqOracleSql(coarse: Array[Array[Double]],
                             cbs: Array[Array[Array[Double]]]): String =
    s"""WITH coarse AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(coarse.map(_.toSeq).toSeq)}) c(j, pv)),
       |cb AS (SELECT m, code, cv AS bv FROM (VALUES
       |    ${pqCbSql(cbs)}) c(m, code, cv)),
       |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |asg AS (SELECT vec_id, label, v, cell FROM (
       |    SELECT vec_id, label, v, cid AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
       |    FROM (SELECT vec_id, label, v, cid,
       |            list_sum([(v[i]-cv[i])*(v[i]-cv[i])
       |                      FOR i IN range(1, len(v)+1)]) AS dd
       |          FROM e CROSS JOIN coarse))
       |  WHERE rn = 1),
       |probe AS (SELECT cid AS cell, cv FROM (
       |    SELECT cid, cv, row_number() OVER (ORDER BY dd, cid) AS rn
       |    FROM (SELECT cid, cv,
       |            list_sum([(qv[i]-cv[i])*(qv[i]-cv[i])
       |                      FOR i IN range(1, len(qv)+1)]) AS dd
       |          FROM coarse CROSS JOIN q))
       |  WHERE rn <= $IvfPqProbe),
       |qres AS (SELECT cell, [qv[i] - cv[i] FOR i IN range(1, len(qv)+1)] AS qr
       |         FROM probe CROSS JOIN q),
       |qd AS (SELECT qres.cell, c.m, c.code,
       |         CAST(floor(1000000.0 * list_sum(
       |           [(qr[c.m*$PqSub+i]-c.bv[i])*(qr[c.m*$PqSub+i]-c.bv[i])
       |            FOR i IN range(1, $PqSub+1)])) AS BIGINT) AS mqd
       |       FROM cb c CROSS JOIN qres),
       |r AS (SELECT a.vec_id, a.label, a.v, a.cell,
       |        [a.v[i] - co.cv[i] FOR i IN range(1, len(a.v)+1)] AS rv
       |      FROM asg a JOIN probe p USING (cell)
       |      JOIN coarse co ON co.cid = a.cell),
       |subv AS (SELECT vec_id, cell, m, rv[m*$PqSub+1 : m*$PqSub+$PqSub] AS sv
       |         FROM r CROSS JOIN (SELECT unnest([${(0 until PqM).mkString(",")}]) AS m)),
       |easg AS (SELECT vec_id, cell, m, code FROM (
       |    SELECT vec_id, cell, m, code,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, code) AS rn
       |    FROM (SELECT s.vec_id, s.cell, s.m, c.code,
       |            list_sum([(s.sv[i]-c.bv[i])*(s.sv[i]-c.bv[i])
       |                      FOR i IN range(1, $PqSub+1)]) AS dd
       |          FROM subv s JOIN cb c ON s.m = c.m))
       |  WHERE rn = 1),
       |adc AS (SELECT vec_id, CAST(sum(mqd) AS BIGINT) AS adc_micro
       |        FROM easg JOIN qd USING (cell, m, code) GROUP BY 1),
       |cand AS (SELECT r.vec_id, r.label, r.cell, adc.adc_micro, r.v
       |         FROM adc JOIN r USING (vec_id)
       |         ORDER BY adc_micro, vec_id LIMIT $PqCand)
       |SELECT cand.vec_id, cand.label, CAST(cand.cell AS INT) AS cell,
       |  cand.adc_micro,
       |  list_sum([(cand.v[i]-q.qv[i])*(cand.v[i]-q.qv[i])
       |            FOR i IN range(1, len(cand.v)+1)]) AS l2_sq
       |FROM cand CROSS JOIN q
       |ORDER BY l2_sq, vec_id LIMIT $PqTopK""".stripMargin

  /** IVF + residual PQ (IVFADC) — the full production ANN architecture,
    * composing the two index families already in the catalog: the coarse
    * quantizer PRUNES (only the query's [[IvfPqProbe]] nearest cells are
    * read — at 100 TB, `cell` is the partition key and this filter is a
    * partition prune, exactly like `vector_ann_ivf`'s probe), and the
    * residual PQ codes COMPRESS (M bytes per vector) with ADC scoring.
    *
    * Plan shape — ONE narrow whole-stage-codegen pass over the corpus,
    * zero shuffles, zero joins: cell assignment via the native
    * `nearest_centroid` kernel, the probe as a literal `IN` filter on the
    * assigned cell, residual encode + ADC via the native
    * `pq_residual_adc` kernel (per-cell LUTs are driver literals), then
    * TakeOrderedAndProject for the candidate cut and the exact-L2
    * rerank over the [[PqCand]]-row pool. PlanAuditSpec locks all of it.
    * Oracle: [[ivfPqOracleSql]], coarse + codebooks inlined post-run. */
  val vectorIvfPq: Q = Q.noOracle("vector_ivf_pq") { (s, d) =>
    import org.apache.spark.sql.graft.Bridge
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val (coarse, cbs) = ivfPqIndex(corpus,
      embeddingsFingerprint(s, d) + "#ivfpq")
    val qv: Array[Double] = emb.filter(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    // the query's probe list: its IvfPqProbe nearest coarse cells, ties
    // to the lowest cid (the oracle's ORDER BY dd, cid)
    val probed: Seq[Int] = coarse.indices
      .map { j =>
        var s0 = 0.0; var i = 0
        while (i < qv.length) { val d = qv(i) - coarse(j)(i); s0 += d * d; i += 1 }
        (s0, j)
      }
      .sorted.take(IvfPqProbe).map(_._2)
    // per-probed-cell ADC tables from the query RESIDUAL, micro-quantized
    // with the same left-to-right loop as the kernel and the oracle
    val luts: Array[Array[Array[Long]]] = {
      val a = new Array[Array[Array[Long]]](coarse.length)
      probed.foreach { cell =>
        val qr = Array.tabulate(qv.length)(i => qv(i) - coarse(cell)(i))
        a(cell) = pqQueryLut(cbs, qr)
      }
      a
    }
    val cellCol = Bridge.column(graft.functions.expressions.NearestCentroid(
      Bridge.expression(col("v")), coarse))
    val adcCol = Bridge.column(graft.functions.expressions.PqResidualAdc(
      Bridge.expression(col("v")), Bridge.expression(col("cell")),
      coarse, cbs, luts))
    corpus
      .withColumn("cell", cellCol)
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("label"), col("cell"), col("v"),
              adcCol.as("adc_micro"))
      .orderBy(asc("adc_micro"), asc("vec_id"))
      .limit(PqCand)
      .select(col("vec_id"), col("label"), col("cell"), col("adc_micro"),
              l2Sq(col("v"), typedlit(qv.toSeq)).as("l2_sq"))
      .orderBy(asc("l2_sq"), asc("vec_id"))
      .limit(PqTopK)
  }.copy(
    eager = true, // coarse+codebook training + query collect at plan-build
    oracleGen = Some(() =>
      lastIvfPqKey.flatMap(k => Option(ivfPqCache.get(k)))
        .map { case (coarse, cbs) => ivfPqOracleSql(coarse, cbs) }))

  /** DuckDB mirror of [[vectorIndexDelta]] — the standing-corpus-trained
    * centroids inlined post-run, the same L2-argmin assignment as the
    * `nearest_centroid` kernel, and the same integer-milli cohesion
    * quantization as `vector_index_stats`. */
  private def indexDeltaOracleSql(cents: Seq[Seq[Double]]): String =
    s"""WITH cents AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(cents)}) c(j, pv)),
       |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
       |        CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END AS is_new
       |      FROM embeddings WHERE vec_id <> 0),
       |asg AS (SELECT vec_id, is_new, v, cell FROM (
       |    SELECT vec_id, is_new, v, cid AS cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
       |    FROM (SELECT vec_id, is_new, v, cid,
       |            list_sum([(v[i]-cv[i])*(v[i]-cv[i])
       |                      FOR i IN range(1, len(v)+1)]) AS dd
       |          FROM e CROSS JOIN cents))
       |  WHERE rn = 1),
       |m AS (SELECT a.cell, a.is_new,
       |        CAST(floor(1000 * (${cosSql("a.v", "c.cv")})) AS BIGINT) AS mc
       |      FROM asg a JOIN cents c ON a.cell = c.cid)
       |SELECT CAST(cell AS INT) AS cell,
       |  CAST(sum(1 - is_new) AS BIGINT) AS n_old,
       |  CAST(sum(is_new) AS BIGINT) AS n_new,
       |  CASE WHEN sum(1 - is_new) > 0 THEN
       |    CAST(sum(CASE WHEN is_new = 0 THEN mc ELSE 0 END) AS DOUBLE)
       |      / sum(1 - is_new) END AS mcos_old,
       |  CASE WHEN sum(is_new) > 0 THEN
       |    CAST(sum(CASE WHEN is_new = 1 THEN mc ELSE 0 END) AS DOUBLE)
       |      / sum(is_new) END AS mcos_new
       |FROM m GROUP BY 1 ORDER BY cell""".stripMargin

  /** INCREMENTAL index maintenance — the day-2 ANN operation
    * `dedup_incremental` is to dedup: a new BATCH of vectors
    * (vec_id % 10 == 7, ~10%) arrives and the standing index must absorb
    * it WITHOUT retraining — centroids train on the standing corpus
    * only, the batch is assigned to existing cells, and the output is
    * the per-cell census that decides when retraining is due: old/new
    * member counts (growth balance — one cell absorbing the whole batch
    * means the data moved) and old/new cohesion (integer-milli mean
    * member→centroid cosine; new-member cohesion falling below the old
    * is THE index-staleness signal).
    *
    * Plan shape: both sides assign through the native `nearest_centroid`
    * kernel — narrow, no shuffle — then ONE partial+final aggregate
    * keyed by cell; exact-BIGINT quantized sums, one division per mean.
    * Oracle: [[indexDeltaOracleSql]], standing-corpus centroids inlined
    * post-run. */
  val vectorIndexDelta: Q = Q.noOracle("vector_index_delta") { (s, d) =>
    import org.apache.spark.sql.graft.Bridge
    val emb = Tables.embeddings(s, d).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"),
              when(col("vec_id") % 10 === 7, 1).otherwise(0).as("is_new"))
    // the standing index: trained on the OLD corpus only (its own cache
    // key — vector_ann_ivf's index trains on old+new and must not serve)
    val deltaKey = embeddingsFingerprint(s, d) + "#delta"
    val cents = ivfCentroidArrays(emb.filter(col("is_new") === 0),
      cacheKey = Some(deltaKey))
    lastDeltaKey = Some(s"$deltaKey#$IvfK")
    val cellCol = Bridge.column(graft.functions.expressions.NearestCentroid(
      Bridge.expression(col("v")), cents))
    val cvLit = typedlit(cents.map(_.toSeq).toSeq)
    emb.withColumn("cell", cellCol)
      .select(col("cell"), col("is_new"),
        floor(lit(1000) *
          cosine(col("v"), element_at(cvLit, col("cell") + 1)))
          .cast("long").as("mc"))
      .groupBy("cell")
      .agg(sum(lit(1) - col("is_new")).as("n_old"),
           sum(col("is_new")).as("n_new"),
           sum(when(col("is_new") === 0, col("mc")).otherwise(0L)).as("so"),
           sum(when(col("is_new") === 1, col("mc")).otherwise(0L)).as("sn"))
      .select(col("cell").cast("int").as("cell"),
        col("n_old"), col("n_new"),
        when(col("n_old") > 0, col("so").cast("double") / col("n_old"))
          .as("mcos_old"),
        when(col("n_new") > 0, col("sn").cast("double") / col("n_new"))
          .as("mcos_new"))
  }.copy(
    eager = true, // standing-index training at plan-build
    oracleGen = Some(() =>
      lastDeltaKey.flatMap(k => Option(centroidCache.get(k)))
        .map(cs => indexDeltaOracleSql(cs.map(_.toSeq).toSeq))))

  /** Cache key of the standing-corpus index [[vectorIndexDelta]] trained
    * most recently (distinct from [[lastIvfKey]], which any of the three
    * full-corpus centroid consumers may overwrite between the delta
    * query's run and its oracle render). */
  @volatile private var lastDeltaKey: Option[String] = None

  /** MAXIMUM INNER-PRODUCT SEARCH (the recommendation/reranker scoring
    * primitive — user×item factor models rank by raw dot product, where
    * cosine's normalization would erase the item-popularity magnitude
    * signal): exact dot-product top-20 against the vec_id=0 query.
    *
    * Same plan as [[vectorTopk]] — broadcast query row, one narrow
    * native-codegen projection ([[graft.functions.VectorOps.dotNative]]),
    * TakeOrderedAndProject — a third of the flops since no norms. MIPS
    * is not a metric (no triangle inequality), so the LSH/IVF indexes
    * here do NOT directly apply at scale; the standard reduction
    * (Shrivastava & Li 2014) appends one dimension √(M²−‖x‖²) with
    * M = max‖x‖, after which cosine ANN over the augmented vectors
    * answers MIPS — implemented and recall-evaluated end to end in
    * [[vectorMipsAnn]]. */
  val vectorMips: Q = Q(
    "vector_mips",
    """WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id, label,
      |  list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) AS dot
      |FROM e, q
      |ORDER BY dot DESC, vec_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), dotNative(col("v"), col("qv")).as("dot"))
      .orderBy(desc("dot"), asc("vec_id"))
      .limit(20)
  }

  /** Fixed 65-dim hyperplanes for the MIPS-augmented index — one extra
    * component for the norm-augmentation dimension; seeded independently
    * of [[planes]] so the two indexes stay distinct trained artifacts. */
  private lazy val mipsPlanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(4242)
    Seq.fill(NPlanes)(Seq.fill(Dim + 1)(rnd.nextGaussian()))
  }

  /** ANN SERVING FOR MIPS — the Shrivastava & Li (2014) reduction the
    * [[vectorMips]] scaladoc records, exercised end to end: MIPS is not
    * a metric, so sign-LSH over raw vectors cannot serve it; but append
    * one dimension √(M²−‖x‖²) (M = max corpus norm) and every augmented
    * corpus vector has norm exactly M, making cosine order against an
    * augmented query (extra dim 0) EQUAL to inner-product order — after
    * which the existing multiprobe sign-LSH path applies unchanged, just
    * with 65-dim planes. This query is the recall@20 EVALUATION of that
    * reduction against the exact MIPS top-20 ([[vectorRecallEval]]
    * harness, [[vectorMips]] ranking): per held-out query, how much of
    * the true inner-product top-20 the augmented-index probe recovers.
    *
    * Exactness: ‖x‖² is the same index-order left fold on both engines
    * (list_sum of squares ≡ the native dot kernel), max over doubles is
    * deterministic, and √ is correctly-rounded IEEE — so M², every
    * augmented component, every bucket bit, and every ranking dot are
    * bit-equal and the driver hash-compares the whole evaluation.
    *
    * Plan: ONE corpus aggregate for M² (1-row broadcast), one narrow
    * codegen projection appends the augmented dim and buckets it —
    * corpus touched once, no shuffle; queries ride a 5×37-row broadcast
    * probe frame; both ranking cuts are per-query rank windows at 20;
    * the recall join runs at queries × k rows. At 100 TB the bucket is
    * a partition key and M² comes from the index build's stats — the
    * serving probe reads ~14% of the corpus, same as
    * [[vectorAnnLsh]]. */
  val vectorMipsAnn: Q = Q(
    "vector_mips_ann", {
      val dot = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)])"
      s"""WITH planes AS (SELECT j, pv FROM (VALUES
         |    ${planesSql(mipsPlanes)}) p(j, pv)),
         |e0 AS (SELECT vec_id, v, list_sum([x*x FOR x IN v]) AS ns
         |       FROM (SELECT vec_id,
         |               [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |             FROM embeddings WHERE vec_id >= 5)),
         |m AS (SELECT max(ns) AS m2 FROM e0),
         |e AS (SELECT vec_id, v, list_append(v, sqrt(m2 - ns)) AS va
         |      FROM e0 CROSS JOIN m),
         |q AS (SELECT vec_id AS q_id, v AS qv,
         |        list_append(v, CAST(0 AS DOUBLE)) AS qa
         |      FROM (SELECT vec_id,
         |              [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |            FROM embeddings WHERE vec_id < 5)),
         |eb AS (SELECT vec_id, first(v) AS v,
         |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END)
         |           AS BIGINT) AS bucket
         |       FROM (SELECT vec_id, v, j,
         |               list_sum([va[i]*pv[i] FOR i IN range(1, len(va)+1)])
         |                 AS dotp
         |             FROM e CROSS JOIN planes)
         |       GROUP BY vec_id),
         |qb AS (SELECT q_id, first(qv) AS qv,
         |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END)
         |           AS BIGINT) AS qbucket
         |       FROM (SELECT q_id, qv, j,
         |               list_sum([qa[i]*pv[i] FOR i IN range(1, len(qa)+1)])
         |                 AS dotp
         |             FROM q CROSS JOIN planes)
         |       GROUP BY q_id),
         |probe AS (SELECT q_id, qv, xor(qbucket, m) AS bucket
         |          FROM qb CROSS JOIN
         |            (SELECT unnest([${probeOffsets.mkString(",")}]) AS m)),
         |ann AS (SELECT q_id, vec_id FROM (
         |    SELECT p.q_id, eb.vec_id,
         |      row_number() OVER (PARTITION BY p.q_id
         |                         ORDER BY $dot DESC, eb.vec_id) AS rn
         |    FROM eb JOIN probe p USING (bucket)) WHERE rn <= 20),
         |ex AS (SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e0.vec_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |                         ORDER BY
         |                           list_sum([e0.v[i]*q.qv[i]
         |                             FOR i IN range(1, len(e0.v)+1)]) DESC,
         |                           e0.vec_id) AS rn
         |    FROM e0 CROSS JOIN q) WHERE rn <= 20)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL
         |                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL
         |                         THEN 1 ELSE 0 END), 0) AS DOUBLE)
         |    / count(*) AS recall
         |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id
         |  AND ex.vec_id = ann.vec_id
         |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e0 = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("ns", dotNative(col("v"), col("v")))
    val m2 = e0.agg(max(col("ns")).as("m2"))
    def bucket65(va: Column): Column =
      (0 until NPlanes).map { j =>
        val h = typedlit(mipsPlanes(j))
        when(cosine(va, h) > 0, 1 << j).otherwise(0)
      }.reduce(_ + _)
    val e = e0.crossJoin(broadcast(m2))
      .select(col("vec_id"), col("v"),
        concat(col("v"), array(sqrt(col("m2") - col("ns")))).as("va"))
      .withColumn("bucket", bucket65(col("va")))
      .select(col("vec_id"), col("v"), col("bucket"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
    val probes = q
      .withColumn("qbucket",
        bucket65(concat(col("qv"), array(lit(0.0d)))))
      .select(col("q_id"), col("qv"),
        explode(array(probeOffsets.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val wq = Window.partitionBy("q_id").orderBy(desc("dot"), asc("vec_id"))
    val ann = e.join(broadcast(probes), Seq("bucket"))
      .select(col("q_id"), col("vec_id"),
        dotNative(col("v"), col("qv")).as("dot"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val exact = e0.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        dotNative(col("v"), col("qv")).as("dot"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"))
    exact.join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }

  /** INDEX-QUALITY EVALUATION as a first-class query (the recall@k
    * harness every ANN deployment runs before trusting an index): for
    * each of 5 held-out query vectors, the LSH multiprobe top-20 is
    * joined against the exact top-20 and per-query recall is reported.
    * In production this runs on a sampled query log after every index
    * rebuild — the number that decides whether to add planes/probes.
    *
    * The ENTIRE evaluation — both retrieval paths and the recall join —
    * is value-oracled: the same plane-inlined SQL discipline as
    * `vector_ann_lsh`, generalized to a query batch with per-query rank
    * windows. Plan: corpus buckets once (narrow projection), ANN side
    * joins 5×37 broadcast probe rows, exact side is one broadcast
    * cross of 5 query rows; both cut at rank 20 per query before the
    * key-bounded recall join — nothing after the scans exceeds
    * queries × k rows. */
  val vectorRecallEval: Q = Q(
    "vector_recall_eval", {
      val cos = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH planes AS (SELECT j, pv FROM (VALUES
         |    ${planesSql(planes)}) p(j, pv)),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id >= 5),
         |q AS (SELECT vec_id AS q_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |      FROM embeddings WHERE vec_id < 5),
         |eb AS (SELECT vec_id, first(v) AS v,
         |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM (SELECT vec_id, v, j,
         |               list_sum([v[i]*pv[i] FOR i IN range(1, len(v)+1)]) AS dotp
         |             FROM e CROSS JOIN planes)
         |       GROUP BY vec_id),
         |qb AS (SELECT q_id, first(qv) AS qv,
         |         CAST(sum(CASE WHEN dotp > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS qbucket
         |       FROM (SELECT q_id, qv, j,
         |               list_sum([qv[i]*pv[i] FOR i IN range(1, len(qv)+1)]) AS dotp
         |             FROM q CROSS JOIN planes)
         |       GROUP BY q_id),
         |probe AS (SELECT q_id, qv, xor(qbucket, m) AS bucket
         |          FROM qb CROSS JOIN (SELECT unnest([${probeOffsets.mkString(",")}]) AS m)),
         |ann AS (SELECT q_id, vec_id FROM (
         |    SELECT p.q_id, eb.vec_id,
         |      row_number() OVER (PARTITION BY p.q_id
         |                         ORDER BY $cos DESC, eb.vec_id) AS rn
         |    FROM eb JOIN probe p USING (bucket)) WHERE rn <= 20),
         |ex AS (SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |                         ORDER BY $cos DESC, e.vec_id) AS rn
         |    FROM e CROSS JOIN q) WHERE rn <= 20)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE)
         |    / count(*) AS recall
         |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id AND ex.vec_id = ann.vec_id
         |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), toDouble(col("embedding")).as("qv"))
    val probes = q
      .withColumn("qbucket", bucketOf(col("qv")))
      .select(col("q_id"), col("qv"),
        explode(array(probeOffsets.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val wq = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("vec_id"))
    val ann = e.join(broadcast(probes), Seq("bucket"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val exact = e.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"))
    exact.join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }

  /** The TUNING RESPONSE to [[vectorRecallEval]]'s measurement: the
    * single-table 8-plane multiprobe index scores recall@20 of only
    * 0.10–0.50 per query at sf0.1 — too coarse for a 5000-vector corpus.
    * The standard fix for low LSH recall is NOT more probes on one table
    * (each Hamming step degrades precision geometrically) but MORE
    * INDEPENDENT TABLES OR'd together (Indyk & Motwani's original
    * amplification): a true near neighbor only has to agree on all 6
    * bits of ONE of 8 independent signatures. This query re-runs the
    * exact same evaluation harness against the multi-table index that
    * [[graft.operators.Dedup.dedupCosineLsh]] and [[knnJoinLsh]] already
    * maintain (8 tables × 6 sign bits, [[Dedup.cosLshBands]] — shared,
    * not retrained), so eval → diagnose → re-index → re-eval is closed
    * end to end inside the catalog, and the driver value-checks BOTH
    * measurements.
    *
    * Plan: corpus bands once (narrow codegen projection, 8 rows/vector);
    * the 5 query vectors band the same way and broadcast (40 rows); the
    * band equi join yields candidates, cosine is computed from the
    * banded norms BEFORE the (q_id, vec_id) dedup exchange (the
    * dedup_cosine_lsh discipline — only passing pairs move), then the
    * per-query rank window cuts at 20 and the recall join runs at
    * queries × k rows. Oracle: the same plane-inlined SQL discipline,
    * [[Dedup.cosLshPlanes]] rendered by [[planesSql]].
    *
    * Measured at sf0.1 (same 5 queries as [[vectorRecallEval]]): mean
    * recall@20 0.41 at a 12.9% candidate read, vs the multiprobe's 0.32
    * at 15.7% — more recall for less read, the better operating point.
    * The deeper reading is WHY both stall under 0.5: the corpus's true
    * top-20 neighbors sit at cosine 0.27–0.42 (near-random geometry), so
    * a hyperplane agrees with p ≈ 0.6 and a 6-bit table collides with
    * p ≈ 0.045 — amplification needs ~50 OR'd tables for 0.9 recall,
    * by which point the candidate read approaches a full scan. An eval
    * harness that reports this honestly is the point: it is the number
    * that tells an operator to serve THIS corpus with the exact scan
    * ([[vectorTopk]]), IVF ([[vectorAnnIvf]]) or PQ ([[vectorPq]],
    * measured recall@10 ≥ 0.8) paths rather than sign-LSH. */
  val vectorRecallEvalMt: Q = Q(
    "vector_recall_eval_mt", {
      val cos = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      val ppt = 6 // planes per table — Dedup.CosLshPlanesPerTable
      s"""WITH planes AS (SELECT j, pv FROM (VALUES
         |    ${planesSql(Dedup.cosLshPlanes)}) p(j, pv)),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
         |        sqrt(list_sum([x*x FOR x IN [CAST(x AS DOUBLE) FOR x IN embedding]])) AS nrm
         |      FROM embeddings WHERE vec_id >= 5),
         |q AS (SELECT vec_id AS q_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS qv,
         |        sqrt(list_sum([x*x FOR x IN [CAST(x AS DOUBLE) FOR x IN embedding]])) AS qnrm
         |      FROM embeddings WHERE vec_id < 5),
         |sg AS (SELECT vec_id, first(v) AS v, first(nrm) AS nrm,
         |         j // $ppt AS tbl,
         |         CAST(sum(CASE WHEN dotp > 0
         |           THEN (1 << (j % $ppt)) ELSE 0 END) AS BIGINT) AS sig
         |       FROM (SELECT vec_id, v, nrm, j,
         |               list_sum([v[i]*pv[i] FOR i IN range(1, len(v)+1)]) AS dotp
         |             FROM e CROSS JOIN planes)
         |       GROUP BY vec_id, j // $ppt),
         |qg AS (SELECT q_id, first(qv) AS qv, first(qnrm) AS qnrm,
         |         j // $ppt AS tbl,
         |         CAST(sum(CASE WHEN dotp > 0
         |           THEN (1 << (j % $ppt)) ELSE 0 END) AS BIGINT) AS sig
         |       FROM (SELECT q_id, qv, qnrm, j,
         |               list_sum([qv[i]*pv[i] FOR i IN range(1, len(qv)+1)]) AS dotp
         |             FROM q CROSS JOIN planes)
         |       GROUP BY q_id, j // $ppt),
         |cand AS (SELECT DISTINCT qg.q_id, sg.vec_id,
         |    list_sum([sg.v[i]*qg.qv[i] FOR i IN range(1, len(sg.v)+1)]) /
         |    (sg.nrm * qg.qnrm) AS cosine
         |  FROM sg JOIN qg ON sg.tbl = qg.tbl AND sg.sig = qg.sig),
         |ann AS (SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id
         |                         ORDER BY cosine DESC, vec_id) AS rn
         |    FROM cand) WHERE rn <= 20),
         |ex AS (SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |                         ORDER BY $cos DESC, e.vec_id) AS rn
         |    FROM e CROSS JOIN q) WHERE rn <= 20)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS DOUBLE)
         |    / count(*) AS recall
         |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id AND ex.vec_id = ann.vec_id
         |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val bands = Dedup.cosLshBands(e) // (vec_id, v, nrm, tbl, sig)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val qBands = Dedup.cosLshBands(q)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nrm").as("qnrm"), col("tbl"), col("sig"))
    val wq = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("vec_id"))
    val ann = bands.join(broadcast(qBands), Seq("tbl", "sig"))
      // cosine from the banded norms BEFORE the dedup exchange: a pair
      // colliding in k tables pays k map-side dots, but only (id, id,
      // double) rows reach the exchange (dedup_cosine_lsh's measured
      // tradeoff, same comment there)
      .select(col("q_id"), col("vec_id"),
        (dotNative(col("v"), col("qv")) /
          (col("nrm") * col("qnrm"))).as("cosine"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val qv = q.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.crossJoin(broadcast(qv))
      .select(col("q_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"))
    exact.join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }

  /** SQ8-QUANTIZED top-k search with inline recall audit — the
    * scalar-quantization serving path (faiss `SQ8` shape) between the
    * exact scan ([[vectorTopk]], 4× the memory) and PQ ([[vectorPq]],
    * lossier): each corpus vector stores one double scale + 64 int8
    * codes (the [[vectorQuantize]] algebra), search ranks by cosine over
    * the DEQUANTIZED vector, and each returned rank carries whether the
    * exact top-20 agrees — the per-query quality signal an SQ8 deployment
    * monitors. max_err ≤ scale/2 per dim keeps SQ8 recall near-perfect
    * (vs PQ's subspace loss), which the in_exact column makes measurable.
    *
    * Determinism: codes are exact ints (floor(x/scale + 0.5)); the
    * dequantized values are one multiply each; both cosines fold in
    * index order in both engines (the [[vectorTopk]] parity discipline);
    * ranking ties break on vec_id.
    *
    * Plan: quantize + dequantize + score is ONE narrow codegen
    * projection over the scan (zero shuffles), both top-20 cuts are
    * TakeOrderedAndProject (per-partition heap, no global sort), and
    * the rank window + recall join run over 20-row frames. At 100 TB
    * the int8 codes column is what sits in storage (4× less scan I/O);
    * the q8→w dequantization here stands in for reading it. */
  val vectorSq8Topk: Q = Q(
    "vector_sq8_topk", {
      val cosW = "list_sum([w[i]*qv[i] FOR i IN range(1, len(w)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN w])) * sqrt(list_sum([x*x FOR x IN qv])))"
      val cosV = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |m AS (SELECT vec_id, v, list_max([abs(x) FOR x IN v]) / 127 AS scale
         |      FROM e),
         |dq AS (SELECT vec_id,
         |         CASE WHEN scale = 0 THEN [CAST(0 AS DOUBLE) FOR x IN v]
         |              ELSE [CAST(floor(x / scale + 0.5) AS INT) * scale
         |                    FOR x IN v] END AS w
         |       FROM m),
         |ax AS (SELECT vec_id, cos_sq8,
         |         row_number() OVER (ORDER BY cos_sq8 DESC, vec_id) AS rank
         |       FROM (SELECT dq.vec_id, $cosW AS cos_sq8 FROM dq, q)),
         |ex AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, $cosV AS c,
         |      row_number() OVER (ORDER BY c DESC, e.vec_id) AS rn
         |    FROM e, q) WHERE rn <= 20)
         |SELECT CAST(rank AS INT) AS rank, ax.vec_id AS vec_id, cos_sq8,
         |  ex.vec_id IS NOT NULL AS in_exact
         |FROM ax LEFT JOIN ex ON ax.vec_id = ex.vec_id
         |WHERE rank <= 20 ORDER BY rank""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    val e = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val dq = e
      .withColumn("scale", array_max(transform(col("v"), abs(_))) / 127)
      // zero-vector guard: the vector_quantize discipline (scale 0 would
      // NaN the division); dequantized code*scale stands in for the
      // stored int8 column
      .withColumn("w",
        when(col("scale") === 0, transform(col("v"), _ => lit(0.0)))
        .otherwise(transform(col("v"),
          x => floor(x / col("scale") + 0.5).cast("int") * col("scale"))))
    val ax = dq.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("w"), col("qv")).as("cos_sq8"))
      .orderBy(desc("cos_sq8"), asc("vec_id")).limit(20)
      // rank window runs over the already-cut 20 rows, never the corpus
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cos_sq8"), asc("vec_id"))))
    val ex = e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("c"))
      .orderBy(desc("c"), asc("vec_id")).limit(20)
      .select(col("vec_id"), lit(1).as("hit"))
    ax.join(ex, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("cos_sq8"),
              col("hit").isNotNull.as("in_exact"))
      .orderBy("rank")
  }

  /** Fixed seeded planes for the 48-bit binary signature (seed distinct
    * from the 8-plane LSH index so the two codebooks are independent). */
  private[operators] lazy val hamPlanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(48)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** BINARY-SIGNATURE top-k search (48-bit sign random projection,
    * Charikar 2002) with inline recall audit — the most aggressive
    * compression point on the serving spectrum: exact scan (512 B/vec) →
    * SQ8 ([[vectorSq8Topk]], 72 B) → PQ ([[vectorPq]], 8 B + codebook) →
    * THIS (6 B/vec, no codebook). Ranking is Hamming distance =
    * popcount(sig XOR qsig): pure 64-bit integer ops, which makes this
    * the one ANN path with NO floating point anywhere in the ranking —
    * E[hamming]/48 estimates angle/π, and in_exact measures what the
    * 48-bit compression actually costs on this corpus.
    *
    * Determinism: the sign tests fold dot products in index order (the
    * [[vectorRecallEval]] plane-inlined discipline); everything after is
    * BIGINT arithmetic with a (hamming, vec_id) total order.
    *
    * Plan: signature = one narrow codegen projection (48 native dot
    * products per row, zero shuffles); the top-20 cut is
    * TakeOrderedAndProject on an INT key; the rank window and recall
    * join see 20 rows. At 100 TB the 6-byte signature column is the
    * resident index — a 100 TB float corpus serves from ~1 TB of
    * signatures, and the XOR+popcount scan vectorizes. */
  val vectorHammingTopk: Q = Q(
    "vector_hamming_topk", {
      val cosV = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH planes AS (SELECT j, pv FROM (VALUES
         |    ${planesSql(hamPlanes)}) p(j, pv)),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |      FROM embeddings WHERE vec_id = 0),
         |eb AS (SELECT vec_id,
         |         CAST(sum(CASE WHEN dotp > 0 THEN (CAST(1 AS BIGINT) << j)
         |                       ELSE 0 END) AS BIGINT) AS sig
         |       FROM (SELECT vec_id, j,
         |               list_sum([v[i]*pv[i] FOR i IN range(1, len(v)+1)]) AS dotp
         |             FROM e CROSS JOIN planes)
         |       GROUP BY vec_id),
         |qb AS (SELECT CAST(sum(CASE WHEN dotp > 0 THEN (CAST(1 AS BIGINT) << j)
         |                            ELSE 0 END) AS BIGINT) AS qsig
         |       FROM (SELECT j,
         |               list_sum([qv[i]*pv[i] FOR i IN range(1, len(qv)+1)]) AS dotp
         |             FROM q CROSS JOIN planes)),
         |ax AS (SELECT vec_id, hamming,
         |         row_number() OVER (ORDER BY hamming, vec_id) AS rank
         |       FROM (SELECT vec_id,
         |               CAST(bit_count(xor(sig, qsig)) AS INT) AS hamming
         |             FROM eb, qb)),
         |ex AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, $cosV AS c,
         |      row_number() OVER (ORDER BY c DESC, e.vec_id) AS rn
         |    FROM e, q) WHERE rn <= 20)
         |SELECT CAST(rank AS INT) AS rank, ax.vec_id AS vec_id, hamming,
         |  ex.vec_id IS NOT NULL AS in_exact
         |FROM ax LEFT JOIN ex ON ax.vec_id = ex.vec_id
         |WHERE rank <= 20 ORDER BY rank""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    def sigOf(v: org.apache.spark.sql.Column) =
      hamPlanes.zipWithIndex.map { case (p, j) =>
        when(dotNative(v, typedlit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val ax = e.select(col("vec_id"), sigOf(col("v")).as("sig"))
      .crossJoin(broadcast(q.select(sigOf(col("qv")).as("qsig"))))
      .select(col("vec_id"),
        expr("CAST(bit_count(sig ^ qsig) AS INT)").as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id")).limit(20)
      // rank window runs over the already-cut 20 rows, never the corpus
      .withColumn("rank",
        row_number().over(Window.orderBy(asc("hamming"), asc("vec_id"))))
    val ex = e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("c"))
      .orderBy(desc("c"), asc("vec_id")).limit(20)
      .select(col("vec_id"), lit(1).as("hit"))
    ax.join(ex, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("hamming"),
              col("hit").isNotNull.as("in_exact"))
      .orderBy("rank")
  }

  /** Candidate width for the binary-quantization rerank stage. */
  private val BqCand = 100

  /** COORDINATE-SIGN BINARY QUANTIZATION with exact rerank — the
    * two-stage serving shape production binary indexes actually run
    * (prefilter on 1 bit/dim, rerank the survivors at full precision),
    * and the zero-training counterpoint to [[vectorHammingTopk]]: there
    * the 48 bits come from TRAINED-ish random projections (48 dot
    * products per write); here each bit is just `sign(v[i])` — no
    * codebook, no projection, one comparison per dimension at ingest.
    * Whether coordinate sign is informative depends on how centered the
    * corpus is, which is exactly what the inline recall audit measures.
    * Stage 1 ranks by Hamming distance over the 64 sign bits and keeps
    * [[BqCand]] candidates; stage 2 reranks ONLY those at full
    * precision, so the served ranking recovers from quantization error
    * whenever the true neighbor survives the prefilter.
    *
    * Parity: the 64 sign bits live in TWO 32-bit BIGINT halves — bit 63
    * stays off by construction (DuckDB's `<<` is overflow-checked at the
    * sign bit; the agg_bitmap_distinct block discipline); Hamming is
    * pure integer XOR+popcount; the rerank cosine is the shared
    * left-fold kernel, bit-equal across engines; every ORDER BY carries
    * the vec_id tie-break.
    *
    * Plan: signatures are one narrow codegen projection (64 sign tests,
    * zero shuffles, 8 B/vec resident); the stage-1 cut is
    * TakeOrderedAndProject on an INT key; candidates CARRY their full
    * vector in the top-k payload so the rerank joins nothing back into
    * the corpus and runs on [[BqCand]] rows. At 100 TB the sign
    * signature column is ~1.6 TB — the scan that serves every query —
    * and the full-precision reads are [[BqCand]] point lookups. */
  val vectorBqRerank: Q = Q(
    "vector_bq_rerank", {
      val cosV = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      def sig(v: String, off: Int) =
        s"CAST(list_sum([CASE WHEN $v[i + $off] > 0 THEN " +
          "(CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END " +
          "FOR i IN range(1, 33)]) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |      FROM embeddings WHERE vec_id = 0),
         |eb AS (SELECT vec_id, v, ${sig("v", 0)} AS s0,
         |               ${sig("v", 32)} AS s1 FROM e),
         |qb AS (SELECT ${sig("qv", 0)} AS q0, ${sig("qv", 32)} AS q1
         |       FROM q),
         |cand AS (SELECT vec_id, v, hamming FROM (
         |    SELECT vec_id, v,
         |      CAST(bit_count(xor(s0, q0)) + bit_count(xor(s1, q1)) AS INT)
         |        AS hamming
         |    FROM eb, qb)
         |  ORDER BY hamming, vec_id LIMIT $BqCand),
         |rr AS (SELECT vec_id, hamming, cosine,
         |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
         |       FROM (SELECT vec_id, hamming, $cosV AS cosine
         |             FROM cand, q)),
         |ex AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, $cosV AS c,
         |      row_number() OVER (ORDER BY c DESC, e.vec_id) AS rn
         |    FROM e, q) WHERE rn <= 10)
         |SELECT CAST(rank AS INT) AS rank, rr.vec_id AS vec_id, hamming,
         |  cosine, ex.vec_id IS NOT NULL AS in_exact
         |FROM rr LEFT JOIN ex ON rr.vec_id = ex.vec_id
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    def sig(v: org.apache.spark.sql.Column, off: Int) =
      (1 to 32).map { i =>
        when(element_at(v, i + off) > 0, lit(1L << (i - 1))).otherwise(0L)
      }.reduce(_ + _)
    val qb = broadcast(q.select(col("qv"),
      sig(col("qv"), 0).as("q0"), sig(col("qv"), 32).as("q1")))
    val cand = e
      .select(col("vec_id"), col("v"),
        sig(col("v"), 0).as("s0"), sig(col("v"), 32).as("s1"))
      .crossJoin(qb)
      .select(col("vec_id"), col("v"), col("qv"),
        expr("CAST(bit_count(s0 ^ q0) + bit_count(s1 ^ q1) AS INT)")
          .as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id")).limit(BqCand)
    val rr = cand
      .select(col("vec_id"), col("hamming"),
        cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id")).limit(10)
      // rank window runs over the already-cut 10 rows, never the corpus
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cosine"), asc("vec_id"))))
    val ex = e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("c"))
      .orderBy(desc("c"), asc("vec_id")).limit(10)
      .select(col("vec_id"), lit(1).as("hit"))
    rr.join(ex, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("hamming"), col("cosine"),
              col("hit").isNotNull.as("in_exact"))
      .orderBy("rank")
  }

  /** Matryoshka prefix width for the coarse pass (MRL-trained embeddings
    * put most of the signal in the leading dims; Kusupati et al. 2022). */
  private val MrlPrefix = 16
  private val MrlCand = 100

  /** MATRYOSHKA (truncate-then-rerank) top-k with inline recall audit —
    * the two-stage serving shape MRL embeddings exist for: a COARSE pass
    * ranks by cosine over only the first [[MrlPrefix]] dims (¼ of the
    * bytes read), keeps [[MrlCand]] candidates, and a RERANK pass scores
    * only those candidates at full width. Differs from the quantized
    * serving paths ([[vectorSq8Topk]]/[[vectorPq]]) in WHAT it compresses:
    * dimensions, not bits-per-dimension — the coarse column is a readable
    * prefix of the original, so one stored column serves every budget.
    *
    * Plan: the coarse pass is one narrow codegen projection over the
    * 16-dim slice + TakeOrderedAndProject (per-partition top-100, merged
    * at the driver — no shuffle); candidates carry their full vector in
    * the top-k payload, so the rerank runs driver-scale on 100 rows with
    * NO join back into the corpus; the rank window and recall join see
    * ≤100 rows. At 100 TB the prefix lives as its own parquet column
    * (column pruning makes the coarse scan read ¼ the bytes), and the
    * exact-audit pass is the eval harness, not the serving path. */
  val vectorMatryoshkaTopk: Q = Q(
    "vector_matryoshka_topk", {
      val cos16 = s"list_sum([v[i]*qv[i] FOR i IN range(1, ${MrlPrefix + 1})]) / " +
        s"(sqrt(list_sum([v[i]*v[i] FOR i IN range(1, ${MrlPrefix + 1})])) * " +
        s"sqrt(list_sum([qv[i]*qv[i] FOR i IN range(1, ${MrlPrefix + 1})])))"
      val cosV = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |cand AS (SELECT vec_id, v, qv, cos_p16 FROM (
         |    SELECT vec_id, v, qv, $cos16 AS cos_p16 FROM e, q)
         |  ORDER BY cos_p16 DESC, vec_id LIMIT $MrlCand),
         |ax AS (SELECT vec_id, cos_p16, cosine,
         |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
         |       FROM (SELECT vec_id, cos_p16, $cosV AS cosine FROM cand)),
         |ex AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, $cosV AS c,
         |      row_number() OVER (ORDER BY c DESC, e.vec_id) AS rn
         |    FROM e, q) WHERE rn <= 20)
         |SELECT CAST(rank AS INT) AS rank, ax.vec_id AS vec_id, cos_p16,
         |  cosine, ex.vec_id IS NOT NULL AS in_exact
         |FROM ax LEFT JOIN ex ON ax.vec_id = ex.vec_id
         |WHERE rank <= 20 ORDER BY rank""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val e = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    val cand = e.crossJoin(broadcast(q))
      .select(col("vec_id"), col("v"), col("qv"),
        cosine(slice(col("v"), 1, MrlPrefix),
               slice(col("qv"), 1, MrlPrefix)).as("cos_p16"))
      .orderBy(desc("cos_p16"), asc("vec_id")).limit(MrlCand)
    val ax = cand
      .select(col("vec_id"), col("cos_p16"),
              cosine(col("v"), col("qv")).as("cosine"))
      // rank window runs over the already-cut 100 rows, never the corpus
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= 20)
    val ex = e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("c"))
      .orderBy(desc("c"), asc("vec_id")).limit(20)
      .select(col("vec_id"), lit(1).as("hit"))
    ax.join(ex, Seq("vec_id"), "left")
      .select(col("rank"), col("vec_id"), col("cos_p16"), col("cosine"),
              col("hit").isNotNull.as("in_exact"))
      .orderBy("rank")
  }

  /** FILTERED top-k (the vector-DB "metadata filter" problem): exact
    * cosine top-20 restricted to label = 3 — retrieval composed with a
    * relational predicate, which pure ANN indexes handle badly (post-
    * filtering an index's top-k can return < k; pre-filtering rebuilds
    * the candidate set). The declarative form gets the right plan for
    * free: the label predicate PUSHES INTO the parquet scan
    * (PushedFilters, locked in PlanAuditSpec), so the cosine projection
    * and the top-k cut only ever see the filtered stripe — at 100 TB
    * with label-partitioned or label-clustered storage that is partition
    * pruning, the exact analogue of the IVF cell read. The scan stays
    * narrow (vec_id, label, embedding), the cut is TakeOrderedAndProject. */
  val vectorFilteredTopk: Q = Q(
    "vector_filtered_topk",
    """WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings WHERE vec_id <> 0 AND label = 3)
      |SELECT vec_id, label,
      |  list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
      |  (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv]))) AS cosine
      |FROM e, q
      |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= 0 && col("label") === 3)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
              cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(20)
  }

  /** RANGE (radius) SEARCH — all corpus vectors with cosine ≥ τ of each
    * query, the retrieval mode top-k can't express: "everything at least
    * this similar" (near-duplicate sweeps, threshold-gated RAG recall,
    * [[graft.operators.Dedup.dedupCosine]]'s primitive pointed at ad-hoc
    * queries). Per query the census row carries the exact match count
    * and similarity extrema plus the top-5 matches by rank — bounded
    * output however dense the neighborhood.
    *
    * Determinism: the cosine is the shared left-fold double kernel
    * (bit-identical both engines, the [[vectorTopk]] discipline); count
    * / min / max are order-independent selections of exact values — no
    * float SUM over an engine-ordered set exists anywhere.
    *
    * Scale posture: the 3-row query set broadcasts; the corpus scan is
    * narrow (id, label, vector) with the cosine in codegen; the rank
    * window partitions BY QUERY over only the τ-survivors (the radius is
    * what bounds that set — a τ chosen so matches ≈ k·corpus^ε; for
    * unbounded radii the LSH/IVF bucket pre-cut upstream is the
    * [[vectorAnnLsh]] path, unchanged). */
  val vectorRangeSearch: Q = Q(
    "vector_range_search",
    """WITH q AS (SELECT vec_id AS query_id,
      |           [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
      |e AS (SELECT vec_id, label,
      |      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings),
      |c AS (SELECT query_id, vec_id, label,
      |  list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
      |  (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))
      |    AS cosine
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |m AS (SELECT * FROM c WHERE cosine >= CAST(0.15 AS DOUBLE)),
      |r AS (SELECT query_id, vec_id, label, cosine,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY cosine DESC, vec_id) AS rnk,
      |        count(*) OVER (PARTITION BY query_id) AS n_within,
      |        min(cosine) OVER (PARTITION BY query_id) AS min_cos,
      |        max(cosine) OVER (PARTITION BY query_id) AS max_cos
      |      FROM m)
      |SELECT query_id, CAST(rnk AS INT) AS rnk, vec_id, label, cosine,
      |  CAST(n_within AS BIGINT) AS n_within, min_cos, max_cos
      |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("qv"))
    val w = Window.partitionBy("query_id")
    emb.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("v"), col("qv")).as("cosine"))
      .filter(col("cosine") >= 0.15)
      .withColumn("rnk",
        row_number().over(w.orderBy(desc("cosine"), asc("vec_id"))))
      .withColumn("n_within", count(lit(1)).over(w))
      .withColumn("min_cos", min(col("cosine")).over(w))
      .withColumn("max_cos", max(col("cosine")).over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk").cast("int").as("rnk"),
        col("vec_id"), col("label"), col("cosine"), col("n_within"),
        col("min_cos"), col("max_cos"))
  }

  /** DuckDB mirror of [[vectorIvfProbeSweep]]: trained centroids inlined
    * post-run, the same assignment / probe-rank / candidate arithmetic,
    * recall joined against the exact top-20 — the [[ivfOracleSql]]
    * discipline extended across the whole nprobe grid. */
  private def probeSweepOracleSql(cents: Seq[Seq[Double]]): String =
    s"""WITH cents AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(cents)}) c(j, pv)),
       |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |      FROM embeddings WHERE vec_id = 0),
       |asg AS (SELECT vec_id, arg_max(cid, cs) AS cell, first(v) AS v
       |        FROM (SELECT vec_id, v, cid, ${cosSql("v", "cv")} AS cs
       |              FROM e CROSS JOIN cents)
       |        GROUP BY vec_id),
       |crank AS (SELECT cid AS cell, qv,
       |            row_number() OVER (ORDER BY cs DESC, cid) AS r
       |          FROM (SELECT qv, cid, ${cosSql("qv", "cv")} AS cs
       |                FROM q CROSS JOIN cents)),
       |probes AS (SELECT unnest([1, 2, 4, 8]) AS np),
       |cand AS (SELECT p.np, a.vec_id, ${cosSql("a.v", "c.qv")} AS cosine
       |         FROM asg a JOIN crank c USING (cell)
       |         CROSS JOIN probes p WHERE c.r <= p.np),
       |sc AS (SELECT np, vec_id, cosine,
       |         count(*) OVER (PARTITION BY np) AS n_scanned,
       |         row_number() OVER (PARTITION BY np
       |                            ORDER BY cosine DESC, vec_id) AS rn
       |       FROM cand),
       |ex AS (SELECT vec_id FROM (
       |    SELECT e.vec_id,
       |      row_number() OVER (ORDER BY ${cosSql("e.v", "q.qv")} DESC,
       |                         e.vec_id) AS rn
       |    FROM e CROSS JOIN q) WHERE rn <= 20),
       |n AS (SELECT count(*) AS nc FROM e)
       |SELECT CAST(s.np AS INT) AS nprobe,
       |  CAST(max(s.n_scanned) AS BIGINT) AS n_scanned,
       |  (1000000 * CAST(max(s.n_scanned) AS BIGINT)) // (SELECT nc FROM n)
       |    AS scan_ppm,
       |  CAST(COALESCE(sum(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END),
       |       0) AS BIGINT) AS n_hit,
       |  CAST(COALESCE(sum(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END),
       |       0) AS DOUBLE) / 20 AS recall
       |FROM sc s LEFT JOIN ex ON s.vec_id = ex.vec_id
       |WHERE s.rn <= 20
       |GROUP BY s.np ORDER BY nprobe""".stripMargin

  /** NPROBE SWEEP — the IVF cost/quality curve an ANN serving team reads
    * before picking an operating point: for nprobe ∈ {1,2,4,8}, how much
    * of the corpus a probe scans (exact ppm) and what recall@20 it buys
    * against the exact top-20. [[vectorRecallEval]] grades ONE LSH
    * configuration; this sweeps the IVF dial — together with
    * [[vectorIndexStats]] (is the index healthy?) and
    * [[vectorIndexDelta]] (can I reuse it?) it completes the
    * operate-an-index loop.
    *
    * Plan: ONE assignment pass (the shared memoized centroids), one
    * 16-row probe-rank window, and the candidate frame materialized ONCE
    * for the largest nprobe — each sweep point is a filter `r ≤ np` over
    * it, so adding a grid point adds a predicate, never a corpus pass.
    * Recall joins against the 20-row exact-truth broadcast. Determinism:
    * cosines are the shared left-fold kernel; counts/ppm exact integers;
    * recall is one division of exact ints. */
  val vectorIvfProbeSweep: Q = Q.noOracle("vector_ivf_probe_sweep") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val e = emb.filter(col("vec_id") =!= 0)
    val centroids = ivfCentroids(e, cacheKey = Some(embeddingsFingerprint(s, d)))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val cells = assignCells(e, centroids)
    val crank = q.crossJoin(broadcast(centroids))
      .select(col("qv"), col("cid"),
              cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("r", row_number().over(
        Window.orderBy(desc("csim"), asc("cid"))))
      .select(col("cid").as("cell"), col("qv"), col("r"))
    val probes = Seq(1, 2, 4, 8).toDF("np")
    val exact = e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rn") <= 20)
      .select(col("vec_id"), lit(1).as("hit"))
    val nCorp = e.agg(count(lit(1)).as("nc"))
    val wNp = Window.partitionBy("np")
    cells.join(broadcast(crank), Seq("cell"))
      .crossJoin(broadcast(probes))
      .filter(col("r") <= col("np"))
      .select(col("np"), col("vec_id"),
              cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("n_scanned", count(lit(1)).over(wNp))
      .withColumn("rn", row_number().over(
        wNp.orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rn") <= 20)
      .join(broadcast(exact), Seq("vec_id"), "left")
      .groupBy("np")
      .agg(max(col("n_scanned")).as("n_scanned"),
           coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hit"))
      .crossJoin(broadcast(nCorp))
      .select(col("np").cast("int").as("nprobe"), col("n_scanned"),
        expr("(1000000 * n_scanned) DIV nc").as("scan_ppm"),
        col("n_hit"),
        (col("n_hit").cast("double") / lit(20)).as("recall"))
  }.copy(
    eager = true, // shares the memoized IVF training collect
    oracleGen = Some(() =>
      cachedIvfCentroids.map(cs => probeSweepOracleSql(cs.map(_.toSeq).toSeq))))

  /** MMR DIVERSITY RE-RANKING (Carbonell & Goldstein 1998) — the
    * retrieval post-processor that trades relevance against redundancy:
    * from the exact top-20 for query 0, greedily select 5 results
    * maximizing λ·rel − (1−λ)·max-sim-to-already-selected with λ = 1/2.
    * Pure top-k returns near-duplicate neighbors (this corpus HAS
    * near-dup embeddings by construction — that's the dedup family's
    * point); MMR is the standard fix, and belongs beside top-k in any
    * retrieval engine.
    *
    * Determinism: λ = 1/2 makes both multiplies EXACT (the ts_ewma α
    * trick); the penalty is a MAX over ≤4 shared-kernel cosines (an
    * order-independent selection, not a sum); each greedy argmax is
    * total-ordered by (mmr DESC, vec_id). The oracle unrolls the same
    * 5 selections as chained CTEs.
    *
    * Scale posture: the candidate pool is the TakeOrderedAndProject
    * top-20 — the expensive part is the retrieval already audited in
    * [[vectorTopk]]; the greedy loop runs over 20-row checkpointed
    * frames (k × pool cosines total), which is why greedy MMR is
    * serving-tier-cheap at ANY corpus size: its cost depends on the
    * pool, never the corpus. */
  val vectorMmrRerank: Q = {
    def mmrOracleSql: String = {
      val steps = (2 to 5).map { k =>
        val prev = s"sel${k - 1}"
        s"""s$k AS (SELECT c.vec_id, c.v, c.rel, max(${cosSql("c.v", "s.v")})
           |    AS pen
           |  FROM cand c, $prev s
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev)
           |  GROUP BY c.vec_id, c.v, c.rel),
           |pick$k AS (SELECT vec_id, v, rel, pen,
           |    CAST(0.5 AS DOUBLE) * rel - CAST(0.5 AS DOUBLE) * pen AS mmr,
           |    $k AS rnk
           |  FROM s$k ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel$k AS (SELECT * FROM $prev UNION ALL SELECT * FROM pick$k)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |           FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |      FROM embeddings WHERE vec_id <> 0),
         |cand AS (SELECT vec_id, v, ${cosSql("v", "qv")} AS rel
         |         FROM e, q ORDER BY rel DESC, vec_id LIMIT 20),
         |sel1 AS (SELECT vec_id, v, rel, CAST(0 AS DOUBLE) AS pen,
         |    CAST(0.5 AS DOUBLE) * rel AS mmr, 1 AS rnk
         |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
         |$steps
         |SELECT CAST(rnk AS INT) AS rnk, vec_id, rel, pen, mmr
         |FROM sel5 ORDER BY rnk""".stripMargin
    }
    Q(
      "vector_mmr_rerank",
      mmrOracleSql
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(toDouble(col("embedding")).as("qv"))
      val cand = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("v"),
                cosine(col("v"), col("qv")).as("rel"))
        .orderBy(desc("rel"), asc("vec_id")).limit(20)
        .timedLocalCheckpoint() // the greedy loop re-reads this 20-row pool
      var sel = cand.orderBy(desc("rel"), asc("vec_id")).limit(1)
        .select(col("vec_id"), col("v"), col("rel"),
          lit(0.0).as("pen"), (lit(0.5) * col("rel")).as("mmr"),
          lit(1).as("rnk"))
      for (k <- 2 to 5) {
        val pens = cand
          .join(sel.select("vec_id"), Seq("vec_id"), "left_anti")
          .crossJoin(sel.select(col("v").as("sv")))
          .groupBy("vec_id", "rel")
          .agg(first(col("v")).as("v"),
               max(cosine(col("v"), col("sv"))).as("pen"))
        sel = sel.unionByName(pens
          .select(col("vec_id"), col("v"), col("rel"), col("pen"),
            (lit(0.5) * col("rel") - lit(0.5) * col("pen")).as("mmr"),
            lit(k).as("rnk"))
          .orderBy(desc("mmr"), asc("vec_id")).limit(1))
          .timedLocalCheckpoint() // tiny; truncates the per-round lineage
      }
      sel.select(col("rnk").cast("int").as("rnk"), col("vec_id"),
                 col("rel"), col("pen"), col("mmr"))
    }.copy(eager = true) // pool checkpoint + greedy rounds run at build
  }

  /** HYBRID RETRIEVAL via Reciprocal Rank Fusion (Cormack et al. 2009) —
    * the RAG-serving composition of this engine's two retrieval halves:
    * the BM25 lexical ranker ([[graft.operators.TextAnalysis.textBm25]]'s
    * exact scoring pipeline, per-doc-totaled) and the dense cosine ranker
    * ([[vectorTopk]]'s kernel), fused by RRF = Σ 1/(60 + rank) over each
    * list's top-50. RRF needs no score calibration between the two
    * systems — only ranks — which is exactly why it is the default hybrid
    * fusion in production search stacks.
    *
    * Determinism: per-doc lexical totals sum the ≤3 term scores in a
    * FIXED coalesce chain (never an engine-ordered float SUM); both rank
    * lists are total-ordered (score DESC, id); each RRF contribution is
    * one division of exact ints and the fusion adds the two terms in
    * fixed (text, vector) order.
    *
    * Scale posture: each side is its own audited top-k
    * (TakeOrderedAndProject; the rank windows run over the 50-row cuts,
    * never the corpus); the fusion is a full outer join of two 50-row
    * frames. The doc_id ↔ vec_id identity is the fixture's 1:1 text/
    * embedding pairing — exactly a RAG corpus's shape. */
  val searchHybridRrf: Q = Q(
    "search_hybrid_rrf",
    """WITH dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl
      |            FROM documents),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, token, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |             FROM documents)
      |       WHERE token IN ('spark','merge','window') GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |s AS (SELECT tf.doc_id, tf.token,
      |        ((n_docs - df.df + CAST(0.5 AS DOUBLE))
      |          / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
      |        * (tf.tf * CAST(2.2 AS DOUBLE)
      |          / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
      |             - CAST(0.75 AS DOUBLE)
      |             + CAST(0.75 AS DOUBLE) * dl.dl / avgdl))) AS sc
      |      FROM tf JOIN df ON tf.token = df.token
      |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c),
      |ts AS (SELECT doc_id,
      |    COALESCE(max(CASE WHEN token = 'spark' THEN sc END), 0)
      |    + COALESCE(max(CASE WHEN token = 'merge' THEN sc END), 0)
      |    + COALESCE(max(CASE WHEN token = 'window' THEN sc END), 0) AS tsc
      |  FROM s GROUP BY doc_id),
      |tt AS (SELECT doc_id, tsc FROM ts ORDER BY tsc DESC, doc_id LIMIT 50),
      |tr AS (SELECT doc_id, tsc,
      |         row_number() OVER (ORDER BY tsc DESC, doc_id) AS trank
      |       FROM tt),
      |q AS (SELECT [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
      |      FROM embeddings WHERE vec_id = 0),
      |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
      |      FROM embeddings WHERE vec_id <> 0),
      |vv AS (SELECT vec_id,
      |    list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) /
      |    (sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))
      |      AS cosine
      |  FROM e, q ORDER BY cosine DESC, vec_id LIMIT 50),
      |vr AS (SELECT vec_id AS vid, cosine,
      |         row_number() OVER (ORDER BY cosine DESC, vec_id) AS vrank
      |       FROM vv),
      |f AS (SELECT COALESCE(tr.doc_id, vr.vid) AS doc_id,
      |        tr.trank, vr.vrank,
      |        COALESCE(CAST(1 AS DOUBLE) / (60 + tr.trank), CAST(0 AS DOUBLE))
      |        + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.vrank), CAST(0 AS DOUBLE))
      |          AS rrf
      |      FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.vid)
      |SELECT doc_id, CAST(trank AS INT) AS t_rank, CAST(vrank AS INT) AS v_rank,
      |  rrf
      |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    val c = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      // superset substring prefilter before the explode — see textBm25
      .filter(col("text").contains("spark") || col("text").contains("merge")
        || col("text").contains("window"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin("spark", "merge", "window"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val sc = ((col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)) *
      (col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) *
          (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))))
    val ts = tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(c))
      .select(col("doc_id"), col("token"), sc.as("sc"))
      .groupBy("doc_id")
      .agg((coalesce(max(when(col("token") === "spark", col("sc"))), lit(0.0))
        + coalesce(max(when(col("token") === "merge", col("sc"))), lit(0.0))
        + coalesce(max(when(col("token") === "window", col("sc"))), lit(0.0)))
        .as("tsc"))
    val tr = ts.orderBy(desc("tsc"), asc("doc_id")).limit(50)
      .withColumn("trank",
        row_number().over(Window.orderBy(desc("tsc"), asc("doc_id"))))
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(toDouble(col("embedding")).as("qv"))
    val vr = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("vid"),
              cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(desc("cosine"), asc("vid")).limit(50)
      .withColumn("vrank",
        row_number().over(Window.orderBy(desc("cosine"), asc("vid"))))
    tr.join(vr, col("doc_id") === col("vid"), "full_outer")
      .select(coalesce(col("doc_id"), col("vid")).as("doc_id"),
        col("trank").cast("int").as("t_rank"),
        col("vrank").cast("int").as("v_rank"),
        (coalesce(lit(1.0) / (lit(60) + col("trank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)))
          .as("rrf"))
      .orderBy(desc("rrf"), asc("doc_id")).limit(10)
  }

  /** PAIRWISE DIMENSION CORRELATION over the leading 16 embedding
    * dimensions — the redundancy audit that complements
    * [[vectorDimStats]]'s per-dimension health census: highly-correlated
    * dimension pairs mean the encoder wastes capacity (and that a PQ
    * codebook's subspace split straddles correlated axes), so this is
    * the go/no-go check before choosing PQ subvector boundaries or an
    * OPQ-style rotation. One row per (i < j) pair with the exact pair
    * count and the Pearson correlation in floor-quantized micro-units.
    *
    * Parity discipline: values quantize ONCE to milli-units
    * ([[vectorDimStats]]), all five sufficient statistics (Σqᵢ, Σqⱼ,
    * Σqᵢqⱼ, Σqᵢ², Σqⱼ²) are exact DECIMAL(38,0)/HUGEINT sums —
    * order-independent — and the correlation is one shared scalar IEEE
    * expression over those exact integers, floor-quantized so the
    * output is BIGINT. Zero-variance dimensions (corr undefined, 0/0)
    * are excluded by a mirrored WHERE (the dq_drift_ttest discipline).
    *
    * Plan: WIDE sufficient statistics, no fan-out — one no-group
    * partial+final aggregate carries all 153 exact sums (16 Σq, 16 Σq²,
    * 120 Σqᵢqⱼ, count) as literal-indexed codegen expressions, and the
    * 120 output rows assemble from the single result row by a 120-wide
    * literal struct array explode. The explode-then-regroup alternative
    * materializes 120·n rows through the hash aggregate (measured 27s at
    * the sf10 rig vs 4s for this shape); here the corpus is scanned once
    * with O(d²) work per row and the shuffle carries one O(d²)-column
    * row per partition. */
  val vectorDimCorr: Q = Q(
    "vector_dim_corr",
    """WITH x AS (SELECT vec_id,
      |    [CAST(floor(1000 * CAST(v AS DOUBLE)) AS BIGINT)
      |     FOR v IN embedding[1:16]] AS q
      |  FROM embeddings),
      |p AS (SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j,
      |    q[CAST(i AS INT)] AS qi, q[CAST(j AS INT)] AS qj
      |  FROM x CROSS JOIN range(1, 17) t1(i) CROSS JOIN range(1, 17) t2(j)
      |  WHERE j > i),
      |s AS (SELECT dim_i, dim_j, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(qi) AS DECIMAL(38,0)) AS si,
      |    CAST(sum(qj) AS DECIMAL(38,0)) AS sj,
      |    sum(CAST(qi AS HUGEINT) * qj) AS sij,
      |    sum(CAST(qi AS HUGEINT) * qi) AS sii,
      |    sum(CAST(qj AS HUGEINT) * qj) AS sjj
      |  FROM p GROUP BY 1, 2),
      |c AS (SELECT dim_i, dim_j, n,
      |    (CAST(n AS DOUBLE) * CAST(sij AS DOUBLE)
      |       - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)
      |             - CAST(si AS DOUBLE) * CAST(si AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * CAST(sjj AS DOUBLE)
      |             - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))) AS corr
      |  FROM s
      |  WHERE CAST(n AS DOUBLE) * CAST(sii AS DOUBLE)
      |          - CAST(si AS DOUBLE) * CAST(si AS DOUBLE) > 0
      |    AND CAST(n AS DOUBLE) * CAST(sjj AS DOUBLE)
      |          - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) > 0)
      |SELECT dim_i, dim_j, n,
      |  CAST(floor(1000000 * corr) AS BIGINT) AS corr_micro
      |FROM c ORDER BY dim_i, dim_j""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val dims = 16
    val q = slice(transform(col("embedding"),
      v => floor(lit(1000) * v.cast("double")).cast("long")), 1, dims)
    val pairIdx = for (i <- 1 to dims; j <- (i + 1) to dims) yield (i, j)
    def at(i: Int): Column = element_at(col("q"), i)
    val sums: Seq[Column] =
      (1 to dims).map(i => sum(at(i)).cast(dec38).as(s"s$i")) ++
      (1 to dims).map(i => sum(at(i).cast(dec38) * at(i)).as(s"ss$i")) ++
      pairIdx.map { case (i, j) =>
        sum(at(i).cast(dec38) * at(j)).as(s"p${i}_$j") }
    val wide = Tables.embeddings(s, d)
      .select(q.as("q"))
      .agg(count(lit(1)).as("n"), sums: _*)
    val st = wide.select(explode(array(pairIdx.map { case (i, j) =>
        struct(lit(i).as("dim_i"), lit(j).as("dim_j"), col("n"),
          col(s"s$i").as("si"), col(s"s$j").as("sj"),
          col(s"p${i}_$j").as("sij"),
          col(s"ss$i").as("sii"), col(s"ss$j").as("sjj"))
      }: _*)).as("r"))
      .select(col("r.*"))
    def dbl(c: Column): Column = c.cast("double")
    val vi = dbl(col("n")) * dbl(col("sii")) - dbl(col("si")) * dbl(col("si"))
    val vj = dbl(col("n")) * dbl(col("sjj")) - dbl(col("sj")) * dbl(col("sj"))
    val corr = (dbl(col("n")) * dbl(col("sij")) -
      dbl(col("si")) * dbl(col("sj"))) / sqrt(vi * vj)
    st.filter(vi > 0 && vj > 0)
      .select(col("dim_i"), col("dim_j"), col("n"),
        floor(lit(1000000) * corr).cast("long").as("corr_micro"))
      .orderBy("dim_i", "dim_j")
  }

  // vector_pca_power's driver-side iteration cap: 16 BigInt entries per
  // round, so like the Markov cap it is sized for slow spectral gaps,
  // not for cost
  private val PcaMaxRounds = 4096
  private val PcaDims = 16

  /** Measured power-iteration round count of the last [[vectorPcaPower]]
    * run — unrolled by [[pcaOracleSql]] post-run (the markov_stationary
    * oracleGen discipline). */
  private val pcaMeasuredRounds =
    new java.util.concurrent.atomic.AtomicReference[Option[Int]](None)

  /** Normalized-squaring count: the iteration matrix is C^(2^S), so an
    * eigen-ratio r becomes r^1024 — a 0.999-gap chain that would need
    * ~700 direct rounds (measured: 663 at sf0.01, which also overflows
    * DuckDB's expression-depth limit when unrolled) converges in a
    * handful. Each squaring renormalizes to the ±10⁶ fixed-point grid,
    * so entries stay bounded at ANY corpus size and every step is exact
    * integer arithmetic both engines replay identically. */
  private val PcaSquarings = 10

  private def pcaOracleSql(r: Int): String = {
    // every matrix/round CTE is MATERIALIZED: each level references its
    // predecessor twice (self-join / max + rescale), so the default
    // inlining would de-share into 2^levels copies of the embeddings
    // scan — the graph_hits de-sharing trap, fixed on the oracle side
    // with the hint instead of checkpointTruncated
    val sq = (1 to PcaSquarings).map { k =>
      s"""q$k AS MATERIALIZED (SELECT a.i, b.j, sum(a.c * b.c) AS e
         |  FROM c${k - 1} a JOIN c${k - 1} b ON a.j = b.i GROUP BY 1, 2),
         |c$k AS MATERIALIZED (SELECT i, j,
         |  CAST((CASE WHEN e < 0 THEN -1 ELSE 1 END)
         |    * ((abs(e) * 1000000) //
         |       NULLIF((SELECT max(abs(e)) FROM q$k), 0)) AS HUGEINT) AS c
         |  FROM q$k)""".stripMargin
    }.mkString(",\n")
    val steps = (1 to r).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT cm.i AS d, sum(cm.c * v${k - 1}.v) AS raw
         |  FROM c$PcaSquarings cm JOIN v${k - 1} ON cm.j = v${k - 1}.d
         |  GROUP BY 1),
         |m$k AS MATERIALIZED (SELECT max(abs(raw)) AS m,
         |    (SELECT CASE WHEN raw < 0 THEN -1 ELSE 1 END
         |     FROM r$k ORDER BY abs(raw) DESC, d LIMIT 1) AS sg
         |  FROM r$k),
         |v$k AS MATERIALIZED (SELECT d, CAST((SELECT sg FROM m$k)
         |    * (CASE WHEN raw < 0 THEN -1 ELSE 1 END)
         |    * ((abs(raw) * 1000000) // NULLIF((SELECT m FROM m$k), 0))
         |    AS HUGEINT) AS v
         |  FROM r$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS MATERIALIZED (SELECT
       |    [CAST(floor(1000 * CAST(v AS DOUBLE)) AS BIGINT)
       |     FOR v IN embedding[1:$PcaDims]] AS q
       |  FROM embeddings),
       |n_ AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM x),
       |sv AS (SELECT CAST(i AS INT) AS i,
       |    CAST(sum(q[CAST(i AS INT)]) AS HUGEINT) AS si
       |  FROM x CROSS JOIN range(1, ${PcaDims + 1}) t(i) GROUP BY 1),
       |p AS (SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       |    sum(CAST(q[CAST(i AS INT)] AS HUGEINT) * q[CAST(j AS INT)])
       |      AS sij
       |  FROM x CROSS JOIN range(1, ${PcaDims + 1}) t1(i)
       |         CROSS JOIN range(1, ${PcaDims + 1}) t2(j)
       |  GROUP BY 1, 2),
       |cw AS MATERIALIZED (SELECT p.i, p.j,
       |    (SELECT n FROM n_) * p.sij - a.si * b.si AS e
       |  FROM p JOIN sv a ON a.i = p.i JOIN sv b ON b.i = p.j),
       |c0 AS MATERIALIZED (SELECT i, j,
       |  CAST((CASE WHEN e < 0 THEN -1 ELSE 1 END)
       |    * ((abs(e) * 1000000) //
       |       NULLIF((SELECT max(abs(e)) FROM cw), 0)) AS HUGEINT) AS c
       |  FROM cw),
       |$sq,
       |v0 AS (SELECT CAST(i AS INT) AS d, CAST(1000000 AS HUGEINT) AS v
       |       FROM range(1, ${PcaDims + 1}) t(i)),
       |$steps
       |SELECT d AS dim, CAST(v AS BIGINT) AS loading_micro
       |FROM v$r ORDER BY d""".stripMargin
  }

  /** TOP PRINCIPAL COMPONENT of the embedding cloud by power iteration —
    * the dominant-direction audit that closes the index-training triage
    * triad: [[vectorDimStats]] finds sick dimensions, [[vectorDimCorr]]
    * finds redundant PAIRS, and this finds the global direction the
    * encoder concentrates variance into (a large top eigenvalue share
    * means anisotropic embeddings — whitening/centering before cosine
    * retrieval, and OPQ over PQ, are on the table). One row per leading
    * dimension with its loading on the top eigenvector of the exact
    * covariance, scaled so the largest-magnitude loading is ±10⁶.
    *
    * Parity discipline: the covariance never meets a float — values
    * milli-quantize ONCE ([[vectorDimStats]]), the n²-scaled centered
    * matrix C = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ is exact DECIMAL(38,0)/HUGEINT
    * arithmetic, and every iteration round is integer: BigInt
    * matrix-vector product, then a rescale by the max-|entry| via
    * NONNEGATIVE floor DIV with the sign carried separately (the
    * engines disagree on negative integer division — splitting
    * |raw|·10⁶ DIV m from sgn(raw) keeps every division nonnegative,
    * the vector_centroid_drift discipline without the offset), and the
    * whole vector sign-anchored so the max-|raw| entry (ties → lowest
    * dim) is positive — eigenvectors are defined up to ±, the anchor
    * makes the representative deterministic. The iteration matrix is
    * C^(2^[[PcaSquarings]]) via normalized repeated squaring (each
    * squaring renormalizes to the ±10⁶ grid, same sign-split DIV), so a
    * near-unit eigen-ratio collapses BEFORE the vector loop — the
    * direct iteration measured 663 rounds on the near-isotropic
    * fixture, past DuckDB's unroll depth; squared, it fixpoints in a
    * handful. Iteration runs to the integer FIXPOINT with
    * first-revisit cycle detection and the measured round count replays
    * in the oracle as chained CTEs over DuckDB's own
    * independently-computed and independently-squared C (the
    * [[pcaOracleSql]] unroll), so the hash match certifies the
    * sufficient statistics, every squaring, every round, and the
    * stopping rule.
    *
    * Plan: ONE corpus-sized no-group partial+final aggregate carries all
    * 153 exact sums (the [[vectorDimCorr]] wide-buffer shape — O(d²)
    * work per row, one O(d²)-column row per partition through the
    * exchange); the iteration state is d² BigInts, driver-side under the
    * BPE/Markov bounded-collect discipline — identical at any corpus
    * size because the dimension count, not the row count, bounds it. */
  val vectorPcaPower: Q = Q.noOracle("vector_pca_power") { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val dims = PcaDims
    val q = slice(transform(col("embedding"),
      v => floor(lit(1000) * v.cast("double")).cast("long")), 1, dims)
    def at(i: Int): Column = element_at(col("q"), i)
    val pairIdx = for (i <- 1 to dims; j <- i to dims) yield (i, j)
    val sums: Seq[Column] =
      (1 to dims).map(i => sum(at(i)).cast(dec38).as(s"s$i")) ++
      pairIdx.map { case (i, j) =>
        sum(at(i).cast(dec38) * at(j)).as(s"p${i}_$j") }
    val row = Tables.embeddings(s, d).select(q.as("q"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .head() // the bounded collect: 1 row × (1 + d + d(d+1)/2) columns
    val n = BigInt(row.getAs[Long]("n"))
    def big(name: String): BigInt =
      BigInt(row.getAs[java.math.BigDecimal](name).toBigInteger)
    val sVec = (1 to dims).map(i => big(s"s$i"))
    val cRaw = Array.tabulate(dims, dims) { (i0, j0) =>
      val (i, j) = (i0 + 1, j0 + 1)
      val sij = if (i <= j) big(s"p${i}_$j") else big(s"p${j}_$i")
      n * sij - sVec(i0) * sVec(j0)
    }
    val million = BigInt(1000000)
    // renormalize a matrix to the ±10⁶ fixed-point grid — sign carried
    // separately so the floor DIV is always nonnegative (both engines
    // agree), entries bounded at any corpus size
    def normalize(m: Array[Array[BigInt]]): Array[Array[BigInt]] = {
      val mx = m.flatten.map(_.abs).max
      require(mx > BigInt(0),
        "vector_pca_power: the centered covariance is identically zero " +
        "(all-constant embeddings); no dominant direction exists.")
      m.map(_.map { e =>
        val sg = if (e < 0) BigInt(-1) else BigInt(1)
        sg * ((e.abs * million) / mx)
      })
    }
    // iterate with C^(2^PcaSquarings): each squaring renormalizes, so a
    // near-unit eigen-ratio collapses before the vector loop starts
    var cMat = normalize(cRaw)
    for (_ <- 1 to PcaSquarings) {
      val sqd = Array.tabulate(dims, dims) { (i, j) =>
        (0 until dims).map(k => cMat(i)(k) * cMat(k)(j)).sum
      }
      cMat = normalize(sqd)
    }
    def step(cur: IndexedSeq[BigInt]): IndexedSeq[BigInt] = {
      val raw = (0 until dims).map(i =>
        (0 until dims).map(j => cMat(i)(j) * cur(j)).sum)
      val m = raw.map(_.abs).max
      require(m > BigInt(0),
        "vector_pca_power: C·v vanished — the covariance matrix " +
        "annihilates the iterate (degenerate all-constant embeddings); " +
        "no dominant direction exists to report.")
      // anchor = max-|raw| entry, ties to the lowest dim; its sign
      // flips the whole vector so the representative is deterministic
      val anchor = raw.zipWithIndex.minBy { case (v, i) => (-v.abs, i) }._1
      val sg = if (anchor < 0) BigInt(-1) else BigInt(1)
      raw.map { r =>
        val s0 = if (r < 0) BigInt(-1) else BigInt(1)
        sg * s0 * ((r.abs * million) / m)
      }
    }
    var v: IndexedSeq[BigInt] = IndexedSeq.fill(dims)(million)
    val seen = scala.collection.mutable.Set[IndexedSeq[BigInt]](v)
    var rounds = 0
    var done = false
    while (!done && rounds < PcaMaxRounds) {
      val next = step(v)
      rounds += 1
      if (next == v) done = true
      else if (!seen.add(next)) { v = next; done = true } // limit cycle:
        // stop deterministically at the first revisited state
      else v = next
    }
    require(done,
      s"vector_pca_power did not converge in $PcaMaxRounds rounds")
    pcaMeasuredRounds.set(Some(rounds))
    import s.implicits._
    (1 to dims).map(i => (i, v(i - 1).toLong)).toDF("dim", "loading_micro")
  }.copy(
    eager = true, // sufficient-stat collect + driver iteration at build
    oracleGen = Some(() => pcaMeasuredRounds.get().map(pcaOracleSql)))

  /** L2-NORM CENSUS over the embedding table — the row-level health gate
    * that complements [[vectorDimStats]]'s per-dimension view: encoders
    * that collapse emit near-zero vectors (cosine against them is
    * noise), and scale bugs emit rogue-magnitude rows that dominate any
    * un-normalized dot product — both invisible in per-dimension stats
    * when the bad rows are few. One row per quarter-unit norm bucket
    * with the count and the exact min/max norm inside it; the zero
    * bucket IS the dead-vector count.
    *
    * Parity discipline: values milli-quantize ONCE ([[vectorDimStats]]);
    * norm² is an exact BIGINT sum of squares; the only real-number op is
    * one correctly-rounded `sqrt` per row, floor-quantized immediately
    * (the PSI one-transcendental discipline — and √ is IEEE
    * correctly-rounded, not even libm-risky); bucketing is a nonneg
    * floor DIV of that integer. Plan: per-row narrow arithmetic (a
    * codegen'd HOF fold, no explode), then ONE partial+final aggregate
    * on the bounded bucket domain. */
  val vectorNormCensus: Q = Q(
    "vector_norm_census",
    """WITH q AS (SELECT vec_id,
      |    [CAST(floor(1000 * CAST(v AS DOUBLE)) AS BIGINT)
      |     FOR v IN embedding] AS qs
      |  FROM embeddings),
      |n2 AS (SELECT vec_id,
      |    CAST(list_sum([x * x FOR x IN qs]) AS BIGINT) AS norm2
      |  FROM q),
      |nm AS (SELECT vec_id,
      |    CAST(floor(sqrt(CAST(norm2 AS DOUBLE))) AS BIGINT) AS norm_milli
      |  FROM n2)
      |SELECT norm_milli // 250 AS bucket, CAST(count(*) AS BIGINT) AS n,
      |  min(norm_milli) AS min_norm_milli,
      |  max(norm_milli) AS max_norm_milli
      |FROM nm GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val q = transform(col("embedding"),
      v => floor(lit(1000) * v.cast("double")).cast("long"))
    val norm2 = aggregate(q, lit(0L), (acc, x) => acc + x * x)
    val normMilli =
      floor(sqrt(norm2.cast("double"))).cast("long").as("norm_milli")
    Tables.embeddings(s, d)
      .select(normMilli)
      .groupBy(expr("norm_milli div 250").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("norm_milli")).as("min_norm_milli"),
        max(col("norm_milli")).as("max_norm_milli"))
  }

  /** Deterministic ±1 sign for the JL projection cell (k, i) — modular
    * mixing only, so both engines compute it in exact integers. */
  private def rpSign(k: Int, i: Int): Int =
    if ((i * 37 + k * 101 + i * k * 7) % 97 % 2 == 0) 1 else -1

  private val RpDims = 16

  /** JOHNSON–LINDENSTRAUSS RANDOM-PROJECTION recall eval — the third
    * dimension-reduction serving path next to [[vectorMatryoshkaTopk]]
    * (prefix dims — needs a matryoshka-trained encoder) and
    * [[vectorPq]] (codebooks — needs training): a DATA-INDEPENDENT ±1
    * projection to 16 dims that works on any embedding with zero
    * training, the classic JL sketch. Candidates rank by cosine in the
    * projected space; recall@20 against the exact full-dimension
    * ranking tells you whether 4× dimension compression is survivable
    * on this corpus. On THIS fixture it is NOT (recall@20 ≈ 0.05–0.15):
    * the embedding cloud is near-isotropic (the [[vectorPcaPower]]
    * finding — no dominant directions), so 16 JL dims carry
    * ε ≈ √(ln n / d) ≈ 0.8 distortion and neighborhoods dissolve — the
    * honest NO-GO that saves a mis-provisioned index build; the
    * data-ADAPTIVE reductions (matryoshka, PQ) are what to evaluate
    * next.
    *
    * Parity discipline: the projection is EXACT INTEGER — milli-
    * quantized inputs, ±1 signs from modular arithmetic ([[rpSign]],
    * mirrored as a CASE in the oracle), BIGINT sums; the projected and
    * exact cosines are shared scalar IEEE expressions; the top-20 cuts
    * total-order on (score, vec_id).
    *
    * Plan: the projection is a per-row map (16 sign-folded sums, the
    * vector_dim_corr literal-indexed style — no explode); queries ride
    * a 5-row broadcast; both rankings are per-query TakeOrdered
    * windows. At 100 TB the projected space is where the banding/IVF
    * index would be built — this query measures what that index loses. */
  val vectorRpRecall: Q = Q(
    "vector_rp_recall", {
      val cos = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH b AS (SELECT vec_id,
         |    [CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT)
         |     FOR x IN embedding] AS q,
         |    [CAST(x AS DOUBLE) FOR x IN embedding] AS fv
         |  FROM embeddings),
         |pr AS (SELECT vec_id, CAST(k AS INT) AS k,
         |    CAST(sum(CASE WHEN (i * 37 + k * 101 + i * k * 7) % 97 % 2 = 0
         |             THEN q[CAST(i AS INT) + 1]
         |             ELSE -q[CAST(i AS INT) + 1] END) AS BIGINT) AS pk
         |  FROM b CROSS JOIN range(0, $RpDims) t1(k)
         |         CROSS JOIN range(0, ${Dim}) t2(i)
         |  GROUP BY 1, 2),
         |ep AS (SELECT vec_id, k, pk FROM pr WHERE vec_id >= 5),
         |qp AS (SELECT vec_id AS q_id, k, pk FROM pr WHERE vec_id < 5),
         |pc AS (SELECT qp.q_id, ep.vec_id,
         |    CAST(sum(CAST(ep.pk AS HUGEINT) * qp.pk) AS DOUBLE)
         |      / (sqrt(CAST(sum(CAST(ep.pk AS HUGEINT) * ep.pk) AS DOUBLE))
         |         * sqrt(CAST(sum(CAST(qp.pk AS HUGEINT) * qp.pk) AS DOUBLE)))
         |      AS pcos
         |  FROM ep JOIN qp USING (k) GROUP BY 1, 2),
         |ann AS (SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id
         |                         ORDER BY pcos DESC, vec_id) AS rn
         |    FROM pc) WHERE rn <= 20),
         |e AS (SELECT vec_id, fv AS v FROM b WHERE vec_id >= 5),
         |qq AS (SELECT vec_id AS q_id, fv AS qv FROM b WHERE vec_id < 5),
         |ex AS (SELECT q_id, vec_id FROM (
         |    SELECT qq.q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY qq.q_id
         |                         ORDER BY $cos DESC, e.vec_id) AS rn
         |    FROM e CROSS JOIN qq) WHERE rn <= 20)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL
         |       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(sum(CASE WHEN ann.vec_id IS NOT NULL
         |       THEN 1 ELSE 0 END), 0) AS DOUBLE) / count(*) AS recall
         |FROM ex LEFT JOIN ann ON ex.q_id = ann.q_id
         |                      AND ex.vec_id = ann.vec_id
         |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
    }
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val qCol = transform(col("embedding"),
      v => floor(lit(1000) * v.cast("double")).cast("long"))
    // 16 sign-folded exact sums. The sign matrix rides ONE literal
    // (16×64 longs) consumed by a HOF fold — the unrolled-sum form
    // was the catalog's largest codegen unit (1024 arithmetic nodes)
    // and concentrated pass-0 JIT (VERDICT r10 task 5); the fold is
    // value-identical (exact longs, order-free) at a fraction of the
    // compiled size.
    val signs = typedLit((0 until RpDims).map(k =>
      (0 until Dim).map(i => rpSign(k, i).toLong)))
    val pCol = transform(signs, srow =>
      aggregate(zip_with(col("q"), srow, (x, sg) => x * sg),
        lit(0L), (acc, x) => acc + x))
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), qCol.as("q"),
        toDouble(col("embedding")).as("fv"))
      .select(col("vec_id"), col("fv"), pCol.as("p"))
    def pdot(a: Column, b: Column): Column =
      (0 until RpDims).map(k =>
        element_at(a, k + 1) * element_at(b, k + 1)).reduce(_ + _)
    val ep = base.filter(col("vec_id") >= 5).select(col("vec_id"), col("p"))
    val qp = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("p").as("pq"))
    val pcos = pdot(col("p"), col("pq")).cast("double") /
      (sqrt(pdot(col("p"), col("p")).cast("double")) *
       sqrt(pdot(col("pq"), col("pq")).cast("double")))
    val wq = Window.partitionBy("q_id").orderBy(desc("pcos"), asc("vec_id"))
    val ann = ep.crossJoin(broadcast(qp))
      .select(col("q_id"), col("vec_id"), pcos.as("pcos"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    val e = base.filter(col("vec_id") >= 5).select(col("vec_id"), col("fv").as("v"))
    val qq = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("fv").as("qv"))
    val wx = Window.partitionBy("q_id").orderBy(desc("cosine"), asc("vec_id"))
    val exact = e.crossJoin(broadcast(qq))
      .select(col("q_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cosine"))
      .withColumn("rn", row_number().over(wx)).filter(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"))
    exact.join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0)).cast("long").as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }

  /** COSINE NULL-DISTRIBUTION calibration — the histogram you read
    * BEFORE setting [[Dedup]]'s cosine threshold or
    * [[vectorRangeSearch]]'s radius: a "0.8 similarity" only means
    * something relative to what UNRELATED pairs score, and that null
    * depends on the embedding geometry (non-centered encoders push all
    * cosines high; this fixture's do). Disjoint deterministic pairs
    * (vec 2k vs 2k+1 — an equi-join, no sampling RNG, every vector in
    * at most one pair) score once, then a 41-bucket histogram over
    * [−1, 1] with exact min/max per bucket. The threshold that starts
    * ABOVE this histogram's right tail is the defensible one.
    *
    * Parity discipline: the cosine is the long-green float→double
    * shared kernel ([[cosine]]); it quantizes ONCE per pair to micro
    * units, and the bucket is a nonnegative floor DIV of the +10⁶
    * OFFSET value (cosines are signed — the vector_centroid_drift
    * offset trick keeps the engines' negative-division conventions out
    * of the value path).
    *
    * Plan: one equi-join on the derived pair key (both sides hash on
    * it — no broadcast needed, no cartesian), one bounded histogram
    * aggregate. */
  val vectorCosCalibration: Q = Q(
    "vector_cos_calibration", {
      val cos = "list_sum([v[i]*qv[i] FOR i IN range(1, len(v)+1)]) / " +
        "(sqrt(list_sum([x*x FOR x IN v])) * sqrt(list_sum([x*x FOR x IN qv])))"
      s"""WITH a AS (SELECT vec_id // 2 AS pk,
         |    [CAST(x AS DOUBLE) FOR x IN embedding] AS v
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |b AS (SELECT vec_id // 2 AS pk,
         |    [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |p AS (SELECT CAST(floor(1000000 * ($cos)) AS BIGINT) AS cm
         |      FROM a JOIN b USING (pk))
         |SELECT CAST((cm + 1000000) // 50000 AS INT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  min(cm) AS min_cos_micro, max(cm) AS max_cos_micro
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    }
  ) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val a = emb.filter(col("vec_id") % 2 === 0)
      .select(expr("vec_id div 2").as("pk"),
        toDouble(col("embedding")).as("v"))
    val b = emb.filter(col("vec_id") % 2 === 1)
      .select(expr("vec_id div 2").as("pk"),
        toDouble(col("embedding")).as("qv"))
    a.join(b, Seq("pk"))
      .select(floor(lit(1000000) * cosine(col("v"), col("qv")))
        .cast("long").as("cm"))
      .groupBy(expr("CAST((cm + 1000000) div 50000 AS INT)").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        min(col("cm")).as("min_cos_micro"),
        max(col("cm")).as("max_cos_micro"))
  }

  /** RANKING-QUALITY EVAL (NDCG@10 + MRR@10) of the exact nearest-neighbor
    * ranking against same-label relevance — the metric pair every retrieval
    * eval harness reports next to recall (recall counts hits; NDCG grades
    * WHERE they landed, MRR grades how soon the first one lands). Queries
    * are the [[vectorRpRecall]] convention (vec_id < 5), corpus is the
    * rest; a corpus item is relevant iff it shares the query's label.
    *
    * Exactness: components quantize once to milli-units and the ranking
    * key is the exact BIGINT squared L2 distance with vec_id tie-break —
    * no float ordering surface. The DCG discount 1/log2(rank+1) is
    * irrational, so the weights ship as TEN INTEGER LITERALS
    * (floor(10⁶/log2(i+1)), identical constants in both engines); DCG and
    * IDCG are then exact integer sums and NDCG one integer division —
    * the engines cannot disagree in the last ulp because there are no
    * floats anywhere. IDCG uses the standard ideal ranking: min(10, R)
    * relevant items stacked on top (R = corpus count of the query's
    * label), read from a literal prefix-sum array. MRR@10 is
    * 10⁶ // first-relevant-rank, 0 when no relevant lands in the top 10.
    *
    * Plan: the 5-row query frame BROADCASTS across one corpus stream
    * (per-row work = |Q| codegen distance kernels, no shuffle); the only
    * exchange is the |Q|-keyed rank window, and everything after the
    * rn ≤ 10 cut is O(|Q|) rows. At 100 TB the corpus is touched once;
    * this is an EVAL (like [[vectorRpRecall]]) — the serving paths are
    * the ANN queries it grades. */
  val vectorNdcgMrr: Q = Q(
    "vector_ndcg_mrr",
    """WITH b AS (SELECT vec_id, label,
      |    [CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT)
      |     FOR x IN embedding] AS q
      |  FROM embeddings),
      |c AS (SELECT vec_id, label, q FROM b WHERE vec_id >= 5),
      |qs AS (SELECT vec_id AS q_id, label AS q_label, q AS qq
      |       FROM b WHERE vec_id < 5),
      |w(i, wt) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
      |  (4, 430676), (5, 386852), (6, 356207), (7, 333333),
      |  (8, 315464), (9, 301029), (10, 289064)),
      |lc AS (SELECT label, count(*) AS n_rel FROM c GROUP BY 1),
      |nr AS (SELECT q_id, q_label, COALESCE(lc.n_rel, 0) AS n_rel
      |       FROM qs LEFT JOIN lc ON lc.label = qs.q_label),
      |dd AS (SELECT qs.q_id, qs.q_label, c.vec_id, c.label,
      |    list_sum([(qs.qq[i] - c.q[i]) * (qs.qq[i] - c.q[i])
      |              FOR i IN range(1, 65)]) AS d
      |  FROM qs CROSS JOIN c),
      |r AS (SELECT q_id, q_label, label,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rn
      |  FROM dd),
      |t AS (SELECT r.q_id, r.q_label,
      |    CAST(count(CASE WHEN r.label = r.q_label THEN 1 END) AS BIGINT)
      |      AS n_rel_at10,
      |    CAST(COALESCE(sum(CASE WHEN r.label = r.q_label THEN w.wt END), 0)
      |      AS BIGINT) AS dcg_ppm,
      |    min(CASE WHEN r.label = r.q_label THEN r.rn END) AS first_rel
      |  FROM r JOIN w ON w.i = r.rn
      |  WHERE r.rn <= 10 GROUP BY 1, 2),
      |ic AS (SELECT nr.q_id, nr.q_label, nr.n_rel,
      |    CAST(COALESCE(sum(w.wt), 0) AS BIGINT) AS idcg_ppm
      |  FROM nr LEFT JOIN w ON w.i <= least(10, nr.n_rel)
      |  GROUP BY 1, 2, 3)
      |SELECT ic.q_id, ic.q_label AS label,
      |  CAST(ic.n_rel AS BIGINT) AS n_rel, t.n_rel_at10, t.dcg_ppm,
      |  ic.idcg_ppm,
      |  CAST(CASE WHEN ic.idcg_ppm > 0
      |       THEN (1000000 * t.dcg_ppm) // ic.idcg_ppm ELSE 0 END
      |    AS BIGINT) AS ndcg_ppm,
      |  CAST(CASE WHEN t.first_rel IS NULL THEN 0
      |       ELSE 1000000 // t.first_rel END AS BIGINT) AS rr_ppm
      |FROM ic JOIN t ON t.q_id = ic.q_id
      |ORDER BY ic.q_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wts = Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val prefix = wts.scanLeft(0L)(_ + _).tail // prefix[i] = sum of w[1..i]
    val b = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(toDouble(col("embedding")),
          x => floor(x * 1000).cast("long")).as("q"))
    val c = b.filter(col("vec_id") >= 5)
    val qs = b.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("q").as("qq"))
    val lc = c.groupBy(col("label").as("rl"))
      .agg(count(lit(1)).as("n_rel0"))
    val nr = qs.select("q_id", "q_label")
      .join(broadcast(lc), col("q_label") === col("rl"), "left")
      .select(col("q_id"), col("q_label"),
        coalesce(col("n_rel0"), lit(0L)).as("n_rel"))
    val wr = Window.partitionBy("q_id").orderBy(asc("d"), asc("vec_id"))
    val t = c.crossJoin(broadcast(qs))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        aggregate(zip_with(col("qq"), col("q"), (a, v) => (a - v) * (a - v)),
          lit(0L), (acc, v) => acc + v).as("d"))
      .withColumn("rn", row_number().over(wr)).filter(col("rn") <= 10)
      .withColumn("wt", element_at(typedlit(wts), col("rn").cast("int")))
      .groupBy("q_id", "q_label")
      .agg(count(when(col("label") === col("q_label"), 1)).as("n_rel_at10"),
        coalesce(sum(when(col("label") === col("q_label"), col("wt"))),
          lit(0L)).as("dcg_ppm"),
        min(when(col("label") === col("q_label"), col("rn")))
          .as("first_rel"))
    nr.join(t, Seq("q_id", "q_label"))
      .select(col("q_id"), col("q_label").as("label"), col("n_rel"),
        col("n_rel_at10"), col("dcg_ppm"),
        when(col("n_rel") > 0,
          element_at(typedlit(prefix),
            least(lit(10L), col("n_rel")).cast("int")))
          .otherwise(lit(0L)).as("idcg_ppm"),
        col("first_rel"))
      .select(col("q_id"), col("label"), col("n_rel"), col("n_rel_at10"),
        col("dcg_ppm"), col("idcg_ppm"),
        when(col("idcg_ppm") > 0,
          expr("(1000000 * dcg_ppm) div idcg_ppm"))
          .otherwise(lit(0L)).cast("long").as("ndcg_ppm"),
        when(col("first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 div first_rel")).cast("long")
          .as("rr_ppm"))
  }

  // ---- graph-based ANN (NSW greedy routing) ------------------------------

  private val NswBaseCap = 1024
  private val NswK = 6
  private val NswHops = 8
  private val NswEf = 8

  /** Trained NSW artifact: the directed kNN graph over the capped base
    * set (each base's [[NswK]] nearest bases by cosine, id tie-break) —
    * memoized per corpus fingerprint like the IVF centroids. */
  private val nswEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Long)]]()
  @volatile private var lastNswKey: Option[String] = None

  private def nswEdges(s: SparkSession, d: String): Array[(Long, Long)] = {
    val key = embeddingsFingerprint(s, d)
    val e = ArtifactCaches.memo("vectors.nsw", nswEdgeCache)(key)(_ => {
      val bases = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .filter(col("vec_id") % 31 =!= 0)
        .orderBy("vec_id").limit(NswBaseCap)
      val a = bases.select(col("vec_id").as("src"), col("v").as("av"))
      val b = bases.select(col("vec_id").as("dst"), col("v").as("bv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(desc("cs"), asc("dst"))
      a.join(b, col("src") =!= col("dst"))
        .select(col("src"), col("dst"), cosine(col("av"), col("bv")).as("cs"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= NswK)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    })
    lastNswKey = Some(key)
    e
  }

  private def cachedNswEdges: Option[Array[(Long, Long)]] =
    lastNswKey.flatMap(k => Option(nswEdgeCache.get(k)))

  /** DuckDB mirror of [[vectorNswSearch]]: the trained edge list inlines
    * as VALUES (the [[ivfOracleSql]] trained-artifact discipline), the
    * greedy walk unrolls as [[NswHops]] chained single-reference CTEs
    * (the vector_mmr_rerank unroll pattern), and every cosine is the
    * shared left-fold kernel — so entry, each routing decision, the
    * exact ranking, and the recall flags all hash-compare bit-exactly. */
  private def nswOracleSql(edges: Array[(Long, Long)]): String = {
    val entry = edges.map(_._1).min
    val nodes = edges.map(_._1).distinct.sorted
    val vals = (edges.toSeq ++ nodes.map(n => (n, n)))
      .map { case (a, b) => s"($a,$b)" }.mkString(",")
    val hops = (1 to NswHops).map { i =>
      s"""h$i AS (SELECT query_id, nxt AS cur FROM (
         |  SELECT c.query_id, c.nxt,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY ${cosSql("bb.v", "q.qv")} DESC, c.nxt) AS rn
         |  FROM (SELECT DISTINCT h.query_id, eg.nxt
         |        FROM h${i - 1} h JOIN eg ON eg.cur = h.cur) c
         |  JOIN b bb ON bb.vec_id = c.nxt
         |  JOIN q ON q.query_id = c.query_id) WHERE rn <= $NswEf)"""
        .stripMargin
    }.mkString(",\n")
    val hN = s"h$NswHops"
    val hP = s"h${NswHops - 1}"
    s"""WITH eg(cur, nxt) AS (SELECT * FROM (VALUES $vals) t(cur, nxt)),
       |q AS MATERIALIZED (SELECT vec_id AS query_id,
       |    [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |  FROM embeddings WHERE vec_id % 31 = 0),
       |b AS MATERIALIZED (SELECT vec_id,
       |    [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |  FROM embeddings
       |  WHERE vec_id IN (SELECT DISTINCT cur FROM eg)),
       |h0 AS (SELECT query_id, CAST($entry AS BIGINT) AS cur FROM q),
       |$hops,
       |ex AS MATERIALIZED (SELECT q.query_id, bb.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${cosSql("bb.v", "q.qv")} DESC, bb.vec_id) AS rn
       |  FROM q CROSS JOIN b bb),
       |fb AS (SELECT query_id, cur, cs FROM (
       |  SELECT x.query_id, x.cur, x.cs,
       |    row_number() OVER (PARTITION BY x.query_id
       |      ORDER BY x.cs DESC, x.cur) AS rn
       |  FROM (SELECT $hN.query_id, $hN.cur, ${cosSql("bb.v", "q.qv")} AS cs
       |        FROM $hN JOIN b bb ON bb.vec_id = $hN.cur
       |        JOIN q ON q.query_id = $hN.query_id) x) WHERE rn = 1),
       |bo AS (SELECT $hN.query_id, CAST(count(*) AS BIGINT) AS ov
       |  FROM $hN JOIN ex ON ex.query_id = $hN.query_id
       |    AND ex.vec_id = $hN.cur AND ex.rn <= 10
       |  GROUP BY 1),
       |d8 AS (SELECT query_id,
       |    string_agg(CAST(cur AS VARCHAR), ',' ORDER BY cur) AS sig
       |  FROM $hN GROUP BY 1),
       |d7 AS (SELECT query_id,
       |    string_agg(CAST(cur AS VARCHAR), ',' ORDER BY cur) AS sig
       |  FROM $hP GROUP BY 1)
       |SELECT fb.query_id, fb.cur AS nsw_id, fb.cs AS nsw_cos,
       |  e1.vec_id AS exact_id,
       |  fb.cur = e1.vec_id AS hit_top1,
       |  t10.vec_id IS NOT NULL AS hit_top10,
       |  CAST(coalesce(bo.ov, 0) AS BIGINT) AS beam_overlap10,
       |  d8.sig = d7.sig AS converged
       |FROM fb
       |JOIN ex e1 ON e1.query_id = fb.query_id AND e1.rn = 1
       |LEFT JOIN ex t10 ON t10.query_id = fb.query_id
       |  AND t10.vec_id = fb.cur AND t10.rn <= 10
       |LEFT JOIN bo ON bo.query_id = fb.query_id
       |JOIN d8 ON d8.query_id = fb.query_id
       |JOIN d7 ON d7.query_id = fb.query_id
       |ORDER BY fb.query_id""".stripMargin
  }

  /** HUBNESS CENSUS of the exact kNN graph — the index-training triage
    * for THE known high-dimensional pathology (k-occurrence skew): a few
    * points become HUBS that appear in a large fraction of kNN lists
    * while anti-hubs (in-degree 0) never appear, which silently degrades
    * every kNN-graph consumer — [[vectorNswSearch]]'s navigability,
    * [[knnJoinLsh]]'s pair quality, kNN-classifier calibration. Output:
    * the in-degree histogram of the same capped-base k=[[NswK]] graph
    * the NSW index routes on (share in ppm per in-degree) — a long right
    * tail plus a fat zero bucket is the hubness signature that says
    * "reduce dimensionality or re-normalize before trusting kNN".
    *
    * Parity: the graph is fully deterministic (cosine rank with id
    * tie-breaks over the SQL-definable base set), so the oracle is
    * STATIC SQL — no trained-artifact inlining; counts exact BIGINT,
    * share is floor-DIV ppm off a window total (single-reference frame).
    * Plan: the pairwise stage is bounded by the base cap (production
    * would LSH-bucket it, [[knnJoinLsh]]); the census is two tiny
    * aggregates. */
  val vectorHubness: Q = Q(
    "vector_hubness",
    s"""WITH b AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding]
       |    AS v
       |  FROM embeddings WHERE vec_id % 31 <> 0
       |  ORDER BY vec_id LIMIT $NswBaseCap),
       |pr AS (SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst)
       |      AS rn
       |  FROM (SELECT a.vec_id AS src, c.vec_id AS dst,
       |          ${cosSql("a.v", "c.v")} AS cs
       |        FROM b a JOIN b c ON a.vec_id <> c.vec_id) p),
       |e AS (SELECT dst FROM pr WHERE rn <= $NswK),
       |ind AS (SELECT b.vec_id, CAST(coalesce(d.k, 0) AS BIGINT) AS in_deg
       |  FROM b LEFT JOIN (SELECT dst, CAST(count(*) AS BIGINT) AS k
       |                    FROM e GROUP BY 1) d ON d.dst = b.vec_id),
       |hist AS (SELECT in_deg, CAST(count(*) AS BIGINT) AS n_bases
       |         FROM ind GROUP BY 1)
       |SELECT in_deg, n_bases,
       |  CAST((1000000 * n_bases) // CAST(sum(n_bases) OVER () AS BIGINT)
       |    AS BIGINT) AS share_ppm
       |FROM hist ORDER BY in_deg""".stripMargin
  ) { (s, d) =>
    val bases = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") % 31 =!= 0)
      .orderBy("vec_id").limit(NswBaseCap)
    val a = bases.select(col("vec_id").as("src"), col("v").as("av"))
    val c = bases.select(col("vec_id").as("dst"), col("v").as("bv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("cs"), asc("dst"))
    val e = a.join(c, col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("av"), col("bv")).as("cs"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= NswK)
      .select(col("dst"))
    val indeg = e.groupBy("dst").agg(count(lit(1)).as("k"))
    val ind = bases.select(col("vec_id"))
      .join(indeg, col("vec_id") === col("dst"), "left")
      .select(coalesce(col("k"), lit(0L)).as("in_deg"))
    ind.groupBy("in_deg").agg(count(lit(1)).as("n_bases"))
      .withColumn("share_ppm",
        expr("(1000000 * n_bases) div (sum(n_bases) over ())")
          .cast("long"))
      .orderBy("in_deg")
  }

  /** DuckDB mirror of [[vectorResidualEnergy]]: trained centroids inline
    * as literals ([[ivfOracleSql]] discipline), assignment is the same
    * `arg_max` ≡ `max_by`, and the energy ratio is one shared IEEE
    * expression over three left-fold dot products. */
  private def residualEnergyOracleSql(cents: Seq[Seq[Double]]): String =
    s"""WITH cents AS (SELECT j AS cid, pv AS cv FROM (VALUES
       |    ${planesSql(cents)}) c(j, pv)),
       |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |      FROM embeddings WHERE vec_id <> 0),
       |asg AS (SELECT vec_id, arg_max(cid, cs) AS cell, first(v) AS v
       |        FROM (SELECT vec_id, v, cid, ${cosSql("v", "cv")} AS cs
       |              FROM e CROSS JOIN cents)
       |        GROUP BY vec_id),
       |dots AS (SELECT asg.cell,
       |    list_sum([x * x FOR x IN v]) AS nx,
       |    list_sum([v[i] * cv[i] FOR i IN range(1, len(v)+1)]) AS d,
       |    list_sum([x * x FOR x IN cv]) AS nc
       |  FROM asg JOIN cents ON cents.cid = asg.cell),
       |r AS (SELECT cell,
       |    CAST(floor(1000000 * ((nx - 2 * d + nc) / nx)) AS BIGINT)
       |      AS ppm
       |  FROM dots WHERE nx > 0)
       |SELECT CAST(cell AS INT) AS cell, CAST(count(*) AS BIGINT)
       |    AS n_members,
       |  CAST(sum(ppm) // count(*) AS BIGINT) AS mean_residual_ppm,
       |  CAST(min(ppm) AS BIGINT) AS min_residual_ppm,
       |  CAST(max(ppm) AS BIGINT) AS max_residual_ppm
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** IVF RESIDUAL-ENERGY census — the quantizer-quality readout that
    * decides whether a coarse index needs more cells or a finer product
    * quantizer on top: per cell, how much of its members' energy the
    * centroid FAILS to explain (‖x − c‖²/‖x‖² in ppm — ~10⁶ means the
    * centroid removes nothing and PQ codes will burn bits on what the
    * coarse step should have absorbed; the number IVF-PQ papers size
    * codebooks by). Reuses [[vectorAnnIvf]]'s trained centroids (same
    * memoized artifact, same `max_by` cosine assignment), so the census
    * audits the index the catalog actually serves.
    *
    * Parity: the three dot products are the shared left-fold kernels;
    * the energy ratio is ONE identical IEEE expression, floor-quantized
    * per row BEFORE the exact-integer per-cell mean (no engine-ordered
    * double sum); zero-norm rows are excluded by a mirrored WHERE.
    *
    * Plan: assignment is the k-broadcast narrow pass the IVF family
    * pays; the census is one partial+final aggregate on the k-cell key.
    */
  val vectorResidualEnergy: Q = Q.noOracle("vector_residual_energy") {
    (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          toDouble(col("embedding")).as("v"))
        .filter(col("vec_id") =!= 0)
      val centroids = ivfCentroids(emb,
        cacheKey = Some(embeddingsFingerprint(s, d)))
      val dots = assignCells(emb, centroids)
        .join(broadcast(centroids), col("cell") === col("cid"))
        .select(col("cell"),
          dotNative(col("v"), col("v")).as("nx"),
          dotNative(col("v"), col("cv")).as("d"),
          dotNative(col("cv"), col("cv")).as("nc"))
      dots.filter(col("nx") > 0)
        .select(col("cell"),
          floor(lit(1000000) * ((col("nx") - lit(2) * col("d") +
            col("nc")) / col("nx"))).cast("long").as("ppm"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_members"),
          expr("sum(ppm) div count(*)").as("mean_residual_ppm"),
          min(col("ppm")).as("min_residual_ppm"),
          max(col("ppm")).as("max_residual_ppm"))
        .select(col("cell").cast("int").as("cell"), col("n_members"),
          col("mean_residual_ppm"), col("min_residual_ppm"),
          col("max_residual_ppm"))
  }.copy(
    eager = true, // shares the memoized IVF training collect
    oracleGen = Some(() =>
      cachedIvfCentroids.map(cs =>
        residualEnergyOracleSql(cs.map(_.toSeq).toSeq))))

  private val NswEfSweep = Seq(1, 4, 8)

  /** DuckDB mirror of [[vectorEfSweep]]: three unrolled beam walks (one
    * per ef) over the same inlined edge list, each aggregated to its
    * recall row — the [[nswOracleSql]] discipline at sweep width. */
  private def nswSweepOracleSql(edges: Array[(Long, Long)]): String = {
    val entry = edges.map(_._1).min
    val nodes = edges.map(_._1).distinct.sorted
    val vals = (edges.toSeq ++ nodes.map(n => (n, n)))
      .map { case (a, b) => s"($a,$b)" }.mkString(",")
    def chain(pfx: String, ef: Int): String = {
      val hops = (1 to NswHops).map { i =>
        s"""${pfx}$i AS (SELECT query_id, nxt AS cur FROM (
           |  SELECT c.query_id, c.nxt,
           |    row_number() OVER (PARTITION BY c.query_id
           |      ORDER BY ${cosSql("bb.v", "q.qv")} DESC, c.nxt) AS rn
           |  FROM (SELECT DISTINCT h.query_id, eg.nxt
           |        FROM ${pfx}${i - 1} h JOIN eg ON eg.cur = h.cur) c
           |  JOIN b bb ON bb.vec_id = c.nxt
           |  JOIN q ON q.query_id = c.query_id) WHERE rn <= $ef)"""
          .stripMargin
      }.mkString(",\n")
      s"""${pfx}0 AS (SELECT query_id, CAST($entry AS BIGINT) AS cur
         |  FROM q),
         |$hops,
         |${pfx}fb AS (SELECT query_id, cur FROM (
         |  SELECT x.query_id, x.cur,
         |    row_number() OVER (PARTITION BY x.query_id
         |      ORDER BY x.cs DESC, x.cur) AS rn
         |  FROM (SELECT h.query_id, h.cur, ${cosSql("bb.v", "q.qv")} AS cs
         |        FROM ${pfx}$NswHops h
         |        JOIN b bb ON bb.vec_id = h.cur
         |        JOIN q ON q.query_id = h.query_id) x) WHERE rn = 1),
         |${pfx}bo AS (SELECT h.query_id, CAST(count(*) AS BIGINT) AS ov
         |  FROM ${pfx}$NswHops h JOIN ex ON ex.query_id = h.query_id
         |    AND ex.vec_id = h.cur AND ex.rn <= 10
         |  GROUP BY 1),
         |${pfx}res AS (SELECT $ef AS ef,
         |    CAST(count(*) AS BIGINT) AS n_queries,
         |    CAST(sum(CASE WHEN fb.cur = e1.vec_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS hits_top1,
         |    CAST(sum(CASE WHEN t10.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS hits_top10,
         |    CAST(sum(coalesce(bo.ov, 0)) AS BIGINT) AS overlap10_sum
         |  FROM ${pfx}fb fb
         |  JOIN ex e1 ON e1.query_id = fb.query_id AND e1.rn = 1
         |  LEFT JOIN ex t10 ON t10.query_id = fb.query_id
         |    AND t10.vec_id = fb.cur AND t10.rn <= 10
         |  LEFT JOIN ${pfx}bo bo ON bo.query_id = fb.query_id)"""
        .stripMargin
    }
    val chains = NswEfSweep.map(e => chain(s"a${e}_", e)).mkString(",\n")
    val union = NswEfSweep
      .map(e => s"SELECT * FROM a${e}_res").mkString("\nUNION ALL\n")
    s"""WITH eg(cur, nxt) AS (SELECT * FROM (VALUES $vals) t(cur, nxt)),
       |q AS MATERIALIZED (SELECT vec_id AS query_id,
       |    [CAST(x AS DOUBLE) FOR x IN embedding] AS qv
       |  FROM embeddings WHERE vec_id % 31 = 0),
       |b AS MATERIALIZED (SELECT vec_id,
       |    [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |  FROM embeddings
       |  WHERE vec_id IN (SELECT DISTINCT cur FROM eg)),
       |ex AS MATERIALIZED (SELECT q.query_id, bb.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${cosSql("bb.v", "q.qv")} DESC, bb.vec_id) AS rn
       |  FROM q CROSS JOIN b bb),
       |$chains
       |SELECT ef, n_queries, hits_top1, hits_top10, overlap10_sum,
       |  CAST((1000000 * hits_top10) // n_queries AS BIGINT)
       |    AS recall10_ppm
       |FROM ($union) ORDER BY ef""".stripMargin
  }

  /** NSW EF SWEEP — the tuning curve behind [[vectorNswSearch]]'s fixed
    * operating point, the graph-family sibling of
    * [[vectorIvfProbeSweep]]: the same beam walk at ef ∈ {1, 4, 8},
    * aggregated to recall@1/@10 and beam/top-10 overlap per ef. This is
    * the readout that justifies ef=8 (measured: greedy ef=1 lands
    * recall@10 near zero on the near-isotropic fixture, ef=8 ≈ 0.95) —
    * and the number an operator trades against the ≤hops·ef·(k+1)
    * per-query cost when sizing a serving tier.
    *
    * Same execution shape as [[vectorNswSearch]]: all three walks run in
    * ONE broadcast-artifact mapPartitions pass (a query costs 3 beams,
    * still zero exchanges); the exact ground truth is computed once,
    * distributed, and shared by the three recall aggregations. Oracle:
    * three unrolled CTE walks over the same inlined artifact. */
  val vectorEfSweep: Q = Q.noOracle("vector_ef_sweep") { (s, d) =>
    import s.implicits._
    val edges = nswEdges(s, d)
    val entry = edges.map(_._1).min
    val nodes = edges.map(_._1).distinct.sorted
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val bv = emb.join(broadcast(nodes.toSeq.toDF("vec_id")), "vec_id")
    val q = emb.filter(col("vec_id") % 31 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val baseVecs: Map[Long, Array[Double]] = bv.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val adj: Map[Long, Array[Long]] = edges.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    val adjB = s.sparkContext.broadcast(adj)
    val vecB = s.sparkContext.broadcast(baseVecs)
    val hops = NswHops
    val efs = NswEfSweep
    val walked = q.as[(Long, Seq[Double])].mapPartitions { it =>
      val adjM = adjB.value
      val vecM = vecB.value
      def cos(x: Array[Double], y: Array[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.length) {
          val xi = x(i); val yi = y(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi
          i += 1
        }
        dot / (math.sqrt(nx) * math.sqrt(ny))
      }
      it.flatMap { case (qid, qvSeq) =>
        val qv = qvSeq.toArray
        efs.map { ef =>
          var frontier: Seq[Long] = Seq(entry)
          for (_ <- 1 to hops) {
            frontier = frontier
              .flatMap(c => c +: adjM(c).toSeq).distinct
              .map(n => (cos(vecM(n), qv), n))
              .sortWith((a, b) =>
                a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
              .take(ef).map(_._2)
          }
          (ef, qid, frontier.head, frontier)
        }
      }
    }.toDF("ef", "query_id", "nsw_id", "beam")
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cs"), asc("vec_id"))
    val ex = bv.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cs"))
      .withColumn("rn", row_number().over(wEx))
    val best = ex.filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id").as("exact_id"))
    val top10 = ex.filter(col("rn") <= 10)
      .select(col("query_id").as("t_qid"), col("vec_id").as("t_vid"))
    val bo = walked.select(col("ef"), col("query_id"),
        explode(col("beam")).as("m"))
      .join(top10, col("query_id") === col("t_qid") &&
        col("m") === col("t_vid"))
      .groupBy("ef", "query_id").agg(count(lit(1)).as("ov"))
    walked
      .join(best, "query_id")
      .join(top10, col("query_id") === col("t_qid") &&
        col("nsw_id") === col("t_vid"), "left")
      .join(bo.select(col("ef").as("b_ef"), col("query_id").as("b_qid"),
          col("ov")),
        col("ef") === col("b_ef") && col("query_id") === col("b_qid"),
        "left")
      .groupBy("ef")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("nsw_id") === col("exact_id"), 1).otherwise(0))
          .as("hits_top1"),
        sum(when(col("t_vid").isNotNull, 1).otherwise(0))
          .as("hits_top10"),
        sum(coalesce(col("ov"), lit(0L))).as("overlap10_sum"))
      .select(col("ef"), col("n_queries"), col("hits_top1"),
        col("hits_top10"), col("overlap10_sum"),
        expr("(1000000 * hits_top10) div n_queries").as("recall10_ppm"))
  }.copy(
    eager = true, // shares the memoized NSW edge-list collect
    oracleGen = Some(() => cachedNswEdges.map(nswSweepOracleSql)))

  /** GRAPH-BASED ANN (Navigable-Small-World beam search) — the third
    * serving paradigm next to the partition family (IVF) and the hash
    * family (LSH), and the one production vector stores converged on
    * (HNSW is its hierarchical form): build a kNN graph over a bounded
    * base sample, then answer each query by BEAM descent — start at a
    * fixed entry node and repeatedly expand the current [[NswEf]]-node
    * frontier through its out-edges (self-edges make the frontier a
    * monotone best-seen set, so the walk is a fixpoint iteration),
    * keeping the ef best by cosine. Output per query: where the beam's
    * best landed, the exact brute-force answer, recall@1/@10 flags, how
    * many of the exact top-10 the final beam holds, and whether the
    * beam had converged by the hop budget — the honest readout that
    * shows greedy routing's local-optimum failure mode (single-path
    * descent on this near-isotropic 64-dim fixture lands recall@1 = 0;
    * the beam is what rescues it, which is WHY every production NSW
    * serves with ef > 1) alongside its hit rate.
    *
    * The trained artifact is the EDGE LIST ([[NswBaseCap]]·[[NswK]]
    * pairs, memoized per corpus fingerprint); SERVING is one narrow
    * mapPartitions pass with the bounded artifact (graph + base
    * vectors) broadcast — each query walks [[NswHops]] beam hops
    * locally, so at 10⁹ queries the walk is a map stage with zero
    * exchanges, exactly a production NSW tier's shape (a first cut as
    * [[NswHops]] chained broadcast-join rounds measured 3.1 s at sf0.1
    * — pure tiny-frame stage-scheduling overhead, ~24 stages for 65
    * rows). The EXACT ground-truth ranking stays distributed (it is the
    * corpus-sized half of the eval). The graph build's pairwise stage
    * is bounded by the base cap (like [[ivfCentroidArrays]]'s sample
    * cap), never by the corpus — a production build would LSH-bucket it
    * ([[knnJoinLsh]]'s plan). Determinism: one entry node (min base
    * id), the in-task cosine is the native cosine_sim codegen's exact
    * left-to-right fold (bit-identical to the oracle kernel), id
    * tie-breaks at every rank cut, and convergence compared on the
    * sorted frontier-id set. */
  val vectorNswSearch: Q = Q.noOracle("vector_nsw_search") { (s, d) =>
    import s.implicits._
    val edges = nswEdges(s, d)
    val entry = edges.map(_._1).min
    val nodes = edges.map(_._1).distinct.sorted
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val bv = emb.join(broadcast(nodes.toSeq.toDF("vec_id")), "vec_id")
    val q = emb.filter(col("vec_id") % 31 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // SERVING is one narrow pass: the bounded trained artifact (graph +
    // base vectors, ≤cap·(k+dim) values — the IvfSampleCap discipline)
    // broadcasts to every task and each query walks locally — no
    // per-hop exchange, no join chain; at 10⁹ queries this is a map
    // stage, which is exactly how a production NSW tier serves. The
    // in-task cosine is the SAME left-to-right fold as the native
    // cosine_sim codegen, so the oracle's kernel bits are preserved.
    val baseVecs: Map[Long, Array[Double]] = bv.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val adj: Map[Long, Array[Long]] = edges.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    val adjB = s.sparkContext.broadcast(adj)
    val vecB = s.sparkContext.broadcast(baseVecs)
    val hops = NswHops
    val ef = NswEf
    import s.implicits._
    val walked = q.as[(Long, Seq[Double])].mapPartitions { it =>
      val adjM = adjB.value
      val vecM = vecB.value
      def cos(x: Array[Double], y: Array[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.length) {
          val xi = x(i); val yi = y(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi
          i += 1
        }
        dot / (math.sqrt(nx) * math.sqrt(ny))
      }
      it.map { case (qid, qvSeq) =>
        val qv = qvSeq.toArray
        var frontier: Seq[Long] = Seq(entry)
        var prev = frontier
        for (_ <- 1 to hops) {
          prev = frontier
          frontier = frontier
            .flatMap(c => c +: adjM(c).toSeq).distinct
            .map(n => (cos(vecM(n), qv), n))
            .sortWith((a, b) =>
              a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
            .take(ef).map(_._2)
        }
        (qid, frontier.head, cos(vecM(frontier.head), qv), frontier,
          prev.sorted == frontier.sorted)
      }
    }.toDF("query_id", "nsw_id", "nsw_cos", "beam", "converged")
    // the exact ground truth stays DISTRIBUTED — it is the corpus-sized
    // half of the eval (brute force over all bases per query)
    val wEx = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cs"), asc("vec_id"))
    val ex = bv.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        cosine(col("v"), col("qv")).as("cs"))
      .withColumn("rn", row_number().over(wEx))
    val best = ex.filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id").as("exact_id"))
    val top10 = ex.filter(col("rn") <= 10)
      .select(col("query_id").as("t_qid"), col("vec_id").as("t_vid"))
    val bo = walked.select(col("query_id"), explode(col("beam")).as("m"))
      .join(top10, col("query_id") === col("t_qid") &&
        col("m") === col("t_vid"))
      .groupBy("query_id").agg(count(lit(1)).as("ov"))
    walked
      .join(best, "query_id")
      .join(top10, col("query_id") === col("t_qid") &&
        col("nsw_id") === col("t_vid"), "left")
      .join(bo.select(col("query_id").as("b_qid"), col("ov")),
        col("query_id") === col("b_qid"), "left")
      .select(col("query_id"), col("nsw_id"), col("nsw_cos"),
        col("exact_id"),
        (col("nsw_id") === col("exact_id")).as("hit_top1"),
        col("t_vid").isNotNull.as("hit_top10"),
        coalesce(col("ov"), lit(0L)).as("beam_overlap10"),
        col("converged"))
  }.copy(
    eager = true, // graph build collects the bounded edge list
    oracleGen = Some(() => cachedNswEdges.map(nswOracleSql)))

  /** Converged-Lloyd artifact per corpus fingerprint: (micro-grid
    * centroids [k][dim], rounds run, converged flag). Training is
    * deterministic integer arithmetic, so the artifact is a pure
    * function of the corpus — memoized like [[centroidCache]]. */
  private val lloydCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Long]], Int, Boolean)]()
  // Per-consumer run-time key capture (NOT one shared last-key): two
  // oracleGen closures consume the Lloyd artifact, and a shared slot
  // would inline the wrong corpus's centroids if another dataset trains
  // between one query's run and its oracle generation (e.g. interleaved
  // Verify over two scale factors).
  @volatile private var lastLloydKeyConverged: Option[String] = None
  @volatile private var lastLloydKeyOod: Option[String] = None
  private val LloydK = 8
  private val LloydMaxRounds = 32

  /** Distributed Lloyd iteration on the [[vectorKmeansStep]] integer
    * grid, run to centroid-table fixpoint (or [[LloydMaxRounds]]): points
    * live on the milli grid ×1000 (micro units) so every centroid mean
    * `(Σq) div n` is an exact integer and round-over-round convergence
    * is INTEGER EQUALITY of centroid tables — no epsilon, no float
    * drift. Per round: one dim-keyed broadcast join + two aggregates
    * over the cached grid (the corpus is scanned once, at cache fill);
    * driver state is the k×dims centroid table (bounded collect).
    * Empty clusters keep their previous centroid. */
  private def lloydTrain(s: SparkSession, d: String)
      : (Array[Array[Long]], Int, Boolean) = {
    val emb = Tables.embeddings(s, d)
    val q = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        ((floor(lit(1000) * col("x").cast("double")).cast("long") + 1000L)
          * 1000L).as("q"))
      .cache() // scanned once; every round re-reads the cached grid
    val seedIds = emb.select(col("vec_id")).orderBy("vec_id")
      .limit(LloydK).collect().map(_.getLong(0))
    val seedRows = q.filter(col("vec_id").isin(seedIds.toIndexedSeq: _*))
      .collect()
    val dims = 64
    var cents = Array.ofDim[Long](LloydK, dims)
    val seedIdx = seedIds.sorted.zipWithIndex.toMap
    seedRows.foreach { r =>
      cents(seedIdx(r.getLong(0)))(r.getInt(1) - 1) = r.getLong(2)
    }
    val spark = s
    import spark.implicits._
    var rounds = 0
    var converged = false
    while (!converged && rounds < LloydMaxRounds) {
      val cdf = cents.zipWithIndex.flatMap { case (cv, cid) =>
        cv.zipWithIndex.map { case (v, i) => (cid, i + 1, v) }
      }.toSeq.toDF("cid", "dim", "cq")
      val asg = q.join(broadcast(cdf), Seq("dim"))
        .groupBy("vec_id", "cid")
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
        .groupBy("vec_id")
        .agg(min(col("d2") * LloydK + col("cid")).as("enc"))
        .select(col("vec_id"), (col("enc") % LloydK).as("cid"))
      val means = asg.join(q, Seq("vec_id"))
        .groupBy("cid", "dim")
        .agg(expr("sum(q) div count(1)").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1) - 1) = r.getLong(2)
      }
      converged = next.zip(cents).forall { case (a, b) => a.sameElements(b) }
      cents = next
      rounds += 1
    }
    q.unpersist()
    (cents, rounds, converged)
  }

  private def lloydKey(s: SparkSession, d: String): String =
    embeddingsFingerprint(s, d) + "#lloyd"

  private def lloydArtifact(s: SparkSession, d: String)
      : (Array[Array[Long]], Int, Boolean) =
    ArtifactCaches.memo("vectors.lloyd", lloydCache)(lloydKey(s, d))(
      _ => lloydTrain(s, d))

  private def lloydOracleSql(cents: Array[Array[Long]], rounds: Int,
                             converged: Boolean): String = {
    val values = cents.zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (v, i) => s"($cid, ${i + 1}, $v)" }
    }.mkString(",\n    ")
    s"""WITH cents AS (SELECT c AS cid, d AS dim, v AS cq FROM (VALUES
       |    $values) t(c, d, v)),
       |q AS (SELECT vec_id, CAST(i AS INT) AS dim,
       |    (CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE))
       |          AS BIGINT) + 1000) * 1000 AS q
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |dd AS (SELECT q.vec_id, cents.cid,
       |    CAST(sum((q.q - cents.cq) * (q.q - cents.cq)) AS BIGINT) AS d2
       |  FROM q JOIN cents ON cents.dim = q.dim GROUP BY 1, 2),
       |a AS (SELECT vec_id, min(d2 * $LloydK + cid) AS enc FROM dd
       |      GROUP BY 1),
       |x AS (SELECT enc % $LloydK AS cluster, enc // $LloydK AS d2 FROM a),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM x)
       |SELECT CAST(cluster AS BIGINT) AS cluster,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST((1000000 * count(*)) // (SELECT t FROM tot) AS BIGINT)
       |    AS share_ppm,
       |  CAST(sum(CAST(d2 AS HUGEINT)) // count(*) AS BIGINT) AS mean_d2,
       |  CAST($rounds AS BIGINT) AS rounds, $converged AS converged
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The trained Lloyd artifact for a corpus (training on first use,
    * memoized) — the serving tier's handle. */
  private[graft] def lloydCentroids(s: SparkSession, d: String)
      : Array[Array[Long]] = lloydArtifact(s, d)._1

  /** STATELESS per-row cluster assignment under trained Lloyd centroids
    * — the serving path of [[vectorKmeansConverged]]: one codegen'd
    * column over the embedding array (k inlined centroid folds + the
    * encoded argmin), no shuffle, no state — so the SAME column serves
    * a batch scan and an arriving stream identically (the PQ-serving
    * discipline; StreamingSpec proves bit-equality across the two). */
  private[graft] def lloydAssignCol(cents: Array[Array[Long]],
                                    emb: Column): Column = {
    val encs = cents.zipWithIndex.map { case (cv, cid) =>
      val c = typedLit(cv.toSeq)
      val d2 = aggregate(
        zip_with(emb, c, (x, cq) =>
          ((floor(lit(1000) * x.cast("double")).cast("long") + 1000L)
            * 1000L - cq) *
          ((floor(lit(1000) * x.cast("double")).cast("long") + 1000L)
            * 1000L - cq)),
        lit(0L), (acc, v) => acc + v)
      d2 * LloydK + cid
    }
    encs.reduce((a, b) => least(a, b)) % LloydK
  }

  /** K-MEANS TRAINED TO CONVERGENCE — the full Lloyd loop
    * [[vectorKmeansStep]] takes one step of, run on the same exact
    * integer grid until the centroid table reaches an integer fixpoint
    * (measured: 19 rounds to integer fixpoint at sf0.01 on this
    * near-isotropic fixture — slow-gap clustering, the honest readout;
    * cap [[LloydMaxRounds]] with the `converged` flag reporting
    * truthfully when a corpus doesn't settle).
    * The output is the FINAL reassignment census under the trained
    * centroids (cluster sizes, share ppm, mean squared distance) plus
    * the rounds/converged provenance, and the generated oracle inlines
    * the trained integer centroids and recomputes the whole assignment
    * census from raw embeddings in SQL — a cross-implementation check
    * of the artifact itself, the [[graft.operators.Bpe]] discipline.
    * Assignment argmin uses the encoded total order min(d2·8 + cid)
    * (the portable struct-free tie-break; d2 ≤ 64·(2e6)², so the ×8
    * shift stays far inside int64).
    *
    * Scale posture: per round ONE dim-keyed broadcast join over the
    * cached grid + two partial+final aggregates; driver state is k×dims
    * integers. Rounds are data-bounded, not corpus-bounded; at 100 TB
    * the identical plan runs with the grid on disk instead of cache. */
  val vectorKmeansConverged: Q = Q.noOracle("vector_kmeans_converged") {
    (s, d) =>
    lastLloydKeyConverged = Some(lloydKey(s, d))
    val (cents, rounds, converged) = lloydArtifact(s, d)
    val emb = Tables.embeddings(s, d)
    val q = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        ((floor(lit(1000) * col("x").cast("double")).cast("long") + 1000L)
          * 1000L).as("q"))
    val spark = s
    import spark.implicits._
    val cdf = cents.zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (v, i) => (cid, i + 1, v) }
    }.toSeq.toDF("cid", "dim", "cq")
    val x = q.join(broadcast(cdf), Seq("dim"))
      .groupBy("vec_id", "cid")
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
      .groupBy("vec_id")
      .agg(min(col("d2") * LloydK + col("cid")).as("enc"))
      .select((col("enc") % LloydK).as("cluster"),
        expr(s"enc div $LloydK").as("d2"))
    val tot = x.agg(count(lit(1)).as("t"))
    // per-cluster d2 sum widens (d2 ≤ 64·(2e6)² ≈ 2.6e14 per vector, so
    // the sum wraps int64 around 7e4 same-cluster vectors) — the
    // vectorKmeansStep inertia discipline; DuckDB's sum is HUGEINT-exact
    x.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("sd2"))
      .crossJoin(broadcast(tot))
      .select(col("cluster").cast("long").as("cluster"),
        col("n").cast("long").as("n"),
        expr("(1000000 * n) div t").cast("long").as("share_ppm"),
        expr("sd2 div n").cast("long").as("mean_d2"),
        lit(rounds.toLong).as("rounds"),
        lit(converged).as("converged"))
  }.copy(
    eager = true, // Lloyd training collects per-round centroid tables
    oracleGen = Some(() => lastLloydKeyConverged.flatMap(k =>
      Option(lloydCache.get(k)).map { case (c, r, cv) =>
        lloydOracleSql(c, r, cv) })))

  private def oodOracleSql(cents: Array[Array[Long]]): String = {
    val values = cents.zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (v, i) => s"($cid, ${i + 1}, $v)" }
    }.mkString(",\n    ")
    s"""WITH cents AS (SELECT c AS cid, d AS dim, v AS cq FROM (VALUES
       |    $values) t(c, d, v)),
       |q AS (SELECT vec_id, CAST(i AS INT) AS dim,
       |    (CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE))
       |          AS BIGINT) + 1000) * 1000 AS q
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |dd AS (SELECT q.vec_id, cents.cid,
       |    CAST(sum((q.q - cents.cq) * (q.q - cents.cq)) AS BIGINT) AS d2
       |  FROM q JOIN cents ON cents.dim = q.dim GROUP BY 1, 2),
       |a AS (SELECT vec_id, min(d2 * $LloydK + cid) AS enc FROM dd
       |      GROUP BY 1),
       |x AS (SELECT vec_id, enc % $LloydK AS cell, enc // $LloydK AS d2
       |      FROM a),
       |cm AS (SELECT cell,
       |         CAST(sum(CAST(d2 AS HUGEINT)) // count(*) AS BIGINT)
       |           AS mean_d2
       |       FROM x GROUP BY 1),
       |o AS (SELECT x.vec_id,
       |    coalesce((CAST(1000000 AS HUGEINT) * x.d2)
       |             // nullif(cm.mean_d2, 0), 0) AS ood
       |  FROM x JOIN cm ON cm.cell = x.cell)
       |SELECT CAST(least(ood // 500000, 9) AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(ood) AS BIGINT) AS min_ood_ppm,
       |  CAST(max(ood) AS BIGINT) AS max_ood_ppm
       |FROM o GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** OUT-OF-DISTRIBUTION CENSUS under the trained Lloyd index — the
    * serving-time outlier filter an embedding ingest runs: each vector's
    * squared distance to its assigned centroid, normalized by the
    * cell's own mean (ood_ppm = 1e6·d²/mean_d² — exact floor-DIV of
    * BIGINTs), bucketed into 0.5×-wide bands. Vectors landing in the
    * high bands are the ones an index build quarantines (mis-embedded,
    * truncated, or genuinely novel). Reuses the memoized
    * [[vectorKmeansConverged]] artifact — training pays once per
    * corpus; this query is one assignment pass + two bounded
    * aggregates. The generated oracle inlines the integer centroids and
    * recomputes assignment, normalization and the census end to end. */
  val vectorOodCensus: Q = Q.noOracle("vector_ood_census") { (s, d) =>
    lastLloydKeyOod = Some(lloydKey(s, d))
    val cents = lloydArtifact(s, d)._1
    val spark = s
    import spark.implicits._
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        ((floor(lit(1000) * col("x").cast("double")).cast("long") + 1000L)
          * 1000L).as("q"))
    val cdf = cents.zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (v, i) => (cid, i + 1, v) }
    }.toSeq.toDF("cid", "dim", "cq")
    val x = q.join(broadcast(cdf), Seq("dim"))
      .groupBy("vec_id", "cid")
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
      .groupBy("vec_id")
      .agg(min(col("d2") * LloydK + col("cid")).as("enc"))
      .select(col("vec_id"), (col("enc") % LloydK).as("cell"),
        expr(s"enc div $LloydK").as("d2"))
    // both the per-cell d2 sum AND the ppm numerator ride the wide
    // domain: d2 is itself a 64-term product sum (≤ ~2.6e14), so
    // sum(d2) wraps int64 at ~7e4 same-cell vectors and 1e6·d2 can
    // reach ~2.6e20 — the 'ppm multiply over a PRODUCT operand' class
    // (ORACLE_PARITY.md round-9 entry). mean_d2 ships back as BIGINT
    // (≤ max d2); the quotient 1e6·d2/mean_d2 ≤ 1e6·cell_count fits.
    val cm = x.groupBy("cell")
      .agg(sum(col("d2").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("sd2"), count(lit(1)).as("cn"))
      .select(col("cell"), expr("sd2 div cn").as("mean_d2"))
    x.join(broadcast(cm), Seq("cell"))
      .select(col("vec_id"),
        coalesce(
          expr("(1000000 * CAST(d2 AS DECIMAL(38,0))) div nullif(mean_d2, 0)"),
          lit(0L)).as("ood"))
      .groupBy(least(expr("ood div 500000"), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("ood")).as("min_ood_ppm"),
        max(col("ood")).as("max_ood_ppm"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n").cast("long").as("n"),
        col("min_ood_ppm").cast("long").as("min_ood_ppm"),
        col("max_ood_ppm").cast("long").as("max_ood_ppm"))
  }.copy(
    eager = true, // shares the memoized Lloyd training collect
    oracleGen = Some(() => lastLloydKeyOod.flatMap(k =>
      Option(lloydCache.get(k)).map { case (c, _, _) => oodOracleSql(c) })))

  /** SIMPLIFIED (centroid-based) SILHOUETTE over the [[vectorKmeansStep]]
    * seeding — the cluster-quality number that decides whether an IVF
    * partitioning is worth its nlist: per point, a² = squared distance to
    * its assigned centroid, b² = min squared distance to any OTHER
    * centroid, s = (b²−a²)/max(a²,b²) in exact ppm (a² is the global min,
    * so b² ≥ a² and every quantity is a nonnegative BIGINT — the full
    * O(n²) pairwise silhouette is replaced by the O(n·k) centroid form,
    * the only variant that survives a 100 TB corpus). Same integer grid
    * as the kmeans step (millis + 1000 offset), same first-8 seeds, same
    * min-seed tie-break, so the assignment is bit-identical to that
    * query's.
    *
    * Plan: one posexplode pass to the (vec, dim) grid; distances via a
    * dim-keyed join against the 8-seed broadcast frame; everything after
    * the (vec, seed) distance aggregate is n·k-bounded. Output: per-
    * cluster silhouette census (k rows). */
  val vectorSilhouette: Q = Q(
    "vector_silhouette",
    """WITH q AS (SELECT vec_id, CAST(i AS INT) AS dim,
      |    CAST(floor(1000 * CAST(embedding[CAST(i AS INT)] AS DOUBLE))
      |         AS BIGINT) + 1000 AS q
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
      |sid AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
      |sq AS (SELECT q.vec_id AS seed, q.dim, q.q AS sq
      |       FROM q JOIN sid ON q.vec_id = sid.vec_id),
      |d AS (SELECT q.vec_id, sq.seed,
      |        CAST(sum((q.q - sq.sq) * (q.q - sq.sq)) AS BIGINT) AS d2
      |      FROM q JOIN sq ON q.dim = sq.dim GROUP BY 1, 2),
      |m AS (SELECT vec_id, min(d2) AS best FROM d GROUP BY 1),
      |asg AS (SELECT d.vec_id, min(d.seed) AS seed, min(d.d2) AS a2
      |        FROM d JOIN m ON d.vec_id = m.vec_id AND d.d2 = m.best
      |        GROUP BY 1),
      |b2 AS (SELECT d.vec_id, min(d.d2) AS b2
      |       FROM d JOIN asg ON d.vec_id = asg.vec_id
      |                      AND d.seed <> asg.seed
      |       GROUP BY 1),
      |s AS (SELECT a.vec_id, a.seed, a.a2, b2.b2,
      |    coalesce((1000000 * (b2.b2 - a.a2))
      |             // nullif(greatest(a.a2, b2.b2), 0), 0) AS s_ppm
      |  FROM asg a JOIN b2 ON b2.vec_id = a.vec_id)
      |SELECT CAST(seed AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_sil_ppm,
      |  CAST(min(s_ppm) AS BIGINT) AS min_sil_ppm,
      |  CAST(max(s_ppm) AS BIGINT) AS max_sil_ppm
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("dim"),
        (floor(lit(1000) * col("x").cast("double")).cast("long") + 1000)
          .as("q"))
    val sid = emb.select(col("vec_id").as("svid")).orderBy("svid").limit(8)
    val sq = q.join(broadcast(sid), col("vec_id") === col("svid"))
      .select(col("svid").as("seed"), col("dim"), col("q").as("sq"))
    val dist = q.join(broadcast(sq), Seq("dim"))
      .groupBy(col("vec_id"), col("seed"))
      .agg(sum((col("q") - col("sq")) * (col("q") - col("sq"))).as("d2"))
    // a² = lexicographic-first (d2, seed) — min d2 with min-seed tie-break,
    // exactly the oracle's two-step min; b² = the SECOND element's d2 (the
    // min over other seeds, since seeds are distinct per vector). 8-element
    // sorted arrays — no self-join, no ambiguous lineage.
    val sil = dist.groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("d2"), col("seed")))).as("ds"))
      .select(col("vec_id"),
        col("ds")(0)("seed").as("cluster"),
        col("ds")(0)("d2").as("a2"),
        col("ds")(1)("d2").as("b2"))
      .select(col("cluster"), col("a2"), col("b2"),
        coalesce(
          expr("(1000000 * (b2 - a2)) div nullif(greatest(a2, b2), 0)"),
          lit(0L)).as("s_ppm"))
    sil.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("s_ppm")).as("ssum"),
        min(col("s_ppm")).as("min_sil_ppm"),
        max(col("s_ppm")).as("max_sil_ppm"))
      .select(col("cluster").cast("long").as("cluster"),
        col("n").cast("long").as("n"),
        expr("ssum div n").cast("long").as("mean_sil_ppm"),
        col("min_sil_ppm").cast("long").as("min_sil_ppm"),
        col("max_sil_ppm").cast("long").as("max_sil_ppm"))
  }

  val all: Seq[Q] = Seq(vectorTopk, vectorAnnLsh, vectorAnnIvf,
    vectorTopkBatch, vectorQuantize, vectorCentroid, vectorKmeansStep,
    vectorLabelCoherence,
    knnJoinLsh,
    sqlVectorTopk, vectorIndexStats, vectorPq, vectorIvfPq,
    vectorIndexDelta, vectorMips, vectorMipsAnn, vectorRecallEval,
    vectorRecallEvalMt,
    vectorSq8Topk, vectorHammingTopk, vectorBqRerank, vectorMatryoshkaTopk,
    vectorFilteredTopk, vectorRangeSearch, vectorIvfProbeSweep,
    vectorMmrRerank, searchHybridRrf, vectorDimStats, vectorCentroidDrift,
    vectorDimCorr, vectorPcaPower, vectorNormCensus, vectorRpRecall,
    vectorCosCalibration, vectorNdcgMrr, vectorNswSearch, vectorHubness,
    vectorEfSweep, vectorResidualEnergy, vectorSilhouette,
    vectorKmeansConverged, vectorOodCensus)
}
