package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classical in-database ML training/evaluation over the `documents`
  * corpus — the model-QA layer a training-data pipeline runs BEFORE any
  * GPU job: a multinomial naive-Bayes language classifier trained and
  * scored entirely as aggregates, an exact decision-stump split search,
  * and a chi-square token–class association ranking (the feature-
  * selection primitive behind quality classifiers like fastText-style
  * corpus filters).
  *
  * Scale posture: every model here IS an aggregate — training state is
  * a (class × vocab)-bounded count table produced by one partial+final
  * aggregate over the corpus, never per-row driver state. Scoring joins
  * the token-keyed test stream against that bounded model table (the
  * exchange is vocab-keyed, model side broadcast-or-shuffle by size),
  * so the whole family survives a 100 TB corpus: the corpus is touched
  * by map-side token explosion exactly once per query, and everything
  * downstream is model-sized.
  *
  * Determinism discipline (the text_perplexity ln rule): every
  * transcendental is quantized ONCE per distinct model cell to integer
  * nano units (`floor(1e9·(ln a − ln b))`); all scoring is then exact
  * BIGINT sums, and argmax ties resolve through an explicit
  * (score DESC, class ASC) row_number on both engines.
  */
object MlEval {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** MULTINOMIAL NAIVE BAYES trained on an 80/20 deterministic split
    * (train = doc_id % 5 <> 0), predicting `lang` from space-split
    * tokens with Laplace smoothing, evaluated as the test-set confusion
    * matrix. The model table is (class, token) counts; per-cell weights
    * w = ln((c+1)/(N_class+V)) and per-class unseen-token defaults
    * −ln(N_class+V) are quantized once to nano units, so every doc
    * score is an exact BIGINT sum of (token count × weight) and the
    * per-doc argmax is engine-stable.
    *
    * Plan: one train pass to the (lang, token) count table (cached —
    * three bounded consumers: totals, vocab, weights); one test pass to
    * (doc, token, cnt); scoring = test tokens × broadcast(5 classes)
    * left-joined to the sparse weight table on (lang, token) with the
    * class default as the miss branch; argmax via a doc-partitioned
    * row_number over 5 rows. Output ≤ |classes|² rows. */
  val mlNaiveBayes: Q = Q(
    "ml_naive_bayes",
    """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      |test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
      |tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
      |        FROM train),
      |c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tok GROUP BY 1, 2),
      |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
      |pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS dc
      |        FROM train GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM train),
      |cls AS (SELECT p.lang,
      |    CAST(floor(1000000000 * (ln(p.dc) - ln(t.t))) AS BIGINT)
      |      AS prior_nano,
      |    CAST(floor(-1000000000 * ln(nl.n + v.v)) AS BIGINT) AS def_nano
      |  FROM pri p, tot t, nl, v WHERE nl.lang = p.lang),
      |w AS (SELECT c.lang, c.token,
      |    CAST(floor(1000000000 * (ln(c.c + 1.0) - ln(nl.n + v.v)))
      |      AS BIGINT) AS w_nano
      |  FROM c, nl, v WHERE nl.lang = c.lang),
      |ttok AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM test) GROUP BY 1, 2),
      |sc AS (SELECT tt.doc_id, cl.lang,
      |    cl.prior_nano
      |      + sum(tt.cnt * coalesce(w.w_nano, cl.def_nano)) AS score
      |  FROM ttok tt CROSS JOIN cls cl
      |  LEFT JOIN w ON w.lang = cl.lang AND w.token = tt.token
      |  GROUP BY 1, 2, cl.prior_nano),
      |pred AS (SELECT doc_id, lang AS predicted,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score DESC, lang ASC) AS rn
      |  FROM sc)
      |SELECT t.lang AS actual, p.predicted, CAST(count(*) AS BIGINT) AS n
      |FROM test t JOIN pred p ON p.doc_id = t.doc_id AND p.rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val test = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
    test.select(col("doc_id"), col("lang").as("actual"))
      .join(nbPredFrame(s, d), "doc_id")
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** The trained NB model's two frames — (class, prior_nano, def_nano)
    * and the sparse (class, token, w_nano) weight table. Factored out
    * of [[mlNaiveBayes]] so the streaming serving twin scores with the
    * IDENTICAL quantized weights the batch plan computes. */
  private def nbModelFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val train = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0)
    val c = train
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("c"))
      .cache() // three bounded consumers: class totals, vocab, weights
    val nl = c.groupBy("lang").agg(sum(col("c")).as("n"))
    val v = c.select("token").distinct().agg(count(lit(1)).as("v"))
    val pri = train.groupBy("lang").agg(count(lit(1)).as("dc"))
    val tot = train.agg(count(lit(1)).as("t"))
    val cls = pri.crossJoin(broadcast(tot)).join(broadcast(nl), "lang")
      .crossJoin(broadcast(v))
      .select(col("lang"),
        floor(lit(1000000000d) * (log(col("dc")) - log(col("t"))))
          .cast("long").as("prior_nano"),
        floor(lit(-1000000000d) * log(col("n") + col("v")))
          .cast("long").as("def_nano"))
    val w = c.join(broadcast(nl), "lang").crossJoin(broadcast(v))
      .select(col("lang"), col("token"),
        floor(lit(1000000000d) *
            (log(col("c") + lit(1.0)) - log(col("n") + col("v"))))
          .cast("long").as("w_nano"))
    (cls, w)
  }

  /** The (doc_id, predicted) frame of [[mlNaiveBayes]]: the batch
    * scoring plan, also the reference side of the streaming twin. */
  private[graft] def nbPredFrame(s: SparkSession, d: String): DataFrame = {
    val (cls, w) = nbModelFrames(s, d)
    val test = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
    val ttok = test
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val sc = ttok.crossJoin(broadcast(cls))
      .join(w, Seq("lang", "token"), "left")
      .groupBy("doc_id", "lang", "prior_nano")
      .agg(sum(col("cnt") * coalesce(col("w_nano"), col("def_nano")))
        .as("ssum"))
      .select(col("doc_id"), col("lang"),
        (col("prior_nano") + col("ssum")).as("score"))
    sc.withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted"))
  }

  /** Collected NB model — the (class×vocab)-bounded broadcast artifact
    * a live scorer ships to executors. Weights come out of the SAME
    * Spark frames the batch plan scores with, so the stream scorer is
    * bit-equal by construction, not by re-derivation. */
  private[graft] final case class NbModel(
      cls: Seq[(String, Long, Long)], w: Map[(String, String), Long])

  private[graft] def nbModelCollect(s: SparkSession, d: String): NbModel = {
    val (cls, w) = nbModelFrames(s, d)
    NbModel(
      cls.collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))),
      w.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
  }

  /** STATELESS per-row NB scorer under the collected model — the
    * serving path of [[mlNaiveBayes]] (the k-means-serving discipline:
    * nothing about the scorer knows it is on a stream). Tokenization
    * mirrors the batch plan's `split(text, ' ')` exactly — Spark's
    * split KEEPS empty tokens, so the local split must too
    * (`split(" ", -1)`). Exact BIGINT sums, (score DESC, class ASC)
    * argmax — bit-equal to the batch plan's row_number pick. */
  private[graft] def nbPredictLocal(m: NbModel, text: String): String = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    text.split(" ", -1).foreach(t => counts.update(t,
      counts.getOrElse(t, 0L) + 1L))
    var bestLang: String = null
    var bestScore = Long.MinValue
    m.cls.sortBy(_._1).foreach { case (lang, prior, defNano) =>
      var score = prior
      counts.foreach { case (tok, cnt) =>
        score += cnt * m.w.getOrElse((lang, tok), defNano)
      }
      if (bestLang == null || score > bestScore) {
        bestLang = lang; bestScore = score
      }
    }
    bestLang
  }

  /** EXACT DECISION-STUMP SPLIT SEARCH on `n_chars` predicting the
    * binary label lang = 'en' — the one-node CART step, and the
    * canonical "is this numeric feature informative at all" audit. The
    * classic O(n log n) sweep: reduce to per-distinct-value (n, pos)
    * counts, one cumulative window over the value-sorted frame, then
    * the weighted Gini of every candidate split (left = f ≤ t) in
    * exact integer arithmetic via the 2pq identity:
    * n² − p² − q² = 2pq, so
    * gini_ppm = 2e6·(pl·ql·nr + pr·qr·nl) / (n·nl·nr), floor-divided in
    * the wide-integer domain (DuckDB HUGEINT `//` ≡ Spark
    * DECIMAL(38,0) `div` on nonnegative operands, quotient ≤ 5e5).
    *
    * Plan: one corpus pass to the distinct-value frame (bounded by
    * |distinct n_chars|, ~500); the sweep windows + totals ride that
    * bounded frame, so the single-partition window is model-sized, not
    * corpus-sized. Output: the 5 best splits, total-ordered. */
  val mlStumpGini: Q = Q(
    "ml_stump_gini",
    """WITH lab AS (SELECT n_chars AS f,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |g AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(y) AS BIGINT) AS p FROM lab GROUP BY 1),
      |cum AS (SELECT f,
      |    CAST(sum(n) OVER (ORDER BY f) AS BIGINT) AS nl,
      |    CAST(sum(p) OVER (ORDER BY f) AS BIGINT) AS pl,
      |    CAST(sum(n) OVER () AS BIGINT) AS tn,
      |    CAST(sum(p) OVER () AS BIGINT) AS tp
      |  FROM g),
      |sp AS (SELECT f AS threshold, nl, pl, tn - nl AS nr, tp - pl AS pr,
      |       tn FROM cum WHERE nl < tn)
      |SELECT CAST(threshold AS BIGINT) AS threshold,
      |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
      |  CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
      |  CAST((2000000 * (CAST(pl AS HUGEINT) * (nl - pl) * nr
      |                   + CAST(pr AS HUGEINT) * (nr - pr) * nl))
      |       // (CAST(tn AS HUGEINT) * nl * nr) AS BIGINT) AS gini_ppm
      |FROM sp ORDER BY gini_ppm ASC, threshold ASC LIMIT 5""".stripMargin
  ) { (s, d) =>
    val lab = Tables.documents(s, d).select(col("n_chars").as("f"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val g = lab.groupBy("f")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val byF = Window.orderBy("f") // distinct-value frame: ties impossible
    val all = Window.partitionBy()
    val cum = g.select(col("f"),
      sum(col("n")).over(byF).as("nl"), sum(col("p")).over(byF).as("pl"),
      sum(col("n")).over(all).as("tn"), sum(col("p")).over(all).as("tp"))
    val sp = cum.filter(col("nl") < col("tn"))
      .select(col("f").as("threshold"), col("nl"), col("pl"),
        (col("tn") - col("nl")).as("nr"), (col("tp") - col("pl")).as("pr"),
        col("tn"))
    sp.select(col("threshold").cast("long").as("threshold"),
        col("nl").cast("long").as("n_left"),
        col("pl").cast("long").as("pos_left"),
        col("nr").cast("long").as("n_right"),
        col("pr").cast("long").as("pos_right"),
        (dec(lit(2000000L)) * (dec(col("pl")) * dec(col("nl") - col("pl"))
            * dec(col("nr"))
          + dec(col("pr")) * dec(col("nr") - col("pr")) * dec(col("nl"))))
          .as("num"))
      .withColumn("den",
        dec(col("n_left") + col("n_right")) * dec(col("n_left"))
          * dec(col("n_right")))
      .withColumn("gini_ppm", expr("num div den"))
      .select(col("threshold"), col("n_left"), col("pos_left"),
        col("n_right"), col("pos_right"),
        col("gini_ppm").cast("long").as("gini_ppm"))
      .orderBy(asc("gini_ppm"), asc("threshold"))
      .limit(5)
  }

  /** CHI-SQUARE token–class association ranking — the feature-selection
    * table behind bag-of-words corpus classifiers: for every (lang,
    * token) cell with document frequency ≥ 5 (and a complement of ≥ 5
    * so no margin is zero), the 2×2 chi² statistic from exact document
    * counts, top-10 per class. chi² = N·(ad−bc)² / (margins product),
    * computed in the wide-integer domain ((ad−bc)² overflows int64 at
    * corpus scale) and emitted as milli units.
    *
    * Plan: one distinct-(doc, lang, token) pass to the df frame; class
    * totals broadcast; candidate set is the sparse (class, token)
    * presence frame (a ≥ 1 — depleted-only cells are out of scope by
    * construction, documented); per-class top-10 via a class-
    * partitioned row_number over the vocab-bounded frame. */
  val mlChi2Feature: Q = Q(
    "ml_chi2_feature",
    """WITH dt AS (SELECT DISTINCT doc_id, lang, token FROM
      |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |   FROM documents)),
      |df AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS a
      |       FROM dt GROUP BY 1, 2),
      |dft AS (SELECT token, CAST(sum(a) AS BIGINT) AS dfall FROM df
      |        GROUP BY 1),
      |dc AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS nc
      |       FROM dt GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
      |cand AS (SELECT df.lang, df.token, df.a, dft.dfall, dc.nc, nn.n
      |  FROM df, dft, dc, nn
      |  WHERE dft.token = df.token AND dc.lang = df.lang
      |    AND dft.dfall >= 5 AND dft.dfall <= nn.n - 5),
      |x AS (SELECT lang, token, a, dfall,
      |    CAST((1000 * CAST(n AS HUGEINT)
      |          * (a * (n - nc - dfall + a) - (dfall - a) * (nc - a))
      |          * (a * (n - nc - dfall + a) - (dfall - a) * (nc - a)))
      |         // (CAST(nc AS HUGEINT) * (n - nc) * dfall * (n - dfall))
      |         AS BIGINT) AS chi2_milli
      |  FROM cand),
      |r AS (SELECT lang, token, a AS df_class, dfall AS df_total,
      |    chi2_milli,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY chi2_milli DESC, token ASC) AS rn
      |  FROM x)
      |SELECT lang, token, CAST(df_class AS BIGINT) AS df_class,
      |  CAST(df_total AS BIGINT) AS df_total,
      |  CAST(chi2_milli AS BIGINT) AS chi2_milli, CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin
  ) { (s, d) =>
    val dt = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val df = dt.groupBy("lang", "token").agg(count(lit(1)).as("a"))
      .cache() // consumed by dft and the candidate join
    val dft = df.groupBy("token").agg(sum(col("a")).as("dfall"))
    val dc = dt.groupBy("lang").agg(countDistinct(col("doc_id")).as("nc"))
    val nn = dt.agg(countDistinct(col("doc_id")).as("n"))
    val cand = df.join(dft, "token").join(broadcast(dc), "lang")
      .crossJoin(broadcast(nn))
      .filter(col("dfall") >= 5 && col("dfall") <= col("n") - 5)
    val diff = dec(col("a")) *
        dec(col("n") - col("nc") - col("dfall") + col("a")) -
      dec(col("dfall") - col("a")) * dec(col("nc") - col("a"))
    val x = cand.select(col("lang"), col("token"), col("a"), col("dfall"),
        (dec(lit(1000L)) * dec(col("n")) * diff * diff).as("num"),
        (dec(col("nc")) * dec(col("n") - col("nc")) * dec(col("dfall"))
          * dec(col("n") - col("dfall"))).as("den"))
      .withColumn("chi2_milli", expr("num div den"))
    val r = x.withColumn("rn", row_number().over(
        Window.partitionBy("lang")
          .orderBy(desc("chi2_milli"), asc("token"))))
      .filter(col("rn") <= 10)
    r.select(col("lang"), col("token"),
        col("a").cast("long").as("df_class"),
        col("dfall").cast("long").as("df_total"),
        col("chi2_milli").cast("long").as("chi2_milli"),
        col("rn").cast("long").as("rn"))
  }

  /** 5-FOLD CROSS-VALIDATION of the [[mlNaiveBayes]] classifier with all
    * five models trained in ONE corpus pass — the Spark-first trick is
    * leave-fold-out BY SUBTRACTION: the per-(lang, token, fold) count
    * frame expands each row to the four folds it trains (a bounded ×5 of
    * the model-sized frame, never of the corpus), so fold f's train
    * counts, class totals, vocab and priors all come from the same
    * aggregate and no per-fold corpus re-scan exists. Same nano-log
    * weight quantization and argmax discipline as the parent; fold-lang
    * cells with zero train docs are excluded on both engines (the class
    * is unobservable in that fold).
    *
    * Output: per-fold test size, correct count and accuracy ppm — the
    * generalization-stability readout a corpus classifier ships with. */
  val mlNbCrossval: Q = Q(
    "ml_nb_crossval",
    """WITH folds AS (SELECT unnest(range(0, 5)) AS fold),
      |tokf AS (SELECT lang, doc_id % 5 AS df, token FROM
      |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |   FROM documents) tx),
      |cf AS (SELECT lang, token, df, CAST(count(*) AS BIGINT) AS c
      |       FROM tokf GROUP BY 1, 2, 3),
      |w0 AS (SELECT f.fold, cf.lang, cf.token,
      |       CAST(sum(cf.c) AS BIGINT) AS ctr
      |       FROM cf CROSS JOIN folds f WHERE cf.df <> f.fold
      |       GROUP BY 1, 2, 3),
      |nlf AS (SELECT fold, lang, CAST(sum(ctr) AS BIGINT) AS n
      |        FROM w0 GROUP BY 1, 2),
      |vf AS (SELECT fold, CAST(count(DISTINCT token) AS BIGINT) AS v
      |       FROM w0 GROUP BY 1),
      |dcl AS (SELECT lang, doc_id % 5 AS df, CAST(count(*) AS BIGINT) AS c
      |        FROM documents GROUP BY 1, 2),
      |dtr AS (SELECT f.fold, dcl.lang, CAST(sum(dcl.c) AS BIGINT) AS dc
      |        FROM dcl CROSS JOIN folds f WHERE dcl.df <> f.fold
      |        GROUP BY 1, 2 HAVING sum(dcl.c) > 0),
      |ttr AS (SELECT fold, CAST(sum(dc) AS BIGINT) AS t FROM dtr
      |        GROUP BY 1),
      |cls AS (SELECT dtr.fold, dtr.lang,
      |    CAST(floor(1000000000 * (ln(dtr.dc) - ln(ttr.t))) AS BIGINT)
      |      AS prior_nano,
      |    CAST(floor(-1000000000 * ln(nlf.n + vf.v)) AS BIGINT)
      |      AS def_nano
      |  FROM dtr, ttr, nlf, vf
      |  WHERE ttr.fold = dtr.fold AND nlf.fold = dtr.fold
      |    AND nlf.lang = dtr.lang AND vf.fold = dtr.fold),
      |w AS (SELECT w0.fold, w0.lang, w0.token,
      |    CAST(floor(1000000000 * (ln(w0.ctr + 1.0) - ln(nlf.n + vf.v)))
      |      AS BIGINT) AS w_nano
      |  FROM w0, nlf, vf
      |  WHERE nlf.fold = w0.fold AND nlf.lang = w0.lang
      |    AND vf.fold = w0.fold),
      |ttok AS (SELECT doc_id, doc_id % 5 AS fold, token,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents) tx GROUP BY 1, 2, 3),
      |sc AS (SELECT tt.doc_id, tt.fold, cl.lang,
      |    cl.prior_nano
      |      + sum(tt.cnt * coalesce(w.w_nano, cl.def_nano)) AS score
      |  FROM ttok tt JOIN cls cl ON cl.fold = tt.fold
      |  LEFT JOIN w ON w.fold = tt.fold AND w.lang = cl.lang
      |             AND w.token = tt.token
      |  GROUP BY 1, 2, 3, cl.prior_nano),
      |pred AS (SELECT doc_id, fold, lang AS predicted,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score DESC, lang ASC) AS rn
      |  FROM sc),
      |acc AS (SELECT p.fold, CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN t.lang = p.predicted THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_correct
      |  FROM documents t JOIN pred p
      |    ON p.doc_id = t.doc_id AND p.rn = 1
      |  GROUP BY 1)
      |SELECT CAST(fold AS BIGINT) AS fold, n_test, n_correct,
      |  CAST((1000000 * n_correct) // n_test AS BIGINT) AS acc_ppm
      |FROM acc ORDER BY fold""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val folds = broadcast(s.range(0, 5).toDF("fold"))
    val cf = docs
      .select(col("lang"), (col("doc_id") % 5).as("df"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token", "df").agg(count(lit(1)).as("c"))
    val w0 = cf.crossJoin(folds).filter(col("df") =!= col("fold"))
      .groupBy("fold", "lang", "token").agg(sum(col("c")).as("ctr"))
      .cache() // three bounded consumers: class totals, vocab, weights
    val nlf = w0.groupBy("fold", "lang").agg(sum(col("ctr")).as("n"))
    val vf = w0.groupBy("fold")
      .agg(countDistinct(col("token")).as("v"))
    val dcl = docs.groupBy(col("lang"), (col("doc_id") % 5).as("df"))
      .agg(count(lit(1)).as("c"))
    val dtr = dcl.crossJoin(folds).filter(col("df") =!= col("fold"))
      .groupBy("fold", "lang").agg(sum(col("c")).as("dc"))
      .filter(col("dc") > 0)
    val ttr = dtr.groupBy("fold").agg(sum(col("dc")).as("t"))
    val cls = dtr.join(broadcast(ttr), "fold")
      .join(broadcast(nlf), Seq("fold", "lang"))
      .join(broadcast(vf), "fold")
      .select(col("fold"), col("lang"),
        floor(lit(1000000000d) * (log(col("dc")) - log(col("t"))))
          .cast("long").as("prior_nano"),
        floor(lit(-1000000000d) * log(col("n") + col("v")))
          .cast("long").as("def_nano"))
    val w = w0.join(broadcast(nlf), Seq("fold", "lang"))
      .join(broadcast(vf), "fold")
      .select(col("fold"), col("lang"), col("token"),
        floor(lit(1000000000d) *
            (log(col("ctr") + lit(1.0)) - log(col("n") + col("v"))))
          .cast("long").as("w_nano"))
    val ttok = docs
      .select(col("doc_id"), (col("doc_id") % 5).as("fold"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "fold", "token").agg(count(lit(1)).as("cnt"))
    val sc = ttok.join(broadcast(cls), Seq("fold"))
      .join(w, Seq("fold", "lang", "token"), "left")
      .groupBy("doc_id", "fold", "lang", "prior_nano")
      .agg(sum(col("cnt") * coalesce(col("w_nano"), col("def_nano")))
        .as("ssum"))
      .select(col("doc_id"), col("fold"), col("lang"),
        (col("prior_nano") + col("ssum")).as("score"))
    val pred = sc
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("fold"), col("lang").as("predicted"))
    docs.select(col("doc_id"), col("lang").as("actual"))
      .join(pred, "doc_id")
      .groupBy("fold")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("actual") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("fold").cast("long").as("fold"),
        col("n_test").cast("long").as("n_test"),
        col("n_correct").cast("long").as("n_correct"),
        expr("(1000000 * n_correct) div n_test").cast("long").as("acc_ppm"))
  }

  /** EXACT AUC via the tie-corrected Mann–Whitney U statistic — the
    * ranking-quality companion to [[mlStumpGini]] (same feature
    * `n_chars`, same label lang = 'en'): does the raw feature RANK the
    * positive class above the negative one at all, before any split is
    * chosen? The whole statistic is integer-exact: group to the
    * distinct-score frame (n, pos per value), one cumulative window for
    * negatives-below, then 2U = Σ_v (2·p_v·negBelow_v + p_v·n_v) — the
    * ×2 keeps the tie term (p·n/2) integral — and
    * auc_ppm = 1e6·2U / (2·P·N), floor-divided in the wide-integer
    * domain. No float ever exists, so no parity surface.
    *
    * Plan: one corpus pass to the distinct-value frame; the sweep is
    * value-bounded. One row out. */
  val mlAucMannwhitney: Q = Q(
    "ml_auc_mannwhitney",
    """WITH lab AS (SELECT n_chars AS sc,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |g AS (SELECT sc, CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(y) AS BIGINT) AS p FROM lab GROUP BY 1),
      |c AS (SELECT sc, n, p,
      |    CAST(coalesce(sum(n - p) OVER (ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS neg_below,
      |    CAST(sum(p) OVER () AS BIGINT) AS tp,
      |    CAST(sum(n - p) OVER () AS BIGINT) AS tn
      |  FROM g)
      |SELECT CAST(max(tp) AS BIGINT) AS n_pos,
      |  CAST(max(tn) AS BIGINT) AS n_neg,
      |  CAST(sum(2 * p * neg_below + p * (n - p)) AS BIGINT) AS u2,
      |  CAST((1000000 * CAST(sum(2 * p * neg_below + p * (n - p))
      |         AS HUGEINT))
      |       // (2 * max(tp) * max(tn)) AS BIGINT) AS auc_ppm
      |FROM c WHERE tp > 0 AND tn > 0""".stripMargin
  ) { (s, d) =>
    val lab = Tables.documents(s, d).select(col("n_chars").as("sc"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val g = lab.groupBy("sc")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val bySc = Window.orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val allW = Window.partitionBy()
    val c = g.select(col("sc"), col("n"), col("p"),
      coalesce(sum(col("n") - col("p")).over(bySc), lit(0L))
        .as("neg_below"),
      sum(col("p")).over(allW).as("tp"),
      sum(col("n") - col("p")).over(allW).as("tn"))
    c.filter(col("tp") > 0 && col("tn") > 0)
      .agg(max(col("tp")).as("n_pos"), max(col("tn")).as("n_neg"),
        sum(lit(2) * col("p") * col("neg_below")
          + col("p") * (col("n") - col("p"))).as("u2"))
      .select(col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"),
        col("u2").cast("long").as("u2"),
        (dec(lit(1000000L)) * dec(col("u2"))).as("num"))
      .withColumn("den", dec(lit(2L)) * dec(col("n_pos")) * dec(col("n_neg")))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("num div den").cast("long").as("auc_ppm"))
  }

  /** PRECISION/RECALL/F1 SWEEP over fixed feature thresholds — the
    * operating-point table that turns [[mlAucMannwhitney]]'s single
    * ranking number into deployable cutoffs: predict lang = 'en' when
    * n_chars ≥ t for t ∈ {100, 150, …, 500}, and report exact counts
    * plus floor-DIV ppm precision, recall and F1 (F1's half-cancelled
    * form 2e6·tp / (2·tp + fp + fn) keeps it a pure integer ratio).
    * Degenerate thresholds (no predictions) emit 0s via a mirrored
    * nullif-coalesce rather than engine-divergent NaN casts.
    *
    * Plan: the corpus reduces to the distinct-value frame once; the 9
    * thresholds ride a broadcast cross of that bounded frame. */
  val mlPrCurve: Q = Q(
    "ml_pr_curve",
    """WITH lab AS (SELECT n_chars AS sc,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
      |g AS (SELECT sc, CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(y) AS BIGINT) AS p FROM lab GROUP BY 1),
      |th AS (SELECT CAST(100 + 50 * unnest(range(0, 9)) AS BIGINT) AS t),
      |m AS (SELECT th.t,
      |    CAST(sum(CASE WHEN g.sc >= th.t THEN g.p ELSE 0 END) AS BIGINT)
      |      AS tp,
      |    CAST(sum(CASE WHEN g.sc >= th.t THEN g.n - g.p ELSE 0 END)
      |      AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN g.sc < th.t THEN g.p ELSE 0 END) AS BIGINT)
      |      AS fn
      |  FROM th CROSS JOIN g GROUP BY 1)
      |SELECT t AS threshold, tp, fp, fn,
      |  CAST(coalesce((1000000 * tp) // nullif(tp + fp, 0), 0) AS BIGINT)
      |    AS precision_ppm,
      |  CAST(coalesce((1000000 * tp) // nullif(tp + fn, 0), 0) AS BIGINT)
      |    AS recall_ppm,
      |  CAST(coalesce((2000000 * tp) // nullif(2 * tp + fp + fn, 0), 0)
      |    AS BIGINT) AS f1_ppm
      |FROM m ORDER BY threshold""".stripMargin
  ) { (s, d) =>
    val lab = Tables.documents(s, d).select(col("n_chars").as("sc"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val g = lab.groupBy("sc")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val th = s.range(0, 9).select((lit(100L) + lit(50L) * col("id"))
      .as("t"))
    val m = broadcast(th).crossJoin(g)
      .groupBy("t")
      .agg(
        sum(when(col("sc") >= col("t"), col("p")).otherwise(0L)).as("tp"),
        sum(when(col("sc") >= col("t"), col("n") - col("p")).otherwise(0L))
          .as("fp"),
        sum(when(col("sc") < col("t"), col("p")).otherwise(0L)).as("fn"))
    m.select(col("t").as("threshold"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"),
        coalesce(expr("(1000000 * tp) div nullif(tp + fp, 0)"), lit(0L))
          .cast("long").as("precision_ppm"),
        coalesce(expr("(1000000 * tp) div nullif(tp + fn, 0)"), lit(0L))
          .cast("long").as("recall_ppm"),
        coalesce(expr("(2000000 * tp) div nullif(2 * tp + fp + fn, 0)"),
          lit(0L)).cast("long").as("f1_ppm"))
  }

  /** LEARNING CURVE of the naive-Bayes classifier — accuracy on a FIXED
    * held-out fold (doc_id % 5 = 4) as the training set grows through
    * the nested prefixes folds {0}, {0,1}, {0,1,2}, {0,1,2,3} — the
    * "is more data still buying accuracy" readout that sizes a corpus
    * acquisition budget. All four nested models train in ONE corpus
    * pass via the [[mlNbCrossval]] expansion trick run cumulatively:
    * each (lang, token, fold) count row fans out to every training
    * prefix k > fold (a bounded ×4 of the model-sized frame), so model
    * k's counts, class totals, vocab and priors share one aggregate.
    * Same nano-log quantization, same argmax discipline.
    *
    * Output: 4 rows (train_folds, n_train_docs, n_test, acc_ppm). */
  val mlLearningCurve: Q = Q(
    "ml_learning_curve",
    """WITH ks AS (SELECT CAST(1 + unnest(range(0, 4)) AS BIGINT) AS k),
      |tr AS (SELECT * FROM documents WHERE doc_id % 5 <> 4),
      |te AS (SELECT * FROM documents WHERE doc_id % 5 = 4),
      |cf AS (SELECT lang, token, doc_id % 5 AS df,
      |    CAST(count(*) AS BIGINT) AS c FROM
      |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |   FROM tr) tx GROUP BY 1, 2, 3),
      |w0 AS (SELECT ks.k, cf.lang, cf.token,
      |       CAST(sum(cf.c) AS BIGINT) AS ctr
      |       FROM cf CROSS JOIN ks WHERE cf.df < ks.k GROUP BY 1, 2, 3),
      |nlk AS (SELECT k, lang, CAST(sum(ctr) AS BIGINT) AS n
      |        FROM w0 GROUP BY 1, 2),
      |vk AS (SELECT k, CAST(count(DISTINCT token) AS BIGINT) AS v
      |       FROM w0 GROUP BY 1),
      |dcl AS (SELECT lang, doc_id % 5 AS df, CAST(count(*) AS BIGINT) AS c
      |        FROM tr GROUP BY 1, 2),
      |dtr AS (SELECT ks.k, dcl.lang, CAST(sum(dcl.c) AS BIGINT) AS dc
      |        FROM dcl CROSS JOIN ks WHERE dcl.df < ks.k
      |        GROUP BY 1, 2 HAVING sum(dcl.c) > 0),
      |ttk AS (SELECT k, CAST(sum(dc) AS BIGINT) AS t FROM dtr GROUP BY 1),
      |cls AS (SELECT dtr.k, dtr.lang,
      |    CAST(floor(1000000000 * (ln(dtr.dc) - ln(ttk.t))) AS BIGINT)
      |      AS prior_nano,
      |    CAST(floor(-1000000000 * ln(nlk.n + vk.v)) AS BIGINT)
      |      AS def_nano
      |  FROM dtr, ttk, nlk, vk
      |  WHERE ttk.k = dtr.k AND nlk.k = dtr.k AND nlk.lang = dtr.lang
      |    AND vk.k = dtr.k),
      |w AS (SELECT w0.k, w0.lang, w0.token,
      |    CAST(floor(1000000000 * (ln(w0.ctr + 1.0) - ln(nlk.n + vk.v)))
      |      AS BIGINT) AS w_nano
      |  FROM w0, nlk, vk
      |  WHERE nlk.k = w0.k AND nlk.lang = w0.lang AND vk.k = w0.k),
      |ttok AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM te) tx GROUP BY 1, 2),
      |sc AS (SELECT tt.doc_id, cl.k, cl.lang,
      |    cl.prior_nano
      |      + sum(tt.cnt * coalesce(w.w_nano, cl.def_nano)) AS score
      |  FROM ttok tt CROSS JOIN cls cl
      |  LEFT JOIN w ON w.k = cl.k AND w.lang = cl.lang
      |             AND w.token = tt.token
      |  GROUP BY 1, 2, 3, cl.prior_nano),
      |pred AS (SELECT doc_id, k, lang AS predicted,
      |    row_number() OVER (PARTITION BY doc_id, k
      |                       ORDER BY score DESC, lang ASC) AS rn
      |  FROM sc),
      |acc AS (SELECT p.k, CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN t.lang = p.predicted THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_correct
      |  FROM te t JOIN pred p ON p.doc_id = t.doc_id AND p.rn = 1
      |  GROUP BY 1)
      |SELECT CAST(acc.k AS BIGINT) AS train_folds, ttk.t AS n_train_docs,
      |  acc.n_test, acc.n_correct,
      |  CAST((1000000 * acc.n_correct) // acc.n_test AS BIGINT) AS acc_ppm
      |FROM acc JOIN ttk ON ttk.k = acc.k ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tr = docs.filter(col("doc_id") % 5 =!= 4)
    val te = docs.filter(col("doc_id") % 5 === 4)
    val ks = broadcast(s.range(1, 5).toDF("k"))
    val cf = tr
      .select(col("lang"), (col("doc_id") % 5).as("df"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token", "df").agg(count(lit(1)).as("c"))
    val w0 = cf.crossJoin(ks).filter(col("df") < col("k"))
      .groupBy("k", "lang", "token").agg(sum(col("c")).as("ctr"))
      .cache() // three bounded consumers: class totals, vocab, weights
    val nlk = w0.groupBy("k", "lang").agg(sum(col("ctr")).as("n"))
    val vk = w0.groupBy("k").agg(countDistinct(col("token")).as("v"))
    val dcl = tr.groupBy(col("lang"), (col("doc_id") % 5).as("df"))
      .agg(count(lit(1)).as("c"))
    val dtr = dcl.crossJoin(ks).filter(col("df") < col("k"))
      .groupBy("k", "lang").agg(sum(col("c")).as("dc"))
      .filter(col("dc") > 0)
    val ttk = dtr.groupBy("k").agg(sum(col("dc")).as("t"))
    val cls = dtr.join(broadcast(ttk), "k")
      .join(broadcast(nlk), Seq("k", "lang"))
      .join(broadcast(vk), "k")
      .select(col("k"), col("lang"),
        floor(lit(1000000000d) * (log(col("dc")) - log(col("t"))))
          .cast("long").as("prior_nano"),
        floor(lit(-1000000000d) * log(col("n") + col("v")))
          .cast("long").as("def_nano"))
    val w = w0.join(broadcast(nlk), Seq("k", "lang"))
      .join(broadcast(vk), "k")
      .select(col("k"), col("lang"), col("token"),
        floor(lit(1000000000d) *
            (log(col("ctr") + lit(1.0)) - log(col("n") + col("v"))))
          .cast("long").as("w_nano"))
    val ttok = te
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val sc = ttok.crossJoin(broadcast(cls))
      .join(w, Seq("k", "lang", "token"), "left")
      .groupBy("doc_id", "k", "lang", "prior_nano")
      .agg(sum(col("cnt") * coalesce(col("w_nano"), col("def_nano")))
        .as("ssum"))
      .select(col("doc_id"), col("k"), col("lang"),
        (col("prior_nano") + col("ssum")).as("score"))
    val pred = sc
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id", "k")
        .orderBy(desc("score"), asc("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("k"), col("lang").as("predicted"))
    val acc = te.select(col("doc_id"), col("lang").as("actual"))
      .join(pred, "doc_id")
      .groupBy("k")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("actual") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
    acc.join(broadcast(ttk), "k")
      .select(col("k").cast("long").as("train_folds"),
        col("t").cast("long").as("n_train_docs"),
        col("n_test").cast("long").as("n_test"),
        col("n_correct").cast("long").as("n_correct"),
        expr("(1000000 * n_correct) div n_test").cast("long").as("acc_ppm"))
  }

  /** POINTWISE MUTUAL-INFORMATION feature ranking — [[mlChi2Feature]]'s
    * information-theoretic twin over the same document-level 2×2 cells
    * (the two disagree exactly where it matters: chi² over-weights rare
    * high-lift tokens, MI weights by mass — shipping both is how a
    * feature-selection pass is audited): per (class, token) candidate,
    * MI = Σ_cells (n_ij/N)·ln(n_ij·N / (r_i·c_j)), each cell term
    * quantized ONCE to nano units (the text_perplexity ln rule; empty
    * cells contribute an exact 0 via the mirrored CASE — the x·ln x
    * limit), summed exactly, top-10 per class with the (mi DESC, token)
    * total order.
    *
    * Plan: identical to chi² — one distinct-(doc, lang, token) pass,
    * then vocab×classes-bounded arithmetic and a class-partitioned
    * row_number. */
  val mlMutualInformation: Q = Q(
    "ml_mutual_information",
    """WITH dt AS (SELECT DISTINCT doc_id, lang, token FROM
      |  (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |   FROM documents) tx),
      |df AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS a
      |       FROM dt GROUP BY 1, 2),
      |dft AS (SELECT token, CAST(sum(a) AS BIGINT) AS dfall FROM df
      |        GROUP BY 1),
      |dc AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS nc
      |       FROM dt GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
      |cand AS (SELECT df.lang, df.token, df.a, dft.dfall, dc.nc, nn.n
      |  FROM df, dft, dc, nn
      |  WHERE dft.token = df.token AND dc.lang = df.lang
      |    AND dft.dfall >= 5 AND dft.dfall <= nn.n - 5),
      |x AS (SELECT lang, token, a, dfall,
      |    (CASE WHEN a > 0 THEN CAST(floor(1000000000
      |       * (CAST(a AS DOUBLE) / n)
      |       * (ln(a * n) - ln(dfall * nc))) AS BIGINT) ELSE 0 END)
      |  + (CASE WHEN dfall - a > 0 THEN CAST(floor(1000000000
      |       * (CAST(dfall - a AS DOUBLE) / n)
      |       * (ln((dfall - a) * n) - ln(dfall * (n - nc)))) AS BIGINT)
      |     ELSE 0 END)
      |  + (CASE WHEN nc - a > 0 THEN CAST(floor(1000000000
      |       * (CAST(nc - a AS DOUBLE) / n)
      |       * (ln((nc - a) * n) - ln((n - dfall) * nc))) AS BIGINT)
      |     ELSE 0 END)
      |  + (CASE WHEN n - dfall - nc + a > 0 THEN CAST(floor(1000000000
      |       * (CAST(n - dfall - nc + a AS DOUBLE) / n)
      |       * (ln((n - dfall - nc + a) * n)
      |          - ln((n - dfall) * (n - nc)))) AS BIGINT) ELSE 0 END)
      |    AS mi_nano
      |  FROM cand),
      |r AS (SELECT lang, token, a AS df_class, dfall AS df_total, mi_nano,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY mi_nano DESC, token ASC) AS rn
      |  FROM x)
      |SELECT lang, token, CAST(df_class AS BIGINT) AS df_class,
      |  CAST(df_total AS BIGINT) AS df_total,
      |  CAST(mi_nano AS BIGINT) AS mi_nano, CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin
  ) { (s, d) =>
    val dt = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
    val df = dt.groupBy("lang", "token").agg(count(lit(1)).as("a"))
      .cache() // consumed by dft and the candidate join
    val dft = df.groupBy("token").agg(sum(col("a")).as("dfall"))
    val dc = dt.groupBy("lang").agg(countDistinct(col("doc_id")).as("nc"))
    val nn = dt.agg(countDistinct(col("doc_id")).as("n"))
    val cand = df.join(dft, "token").join(broadcast(dc), "lang")
      .crossJoin(broadcast(nn))
      .filter(col("dfall") >= 5 && col("dfall") <= col("n") - 5)
    def term(nij: Column, ri: Column, cj: Column): Column =
      when(nij > 0,
        floor(lit(1000000000d) * (nij.cast("double") / col("n"))
          * (log(nij * col("n")) - log(ri * cj))).cast("long"))
        .otherwise(0L)
    val x = cand.select(col("lang"), col("token"), col("a"), col("dfall"),
      (term(col("a"), col("dfall"), col("nc"))
        + term(col("dfall") - col("a"), col("dfall"), col("n") - col("nc"))
        + term(col("nc") - col("a"), col("n") - col("dfall"), col("nc"))
        + term(col("n") - col("dfall") - col("nc") + col("a"),
            col("n") - col("dfall"), col("n") - col("nc"))).as("mi_nano"))
    val r = x.withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(desc("mi_nano"), asc("token"))))
      .filter(col("rn") <= 10)
    r.select(col("lang"), col("token"),
        col("a").cast("long").as("df_class"),
        col("dfall").cast("long").as("df_total"),
        col("mi_nano").cast("long").as("mi_nano"),
        col("rn").cast("long").as("rn"))
  }

  val all: Seq[Q] = Seq(mlNaiveBayes, mlStumpGini, mlChi2Feature,
    mlNbCrossval, mlAucMannwhitney, mlPrCurve, mlLearningCurve,
    mlMutualInformation)
}
