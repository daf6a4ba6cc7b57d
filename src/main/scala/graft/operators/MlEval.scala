package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
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
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
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
    val pred = sc
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("predicted"))
    test.select(col("doc_id"), col("lang").as("actual"))
      .join(pred, "doc_id")
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("actual", "predicted")
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
      .orderBy("lang", "rn")
  }

  val all: Seq[Q] = Seq(mlNaiveBayes, mlStumpGini, mlChi2Feature)
}
