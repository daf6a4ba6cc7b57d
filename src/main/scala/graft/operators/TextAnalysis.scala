package graft.operators

import graft.PlanUtil.TimedCheckpoint
import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the north-star
  * training-data-pipeline family (builder prompt; SURVEY.md §7.2 step 5):
  * token counting, quality scoring, language-ID, fingerprinting.
  *
  * Scale posture: every query here is split/explode/groupBy — the
  * inverted-index shape. Token explode multiplies rows ~50× but carries
  * only (doc_id, token); the groupBy is a partial+final hash aggregate on
  * the token key, which distributes by vocabulary and never collects a
  * document to the driver.
  */
object TextAnalysis {

  private[operators] val stopwords = Seq("the", "a", "of", "and", "is")

  /** Term/document frequency — whitespace tokenization + explode + two-level
    * count (token counting over 100 TB is exactly this plan). */
  val textTokens: Q = Q(
    "text_tokens",
    """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY tf DESC, token LIMIT 50""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("token"))
      .limit(50)
  }

  /** Per-document quality metrics: token counts (whitespace + regex),
    * type-token ratio inputs, average token length, stopword ratio. All
    * ratios are double divisions of exact ints — bit-identical across
    * engines. Pure projection: no shuffle at all. */
  val textQuality: Q = Q(
    "text_quality",
    s"""SELECT doc_id, n_chars,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha_tokens,
      |  CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
      |  CAST(len(list_filter(string_split(text, ' '),
      |       t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stopword_ratio
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d).select(
      col("doc_id"), col("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_alpha_tokens"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks))
        .as("avg_token_len"),
      (size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks))
        .as("stopword_ratio")
    )
  }

  /** Marker-score argmax as a reusable Column over a token array — shared
    * by [[langId]] and the corpus-selection pipeline. */
  private[operators] def predictLang(toks: org.apache.spark.sql.Column) = {
    def score(markers: String*) = size(filter(toks, t => t.isin(markers: _*)))
    val (sEn, sDe, sEs) =
      (score("the", "a", "of"), score("der", "die", "und"),
       score("el", "los", "una"))
    when(sEn >= sDe && sEn >= sEs && sEn > 0, "en")
      .when(sDe >= sEs && sDe > 0, "de")
      .when(sEs > 0, "es")
      .otherwise("und")
  }

  /** Language-ID by marker-token scoring (the n-gram-heuristic family):
    * score = marker hits per language, predict argmax with a deterministic
    * tie-break order, 'und' when no evidence. The `lang` column is kept as
    * ground truth for accuracy measurement downstream. */
  val langId: Q = Q(
    "lang_id",
    """WITH s AS (SELECT doc_id, lang,
      |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of'))) AS s_en,
      |  len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) AS s_de,
      |  len(list_filter(string_split(text,' '), t -> t IN ('el','los','una'))) AS s_es
      |FROM documents)
      |SELECT doc_id, lang AS actual,
      |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
      |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
      |       WHEN s_es > 0 THEN 'es'
      |       ELSE 'und' END AS predicted,
      |  CAST(s_en AS INT) AS s_en, CAST(s_de AS INT) AS s_de, CAST(s_es AS INT) AS s_es
      |FROM s ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    def score(markers: String*) = size(filter(toks, t => t.isin(markers: _*)))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("actual"),
        // the shared heuristic — one definition for lang_id AND
        // corpus_select, so the marker lists can't drift apart
        predictLang(toks).as("predicted"),
        score("the", "a", "of").as("s_en"),
        score("der", "die", "und").as("s_de"),
        score("el", "los", "una").as("s_es"))
  }

  /** LANGUAGE-ID CONFUSION MATRIX — the evaluation harness over
    * [[predictLang]] (the recall_eval discipline applied to the text
    * family): the fixture carries ground-truth `lang`, so the classifier
    * becomes measurable — per (actual, predicted) cell the count and the
    * within-actual share (recall on the diagonal, confusion off it).
    * This is the readout that tunes marker lists: zh/fr have no markers
    * here, so their rows land in 'und'/'en' — reported, not hidden.
    *
    * One corpus pass to the |langs|²-bounded cell aggregate; the
    * per-actual total rides a window over that tiny frame. Exact counts,
    * floor-DIV ppm. */
  val langConfusion: Q = Q(
    "lang_confusion",
    """WITH s AS (SELECT lang,
      |  len(list_filter(string_split(text,' '),
      |      t -> t IN ('the','a','of'))) AS s_en,
      |  len(list_filter(string_split(text,' '),
      |      t -> t IN ('der','die','und'))) AS s_de,
      |  len(list_filter(string_split(text,' '),
      |      t -> t IN ('el','los','una'))) AS s_es
      |FROM documents),
      |p AS (SELECT lang AS actual,
      |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
      |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
      |       WHEN s_es > 0 THEN 'es'
      |       ELSE 'und' END AS predicted
      |  FROM s),
      |m AS (SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
      |      FROM p GROUP BY 1, 2)
      |SELECT actual, predicted, n,
      |  CAST((1000000 * n) // sum(n) OVER (PARTITION BY actual)
      |       AS BIGINT) AS share_ppm,
      |  actual = predicted AS correct
      |FROM m ORDER BY actual, predicted""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val m = Tables.documents(s, d)
      .select(col("lang").as("actual"), predictLang(toks).as("predicted"))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n"))
    m.withColumn("tot",
        sum(col("n")).over(Window.partitionBy("actual")))
      .select(col("actual"), col("predicted"), col("n"),
        expr("(1000000 * n) div tot").cast("long").as("share_ppm"),
        (col("actual") === col("predicted")).as("correct"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set — a
    * bag-of-words fingerprint that is stable under token reordering (the
    * canonical cheap document fingerprint; a rolling/shingle hash variant
    * lives in [[graft.functions.TextFns.rollingHash]]). */
  val textFingerprint: Q = Q(
    "text_fingerprint",
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
        .cast("binary")).as("fingerprint"))
  }

  /** TF-IDF-style term weighting, log-free for exact cross-engine parity:
    * weight = tf · N/df (all-integer inputs, one double division — the
    * log() variant differs in the last ulp between libm and the JVM).
    * Top-20 weighted terms corpus-wide with deterministic tie-breaks. */
  val textTfidf: Q = Q(
    "text_tfidf",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT tf.doc_id, tf.token,
      |  CAST(tf.tf AS INT) AS tf, CAST(df.df AS INT) AS df,
      |  tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS weight
      |FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
      |ORDER BY weight DESC, tf.doc_id, tf.token LIMIT 20""".stripMargin
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf").cast("int").as("tf"),
        col("df").cast("int").as("df"),
        (col("tf") * (col("n_docs").cast("double") / col("df")))
          .as("weight"))
      .orderBy(desc("weight"), asc("doc_id"), asc("token"))
      .limit(20)
  }

  /** Normalization pipeline: lowercase → strip non-alphanumerics →
    * collapse whitespace → trim; plus before/after token counts. The
    * regex classes used exist with identical semantics in Java regex and
    * RE2 (DuckDB), so parity is exact. */
  val textNormalize: Q = Q(
    "text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |       ' +', ' ', 'g')) AS norm_text,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens_raw,
      |  CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |       '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS INT) AS n_tokens_norm
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, d).select(
      col("doc_id"),
      norm.as("norm_text"),
      size(split(col("text"), " ")).as("n_tokens_raw"),
      size(split(norm, " ")).as("n_tokens_norm")
    )
  }

  /** One row per word bigram (with multiplicity) via the native
    * [[graft.functions.expressions.NgramTokens]] generator — a streamed
    * single byte-scan per document; the built-ins alternative
    * (`transform(sequence(...), concat_ws(element_at...))` + explode) is
    * an interpreted HOF that materializes the full bigram array per row
    * and benched ~2× slower at sf0.1. Documents with <2 tokens emit
    * nothing. */
  private def bigramRows(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.graft.Bridge
    Tables.documents(s, d).select(col("doc_id"),
      Bridge.column(graft.functions.expressions.NgramTokens(
        Bridge.expression(col("text")), 2)).as(Seq("bigram")))
  }

  /** Repetition-based quality signals (the Gopher/C4 rule family): the
    * fraction of bigram mass held by the single most repeated bigram, and
    * the duplicate-token fraction. High values mark boilerplate/spam that
    * a training-corpus filter drops. Plan: one explode + two keyed
    * aggregations (doc_id, bigram) → (doc_id) — partial+final all the
    * way; the token-level stats branch is a narrow projection joined back
    * on doc_id. All ratios are int/int double divisions — exact parity. */
  val textRepetition: Q = Q(
    "text_repetition",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |bg AS (SELECT doc_id,
      |  unnest([array_to_string(toks[i:i+1],' ') FOR i IN range(1, len(toks))]) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |rep AS (SELECT doc_id, CAST(max(c) AS INT) AS top_bigram_n,
      |  CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
      |  FROM bc GROUP BY 1),
      |st AS (SELECT doc_id, len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_uniq FROM t)
      |SELECT st.doc_id, CAST(n_tokens AS INT) AS n_tokens,
      |  rep.top_bigram_n, rep.n_bigrams, rep.top_bigram_frac,
      |  1.0 - CAST(n_uniq AS DOUBLE) / n_tokens AS dup_token_frac
      |FROM st LEFT JOIN rep ON st.doc_id = rep.doc_id
      |ORDER BY st.doc_id""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val docs = Tables.documents(s, d)
    val rep = bigramRows(s, d)
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).cast("int").as("top_bigram_n"),
           sum(col("c")).as("n_bigrams"),
           (max(col("c")).cast("double") / sum(col("c")))
             .as("top_bigram_frac"))
    docs
      .select(col("doc_id"), size(toks).as("n_tokens"),
              size(array_distinct(toks)).as("n_uniq"))
      .join(rep, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("top_bigram_n"),
        col("n_bigrams"), col("top_bigram_frac"),
        (lit(1.0) - col("n_uniq").cast("double") / col("n_tokens"))
          .as("dup_token_frac"))
  }

  /** PII redaction: scrub email/phone patterns and count what was
    * scrubbed (the pre-training privacy pass). The corpus is synthetic
    * and clean, so deterministic PII is first APPENDED from the doc id —
    * the redaction then has real matches to find. Regex classes are
    * limited to ones with identical Java-regex/RE2 semantics. Pure
    * projection: no shuffle, trivially 100 TB-safe. */
  val piiRedact: Q = Q(
    "pii_redact",
    """WITH aug AS (SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@mail.example or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |  AS raw FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z][a-z0-9.]+')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
      |  regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z][a-z0-9.]+', '<EMAIL>', 'g'),
      |                 '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val raw = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example or 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        size(expr("regexp_extract_all(raw, '[a-z0-9.]+@[a-z][a-z0-9.]+', 0)"))
          .as("n_emails"),
        size(expr("regexp_extract_all(raw, '555-[0-9]{4}', 0)")).as("n_phones"),
        regexp_replace(
          regexp_replace(col("raw"), "[a-z0-9.]+@[a-z][a-z0-9.]+", "<EMAIL>"),
          "555-[0-9]{4}", "<PHONE>").as("redacted"))
  }

  /** Corpus-level bigram frequency top-30 (n-gram LM counting — the same
    * explode + partial/final aggregate + TakeOrderedAndProject shape as
    * [[textTokens]], one n up). */
  val ngramFreq: Q = Q(
    "ngram_freq",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |bg AS (SELECT doc_id,
      |  unnest([array_to_string(toks[i:i+1],' ') FOR i IN range(1, len(toks))]) AS bigram
      |  FROM t WHERE len(toks) >= 2)
      |SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
      |FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""".stripMargin
  ) { (s, d) =>
    bigramRows(s, d)
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(30)
  }

  /** Benchmark-contamination check (training-data hygiene staple): how
    * much of each training document's 3-shingle set also appears in a
    * held-out "benchmark" slice of the corpus (here doc_id % 97 == 0,
    * ~1%). Any document with overlap is reported with its contaminated
    * fraction — the decision input for decontamination filtering.
    *
    * Plan shape is the scale-correct one: the benchmark's distinct
    * shingles are a tiny table (1% of docs) that BROADCASTS to the
    * training side, so the check is one narrow generator pass plus a
    * broadcast join — no shuffle of the 100 TB training corpus at all;
    * the only exchange is the per-doc count aggregation. Per-doc totals
    * ride on the generator rows ([[Dedup.shingleHashesPortable]]), so no
    * second pass or re-join is needed. Portable hashes make the whole
    * computation value-checked against DuckDB. */
  val textContamination: Q = Q(
    "text_contamination", {
      val ph = graft.functions.expressions.PortableHash
        .duckdbSql("array_to_string(toks[i:i+2],' ')")
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct([$ph FOR i IN range(1, len(toks)-1)]) AS sgl
         |  FROM t WHERE len(toks) >= 3),
         |bench AS (SELECT DISTINCT unnest(sgl) AS sglv FROM sh WHERE doc_id % 97 = 0),
         |train AS (SELECT doc_id, len(sgl) AS n_sgl, unnest(sgl) AS sglv
         |          FROM sh WHERE doc_id % 97 <> 0),
         |c AS (SELECT doc_id, n_sgl, count(*) AS n_cont
         |      FROM train JOIN bench USING (sglv) GROUP BY 1, 2)
         |SELECT doc_id, CAST(n_sgl AS INT) AS n_sgl,
         |  CAST(n_cont AS BIGINT) AS n_cont,
         |  CAST(n_cont AS DOUBLE) / n_sgl AS contamination
         |FROM c ORDER BY doc_id""".stripMargin
    }
  ) { (s, d) =>
    val sh = Dedup.shingleHashesPortable(s, d)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("sgl")).distinct()
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    train.join(broadcast(bench), Seq("sgl"))
      .groupBy("doc_id", "n_sgl")
      .agg(count(lit(1)).as("n_cont"))
      .select(col("doc_id"), col("n_sgl"), col("n_cont"),
        (col("n_cont").cast("double") / col("n_sgl")).as("contamination"))
  }

  /** BPE-style pre-tokenization counting (the token-budget estimate a
    * training pipeline runs before the real tokenizer): a GPT-2-shaped
    * pre-tokenizer regex — contraction suffixes, space-prefixed letter
    * runs, digit runs, punctuation runs — counted per document next to
    * the whitespace count, with fertility = bpe/ws (the "how many pieces
    * per word" signal that flags code/URLs/non-English). Pure narrow
    * projection, no shuffle; the regex is RE2-safe (non-capturing groups
    * only) so Spark's Java regex and DuckDB's RE2 agree. */
  val textTokenBpe: Q = {
    val pat = "(?:'(?:s|t|re|ve|m|ll|d))|(?: ?[a-zA-Z]+)|(?: ?[0-9]+)|(?: ?[^a-zA-Z0-9 ]+)"
    val sqlPat = pat.replace("'", "''") // SQL string-literal quoting
    Q(
      "text_token_bpe",
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
         |  CAST(len(regexp_extract_all(text, '$sqlPat')) AS INT) AS n_bpe,
         |  CAST(len(regexp_extract_all(text, '$sqlPat')) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS fertility
         |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val bpe = size(regexp_extract_all(col("text"), lit(pat), lit(0)))
      val ws = size(split(col("text"), " "))
      Tables.documents(s, d).select(col("doc_id"),
        ws.as("n_ws"), bpe.as("n_bpe"),
        (bpe.cast("double") / ws).as("fertility"))
    }
  }

  /** Per-document bigram cross-entropy under the corpus's own bigram LM —
    * the statistical-quality score a perplexity filter ranks documents by
    * (high average cost = improbable word sequences = drop candidate).
    *
    * Portability is the design constraint: `ln` outputs are not
    * bit-specified across engines, so each DISTINCT bigram's cost is
    * quantized ONCE to integer millinats (`floor(-1000·ln(c₂/c₁))`) in the
    * LM table; per-document totals are then BIGINT sums — exact and
    * order-independent — and the mean is a single int/int division. A
    * 1-ulp `ln` divergence only matters if a cost sits within ~1e-13 of
    * an integer boundary, vanishingly unlikely over a vocabulary-bounded
    * set of rational probabilities.
    *
    * Plan shape at 100 TB: the LM is two partial+final aggregates over
    * the bigram explode (context counts c₁ aggregate the ALREADY-reduced
    * c₂, never the raw stream twice); the LM table is vocabulary²-bounded,
    * so scoring is a BROADCAST join onto the bigram stream followed by a
    * per-doc aggregate — the corpus shuffles once (by bigram) to build
    * the model and once (by doc) to score. */
  val textPerplexity: Q = Q(
    "text_perplexity",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |bg AS (SELECT doc_id,
      |  unnest([array_to_string(toks[i:i+1],' ') FOR i IN range(1, len(toks))]) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |c2 AS (SELECT bigram, count(*) AS n2 FROM bg GROUP BY 1),
      |c1 AS (SELECT string_split(bigram,' ')[1] AS w1, sum(n2) AS n1
      |       FROM c2 GROUP BY 1),
      |lm AS (SELECT bigram,
      |         CAST(floor(-1000.0 * ln(CAST(n2 AS DOUBLE) / n1)) AS BIGINT)
      |           AS cost_milli
      |       FROM c2 JOIN c1 ON string_split(bigram,' ')[1] = c1.w1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(cost_milli) AS BIGINT) AS nll_milli,
      |  CAST(sum(cost_milli) AS DOUBLE) / count(*) AS avg_nll_milli
      |FROM bg JOIN lm USING (bigram)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val bg = bigramRows(s, d)
    val c2 = bg.groupBy("bigram").agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("n2")).as("n1"))
    val lm = c2.join(c1, substring_index(col("bigram"), " ", 1) === col("w1"))
      .select(col("bigram"),
        floor(lit(-1000.0) * log(col("n2").cast("double") / col("n1")))
          .as("cost_milli"))
    bg.join(broadcast(lm), Seq("bigram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("cost_milli")).as("nll_milli"),
           (sum(col("cost_milli")).cast("double") / count(lit(1)))
             .as("avg_nll_milli"))
  }

  /** Cross-document repeated-SPAN census (the C4/RefinedWeb span-dedup
    * decision input): for every document, how many of its distinct
    * 3-token spans also occur in at least one OTHER document. Unlike
    * [[graft.operators.Dedup.dedupNgram]] (doc-pair Jaccard) this is
    * span-level — it flags boilerplate fragments inside otherwise-unique
    * documents. Plan shape: the global document frequency rides back on
    * the span rows via a span-keyed WINDOW (no self-join of the span
    * table, no broadcast — the span table is corpus-sized), then one
    * per-doc aggregate: exactly two shuffles for a corpus-global
    * statistic. Portable hashes make it value-checked. */
  val spanDedup: Q = Q(
    "span_dedup", {
      val ph = graft.functions.expressions.PortableHash
        .duckdbSql("array_to_string(toks[i:i+2],' ')")
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |  unnest(list_distinct([$ph FOR i IN range(1, len(toks)-1)])) AS sgl
         |  FROM t WHERE len(toks) >= 3),
         |c AS (SELECT doc_id, count(*) OVER (PARTITION BY sgl) AS df FROM sh)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    }
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sgl")
    graft.operators.Dedup.shingleHashesPortable(s, d)
      .withColumn("df", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
           sum(when(col("df") >= 2, 1).otherwise(0)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
  }

  /** Misra–Gries summary of one partition's token stream: at most `cap`
    * counters; a full table decrements everything (dropping zeros) — the
    * classic one-pass frequent-items sketch. DETERMINISTIC guarantee (no
    * probability involved): any item with partition frequency
    * > n_partition/(cap+1) survives in the map, and per-partition
    * summaries are mergeable by union, so the union of partition
    * candidate sets contains every GLOBAL item with frequency
    * > n/(cap+1). */
  private[graft] def misraGries(iter: Iterator[String],
                                cap: Int): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    misraGriesInto(m, iter, cap)
    m.iterator.map { case (t, c) => (t, c) }
  }

  /** The MG fold factored over an EXISTING counter map, so a resumed
    * fold (streaming state across micro-batches) is definitionally the
    * same one-pass summary as folding the concatenated stream —
    * [[graft.streaming.Streams.mgSummaries]] persists exactly this map
    * between batches. */
  private[graft] def misraGriesInto(
      m: scala.collection.mutable.HashMap[String, Long],
      iter: Iterator[String], cap: Int): Unit =
    iter.foreach { t =>
      m.get(t) match {
        case Some(c) => m(t) = c + 1
        case None if m.size < cap => m(t) = 1L
        case None =>
          val dead = List.newBuilder[String]
          m.keysIterator.foreach { k =>
            val v = m(k) - 1
            if (v == 0) dead += k else m(k) = v
          }
          dead.result().foreach(m.remove)
      }
    }

  private[graft] val HhThreshold = 200L // heavy = > 1/200 of all tokens
  private[graft] val MgCap = 1024       // MG capacity per partition

  /** HEAVY HITTERS the scale way — the two-pass frequent-items plan every
    * large-corpus vocabulary audit runs: (1) a one-pass per-partition
    * Misra–Gries sketch (`mapPartitions`, ≤ [[MgCap]] counters per task,
    * NO full-vocabulary shuffle) whose merged candidate set PROVABLY
    * contains every token with frequency > n/(cap+1) ⊇ all > n/200;
    * (2) an exact recount of candidates only (broadcast semi join —
    * candidates ≤ partitions × cap regardless of vocabulary size), then
    * the threshold filter. Result is therefore EXACTLY the naive
    * full-groupBy answer — the oracle is plain SQL — but the corpus-wide
    * aggregate keyed by the unbounded vocabulary never happens.
    * TextFnsSpec asserts the MG containment bound directly. */
  val textHeavyHitters: Q = Q(
    "text_heavy_hitters",
    s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token
       |            FROM documents),
       |tok AS (SELECT token FROM tk WHERE token <> ''),
       |tot AS (SELECT count(*) AS n_total FROM tok),
       |c AS (SELECT token, count(*) AS c FROM tok GROUP BY 1)
       |SELECT token, CAST(c AS BIGINT) AS c,
       |  CAST(c AS DOUBLE) / n_total AS share
       |FROM c, tot WHERE c * $HhThreshold > n_total
       |ORDER BY c DESC, token""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val total = toks.agg(count(lit(1)).as("n_total"))
    val cands = toks.as[String]
      .mapPartitions(it => misraGries(it, MgCap))
      .toDF("token", "mg_count")
      .select("token").distinct()
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(total))
      .filter(col("c") * HhThreshold > col("n_total"))
      .select(col("token"), col("c"),
        (col("c").cast("double") / col("n_total")).as("share"))
  }

  /** Hashed-feature buckets of the linear quality model: 256 weights in
    * exact integer micro-units, seeded — a fixed "trained" artifact that
    * inlines into the oracle, exactly like the LSH hyperplanes. (A real
    * deployment would load fastText/logreg weights from a model file;
    * the container has no model artifacts, so a seeded table stands in.
    * Everything around it — the hashing trick, the exact-integer margin,
    * the plan — is the production item.) */
  private[graft] val QcBuckets = 256
  private[graft] lazy val qcWeights: IndexedSeq[Long] = {
    val rnd = new scala.util.Random(13)
    IndexedSeq.fill(QcBuckets)((rnd.nextInt(1000001) - 500000).toLong)
  }

  /** LINEAR QUALITY CLASSIFIER over hashed bag-of-words features — the
    * fastText-shaped model-based filter stage every pretraining corpus
    * passes through (CCNet/RefinedWeb style: score every document with a
    * cheap linear model, keep the high-margin side). The hashing trick
    * maps each token to one of [[QcBuckets]] buckets via the portable
    * md5 hash, so the feature space is FIXED-WIDTH regardless of
    * vocabulary — no vocab table, no join, no OOV handling; the margin is
    * Σ w[h(tok) % B] over the doc's tokens.
    *
    * Determinism discipline: weights are exact integer micro-units, so a
    * doc's margin is an exact BIGINT sum — order-independent at any
    * parallelism (the float-dot-product formulation would be partition-
    * order dependent). The keep decision is a margin sign test.
    * Plan shape at 100 TB: explode → bucket lookup against a 256-entry
    * literal array (codegen, no join) → ONE partial+final aggregate keyed
    * by doc_id; the weight table ships in the plan (2 KB), never
    * broadcast or shuffled. */
  val textQualityClassifier: Q = {
    val ph = graft.functions.expressions.PortableHash
      .duckdbSaltedSql("token", "#qc", 15)
    val wSql = qcWeights.mkString("[", ",", "]")
    Q(
      "text_quality_classifier",
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |           FROM documents),
         |s AS (SELECT doc_id,
         |        ($wSql)[1 + CAST($ph % $QcBuckets AS INT)] AS w
         |      FROM t WHERE token <> '')
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
         |  CAST(sum(w) AS BIGINT) AS margin_micro,
         |  sum(w) > 0 AS keep
         |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import graft.functions.TextFns
      val w = typedlit(qcWeights)
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .select(col("doc_id"), element_at(w,
          (pmod(TextFns.saltedHash(col("token"), "#qc", 15),
                lit(QcBuckets)) + 1).cast("int")).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tokens"),
             sum(col("w")).as("margin_micro"))
        .select(col("doc_id"), col("n_tokens"), col("margin_micro"),
                (col("margin_micro") > 0).as("keep"))
    }
  }

  private val CmDepth = 4
  private val CmWidth = 256

  /** COUNT-MIN SKETCH over the token stream — the third frequent-items
    * structure in the catalog (Misra–Gries gives deterministic candidate
    * containment, HLL counts distincts; CMS answers POINT frequency
    * queries from a fixed d×w counter table). Build: every token
    * increments one counter per row r at column hash_r(token) mod w —
    * here one explode to [[CmDepth]] (r, bucket) rows and a partial+final
    * count keyed by the BOUNDED (r, bucket) space, so the sketch build
    * never shuffles the vocabulary (the same reason the table is
    * mergeable across shards: counter matrices add). Query: est(t) =
    * min_r table[r][hash_r(t)] — always ≥ the true count (only
    * collisions inflate), within ε·N with the standard probabilistic
    * bound. Output: the heavy tokens with exact count, CMS estimate, and
    * the realized overestimate.
    *
    * Everything is exact integer arithmetic on portable hashes, so the
    * WHOLE sketch — table, point queries, overestimates — carries a full
    * value oracle (most engines settle for an error-bound spec here). */
  val textCountmin: Q = {
    val ph = (r: Int) => graft.functions.expressions.PortableHash
      .duckdbSaltedSql("token", s"#cm$r", 15)
    val cmsRows = (0 until CmDepth)
      .map(r => s"SELECT $r AS r, ${ph(r)} % $CmWidth AS bucket FROM tok")
      .mkString("\nUNION ALL ")
    val hbRows = (0 until CmDepth)
      .map(r => s"SELECT token, c, $r AS r, ${ph(r)} % $CmWidth AS bucket FROM heavy")
      .mkString("\nUNION ALL ")
    Q(
      "text_countmin",
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token
         |            FROM documents),
         |tok AS (SELECT token FROM tk WHERE token <> ''),
         |tot AS (SELECT count(*) AS n_total FROM tok),
         |ex AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
         |heavy AS (SELECT token, c FROM ex, tot WHERE c * 200 > n_total),
         |cms AS (SELECT r, bucket, count(*) AS cnt
         |        FROM ($cmsRows) GROUP BY 1, 2),
         |hb AS ($hbRows)
         |SELECT token, CAST(c AS BIGINT) AS exact_c,
         |  CAST(min(cnt) AS BIGINT) AS cms_est,
         |  CAST(min(cnt) - c AS BIGINT) AS overestimate
         |FROM hb JOIN cms USING (r, bucket)
         |GROUP BY token, c ORDER BY token""".stripMargin
    ) { (s, d) =>
      import graft.functions.TextFns
      def buckets(tokenCol: org.apache.spark.sql.Column) =
        explode(array((0 until CmDepth).map { r =>
          struct(lit(r).as("r"),
            pmod(TextFns.saltedHash(tokenCol, s"#cm$r", 15),
                 lit(CmWidth)).as("bucket"))
        }: _*))
      // ONE corpus pass: the (token, c) vocabulary relation, checkpointed
      // (vocab-bounded), then total, sketch, and heavy set all DERIVE
      // from it — the counter table is Σc per bucket, identical to
      // counting raw instances, so the corpus is never re-exploded (the
      // three-pass formulation re-tokenized the corpus per consumer;
      // measured 1.8s → 0.9s at sf0.1).
      val ex = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("c"))
        .timedLocalCheckpoint()
      val cms = ex.select(buckets(col("token")).as("rb"), col("c"))
        .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .agg(sum(col("c")).as("cnt"))
      val total = ex.agg(sum(col("c")).as("n_total"))
      val heavy = ex
        .crossJoin(broadcast(total))
        .filter(col("c") * HhThreshold > col("n_total"))
        .select(col("token"), col("c"))
      heavy.select(col("token"), col("c"), buckets(col("token")).as("rb"))
        .select(col("token"), col("c"), col("rb.r").as("r"),
                col("rb.bucket").as("bucket"))
        .join(broadcast(cms), Seq("r", "bucket"))
        .groupBy("token", "c")
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("token"), col("c").as("exact_c"), col("cms_est"),
                (col("cms_est") - col("c")).as("overestimate"))
    }.copy(eager = true) // vocabulary checkpoint runs the corpus pass
  }

  /** COLLOCATION MINING (phrase detection, the word2phrase / NLTK
    * collocation shape): bigrams scored by pointwise mutual information
    * PMI = ln(p(ab) / (p(a)·p(b))) with a min-count floor — high-PMI
    * pairs are the multiword units a tokenizer should fuse before
    * training. The emitted score is the LIFT p(ab)/(p(a)·p(b)) — exp of
    * the PMI, same ranking (ln is monotone) — because lift needs only
    * divisions and one multiply, all correctly-rounded IEEE ops that
    * agree bit-for-bit across engines; `ln` itself is the one libm op
    * with no cross-engine rounding guarantee (measured: 1-ulp
    * Java-vs-DuckDB divergence on this very data). Ranking ties break
    * on the bigram string.
    *
    * Plan: EXACTLY two corpus passes (token explode → unigram counts;
    * bigram generator → bigram counts) — the PMI numerator and
    * denominator need different generators, so two is the floor, and
    * the plan audit locks it. The scalar totals ride unpartitioned
    * windows OVER the vocab-bounded aggregates (never the corpus frame —
    * the `corpus_entropy` discipline), not separate re-aggregations that
    * would rescan the corpus per reference; both unigram attachments
    * melt into ONE broadcast join by posexploding the bigram's two
    * tokens and folding back with a positional pivot — at open-web
    * vocab the same join runs shuffled on the token key, semantics
    * unchanged. The min-count filter prunes bigrams BEFORE the join. */
  val textCollocations: Q = Q(
    "text_collocations",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |tok AS (SELECT unnest(toks) AS token FROM t),
      |uni AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
      |nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_tok FROM uni),
      |bg AS (SELECT unnest([array_to_string(toks[i:i+1],' ')
      |                     FOR i IN range(1, len(toks))]) AS bigram
      |       FROM t WHERE len(toks) >= 2),
      |bc AS (SELECT bigram, count(*) AS n_ab FROM bg GROUP BY 1
      |       HAVING count(*) >= 5),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM bg),
      |j AS (SELECT bc.bigram, bc.n_ab, ua.n AS n_a, ub.n AS n_b
      |      FROM bc
      |      JOIN uni ua ON string_split(bc.bigram, ' ')[1] = ua.token
      |      JOIN uni ub ON string_split(bc.bigram, ' ')[2] = ub.token)
      |SELECT bigram, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  (CAST(n_ab AS DOUBLE) / (SELECT n_big FROM nb))
      |   / ((CAST(n_a AS DOUBLE) / (SELECT n_tok FROM nt))
      |      * (CAST(n_b AS DOUBLE) / (SELECT n_tok FROM nt))) AS lift
      |FROM j ORDER BY lift DESC, bigram LIMIT 40""".stripMargin
  ) { (s, d) =>
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val uni = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .withColumn("n_tok", sum(col("n")).over(wAll))
    val bc = bigramRows(s, d)
      .groupBy("bigram").agg(count(lit(1)).as("n_ab"))
      .withColumn("n_big", sum(col("n_ab")).over(wAll))
      .filter(col("n_ab") >= 5)
    bc.select(col("bigram"), col("n_ab"), col("n_big"),
        posexplode(split(col("bigram"), " ")).as(Seq("pos", "token")))
      .join(broadcast(uni), Seq("token"))
      .groupBy("bigram", "n_ab", "n_big")
      .agg(max(when(col("pos") === 0, col("n"))).as("n_a"),
           max(when(col("pos") === 1, col("n"))).as("n_b"),
           max(col("n_tok")).as("n_tok"))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab").cast("double") / col("n_big")) /
          ((col("n_a").cast("double") / col("n_tok")) *
           (col("n_b").cast("double") / col("n_tok")))).as("lift"))
      .orderBy(desc("lift"), asc("bigram")).limit(40)
  }

  /** Classifier-quality evaluation as a first-class query (the
    * [[graft.operators.Vectors]] recall-eval discipline applied to
    * [[langId]]): the confusion matrix of the marker-score language
    * heuristic against the `lang` ground-truth column, each cell with
    * its share of the true class (the per-class recall when actual =
    * predicted). Shares the one [[predictLang]] definition, so the
    * measured classifier IS the deployed classifier. One corpus pass →
    * a ≤ |langs|² cell aggregate; the share window runs over those few
    * cells, partitioned by the true class. The honest readout at sf0.1:
    * EVERY label row predicts 'en' at ~90% (the rest 'und') — the
    * synthetic corpus draws English-ish tokens regardless of its `lang`
    * label, so the matrix exposes a label/content disagreement rather
    * than a classifier deficit. Surfacing exactly that kind of
    * ground-truth defect is what making evals queryable is for. */
  val textLangidEval: Q = Q(
    "text_langid_eval",
    """WITH s AS (SELECT doc_id, lang,
      |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of'))) AS s_en,
      |  len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) AS s_de,
      |  len(list_filter(string_split(text,' '), t -> t IN ('el','los','una'))) AS s_es
      |FROM documents),
      |p AS (SELECT lang AS actual,
      |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
      |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
      |       WHEN s_es > 0 THEN 'es'
      |       ELSE 'und' END AS predicted
      |FROM s),
      |c AS (SELECT actual, predicted, count(*) AS n_docs FROM p GROUP BY 1, 2),
      |t AS (SELECT actual, count(*) AS tot FROM p GROUP BY 1)
      |SELECT c.actual, c.predicted, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_docs AS DOUBLE) / tot AS share_of_actual
      |FROM c JOIN t ON c.actual = t.actual
      |ORDER BY c.actual, predicted""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(col("lang").as("actual"),
              predictLang(split(col("text"), " ")).as("predicted"))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_of_actual",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(Window.partitionBy("actual")))
  }

  /** BM25 ranked retrieval for a fixed 3-term query over the corpus —
    * the scoring layer a training-data search/curation UI sits on, one
    * level above [[textTfidf]]'s raw weights. Per (term, doc): the exact
    * Robertson tf saturation tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * k1=1.2, b=0.75, times the idf LIFT (N−df+0.5)/(df+0.5)+1 — the
    * argument of BM25's ln, emitted unlogged because ln is the one
    * transcendental that breaks cross-engine bit parity
    * (docs/ORACLE_PARITY.md) and it is strictly monotone, so per-term
    * ranking is exactly BM25's.
    *
    * Plan: tokens are filtered to the query terms BEFORE the (doc,term)
    * aggregate, so every shuffle carries query-term hits only. Doc
    * length comes from a narrow scan (`size(split(...))` — no explode,
    * no shuffle); df and the corpus constants are tiny frames joined by
    * broadcast. The corpus is tokenized more than once (tf and df
    * branches specialize under column pruning) — at serving scale the
    * df/avgdl/N side would come from the standing
    * [[textInvertedIndex]] artifact instead of a rescan, which this
    * query deliberately inlines to stay a one-shot oracle-checkable
    * plan. */
  val textBm25: Q = Q(
    "text_bm25",
    """WITH dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl FROM documents),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, token, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |             FROM documents)
      |       WHERE token IN ('spark','merge','window') GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, dl.dl,
      |        (n_docs - df.df + CAST(0.5 AS DOUBLE))
      |          / (df.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE) AS idf_lift,
      |        tf.tf * CAST(2.2 AS DOUBLE)
      |          / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
      |             - CAST(0.75 AS DOUBLE)
      |             + CAST(0.75 AS DOUBLE) * dl.dl / avgdl)) AS tf_norm
      |      FROM tf JOIN df ON tf.token = df.token
      |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c)
      |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |  CAST(dl AS BIGINT) AS dl, idf_lift, tf_norm,
      |  idf_lift * tf_norm AS score
      |FROM s ORDER BY score DESC, token, doc_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val terms = Seq("spark", "merge", "window")
    val docs = Tables.documents(s, d)
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    val c = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      // substring prefilter (a SUPERSET of the exact token match — e.g.
      // it also admits 'sparky', which the isin below then drops) pushes
      // into the parquet scan as a row-group-skippable predicate, so the
      // explode runs over matching docs only instead of the whole corpus
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idfLift = (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0)
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(c))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("dl"),
        idfLift.as("idf_lift"), tfNorm.as("tf_norm"))
      .withColumn("score", col("idf_lift") * col("tf_norm"))
      .orderBy(desc("score"), asc("token"), asc("doc_id"))
      .limit(20)
  }

  /** C4-style boilerplate removal at segment granularity: the corpus has
    * no line structure, so a "line" is a fixed 10-token non-overlapping
    * segment; any segment whose exact text appears in ≥ 2 DISTINCT
    * documents is boilerplate and is cut, and the survivors are stitched
    * back in order. Complements [[spanDedup]] (which only counts
    * overlapping-shingle duplication) by actually producing the cleaned
    * text.
    *
    * Plan: segmentation is a per-row array program (split → slice per
    * 10-token stride → posexplode) — no shuffle until the segment-keyed
    * exchange that computes distinct-doc df; the removal + stitch is one
    * doc-keyed aggregate whose collect_list is bounded by segments per
    * document (~n_tokens/10), never corpus-sized. At 100 TB both
    * exchanges carry (hashable-width key, tiny payload) rows. */
  val textBoilerplate: Q = Q(
    "text_boilerplate",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |seg AS (SELECT doc_id, CAST(i AS INT) AS seg_pos,
      |          array_to_string(toks[i*10+1 : i*10+10], ' ') AS seg
      |        FROM (SELECT doc_id, toks, unnest(range((len(toks)+9)//10)) AS i
      |              FROM t)),
      |d2 AS (SELECT seg, count(DISTINCT doc_id) AS df FROM seg GROUP BY 1),
      |j AS (SELECT s.doc_id, s.seg_pos, s.seg, d2.df
      |      FROM seg s JOIN d2 USING (seg))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
      |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  coalesce(string_agg(CASE WHEN df < 2 THEN seg END, ' '
      |             ORDER BY seg_pos), '') AS clean_text
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val segs = transform(
      sequence(lit(0),
        floor((size(toks) + lit(9)) / lit(10)).cast("int") - lit(1)),
      i => array_join(slice(toks, i * 10 + 1, lit(10)), " "))
    val seg = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(segs).as(Seq("seg_pos", "seg")))
    val df = seg.select("seg", "doc_id").distinct()
      .groupBy("seg").agg(count(lit(1)).as("df"))
    seg.join(df, Seq("seg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("df") >= 2, 1).otherwise(0)).as("n_boiler"),
        array_join(transform(
          array_sort(collect_list(when(col("df") < 2,
            struct(col("seg_pos"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
  }

  /** Inverted-index build: token → document frequency, collection
    * frequency, and the head of the sorted posting list — the core
    * artifact behind [[textBm25]]-style retrieval and
    * [[textContamination]]-style membership checks, materialized as a
    * queryable table (top 30 tokens by df here; the full index is the
    * same plan minus the limit).
    *
    * Plan: a (token, doc_id) pre-aggregate feeds both the stats rollup
    * and the posting heads. The two consumers look like one shared
    * subtree logically, but column pruning specializes each branch
    * (stats keeps the count, heads drop it), so physically the
    * map-side explode runs twice — deliberate: the one-pass
    * alternative (df/cf as token-partitioned window aggregates) buffers
    * an ENTIRE posting list in one window task, which for a stopword at
    * corpus scale is the single-task funnel this repo bans. The head is
    * capped to 8 doc_ids by a rank filter that compiles to a map-side
    * partial [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]]
    * — at most 8 rows per token leave each mapper, and collect_list
    * only ever sees ≤ 8 — the bounded-state trick that keeps the build
    * safe when one token appears in every document of a 100 TB corpus. */
  val textInvertedIndex: Q = Q(
    "text_inverted_index",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |             FROM documents),
      |td AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
      |st AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
      |              CAST(sum(c) AS BIGINT) AS cf FROM td GROUP BY 1),
      |hd AS (SELECT token,
      |         array_to_string((list_sort(list(doc_id)))[1:8], ',') AS postings_head
      |       FROM td GROUP BY 1)
      |SELECT st.token, st.df, st.cf, hd.postings_head
      |FROM st JOIN hd USING (token)
      |ORDER BY df DESC, token LIMIT 30""".stripMargin
  ) { (s, d) =>
    val td = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
    val st = td.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
    val hd = td
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("token").orderBy("doc_id")))
      .filter(col("rn") <= 8)
      .groupBy("token")
      .agg(array_join(
        sort_array(collect_list(col("doc_id"))).cast("array<string>"), ",")
        .as("postings_head"))
    st.join(hd, Seq("token"))
      .orderBy(desc("df"), asc("token"))
      .limit(30)
  }

  /** INCREMENTAL INDEX MAINTENANCE for the inverted index — the
    * `agg_incremental`/`vector_index_delta` contract applied to text
    * retrieval: a new BATCH of documents (doc_id % 10 == 7, the
    * repo's incremental convention) merges into the STANDING index
    * without re-scanning the standing corpus. Disjoint doc sets make
    * every merge exact: df and cf ADD, and the merged posting head is
    * the first 8 of the two sorted heads' union (each head holds its
    * side's smallest 8, so the union's smallest 8 is a subset of the
    * concatenation — no information was lost to the cap). The oracle
    * is the FULL-REBUILD query over all documents, so the hash match
    * proves merge ≡ rebuild — the contract that lets a 100 TB index
    * absorb a daily batch with only the batch scanning. (Both sides
    * are computed fresh here so the query is self-contained; in
    * production the standing side loads from the stored index, as
    * dedup_incremental's persisted-index spec demonstrates.) */
  val textIndexDelta: Q = Q(
    "text_index_delta",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
      |             FROM documents),
      |td AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
      |st AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
      |              CAST(sum(c) AS BIGINT) AS cf FROM td GROUP BY 1),
      |hd AS (SELECT token,
      |         array_to_string((list_sort(list(doc_id)))[1:8], ',') AS postings_head
      |       FROM td GROUP BY 1)
      |SELECT st.token, st.df, st.cf, hd.postings_head
      |FROM st JOIN hd USING (token)
      |ORDER BY df DESC, token LIMIT 30""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def indexSide(docs: org.apache.spark.sql.DataFrame) = {
      val td = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
      val st = td.groupBy("token")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
      val hd = td
        .withColumn("rn", row_number().over(
          Window.partitionBy("token").orderBy("doc_id")))
        .filter(col("rn") <= 8)
        .groupBy("token")
        .agg(sort_array(collect_list(col("doc_id"))).as("head"))
      st.join(hd, Seq("token"))
    }
    val docs = Tables.documents(s, d)
    val standing = indexSide(docs.filter(col("doc_id") % 10 =!= 7))
      .select(col("token"), col("df").as("df_s"), col("cf").as("cf_s"),
        col("head").as("head_s"))
    val batch = indexSide(docs.filter(col("doc_id") % 10 === 7))
      .select(col("token"), col("df").as("df_b"), col("cf").as("cf_b"),
        col("head").as("head_b"))
    val emptyHead = typedLit(Seq.empty[Long])
    standing.join(batch, Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("df_s"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"),
        (coalesce(col("cf_s"), lit(0L)) + coalesce(col("cf_b"), lit(0L)))
          .as("cf"),
        array_join(
          slice(array_sort(concat(coalesce(col("head_s"), emptyHead),
                                  coalesce(col("head_b"), emptyHead))),
                1, 8).cast("array<string>"), ",").as("postings_head"))
      .orderBy(desc("df"), asc("token"))
      .limit(30)
  }

  /** FEATURE-HASHING VECTORIZER (the "hashing trick", Weinberger et al.
    * 2009) — fixed-width bag-of-words featurization with NO vocabulary
    * pass: each token hashes to one of 16 buckets with a ±1 sign drawn
    * from the next hash bit (the unbiasing refinement), and a document's
    * feature vector is the signed count per bucket. This is the
    * featurizer that works at 100 TB precisely because it is stateless —
    * no vocab table to build, broadcast, or keep consistent across
    * incremental batches ([[textTfidf]] needs all three).
    *
    * Determinism: the bucket/sign come from the portable md5-prefix hash
    * (same renderer as the sampling family), counts are exact ints.
    *
    * Plan: explode to (doc_id, token) — narrow; hash + bucket + sign in
    * codegen; ONE partial+final aggregate keyed by doc_id folds all 16
    * conditional sums map-side. Output rows = documents, columns fixed
    * at 16 — never vocabulary-sized. */
  val textHashingVec: Q = {
    val hv = graft.functions.expressions.PortableHash
      .duckdbSaltedSql("tok", ":hv", 15)
    val featsSql = (0 until 16).map(b =>
      s"""CAST(sum(CASE WHEN hv % 16 = $b
         |    THEN CASE WHEN (hv // 16) % 2 = 0 THEN 1 ELSE -1 END
         |    ELSE 0 END) AS BIGINT) AS f$b""".stripMargin).mkString(",\n")
    Q(
      "text_hashing_vec",
      s"""WITH tall AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |              FROM documents),
         |h AS (SELECT doc_id, $hv AS hv FROM tall)
         |SELECT doc_id,
         |$featsSql
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val hvCol = graft.functions.TextFns.saltedHash(col("tok"), ":hv", 15)
      // hv is a 60-bit value: the shift must stay in INTEGER division
      // (a double `/` would round above 2^53 and flip signs vs DuckDB)
      val sign = when(expr("(hv DIV 16) % 2") === 0, 1).otherwise(-1)
      val feats = (0 until 16).map(b =>
        sum(when(col("hv") % 16 === b, sign).otherwise(0)).as(s"f$b"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("hv", hvCol)
        .groupBy("doc_id")
        .agg(feats.head, feats.tail: _*)
    }
  }

  /** VOCABULARY-GROWTH (Heaps'-law) census: how many NEW word types each
    * successive tenth of the corpus (by doc_id order) contributes,
    * against the token volume of that tenth — the curve that sizes a
    * tokenizer vocabulary and predicts OOV rate as the corpus grows
    * (V(n) ≈ K·n^β; sublinear new-type mass per decile is the law
    * showing itself). Companion to [[corpusEntropy]] (which measures the
    * DISTRIBUTION at one size, not the growth).
    *
    * The trick that makes cumulative-distinct cheap: a type is "new in
    * decile c" iff its FIRST document lands there, so one token-keyed
    * min(doc_id) aggregate replaces ten prefix count-distincts; the
    * cumulative vocabulary is then a running sum over the 10-row
    * histogram. Token volume per decile is an independent partial+final
    * aggregate over per-doc counts — no explode feeds a window anywhere.
    *
    * Scale posture: the only exchanges are the token-keyed aggregate
    * (vocab-sized, the [[textTokens]] shuffle) and two ≤10-row frames;
    * the running-sum window rides the 10-row histogram. Decile bounds
    * come from one broadcast-sized max(doc_id) scalar. */
  val textVocabGrowth: Q = Q(
    "text_vocab_growth",
    """WITH mx AS (SELECT max(doc_id) + 1 AS nd FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents),
      |fst AS (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1),
      |nv AS (SELECT (first_doc * 10) // nd AS decile,
      |              count(*) AS new_types
      |       FROM fst, mx GROUP BY 1),
      |vol AS (SELECT (doc_id * 10) // nd AS decile,
      |          count(*) AS n_docs,
      |          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |            AS n_tokens
      |        FROM documents, mx GROUP BY 1)
      |SELECT CAST(vol.decile AS INT) AS decile,
      |  CAST(vol.n_docs AS BIGINT) AS n_docs, vol.n_tokens,
      |  CAST(COALESCE(nv.new_types, 0) AS BIGINT) AS new_types,
      |  CAST(sum(COALESCE(nv.new_types, 0)) OVER (ORDER BY vol.decile
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
      |FROM vol LEFT JOIN nv ON vol.decile = nv.decile
      |ORDER BY decile""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val mx = docs.agg((max(col("doc_id")) + 1).as("nd"))
    val fst = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(min(col("doc_id")).as("first_doc"))
    val nv = fst.crossJoin(broadcast(mx))
      .groupBy(expr("(first_doc * 10) DIV nd").as("decile"))
      .agg(count(lit(1)).as("new_types"))
    val vol = docs.crossJoin(broadcast(mx))
      .groupBy(expr("(doc_id * 10) DIV nd").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    vol.join(nv, Seq("decile"), "left")
      .select(col("decile").cast("int").as("decile"), col("n_docs"),
        col("n_tokens"), coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types",
        sum(col("new_types")).over(Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("decile")
  }

  /** RAKE-style KEYWORD scoring — degree/frequency ranking (Rose et al.
    * 2010): a word's degree is its co-occurrence count with neighbors
    * within distance ≤ 2, and deg/freq rewards words that appear in
    * dense contexts over words that merely appear often — the classic
    * unsupervised keyword extractor, here corpus-level (the companion to
    * [[textCollocations]]' pair-level lift).
    *
    * The scale trick: the degree needs NO pair explosion — for the
    * occurrence at position i of an L-token document the neighbor count
    * is min(i−1,2) + min(L−i,2), pure per-token arithmetic, so degree is
    * one integer sum beside the frequency count in the same aggregate.
    * Score is one double division of two exact BIGINTs.
    *
    * Plan: one token-keyed partial+final aggregate over a zipped
    * (token, neighbor-count) explode; TakeOrderedAndProject cuts the
    * top 30. Nothing else. */
  val textRakeKeywords: Q = Q(
    "text_rake_keywords",
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |tokp AS (SELECT unnest(toks) AS token,
      |    unnest([least(i-1, 2) + least(len(toks)-i, 2)
      |            FOR i IN range(1, len(toks)+1)]) AS nb
      |  FROM t),
      |a AS (SELECT token, count(*) AS freq,
      |        CAST(sum(nb) AS BIGINT) AS deg
      |      FROM tokp GROUP BY 1 HAVING count(*) >= 5)
      |SELECT token, CAST(freq AS BIGINT) AS freq, deg,
      |  CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS rake_score
      |FROM a ORDER BY rake_score DESC, token LIMIT 30""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(split(col("text"), " ").as("toks"))
      .select(posexplode(col("toks")).as(Seq("pos", "token")),
              size(col("toks")).as("len"))
      .select(col("token"),
        (least(col("pos"), lit(2)) +
          least(col("len") - 1 - col("pos"), lit(2))).as("nb"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"), sum(col("nb")).cast("long").as("deg"))
      .filter(col("freq") >= 5)
      .select(col("token"), col("freq"), col("deg"),
        (col("deg").cast("double") / col("freq").cast("double"))
          .as("rake_score"))
      .orderBy(desc("rake_score"), asc("token")).limit(30)
  }

  /** N-GRAM NOVELTY CURVE across ingest batches — the training-data
    * freshness readout: for each 100-document ingest batch, what
    * fraction of its distinct bigrams has never appeared in an earlier
    * batch. A crawl that keeps re-fetching the same content shows a
    * collapsing curve (this fixture's uniform generator collapses after
    * batch 0 — correctly); a healthy feed keeps a stable novelty floor.
    * The corpus-level complement of [[textVocabGrowth]]'s unigram
    * growth deciles and the leakage family's cross-split checks.
    *
    * Plan: every stage stays inside codegen hash aggregation — distinct
    * (batch, bigram) pairs (the only corpus-sized shuffle, combining
    * map-side), then per-bigram first-occurrence min, then two
    * batch-keyed counts joined by BROADCAST. Two formulations this
    * rejects, both measured at the docs10 rig: a bigram-keyed window
    * min adds a full sort of the pair frame (45.9s), and folding the
    * presence set into collect_set drags the whole corpus through
    * ObjectHashAggregate (104.5s) — this shape runs 29s. Exact
    * integers: counts are BIGINTs, novelty is floor-DIV ppm on
    * nonnegative operands. */
  val textNgramNovelty: Q = Q(
    "text_ngram_novelty",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
      |  FROM documents),
      |bg AS (SELECT doc_id // 100 AS batch,
      |  unnest([array_to_string(toks[i:i+1],' ')
      |          FOR i IN range(1, len(toks))]) AS bigram
      |  FROM t WHERE len(toks) >= 2),
      |p AS (SELECT DISTINCT batch, bigram FROM bg),
      |w AS (SELECT batch, min(batch) OVER (PARTITION BY bigram) AS fb
      |      FROM p)
      |SELECT batch, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(CASE WHEN batch = fb THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new_bigrams,
      |  CAST((1000000 * sum(CASE WHEN batch = fb THEN 1 ELSE 0 END))
      |       // count(*) AS BIGINT) AS novelty_ppm
      |FROM w GROUP BY batch ORDER BY batch""".stripMargin
  ) { (s, d) =>
    // cached (lazily): both censuses read the deduped pair frame, and
    // without the cache each branch would re-run the corpus-sized
    // bigram explode + distinct (the pagerank shared-frame posture)
    val pairs = bigramRows(s, d)
      .select(expr("doc_id div 100").as("batch"), col("bigram"))
      .distinct().cache()
    val nb = pairs.groupBy("batch").agg(count(lit(1)).as("n_bigrams"))
    val nnew = pairs.groupBy("bigram").agg(min(col("batch")).as("fb"))
      .groupBy("fb").agg(count(lit(1)).as("nn"))
    nb.join(broadcast(nnew), col("batch") === col("fb"), "left")
      .select(col("batch"), col("n_bigrams"),
        coalesce(col("nn"), lit(0L)).as("n_new_bigrams"))
      .select(col("batch"), col("n_bigrams"), col("n_new_bigrams"),
        expr("(1000000 * n_new_bigrams) div n_bigrams").as("novelty_ppm"))
  }

  /** JENSEN-SHANNON DIVERGENCE between every source pair's unigram
    * distributions — the mixture-design metric: which sources are
    * near-duplicates distribution-wise (merge their sampling budgets)
    * and which are genuinely distinct (protect their shares). The
    * symmetric, bounded companion to [[graft.operators.Dedup]]'s
    * shingle-Jaccard source similarity: Jaccard sees shared SPANS, JS
    * sees shared WORD FREQUENCIES — templated sources with reshuffled
    * wording separate the two.
    *
    * Parity discipline: per (pair, token) terms quantize ONCE to nano
    * (the PSI ln discipline), summed exactly. Two term classes: tokens
    * in both sources use p·(ln 2p − ln(p+q)) + q·(ln 2q − ln(p+q)) —
    * irrational except the p=q case, which both engines compute as an
    * EXACT 0 (identical ln arguments subtract) — and single-source
    * tokens contribute exactly ½p with NO ln at all (their true term;
    * division and multiplication are correctly rounded in IEEE, so no
    * engine drift without a transcendental). Association order mirrors
    * the oracle literally.
    *
    * Plan: one corpus pass to the (source, token) aggregate; everything
    * after is vocab×sources-bounded — a token-keyed self-join for
    * co-occurring pairs, a broadcast-sources anti-join for the
    * single-source remainder, one final pair-keyed aggregate. Output is
    * |sources|² rows. */
  val textJsDivergence: Q = Q(
    "text_js_divergence",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tok GROUP BY 1, 2),
      |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |j AS (SELECT a.source AS src_a, b.source AS src_b, a.token,
      |    CAST(a.c AS DOUBLE) / na.n AS p, CAST(b.c AS DOUBLE) / nb.n AS q
      |  FROM c a JOIN c b ON a.token = b.token AND a.source < b.source
      |  JOIN n na ON na.source = a.source
      |  JOIN n nb ON nb.source = b.source),
      |only_a AS (SELECT a.source AS src_a, b_s.source AS src_b,
      |    CAST(a.c AS DOUBLE) / na.n AS p
      |  FROM c a JOIN n na ON na.source = a.source
      |  CROSS JOIN (SELECT DISTINCT source FROM c) b_s
      |  WHERE b_s.source <> a.source
      |    AND NOT EXISTS (SELECT 1 FROM c b WHERE b.source = b_s.source
      |                    AND b.token = a.token)),
      |t AS (SELECT src_a, src_b,
      |    CAST(floor(1000000000 * 0.5 * (
      |        p * (ln(2 * p) - ln(p + q))
      |        + q * (ln(2 * q) - ln(p + q))) / ln(2)) AS BIGINT) AS term
      |  FROM j),
      |o AS (SELECT LEAST(src_a, src_b) AS src_a,
      |    GREATEST(src_a, src_b) AS src_b,
      |    CAST(floor(1000000000 * 0.5 * p) AS BIGINT) AS term
      |  FROM only_a),
      |u AS (SELECT * FROM t UNION ALL SELECT * FROM o)
      |SELECT src_a, src_b, CAST(sum(term) AS BIGINT) AS js_nano
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    // r11 optimization — the round-10 plan built the co-occurring terms
    // by a token-keyed SELF-JOIN of the (source, token) frame and the
    // single-source terms by a |sources|-way cross explode ANTI-JOINED
    // back against it (≈(S−1)·|vocab| probe rows). Both joins exist only
    // to line up per-source counts of the SAME token — which one pivot
    // does outright: per token, a source→count map (|sources| is the
    // tiny dimension), crossed with the broadcast (src_a, src_b, na, nb)
    // pair frame, and EVERY term class — both-present, only-a, only-b —
    // falls out of one map-side CASE. The pair aggregate then compresses
    // to |sources|² rows in the partial stage (guide §2.3 "aggregate
    // before you shuffle"). The term expressions mirror the round-10
    // columns literally, so every emitted nano value is bit-identical.
    val c = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .cache() // two consumers: per-source totals, per-token pivot
    val n = c.groupBy("source").agg(sum(col("c")).as("n"))
    val pairs = n.select(col("source").as("src_a"), col("n").as("na"))
      .crossJoin(n.select(col("source").as("src_b"), col("n").as("nb")))
      .filter(col("src_a") < col("src_b"))
    val tokMap = c.groupBy("token")
      .agg(map_from_entries(collect_list(struct(col("source"), col("c"))))
        .as("m"))
    val pa = col("ca").cast("double") / col("na")
    val pb = col("cb").cast("double") / col("nb")
    tokMap.crossJoin(broadcast(pairs))
      .select(col("src_a"), col("src_b"),
        try_element_at(col("m"), col("src_a")).as("ca"),
        try_element_at(col("m"), col("src_b")).as("cb"),
        col("na"), col("nb"))
      .filter(col("ca").isNotNull || col("cb").isNotNull)
      .select(col("src_a"), col("src_b"),
        when(col("ca").isNotNull && col("cb").isNotNull,
          floor(lit(1000000000d) * lit(0.5) * (
              pa * (log(lit(2) * pa) - log(pa + pb))
            + pb * (log(lit(2) * pb) - log(pa + pb)))
            / log(lit(2.0))).cast("long"))
        .otherwise(floor(lit(1000000000d) * lit(0.5) *
          when(col("ca").isNotNull, pa).otherwise(pb)).cast("long"))
        .as("term"))
      .groupBy("src_a", "src_b").agg(sum(col("term")).cast("long")
        .as("js_nano"))
  }

  /** ZIPF RANK-FREQUENCY FIT over the corpus vocabulary — the text-side
    * sibling of the dq family's Benford audit: organic language follows
    * freq ∝ rank^s with s ≈ −1 on a log-log plot, and synthetic,
    * templated, or truncated text shows up as a slope far from −1. One
    * row: the fitted-point count, the top frequency, the OLS log-log
    * slope and intercept in micro-units, and a zipfian flag (slope in
    * [−1.3, −0.7]). On the deliberately-uniform synthetic fixture the
    * flag is FALSE (slope ≈ −0.18) — the detector detecting the
    * generator, which is exactly the production use.
    *
    * Parity discipline: the fit runs over the top-100 tokens by the
    * deterministic (freq DESC, token) cut; each ln(rank)/ln(freq) is
    * floor-quantized ONCE to nano units (the dq_drift_psi ln
    * discipline), the OLS sufficient statistics are exact
    * DECIMAL(38,0)/HUGEINT sums of those integers, and slope/intercept
    * are shared scalar IEEE expressions floor-quantized to micro units.
    * Degenerate vocabularies (k ≤ 1 or zero x-variance) are excluded by
    * a mirrored WHERE.
    *
    * Plan: vocab-keyed partial+final aggregate → top-100
    * TakeOrderedAndProject → a ≤100-row rank window (unpartitioned, but
    * above the GlobalLimit — the catalog-wide bounded-frame rule) → a
    * 1-row aggregate. At 100 TB the only corpus-sized stage is the
    * token count, which combines map-side. */
  val textZipfFit: Q = Q(
    "text_zipf_fit",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
      |      FROM tok GROUP BY 1),
      |top AS (SELECT token, freq FROM f ORDER BY freq DESC, token LIMIT 100),
      |r AS (SELECT freq,
      |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
      |      AS rnk
      |  FROM top),
      |q AS (SELECT rnk, freq,
      |    CAST(floor(1000000000 * ln(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
      |    CAST(floor(1000000000 * ln(CAST(freq AS DOUBLE))) AS BIGINT) AS y
      |  FROM r),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS k, max(freq) AS top_freq,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM q),
      |c AS (SELECT k, top_freq,
      |    (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |    CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS mx,
      |    CAST(sy AS DOUBLE) / CAST(k AS DOUBLE) AS my
      |  FROM s
      |  WHERE k > 1 AND CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0)
      |SELECT k, top_freq,
      |  CAST(floor(1000000 * slope) AS BIGINT) AS slope_micro,
      |  CAST(floor((my - slope * mx) / 1000) AS BIGINT) AS intercept_micro,
      |  CAST(floor(1000000 * slope) AS BIGINT)
      |    BETWEEN -1300000 AND -700000 AS zipfian
      |FROM c""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val top = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(100)
    val r = top.withColumn("rnk",
      row_number().over(Window.orderBy(desc("freq"), asc("token")))
        .cast("long"))
    val qf = r.select(col("freq"),
      floor(lit(1000000000L) * log(col("rnk").cast("double")))
        .cast("long").as("x"),
      floor(lit(1000000000L) * log(col("freq").cast("double")))
        .cast("long").as("y"))
    val st = qf.agg(count(lit(1)).as("k"), max(col("freq")).as("top_freq"),
      sum(col("x")).cast(dec38).as("sx"), sum(col("y")).cast(dec38).as("sy"),
      sum(col("x").cast(dec38) * col("y")).as("sxy"),
      sum(col("x").cast(dec38) * col("x")).as("sxx"))
    def dbl(c: Column): Column = c.cast("double")
    val denom = dbl(col("k")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val slope = (dbl(col("k")) * dbl(col("sxy")) -
      dbl(col("sx")) * dbl(col("sy"))) / denom
    val mx = dbl(col("sx")) / dbl(col("k"))
    val my = dbl(col("sy")) / dbl(col("k"))
    val slopeMicro = floor(lit(1000000) * slope).cast("long")
    st.filter(col("k") > 1 && denom > 0)
      .select(col("k"), col("top_freq"),
        slopeMicro.as("slope_micro"),
        floor((my - slope * mx) / 1000).cast("long").as("intercept_micro"),
        slopeMicro.between(-1300000L, -700000L).as("zipfian"))
  }

  /** TOKEN BURSTINESS census — the content-word/function-word separator
    * keyword extractors and stopword-list builders rely on: a function
    * word's per-document counts are near-Poisson (Fano factor
    * variance/mean ≈ 1), a topical content word BURSTS (a document
    * either ignores it or uses it many times — Fano ≫ 1). Top-30 tokens
    * by Fano factor over the documents that contain them, with a
    * support floor so rare tokens' noisy ratios don't crowd the head.
    * On this fixture the uniform generator produces near-1 factors
    * across the board — the detector reading the generator's lack of
    * topicality, the text_zipf_fit finding from the dispersion side.
    *
    * Parity discipline: pure integer — Fano = variance/mean =
    * (df·Σc² − (Σc)²)/(df·Σc) from three exact BIGINT sufficient
    * statistics, micro-quantized by one nonnegative floor DIV; the
    * top-30 cut total-orders on (fano DESC, token).
    *
    * Plan: one corpus pass to (doc, token) counts, one token-keyed
    * partial+final aggregate, then a TakeOrdered — the text-family
    * standard shape, nothing after the first aggregate is
    * corpus-sized. */
  val textBurstiness: Q = Q(
    "text_burstiness",
    """WITH tf AS (SELECT doc_id, w AS token, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0 GROUP BY 1, 2),
      |st AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum(c) AS BIGINT) AS s,
      |    CAST(sum(c * c) AS BIGINT) AS ss
      |  FROM tf GROUP BY 1
      |  HAVING count(*) >= 50)
      |SELECT token, df, s AS total,
      |  (1000000 * (df * ss - s * s)) // (df * s) AS fano_micro
      |FROM st
      |ORDER BY fano_micro DESC, token LIMIT 30""".stripMargin
  ) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    tf.groupBy("token")
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("c")).cast("long").as("s"),
        sum(col("c") * col("c")).cast("long").as("ss"))
      .filter(col("df") >= 50)
      .select(col("token"), col("df"), col("s").as("total"),
        expr("(1000000 * (df * ss - s * s)) div (df * s)")
          .as("fano_micro"))
      .orderBy(desc("fano_micro"), col("token")).limit(30)
  }

  /** Vocabulary coverage at candidate vocab sizes — the OOV planning
    * curve a tokenizer budget is set from ([[textVocabGrowth]] shows how
    * fast NEW types appear; this shows what a FIXED top-K vocabulary
    * would cover): for each candidate K, the share of all corpus tokens
    * covered by the K most frequent types, and the OOV remainder — the
    * number every "how big must the vocab be" decision reads off.
    *
    * Parity: the type ranking orders by (count DESC, token) — token
    * breaks count ties totally on both engines; coverage is an exact
    * conditional sum with a widened ppm numerator.
    *
    * Plan: one corpus explode to the type-count aggregate, then
    * everything — rank window, K cross join, coverage sums — rides the
    * VOCAB-bounded frame (Heaps-sublinear in the corpus), never the
    * token stream. */
  val textVocabCoverage: Q = Q(
    "text_vocab_coverage",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
      |             FROM documents),
      |c AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok
      |      WHERE length(token) > 0 GROUP BY 1),
      |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rnk
      |      FROM c),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
      |k AS (SELECT unnest([100, 300, 1000, 3000, 10000]) AS vocab_k)
      |SELECT CAST(k.vocab_k AS INT) AS vocab_k,
      |  CAST(COALESCE(sum(r.c) FILTER (WHERE r.rnk <= k.vocab_k), 0)
      |       AS BIGINT) AS covered_tokens,
      |  CAST((1000000 * CAST(COALESCE(sum(r.c)
      |         FILTER (WHERE r.rnk <= k.vocab_k), 0) AS HUGEINT))
      |       // (SELECT t FROM tot) AS BIGINT) AS coverage_ppm,
      |  CAST(1000000 - (1000000 * CAST(COALESCE(sum(r.c)
      |         FILTER (WHERE r.rnk <= k.vocab_k), 0) AS HUGEINT))
      |       // (SELECT t FROM tot) AS BIGINT) AS oov_ppm
      |FROM r CROSS JOIN k GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val c = Tables.documents(s, d)
      .select(explode(toks).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    val r = c.withColumn("rnk", row_number().over(
      Window.partitionBy().orderBy(desc("c"), asc("token"))))
    val tot = c.agg(sum(col("c")).as("t"))
    r.select(col("c"), col("rnk"),
        explode(typedlit(Seq(100, 300, 1000, 3000, 10000)))
          .as("vocab_k"))
      .groupBy("vocab_k")
      .agg(coalesce(sum(when(col("rnk") <= col("vocab_k"), col("c"))),
        lit(0L)).as("covered_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("vocab_k").cast("int").as("vocab_k"),
        col("covered_tokens"),
        expr("(1000000 * cast(covered_tokens as decimal(38,0))) div t")
          .cast("long").as("coverage_ppm"),
        (lit(1000000) -
          expr("(1000000 * cast(covered_tokens as decimal(38,0))) div t")
            .cast("long")).as("oov_ppm"))
      .orderBy("vocab_k")
  }

  /** Readability census (Flesch reading-ease, integer milli-points) —
    * the curriculum/quality feature corpus pipelines bucket documents by
    * before mixing: per source, the mean score, plus how many documents
    * clear the "plain English" 60-point bar. The syllable term uses the
    * standard vowel-group proxy (each maximal `[aeiou]+` run ≈ one
    * syllable — the heuristic the original readability literature
    * machine implementations used), and the fixture's one-line documents
    * count as one sentence, so the formula reduces to
    * `206835 − 1015·words − 84600·syllables/words` in milli-points.
    *
    * Parity: the per-doc syllable ratio is a nonnegative integer
    * floor-div; per-doc scores are SIGNED BIGINTs, which sum exactly,
    * and the per-source mean splits sign around the floor-div (Spark
    * truncates / DuckDB floors — they only agree on nonnegative
    * operands). The vowel-run count comes from the same regex on both
    * engines over pure-ASCII text.
    *
    * Plan: per-row expressions (token count + one regex scan) fused into
    * the corpus projection, then ONE |sources|-bounded partial+final
    * aggregate — nothing else shuffles. */
  val textReadability: Q = Q(
    "text_readability",
    """WITH m AS (SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
      |      AS syl
      |  FROM documents),
      |f AS (SELECT source, n_tok,
      |    206835 - 1015 * n_tok - (84600 * syl) // n_tok AS flesch_milli
      |  FROM m),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(flesch_milli) AS BIGINT) AS s,
      |    CAST(count(*) FILTER (WHERE flesch_milli >= 60000) AS BIGINT)
      |      AS n_readable
      |  FROM f GROUP BY 1)
      |SELECT source, n_docs,
      |  CAST(CASE WHEN s >= 0 THEN s // n_docs
      |       ELSE -((-s) // n_docs) END AS BIGINT) AS mean_flesch_milli,
      |  n_readable,
      |  CAST((1000000 * n_readable) // n_docs AS BIGINT) AS readable_ppm
      |FROM a ORDER BY source""".stripMargin
  ) { (s, d) =>
    val m = Tables.documents(s, d).select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
        .cast("long").as("syl"))
    val f = m.select(col("source"), col("n_tok"),
      (lit(206835) - lit(1015) * col("n_tok") -
        expr("(84600 * syl) div n_tok")).as("flesch_milli"))
    f.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("flesch_milli")).as("s"),
           count(when(col("flesch_milli") >= 60000, 1)).as("n_readable"))
      .select(col("source"), col("n_docs"),
        when(col("s") >= 0, expr("s div n_docs"))
          .otherwise(-expr("(-s) div n_docs")).as("mean_flesch_milli"),
        col("n_readable"),
        expr("(1000000 * n_readable) div n_docs").as("readable_ppm"))
  }

  val all: Seq[Q] = Seq(textTokens, textQuality, langId, langConfusion,
    textReadability,
    textFingerprint,
    textTfidf, textNormalize, textRepetition, piiRedact, ngramFreq,
    textContamination, textTokenBpe, textPerplexity, spanDedup,
    textHeavyHitters, textQualityClassifier, textCountmin, textCollocations,
    textLangidEval, textBm25, textBoilerplate, textInvertedIndex,
    textIndexDelta, textHashingVec, textVocabGrowth, textVocabCoverage,
    textRakeKeywords,
    textZipfFit, textNgramNovelty, textJsDivergence, textBurstiness)
}
