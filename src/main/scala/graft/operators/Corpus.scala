package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-preparation operators over `documents` — the last mile of a
  * training-data pipeline (builder prompt north-star): deterministic
  * train/val/test splitting, token-budget shard packing, and the composed
  * select that actually produces a training corpus (quality × language ×
  * dedup survivorship).
  *
  * Scale posture:
  *  - `corpus_split`: pure projection + tiny groupBy — the split is a
  *    hash of the id, so assignment is stable under re-runs, re-orders,
  *    and incremental appends (the property a random() split lacks).
  *  - `corpus_pack`: a global prefix sum done the distributed way — a
  *    two-level bucket/superbucket recursion where every window frame
  *    proportional to corpus size carries a partitionBy and is bounded
  *    by the bucket width; the single unpartitioned window sees n/W²
  *    rows (constant at any plausible scale). The naive
  *    `Window.orderBy(id)` with no partitionBy funnels everything
  *    through ONE task; so does a one-level bucket scheme at 10¹² docs.
  *  - `corpus_select`: narrow quality/lang projections, one digest
  *    groupBy for survivorship, broadcast-friendly semi join.
  */
object Corpus {

  /** Deterministic hash split ~80/10/10 by md5 of the doc id: the first
    * two hex chars give 256 buckets; '00'-'cb' (204/256) → train,
    * 'cc'-'e5' (26/256) → val, rest (26/256) → test. String comparison on
    * hex is identical across engines, so no hex→int parsing is needed.
    * Stable: a document's split never changes as the corpus grows. */
  val corpusSplit: Q = Q(
    "corpus_split",
    """WITH s AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
      |FROM documents)
      |SELECT CASE WHEN h < 'cc' THEN 'train'
      |            WHEN h < 'e6' THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM s GROUP BY 1 ORDER BY split""".stripMargin
  ) { (s, d) =>
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
          .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("sum_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
  }

  /** Token-budget shard packing ("concat and chop", the pretraining
    * stream layout): documents in doc_id order fill shards of
    * `Capacity` tokens; a document starts in the shard where its
    * preceding cumulative token count lands. The prefix sum is computed
    * the distributed way, recursed TWO levels so no frame anywhere is
    * proportional to corpus size: (1) bucket per `W`=65536 docs →
    * per-bucket totals (n/W rows); (2) superbucket per W buckets →
    * per-superbucket totals (n/W² rows — 233 rows at 10¹² docs, a
    * constant for any plausible corpus) where the ONLY unpartitioned
    * window runs; (3) superbucket offsets broadcast down, bucket offsets
    * finished by a window PARTITIONED by superbucket (≤ W rows/frame);
    * (4) doc-level finish by a window PARTITIONED by bucket (≤ W
    * rows/frame), the offsets joined back on the same bkt key the window
    * shuffles on — the exchange is shared, never a corpus broadcast.
    * Oracle: the naive global window in DuckDB — same math, different
    * (non-scalable) plan. */
  val corpusPack: Q = Q(
    "corpus_pack",
    """WITH t AS (SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before
      |  FROM t)
      |SELECT CAST(floor(CAST(cum_before AS DOUBLE) / 2048) AS BIGINT) AS shard_id,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val Capacity = 2048L
    // W bounds every partitioned window frame below; W² bounds the input
    // of the single unpartitioned window (n/W² rows ≈ 233 at 10¹² docs)
    val W = 65536L
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        floor(col("doc_id") / W).as("bkt"))
    // level 1: per-bucket totals — n/W rows, keyed for level 2
    val bucketTotals = t.groupBy("bkt")
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn("sbkt", floor(col("bkt") / W))
    // level 2: per-superbucket totals (n/W² rows). The only window with
    // no partitionBy in the whole plan runs HERE, over effectively
    // constant-size input — this is the recursion base, not a funnel.
    val wS = Window.orderBy("sbkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val superOffsets = bucketTotals.groupBy("sbkt")
      .agg(sum(col("bkt_tokens")).as("sbkt_tokens"))
      .withColumn("sbkt_offset",
        sum(col("sbkt_tokens")).over(wS) - col("sbkt_tokens"))
      .select(col("sbkt"), col("sbkt_offset"))
    // level-1 finish: running offset WITHIN each superbucket (≤ W bucket
    // rows per frame); superbucket offsets are genuinely tiny → broadcast
    val wB = Window.partitionBy("sbkt").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketTotals.join(broadcast(superOffsets), Seq("sbkt"))
      .withColumn("bkt_offset",
        col("sbkt_offset") + sum(col("bkt_tokens")).over(wB)
          - col("bkt_tokens"))
      .select(col("bkt"), col("bkt_offset"))
    // level-0 finish inside each bucket (≤ W docs per frame). offsets is
    // n/W rows — too big to broadcast at extreme scale — but the join key
    // IS the window partition key, so the equi-join rides the same bkt
    // hash partitioning the window needs anyway (AQE may still choose to
    // broadcast when the side is small; both plans are exchange-minimal).
    val wD = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(offsets, Seq("bkt"))
      .withColumn("cum_before",
        col("bkt_offset") + sum(col("n_tokens")).over(wD) - col("n_tokens"))
      .groupBy(floor(col("cum_before").cast("double") / Capacity)
        .cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("sum_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
  }

  // ---- shared select pipeline (corpus_select / corpus_decontaminate) --
  // ONE definition of "a document that ships": exact-dedup survivor +
  // quality floor (>= 5 tokens, stopword ratio < 0.5) + confident
  // language — in both the Spark plan and the oracle CTEs, so the
  // decontaminated variant can never drift from the base select.

  /** (doc_id, source, n_tokens, predicted) of quality-passing,
    * confidently language-identified documents — narrow projections
    * fused into the scan (source rides along so downstream consumers
    * like [[trainingManifest]] never re-join the corpus for it). */
  private def qualityLang(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stopRatio =
      size(filter(toks, t => t.isin("the", "a", "of", "and", "is")))
        .cast("double") / size(toks)
    docs
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        stopRatio.as("stopword_ratio"),
        TextAnalysis.predictLang(toks).as("predicted"))
      .filter(col("n_tokens") >= 5 && col("stopword_ratio") < 0.5 &&
              col("predicted") =!= "und")
  }

  /** Exact-dedup survivor ids: min doc_id per content digest. */
  private def survivorsOf(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  /** Per-language doc/token rollup of a selected frame. */
  private def langRollup(sel: DataFrame): DataFrame =
    sel.groupBy(col("predicted").as("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  /** The surv/q/sel oracle CTEs over `documents` with an optional base
    * WHERE (e.g. holding out the benchmark slice) and extra `sel`
    * predicate (e.g. the decontamination NOT IN). */
  private def selectCtesSql(baseWhere: String, selExtra: String): String =
    s"""surv AS (SELECT min(doc_id) AS doc_id FROM documents $baseWhere GROUP BY md5(text)),
       |q AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '),
       |       t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of'))) AS s_en,
       |  len(list_filter(string_split(text,' '), t -> t IN ('der','die','und'))) AS s_de,
       |  len(list_filter(string_split(text,' '), t -> t IN ('el','los','una'))) AS s_es
       |FROM documents $baseWhere),
       |sel AS (SELECT doc_id, n_tokens,
       |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
       |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
       |       WHEN s_es > 0 THEN 'es'
       |       ELSE 'und' END AS predicted
       |  FROM q
       |  WHERE n_tokens >= 5 AND stopword_ratio < 0.5
       |    AND doc_id IN (SELECT doc_id FROM surv)$selExtra)""".stripMargin

  private val langRollupSql =
    """SELECT predicted AS lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM sel WHERE predicted <> 'und'
      |GROUP BY predicted ORDER BY lang""".stripMargin

  /** The composed corpus select: exact-dedup survivors only, quality
    * floor (≥ 5 tokens, stopword ratio < 0.5), confident language ID
    * (not 'und') — per-language document and token counts of what would
    * actually ship to training. Survivorship is a digest groupBy + semi
    * join (broadcastable: survivors ≈ distinct contents); quality and
    * language are narrow projections fused into the same scan. */
  val corpusSelect: Q = Q(
    "corpus_select",
    s"""WITH ${selectCtesSql("", "")}
       |$langRollupSql""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    langRollup(
      qualityLang(docs).join(survivorsOf(docs), Seq("doc_id"), "left_semi"))
  }

  /** Fixed-window document chunking with overlap (the context-window
    * prep step: 32-token chunks on a 24-token stride ⇒ 8 tokens of
    * overlap, so no boundary-spanning context is lost). One generator
    * per doc (`sequence` of chunk starts) + a narrow slice projection —
    * no shuffle except the output sort; chunk count per doc is
    * ⌈n/stride⌉, so the explode factor is bounded and proportional to
    * corpus token count, never quadratic. */
  val docChunk: Q = Q(
    "doc_chunk",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start FROM t)
      |SELECT doc_id, CAST(start // 24 AS INT) AS chunk_id,
      |  CAST(len(toks[CAST(start + 1 AS INT):CAST(start + 32 AS INT)]) AS INT) AS n_chunk_tokens,
      |  array_to_string(toks[CAST(start + 1 AS INT):CAST(start + 32 AS INT)], ' ') AS chunk_text
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, d) =>
    val ChunkSize = 32
    val Stride = 24
    val t = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    t.select(col("doc_id"), col("toks"),
        // starts 0, 24, 48… strictly below the token count (sequence's
        // inclusive end is size-1, so the last start always has tokens)
        explode(sequence(lit(0), size(col("toks")) - 1, lit(Stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / Stride).cast("int").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(ChunkSize)))
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(ChunkSize)))
          .as("chunk_text"))
  }

  /** The decontaminated corpus select — [[corpusSelect]]'s survivorship ×
    * quality × language compose, restricted to the training slice
    * (benchmark docs `doc_id % 97 == 0` held out entirely) and with
    * contaminated documents (≥ 50% of distinct shingles appearing in the
    * benchmark slice — see `text_contamination`) anti-joined away. This
    * is the last gate before packing: per-language doc/token counts of
    * what actually ships. Plan shape: the contamination check reuses the
    * broadcast-benchmark join (no corpus shuffle); the anti-join keys on
    * doc_id against a tiny contaminated set, so it broadcasts too. */
  val corpusDecontaminate: Q = Q(
    "corpus_decontaminate", {
      val ph = graft.functions.expressions.PortableHash
        .duckdbSql("array_to_string(toks[i:i+2],' ')")
      s"""WITH tall AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |shs AS (SELECT doc_id,
         |  list_distinct([$ph FOR i IN range(1, len(toks)-1)]) AS sgl
         |  FROM tall WHERE len(toks) >= 3),
         |bench AS (SELECT DISTINCT unnest(sgl) AS sglv FROM shs WHERE doc_id % 97 = 0),
         |trainsh AS (SELECT doc_id, len(sgl) AS n_sgl, unnest(sgl) AS sglv
         |            FROM shs WHERE doc_id % 97 <> 0),
         |cont AS (SELECT doc_id FROM (
         |    SELECT doc_id, n_sgl, count(*) AS n_cont
         |    FROM trainsh JOIN bench USING (sglv) GROUP BY 1, 2)
         |  WHERE CAST(n_cont AS DOUBLE) / n_sgl >= 0.5),
         |${selectCtesSql("WHERE doc_id % 97 <> 0",
                          "\n    AND doc_id NOT IN (SELECT doc_id FROM cont)")}
         |$langRollupSql""".stripMargin
    }
  ) { (s, d) =>
    val train = Tables.documents(s, d).filter(col("doc_id") % 97 =!= 0)
    val contaminated = TextAnalysis.textContamination.fn(s, d)
      .filter(col("contamination") >= 0.5)
      .select("doc_id")
    langRollup(
      qualityLang(train)
        .join(survivorsOf(train), Seq("doc_id"), "left_semi")
        .join(broadcast(contaminated), Seq("doc_id"), "left_anti"))
  }

  /** Source-mixture rebalancing (pretraining data mixing): temperature
    * flattening with T = 2 — each source keeps
    * `rate = min(1, sqrt(n_min / n_source))` of its documents, so small
    * sources survive whole while dominant sources are downsampled toward
    * a flatter mixture (the standard alternative to upweighting when
    * replication is off the table). Membership is the same salted-hash
    * Bernoulli as `corpus_split`/`sample_stratified`: a pure function of
    * (doc_id, salt), stable under repartitioning, retries, and appends.
    *
    * Exactness by construction: every rate is derived ONLY from exact
    * integer counts via int/int double division, `sqrt` (correctly
    * rounded by IEEE 754 in both engines), and `floor` to integer ppm —
    * no cross-source float SUM whose accumulation order could differ.
    * Plan: two tiny aggregates (per-source counts, global min), the
    * rates BROADCAST onto the document stream, one narrow filter, one
    * final aggregate — the corpus shuffles once. */
  /** (source, n_docs, rate_ppm) — the T=2 temperature-flattening rates
    * for whatever corpus frame is passed (full corpus in [[corpusMix]],
    * the selected slice in [[trainingManifest]]). Rates derive ONLY from
    * exact integer counts via correctly-rounded sqrt/floor. */
  private def mixRates(docs: DataFrame): DataFrame = {
    val c = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val m = c.agg(min(col("n_docs")).as("n_min"))
    c.crossJoin(broadcast(m))
      .select(col("source"), col("n_docs"),
        least(lit(1000000L),
          floor(lit(1000000d) *
            sqrt(col("n_min").cast("double") / col("n_docs"))))
          .as("rate_ppm"))
  }

  /** The matching oracle CTEs (`c`, `m`, `r`) over a FROM-able relation. */
  private def mixRatesSql(rel: String): String =
    s"""c AS (SELECT source, count(*) AS n_docs FROM $rel GROUP BY 1),
       |m AS (SELECT min(n_docs) AS n_min FROM c),
       |r AS (SELECT source, n_docs,
       |        least(1000000, CAST(floor(1000000 * sqrt(CAST(n_min AS DOUBLE) / n_docs)) AS BIGINT)) AS rate_ppm
       |      FROM c, m)""".stripMargin

  private def mixSlotSql(keyExpr: String): String =
    graft.functions.expressions.PortableHash
      .duckdbSaltedSql(keyExpr, ":mix7", 7) + " % 1000000"

  private def mixSlot: org.apache.spark.sql.Column =
    graft.functions.TextFns.saltedHash(col("doc_id"), ":mix7", 7) % 1000000L

  val corpusMix: Q = Q(
    "corpus_mix",
    s"""WITH ${mixRatesSql("documents")},
      |s AS (SELECT d.source, count(*) AS n_sampled
      |      FROM documents d JOIN r ON d.source = r.source
      |      WHERE ${mixSlotSql("d.doc_id")} < r.rate_ppm
      |      GROUP BY 1)
      |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs, r.rate_ppm,
      |  CAST(s.n_sampled AS BIGINT) AS n_sampled,
      |  CAST(s.n_sampled AS DOUBLE) / sum(s.n_sampled) OVER () AS share
      |FROM r JOIN s ON r.source = s.source
      |ORDER BY r.source""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val r = mixRates(docs)
    val sampled = docs.join(broadcast(r), Seq("source"))
      .filter(mixSlot < col("rate_ppm"))
      .groupBy("source").agg(count(lit(1)).as("n_sampled"))
    // the share window runs over the per-source result (≤ |sources|
    // rows), so the empty partitionBy is a 20-row single task, not a
    // corpus-wide funnel
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    r.join(sampled, Seq("source"))
      .select(col("source"), col("n_docs"), col("rate_ppm"),
        col("n_sampled"),
        (col("n_sampled").cast("double") / sum(col("n_sampled")).over(wAll))
          .as("share"))
      .orderBy("source")
  }

  /** Deterministic epoch shuffle: the order a training run consumes the
    * corpus in, as a pure function of (doc_id, epoch). Each document
    * hashes to a shard and to a rank WITHIN that shard, so the permutation
    * is reproducible (resume-safe, re-run-safe) and materializes with one
    * shard-keyed shuffle + per-shard sort — never a single global sort
    * task (a naive ORDER BY hash funnels 100 TB through one range sort;
    * here the shard IS the output file, which is how epochs actually
    * ship). A different epoch constant re-deals everything. Ties are
    * impossible: rank orders by (hash, doc_id), a total key. */
  val corpusShuffle: Q = Q(
    "corpus_shuffle",
    s"""WITH h AS (SELECT doc_id,
      |    ${graft.functions.expressions.PortableHash
               .duckdbSaltedSql("doc_id", ":epoch1", 15)} AS hv
      |  FROM documents)
      |SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
      |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS INT) AS pos
      |FROM h ORDER BY shard, pos""".stripMargin
  ) { (s, d) =>
    val hv = graft.functions.TextFns.saltedHash(col("doc_id"), ":epoch1", 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("hv", "doc_id")
    Tables.documents(s, d)
      .select(col("doc_id"), hv.as("hv"))
      .withColumn("shard", (col("hv") % 8).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** The WHOLE last mile as one declarative query — the flagship
    * composition a training team actually runs: quality × language ×
    * exact-dedup SELECT ([[corpusSelect]]'s shared pipeline), T=2 source
    * MIXING over the selected slice ([[mixRates]] — rates computed on
    * what survived selection, not the raw corpus), deterministic epoch
    * SHUFFLE to shards ([[corpusShuffle]]'s salted permutation), and the
    * per-shard manifest (docs, tokens, source spread) that ships to the
    * trainer. Every stage reuses the SAME Scala helpers and SQL
    * renderers as its standalone query, so the composition can never
    * drift from the parts. Plan: beyond [[corpusSelect]]'s own
    * survivorship cost (digest aggregate + semi join — inherent to
    * exact-dedup selection), the ADDED stages are corpus-shuffle-free:
    * mix rates are tiny aggregates broadcast back, shard assignment is
    * a pure projection, and the manifest aggregate reduces to 8 rows
    * with map-side combine. */
  val trainingManifest: Q = Q(
    "training_manifest",
    s"""WITH ${selectCtesSql("", "")},
       |sd AS (SELECT sel.doc_id, sel.n_tokens, d.source
       |       FROM sel JOIN documents d USING (doc_id)
       |       WHERE sel.predicted <> 'und'),
       |${mixRatesSql("sd")},
       |keep AS (SELECT sd.doc_id, sd.n_tokens, sd.source
       |         FROM sd JOIN r ON sd.source = r.source
       |         WHERE ${mixSlotSql("sd.doc_id")} < r.rate_ppm),
       |sh AS (SELECT n_tokens, source,
       |         ${graft.functions.expressions.PortableHash
                    .duckdbSaltedSql("doc_id", ":epoch1", 15)} % 8 AS shard
       |       FROM keep)
       |SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(count(DISTINCT source) AS INT) AS n_sources
       |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val sel = qualityLang(docs)
      .join(survivorsOf(docs), Seq("doc_id"), "left_semi")
    val kept = sel.join(broadcast(mixRates(sel)), Seq("source"))
      .filter(mixSlot < col("rate_ppm"))
    kept
      .withColumn("shard",
        (graft.functions.TextFns.saltedHash(col("doc_id"), ":epoch1", 15)
          % 8).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
           countDistinct(col("source")).cast("int").as("n_sources"))
  }

  /** Per-source unigram-distribution census: Shannon entropy of each
    * source's token distribution and its KL divergence from the global
    * corpus mixture — the two numbers a data-mixing decision actually
    * consumes (a low-entropy source is repetitive/templated; a
    * high-KL source is the one temperature flattening under- or
    * over-weights; see [[corpusMix]]).
    *
    * Scale shape: the corpus is tokenized ONCE into a (source, token)
    * partial+final count — the only corpus-proportional shuffle.
    * Everything downstream (global token counts, per-source totals, the
    * entropy/KL terms) is VOCABULARY-bounded, and the global count table
    * joins back via broadcast. Transcendentals follow the
    * text_perplexity discipline (docs/ORACLE_PARITY.md): each per-token
    * term is quantized ONCE to integer milli-units
    * (`floor(1000·c·ln c)`), all aggregation is exact BIGINT —
    * order-independent at any parallelism — and the final entropy/KL
    * are single double expressions over exact integers:
    * H = ln N − (Σ c·ln c)/N, KL(p_s‖p_g) = (Σ c·(ln c − ln c_g))/N_s
    * − ln N_s + ln N_g (all in millinats).
    *
    * The cross-source quantities ride WINDOWS over the already-reduced
    * frames, not self-joins: the global token count is
    * `sum(c) OVER (PARTITION BY w)` on the (source, token) aggregate
    * (a vocab-bounded exchange), and the corpus total is an
    * unpartitioned window over the |sources|-row result — so the raw
    * corpus is scanned and tokenized exactly ONCE (a self-join
    * formulation re-derives the corpus aggregate per reference:
    * 4 corpus passes; PlanAuditSpec locks the single scan). */
  val corpusEntropy: Q = Q(
    "corpus_entropy",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
      |             FROM documents),
      |t2 AS (SELECT source, w FROM tok WHERE length(w) > 0),
      |sw AS (SELECT source, w, count(*) AS c FROM t2 GROUP BY 1, 2),
      |wg AS (SELECT source, c, CAST(sum(c) OVER (PARTITION BY w) AS BIGINT) AS cg
      |       FROM sw),
      |a AS (SELECT source,
      |    CAST(sum(CAST(floor(1000.0 * c * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT) AS sh,
      |    CAST(sum(CAST(floor(1000.0 * c * (ln(CAST(c AS DOUBLE)) - ln(CAST(cg AS DOUBLE)))) AS BIGINT)) AS BIGINT) AS skl,
      |    CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab
      |  FROM wg GROUP BY 1),
      |t AS (SELECT source, sh, skl, n_tokens, vocab,
      |        CAST(sum(n_tokens) OVER () AS BIGINT) AS n_total FROM a)
      |SELECT source, n_tokens, vocab,
      |  1000.0 * ln(CAST(n_tokens AS DOUBLE)) - CAST(sh AS DOUBLE) / n_tokens AS entropy_mnats,
      |  CAST(skl AS DOUBLE) / n_tokens - 1000.0 * ln(CAST(n_tokens AS DOUBLE)) + 1000.0 * ln(CAST(n_total AS DOUBLE)) AS kl_mnats
      |FROM t ORDER BY source""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val wg = sw.withColumn("cg", sum(col("c")).over(Window.partitionBy("w")))
    val lnC = log(col("c").cast("double"))
    val lnCg = log(col("cg").cast("double"))
    val a = wg
      .select(col("source"), col("c"),
        floor(lit(1000.0) * col("c") * lnC).cast("long").as("t_h"),
        floor(lit(1000.0) * col("c") * (lnC - lnCg)).cast("long").as("t_kl"))
      .groupBy("source")
      .agg(sum(col("t_h")).as("sh"), sum(col("t_kl")).as("skl"),
           sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"))
    a.withColumn("n_total", sum(col("n_tokens")).over(Window.partitionBy()))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (lit(1000.0) * log(col("n_tokens").cast("double")) -
          col("sh").cast("double") / col("n_tokens")).as("entropy_mnats"),
        (col("skl").cast("double") / col("n_tokens") -
          lit(1000.0) * log(col("n_tokens").cast("double")) +
          lit(1000.0) * log(col("n_total").cast("double"))).as("kl_mnats"))
      .orderBy("source")
  }

  /** THE END-TO-END CLEANING FUNNEL as ONE declarative plan — the
    * composition proof that the engine's stages snap together the way a
    * production corpus build runs them: exact dedup (md5 keeper) →
    * MinHash near-dedup at τ=0.8 over the exact survivors (greedy
    * min-id keep within each verified pair) → quality floor (< 30
    * tokens) → retained; the census reports how many documents each
    * stage removes. The near-dup machinery is [[Dedup.dedupMinhash]]'s
    * OWN internals (signature column, banding, jaccard verify) and the
    * oracle composes [[Dedup.minhashVerCtesSql]] — the same one string
    * that backs the minhash oracles — so pipeline and standalone
    * operators provably share one pair definition.
    *
    * Plan shape: each document is labeled with its EXIT STAGE in a
    * single pass over the keeper-annotated corpus (one md5 window, one
    * left join against the pair-bounded drop set), then one
    * partial+final census aggregate; the fixed stage dimension joins a
    * 4-row literal so zero-drop stages still report. The expensive part
    * is exactly the sub-quadratic minhash pipeline the standalone
    * operator already runs — composition adds joins bounded by pairs
    * and keys, never a new corpus-sized shuffle. */
  val corpusPipeline: Q = Q(
    "corpus_pipeline",
    s"""WITH ${Dedup.minhashVerCtesSql()},
       |mpairs AS (SELECT doc_a, doc_b FROM ver
       |           WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.8),
       |k AS (SELECT doc_id, text,
       |        min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
       |        len(string_split(text, ' ')) AS n_toks
       |      FROM documents),
       |drops AS (SELECT DISTINCT p.doc_b FROM mpairs p
       |  JOIN k ka ON p.doc_a = ka.doc_id AND ka.doc_id = ka.keep_id
       |  JOIN k kb ON p.doc_b = kb.doc_id AND kb.doc_id = kb.keep_id),
       |lab AS (SELECT CASE
       |    WHEN doc_id <> keep_id THEN 'exact_dup'
       |    WHEN doc_id IN (SELECT doc_b FROM drops) THEN 'near_dup'
       |    WHEN n_toks < 30 THEN 'low_quality'
       |    ELSE 'retained' END AS stage
       |  FROM k),
       |sdim AS (SELECT unnest(['exact_dup','near_dup','low_quality',
       |                        'retained']) AS stage)
       |SELECT sdim.stage, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_docs
       |FROM sdim LEFT JOIN (SELECT stage, count(*) AS n FROM lab
       |                     GROUP BY 1) c
       |  ON sdim.stage = c.stage
       |ORDER BY sdim.stage""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .withColumn("keep_id", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast("binary")))))
      .withColumn("n_toks", size(split(col("text"), " ")))
    val surv = k.filter(col("doc_id") === col("keep_id")).select("doc_id")
    val shp = Dedup.shingleHashesPortable(s, d)
    val sh = shp.groupBy("doc_id")
      .agg(collect_set(col("sgl")).as("shingles"))
    val bands = Dedup.minhashBands(Dedup.minhashSignaturesExpr(s, d))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val drops = Dedup.jaccardVerify(cand, sh)
      .join(surv.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(surv.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("dropped", lit(1))
    val lab = k.join(drops, Seq("doc_id"), "left")
      .select(when(col("doc_id") =!= col("keep_id"), "exact_dup")
        .when(col("dropped").isNotNull, "near_dup")
        .when(col("n_toks") < 30, "low_quality")
        .otherwise("retained").as("stage"))
    val census = lab.groupBy("stage").agg(count(lit(1)).as("n"))
    Seq("exact_dup", "near_dup", "low_quality", "retained").toDF("stage")
      .join(census, Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n"), lit(0L)).as("n_docs"))
  }

  /** Train/test LEAKAGE audit — the evaluation-integrity census a
    * hash-based split needs before anyone trusts a held-out metric:
    * near-duplicate pairs ([[Dedup.dedupMinhash]]'s verified Jaccard ≥
    * 0.8 pairs, same signatures, same bands, same verify) whose members
    * land in DIFFERENT splits are test-set contamination — the model
    * sees the "held-out" document's twin during training. A random or
    * hash split CANNOT prevent this (assignment is per-document,
    * near-dup structure is cross-document); the standard remedy is
    * splitting by dedup-cluster, and this census is the measurement
    * that says whether that remedy is needed. Output: pair counts per
    * unordered split pair — off-diagonal rows are the leak.
    *
    * Plan shape: the minhash candidate/verify pipeline unchanged (one
    * band equi-join, shuffles bounded by banding), plus two id-keyed
    * joins of the narrow (doc→split) projection onto the few surviving
    * pairs — NOT an explicit broadcast (doc→split is corpus-sized; AQE
    * downgrades the join to broadcast at small scale, and at 100 TB it
    * runs as a shuffle join whose moved rows are bounded by the pair
    * count on one side); the census groupBy moves ≤ 6 rows. Fully
    * value-checked: the oracle reuses the generated portable-hash CTEs
    * and appends the same split mapping. */
  val corpusSplitLeakage: Q = Q(
    "corpus_split_leakage",
    s"""WITH ${Dedup.minhashVerCtesSql()},
       |pairs AS (SELECT doc_a, doc_b FROM ver
       |  WHERE CAST(i AS DOUBLE)/(na+nb-i) >= 0.8),
       |sp AS (SELECT doc_id,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |       ELSE 'test' END AS split
       |  FROM documents)
       |SELECT least(a.split, b.split) AS split_a,
       |  greatest(a.split, b.split) AS split_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM pairs JOIN sp a ON pairs.doc_a = a.doc_id
       |           JOIN sp b ON pairs.doc_b = b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
    val sp = Tables.documents(s, d)
      .select(col("doc_id"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
          .as("split"))
    val shp = Dedup.shingleHashesPortable(s, d)
    val sh = shp.groupBy("doc_id").agg(collect_set(col("sgl")).as("shingles"))
    val bands = Dedup.minhashBands(Dedup.minhashSignaturesExpr(s, d))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    Dedup.jaccardVerify(cand, sh)
      .join(sp.select(col("doc_id").as("doc_a"),
                      col("split").as("sp_a")), Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"),
                      col("split").as("sp_b")), Seq("doc_b"))
      .groupBy(least(col("sp_a"), col("sp_b")).as("split_a"),
               greatest(col("sp_a"), col("sp_b")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** QUALITY-WEIGHTED Bernoulli subsampling — the data-reweighting step
    * of modern pretraining recipes (upsample long/high-quality documents,
    * downsample short ones) done deterministically: each document keeps
    * with probability proportional to a quality proxy (here token count,
    * saturating at 64 tokens → p = min(1, n_tokens/64)), decided by
    * comparing a salted portable hash of the doc id against the weight.
    * Unlike `rand() < p` this is stable under re-runs, re-orders, and
    * incremental appends — a document's fate never changes as the corpus
    * grows (the [[corpusSplit]] argument, extended to per-row weights).
    *
    * Determinism: the weight is held in exact PARTS-PER-MILLION
    * (n_tokens × 15625 ppm, capped at 10⁶ — never a float), the draw is
    * `hash % 10⁶ < w_ppm` in BIGINTs, and the reported rates are one
    * double division each at the end.
    *
    * Plan: weight + draw are a pure projection over the scan (zero
    * shuffles); ONE partial+final aggregate per source reports kept
    * counts, token mass, and the realized vs expected rate — the
    * mixture audit a recipe change is judged by. */
  val corpusSampleWeighted: Q = {
    val hv = graft.functions.expressions.PortableHash
      .duckdbSaltedSql("doc_id", ":wsample", 15)
    Q(
      "corpus_sample_weighted",
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $hv % 1000000 AS slot
         |  FROM documents),
         |w AS (SELECT doc_id, source, n_tokens, slot,
         |    least(CAST(1000000 AS BIGINT), n_tokens * 15625) AS w_ppm
         |  FROM t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN slot < w_ppm THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN slot < w_ppm THEN n_tokens ELSE 0 END)
         |       AS BIGINT) AS kept_tokens,
         |  CAST(sum(CASE WHEN slot < w_ppm THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS kept_rate,
         |  CAST(sum(w_ppm) AS DOUBLE) / (1000000 * count(*))
         |    AS expected_rate
         |FROM w GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      val slot =
        graft.functions.TextFns.saltedHash(col("doc_id"), ":wsample", 15) %
          1000000L
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          slot.as("slot"))
        .withColumn("w_ppm",
          least(lit(1000000L), col("n_tokens") * 15625L))
        .withColumn("kept", col("slot") < col("w_ppm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
             sum(when(col("kept"), col("n_tokens")).otherwise(0L))
               .as("kept_tokens"),
             sum(col("w_ppm")).as("sum_ppm"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("kept_tokens"),
          (col("n_kept").cast("double") / col("n_docs")).as("kept_rate"),
          (col("sum_ppm").cast("double") / (lit(1000000L) * col("n_docs")))
            .as("expected_rate"))
    }
  }

  /** CLASS-BALANCED subsample — equal documents per language, the
    * rebalancing step a multilingual training mix needs when the raw
    * corpus is 3:1 English-heavy ([[corpusMix]] reweights by SOURCE
    * budget shares; this balances by CLASS to the minority size, the
    * "uniform over langs" end of the sampling-temperature dial). Every
    * class keeps exactly m = min class size documents, chosen by salted
    * portable hash rank — stable under re-runs and row order like every
    * sampler here, and unlike random() it keeps the SAME docs when the
    * corpus is re-read.
    *
    * Output is the per-class census plus the exact kept-set digest (sum
    * and extrema of kept doc_ids), so the oracle value-checks WHICH
    * documents survived, not just how many.
    *
    * Scale posture: m comes from a broadcast-sized per-class count (≤
    * |langs| rows, ridden on an unpartitioned window over that bounded
    * frame); selection is one lang-keyed rank window. Exact-k selection
    * at extreme per-class cardinality upgrades to the two-pass
    * hash-threshold cut (take the class's m-th smallest hash as a
    * filter), same as [[graft.operators.Relational.sampleReservoir]]'s
    * documented path — the declared form is the definition. */
  val corpusSampleBalanced: Q = Q(
    "corpus_sample_balanced",
    s"""WITH h AS (SELECT lang, doc_id, n_chars,
       |  ${graft.functions.expressions.PortableHash
              .duckdbSaltedSql("doc_id", ":bal", 15)} AS hv
       |FROM documents),
       |m AS (SELECT min(cnt) AS m FROM
       |        (SELECT count(*) AS cnt FROM h GROUP BY lang)),
       |r AS (SELECT lang, doc_id, n_chars,
       |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
       |          AS rn
       |      FROM h)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
       |  min(doc_id) AS kept_id_min, max(doc_id) AS kept_id_max,
       |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |FROM r, m WHERE rn <= m
       |GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hv = graft.functions.TextFns.saltedHash(col("doc_id"), ":bal", 15)
    val h = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"), hv.as("hv"))
    // minority size: |langs| rows after the aggregate — the only
    // unpartitioned window runs over that bounded frame, then broadcasts
    val m = h.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt")).as("m"))
    h.withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(asc("hv"), asc("doc_id"))))
      .crossJoin(broadcast(m))
      .filter(col("rn") <= col("m"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"),
           min(col("doc_id")).as("kept_id_min"),
           max(col("doc_id")).as("kept_id_max"),
           sum(col("n_chars")).as("kept_chars"))
  }

  /** TEMPERATURE-SCALED language mix — the multilingual sampling dial
    * between proportional (T=1, what [[corpusMix]] budgets) and uniform
    * (T→∞, what [[corpusSampleBalanced]] takes): share_i ∝ p_i^(1/T)
    * with T=2, the √p up-weighting of low-resource languages standard in
    * multilingual pretraining (mT5/XLM-R lineage). Emits raw and
    * T-scaled shares in exact parts-per-million plus the boost factor
    * each language receives.
    *
    * Determinism ([[corpusMix]]'s integer-rates discipline, extended to
    * an irrational weight): √n is ONE correctly-rounded op from an exact
    * integer, quantized to integer micro-units (floor(10⁶·√n)) BEFORE
    * any sum — so the normalizing total is an exact BIGINT in any
    * accumulation order, and each share is one integer division. No
    * float sum exists to reorder; a 1-ulp √ divergence would need to
    * land within 1e-9 of a floor boundary AND both engines are
    * correctly-rounded anyway.
    *
    * Scale posture: one partial+final aggregate to |langs| rows; the
    * normalizing sums ride unpartitioned windows over that bounded
    * frame; everything downstream is |langs| rows. */
  val corpusMixTemperature: Q = Q(
    "corpus_mix_temperature",
    """WITH c AS (SELECT lang, count(*) AS n,
      |    CAST(floor(1000000 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
      |      AS s
      |  FROM documents GROUP BY 1),
      |t AS (SELECT lang, n, s,
      |    CAST(sum(n) OVER () AS BIGINT) AS tn,
      |    CAST(sum(s) OVER () AS BIGINT) AS ts
      |  FROM c)
      |SELECT lang, CAST(n AS BIGINT) AS n_docs,
      |  (1000000 * n) // tn AS raw_ppm,
      |  (1000000 * s) // ts AS temp_ppm,
      |  CAST((1000000 * s) // ts AS DOUBLE) / CAST((1000000 * n) // tn AS DOUBLE)
      |    AS boost
      |FROM t ORDER BY lang""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("s",
        floor(lit(1000000) * sqrt(col("n").cast("double"))).cast("long"))
      .withColumn("tn", sum(col("n")).over(wAll))
      .withColumn("ts", sum(col("s")).over(wAll))
      .select(col("lang"), col("n").as("n_docs"),
        expr("(1000000 * n) DIV tn").as("raw_ppm"),
        expr("(1000000 * s) DIV ts").as("temp_ppm"),
        (expr("(1000000 * s) DIV ts").cast("double") /
          expr("(1000000 * n) DIV tn").cast("double")).as("boost"))
      .orderBy("lang")
  }

  /** QUALITY-PRUNE THRESHOLD SWEEP — the corpus-curation dial tuned the
    * way [[graft.operators.Dedup.dedupThresholdSweep]] tunes Jaccard and
    * [[graft.operators.Vectors.vectorIvfProbeSweep]] tunes nprobe: for
    * each stopword-density floor τ (a natural-language-ness proxy — too
    * few stopwords means code/tables/boilerplate), how many documents and
    * tokens survive and what share of the corpus that is. The curator
    * reads the knee of this curve before committing a filter.
    *
    * Determinism: per-doc density is EXACT integer ppm ((10⁶·n_stop) DIV
    * n_tok); kept counts/tokens are exact sums; the share is one integer
    * division against a broadcast total. No floats anywhere.
    *
    * Plan: ONE pass computes per-doc (ppm, n_tok); the 5-row threshold
    * grid joins by generator explode (each grid point is a predicate,
    * never a second corpus pass — the sweep-family discipline); one
    * partial+final aggregate per (τ). */
  val corpusPruneSweep: Q = Q(
    "corpus_prune_sweep",
    s"""WITH m AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN (${graft.operators.TextAnalysis.stopwords
                .map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop
       |  FROM documents),
       |p AS (SELECT doc_id, n_tok,
       |        (1000000 * n_stop) // n_tok AS stop_ppm FROM m),
       |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t,
       |               count(*) AS nd FROM p),
       |g AS (SELECT p.*, unnest([0, 50000, 100000, 150000, 200000]) AS tau
       |      FROM p)
       |SELECT CAST(tau AS BIGINT) AS tau_ppm,
       |  CAST(count(*) FILTER (WHERE stop_ppm >= tau) AS BIGINT) AS n_kept,
       |  CAST(COALESCE(sum(n_tok) FILTER (WHERE stop_ppm >= tau), 0)
       |    AS BIGINT) AS kept_tokens,
       |  (1000000 * CAST(COALESCE(sum(n_tok) FILTER (WHERE stop_ppm >= tau),
       |     0) AS BIGINT)) // (SELECT t FROM tot) AS kept_share_ppm
       |FROM g GROUP BY 1 ORDER BY tau_ppm""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val p = Tables.documents(s, d)
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
        size(filter(toks,
          t => t.isin(graft.operators.TextAnalysis.stopwords: _*)))
          .cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tok"),
        expr("(1000000 * n_stop) DIV n_tok").as("stop_ppm"))
    val tot = p.agg(sum(col("n_tok")).as("t"))
    p.select(col("n_tok"), col("stop_ppm"),
        explode(typedlit(Seq(0L, 50000L, 100000L, 150000L, 200000L)))
          .as("tau"))
      .groupBy("tau")
      .agg(count(when(col("stop_ppm") >= col("tau"), 1)).as("n_kept"),
           coalesce(sum(when(col("stop_ppm") >= col("tau"), col("n_tok"))),
                    lit(0L)).as("kept_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("tau").as("tau_ppm"), col("n_kept"), col("kept_tokens"),
        expr("(1000000 * kept_tokens) DIV t").as("kept_share_ppm"))
  }

  /** MID-EPOCH RESUME of the deterministic shuffle — the property that
    * makes [[corpusShuffle]]'s salted permutation operationally better
    * than a materialized shuffled copy: a training job that died after
    * consuming the first K positions of each shard resumes by
    * RECOMPUTING the permutation and filtering pos > K — no consumed-id
    * ledger, no replay, because the (hash, doc_id) rank is a pure
    * function of (corpus, epoch salt). Emits the per-shard resume
    * manifest: total/skipped/remaining counts, the exact resume position
    * and its document, and an order-invariant DECIMAL(38,0) digest of the
    * remaining ids (sum of 40-bit salted hashes — exact under any
    * partial-aggregation order) that lets the trainer ASSERT the resumed
    * remainder equals the planned remainder before spending GPU time.
    *
    * Plan: the same ONE shard-keyed exchange as [[corpusShuffle]] (rank
    * window + per-shard aggregate share it); the digest folds map-side.
    * K is a constant here; in production it is the checkpoint's consumed
    * count per shard, joined in as a tiny dimension. */
  val corpusResumeSkip: Q = Q(
    "corpus_resume_skip",
    s"""WITH h AS (SELECT doc_id,
      |    ${graft.functions.expressions.PortableHash
               .duckdbSaltedSql("doc_id", ":epoch1", 15)} AS hv
      |  FROM documents),
      |sp AS (SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
      |    CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
      |      AS INT) AS pos
      |  FROM h),
      |dg AS (SELECT doc_id, shard, pos,
      |    ${graft.functions.expressions.PortableHash
               .duckdbSaltedSql("doc_id", ":resume", 10)} AS dh
      |  FROM sp)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(count(*) FILTER (WHERE pos <= 16) AS BIGINT) AS n_skipped,
      |  CAST(count(*) FILTER (WHERE pos > 16) AS BIGINT) AS n_remaining,
      |  CAST(min(pos) FILTER (WHERE pos > 16) AS INT) AS resume_pos,
      |  CAST(arg_min(CASE WHEN pos > 16 THEN doc_id END,
      |               CASE WHEN pos > 16 THEN pos END) AS BIGINT)
      |    AS resume_doc,
      |  CAST(CAST(sum(dh) FILTER (WHERE pos > 16) AS DECIMAL(38,0))
      |       AS VARCHAR) AS remainder_digest
      |FROM dg GROUP BY 1 ORDER BY shard""".stripMargin
  ) { (s, d) =>
    import graft.functions.TextFns.saltedHash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("hv", "doc_id")
    val sp = Tables.documents(s, d)
      .select(col("doc_id"), saltedHash(col("doc_id"), ":epoch1", 15).as("hv"))
      .withColumn("shard", (col("hv") % 8).cast("int"))
      .withColumn("pos", row_number().over(w))
      .withColumn("dh", saltedHash(col("doc_id"), ":resume", 10))
    val rem = col("pos") > 16
    sp.groupBy("shard")
      .agg(count(lit(1)).as("n_total"),
           count(when(!rem, 1)).as("n_skipped"),
           count(when(rem, 1)).as("n_remaining"),
           min(when(rem, col("pos"))).as("resume_pos"),
           min_by(when(rem, col("doc_id")), when(rem, col("pos")))
             .as("resume_doc"),
           // DECIMAL(38,0) accumulation: a 40-bit term summed over a
           // 10¹²-doc shard clears int64; wide exact sums on both
           // engines keep the digest well-defined at any scale. The
           // OUTPUT column is the decimal-digit string — wide-integer
           // result columns hash differently across DuckDB builds
           // (round-7 red), so digests ship as VARCHAR
           sum(when(rem, col("dh"))
             .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
             .cast("string")
             .as("remainder_digest"))
  }

  /** Token-budget mixture planning with EPOCH CAPS — the arithmetic a
    * data-curation run does before any sampling: given per-source token
    * counts, a √-weighted target mixture (the temperature-sampling
    * shape: big sources damped, small sources boosted), and a total
    * budget of 2× the corpus, how many epochs of each source does the
    * target imply (`epochs_ppm`), which sources hit the 4-epoch repeat
    * cap (`capped`), and what token counts/shares actually ship after
    * capping. All arithmetic is exact: the √ weight is quantized once
    * (floor of a correctly-rounded IEEE sqrt — deterministic on both
    * engines), everything after is BIGINT multiply/floor-divide.
    *
    * Plan: ONE corpus pass to the per-source token aggregate
    * (partial+final, |sources| rows), then the whole budget calculation
    * rides UNPARTITIONED windows over that O(sources) frame — a
    * single-partition tail is exactly right when the frame is
    * guaranteed tiny (the ban on global windows is about corpus-sized
    * frames, and this one is bounded by the source-domain cardinality,
    * never by data volume). */
  val corpusTokenBudget: Q = Q(
    "corpus_token_budget",
    """WITH s AS (SELECT source,
      |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, tokens,
      |    CAST(floor(1000000 * sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS wt
      |  FROM s),
      |a AS (SELECT source, tokens,
      |    (2 * sum(tokens) OVER () * wt) // sum(wt) OVER () AS target_tokens
      |  FROM w),
      |f AS (SELECT source, tokens, target_tokens,
      |    (target_tokens * 1000000) // tokens AS epochs_ppm,
      |    CASE WHEN (target_tokens * 1000000) // tokens > 4000000
      |         THEN 1 ELSE 0 END AS capped,
      |    least(target_tokens, 4 * tokens) AS achieved_tokens
      |  FROM a)
      |SELECT source, tokens, CAST(target_tokens AS BIGINT) AS target_tokens,
      |  CAST(epochs_ppm AS BIGINT) AS epochs_ppm, capped,
      |  CAST(achieved_tokens AS BIGINT) AS achieved_tokens,
      |  CAST((achieved_tokens * 1000000) // sum(achieved_tokens) OVER ()
      |       AS BIGINT) AS achieved_share_ppm
      |FROM f ORDER BY source""".stripMargin
  ) { (s, d) =>
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy() // O(sources) frame — see scaladoc
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("tokens"))
      .withColumn("wt",
        floor(lit(1000000) * sqrt(col("tokens").cast("double")))
          .cast("long"))
      .withColumn("tot_tokens", sum(col("tokens")).over(win))
      .withColumn("tot_w", sum(col("wt")).over(win))
      // DECIMAL(38,0) intermediates: 2·Σtokens·wt ≈ 2.5e13 · 5e12 at a
      // 100 TB corpus — 18 digits past int64. DuckDB promotes to HUGEINT
      // implicitly; Spark must widen explicitly or wrap silently. The
      // OUTPUT columns cast back to BIGINT (ppm- and 2×-corpus-bounded),
      // matching the oracle's final-SELECT casts.
      .withColumn("target_tokens",
        expr("""(2 * cast(tot_tokens as decimal(38,0)) * wt)
                div cast(tot_w as decimal(38,0))"""))
      .withColumn("epochs_ppm",
        expr("(cast(target_tokens as decimal(38,0)) * 1000000) div tokens"))
      .withColumn("capped",
        when(col("epochs_ppm") > 4000000, 1).otherwise(0))
      .withColumn("achieved_tokens",
        least(col("target_tokens"),
              col("tokens").cast(org.apache.spark.sql.types
                .DecimalType(38, 0)) * 4))
      .withColumn("tot_ach", sum(col("achieved_tokens")).over(win))
      .select(col("source"), col("tokens"),
        col("target_tokens").cast("long").as("target_tokens"),
        col("epochs_ppm").cast("long").as("epochs_ppm"), col("capped"),
        col("achieved_tokens").cast("long").as("achieved_tokens"),
        expr("(achieved_tokens * 1000000) div tot_ach")
          .cast("long").as("achieved_share_ppm"))
      .orderBy("source")
  }

  /** Deterministic round-robin source interleave — the training-stream
    * ORDER a multi-source mix actually ships with (one doc from each
    * source in turn, so no source floods any contiguous stretch of the
    * stream; the within-source order is the usual salted-hash epoch
    * permutation). Output: each doc's position within its source
    * (`src_pos`) and its GLOBAL interleave position (`pos` — the rank of
    * (src_pos, source) in lexicographic order).
    *
    * The scale point is HOW `pos` is computed: the naive plan is a
    * corpus-wide `row_number() OVER (ORDER BY src_pos, source)` — a
    * single-partition global sort, the one window shape this codebase
    * bans. Instead the global rank is ARITHMETIC: docs before (r, s) =
    * Σ_{s'} min(cnt_{s'}, r−1) + |{s' < s : cnt_{s'} ≥ r}|, which needs
    * only the per-source count table (|sources| rows, broadcast) crossed
    * against the doc frame and one per-doc sum — every stage distributed,
    * no global exchange-to-one. The DuckDB oracle USES the naive global
    * window (single-node, where it is the right plan), so the driver's
    * hash compare is exactly the proof that the distributed arithmetic
    * equals the global sort. */
  val corpusInterleave: Q = Q(
    "corpus_interleave",
    s"""WITH h AS (SELECT doc_id, source,
      |    ${graft.functions.expressions.PortableHash
               .duckdbSaltedSql("doc_id", ":interleave", 15)} AS hv
      |  FROM documents),
      |r AS (SELECT doc_id, source,
      |        row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
      |      FROM h)
      |SELECT doc_id, source, CAST(rn AS INT) AS src_pos,
      |  CAST(row_number() OVER (ORDER BY rn, source) AS BIGINT) AS pos
      |FROM r ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val hv = graft.functions.TextFns.saltedHash(col("doc_id"), ":interleave", 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("hv", "doc_id")
    val r = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), hv.as("hv"))
      .withColumn("src_pos", row_number().over(w))
      .select(col("doc_id"), col("source"), col("src_pos"))
    val cnts = r.groupBy(col("source").as("src2"))
      .agg(count(lit(1)).as("cnt"))
    r.crossJoin(broadcast(cnts))
      .groupBy(col("doc_id"), col("source"), col("src_pos"))
      .agg(sum(
        least(col("cnt"), col("src_pos") - 1) +
          when(col("src2") < col("source") && col("cnt") >= col("src_pos"),
            1).otherwise(0)).as("before"))
      .select(col("doc_id"), col("source"),
        col("src_pos").cast("int").as("src_pos"),
        (col("before") + 1).cast("long").as("pos"))
  }

  /** EPOCH-SCHEDULE MATERIALIZATION — the step between
    * [[corpusTokenBudget]]'s plan and an actual training run: a target
    * of e.g. 2.37 epochs for a source means every doc ships ⌊e⌋ = 2
    * full times plus a 37%-of-docs PARTIAL epoch, and the partial
    * epoch's membership must be a deterministic per-doc decision (the
    * [[corpusSampleWeighted]] salted-threshold discipline: hash slot <
    * frac_ppm) so resumes, replicas and audits all select the same
    * docs with no coordination. Output per source: the plan
    * (full_epochs, frac_ppm from the same √-weighted capped budget
    * arithmetic as the planner) and the MATERIALIZED partial epoch
    * (docs selected, their tokens) with the total scheduled tokens.
    *
    * Plan: pass 1 is the planner's per-source aggregate (|sources|
    * rows, window math on that frame); pass 2 streams the corpus once
    * against the BROADCAST 20-row schedule for the threshold test —
    * at 100 TB both passes are single corpus scans with map-side
    * combine, and the schedule never exceeds the source domain. All
    * arithmetic exact: the HUGEINT/DECIMAL(38,0) widening of the
    * planner, then BIGINT `//`/`%` splits and one salted-hash compare
    * per doc. */
  val corpusEpochSchedule: Q = Q(
    "corpus_epoch_schedule",
    s"""WITH s AS (SELECT source,
      |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS tokens,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, tokens, n_docs,
      |    CAST(floor(1000000 * sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS wt
      |  FROM s),
      |a AS (SELECT source, tokens, n_docs,
      |    (2 * sum(tokens) OVER () * wt) // sum(wt) OVER () AS target_tokens
      |  FROM w),
      |f AS (SELECT source, tokens, n_docs,
      |    CAST(least((target_tokens * 1000000) // tokens, 4000000)
      |         AS BIGINT) AS epochs_ppm
      |  FROM a),
      |p AS (SELECT source, tokens, n_docs,
      |    epochs_ppm // 1000000 AS full_epochs,
      |    epochs_ppm % 1000000 AS frac_ppm
      |  FROM f),
      |d AS (SELECT doc_id, source,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |    ${graft.functions.expressions.PortableHash
               .duckdbSaltedSql("doc_id", ":epoch_frac", 15)} % 1000000
      |      AS slot
      |  FROM documents),
      |m AS (SELECT p.source, p.n_docs, p.tokens, p.full_epochs, p.frac_ppm,
      |    CAST(sum(CASE WHEN d.slot < p.frac_ppm THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_partial_docs,
      |    CAST(sum(CASE WHEN d.slot < p.frac_ppm THEN d.n_tokens
      |                  ELSE 0 END) AS BIGINT) AS partial_tokens
      |  FROM d JOIN p USING (source) GROUP BY 1, 2, 3, 4, 5)
      |SELECT source, n_docs, tokens, full_epochs, frac_ppm,
      |  n_partial_docs, partial_tokens,
      |  full_epochs * tokens + partial_tokens AS sched_tokens
      |FROM m ORDER BY source""".stripMargin
  ) { (s, d) =>
    import graft.functions.TextFns.saltedHash
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val plan = Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("tokens"),
           count(lit(1)).as("n_docs"))
      .withColumn("wt",
        floor(lit(1000000) * sqrt(col("tokens").cast("double")))
          .cast("long"))
      .withColumn("tot_tokens", sum(col("tokens")).over(win))
      .withColumn("tot_w", sum(col("wt")).over(win))
      // the planner's DECIMAL(38,0) widening (corpusTokenBudget)
      .withColumn("target_tokens",
        expr("""(2 * cast(tot_tokens as decimal(38,0)) * wt)
                div cast(tot_w as decimal(38,0))"""))
      .withColumn("epochs_ppm",
        least(expr("(cast(target_tokens as decimal(38,0)) * 1000000)" +
                   " div tokens"),
              lit(4000000L)).cast("long"))
      .select(col("source"), col("tokens"), col("n_docs"),
        expr("epochs_ppm div 1000000").as("full_epochs"),
        expr("epochs_ppm % 1000000").as("frac_ppm"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (saltedHash(col("doc_id"), ":epoch_frac", 15) % 1000000L).as("slot"))
    docs.join(broadcast(plan), Seq("source"))
      .groupBy(col("source"), col("n_docs"), col("tokens"),
        col("full_epochs"), col("frac_ppm"))
      .agg(
        sum(when(col("slot") < col("frac_ppm"), 1L).otherwise(0L))
          .cast("long").as("n_partial_docs"),
        sum(when(col("slot") < col("frac_ppm"), col("n_tokens"))
          .otherwise(0L)).cast("long").as("partial_tokens"))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("full_epochs"), col("frac_ppm"), col("n_partial_docs"),
        col("partial_tokens"),
        (col("full_epochs") * col("tokens") + col("partial_tokens"))
          .as("sched_tokens"))
  }

  /** PROMPT-CONFLICT DETECTION for instruction/SFT-style corpora — the
    * dedup question pair data adds on top of document dedup: two records
    * with the SAME prompt but DIFFERENT completions are a label
    * conflict (they teach the model two answers), while same-prompt
    * same-completion records are plain duplicates. Here each document
    * splits into a prompt key (first 8 tokens) and a completion (the
    * rest); per prompt group the census reports group size, distinct
    * completions, and the classification — unique / duplicate (n > 1,
    * one completion) / CONFLICT (n > 1, several completions) — rolled
    * up per source with the conflicting-record share.
    *
    * Exactness: both keys are md5 digests (the [[graft.operators.Dedup]]
    * `dedup_exact` discipline — content-defined, engine-portable);
    * counts are exact; the share is floor-DIV ppm. Plan: one
    * prompt-keyed partial+final aggregate (the only corpus-sized
    * exchange — digests travel, never text), then a source-keyed
    * rollup; group classification rides inside the first aggregate as
    * a distinct count. Grouping carries min(source) so a prompt shared
    * ACROSS sources attributes once, deterministically. */
  val corpusPromptConflicts: Q = Q(
    "corpus_prompt_conflicts",
    """WITH p AS (SELECT
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' '))
      |      AS prompt_key,
      |    md5(array_to_string(string_split(text, ' ')[9:], ' '))
      |      AS completion_key,
      |    source
      |  FROM documents),
      |g AS (SELECT prompt_key, min(source) AS source,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT completion_key) AS BIGINT) AS n_completions
      |  FROM p GROUP BY 1)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_prompts,
      |  CAST(count(CASE WHEN n > 1 AND n_completions = 1 THEN 1 END)
      |       AS BIGINT) AS n_dup_groups,
      |  CAST(count(CASE WHEN n_completions > 1 THEN 1 END) AS BIGINT)
      |    AS n_conflict_groups,
      |  CAST(sum(CASE WHEN n_completions > 1 THEN n ELSE 0 END)
      |       AS BIGINT) AS n_conflict_records,
      |  CAST((1000000 * sum(CASE WHEN n_completions > 1 THEN n
      |                           ELSE 0 END)) // sum(n) AS BIGINT)
      |    AS conflict_ppm
      |FROM g GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val p = Tables.documents(s, d)
      .select(
        md5(concat_ws(" ", slice(toks, 1, 8)).cast("binary"))
          .as("prompt_key"),
        md5(concat_ws(" ",
          expr("slice(split(text, ' '), 9, greatest(size(split(text, ' ')) - 8, 0))"))
          .cast("binary"))
          .as("completion_key"),
        col("source"))
    val g = p.groupBy("prompt_key")
      .agg(min(col("source")).as("source"),
        count(lit(1)).as("n"),
        countDistinct(col("completion_key")).as("n_completions"))
    g.groupBy("source")
      .agg(count(lit(1)).as("n_prompts"),
        count(when(col("n") > 1 && col("n_completions") === 1, 1))
          .as("n_dup_groups"),
        count(when(col("n_completions") > 1, 1)).as("n_conflict_groups"),
        sum(when(col("n_completions") > 1, col("n")).otherwise(0L))
          .cast("long").as("n_conflict_records"),
        sum(col("n")).cast("long").as("tot"))
      .select(col("source"), col("n_prompts"), col("n_dup_groups"),
        col("n_conflict_groups"), col("n_conflict_records"),
        expr("(1000000 * n_conflict_records) div tot").cast("long")
          .as("conflict_ppm"))
  }

  /** T5-style span-corruption budget planner — the compute estimate a
    * denoising-pretraining run makes before launching: with corruption
    * rate 15% and mean noise-span length 3, each document contributes
    * `corrupted = (15·n_tok)//100` masked tokens in `spans =
    * max(1, corrupted//3)` spans (when anything is masked at all), an
    * encoder input of `n_tok − corrupted + spans` tokens (each span
    * collapses to one sentinel) and a decoder target of
    * `corrupted + spans + 1` tokens. The per-source census — total
    * input/target tokens and the realized corruption ratio — is what
    * sizes the training job and validates the rate actually achieved on
    * integer-rounded short documents (always below the nominal 150000
    * ppm, the readout this query exists to expose).
    *
    * Parity: pure nonnegative integer arithmetic end to end. Plan: the
    * planner is a per-row expression over the token count; ONE
    * |sources|-bounded partial+final aggregate. */
  val corpusSpanCorruption: Q = Q(
    "corpus_span_corruption",
    """WITH m AS (SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |p AS (SELECT source, n_tok, (15 * n_tok) // 100 AS corrupted,
      |    CASE WHEN (15 * n_tok) // 100 > 0
      |         THEN greatest(1, ((15 * n_tok) // 100) // 3)
      |         ELSE 0 END AS spans
      |  FROM m)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_tok - corrupted + spans) AS BIGINT) AS input_tokens,
      |  CAST(sum(corrupted + spans + 1) AS BIGINT) AS target_tokens,
      |  CAST((1000000 * sum(corrupted)) // sum(n_tok) AS BIGINT)
      |    AS realized_ppm
      |FROM p GROUP BY 1 ORDER BY source""".stripMargin
  ) { (s, d) =>
    val m = Tables.documents(s, d).select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val p = m
      .withColumn("corrupted", expr("(15 * n_tok) div 100"))
      .withColumn("spans",
        when(col("corrupted") > 0,
          greatest(lit(1L), expr("corrupted div 3"))).otherwise(0L))
    p.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("total_tokens"),
           sum(col("n_tok") - col("corrupted") + col("spans"))
             .as("input_tokens"),
           sum(col("corrupted") + col("spans") + 1).as("target_tokens"),
           // widened: 10⁶·Σcorrupted clears int64 at ~10¹³ corpus tokens
           // (DuckDB auto-promotes to HUGEINT; Spark must widen or wrap)
           expr("""(1000000 * cast(sum(corrupted) as decimal(38,0)))
                   div sum(n_tok)""").cast("long").as("realized_ppm"))
  }

  /** Shuffle-quality audit — does the epoch permutation actually MIX
    * sources? A bad shuffle feeds the trainer long same-source runs
    * (gradient correlation, the thing epoch permutations exist to
    * prevent), and the standard diagnostic is same-source co-occurrence
    * inside small adjacent windows of the shuffled stream. Computed
    * scalably: the hash order is cut into SLOTS of expected occupancy 2
    * (slot = hv // W with W = 2⁶¹/n, the auto-sized-LSH-bands trick —
    * the width adapts to corpus size from a 1-row count, so slot count
    * GROWS with the corpus and no slot ever concentrates), and the
    * audit compares the same-source share of in-slot pairs against the
    * Σshare² expectation of a perfect mix, per epoch. No global sort,
    * no window — co-occurrence is a PAIR CENSUS: per (epoch, slot,
    * source) counts, then C(k,2) sums, all partial-aggregated.
    *
    * Parity: the epoch hash matches [[corpusShuffle]]'s salt convention
    * (`:epoch<e>`); pair counts are exact integer C(k,2) floor-divs;
    * both ppm outputs widen their numerators (Σc² clears int64 at ~3e9
    * docs) and guard degenerate denominators with nullif. */
  val corpusShuffleQuality: Q = Q(
    "corpus_shuffle_quality",
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |e AS (SELECT doc_id, source, unnest([1, 2]) AS epoch
       |      FROM documents),
       |h AS (SELECT epoch, source,
       |    ${graft.functions.expressions.PortableHash.duckdbSaltedSql(
              "CAST(doc_id AS VARCHAR) || ':epoch' || CAST(epoch AS VARCHAR)",
              "", 15)}
       |      // (SELECT greatest(1, 2305843009213693952 // greatest(n // 2, 1))
       |          FROM nn) AS slot
       |  FROM e),
       |c AS (SELECT epoch, slot, source, count(*) AS k
       |      FROM h GROUP BY 1, 2, 3),
       |sl AS (SELECT epoch, slot, CAST(sum(k) AS BIGINT) AS m,
       |    CAST(sum((k * (k - 1)) // 2) AS BIGINT) AS same_p
       |  FROM c GROUP BY 1, 2),
       |agg AS (SELECT epoch, CAST(count(*) AS BIGINT) AS n_slots,
       |    CAST(sum((m * (m - 1)) // 2) AS BIGINT) AS n_pairs,
       |    CAST(sum(same_p) AS BIGINT) AS same_pairs
       |  FROM sl GROUP BY 1),
       |ex AS (SELECT CAST((1000000 * sum(CAST(c2 AS HUGEINT) * c2))
       |      // (CAST((SELECT n FROM nn) AS HUGEINT) * (SELECT n FROM nn))
       |      AS BIGINT)
       |      AS expected_ppm
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS c2 FROM documents
       |        GROUP BY source))
       |SELECT CAST(epoch AS INT) AS epoch, (SELECT n FROM nn) AS n_docs,
       |  n_slots, n_pairs, same_pairs,
       |  CAST((1000000 * same_pairs) // nullif(n_pairs, 0) AS BIGINT)
       |    AS clump_ppm,
       |  (SELECT expected_ppm FROM ex) AS expected_ppm
       |FROM agg ORDER BY epoch""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d)
    val nn = docs.agg(count(lit(1)).as("n"))
    val e = docs.select(col("doc_id"), col("source"),
      explode(typedlit(Seq(1, 2))).as("epoch"))
    val hv = graft.functions.TextFns.saltedHash(
      concat(col("doc_id").cast("string"), lit(":epoch"),
        col("epoch").cast("string")), "", 15)
    val withHv = e.crossJoin(broadcast(nn)).withColumn("hv", hv)
      .select(col("epoch"), col("source"),
        expr("""hv div greatest(1, 2305843009213693952
                div greatest(n div 2, 1))""").as("slot"))
    val c = withHv.groupBy("epoch", "slot", "source")
      .agg(count(lit(1)).as("k"))
    val sl = c.groupBy("epoch", "slot")
      .agg(sum(col("k")).as("m"),
           sum(expr("(k * (k - 1)) div 2")).as("same_p"))
    val agg = sl.groupBy("epoch")
      .agg(count(lit(1)).as("n_slots"),
           sum(expr("(m * (m - 1)) div 2")).as("n_pairs"),
           sum(col("same_p")).as("same_pairs"))
    val ex = docs.groupBy("source").agg(count(lit(1)).as("c2"))
      .crossJoin(broadcast(nn))
      .agg(expr("""(1000000 * sum(cast(c2 as decimal(38,0)) * c2))
                   div (cast(first(n) as decimal(38,0)) * first(n))""")
        .cast("long").as("expected_ppm"))
    agg.crossJoin(broadcast(nn)).crossJoin(broadcast(ex))
      .select(col("epoch").cast("int").as("epoch"),
        col("n").as("n_docs"), col("n_slots"), col("n_pairs"),
        col("same_pairs"),
        expr("(1000000 * same_pairs) div nullif(n_pairs, 0)")
          .as("clump_ppm"),
        col("expected_ppm"))
  }

  /** Padding-waste census under power-of-two length bucketing — the
    * batching-efficiency readout every training loader with
    * length-grouped batches is tuned by: each document pads up to its
    * power-of-two token bucket (16 … 2048, clamped), and the per
    * (source, bucket) census reports how many tokens of every batch are
    * PADDING (`waste_ppm` = padded / (padded + real)). A source whose
    * mass sits just above a bucket boundary wastes ~half its compute on
    * pad tokens — the signal that drives bucket-boundary tuning or
    * sequence packing ([[corpusPack]] is the packing alternative this
    * census justifies).
    *
    * Parity: the bucket ladder is a CASE over integer comparisons;
    * everything downstream is exact nonnegative integer arithmetic with
    * the ppm numerator widened (10⁶·Σpad clears int64 at ~10¹³ corpus
    * tokens; DuckDB promotes silently, Spark must widen or wrap).
    *
    * Plan: per-row bucket assignment fused into the scan projection,
    * ONE (source × ≤9 buckets)-bounded partial+final aggregate. */
  val corpusPadWaste: Q = Q(
    "corpus_pad_waste",
    """WITH m AS (SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |b AS (SELECT source, n_tok,
      |    CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
      |         WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
      |         WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
      |         WHEN n_tok <= 1024 THEN 1024 ELSE 2048 END AS bucket
      |  FROM m)
      |SELECT source, CAST(bucket AS INT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS real_tokens,
      |  CAST(sum(least(bucket, 2048) - least(n_tok, 2048)) AS BIGINT)
      |    AS pad_tokens,
      |  CAST((1000000 * CAST(sum(least(bucket, 2048) - least(n_tok, 2048))
      |         AS HUGEINT))
      |       // (sum(least(bucket, 2048) - least(n_tok, 2048))
      |           + sum(least(n_tok, 2048))) AS BIGINT) AS waste_ppm
      |FROM b GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin
  ) { (s, d) =>
    val m = Tables.documents(s, d).select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val bucket = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
      .foldRight(lit(2048L)) { (b, e) =>
        when(col("n_tok") <= b, b).otherwise(e)
      }
    m.select(col("source"), col("n_tok"), bucket.as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("real_tokens"),
           sum(least(col("bucket"), lit(2048L)) -
               least(col("n_tok"), lit(2048L))).as("pad_tokens"),
           sum(least(col("n_tok"), lit(2048L))).as("clipped_tokens"))
      .select(col("source"), col("bucket").cast("int").as("bucket"),
        col("n_docs"), col("real_tokens"), col("pad_tokens"),
        expr("""(1000000 * cast(pad_tokens as decimal(38,0)))
                div (pad_tokens + clipped_tokens)""")
          .cast("long").as("waste_ppm"))
  }

  /** Quality-gate attrition funnel — the FIRST report a corpus-cleaning
    * run produces: documents flow through an ORDERED chain of cheap
    * quality gates (min length → token-diversity → stopword floor →
    * token-length ceiling, the standard heuristic ladder) and each doc
    * is attributed to the FIRST gate that kills it, so the per-gate
    * counts read as a funnel (what each rule uniquely costs given
    * everything before it) rather than overlapping per-rule kill rates.
    * [[corpusPruneSweep]] answers "where should ONE threshold sit";
    * this answers "what does the shipped CHAIN cost, stage by stage".
    *
    * Exactness: every gate is an integer-ppm comparison on per-row token
    * censuses — no doubles anywhere. Gate labels carry an ordering
    * prefix so the output sorts in chain order on both engines.
    *
    * Plan: ONE corpus pass — all four gates are per-row array
    * expressions (split / distinct / stopword filter / char count)
    * fused into the same projection, then a single partial+final
    * aggregate on the ≤5-value gate key; the token total rides a
    * 1-row broadcast. Nothing shuffles except ≤5-row partials. */
  val corpusFilterFunnel: Q = Q(
    "corpus_filter_funnel",
    s"""WITH m AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |      AS n_uniq,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN (${graft.operators.TextAnalysis.stopwords
                .map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop,
       |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chr
       |  FROM documents),
       |v AS (SELECT doc_id, n_tok,
       |    CASE
       |      WHEN n_tok < 10 THEN 'a_too_short'
       |      WHEN (1000000 * n_uniq) // n_tok < 400000 THEN 'b_repetitive'
       |      WHEN (1000000 * n_stop) // n_tok < 50000 THEN 'c_low_stopword'
       |      WHEN (1000 * n_chr) // n_tok > 12000 THEN 'd_long_tokens'
       |      ELSE 'e_pass' END AS gate
       |  FROM m),
       |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM v)
       |SELECT gate, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS tokens,
       |  CAST((1000000 * CAST(sum(n_tok) AS BIGINT)) // (SELECT t FROM tot)
       |       AS BIGINT) AS token_share_ppm
       |FROM v GROUP BY 1 ORDER BY gate""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val m = Tables.documents(s, d).select(col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      size(filter(toks,
        t => t.isin(graft.operators.TextAnalysis.stopwords: _*)))
        .cast("long").as("n_stop"),
      length(translate(col("text"), " ", "")).cast("long").as("n_chr"))
    val v = m.select(col("n_tok"),
      when(col("n_tok") < 10, "a_too_short")
        .when(expr("(1000000 * n_uniq) div n_tok") < 400000, "b_repetitive")
        .when(expr("(1000000 * n_stop) div n_tok") < 50000, "c_low_stopword")
        .when(expr("(1000 * n_chr) div n_tok") > 12000, "d_long_tokens")
        .otherwise("e_pass").as("gate"))
    val tot = v.agg(sum(col("n_tok")).as("t"))
    v.groupBy("gate")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .crossJoin(broadcast(tot))
      .select(col("gate"), col("n_docs"), col("tokens"),
        // widened: 10⁶·tokens clears int64 at ~10¹³ corpus tokens
        expr("(1000000 * cast(tokens as decimal(38,0))) div t")
          .cast("long").as("token_share_ppm"))
  }

  /** GATE-ABLATION attribution over [[corpusFilterFunnel]]'s quality
    * battery — the "which gate can we drop / which gate carries the
    * weight?" readout the funnel's FIRST-FAILING attribution cannot
    * answer: per gate, how many docs fail it AT ALL (independent
    * evaluation, no gate ordering), how many fail ONLY it, and how many
    * tokens re-enter the corpus if that single gate is removed
    * (`recoverable_ppm` — the curation knob's marginal value). A gate
    * whose unique-failure mass is ~0 is redundant with the rest of the
    * battery; one carrying most of the recoverable mass deserves a
    * threshold sweep before shipping.
    *
    * Same gates, thresholds and exact integer metrics as the funnel
    * (shared constants in spirit — the oracle texts mirror each other);
    * the per-gate melt is the parallel-unnest zip (the
    * text_rake_keywords pattern) so no pair join appears. Plan: one
    * narrow metric scan → a 4×-rows melt of (gate, flag) → one
    * partial+final aggregate on the 4-key gate; the corpus total rides
    * a broadcast 1-row frame. */
  val corpusGateAblation: Q = Q(
    "corpus_gate_ablation",
    s"""WITH m AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |      AS n_uniq,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN (${graft.operators.TextAnalysis.stopwords
                 .map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop,
       |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chr
       |  FROM documents),
       |f AS (SELECT doc_id, n_tok,
       |    CASE WHEN n_tok < 10 THEN 1 ELSE 0 END AS g1,
       |    CASE WHEN (1000000 * n_uniq) // n_tok < 400000 THEN 1 ELSE 0
       |      END AS g2,
       |    CASE WHEN (1000000 * n_stop) // n_tok < 50000 THEN 1 ELSE 0
       |      END AS g3,
       |    CASE WHEN (1000 * n_chr) // n_tok > 12000 THEN 1 ELSE 0
       |      END AS g4
       |  FROM m),
       |u AS (SELECT n_tok, g1 + g2 + g3 + g4 AS n_fail,
       |    unnest(['a_too_short', 'b_repetitive', 'c_low_stopword',
       |            'd_long_tokens']) AS gate,
       |    unnest([g1, g2, g3, g4]) AS fails
       |  FROM f),
       |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM m)
       |SELECT gate, CAST(sum(fails) AS BIGINT) AS n_fail_docs,
       |  CAST(sum(CASE WHEN fails = 1 THEN n_tok ELSE 0 END) AS BIGINT)
       |    AS fail_tokens,
       |  CAST(sum(CASE WHEN fails = 1 AND n_fail = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_unique_fail,
       |  CAST(sum(CASE WHEN fails = 1 AND n_fail = 1 THEN n_tok ELSE 0
       |    END) AS BIGINT) AS unique_tokens,
       |  CAST((1000000 * CAST(sum(CASE WHEN fails = 1 AND n_fail = 1
       |      THEN n_tok ELSE 0 END) AS HUGEINT)) // (SELECT t FROM tot)
       |    AS BIGINT) AS recoverable_ppm
       |FROM u GROUP BY 1 ORDER BY gate""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val m = Tables.documents(s, d).select(col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      size(filter(toks,
        t => t.isin(graft.operators.TextAnalysis.stopwords: _*)))
        .cast("long").as("n_stop"),
      length(translate(col("text"), " ", "")).cast("long").as("n_chr"))
    val f = m.select(col("n_tok"),
      when(col("n_tok") < 10, 1).otherwise(0).as("g1"),
      when(expr("(1000000 * n_uniq) div n_tok") < 400000, 1)
        .otherwise(0).as("g2"),
      when(expr("(1000000 * n_stop) div n_tok") < 50000, 1)
        .otherwise(0).as("g3"),
      when(expr("(1000 * n_chr) div n_tok") > 12000, 1)
        .otherwise(0).as("g4"))
    val u = f
      .withColumn("n_fail",
        col("g1") + col("g2") + col("g3") + col("g4"))
      .select(col("n_tok"), col("n_fail"),
        explode(map(
          lit("a_too_short"), col("g1"), lit("b_repetitive"), col("g2"),
          lit("c_low_stopword"), col("g3"), lit("d_long_tokens"),
          col("g4"))).as(Seq("gate", "fails")))
    val tot = m.agg(sum(col("n_tok")).as("t"))
    u.groupBy("gate")
      .agg(sum(col("fails")).cast("long").as("n_fail_docs"),
        sum(when(col("fails") === 1, col("n_tok")).otherwise(0L))
          .as("fail_tokens"),
        sum(when(col("fails") === 1 && col("n_fail") === 1, 1)
          .otherwise(0)).cast("long").as("n_unique_fail"),
        sum(when(col("fails") === 1 && col("n_fail") === 1, col("n_tok"))
          .otherwise(0L)).as("unique_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("gate"), col("n_fail_docs"), col("fail_tokens"),
        col("n_unique_fail"), col("unique_tokens"),
        expr("""(1000000 * cast(unique_tokens as decimal(38,0)))
                div t""").cast("long").as("recoverable_ppm"))
  }

  /** QUALITY-SCORE CALIBRATION against duplication — the audit that
    * decides whether a cheap quality signal is worth gating on: bucket
    * every document by type-token ratio (TTR milli, exact floor-DIV of
    * the unique/total token counts — the classic templated-text
    * detector) and measure, per bucket, the EXACT-DUPLICATE rate (md5
    * content groups of size > 1, the [[graft.operators.Dedup]] exact
    * family's definition) and the mean document length. A monotone
    * dup-rate across buckets validates the score; a flat curve says the
    * signal is noise for this corpus.
    *
    * Plan: one projection pass computes per-doc (hash, n_tok, n_uniq);
    * the dup flag rides ONE hash-keyed window count (the only corpus
    * exchange); the bucket aggregate is 10 rows. All ratios are
    * nonnegative floor-DIVs of exact BIGINTs. */
  val corpusQualityCalibration: Q = Q(
    "corpus_quality_calibration",
    """WITH q AS (SELECT doc_id, md5(text) AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS n_uniq
      |  FROM documents),
      |d AS (SELECT doc_id, n_tok,
      |    least(((1000 * n_uniq) // n_tok) // 100, 9) AS bucket,
      |    CASE WHEN count(*) OVER (PARTITION BY h) > 1 THEN 1 ELSE 0 END
      |      AS is_dup
      |  FROM q)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
      |  CAST((1000000 * sum(is_dup)) // count(*) AS BIGINT) AS dup_ppm,
      |  CAST((1000 * sum(n_tok)) // count(*) AS BIGINT) AS mean_tok_milli
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val q = Tables.documents(s, d).select(col("doc_id"),
      md5(col("text").cast("binary")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      size(array_distinct(split(col("text"), " "))).cast("long")
        .as("n_uniq"))
    val dd = q.select(col("doc_id"), col("n_tok"),
        least(expr("((1000 * n_uniq) div n_tok) div 100"), lit(9L))
          .as("bucket"),
        when(count(lit(1)).over(Window.partitionBy("h")) > 1, 1L)
          .otherwise(0L).as("is_dup"))
    dd.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dup"),
        sum(col("n_tok")).as("sum_tok"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_dup").cast("long").as("n_dup"),
        expr("(1000000 * n_dup) div n_docs").cast("long").as("dup_ppm"),
        expr("(1000 * sum_tok) div n_docs").cast("long")
          .as("mean_tok_milli"))
  }

  val all: Seq[Q] = Seq(corpusSplit, corpusPack, corpusSelect, docChunk,
    corpusDecontaminate, corpusMix, corpusShuffle, trainingManifest,
    corpusEntropy, corpusPipeline, corpusSplitLeakage, corpusSampleWeighted,
    corpusSampleBalanced, corpusMixTemperature, corpusPruneSweep,
    corpusResumeSkip, corpusInterleave, corpusTokenBudget,
    corpusEpochSchedule, corpusPromptConflicts, corpusFilterFunnel,
    corpusSpanCorruption, corpusPadWaste, corpusShuffleQuality,
    corpusGateAblation, corpusQualityCalibration)
}
