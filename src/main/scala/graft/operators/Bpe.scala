package graft.operators

import graft.PlanUtil.TimedCheckpoint
import graft.{ArtifactCaches, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed job — the one
  * step of an LLM data pipeline that is genuinely iterative: each round
  * counts adjacent symbol pairs, picks the global argmax, and rewrites
  * the symbol sequences with the merged pair (Sennrich et al. 2016,
  * arXiv:1508.07909). The reference pipeline has nothing comparable;
  * this is north-star engine capability like the dedup family.
  *
  * Scale posture: BPE trains on the WORD-FREQUENCY table, not the raw
  * corpus — the corpus reduces once (explode + partial/final count) and
  * every subsequent round touches only distinct words weighted by
  * frequency (vocabulary-bounded, millions of rows at 100 TB, not
  * trillions). Per round: one partial+final aggregate on the (l, r) pair
  * key, one TakeOrderedAndProject argmax (no global sort), and one
  * narrow projection rewriting the symbol arrays in place; lineage is
  * truncated with a localCheckpoint every few rounds so plan depth stays
  * bounded for large merge counts. The sequential rounds are inherent —
  * merge i+1's counts depend on merge i having been applied.
  *
  * Both queries are `eager` (training runs jobs at plan-build). The
  * merge loop is not expressible as one ANSI SQL statement, so the
  * oracle is GENERATED post-run ([[Q.oracleGen]], the vector_ann_ivf
  * discipline): the independent in-memory reference implementation
  * ([[referenceMerges]] — plain Scala, no Spark, the same oracle BpeSpec
  * asserts against) trains on the collected word-frequency table and its
  * merges/vocab are inlined as DuckDB VALUES. The driver then
  * hash-compares the distributed trainer against the reference
  * implementation — cross-IMPLEMENTATION equality recorded in the
  * correctness gate, not just in CI. For bpe_encode the inlined artifact
  * is only the (word → piece-count) vocab; the split/join/aggregate over
  * documents is DuckDB's own SQL, independent of the Spark plan.
  */
object Bpe {

  // 64 learned merges in the DECLARED query — big enough that the driver
  // artifact exercises multi-character merge chains (the 1000-merge soak
  // in BpeSpec covers the scaling claim; this is the driver-visible size)
  private[graft] val NMerges = 64
  private[graft] val EndMark = "</w>"

  /** Corpus → (word, freq): the one pass over raw text. */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right merge of the pair (l, r) inside a symbol
    * array, as a pure Catalyst fold: append each symbol unless the
    * accumulator ends with `l` and the symbol is `r`, in which case the
    * tail is replaced by the merged symbol. Non-overlapping by
    * construction (the merged tail no longer equals `l`, so "xxx" under
    * (x,x) → [xx, x], not [xx, xx-overlap]). `get` (not `element_at`)
    * so the empty-accumulator probe is null-safe under ANSI mode. */
  private def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
           concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** One learned merge: rank (1-based), the pair, the merged symbol, and
    * the weighted pair count that won the round. */
  private[graft] final case class Merge(
      rank: Int, lhs: String, rhs: String, merged: String, n_pairs: Long)

  /** Initial symbol table: every word split to characters + [[EndMark]]. */
  private def initialSymbols(words: DataFrame): DataFrame =
    words.select(col("w"), col("freq"),
      concat(split(col("w"), ""), array(lit(EndMark))).as("syms"))

  /** Run `n` merge rounds over a (w, freq) table. Returns the learned
    * merges and the final per-word symbol table (the trained vocab used
    * by [[bpeEncode]]). Argmax tie-break is (count desc, l asc, r asc) —
    * fully deterministic under any partitioning. */
  private[graft] def learnMerges(words0: DataFrame, n: Int)
      : (Seq[Merge], DataFrame) = {
    // materialize the reduced word table once; every round re-reads it
    var words = initialSymbols(words0).timedLocalCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var exhausted = false
    while (i < n && !exhausted) {
      val best = words.select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fused to one symbol
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(i + 1, l, r, l + r, cnt)
        words = words.select(col("w"), col("freq"),
          mergePair(col("syms"), l, r).as("syms"))
        // bound lineage/codegen depth across many rounds
        if ((i + 1) % 8 == 0) words = words.timedLocalCheckpoint()
        i += 1
      }
    }
    (merges.toSeq, words)
  }

  /** Training is deterministic for a given corpus, so the trained
    * artifact (merges + vocab table, the latter checkpoint-backed) is
    * memoized — [[bpeTrain]] and [[bpeEncode]] share one training run per
    * corpus, like the IVF centroid cache. The key includes the OWNING
    * SparkContext's applicationId, not just the corpus fingerprint: the
    * cached vocab DataFrame is localCheckpoint-backed, so its blocks die
    * with the context — a same-JVM successor session with the same corpus
    * must retrain, not inherit a DataFrame bound to a dead context. */
  private val trainCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Merge], DataFrame)]()

  /** Reference-implementation artifacts per corpus fingerprint: the
    * in-memory trainer's merges and its (word → piece-count) vocab.
    * Plain driver-side data (no checkpoint-backed DataFrame), so unlike
    * [[trainCache]] the key needs no session id — the artifact outlives
    * the session that computed it. Consumed by the post-run oracle
    * generators below. */
  private val refCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Merge], Seq[(String, Int)])]()

  /** Corpus fingerprint of the most recent training run — which corpus
    * the generated oracles should render for. */
  @volatile private var lastRefKey: Option[String] = None

  private def trained(s: SparkSession, d: String): (Seq[Merge], DataFrame) = {
    val fp = Tables.fingerprint(s, d, "documents")
    val res = ArtifactCaches.memo("bpe.train", trainCache)(
      s"${s.sparkContext.applicationId}#$fp")(
      _ => learnMerges(wordFreq(s, d), NMerges))
    ArtifactCaches.memo("bpe.ref", refCache)(fp)(_ => {
      // vocabulary-bounded collect (same bound the trainer itself relies
      // on); the merge TRAINING below is the independent implementation
      val freqs = wordFreq(s, d).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val merges = referenceMerges(freqs, NMerges)
      val vocab = freqs.keysIterator.toSeq.sorted
        .map(w => w -> refPieces(w, merges).length)
      (merges, vocab)
    })
    lastRefKey = Some(fp)
    res
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB mirror of [[bpeTrain]]: the independent in-memory trainer's
    * merge table inlined as VALUES. The driver's hash compare then IS the
    * cross-implementation equality check BpeSpec runs in CI. */
  private[operators] def trainOracleSql(merges: Seq[Merge]): String = {
    val rows = merges.map(m =>
      s"(${m.rank}, ${sqlStr(m.lhs)}, ${sqlStr(m.rhs)}, " +
        s"${sqlStr(m.merged)}, ${m.n_pairs})").mkString(",\n    ")
    s"""SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged,
       |  CAST(n_pairs AS BIGINT) AS n_pairs
       |FROM (VALUES
       |    $rows) t(rank, lhs, rhs, merged, n_pairs)""".stripMargin
  }

  /** DuckDB mirror of [[bpeEncode]]: ONLY the reference vocab (word →
    * piece count, from in-memory rule application) is inlined; the word
    * split, join, and per-document aggregate are DuckDB's own SQL over
    * the documents parquet — independent of the Spark plan being
    * checked. */
  private[operators] def encodeOracleSql(vocab: Seq[(String, Int)]): String = {
    val rows = vocab.map { case (w, n) => s"(${sqlStr(w)}, $n)" }
      .mkString(",\n    ")
    s"""WITH vocab AS (SELECT w, n_sym FROM (VALUES
       |    $rows) v(w, n_sym)),
       |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |          FROM documents)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n_sym) AS BIGINT) AS n_pieces,
       |  CAST(sum(n_sym) AS DOUBLE) / count(*) AS fertility
       |FROM words JOIN vocab USING (w)
       |WHERE length(w) > 0
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** The learned merge table for the corpus — rank, pair, merged symbol,
    * winning pair count. */
  val bpeTrain: Q = Q.noOracle("bpe_train") { (s, d) =>
    import s.implicits._
    trained(s, d)._1.toDF("rank", "lhs", "rhs", "merged", "n_pairs")
  }.copy(
    eager = true,
    oracleGen = Some(() =>
      lastRefKey.flatMap(k => Option(refCache.get(k)))
        .map(a => trainOracleSql(a._1))))

  /** Encode the corpus with the trained tokenizer and report per-document
    * piece counts + fertility (pieces per word) — the metric tokenizer
    * choices are judged by. No per-document re-segmentation: the trained
    * vocab IS the (word → pieces) lookup, so encoding is the word explode
    * joined to the BROADCAST vocab table and a per-doc aggregate —
    * exactly how a 100 TB corpus would be tokenized (the vocab table is
    * vocabulary-bounded). */
  val bpeEncode: Q = Q.noOracle("bpe_encode") { (s, d) =>
    val vocab = trained(s, d)._2
      .select(col("w"), size(col("syms")).as("n_sym"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(vocab), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_pieces"),
           (sum(col("n_sym")).cast("double") / count(lit(1)))
             .as("fertility"))
  }.copy(
    eager = true,
    oracleGen = Some(() =>
      lastRefKey.flatMap(k => Option(refCache.get(k)))
        .map(a => encodeOracleSql(a._2))))

  /** DuckDB mirror of [[corpusTokenizerCompression]]: the reference
    * vocab inlined (the [[encodeOracleSql]] discipline); split, byte
    * census, join, and the per-source rollup are DuckDB's own SQL. */
  private[operators] def compressionOracleSql(
      vocab: Seq[(String, Int)]): String = {
    val rows = vocab.map { case (w, n) => s"(${sqlStr(w)}, $n)" }
      .mkString(",\n    ")
    s"""WITH vocab AS (SELECT w, n_sym FROM (VALUES
       |    $rows) v(w, n_sym)),
       |words AS (SELECT doc_id, source,
       |          unnest(string_split(text, ' ')) AS w
       |          FROM documents)
       |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(octet_length(encode(w))) AS BIGINT) AS n_bytes,
       |  CAST(sum(n_sym) AS BIGINT) AS n_pieces,
       |  (1000 * CAST(sum(octet_length(encode(w))) AS BIGINT))
       |    // CAST(sum(n_sym) AS BIGINT) AS bpt_milli,
       |  (1000 * CAST(sum(n_sym) AS BIGINT))
       |    // CAST(count(*) AS BIGINT) AS fertility_milli
       |FROM words JOIN vocab USING (w)
       |WHERE length(w) > 0
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  /** TOKENIZER COMPRESSION by corpus source — the cross-domain
    * efficiency readout tokenizer choices are judged by at the MIXTURE
    * level, where [[bpeEncode]]'s per-document fertility judges them at
    * the document level: UTF-8 bytes per BPE piece (bpt) and pieces per
    * word per source. A source whose bpt sits far below the corpus norm
    * is under-served by the vocabulary (its text shatters into short
    * pieces — the classic non-English-tokenizer failure) and either
    * needs vocab budget or burns training FLOPs on fragment tokens;
    * this table is the input to that budget decision.
    *
    * Parity discipline: pure integer — exact byte and piece sums,
    * nonnegative floor DIVs to milli units, no real number anywhere.
    * Plan: the [[bpeEncode]] shape — word explode joined to the
    * BROADCAST vocabulary-bounded (word → pieces) table, then ONE
    * source-keyed partial+final aggregate (the distinct-doc count rides
    * the same exchange); nothing after the explode is wider than the
    * source domain. */
  val corpusTokenizerCompression: Q =
    Q.noOracle("corpus_tokenizer_compression") { (s, d) =>
      val vocab = trained(s, d)._2
        .select(col("w"), size(col("syms")).as("n_sym"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .join(broadcast(vocab), Seq("w"))
        .groupBy("source")
        .agg(count_distinct(col("doc_id")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_words"),
          sum(octet_length(col("w"))).cast("long").as("n_bytes"),
          sum(col("n_sym")).cast("long").as("n_pieces"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_bytes"), col("n_pieces"),
          expr("(1000 * n_bytes) div n_pieces").as("bpt_milli"),
          expr("(1000 * n_pieces) div n_words").as("fertility_milli"))
    }.copy(
      eager = true, // vocab training at plan build (the bpeEncode cache)
      oracleGen = Some(() =>
        lastRefKey.flatMap(k => Option(refCache.get(k)))
          .map(a => compressionOracleSql(a._2))))

  /** Apply learned merge RULES to an arbitrary word column — true
    * tokenizer application, which unlike the vocab-table join of
    * [[bpeEncode]] also segments words never seen at training time
    * (the serving-time path). Rules fold in rank order as chained
    * Catalyst [[mergePair]] projections: merges.length nested folds, a
    * pure narrow expression — no join, no shuffle, no driver state at
    * apply time. BpeSpec proves rule application equals the trained
    * vocab lookup on every training word and degrades gracefully
    * (chars + end mark, partially merged) on unseen words. */
  private[graft] def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(
      concat(split(word, ""), array(lit(EndMark)))
    )((syms, mg) => mergePair(syms, mg.lhs, mg.rhs))

  /** Independent in-memory reference (plain Scala, no Spark) — the spec
    * oracle for [[learnMerges]]. Same tie-break, same greedy
    * left-to-right merge semantics. */
  private def mergeWord(sym: Vector[String], l: String, r: String)
      : Vector[String] =
    sym.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** In-memory rule application: fold the learned merges in rank order
    * over the character sequence — the reference counterpart of
    * [[applyMerges]], used to derive the oracle vocab. */
  private[graft] def refPieces(w: String, merges: Seq[Merge]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector :+ EndMark)(
      (sym, m) => mergeWord(sym, m.lhs, m.rhs))

  private[graft] def referenceMerges(freqs: Map[String, Long], n: Int)
      : Seq[Merge] = {
    var words = freqs.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector :+ EndMark, f)
    }
    val out = Vector.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < n && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, f) <- words; j <- 0 until sym.length - 1)
        counts((sym(j), sym(j + 1))) =
          counts.getOrElse((sym(j), sym(j + 1)), 0L) + f
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += Merge(i + 1, l, r, l + r, cnt)
        words = words.map { case (sym, f) => (mergeWord(sym, l, r), f) }
        i += 1
      }
    }
    out.result()
  }

  val all: Seq[Q] = Seq(bpeTrain, bpeEncode, corpusTokenizerCompression)
}
