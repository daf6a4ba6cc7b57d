package graft

import graft.operators.Bpe

/** The BPE trainer has no ANSI-SQL oracle (the merge loop is inherently
  * iterative), so the distributed implementation is proven EXACTLY equal
  * to an independent in-memory reference ([[Bpe.referenceMerges]]) — on a
  * handcrafted fixture with known merges and on the real sf0.001 corpus.
  */
class BpeSpec extends SparkSpec {

  private def sparkMerges(freqs: Map[String, Long]): Seq[Bpe.Merge] = {
    import spark.implicits._
    val words = freqs.toSeq.toDF("w", "freq")
    Bpe.learnMerges(words, Bpe.NMerges)._1
  }

  test("learned merges match the in-memory reference on a known fixture") {
    // the classic BPE walkthrough corpus (Sennrich et al. §3 shape)
    val freqs = Map[String, Long](
      "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val got = sparkMerges(freqs)
    val want = Bpe.referenceMerges(freqs, Bpe.NMerges)
    assert(got == want)
    // spot-check the textbook first merges: (e,s) 9, then (es,t) 9
    assert(got.head.lhs == "e" && got.head.rhs == "s" &&
           got.head.n_pairs == 9L)
    assert(got(1).merged == "est" && got(1).n_pairs == 9L)
  }

  test("greedy merge is left-to-right non-overlapping (xxx under (x,x))") {
    val freqs = Map[String, Long]("xxx" -> 1)
    val got = sparkMerges(freqs).head
    // pairs in "x x x </w>": (x,x) twice but only ONE merge fits
    // left-to-right; the winning count still reports both occurrences
    assert((got.lhs, got.rhs, got.n_pairs) == (("x", "x", 2L)))
    val want = Bpe.referenceMerges(freqs, Bpe.NMerges)
    assert(sparkMerges(freqs) == want)
  }

  test("distributed trainer equals reference on the real corpus") {
    val wf = Bpe.wordFreq(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.bpeTrain.fn(spark, sf0001).collect().map(r =>
      Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2),
                r.getString(3), r.getLong(4)))
    val want = Bpe.referenceMerges(wf, Bpe.NMerges)
    assert(got.toSeq == want)
    assert(got.length == Bpe.NMerges, "corpus is rich enough for all rounds")
    // ranks are 1..N and merged symbols strictly grow the vocab
    assert(got.map(_.rank).toSeq == (1 to Bpe.NMerges))
    assert(got.map(_.merged).distinct.length == got.length)
  }

  test("rule application equals vocab lookup on training words, handles unseen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (merges, vocab) = Bpe.learnMerges(Bpe.wordFreq(spark, sf0001),
                                          Bpe.NMerges)
    // every training word: folding the merge rules over raw characters
    // must reproduce the trained symbol sequence exactly
    val mismatch = vocab
      .withColumn("applied", Bpe.applyMerges(col("w"), merges))
      .filter(col("applied") =!= col("syms")).count()
    assert(mismatch === 0L)
    // an UNSEEN word still segments: known subword merges apply where
    // they match, leftover characters stay atomic
    val unseen = Seq("zzqueryzz").toDF("w")
      .select(Bpe.applyMerges(col("w"), merges).as("syms"))
      .collect()(0).getSeq[String](0)
    assert(unseen.last.endsWith(Bpe.EndMark))
    assert(unseen.mkString == "zzqueryzz" + Bpe.EndMark,
      "segmentation must preserve the word's characters in order")
  }

  test("soak: 1000-merge run equals the reference, lineage stays bounded") {
    // NMerges=12 is the demonstration size; this proves the SAME loop
    // (checkpoint-every-8 lineage bound, argmax tie-break, fold rewrite)
    // holds at a realistic merge count. Vocabulary capped to the top
    // words by weight so the in-memory reference stays tractable.
    import spark.implicits._
    val N = 1000
    // the synthetic corpus has only 31 distinct words (every SF) and
    // fully fuses after ~105 merges, so the soak vocabulary is the
    // corpus words compounded pairwise — 961 deterministic words with
    // freq = f(a)·f(b), rich enough to sustain 1000+ rounds
    val base = Bpe.wordFreq(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (w, f) => (-f, w) }
    val wf = (for ((wa, fa) <- base; (wb, fb) <- base)
      yield s"${wa}_$wb" -> fa * fb).toMap
    val words = wf.toSeq.toDF("w", "freq")
    val (got, vocab) = Bpe.learnMerges(words, N)
    val want = Bpe.referenceMerges(wf, N)
    assert(got.length == N,
      s"vocabulary exhausted after ${got.length} merges — widen the cap")
    // exact equality, all 1000 rounds — rank, pair, merged, count
    assert(got == want)
    // the checkpoint cadence must keep the final vocab's plan shallow:
    // at most the post-checkpoint residue of fold projections, never a
    // 1000-round lineage chain
    val planNodes = vocab.queryExecution.optimizedPlan.collect { case n => n }
    assert(planNodes.length <= 16,
      s"vocab lineage grew to ${planNodes.length} nodes — checkpoint broken")
  }

  test("encode fertility is consistent with the trained vocab") {
    val enc = Bpe.bpeEncode.fn(spark, sf0001).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (nWords, nPieces, fert) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      // every word is at least one piece, at most chars+1 (worst case no
      // merges applied: letters + the end mark)
      assert(nPieces >= nWords)
      assert(math.abs(fert - nPieces.toDouble / nWords) < 1e-12)
    }
    // fertility must beat the untrained worst case on average: merges
    // exist, so SOME words compress below chars+1
    val vocab = Bpe.learnMerges(Bpe.wordFreq(spark, sf0001), Bpe.NMerges)._2
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).length)
    assert(vocab.exists { case (w, n) => n < w.length + 1 },
      "no word compressed — merges not applied to the vocab table")
  }
}
