package graft.plans

import graft.functions.expressions.{CosineSimilarity, InterleaveBits, MinHashSig, NgramTokens, OrderedPairs, ShingleHashes, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** SparkSessionExtensions entry point — registers the engine's native
  * expressions for SQL use:
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` and
  * `spark.sql("SELECT doc_id, sgl FROM docs LATERAL VIEW
  * shingle_hashes(text, 3) AS sgl, n_sgl")`.
  *
  * Wire up either at session build
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`) or
  * post-hoc on an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.shingleDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.orderedPairsDescriptor)
    ext.injectFunction(GraftExtensions.ngramTokensDescriptor)
    ext.injectFunction(GraftExtensions.interleaveBitsDescriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
  }
}

object GraftExtensions {
  private val cosineDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    // explicit cast: any numeric array (e.g. array<float> embeddings)
    // coerces to array<double> at the call site
    (args: Seq[Expression]) => CosineSimilarity(
      Cast(args(0), ArrayType(DoubleType)),
      Cast(args(1), ArrayType(DoubleType))))

  /** Extract the generators' `n` argument: must be a foldable integral
    * literal — it shapes the generator's output schema, not the data.
    * Checks arity and foldability up front so SQL misuse fails with the
    * intended message, not an IndexOutOfBounds / unresolved-eval error. */
  private def intLiteralArg(args: Seq[Expression], fn: String): Int = {
    if (args.length != 2) throw new IllegalArgumentException(
      s"$fn(text, n) expects 2 arguments, got ${args.length}")
    if (!args(1).foldable) throw new IllegalArgumentException(
      s"$fn(text, n): n must be an integer literal, got ${args(1).sql}")
    args(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn(text, n): n must be an integer literal, got $other")
    }
  }

  private val shingleDescriptor = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (args: Seq[Expression]) =>
      ShingleHashes(args(0), intLiteralArg(args, "shingle_hashes")))

  private val simhashDescriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (args: Seq[Expression]) => SimHash64(args(0)))

  private val orderedPairsDescriptor = (
    FunctionIdentifier("ordered_pairs"),
    new ExpressionInfo(classOf[OrderedPairs].getName, "ordered_pairs"),
    (args: Seq[Expression]) => OrderedPairs(args(0)))

  private val ngramTokensDescriptor = (
    FunctionIdentifier("ngram_tokens"),
    new ExpressionInfo(classOf[NgramTokens].getName, "ngram_tokens"),
    (args: Seq[Expression]) =>
      NgramTokens(args(0), intLiteralArg(args, "ngram_tokens")))

  private val interleaveBitsDescriptor = (
    FunctionIdentifier("interleave_bits"),
    new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
    (args: Seq[Expression]) => InterleaveBits(
      Cast(args(0), IntegerType), Cast(args(1), IntegerType)))

  private val minhashSigDescriptor = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    // SQL form minhash_sig(text, n): the hash family is the engine's
    // standard one (the same constants the dedup oracles inline), so SQL
    // users get signatures join-compatible with every dedup query
    (args: Seq[Expression]) => MinHashSig(
      args(0), intLiteralArg(args, "minhash_sig"),
      graft.operators.Dedup.MinhashAB, graft.operators.Dedup.MinhashP))

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    Seq(cosineDescriptor, shingleDescriptor, simhashDescriptor,
        orderedPairsDescriptor, ngramTokensDescriptor,
        interleaveBitsDescriptor, minhashSigDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
  }
}
