package graft.plans

import graft.functions.expressions.{BloomMightContain, CosineSimilarity, DotProduct, InterleaveBits, L2Squared, MinHashSig, NearestCentroid, NgramTokens, OrderedPairs, PqAdc, ShingleHashes, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DoubleType, IntegerType, LongType}

/** SparkSessionExtensions entry point — registers the engine's native
  * expressions for SQL use:
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` and
  * `spark.sql("SELECT doc_id, sgl FROM docs LATERAL VIEW
  * shingle_hashes(text, 3) AS sgl, n_sgl")`.
  *
  * Index-geometry arguments (PQ codebooks/LUT, IVF centroids, a
  * serialized bloom filter) arrive as FOLDABLE LITERALS and are
  * evaluated once at plan build — the SQL surface mirrors how the
  * DataFrame queries inline trained artifacts, so a SQL author can run
  * the same serving plans (SqlSurfaceSpec proves bit-equality per
  * kernel and per query).
  *
  * Wire up either at session build
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`) or
  * post-hoc on an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
     builder)

  private val cosineDescriptor =
    descriptor("cosine_sim", classOf[CosineSimilarity]) { args =>
      // explicit cast: any numeric array (e.g. array<float> embeddings)
      // coerces to array<double> at the call site
      CosineSimilarity(Cast(args(0), ArrayType(DoubleType)),
                       Cast(args(1), ArrayType(DoubleType)))
    }

  private val dotDescriptor =
    descriptor("dot_product", classOf[DotProduct]) { args =>
      DotProduct(Cast(args(0), ArrayType(DoubleType)),
                 Cast(args(1), ArrayType(DoubleType)))
    }

  private val l2Descriptor =
    descriptor("l2_sq", classOf[L2Squared]) { args =>
      L2Squared(Cast(args(0), ArrayType(DoubleType)),
                Cast(args(1), ArrayType(DoubleType)))
    }

  /** Extract the generators' `n` argument: must be a foldable integral
    * literal — it shapes the generator's output schema, not the data.
    * Checks arity and foldability up front so SQL misuse fails with the
    * intended message, not an IndexOutOfBounds / unresolved-eval error. */
  private def intLiteralArg(args: Seq[Expression], fn: String,
                            maxArity: Int = 2): Int = {
    if (args.length < 2 || args.length > maxArity) {
      val arity = if (maxArity > 2) s"2 to $maxArity" else "2"
      throw new IllegalArgumentException(
        s"$fn(text, n, ...) expects $arity arguments, got ${args.length}")
    }
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

  /** Evaluate a foldable literal argument after casting it to `tpe` —
    * the route every index-geometry argument (codebooks, centroids,
    * serialized sketches) takes from SQL text into the expression's
    * plan-time constant. */
  private def literalArg(e: Expression, tpe: org.apache.spark.sql.types.DataType,
                         fn: String): Any = {
    val cast = Cast(e, tpe)
    if (!cast.foldable) throw new IllegalArgumentException(
      s"$fn: argument must be a literal, got ${e.sql}")
    val v = cast.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn: literal argument evaluated to null")
    v
  }

  private def doubles2(e: Expression, fn: String): Array[Array[Double]] = {
    val ad = literalArg(e, ArrayType(ArrayType(DoubleType)), fn)
      .asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private def doubles3(e: Expression,
                       fn: String): Array[Array[Array[Double]]] = {
    val ad = literalArg(e, ArrayType(ArrayType(ArrayType(DoubleType))), fn)
      .asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val in = ad.getArray(i)
      Array.tabulate(in.numElements())(j => in.getArray(j).toDoubleArray())
    }
  }

  private def longs2(e: Expression, fn: String): Array[Array[Long]] = {
    val ad = literalArg(e, ArrayType(ArrayType(LongType)), fn)
      .asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toLongArray())
  }

  private val shingleDescriptor =
    descriptor("shingle_hashes", classOf[ShingleHashes]) { args =>
      // optional third arg: portable = the 60-bit MD5-prefix family
      // (`shingle_hashes(text, 3, true)`), hash-compatible with the
      // dedup oracles' shingle CTEs
      ShingleHashes(args(0), intLiteralArg(args, "shingle_hashes", 3),
        portable = args.lift(2).exists(a =>
          literalArg(a, BooleanType, "shingle_hashes") == true))
    }

  private val simhashDescriptor =
    descriptor("simhash64", classOf[SimHash64]) { args =>
      // optional second arg: portable = use the 60-bit MD5-prefix hash
      // family (`simhash64(text, true)`) so SQL authors can build
      // signatures band-compatible with dedup_simhash and its oracle
      val portable = args.lift(1).exists(a =>
        literalArg(a, BooleanType, "simhash64") == true)
      SimHash64(args(0), portable)
    }

  private val orderedPairsDescriptor =
    descriptor("ordered_pairs", classOf[OrderedPairs])(args =>
      OrderedPairs(args(0)))

  private val ngramTokensDescriptor =
    descriptor("ngram_tokens", classOf[NgramTokens]) { args =>
      NgramTokens(args(0), intLiteralArg(args, "ngram_tokens"))
    }

  private val interleaveBitsDescriptor =
    descriptor("interleave_bits", classOf[InterleaveBits]) { args =>
      InterleaveBits(Cast(args(0), IntegerType), Cast(args(1), IntegerType))
    }

  private val minhashSigDescriptor =
    descriptor("minhash_sig", classOf[MinHashSig]) { args =>
      // SQL form minhash_sig(text, n): the hash family is the engine's
      // standard one (the same constants the dedup oracles inline), so SQL
      // users get signatures join-compatible with every dedup query
      MinHashSig(args(0), intLiteralArg(args, "minhash_sig"),
                 graft.operators.Dedup.MinhashAB,
                 graft.operators.Dedup.MinhashP)
    }

  private val nearestCentroidDescriptor =
    descriptor("nearest_centroid", classOf[NearestCentroid]) { args =>
      NearestCentroid(Cast(args(0), ArrayType(DoubleType)),
                      doubles2(args(1), "nearest_centroid"))
    }

  private val pqAdcDescriptor =
    descriptor("pq_adc", classOf[PqAdc]) { args =>
      PqAdc(Cast(args(0), ArrayType(DoubleType)),
            doubles3(args(1), "pq_adc"), longs2(args(2), "pq_adc"))
    }

  private type BloomBc =
    org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]

  /** Function builders run PER ANALYSIS: every `spark.sql` call — and
    * every re-analysis of a view that uses the function — re-invokes the
    * builder, so broadcasting unconditionally here would accumulate one
    * never-destroyed broadcast per parse: an unbounded driver/executor
    * memory leak in a long-lived SQL session. Broadcasts are therefore
    * memoized by (application, filter-bytes digest) in an access-ordered
    * LRU. Eviction UNPERSISTs (non-blocking) rather than destroys: a
    * cached plan or temp view analyzed against an evicted filter still
    * holds the Broadcast handle, and Spark re-ships an unpersisted
    * broadcast on next use while a destroyed one throws — eviction must
    * free executor memory without invalidating still-live plans
    * (ADVICE r7). Final reclamation is the ContextCleaner's: once the
    * LRU drops the last strong reference and no plan pins the handle,
    * the weak-reference cleaner destroys it for real. The cap is sized
    * for "many distinct trained filters live in one session";
    * SparkContext is a JVM singleton, so keying by applicationId also
    * invalidates entries across a context restart instead of serving a
    * dead broadcast. */
  private val BloomBroadcastCap = 64
  private val bloomBroadcasts =
    new java.util.LinkedHashMap[String, BloomBc](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, BloomBc]): Boolean =
        (size() > BloomBroadcastCap) && {
          // best-effort: the context owning an old entry may be stopped
          try e.getValue.unpersist(blocking = false)
          catch { case _: Exception => () }
          true
        }
    }

  private[graft] def bloomBroadcast(bytes: Array[Byte]): BloomBc = {
    val sc = SparkSession.active.sparkContext
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val key = s"${sc.applicationId}:$digest"
    bloomBroadcasts.synchronized {
      val hit = bloomBroadcasts.get(key)
      if (hit != null) hit
      else {
        val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        val bc = sc.broadcast(bloom)
        bloomBroadcasts.put(key, bc)
        bc
      }
    }
  }

  /** Live broadcast count for the leak-regression spec. */
  private[graft] def bloomBroadcastCount: Int =
    bloomBroadcasts.synchronized(bloomBroadcasts.size())

  private val bloomDescriptor =
    descriptor("bloom_might_contain", classOf[BloomMightContain]) { args =>
      // bloom_might_contain(key, bloom_bytes): the second argument is the
      // serialized filter (BloomFilter.writeTo) as a binary literal,
      // deserialized once per DISTINCT filter (memoized above) and shipped
      // as a torrent broadcast exactly like the DataFrame path — the
      // literal crosses the SQL boundary once, not per task and not per
      // re-analysis
      val bytes = literalArg(args(1), BinaryType, "bloom_might_contain")
        .asInstanceOf[Array[Byte]]
      BloomMightContain(Cast(args(0), LongType), bloomBroadcast(bytes))
    }

  private def descriptors: Seq[Descriptor] = Seq(
    cosineDescriptor, dotDescriptor, l2Descriptor, shingleDescriptor,
    simhashDescriptor, orderedPairsDescriptor, ngramTokensDescriptor,
    interleaveBitsDescriptor, minhashSigDescriptor,
    nearestCentroidDescriptor, pqAdcDescriptor, bloomDescriptor)

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}
