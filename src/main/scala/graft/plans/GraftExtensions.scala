package graft.plans

import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SparkSessionExtensions entry point — registers the engine's native
  * expressions for SQL use:
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")`.
  *
  * Wire up either at session build
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`) or
  * post-hoc on an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineDescriptor)
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

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineDescriptor._1, cosineDescriptor._2, cosineDescriptor._3)
}
