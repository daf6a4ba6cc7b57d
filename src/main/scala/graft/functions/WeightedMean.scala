package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (SURVEY.md §2.11): weighted mean via
  * `Aggregator[(value, weight), (sumWX, sumW), Double]`.
  *
  * The buffer is a pair of doubles merged associatively, so Spark runs it
  * as a partial (map-side) + final aggregation — the same two-phase shape
  * as built-in sums, which is what keeps it shuffle-light at 100 TB.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  private lazy val fn = udaf(this)
  /** weighted mean of `value` with weight `weight` as an agg Column. */
  def column(value: Column, weight: Column): Column =
    fn(value.cast("double"), weight.cast("double"))
}
