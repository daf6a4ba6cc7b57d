package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet ingest across SCHEMA GENERATIONS — the drift every long-lived
  * dataset accumulates (a column added this quarter, an id widened from
  * int to long last year). Spark's `mergeSchema` reconciles added
  * columns but hard-fails the int→long case ("Failed to merge
  * incompatible data types"), so production readers need the explicit
  * form: read each generation as written, then reconcile to a declared
  * TARGET schema — missing columns null-fill, numeric/temporal types
  * widen via up-casts only, and any would-be NARROWING fails loudly at
  * plan time instead of silently truncating data.
  *
  * Per-generation reads keep predicate pushdown and column pruning
  * intact (each scan still reads its own physical types); the
  * reconciliation is a projection, so the union is exchange-free.
  */
object EvolvingParquet {

  /** Read the given generation directories, reconciled to `target`.
    * Up-casts only (`Cast.canUpCast` — Spark's own loss-free cast
    * lattice); a generation whose column cannot up-cast to the target
    * type is a schema regression and throws at plan time. */
  def read(spark: SparkSession, generations: Seq[String],
           target: StructType): DataFrame = {
    require(generations.nonEmpty, "no parquet generations given")
    generations.map { p =>
      val df = spark.read.parquet(p)
      val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val cols = target.fields.map { f =>
        present.get(f.name) match {
          case Some(src) if src == f.dataType => col(f.name)
          case Some(src) =>
            require(Cast.canUpCast(src, f.dataType),
              s"narrowing cast ${src.simpleString} -> " +
                s"${f.dataType.simpleString} for column ${f.name} in $p " +
                "— a schema regression, not evolution")
            col(f.name).cast(f.dataType)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
      df.select(cols.toSeq: _*)
    }.reduce(_.unionByName(_))
  }
}
