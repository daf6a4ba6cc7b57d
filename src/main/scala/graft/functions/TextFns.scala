package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels (builder-prompt text-analysis family). */
object TextFns {

  /** Polynomial rolling hash over the token stream:
    * h = Σ xxhash64(tokᵢ)·31^(n-1-i) (mod 2⁶⁴, via Long overflow).
    * Order-sensitive — complements the order-insensitive bag-of-words
    * md5 fingerprint in `text_fingerprint`. Pure fold, no shuffle.
    */
  def rollingHash(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => acc * 31L + xxhash64(t))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")
}
