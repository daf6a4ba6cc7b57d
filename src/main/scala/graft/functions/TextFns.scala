package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels (builder-prompt text-analysis family). */
object TextFns {

  /** Polynomial rolling hash over the token stream:
    * h = Σ hash(tokᵢ)·31^(n-1-i) mod M, with M = 2³¹−1 so every
    * intermediate stays far below Long range (ANSI mode — the default in
    * Spark 4 — turns silent Long wrap-around into a runtime error).
    * Order-sensitive — complements the order-insensitive bag-of-words
    * md5 fingerprint in `text_fingerprint`. Pure fold, no shuffle.
    */
  private val M = 2147483647L // 2^31 - 1 (Mersenne prime)
  def rollingHash(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), lit(M)), lit(M)))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic salted hash value from an md5 prefix — the ONE
    * portable-Bernoulli/permutation primitive behind `sample_stratified`,
    * `corpus_mix`, and `corpus_shuffle` (each pairs it with its own
    * DuckDB mirror `('0x' || substr(md5(key || salt), 1, hexChars))::BIGINT`).
    * `hexChars` ≤ 15 keeps the value in positive Long range. Inclusion/
    * ordering decisions built on it are pure functions of (key, salt):
    * stable under repartitioning, retries, and appends. */
  def saltedHash(key: Column, salt: String, hexChars: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))
      .cast("binary")), 1, hexChars), 16, 10).cast("long")
}
