package graft.functions.expressions

import java.security.MessageDigest

/** Engine-portable 60-bit hash: the first 15 hex characters of the MD5
  * digest, read as an unsigned integer. Chosen because every SQL engine
  * with an `md5(text)` function can reproduce it exactly — e.g. DuckDB:
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` — which is what lets
  * signature-level operators (MinHash, SimHash) carry full value-equality
  * oracles instead of rows-only checks. 60 bits keeps the value strictly
  * positive in a signed 64-bit lane on every engine (no sign-extension
  * disagreements) while leaving collision odds negligible
  * (~n²/2⁶¹ — ~3e-8 for a 250k-shingle corpus).
  *
  * Slower than xxhash64 (MD5 is ~10× the cycles and allocates a digest
  * buffer), so the engine keeps BOTH: xxhash64 for oracle-free hot paths
  * (`dedup_ngram`'s posting lists only need injectivity), portable MD5
  * where cross-engine value equality buys a correctness gate.
  */
object PortableHash {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** 60-bit MD5-prefix hash of `len` bytes of `bytes` from `from`. */
  def hash60(bytes: Array[Byte], from: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, from, len)
    val out = d.digest()
    // first 15 hex chars == top 60 bits of the first 8 digest bytes
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (out(i) & 0xFFL); i += 1 }
    be >>> 4
  }

  def hash60(bytes: Array[Byte]): Long = hash60(bytes, 0, bytes.length)

  /** DuckDB expression computing the identical value for a string SQL
    * expression `e` (kept here so oracle strings cannot drift from the
    * JVM implementation). */
  def duckdbSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB mirror of [[graft.functions.TextFns.saltedHash]] — the
    * md5-prefix salted-slot idiom used by the Bernoulli/permutation
    * queries (`sample_stratified`, `corpus_mix`, `corpus_shuffle`,
    * `training_manifest`). One renderer so the SQL cannot drift from
    * the Column implementation. */
  def duckdbSaltedSql(keyExpr: String, salt: String, hexChars: Int): String =
    s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '$salt'), 1, $hexChars)) AS BIGINT)"
}
