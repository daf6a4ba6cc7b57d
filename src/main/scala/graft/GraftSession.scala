package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession wired the way this engine
  * expects — native SQL functions registered
  * ([[graft.plans.GraftExtensions]]: `cosine_sim`, `shingle_hashes`,
  * `simhash64`, `minhash_sig`, …), UTC session time, shuffle parallelism
  * sized to the machine. A user switching from the reference calls
  * [[local]] (or applies [[configure]] to their own cluster builder) and
  * every `SparkEntry.queries` entry and SQL function works unchanged.
  */
object GraftSession {

  /** Apply the engine's session settings to any builder (cluster
    * deployments pass their own master/resources). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session sized to the machine. If the JVM already has a
    * session it is ADOPTED as-is (functions registered post-hoc, no
    * conf changes — `getOrCreate` would silently push this builder's
    * runtime confs onto it, stomping the owner's settings); a fresh JVM
    * gets a fully configured one. Registration is idempotent.
    *
    * Adoption caveat: catalog queries assume UTC session time
    * (`date_trunc`, window, and unix_millis parity all depend on it). An
    * adopted non-UTC session keeps its timezone — the owner set it — but
    * [[local]] logs a loud warning, and [[utcParityHolds]] exposes the
    * check so callers can decide (set
    * `spark.conf.set("spark.sql.session.timeZone", "UTC")` — a runtime
    * conf — to opt in). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(
        configure(SparkSession.builder()
            .master(s"local[$cores]")
            .config("spark.sql.shuffle.partitions", cores.toString))
          .getOrCreate())
    graft.plans.GraftExtensions.register(s)
    if (!utcParityHolds(s))
      System.err.println(
        "[graft] WARNING: adopted session timeZone is " +
          s"'${s.conf.get("spark.sql.session.timeZone", "<unset>")}', not " +
          "UTC — timestamp-bucketing queries (date_trunc, windows, " +
          "unix_millis parity) will follow the session zone. Set " +
          "spark.sql.session.timeZone=UTC for engine-default semantics.")
    s
  }

  /** True when the session's timezone matches the engine's UTC
    * assumption — the precondition for timestamp-parity of the catalog
    * queries on an adopted session. */
  def utcParityHolds(s: SparkSession): Boolean =
    s.conf.get("spark.sql.session.timeZone", "") == "UTC"
}
