package graft

/** The front-door contract: a [[GraftSession]] session runs the engine's
  * SQL functions and queries without further setup — including when a
  * session already exists in the JVM (the post-hoc registration path).
  */
class GraftSessionSpec extends SparkSpec {

  test("GraftSession.local: native SQL functions resolve, queries run") {
    spark // force the shared session first — exercises the getOrCreate path
    val s = GraftSession.local(2)
    val one = s.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .first().getDouble(0)
    assert(one === 1.0)
    // a catalog query runs end-to-end on the session
    assert(SparkEntry.queries("count_by_project")(s, sf0001).count() > 0)
  }

  test("utcParityHolds tracks the adopted session's timezone") {
    val s = GraftSession.local(2)
    val orig = s.conf.get("spark.sql.session.timeZone", "")
    assert(orig === "UTC", "test session is configured UTC")
    assert(GraftSession.utcParityHolds(s))
    try {
      s.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(!GraftSession.utcParityHolds(s),
        "non-UTC adopted session must be detectable")
    } finally s.conf.set("spark.sql.session.timeZone", orig)
  }
}
