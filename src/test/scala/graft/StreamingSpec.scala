package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming execution of the shared transforms: MemoryStream →
  * transform → memory sink, asserted equal to the batch run of the same
  * transform on the same rows (SURVEY.md §5 item 4), plus a
  * watermark/late-data case.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val rows = Seq(
    Ev(1, ts(0), 1, "click", 1.0, "{}"),
    Ev(2, ts(1), 1, "click", 2.0, "{}"),
    Ev(3, ts(11), 1, "click", 3.0, "{}"),   // next tumbling window
    Ev(4, ts(2), 2, "buy", 10.0, "{}"),
    Ev(5, ts(8), 2, "buy", 20.0, "{}"),     // 6-min gap: new session for u2
    Ev(6, ts(12, 30), 2, "buy", 30.0, "{}"))

  private def runStream(transform: DataFrame => DataFrame,
                        outputMode: String = "complete",
                        data: Seq[Ev] = rows): Array[org.apache.spark.sql.Row] = {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(data)
    val name = s"sink_${System.nanoTime()}"
    val q = transform(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).collect()
  }

  private def sorted(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toString).sorted.toSeq

  test("tumbling windows: streaming == batch on the same data") {
    val spark2 = spark
    import spark2.implicits._
    val batch = Streams.tumbling(rows.toDF()).collect()
    val stream = runStream(Streams.tumbling)
    assert(sorted(stream) === sorted(batch))
    // window contents sanity: first u1 window has 2 clicks
    assert(batch.exists(r => r.getAs[Long]("n") == 2 &&
      r.getAs[String]("event_type") == "click"))
  }

  test("hopping windows: streaming == batch, each event in two windows") {
    val spark2 = spark
    import spark2.implicits._
    val batch = Streams.hopping(rows.toDF()).collect()
    val stream = runStream(Streams.hopping)
    assert(sorted(stream) === sorted(batch))
    assert(batch.map(_.getAs[Long]("n")).sum === 2L * rows.size)
  }

  test("session windows: streaming == batch; 6-min gap splits the session") {
    val spark2 = spark
    import spark2.implicits._
    val batch = Streams.session(rows.toDF()).collect()
    val stream = runStream(Streams.session)
    assert(sorted(stream) === sorted(batch))
    val u2 = batch.filter(_.getAs[Long]("user_id") == 2)
    assert(u2.length === 2, s"expected 2 sessions for user 2, got ${u2.toSeq}")
  }

  test("writeStream parquet file sink with watermarked append aggregation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = mem.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      // advance watermark so all earlier windows close and flush to files
      mem.addData(Seq(Ev(99, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "x", 0.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val persisted = spark.read.parquet(out)
    assert(persisted.count() >= 3, "closed windows should be flushed")
    val clicks = persisted.filter("event_type = 'click'")
      .agg(sum("n")).collect()(0).getLong(0)
    assert(clicks === 3L)
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, UserEvent, UserTotal}
    val mem = MemoryStream[UserEvent]
    val name = s"state_${System.nanoTime()}"
    val q = Streams.runningTotals(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      mem.addData(Seq(UserEvent(1, 10.0), UserEvent(1, 5.0), UserEvent(2, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(UserEvent(1, 2.5)))
      q.processAllAvailable()
      val byBatchLast = spark.table(name).as[UserTotal].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
      assert(byBatchLast(1L) === UserTotal(1, 3, 17.5)) // state carried over
      assert(byBatchLast(2L) === UserTotal(2, 1, 1.0))
    } finally q.stop()
  }

  test("foreachBatch CDC apply: streamed upserts merge into the Store") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Store
    val root = java.nio.file.Files.createTempDirectory("store-cdc").toString
    val store = new Store(root)
    // bootstrap full load, then stream changes — real CDC onboarding
    store.put(Seq(("aced-a", "Patient", "p1", 1L), ("aced-a", "Patient", "p2", 1L))
      .toDF("project_id", "resource_type", "id", "ver"))
    val mem = MemoryStream[(String, String, String, Long)]
    val q = graft.streaming.Streams.upsertStream(
      mem.toDF().toDF("project_id", "resource_type", "id", "ver"),
      store, "aced-a", "id")
    def state(): Map[String, Long] =
      store.readProject(spark, "aced-a").select("id", "ver").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      mem.addData(Seq(("aced-a", "Patient", "p1", 2L)))
      q.processAllAvailable()
      assert(state() === Map("p1" -> 2L, "p2" -> 1L), "update lands, rest intact")
      mem.addData(Seq(("aced-a", "Patient", "p2", 2L),
                      ("aced-a", "Patient", "p3", 1L)))
      q.processAllAvailable()
      assert(state() === Map("p1" -> 2L, "p2" -> 2L, "p3" -> 1L),
        "second batch updates p2 and inserts p3")
    } finally q.stop()
  }

  test("streaming ohlc bars equal the batch aggregate, bars span batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, OhlcEvent, OhlcBar}
    def at(h: Int, min: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    // u1's 10:00 bar spans both micro-batches; u2 opens a second bar in
    // hour 11; values are 2-decimal-exact so the DECIMAL(18,2) volume
    // route is bit-comparable
    val b1 = Seq(OhlcEvent(1, at(10, 5), 10.25), OhlcEvent(1, at(10, 1), 9.50),
                 OhlcEvent(2, at(10, 30), 100.75))
    val b2 = Seq(OhlcEvent(1, at(10, 50), 12.00), OhlcEvent(2, at(11, 10), 99.25),
                 OhlcEvent(2, at(10, 45), 101.00))
    // sentinel far in the future pushes the watermark past every hour
    // end so all real bars close and emit
    val sentinel = Seq(OhlcEvent(99, at(20, 0), 1.0))
    val mem = MemoryStream[OhlcEvent]
    val name = s"ohlc_${System.nanoTime()}"
    val q = Streams.ohlcBars(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(sentinel); q.processAllAvailable()
      // one more empty-ish nudge so the timeout fires after the watermark
      // advanced past the hour ends
      mem.addData(Seq(OhlcEvent(99, at(21, 0), 1.0))); q.processAllAvailable()
      spark.table(name).as[OhlcBar].collect().toSet
        .filter(_.user_id != 99L)
    } finally q.stop()
    // batch oracle: the ohlc_bars aggregate on the same rows
    val want = (b1 ++ b2).toDF("user_id", "ts", "value")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
           min_by(col("value"), col("ts")).as("open"),
           max(col("value")).as("high"), min(col("value")).as("low"),
           max_by(col("value"), col("ts")).as("close"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("volume"))
      .as[OhlcBar].collect().toSet
    assert(got === want)
    // the cross-batch bar really merged: u1's hour-10 bar has all 3 events
    assert(got.exists(b => b.user_id == 1 && b.n == 3 &&
      b.open == 9.50 && b.close == 12.00 && b.high == 12.00 && b.low == 9.50))
  }

  test("running source signatures equal the batch mins across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, ShingleObs, SourceSig}
    import graft.operators.Dedup.{MinhashAB, MinhashP}
    // deterministic shingle hashes split across two micro-batches, with a
    // replayed duplicate (idempotence) and a cross-batch min for src "a"
    val rnd = new scala.util.Random(7)
    val b1 = Seq.fill(40)(ShingleObs(if (rnd.nextBoolean()) "a" else "b",
                                     rnd.nextLong().abs % (1L << 60)))
    val b2 = Seq.fill(40)(ShingleObs(if (rnd.nextBoolean()) "a" else "b",
                                     rnd.nextLong().abs % (1L << 60))) ++
      b1.take(3) // replay
    val mem = MemoryStream[ShingleObs]
    val name = s"sig_${System.nanoTime()}"
    val q = Streams.sourceSignatures(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      // Update mode: the LAST emitted row per source is the final state
      spark.table(name).as[SourceSig].collect()
        .zipWithIndex.groupBy(_._1.source)
        .map { case (s, rows) => s -> rows.maxBy(_._2)._1.sig }
    } finally q.stop()
    // batch oracle: componentwise affine mins over ALL rows, plain Scala
    val want = (b1 ++ b2).groupBy(_.source).map { case (s, os) =>
      s -> MinhashAB.map { case (a, b) =>
        os.map(o => (a * (o.sgl % MinhashP) + b) % MinhashP).min
      }.toSeq
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (s, sig) =>
      assert(sig === want(s), s"source $s signature diverged")
    }
  }

  test("streaming retention edges aggregate to the batch cohort table") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, RetEvent, RetEdge}
    def day(d: Int, h: Int = 9): Timestamp =
      Timestamp.valueOf(f"2024-01-${d + 1}%02d $h%02d:00:00")
    // u1: cohort day 0, active days 0,1,3 (day 1 twice — must dedup,
    // once per batch — and once more ACROSS batches); u2: cohort day 1,
    // active days 1, 9 (beyond the 7-day horizon — dropped)
    val b1 = Seq(RetEvent(1, day(0)), RetEvent(1, day(1, 8)),
                 RetEvent(1, day(1, 17)), RetEvent(2, day(1)))
    val b2 = Seq(RetEvent(1, day(1, 12)), RetEvent(1, day(3)),
                 RetEvent(2, day(9)))
    val mem = MemoryStream[RetEvent]
    val name = s"ret_${System.nanoTime()}"
    val q = Streams.retentionEdges(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val edges = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table(name).as[RetEdge].collect().toSeq
    } finally q.stop()
    // exactly one edge per (user, active day within horizon)
    assert(edges.length === edges.distinct.length)
    // the downstream cohort table: count per (cohort_day, day_offset)
    val got = edges.groupBy(e => (e.cohort_day.toString, e.day_offset))
      .map { case (k, es) => (k._1, k._2, es.length.toLong) }.toSet
    // batch oracle: retention_cohort's plan on the same rows
    val all = (b1 ++ b2).toDF("user_id", "ts")
    val act = all.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val coh = act.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    val want = act.join(coh, Seq("user_id"))
      .select(col("cohort_day"), datediff(col("d"), col("cohort_day")).as("off"))
      .filter(col("off") <= 7)
      .groupBy("cohort_day", "off").agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, Int, Long)].collect()
      .map(t => (t._1.toString, t._2, t._3)).toSet
    assert(got === want)
    // the cross-batch dedup really happened: u1 day 1 appears once
    assert(edges.count(e => e.user_id == 1 && e.day_offset == 1) === 1)
  }

  test("stateful transitions match the batch lead window, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, TransEvent, Transition}
    // per-user in-order feed, split so u1's and u2's chains SPAN the
    // micro-batch boundary (the state handoff under test); u2's batch-2
    // events share ONE timestamp — event_id must break the tie the same
    // way the batch window's (ts, event_id) order does
    val b1 = Seq(TransEvent(1, ts(0), "click", 10), TransEvent(1, ts(1), "view", 11),
                 TransEvent(2, ts(2), "buy", 12))
    val b2 = Seq(TransEvent(1, ts(5), "buy", 13), TransEvent(2, ts(8), "click", 14),
                 TransEvent(2, ts(8), "buy", 15))
    val mem = MemoryStream[TransEvent]
    val name = s"trans_${System.nanoTime()}"
    val q = Streams.transitions(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table(name).as[Transition].collect().toSet
    } finally q.stop()
    // batch oracle: the same lead window the event_transitions query uses
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val want = (b1 ++ b2).toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_ms",
        lead(unix_millis(col("ts")), 1).over(w) - unix_millis(col("ts")))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("to_type"), col("gap_ms"))
      .as[(Long, String, String, Long)].collect()
      .map(t => Transition(t._1, t._2, t._3, t._4)).toSet
    assert(got === want)
    // the boundary-spanning edges are present (state carried over)
    assert(got.contains(Transition(1, "view", "buy",
      ts(5).getTime - ts(1).getTime)))
    assert(got.contains(Transition(2, "buy", "click",
      ts(8).getTime - ts(2).getTime)))
  }

  test("streaming rolling correlation equals the batch frame, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, CorrBucket, CorrOut}
    def hr(k: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        k * 3600000L)
    // window = 4; the boundary splits a warm window (buckets 0-3 in b1,
    // 4-6 in b2 — windows ending at 4, 5, 6 straddle state); includes a
    // constant-x window (buckets 3-6 all x=7) exercising the null-r arm
    val xsv = Seq(1L, 4L, 2L, 7L, 7L, 7L, 7L)
    val ysv = Seq(3L, 1L, 5L, 2L, 8L, 2L, 4L)
    val all = (0 until 7).map(k => CorrBucket(0L, hr(k), xsv(k), ysv(k)))
    val (b1, b2) = (all.take(4), all.drop(4))
    val mem = MemoryStream[CorrBucket]
    val name = s"rcorr_${System.nanoTime()}"
    val q = Streams.rollingCorr(mem.toDS(), window = 4).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table(name).as[CorrOut].collect()
        .map(c => (c.bkt, c.x, c.y, Option(c.r).map(_.doubleValue))).toSet
    } finally q.stop()
    // batch oracle: the ts_rolling_corr frame on the same buckets
    val f = org.apache.spark.sql.expressions.Window
      .partitionBy("series_id").orderBy("bkt")
      .rowsBetween(-3, org.apache.spark.sql.expressions.Window.currentRow)
    val want = all.toDF("series_id", "bkt", "x", "y")
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("x")).over(f))
      .withColumn("sy", sum(col("y")).over(f))
      .withColumn("sxx", sum(col("x") * col("x")).over(f))
      .withColumn("syy", sum(col("y") * col("y")).over(f))
      .withColumn("sxy", sum(col("x") * col("y")).over(f))
      .filter(col("n") === 4)
      .select(col("bkt"), col("x"), col("y"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          expr("""nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)), 0)"""))
          .as("r"))
      .as[(java.sql.Timestamp, Long, Long, Option[Double])].collect().toSet
    assert(got === want) // exact ==, doubles must match bit-for-bit
    // boundary-straddling window emitted; constant-x window gave null r
    assert(got.exists(t => t._1 == hr(4)))
    assert(got.exists(t => t._1 == hr(6) && t._4.isEmpty))
  }

  test("streaming interpolation is BIT-equal to the batch plan, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, SeriesPoint, InterpRow}
    def hr(k: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        k * 3600000L)
    // u1's 3-hour gap SPANS the micro-batch boundary (left endpoint in
    // b1, right endpoint in b2 — the state handoff under test); values
    // chosen so v0+(v1-v0)*frac is NOT exactly representable, making
    // the bit-equality assertion meaningful
    val b1 = Seq(SeriesPoint(1, hr(0), 0.1), SeriesPoint(2, hr(0), 5.0),
                 SeriesPoint(2, hr(2), 6.7))
    val b2 = Seq(SeriesPoint(1, hr(3), 0.7), SeriesPoint(1, hr(4), 1.3))
    val mem = MemoryStream[SeriesPoint]
    val name = s"interp_${System.nanoTime()}"
    val q = Streams.interpolated(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table(name).as[InterpRow].collect().toSet
    } finally q.stop()
    // batch oracle: resample_interp's core on the same series rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bkt")
    val hour = expr("INTERVAL 1 HOUR")
    val series = (b1 ++ b2).toDF("user_id", "bkt", "v")
    val led = series
      .withColumn("b1", lead(col("bkt"), 1).over(w))
      .withColumn("v1", lead(col("v"), 1).over(w))
    val gaps = led
      .filter(col("b1").isNotNull && col("b1") > col("bkt") + hour)
      .select(col("user_id"),
        explode(sequence(col("bkt") + hour, col("b1") - hour, hour))
          .as("bucket"),
        col("bkt").as("b0"), col("v").as("v0"), col("b1"), col("v1"))
      .select(col("user_id"), col("bucket"), lit(0).as("observed"),
        (col("v0") + (col("v1") - col("v0")) *
          ((unix_millis(col("bucket")) - unix_millis(col("b0")))
            .cast("double") /
           (unix_millis(col("b1")) - unix_millis(col("b0")))
            .cast("double"))).as("v_interp"))
    val want = series
      .select(col("user_id"), col("bkt").as("bucket"),
        lit(1).as("observed"), col("v").as("v_interp"))
      .unionAll(gaps)
      .as[InterpRow].collect().toSet
    assert(got === want) // exact ==, so doubles must match BIT-for-bit
    // the boundary-spanning gap really interpolated: u1 hours 1 and 2
    // materialized only after hr(3) arrived in batch 2
    assert(got.count(r => r.user_id == 1 && r.observed == 0) === 2)
    assert(got.exists(r => r.user_id == 2 && r.observed == 0 &&
      r.bucket == hr(1)))
  }

  test("streaming SCD2 closed rows equal the batch history, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, TransEvent, Scd2Closed}
    // u1's attr change chain SPANS the micro-batch boundary (interval
    // opened in batch 1 closes in batch 2); u2 has an equal-ts mutation
    // pair — event_id must order it like the batch window; u1's repeat
    // at ts(1) must be absorbed, not open a new version
    val b1 = Seq(TransEvent(1, ts(0), "bronze", 10),
                 TransEvent(1, ts(1), "bronze", 11),
                 TransEvent(2, ts(2), "basic", 12))
    val b2 = Seq(TransEvent(1, ts(5), "silver", 13),
                 TransEvent(1, ts(6), "gold", 14),
                 TransEvent(2, ts(8), "plus", 15),
                 TransEvent(2, ts(8), "pro", 16))
    val mem = MemoryStream[TransEvent]
    val name = s"scd2_${System.nanoTime()}"
    val q = Streams.scd2Closed(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      spark.table(name).as[Scd2Closed].collect().toSet
    } finally q.stop()
    // batch oracle: the scd2_history plan on the same rows, closed set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val want = (b1 ++ b2).toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("attr"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        row_number().over(w).cast("long").as("version"))
      .filter(col("valid_to").isNotNull)
      .as[Scd2Closed].collect().toSet
    assert(got === want)
    // the boundary-spanning close happened with the absorbed repeat:
    // u1 bronze [ts0, ts5) version 1, closed only when silver arrived
    assert(got.contains(Scd2Closed(1, "bronze", ts(0), ts(5), 1)))
    // equal-ts mutations ordered by event_id: basic closes at ts8 by plus
    assert(got.contains(Scd2Closed(2, "basic", ts(2), ts(8), 1)))
    assert(got.contains(Scd2Closed(2, "plus", ts(8), ts(8), 2)))
  }

  test("streaming drift: composed KS equals the batch census, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val split = "2024-01-01 10:05:00" // splits the fixture 3 / 3
    val df = rows.toDF()
    val batchOut = sorted(graft.operators.Pipeline
      .ksCompose(graft.operators.Pipeline.driftCounts(df, split)).collect())
    // stream the CURRENT side in two micro-batches (state must carry the
    // first batch's bin counts across the boundary)
    val mem = MemoryStream[Ev]
    val (early, late) = rows.partition(_.event_id <= 3)
    val name = s"drift_${System.nanoTime()}"
    val q = Streams.driftBinCounts(mem.toDF(), split).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      mem.addData(early); q.processAllAvailable()
      mem.addData(late); q.processAllAvailable()
    } finally q.stop()
    val cur = spark.table(name)
    // reference histogram is precomputed (batch) — join and zero-fill the
    // bins only one side occupies, then the SAME ksCompose
    val ref = df.filter(col("ts") < lit(split).cast("timestamp"))
      .select(col("event_type"),
        least(floor(col("value")).cast("long"), lit(499L)).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("ca"))
    val c = ref.join(cur, Seq("event_type", "bin"), "full_outer")
      .select(col("event_type"), col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val streamOut = sorted(graft.operators.Pipeline.ksCompose(c).collect())
    assert(streamOut === batchOut)
    assert(batchOut.nonEmpty)
  }

  test("streaming attribution credits aggregate to the batch census") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AttrEvent, AttrCredit}
    val batch = graft.operators.Streaming.attributionLastclick
      .fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (unix_millis(col("ts")) * 1000 +
          get_json_object(col("props"), "$.k").cast("long")).as("ck"),
        col("value"))
      .as[AttrEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // click→purchase chains must survive the micro-batch boundary
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[AttrEvent]
    val name = s"attr_${System.nanoTime()}"
    val q = Streams.attributionCredits(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // the campaign census is a plain aggregate over the credit stream;
    // revenue compares through the batch plan's exact DECIMAL route
    val stream = spark.table(name).as[AttrCredit]
      .groupBy("campaign")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("rev"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stream === batch,
      "per-purchase CEP credits must aggregate to the batch window census")
  }

  test("streaming linear attribution aggregates to the batch census") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AttrLinEvent, AttrLinCredit}
    val batch = graft.operators.Streaming.attributionLinear
      .fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (get_json_object(col("props"), "$.k").cast("long") % 4)
          .as("campaign"))
      .as[AttrLinEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // click→purchase chains must survive the micro-batch boundary
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[AttrLinEvent]
    val name = s"attrlin_${System.nanoTime()}"
    val q = Streams.attributionLinearCredits(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // the campaign census is a plain exact-BIGINT aggregate over the
    // credit stream; credit_usd repeats the batch cast/divide op order
    val stream = spark.table(name).as[AttrLinCredit]
      .groupBy("campaign")
      .agg(sum(col("new_clicks")).as("n_clicks_credited"),
        sum(col("credit_microcents")).as("mc"),
        (sum(col("credit_microcents")).cast("double") / lit(100000000))
          .as("usd"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(stream === batch,
      "bounded-state CEP credits must aggregate to the batch suffix-sum census")
  }

  test("streaming funnel automaton equals the batch converted set") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{FunnelEvent, FunnelConv}
    // Append mode emits immutable facts: the stream is exactly the batch
    // plan's converted=true set (open/not-converted users live in state,
    // the scd2Closed closed-vs-open split)
    val batch = graft.operators.Streaming.funnel.fn(spark, sf0001).collect()
      .filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .toSet
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[FunnelEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // signup→purchase chains must survive the micro-batch boundary
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[FunnelEvent]
    val name = s"funnel_${System.nanoTime()}"
    val q = Streams.funnelConversions(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name).as[FunnelConv].collect()
      .map(c => (c.user_id, c.signup_ts, c.purchase_ts)).toSet
    assert(stream === batch,
      "O(1)-state automaton must equal the batch aggregate-then-join plan")
  }

  test("streaming ewma is bit-equal to the batch recurrence, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EwmaEvent, EwmaOut}
    val batch = graft.operators.TimeSeries.tsEwma.fn(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.asDouble(Tables.money(col("value"))).as("v"))
      .as[EwmaEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // split mid-stream: recurrences straddle the micro-batch boundary
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[EwmaEvent]
    val name = s"ewma_${System.nanoTime()}"
    val q = Streams.ewma(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name).as[EwmaOut].collect()
    assert(stream.length === evs.length)
    // java.lang.Double equality — bit-exact, no tolerance
    stream.foreach(o =>
      assert(o.ewma == batch((o.user_id, o.event_id)),
        s"user ${o.user_id} event ${o.event_id}"))
  }

  test("streaming pattern match equals the batch window plan, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{PatEvent, PatMatch}
    val batch = graft.operators.Streaming.patternSeq.fn(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
                 r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[PatEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // split mid-stream: per-user order is preserved (global ts order),
    // and chains straddling the boundary must still match
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[PatEvent]
    val name = s"pat_${System.nanoTime()}"
    val q = Streams.patternMatches(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name).as[PatMatch].collect()
      .map(m => (m.user_id, m.event_id, m.purchase_ts, m.click_ts,
                 m.view_ts))
      .toSet
    assert(stream === batch,
      "incremental automaton must equal the batch running-max plan")
  }

  test("streaming journey completion equals the batch len=5 paths, across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{PatEvent, UserPath}
    import org.apache.spark.sql.expressions.Window
    // batch truth: the event_paths per-user frame, restricted to users
    // whose journey COMPLETED (five events) — the twin's emission set
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_join(
             transform(array_sort(collect_list(struct(col("rn"),
                         col("event_type")))),
                       x => x.getField("event_type")), ">").as("path"),
           count(lit(1)).as("len"))
      .filter(col("len") === 5)
      .select(col("user_id"), col("path"))
      .as[(Long, String)].collect().toSet
    assert(batch.nonEmpty)
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[PatEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    // split mid-stream: journeys straddling the boundary must complete
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[PatEvent]
    val name = s"jp_${System.nanoTime()}"
    val q = Streams.journeyPaths(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name).as[UserPath].collect()
      .map(p => (p.user_id, p.path)).toSet
    assert(stream === batch,
      "completion-time emission must equal the batch rank-then-collect")
  }

  test("stream-static broadcast join enriches events, keeps unmatched") {
    val spark2 = spark
    import spark2.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    // user 3 has no dim row and must survive null-padded
    val data = rows :+ Ev(7, ts(3), 3, "click", 5.0, "{}")
    val out = runStream(Streams.enrich(_, dim), outputMode = "append",
                        data = data)
    assert(out.length === data.length)
    assert(out.filter(_.getAs[Long]("user_id") == 1L)
      .forall(_.getAs[String]("tier") == "gold"))
    assert(out.filter(_.getAs[Long]("user_id") == 3L)
      .forall(_.getAs[String]("tier") == null))
    // the static side must be broadcast, not shuffled into the stream
    val plan = Streams.enrich(rows.toDF(), dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }

  test("stream-stream interval join matches purchases to signups") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"ssj_${System.nanoTime()}"
    val q = graft.streaming.Streams.signupPurchaseJoin(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        Ev(1, ts(0), 1, "signup", 0.0, "{}"),
        Ev(2, ts(5), 1, "purchase", 9.99, "{}"),      // within 24h -> match
        Ev(3, ts(2), 2, "purchase", 5.0, "{}"),        // no signup -> no match
        Ev(4, Timestamp.valueOf("2024-01-03 10:00:00"), 1, "purchase", 1.0, "{}")))
      q.processAllAvailable()
      // streaming == the batch run of the same transform
      val stream = spark.table(name).collect().map(_.toString).sorted.toSeq
      val batch = graft.streaming.Streams.signupPurchaseJoin(
        Seq(Ev(1, ts(0), 1, "signup", 0.0, "{}"),
            Ev(2, ts(5), 1, "purchase", 9.99, "{}"),
            Ev(3, ts(2), 2, "purchase", 5.0, "{}"),
            Ev(4, Timestamp.valueOf("2024-01-03 10:00:00"), 1, "purchase", 1.0, "{}"))
          .toDF()).collect().map(_.toString).sorted.toSeq
      assert(stream === batch)
      assert(stream.length === 1) // only the within-24h purchase of user 1
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits null row after state expiry") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"ssjo_${System.nanoTime()}"
    val q = graft.streaming.Streams
      .signupPurchaseJoin(mem.toDF(), "left_outer")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        Ev(1, ts(0), 1, "signup", 0.0, "{}"),
        Ev(2, ts(5), 1, "purchase", 9.99, "{}"), // user 1: matched
        Ev(3, ts(1), 2, "signup", 0.0, "{}")))   // user 2: never purchases
      q.processAllAvailable()
      // user 2's null row may NOT appear yet: a matching purchase could
      // still arrive until the watermark passes signup_ts + 24h
      val early = spark.table(name)
        .filter(col("user_id") === 2).collect()
      assert(early.isEmpty,
        s"outer row emitted before state expiry: ${early.toSeq}")
      // events far in the future on BOTH sides: the join's watermark is
      // the MIN across inputs, so the purchase stream must advance too
      // before Spark can prove no match can arrive and emit the null row
      mem.addData(Seq(
        Ev(9, Timestamp.valueOf("2024-01-05 10:00:00"), 9, "signup", 0.0, "{}"),
        Ev(10, Timestamp.valueOf("2024-01-05 10:00:00"), 9, "purchase", 1.0, "{}")))
      q.processAllAvailable()
      val late = spark.table(name)
        .filter(col("user_id") === 2).collect()
      assert(late.length === 1)
      assert(late(0).isNullAt(late(0).fieldIndex("purchase_ts")))
      // the matched row for user 1 is present exactly once
      assert(spark.table(name).filter(col("user_id") === 1).count() === 1)
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per key") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"dedup_${System.nanoTime()}"
    val q = graft.streaming.Streams.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(Seq(rows(0), rows(0), rows(1))) // duplicate in-batch
      q.processAllAvailable()
      // re-delivered duplicates: same key, exact ts AND a shifted ts (a
      // late redelivery) — key-level dedup must drop both
      mem.addData(Seq(rows(0), rows(0).copy(ts = ts(0, 30)), rows(2)))
      q.processAllAvailable()
      val got = spark.table(name).select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("AvailableNow + foreachBatch: checkpointed incremental file drain") {
    val spark2 = spark
    import spark2.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("drain-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("drain-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drain-ckpt").toString
    // first arrival: 2 docs
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    def stream() = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(srcDir)
      .select(col("doc_id"), upper(col("text")).as("text_up"))
    Streams.drainAvailableNow(stream(), outDir, ckpt)
    val first = spark.read.parquet(outDir)
    assert(first.count() === 2)
    // second arrival: 1 more file; same checkpoint → ONLY the new file
    // is processed (the high-water mark survived the restart)
    Seq((3L, "gamma")).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    Streams.drainAvailableNow(stream(), outDir, ckpt)
    val all = spark.read.parquet(outDir)
    assert(all.count() === 3)
    assert(all.filter("text_up = 'GAMMA'").count() === 1)
    // the increment landed in a NEW batch_id partition (idempotent unit)
    val batches = all.select("batch_id").distinct().collect()
      .map(_.get(0).toString.toLong).sorted.toSeq
    assert(batches.length >= 2, s"expected >=2 batch partitions: $batches")
  }

  test("stateful sessionization closes sessions on event-time timeout") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, UserEvent2}
    val mem = MemoryStream[UserEvent2]
    val name = s"sess_${System.nanoTime()}"
    val q = Streams.sessionizeStateful(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(Seq(UserEvent2(1, ts(0)), UserEvent2(1, ts(1))))
      q.processAllAvailable()
      // nothing closed yet — session still open
      assert(spark.table(name).count() === 0)
      // watermark jumps far past last+gap -> timeout fires, session emits
      mem.addData(Seq(UserEvent2(2, Timestamp.valueOf("2024-01-01 11:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq(UserEvent2(2, Timestamp.valueOf("2024-01-01 11:00:01"))))
      q.processAllAvailable()
      val out = spark.table(name)
        .as[graft.streaming.SessionOut].collect()
      val u1 = out.filter(_.user_id == 1)
      assert(u1.length === 1, s"expected user 1's session closed: ${out.toSeq}")
      assert(u1(0).n_events === 2 && u1(0).closed_by_timeout)
      assert(u1(0).start === ts(0) && u1(0).end === ts(6)) // last(10:01)+5min
    } finally q.stop()
  }

  test("streaming near-dup candidates match batch banding, incrementally") {
    import graft.streaming.{CandPair, DocIn, Streams}
    import graft.operators.Dedup
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1)))
    // batch reference: the same band self-join the dedup queries run
    val bands = Dedup.minhashBands(Dedup.minhashSignaturesExpr(spark, sf0001))
    val expected = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "testdata should produce candidate pairs")

    val (half1, half2) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[DocIn]
    val name = s"sink_${System.nanoTime()}"
    val q = Streams.nearDupCandidates(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(half1.toSeq)
      q.processAllAvailable()
      val afterFirst = spark.table(name).collect().length
      mem.addData(half2.toSeq)
      q.processAllAvailable()
      val got = spark.table(name).as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).toSet
      assert(got === expected,
        s"stream/batch diverge: +${got.diff(expected)} -${expected.diff(got)}")
      // incrementality: the second micro-batch emitted pairs against
      // state built by the first (not a re-run over everything)
      assert(afterFirst > 0 && afterFirst < spark.table(name).count(),
        "pairs should arrive across micro-batches")
    } finally q.stop()
  }

  test("streaming co-occurrence pair counts match batch supports across batches") {
    import graft.streaming.{BasketItem, CoPair, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val items = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => BasketItem(r.getLong(0), r.getLong(1)))
    // batch reference: per-order unordered pair supports, the
    // rec_item_cooccur `pr` frame before its min-support gate
    val b = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val expected = b.as("a").join(b.as("bb"),
        col("a.ok") === col("bb.ok") && col("a.pk") < col("bb.pk"))
      .groupBy(col("a.pk").as("pa"), col("bb.pk").as("pb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(expected.nonEmpty, "testdata should produce co-occurring pairs")

    // split INSIDE orders too (sorted by item so many orders straddle
    // the boundary) — the twin must emit second-batch pairs against
    // first-batch basket state
    val sorted = items.sortBy(i => (i.item_id, i.order_id))
    val (half1, half2) = sorted.splitAt(sorted.length / 2)
    val mem = MemoryStream[BasketItem]
    val name = s"cooc_${System.nanoTime()}"
    val q = Streams.cooccurPairs(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(half1.toSeq)
      q.processAllAvailable()
      val afterFirst = spark.table(name).count()
      mem.addData(half2.toSeq)
      q.processAllAvailable()
      val got = spark.table(name).as[CoPair].collect()
        .groupBy(p => (p.item_a, p.item_b))
        .map { case (k, v) => k -> v.length.toLong }
      assert(got === expected,
        s"stream/batch diverge on ${got.size} vs ${expected.size} pairs")
      assert(afterFirst > 0 && afterFirst < spark.table(name).count(),
        "pairs should arrive across micro-batches")
    } finally q.stop()
  }

  test("kmeans serving on a stream: assignments equal the batch column and census") {
    // the serving path of vector_kmeans_converged: train ONCE (memoized
    // artifact), then assign arriving vectors with the same stateless
    // codegen'd argmin column — nothing about the scorer knows it's on
    // a stream, and its census equals the driver query's.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = graft.operators.Vectors.lloydCentroids(spark, sf0001)
    def asgCol = graft.operators.Vectors.lloydAssignCol(cents, col("embedding"))
    val batch = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), asgCol.as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val census = graft.operators.Vectors.vectorKmeansConverged
      .fn(spark, sf0001)
      .select("cluster", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromCol = batch.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(fromCol === census,
      "the serving column's census must equal the query's")
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val name = s"km_${System.nanoTime()}"
    val q = mem.toDS().toDF("vec_id", "embedding")
      .select(col("vec_id"), asgCol.as("cluster"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (h1, h2) = vecs.splitAt(vecs.size / 2)
      mem.addData(h1)
      q.processAllAvailable()
      mem.addData(h2)
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === batch, "stream assignments must equal batch")
    } finally q.stop()
  }

  test("PQ index serving on a stream: ADC scores bit-equal to the batch scan") {
    // the serving path of vector_pq: train the index ONCE (batch,
    // driver-side artifacts), then score arriving vectors with the same
    // stateless narrow ADC projection. Nothing about the scorer knows
    // it's on a stream — that is the claim being locked.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (cbs, _, qd) = graft.operators.Vectors.pqArtifacts(spark, sf0001)
    val adc = graft.operators.Vectors.pqAdcColumn(cbs, qd)
    val vecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") =!= 0).limit(60)
      .select(col("vec_id"),
        graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toSeq
    val batch = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), adc.as("adc_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[(Long, Seq[Double])]
    val name = s"pq_${System.nanoTime()}"
    val q = mem.toDF().toDF("vec_id", "v")
      .select(col("vec_id"), adc.as("adc_micro"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      val (h1, h2) = vecs.splitAt(30)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val streamed = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch,
        s"stream/batch ADC diverge on ${streamed.keySet.diff(batch.keySet)}")
    } finally q.stop()
  }

  test("watermark drops events later than the threshold (append mode)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = (df: DataFrame) => df
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val name = s"late_${System.nanoTime()}"
    val q = agg(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(Seq(Ev(1, ts(0), 1, "a", 1.0, "{}"),
                      Ev(2, ts(5), 1, "a", 1.0, "{}")))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData(Seq(Ev(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 1.0, "{}")))
      q.processAllAvailable()
      // late arrival into the long-closed first window: must be dropped
      mem.addData(Seq(Ev(4, ts(1), 1, "a", 1.0, "{}")))
      q.processAllAvailable()
      val out = spark.table(name).collect()
      val first = out.filter(_.getAs[Timestamp]("ws") ==
        Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(first.length === 1 && first(0).getAs[Long]("n") === 2,
        s"late row leaked into closed window: ${out.toSeq}")
    } finally q.stop()
  }

  test("streaming Misra-Gries summaries carry the batch guarantee " +
       "across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, TokObs, MgSummary}
    val Cap = 4
    val Shards = 4
    // two genuine heavy hitters + a long tail wide enough to overflow a
    // cap-4 table and force MG decrements; occurrences split across the
    // batch boundary so the guarantee only holds if state persists
    def toks(reps: (String, Int)*): Seq[String] =
      reps.flatMap { case (t, k) => Seq.fill(k)(t) }
    val b1 = toks("alpha" -> 16, "beta" -> 9, "t1" -> 2, "t2" -> 2,
                  "t3" -> 1, "t4" -> 1, "t5" -> 1, "t6" -> 1)
    val b2 = toks("alpha" -> 14, "beta" -> 11, "t7" -> 2, "t8" -> 2,
                  "t9" -> 1, "t10" -> 1, "t11" -> 1, "t12" -> 1)
    def shard(t: String) = math.floorMod(t.hashCode, Shards)
    def obs(ts: Seq[String]) = ts.map(t => TokObs(shard(t), t))
    val mem = MemoryStream[TokObs]
    val name = s"mg_${System.nanoTime()}"
    val q = Streams.mgSummaries(mem.toDS(), Cap).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val fin = try {
      mem.addData(obs(b1)); q.processAllAvailable()
      mem.addData(obs(b2)); q.processAllAvailable()
      // Update mode: the LAST emitted row per shard is the live summary
      spark.table(name).as[MgSummary].collect().zipWithIndex
        .groupBy(_._1.shard).map { case (s, rs) => s -> rs.maxBy(_._2)._1 }
    } finally q.stop()
    val all = b1 ++ b2
    val byShard = all.groupBy(shard)
    fin.foreach { case (s, sm) =>
      assert(sm.tokens.length <= Cap, s"shard $s state exceeded cap")
      assert(sm.n_shard === byShard(s).length.toLong,
        s"shard $s stream length drifted")
      // the deterministic MG guarantee, applied to the WHOLE (two-batch)
      // shard stream: freq > n_shard/(cap+1) must have survived
      val freq = byShard(s).groupBy(identity).view.mapValues(_.length)
      freq.foreach { case (t, c) =>
        if (c > sm.n_shard / (Cap + 1).toDouble)
          assert(sm.tokens.contains(t),
            s"shard $s lost guaranteed hitter $t ($c of ${sm.n_shard})")
      }
    }
    // pass 2 exactly as the batch query: exact recount of the candidate
    // union, threshold > n/10 — must equal the naive heavy hitters
    val cands = fin.values.flatMap(_.tokens).toSet
    val n = all.length
    val naive = all.groupBy(identity).view.mapValues(_.length)
      .filter { case (_, c) => c * 10 > n }.keySet.toSet
    val recount = all.filter(cands).groupBy(identity).view
      .mapValues(_.length).filter { case (_, c) => c * 10 > n }
      .keySet.toSet
    assert(recount === naive,
      s"streamed candidates + exact recount diverged from the batch " +
        s"answer: $recount vs $naive")
  }

  test("streaming concurrency peaks equal the batch sweep across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Streams, ConcDelta, ConcPeak}
    // day 0 reaches level 3 at ms 40 (two same-instant starts — must be
    // summed before applying) and touches 3 again via a later rebound
    // path at 70 only if tie handling were wrong; day 1 peaks at 2. The
    // micro-batch boundary splits day 0 mid-timeline.
    val b1 = Seq(ConcDelta(0, 10, 1), ConcDelta(0, 20, 1),
                 ConcDelta(0, 30, -1), ConcDelta(0, 40, 1),
                 ConcDelta(0, 40, 1), ConcDelta(0, 45, -1),
                 ConcDelta(1, 15, 1))
    val b2 = Seq(ConcDelta(0, 60, -1), ConcDelta(0, 70, 1),
                 ConcDelta(0, 80, -1), ConcDelta(0, 90, -1),
                 ConcDelta(1, 25, 1), ConcDelta(1, 35, -1),
                 ConcDelta(1, 60, -1))
    val mem = MemoryStream[ConcDelta]
    val name = s"conc_${System.nanoTime()}"
    val q = Streams.concurrencyPeaks(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val got = try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      // Update mode: the LAST emitted row per day is the live answer
      spark.table(name).as[ConcPeak].collect()
        .zipWithIndex.groupBy(_._1.di)
        .map { case (d, rows) => d -> rows.maxBy(_._2)._1 }
    } finally q.stop()
    // batch oracle: the sweep in plain Scala — per-instant totals in ms
    // order, running level, strict-> peak keeps the earliest instant
    val want = (b1 ++ b2).groupBy(_.di).map { case (d, ds0) =>
      var cur = 0L; var peak = Long.MinValue; var peakMs = Long.MinValue
      ds0.groupBy(_.ms).toSeq.sortBy(_._1).foreach { case (ms, dd) =>
        cur += dd.map(_.d.toLong).sum
        if (cur > peak) { peak = cur; peakMs = ms }
      }
      d -> (cur, peak, peakMs)
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (d, p0) =>
      assert((p0.cur, p0.peak, p0.peak_ms) === want(d), s"day $d diverged")
    }
    // the cross-batch merge really happened: day 0's peak instant is in
    // batch 1 while its final level only resolves in batch 2
    assert(got(0L).peak == 3 && got(0L).peak_ms == 40 && got(0L).cur == 0)
  }

  test("streaming keep-first segment dedup equals batch dedup_keepfirst across micro-batches") {
    import graft.streaming.{DocIn, SegDecision, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the per-doc survival rollup of the catalog query
    val batch = graft.operators.Dedup.dedupKeepfirst.fn(spark, sf0001)
      .select("doc_id", "n_segs", "n_kept", "n_tokens_kept").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // fed in corpus order (the append-ingest contract), split in two
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1)))
    val (half1, half2) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[DocIn]
    val name = s"kf_${System.nanoTime()}"
    val q = Streams.keepFirstSegments(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(half1.toSeq)
      q.processAllAvailable()
      val afterFirst = spark.table(name).count()
      mem.addData(half2.toSeq)
      q.processAllAvailable()
      val decisions = spark.table(name).as[SegDecision].collect()
      // every arriving segment got exactly one decision row
      assert(decisions.length == batch.values.map(_._1).sum)
      assert(afterFirst > 0 && afterFirst < decisions.length,
        "decisions should arrive across micro-batches")
      val got = decisions.groupBy(_.doc_id).map { case (id, ds) =>
        id -> ((ds.length.toLong,
          ds.count(_.keep).toLong,
          ds.filter(_.keep).map(_.seg_len.toLong).sum))
      }
      assert(got.keySet === batch.keySet)
      val diverged = got.collect {
        case (id, v) if v != batch(id) => s"doc $id: stream=$v batch=${batch(id)}"
      }
      assert(diverged.isEmpty, diverged.mkString("; "))
      // cross-batch state really decided: dozens of duplicate segments
      // span the split on this fixture (first owner below the median
      // doc_id, a later occurrence above), so the per-doc equality above
      // could only hold if half-2 occurrences were dropped by state
      // carried from half 1; this existence check just keeps the fixture
      // honest about having half-2 drops at all
      val h2ids = half2.map(_.doc_id).toSet
      assert(decisions.exists(d => h2ids.contains(d.doc_id) && !d.keep),
        "expected at least one drop among half-2 docs")
    } finally q.stop()
  }

  test("streaming A/B flags aggregate to the batch ab_lift_ztest counts") {
    import graft.streaming.{AbEvent, AbFlags, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the catalog query's exact sufficient statistics
    val b = graft.operators.Streaming.abLiftZtest.fn(spark, sf0001)
      .select("n_control", "n_treat", "conv_control", "conv_treat")
      .collect().head
    val batch = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // fed in global ts order (implies the per-user in-order contract),
    // split mid-timeline so first views and their conversions straddle
    // the micro-batch boundary
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type").orderBy("ts").collect()
      .map(r => AbEvent(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[AbEvent]
    val name = s"ab_${System.nanoTime()}"
    val q = Streams.abUserFlags(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val flags = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      mem.addData(half2.toSeq); q.processAllAvailable()
      // Update mode: the LAST emitted row per user is the live answer
      spark.table(name).as[AbFlags].collect().zipWithIndex
        .groupBy(_._1.user_id).map { case (_, rows) => rows.maxBy(_._2)._1 }
        .toSeq
    } finally q.stop()
    val got = (
      flags.count(f => f.grp == 0 && f.exposed == 1).toLong,
      flags.count(f => f.grp == 1 && f.exposed == 1).toLong,
      flags.count(f => f.grp == 0 && f.exposed == 1 && f.converted == 1).toLong,
      flags.count(f => f.grp == 1 && f.exposed == 1 && f.converted == 1).toLong)
    assert(got === batch,
      s"stream (n0,n1,x0,x1)=$got != batch $batch")
    // downstream z arithmetic is a shared deterministic expression over
    // these four integers, so count equality is full-query equality
    assert(got._3 + got._4 > 0, "fixture should have conversions")
  }

  test("streaming SRM census equals the batch ab_srm per-day arm counts") {
    import graft.streaming.{AbEvent, SrmSeen, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the catalog query's per-day distinct-user census
    val batch = graft.operators.Streaming.abSrm.fn(spark, sf0001)
      .select("day", "n_control", "n_treat").collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    // split mid-timeline so users active on the boundary day have their
    // (user, day) first sighting tested against re-arrival in batch 2
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type").orderBy("ts").collect()
      .map(r => AbEvent(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[AbEvent]
    val name = s"srm_${System.nanoTime()}"
    val q = Streams.srmSeenDays(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val rows = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      mem.addData(half2.toSeq); q.processAllAvailable()
      spark.table(name).as[SrmSeen].collect()
    } finally q.stop()
    // Append mode emits each (user, day) exactly once — a duplicate
    // emission would double-count an arm and break the census equality
    assert(rows.map(r => (r.day.toString, r.user_id)).distinct.length ===
      rows.length, "a (user, day) pair was emitted more than once")
    val got = rows.groupBy(_.day.toString).map { case (d, rs) =>
      d -> (rs.count(_.grp == 0).toLong, rs.count(_.grp == 1).toLong)
    }
    assert(got === batch,
      "streaming per-day arm counts diverge from batch ab_srm")
    // chi2/srm downstream are one integer expression over these counts
  }

  test("streaming funnel positions aggregate to the batch funnel_multistep census") {
    import graft.streaming.{AbEvent, FunnelPos, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the 4-row stage census
    val batch = graft.operators.Streaming.funnelMultistep.fn(spark, sf0001)
      .select("step", "n_reached", "mean_convert_ms").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type").orderBy("ts").collect()
      .map(r => AbEvent(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[AbEvent]
    val name = s"fnl_${System.nanoTime()}"
    val q = Streams.funnelPositions(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val live = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      // mid-stream sanity: positions exist and nobody exceeds step 4
      val mid = spark.table(name).as[FunnelPos].collect()
      assert(mid.nonEmpty && mid.forall(p => p.max_step >= 0 && p.max_step <= 4))
      mem.addData(half2.toSeq); q.processAllAvailable()
      // Update mode: last emitted row per user is the live answer
      spark.table(name).as[FunnelPos].collect().zipWithIndex
        .groupBy(_._1.user_id).map { case (_, rows) => rows.maxBy(_._2)._1 }
        .toSeq
    } finally q.stop()
    (1 to 4).foreach { step =>
      val reached = live.count(_.max_step >= step).toLong
      assert(reached == batch(step)._1,
        s"step $step: stream reached=$reached batch=${batch(step)._1}")
    }
    val conv = live.filter(_.max_step == 4)
    val meanMs = if (conv.nonEmpty) conv.map(_.conv_ms).sum / conv.length
                 else -1L
    assert(meanMs == batch(4)._2,
      s"mean convert ms: stream=$meanMs batch=${batch(4)._2}")
    // state really straddles the boundary: some user must cross stages
    // only after batch 2 arrives (guaranteed by the mid-timeline split on
    // this fixture, where purchases land throughout)
    assert(conv.nonEmpty, "fixture should have full converters")
  }

  test("streaming token-bucket decisions equal the batch rate_limit_sim census") {
    import graft.streaming.{RateDecision, RateEvent, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Streaming.rateLimitSim.fn(spark, sf0001)
      .select("event_type", "n_events", "n_allowed").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "event_id", "ts", "event_type")
      .orderBy("ts", "event_id").collect()
      .map(r => RateEvent(r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[RateEvent]
    val name = s"rl_${System.nanoTime()}"
    val q = Streams.rateLimit(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val decisions = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(half2.toSeq); q.processAllAvailable()
      val all = spark.table(name).as[RateDecision].collect()
      assert(mid > 0 && mid < all.length,
        "decisions should arrive across micro-batches")
      all
    } finally q.stop()
    // exactly one decision per event
    assert(decisions.length == evs.length)
    assert(decisions.map(_.event_id).distinct.length == decisions.length)
    val got = decisions.groupBy(_.event_type).map { case (t, ds) =>
      t -> ((ds.length.toLong, ds.count(_.allowed).toLong))
    }
    assert(got == batch,
      s"stream census $got != batch $batch")
    // the sf0.001 fixture is too sparse per user to exhaust a bucket, so
    // denial + cross-batch state carry get a crafted burst: 5 events 1 ms
    // apart, split 2|3 across micro-batches — 3 allows (full bucket),
    // then denials, and the half-2 denials are only explicable by state
    // carried from half 1
    val t0 = 1700000000000L
    def ev(i: Int) = RateEvent(42L, i.toLong,
      new java.sql.Timestamp(t0 + i), "view")
    val mem2 = MemoryStream[RateEvent]
    val name2 = s"rlb_${System.nanoTime()}"
    val q2 = Streams.rateLimit(mem2.toDS()).writeStream
      .format("memory").queryName(name2).outputMode("append").start()
    val burst = try {
      mem2.addData(Seq(ev(0), ev(1))); q2.processAllAvailable()
      mem2.addData(Seq(ev(2), ev(3), ev(4))); q2.processAllAvailable()
      spark.table(name2).as[RateDecision].collect().sortBy(_.event_id)
    } finally q2.stop()
    assert(burst.map(_.allowed).toSeq ===
      Seq(true, true, true, false, false),
      "3-token bucket: first three allowed, then denied across the boundary")
  }

  test("streaming firsts aggregate to the batch ab_sequential day frame") {
    import graft.streaming.{AbEvent, AbFirst, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the daily dashboard's cumulative sufficient stats
    val batch = graft.operators.Streaming.abSequential.fn(spark, sf0001)
      .select("day", "n_control", "n_treat", "conv_control", "conv_treat")
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(batch.nonEmpty)
    // global ts order implies the per-user in-order contract; split EARLY
    // (1/20 of the timeline — at this SF every user is first-seen within
    // the first half, so a mid split would put all firsts in batch 1)
    // so some users' first event lands in batch 1 while their first
    // purchase — and other users entirely — arrive in batch 2, proving
    // the once-only state carries across the boundary
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_type").orderBy("ts").collect()
      .map(r => AbEvent(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val (half1, half2) = evs.splitAt(evs.length / 20)
    val mem = MemoryStream[AbEvent]
    val name = s"abseq_${System.nanoTime()}"
    val q = Streams.abSeqFirsts(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val (afterFirst, firsts) = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      val n1 = spark.table(name).count()
      mem.addData(half2.toSeq); q.processAllAvailable()
      (n1, spark.table(name).as[AbFirst].collect())
    } finally q.stop()
    assert(afterFirst > 0 && afterFirst < firsts.length,
      "firsts should arrive across micro-batches")
    // exactly-once per (user, kind)
    assert(firsts.map(f => (f.user_id, f.kind)).distinct.length ===
      firsts.length, "a (user, kind) first was emitted more than once")
    // the cumulative day census over emitted firsts equals the batch
    // frame on every (non-degenerate) day the batch query reports; the
    // z / OBF-boundary columns downstream are one shared deterministic
    // expression over these four integers
    val diverged = batch.collect {
      case (day, want) if {
        def cum(g: Int, k: Int): Long = firsts.count(f =>
          f.grp == g && f.kind == k && f.day.toString <= day).toLong
        (cum(0, 0), cum(1, 0), cum(0, 1), cum(1, 1)) != want
      } => day
    }
    assert(diverged.isEmpty,
      s"cumulative census diverges from batch on: ${diverged.mkString(", ")}")
  }

  test("streaming burst census equals the batch event_burst rows") {
    import graft.streaming.{BurstRow, Streams, UserEvent2}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Streaming.eventBurst.fn(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val evs = Tables.events(spark, sf0001)
      .select("user_id", "ts").orderBy("ts").collect()
      .map(r => UserEvent2(r.getLong(0), r.getTimestamp(1)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[UserEvent2]
    val name = s"brst_${System.nanoTime()}"
    val q = Streams.burstCensus(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val live = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(half2.toSeq); q.processAllAvailable()
      assert(mid > 0 && mid < spark.table(name).count(),
        "census rows should arrive across micro-batches")
      // Update mode: last emitted row per user is the live answer
      spark.table(name).as[BurstRow].collect().zipWithIndex
        .groupBy(_._1.user_id).map { case (_, rs) => rs.maxBy(_._2)._1 }
        .toSeq
    } finally q.stop()
    assert(live.map(_.user_id).toSet === batch.keySet)
    val diverged = live.filterNot { r =>
      batch(r.user_id) == ((r.n_events, r.max_burst_1h, r.burst_flag))
    }
    assert(diverged.isEmpty,
      s"per-user burst census diverges from batch: ${diverged.take(3)}")
    // the trailing window must really straddle the micro-batch boundary:
    // a crafted user bursts 2 events in half 1 and 1 more (same hour) in
    // half 2 — the live max of 3 is only explicable by carried state
    val t0 = 1700000000000L
    def ev(i: Int) = UserEvent2(4242L,
      new java.sql.Timestamp(t0 + i * 60000L))
    val mem2 = MemoryStream[UserEvent2]
    val name2 = s"brstb_${System.nanoTime()}"
    val q2 = Streams.burstCensus(mem2.toDS()).writeStream
      .format("memory").queryName(name2).outputMode("update").start()
    val last = try {
      mem2.addData(Seq(ev(0), ev(1))); q2.processAllAvailable()
      mem2.addData(Seq(ev(2))); q2.processAllAvailable()
      spark.table(name2).as[BurstRow].collect().zipWithIndex
        .maxBy(_._2)._1
    } finally q2.stop()
    assert(last === BurstRow(4242L, 3L, 3L, true),
      s"cross-batch trailing window broken: $last")
  }

  test("burst census bounds hot-user state by coarsening, counts stay") {
    import graft.streaming.{BurstRow, Streams, UserEvent2}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the adversarial input the screen exists to catch: one user, 5000
    // events at 5000 DISTINCT milliseconds inside one hour — past the
    // 4096-run cap the state coarsens to ≤3601 per-second buckets; the
    // in-window count is unaffected here (nothing expires), so the max
    // must stay exact through the coarsening
    val t0 = 1700000000000L
    val hot = (0 until 5000).map(i =>
      UserEvent2(7L, new java.sql.Timestamp(t0 + i)))
    val mem = MemoryStream[UserEvent2]
    val name = s"brsth_${System.nanoTime()}"
    val q = Streams.burstCensus(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val (mid, last) = try {
      mem.addData(hot); q.processAllAvailable()
      val m = spark.table(name).as[BurstRow].collect()
        .zipWithIndex.maxBy(_._2)._1
      // two hours later every coarse bucket is past the window — the
      // trailing count resets to 1 while the historical max persists
      mem.addData(Seq(UserEvent2(7L,
        new java.sql.Timestamp(t0 + 7200000L))))
      q.processAllAvailable()
      (m, spark.table(name).as[BurstRow].collect()
        .zipWithIndex.maxBy(_._2)._1)
    } finally q.stop()
    assert(mid === BurstRow(7L, 5000L, 5000L, true),
      s"hot-user count wrong through coarsening: $mid")
    assert(last === BurstRow(7L, 5001L, 5000L, true),
      s"coarse buckets failed to expire: $last")
  }

  test("streaming gap census equals the batch dq_sequence_gaps audit") {
    import graft.streaming.{GapEvent, GapRow, Streams}
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Pipeline.dqSequenceGaps.fn(spark, sf0001)
      .select("day", "n_rows", "id_span", "n_missing", "n_gap_runs")
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the same 2% salted drop the batch audit injects, applied by the
    // feeder (the stream sees only SURVIVING rows, like a real ingest)
    val evs = Tables.events(spark, sf0001)
      .select("event_id", "ts").orderBy("event_id").collect()
      .map(r => GapEvent(r.getLong(0), r.getTimestamp(1)))
      .filter { e =>
        graft.functions.expressions.PortableHash
          .hash60(s"${e.event_id}:loss".getBytes("UTF-8")) % 100 >= 2
      }
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[GapEvent]
    val name = s"gap_${System.nanoTime()}"
    val q = Streams.gapCensus(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val live = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(half2.toSeq); q.processAllAvailable()
      assert(mid > 0 && mid < spark.table(name).count(),
        "census rows should arrive across micro-batches")
      spark.table(name).as[GapRow].collect().zipWithIndex
        .groupBy(_._1.day.toString)
        .map { case (_, rs) => rs.maxBy(_._2)._1 }.toSeq
    } finally q.stop()
    assert(live.map(_.day.toString).toSet === batch.keySet)
    val diverged = live.filterNot { r =>
      batch(r.day.toString) ==
        ((r.n_rows, r.id_span, r.n_missing, r.n_gap_runs))
    }
    assert(diverged.isEmpty,
      s"per-day gap census diverges from batch: ${diverged.take(3)}")
    // a gap run must straddle the micro-batch boundary somewhere: the
    // split is mid-timeline, so the split day's state (last id) carries
    // across batches — prove at least one day has runs detected at all
    assert(live.map(_.n_gap_runs).sum > 0, "fixture should show gap runs")
  }

  test("streaming volume census equals batch dq_volume_anomaly on closed days") {
    import graft.streaming.{Streams, VolEvent, VolRow}
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Pipeline.dqVolumeAnomaly.fn(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6)))).toMap
    // a live monitor can't know the still-open last day per type
    val lastDay = batch.keys.groupBy(_._1)
      .map { case (t, ks) => t -> ks.map(_._2).max }
    val closed = batch.filter { case ((t, d), _) => d < lastDay(t) }
    val evs = Tables.events(spark, sf0001)
      .select("event_type", "ts").orderBy("ts").collect()
      .map(r => VolEvent(r.getString(0), r.getTimestamp(1)))
    val (half1, half2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[VolEvent]
    val name = s"vol_${System.nanoTime()}"
    val q = Streams.volumeCensus(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    val live = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(half2.toSeq); q.processAllAvailable()
      assert(mid > 0 && mid < spark.table(name).count(),
        "closed-day rows should arrive across micro-batches")
      spark.table(name).as[VolRow].collect()
    } finally q.stop()
    val liveMap = live.map(r => (r.event_type, r.day_index) ->
      ((r.n, r.k, r.s, r.dev_ppm, r.anomaly))).toMap
    assert(liveMap.keySet === closed.keySet,
      s"closed-day sets differ: ${liveMap.keySet.diff(closed.keySet).take(3)}" +
      s" / ${closed.keySet.diff(liveMap.keySet).take(3)}")
    val diverged = closed.collect {
      case (k, v) if liveMap(k) != v => (k, v, liveMap(k))
    }
    assert(diverged.isEmpty,
      s"live census diverges from batch: ${diverged.take(3)}")
  }

  test("streaming MG candidates contain every exact batch heavy hitter") {
    import graft.streaming.{HhCand, Streams, TokEvent}
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val exact = graft.operators.TextAnalysis.textHeavyHitters
      .fn(spark, sf0001).select("token").collect()
      .map(_.getString(0)).toSet
    assert(exact.nonEmpty, "fixture should have heavy hitters")
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .collect().map(r => TokEvent(r.getString(0)))
    val (half1, half2) = toks.splitAt(toks.length / 2)
    val mem = MemoryStream[TokEvent]
    val name = s"hh_${System.nanoTime()}"
    val q = Streams.heavyHitterCandidates(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    val finalCands = try {
      mem.addData(half1.toSeq); q.processAllAvailable()
      mem.addData(half2.toSeq); q.processAllAvailable()
      val all = spark.table(name).as[HhCand].collect()
      // Update mode: only the LATEST epoch per shard is the live set
      // (MG counters drop between batches — stale rows must lose)
      val lastEpoch = all.groupBy(_.shard)
        .map { case (s, rs) => s -> rs.map(_.epoch).max }
      all.filter(c => c.epoch == lastEpoch(c.shard))
    } finally q.stop()
    // the MG bound: per shard ≤ cap survivors
    finalCands.groupBy(_.shard).foreach { case (s, rs) =>
      assert(rs.map(_.token).distinct.length <= 1024,
        s"shard $s exceeds the MG capacity")
    }
    // superset guarantee across the batch boundary: every exact global
    // heavy hitter (freq > n/200 >> shard_n/(cap+1)) must survive
    val live = finalCands.map(_.token).toSet
    val missed = exact.diff(live)
    assert(missed.isEmpty,
      s"MG candidates lost exact heavy hitters: ${missed.take(5)}")
  }

  test("NB scoring on a stream: predictions bit-equal the batch plan") {
    // the serving path of ml_naive_bayes: train ONCE (the model frames
    // are (class×vocab)-bounded aggregates), collect the quantized
    // weight table, then score arriving docs with the stateless local
    // scorer — nothing about it knows it's on a stream, and every
    // prediction equals the batch plan's row_number argmax.
    import graft.operators.MlEval
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = MlEval.nbModelCollect(spark, sf0001)
    val batch = MlEval.nbPredFrame(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val name = s"nb_${System.nanoTime()}"
    val q = mem.toDS()
      .map { case (id, text) => (id, MlEval.nbPredictLocal(model, text)) }
      .toDF("doc_id", "predicted")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.size / 2)
      mem.addData(h1); q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(h2); q.processAllAvailable()
      assert(mid > 0 && mid < spark.table(name).count(),
        "predictions should arrive across micro-batches")
      val got = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === batch, "stream predictions must equal batch")
    } finally q.stop()
  }

  test("JPEG round trip on a stream: per-doc censuses bit-equal batch") {
    // the codec path is a pure function of the row (encode via the JDK,
    // decode via the hand-written T.81 decoder, census over decoded
    // levels) — the same stateless map on a stream must emit identical
    // rows across a micro-batch split. Uses the sum_level census shape
    // of multimodal_jpeg.
    import graft.operators.Multimodal
    import graft.multimodal.Jpeg
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def census(text: String): (Int, Int, Long) = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (bw, bh, jpg) = Multimodal.synthJpeg(bytes)
      val dec = Jpeg.decode(jpg).get
      var sum = 0L
      for (by <- 0 until bh; bx <- 0 until bw)
        sum += (dec.pixels(by * 8 * dec.width + bx * 8) & 0xFF).toLong
      (dec.width, dec.height, sum)
    }
    val docs = Tables.documents(spark, sf0001)
      .filter(length(col("text")) > 0).limit(60)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batch = docs.map { case (id, t) => id -> census(t) }.toMap
    val mem = MemoryStream[(Long, String)]
    val name = s"jpg_${System.nanoTime()}"
    val q = mem.toDS()
      .map { case (id, t) => val (w, h, s) = census(t); (id, w, h, s) }
      .toDF("doc_id", "w", "h", "sum_level")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(30)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
          r.getLong(3)))).toMap
      assert(got === batch, "stream codec censuses must equal batch")
    } finally q.stop()
  }

  test("MP4 box census on a stream: per-doc censuses bit-equal batch") {
    // the container path is a pure function of the row (synthesize the
    // ISO-BMFF tree, walk it back through the independent Mp4 box
    // walker) — the same stateless map on a stream must emit identical
    // rows across a micro-batch split. Uses the box/trak/duration
    // census shape of multimodal_mp4.
    import graft.operators.Multimodal
    import graft.multimodal.Mp4
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def census(text: String): (Int, Int, Long, Long) = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val c = Mp4.census(Multimodal.synthMp4(bytes)).get
      (c.nBoxes, c.nTraks, c.durationMs, c.totalBytes)
    }
    val docs = Tables.documents(spark, sf0001)
      .filter(length(col("text")) > 0).limit(60)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batch = docs.map { case (id, t) => id -> census(t) }.toMap
    val mem = MemoryStream[(Long, String)]
    val name = s"mp4_${System.nanoTime()}"
    val q = mem.toDS()
      .map { case (id, t) =>
        val (nb, nt, ms, tb) = census(t); (id, nb, nt, ms, tb) }
      .toDF("doc_id", "n_boxes", "n_traks", "duration_ms", "total_bytes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(30)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got === batch, "stream box censuses must equal batch")
    } finally q.stop()
  }

  test("geo grid census on a stream equals the batch density query") {
    // the serving path of geo_grid_density: the cell assignment is a
    // stateless integer column; streamed per-cell counts (update-mode
    // streaming aggregation across a micro-batch split) end equal to
    // the batch census.
    import graft.operators.Geo
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Geo.geoGridDensity.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val keys = Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey")).distinct().as[Long].collect().toSeq
    val total = keys.size.toLong
    val mem = MemoryStream[Long]
    val name = s"geo_${System.nanoTime()}"
    val (cx, cy) = Geo.cellCols(col("value"))
    val q = mem.toDS().toDF("value")
      .select(cx.as("cx"), cy.as("cy"))
      .groupBy("cx", "cy").count()
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      val (h1, h2) = keys.splitAt(keys.size / 2)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val cells = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      // batch query reports the top-20 cells with (n DESC, cx, cy)
      // order and ppm share — recompute both from the streamed counts
      val top = cells.sortBy { case ((x, y), n) => (-n, x, y) }.take(20)
        .map { case (k, n) => k -> n }.toMap
      assert(top === batch,
        "streamed top-20 census must equal the batch query's")
      val ppm = Geo.geoGridDensity.fn(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      top.foreach { case (k, n) =>
        assert(ppm(k) === 1000000L * n / total,
          s"share_ppm diverges for cell $k")
      }
    } finally q.stop()
  }

  test("adaptive-cell census on a stream equals the batch census at " +
       "the derived cell") {
    // the serving path of the round-11 adaptive consumers: the
    // DERIVED cell edge is a batch-trained scalar parameter; the cell
    // assignment at that edge stays a stateless integer column, so a
    // streamed census at the derived cell must end bit-equal to the
    // batch one across a micro-batch split.
    import graft.operators.Geo
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = Geo.adaptiveCellOf(spark, sf0001) // the trained parameter
    assert(e > 0 && 2000000L % e == 0, "derived cell must halve the base")
    val keys = Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey")).distinct().as[Long].collect().toSeq
    val (bx, by) = Geo.cellColsAt(col("c_custkey"), e)
    val batch = Tables.table(spark, sf0001, "customer")
      .select(col("c_custkey")).distinct()
      .select(bx.as("cx"), by.as("cy"))
      .groupBy("cx", "cy").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val mem = MemoryStream[Long]
    val name = s"geo_adaptive_${System.nanoTime()}"
    val (cx, cy) = Geo.cellColsAt(col("value"), e)
    val q = mem.toDS().toDF("value")
      .select(cx.as("cx"), cy.as("cy"))
      .groupBy("cx", "cy").count()
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      val (h1, h2) = keys.splitAt(keys.size / 2)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val streamed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch,
        "streamed adaptive-cell census must equal the batch census")
    } finally q.stop()
  }
}
