package graft.streaming

import graft.Tables.{asDouble, money, sumExactAsDouble, sumMoneyAsDouble}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input/output records for the stateful per-user accumulator. */
case class UserEvent(user_id: Long, value: Double)
case class UserTotal(user_id: Long, n_events: Long, total: Double)
/** Timestamped input for event-time stateful sessionization. */
case class UserEvent2(user_id: Long, ts: java.sql.Timestamp)
/** Emitted closed session. */
case class SessionOut(user_id: Long, start: java.sql.Timestamp,
                      end: java.sql.Timestamp, n_events: Long,
                      closed_by_timeout: Boolean)
/** Internal per-user session state (top-level: nested case classes break
  * the state-row codegen in janino). */
case class SessionState(startMs: Long, lastMs: Long, count: Long)

/** Timestamped typed input for stateful transition detection. `event_id`
  * is the tie-break for equal timestamps — the same (ts, event_id) total
  * order the batch `event_transitions` window uses. */
case class TransEvent(user_id: Long, ts: java.sql.Timestamp,
                      event_type: String, event_id: Long = 0L)
/** One observed per-user transition (previous event → this event). */
case class Transition(user_id: Long, from_type: String, to_type: String,
                      gap_ms: Long)
/** Per-user last-event state for [[Streams.transitions]]. */
case class LastEvent(lastMs: Long, lastType: String)

/** Timestamped valued input for streaming OHLC bars. (user_id, ts) is
  * assumed unique per user — the same open/close determinism contract as
  * the batch `ohlc_bars` min_by/max_by. */
case class OhlcEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
/** One closed (user, hour) bar. */
case class OhlcBar(user_id: Long, hour: java.sql.Timestamp, n: Long,
                   open: Double, high: Double, low: Double, close: Double,
                   volume: Double)
/** In-flight bar state (volume held as exact HALF_UP cents so the sum is
  * arrival-order independent, matching the batch DECIMAL(18,2) sum). */
case class OhlcState(n: Long, openMs: Long, open: Double, high: Double,
                     low: Double, closeMs: Long, close: Double,
                     volCents: Long)

/** Timestamped valued input for streaming EWMA. `v` must already be the
  * exact-cents double (the batch side's [[graft.Tables.money]] cast). */
case class EwmaEvent(user_id: Long, event_id: Long,
                     ts: java.sql.Timestamp, v: Double)
/** One smoothed point: the EWMA as of this event. */
case class EwmaOut(user_id: Long, event_id: Long, ewma: Double)
/** Carried smoother state: the previous EWMA value. */
case class EwmaState(y: Double)

/** Input for streaming last-touch attribution: `ck` is the batch
  * query's integer-encoded (ms·1000 + campaign) click key; value is the
  * purchase amount. */
case class AttrEvent(user_id: Long, event_id: Long,
                     ts: java.sql.Timestamp, event_type: String,
                     ck: Long, value: Double)
/** One attributed purchase: campaign = decoded latest-click campaign. */
case class AttrCredit(user_id: Long, event_id: Long, campaign: Long,
                      value: Double)
/** Carried attribution state: the latest click's encoded key. */
case class AttrState(lck: Long)

/** Input for streaming LINEAR attribution: cents is the batch plan's
  * exact DECIMAL(18,2)·100 purchase amount; campaign is None when the
  * click's props.$.k is missing/non-numeric (such clicks still count in
  * the equal-split denominator, matching the batch window's n_clicks). */
case class AttrLinEvent(user_id: Long, event_id: Long,
                        ts: java.sql.Timestamp, event_type: String,
                        cents: Long, campaign: Option[Long])
/** One purchase's credit to one campaign: `new_clicks` = clicks of this
  * campaign first credited by THIS purchase (so Σ new_clicks = the batch
  * census's distinct credited-click count); `credit_microcents` = this
  * purchase's share × all its preceding clicks of the campaign. */
case class AttrLinCredit(user_id: Long, event_id: Long, campaign: Long,
                         new_clicks: Long, credit_microcents: Long)
/** Per-user linear-attribution state: total preceding clicks (any
  * campaign, the equal-split denominator), and per NON-NULL campaign the
  * clicks seen and the clicks already credited by an earlier qualifying
  * purchase. Bounded by the campaign universe (4 here), not the stream. */
case class AttrLinState(totalClicks: Long, camps: Seq[Long],
                        clicks: Seq[Long], credited: Seq[Long])

/** Input for the streaming funnel automaton. */
case class FunnelEvent(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp, event_type: String)
/** One conversion: the user's first signup and the first purchase inside
  * the 24 h window after it. */
case class FunnelConv(user_id: Long, signup_ts: java.sql.Timestamp,
                      purchase_ts: java.sql.Timestamp)
/** Per-user funnel state: the first signup's full-precision timestamp
  * (the batch min — micros matter, the events table is µs-grained) and
  * whether the conversion already emitted. */
case class FunnelState(signup_ts: java.sql.Timestamp, converted: Boolean)

/** Timestamped input for streaming cohort retention. */
case class RetEvent(user_id: Long, ts: java.sql.Timestamp)
/** One first-activity-of-the-day edge: the user (in cohort `cohort_day`)
  * was active `day_offset` days after their first day. */
case class RetEdge(user_id: Long, cohort_day: java.sql.Date, day_offset: Int)
/** Per-user retention state: first-seen epoch day + days already emitted
  * (bounded: only offsets ≤ the horizon are recorded, ≤ 8 entries). */
case class RetState(cohortDay: Int, seen: Seq[Int])

/** Timestamped typed event for the streaming A/B flag twin. */
case class AbEvent(user_id: Long, ts: java.sql.Timestamp,
                   event_type: String)
/** Live per-user experiment flags: assignment group, exposure (has a
  * first view), conversion (purchase inside the 24 h window after it). */
case class AbFlags(user_id: Long, grp: Int, exposed: Int, converted: Int)
/** O(1) per-user state: first-view epoch ms (MaxValue = not yet
  * exposed) and whether a qualifying purchase was seen. */
case class AbState(t0: Long, converted: Boolean)

/** First sighting of a (user, day) pair for the streaming SRM twin:
  * one row per pair ever emitted, so a downstream per-day count over
  * the emitted rows IS the batch distinct-user census. */
case class SrmSeen(day: java.sql.Date, user_id: Long, grp: Int)
/** Per-user SRM state: the set of epoch-days already emitted (bounded
  * by the day domain, the RetState discipline). */
case class SrmState(days: Seq[Int])

/** A user's first exposure (kind 0) or first conversion (kind 1) day for
  * the streaming sequential-monitoring twin: each (user, kind) emits
  * EXACTLY ONCE, so the cumulative per-(day, arm) census over emitted
  * rows IS batch `ab_sequential`'s day frame at every prefix. */
case class AbFirst(user_id: Long, grp: Int, day: java.sql.Date, kind: Int)
/** O(1) per-user state: whether the first-event and first-purchase rows
  * have been emitted yet. */
case class AbSeqState(fe: Boolean, fp: Boolean)

/** Live per-user funnel position for the streaming `funnel_multistep`
  * twin (Update mode — last row per user is the current answer):
  * `max_step` under the batch query's ordered-firsts semantics, plus the
  * signup→purchase latency once step 4 is reached. */
case class FunnelPos(user_id: Long, max_step: Int, conv_ms: Long)

/** One admit/deny decision from the streaming token-bucket twin — each
  * event emits exactly one decision row (Append mode), so any census
  * over decisions equals the batch `rate_limit_sim` replay. */
case class RateDecision(user_id: Long, event_id: Long,
                        event_type: String, ms: Long, allowed: Boolean)
/** Input event for the rate-limiter twin — carries event_id so the
  * within-batch sort can reproduce the batch fold's total
  * (ts, event_id) order on equal-millisecond events. */
case class RateEvent(user_id: Long, event_id: Long,
                     ts: java.sql.Timestamp, event_type: String)
/** O(1) per-user bucket state: refill-credit ms and last event ms —
  * the batch fold's exact integer state, carried across micro-batches. */
case class TokenBucketState(credit: Long, lastMs: Long)
/** O(1) per-user state: the first-seen epoch ms of each funnel stage
  * (−1 = not yet seen). Under per-user in-order arrival each field is
  * set at most once, so it equals the batch per-stage min. */
case class FunnelStageState(t1: Long, t2: Long, t3: Long, t4: Long)

/** Bounded per-user burst state: event timestamps inside the CURRENT
  * trailing hour (everything older can never join a future trailing
  * window under in-order arrival, so it is dropped — state is bounded by
  * the user's peak events-per-hour), plus the running max and total. */
case class BurstState(recentMs: Seq[Long], recentCnt: Seq[Long],
                      maxBurst: Long, n: Long, coarse: Boolean)
/** Live per-user burst census: mirrors batch `event_burst`'s row. */
case class BurstRow(user_id: Long, n_events: Long, max_burst_1h: Long,
                    burst_flag: Boolean)

/** One surviving ingest row for [[Streams.gapCensus]]: a dense-space id
  * and its event time (the day key derives from it). */
case class GapEvent(event_id: Long, ts: java.sql.Timestamp)
/** O(1) per-day gap state: last id seen (gap detection under in-order
  * arrival needs only the predecessor), the running min/max/count, and
  * the gap-run tally. */
case class GapState(lastId: Long, minId: Long, maxId: Long,
                    n: Long, runs: Long)
/** Live per-day completeness census: mirrors batch `dq_sequence_gaps`'s
  * integer columns. */
case class GapRow(day: java.sql.Date, n_rows: Long, id_span: Long,
                  n_missing: Long, n_gap_runs: Long)

/** One sweep-line delta instant for [[Streams.concurrencyPeaks]]: at
  * epoch-ms `ms` on epoch-day `di`, the active-session level changes by
  * `d` (+1 start / −1 end, pre-clipped to the day like the batch query). */
case class ConcDelta(di: Long, ms: Long, d: Int)
/** Live per-day concurrency summary: current level, running peak, and
  * the earliest instant that peak was reached. */
case class ConcPeak(di: Long, cur: Long, peak: Long, peak_ms: Long)
/** O(1) per-day sweep state. */
case class ConcState(cur: Long, peak: Long, peakMs: Long, lastMs: Long)

/** One shingle-hash observation from a source feed (running-signature
  * input). */
case class CorrBucket(series_id: Long, bkt: java.sql.Timestamp,
                      x: Long, y: Long)
case class CorrOut(series_id: Long, bkt: java.sql.Timestamp,
                   x: Long, y: Long, r: java.lang.Double)
/** Internal trailing-window buffer for [[Streams.rollingCorr]]:
  * the last ≤ window (x, y) pairs, oldest first. */
case class CorrState(xs: Seq[Long], ys: Seq[Long])

case class SeriesPoint(user_id: Long, ts: java.sql.Timestamp, v: Double)
case class InterpRow(user_id: Long, bucket: java.sql.Timestamp,
                     observed: Int, v_interp: Double)
/** Internal per-user last-observed point for [[Streams.interpolated]]. */
case class InterpState(ms: Long, v: Double)

case class Scd2Closed(user_id: Long, attr: String,
                      valid_from: java.sql.Timestamp,
                      valid_to: java.sql.Timestamp, version: Long)
/** Internal per-user open validity interval for [[Streams.scd2Closed]]. */
case class Scd2Open(attr: String, fromMs: Long, version: Long)

case class PatEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                    event_type: String)
case class PatMatch(user_id: Long, event_id: Long,
                    purchase_ts: java.sql.Timestamp,
                    click_ts: java.sql.Timestamp,
                    view_ts: java.sql.Timestamp)
/** Per-user pattern-automaton state: the latest view, and the latest
  * QUALIFIED click (one with a view before it) plus that click's view. */
case class PatState(lv: Option[java.sql.Timestamp],
                    qc: Option[java.sql.Timestamp],
                    qcLv: Option[java.sql.Timestamp])

/** A user's completed five-stage journey, [[Streams.journeyPaths]]. */
case class UserPath(user_id: Long, path: String)
/** Per-user journey-prefix state: events seen (≤5) and the path so far. */
case class PathState(n: Int, path: String)

case class ShingleObs(source: String, sgl: Long)
/** A source's current MinHash signature (32 affine mins). */
case class SourceSig(source: String, sig: Seq[Long])

/** A document arriving on a stream (near-dup candidate detection). */
case class DocIn(doc_id: Long, text: String)
/** An LSH band row of a streamed document. */
/** One event arrival for [[Streams.volumeCensus]]. */
case class VolEvent(event_type: String, ts: java.sql.Timestamp)
/** Bounded per-type volume state: the trailing ≤7 closed-day counts
  * (day index + count, oldest first) plus the currently-open day's
  * accumulator — O(1) per stream regardless of volume. */
case class VolState(days: Seq[Long], counts: Seq[Long],
                    curDi: Long, curN: Long)
/** One CLOSED day's volume row — identical columns and arithmetic to
  * batch `dq_volume_anomaly`. */
case class VolRow(event_type: String, day_index: Long, n: Long,
                  k: Long, s: Long, dev_ppm: Option[Long],
                  anomaly: Boolean)

/** One token arrival for [[Streams.heavyHitterCandidates]]. */
case class TokEvent(token: String)
/** Bounded per-shard Misra–Gries state: ≤ MgCap (token, counter) pairs,
  * the shard's total token count, and the micro-batch epoch (so readers
  * of the Update-mode sink can select the LATEST emitted candidate set —
  * MG counters can drop between batches, and stale rows must lose). */
case class HhShardState(toks: Seq[String], cnts: Seq[Long],
                        n: Long, epoch: Long)
/** One live candidate row: the shard, the surviving token, its MG
  * counter (an undercount of the true frequency by ≤ shard_n/(cap+1)),
  * the shard's running total, and the emitting epoch. */
case class HhCand(shard: Int, token: String, mg_count: Long,
                  shard_n: Long, epoch: Long)

case class BandRow(doc_id: Long, band: Int, bhash: Long)
/** Emitted candidate pair, normalized doc_a < doc_b. */
case class CandPair(doc_a: Long, doc_b: Long)
/** Per-(band, bhash) bucket membership. */
case class BucketState(ids: Seq[Long])

/** One (order, item) arrival for [[Streams.cooccurPairs]]. */
case class BasketItem(order_id: Long, item_id: Long)
/** Emitted co-occurrence increment, normalized item_a < item_b. */
case class CoPair(item_a: Long, item_b: Long)
/** Per-order basket membership (bounded by [[Streams.BasketCap]]). */
case class BasketState(items: Seq[Long])

/** One 8-token segment of a streamed document (keep-first dedup). */
case class SegRow(doc_id: Long, seg_idx: Int, seg_len: Int, seg_text: String)
/** The keep/drop decision for one streamed segment. */
case class SegDecision(doc_id: Long, seg_idx: Int, seg_len: Int,
                       keep: Boolean)
/** The segment's first owner — the state a keep-first stream carries. */
case class SegSeen(docId: Long, segIdx: Int)

/** A token routed to its hash shard (streaming heavy hitters). */
case class TokObs(shard: Int, token: String)
/** One shard's Misra–Gries summary: surviving candidates with their
  * residual counters, plus the shard's exact stream length. */
case class MgSummary(shard: Int, tokens: Seq[String], counts: Seq[Long],
                     n_shard: Long)

/** Time-window transforms shared by batch queries and Structured Streaming
  * (SURVEY.md §2.10). Each takes any frame with the `events` schema —
  * batch (`spark.read`) or streaming (`spark.readStream`/MemoryStream) —
  * and returns the same logical plan, so batch results ARE the oracle for
  * the streaming execution (asserted in StreamingSpec).
  *
  * Scale posture: tumbling/hopping aggregate with partial+final combine on
  * (window, key); session windows shuffle once by user key. In streaming
  * mode add `withWatermark` before these transforms to bound state.
  */
object Streams {

  /** Tumbling 10-minute windows per event_type: count + exact-decimal sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoneyAsDouble(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Hopping windows: width 10 minutes, slide 5 — each event lands in two
    * windows. */
  def hopping(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Custom state machine (SURVEY §2.10 "stateful"): per-user running
    * totals via `flatMapGroupsWithState` — state survives across
    * micro-batches (asserted in StreamingSpec), emitting the updated
    * total on every batch that touches the user. State is one small
    * record per key; at scale the state store shards by the group key
    * like any keyed shuffle. */
  def runningTotals(ds: Dataset[UserEvent]): Dataset[UserTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          val next = rows.foldLeft(prev)((a, e) =>
            UserTotal(uid, a.n_events + 1, a.total + e.value))
          state.update(next)
          Iterator(next)
      }
  }

  /** Streaming DRIFT monitoring — the incremental half of the batch
    * `dq_drift_ks` census: maintain the CURRENT window's binned value
    * histogram per (event_type, bin) as a streaming aggregate (state =
    * one counter per occupied bin, bounded by types × DriftBins
    * regardless of stream length). The KS composition then runs over
    * this frame joined with the precomputed reference histogram —
    * `Pipeline.ksCompose`, the same code path as the batch query, so
    * drift numbers from the stream CANNOT disagree with a batch backfill
    * (StreamingSpec asserts exactly that, across micro-batch
    * boundaries). */
  def driftBinCounts(events: DataFrame, split: String,
                     bins: Int = graft.operators.Pipeline.DriftBins): DataFrame =
    events.filter(col("ts") >= lit(split).cast("timestamp"))
      .select(col("event_type"),
        least(floor(col("value")).cast("long"),
              lit((bins - 1).toLong)).as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("cb"))

  /** Streaming exact dedup: first occurrence of each KEY wins — a
    * re-delivered late duplicate with a different timestamp is dropped
    * too (`dropDuplicates(key :+ ts)` would keep it).
    * `dropDuplicatesWithinWatermark` keys state by `keyCols` alone and
    * expires entries once the watermark passes their event time — the
    * bounded-state streaming dedup. */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: purchases matched to the signup of the
    * same user within [signup, signup + 24 h]. Both sides carry
    * watermarks so the join state is bounded (Spark drops buffered rows
    * once the watermark passes the interval bound) — the streaming
    * analogue of the `funnel` batch query. */
  def signupPurchaseJoin(events: DataFrame): DataFrame =
    signupPurchaseJoin(events, "inner")

  /** `joinType = "left_outer"` additionally emits signups that saw NO
    * purchase within the interval — the null-padded row surfaces only
    * once the watermark passes `signup_ts + 24h` and Spark can PROVE no
    * match can still arrive (state expiry, not timeout polling). That
    * proof is exactly why both sides must carry watermarks and the join
    * condition must bound event time on both ends. */
  def signupPurchaseJoin(events: DataFrame, joinType: String): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
              col("value"))
      .withWatermark("purchase_ts", "1 hour")
    signups.join(purchases,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") >= col("signup_ts") &&
      col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"),
      joinType)
      .select(col("user_id"), col("signup_ts"), col("purchase_ts"), col("value"))
  }

  /** Custom sessionization with EVENT-TIME TIMEOUT: state closes and the
    * final session row is emitted when the watermark passes last event +
    * gap — the full custom-state machine (the built-in `session_window`
    * can't emit on timeout with custom logic). Gap = 5 minutes. */
  def sessionizeStateful(ds: Dataset[UserEvent2]): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    val gapMs = 5 * 60 * 1000L
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[UserEvent2],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs + gapMs), s.count,
              closed_by_timeout = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t < s.lastMs + gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t),
                                    count = s.count + 1))
                case Some(s) => // gap exceeded within the batch
                  closed += SessionOut(uid, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs + gapMs), s.count,
                    closed_by_timeout = false)
                  cur = Some(SessionState(t, t, 1))
                case None => cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Per-user event-transition stream — the streaming counterpart of the
    * batch `event_transitions` lead window: state carries each user's
    * last event, and every arriving event emits its (from → to, gap)
    * edge incrementally. State is O(1) per user (one timestamp + one
    * type), so it never grows with stream length — unlike a naive
    * "window over unbounded history". Assumes per-user in-order arrival
    * (the per-key ordering a partitioned log guarantees); an
    * out-of-order tolerant variant would buffer behind a watermark and
    * flush like [[sessionizeStateful]]. StreamingSpec asserts the
    * micro-batched run equals the batch lead window on the same rows,
    * including transitions that SPAN micro-batch boundaries. */
  def transitions(ds: Dataset[TransEvent]): Dataset[Transition] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TransEvent],
         state: GroupState[LastEvent]) =>
          // (ts, event_id): the same total order as the batch lead
          // window — ts alone leaves equal-ts edges nondeterministic
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach { l =>
              out += Transition(uid, l.lastType, e.event_type,
                                e.ts.getTime - l.lastMs)
            }
            last = Some(LastEvent(e.ts.getTime, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming ROLLING CORRELATION — the incremental form of the batch
    * `ts_rolling_corr` moving frame: per series, state is the trailing
    * ≤ 24 (x, y) pairs; each arriving bucket completes a 24-bucket
    * window and emits its r (buckets before the window warms emit
    * nothing, exactly the batch `n = 24` filter). The sufficient
    * statistics are exact BIGINT sums — integer addition is
    * associative, so recomputing them over the buffer equals the batch
    * window's accumulation bit-for-bit, and the final r repeats the
    * batch double expression (two casts, sqrt, one divide; null on a
    * constant window). One state entry per series: a single global
    * series keeps O(window) state on one key — the same boundedness
    * the batch form gets from its series-sized frame. StreamingSpec
    * asserts BIT equality across micro-batch boundaries. */
  def rollingCorr(ds: Dataset[CorrBucket],
                  window: Int = 24): Dataset[CorrOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (sid: Long, rows: Iterator[CorrBucket],
         state: GroupState[CorrState]) =>
          val sorted = rows.toSeq.sortBy(_.bkt.getTime)
          var xs = state.getOption.map(_.xs.toVector).getOrElse(Vector())
          var ys = state.getOption.map(_.ys.toVector).getOrElse(Vector())
          val out = Seq.newBuilder[CorrOut]
          sorted.foreach { b =>
            xs :+= b.x; ys :+= b.y
            if (xs.length > window) { xs = xs.tail; ys = ys.tail }
            if (xs.length == window) {
              val n = window.toLong
              var sx = 0L; var sy = 0L; var sxx = 0L; var syy = 0L
              var sxy = 0L; var i = 0
              while (i < window) {
                val (x, y) = (xs(i), ys(i))
                sx += x; sy += y; sxx += x * x; syy += y * y; sxy += x * y
                i += 1
              }
              // identical op sequence to the batch r expression
              val den = math.sqrt((n * sxx - sx * sx).toDouble *
                                  (n * syy - sy * sy).toDouble)
              val r: java.lang.Double =
                if (den == 0.0) null
                else java.lang.Double.valueOf((n * sxy - sx * sy).toDouble / den)
              out += CorrOut(sid, b.bkt, b.x, b.y, r)
            }
          }
          state.update(CorrState(xs, ys))
          out.result().iterator
      }
  }

  /** Streaming LINEAR INTERPOLATION — the incremental form of the
    * batch `resample_interp` plan, and its exact structural twin: the
    * batch form generates each gap's points from a (point, successor)
    * segment pair produced by a lead window; here the segment pair is
    * (state, arriving point), so every gap materializes the moment its
    * right endpoint arrives, with O(1) state per user (the last
    * observed point). Observed rows emit immediately; trailing gaps
    * don't exist in either form (the batch grid also ends at the last
    * known point). Input contract: pre-bucketed series points (the
    * upstream windowed aggregate's output), in order per user.
    * The interpolation float math is the IDENTICAL operation sequence
    * as the batch column expression — long→double casts, one divide,
    * one multiply-add — so StreamingSpec asserts BIT equality with the
    * batch plan across micro-batch boundaries, including gaps that
    * span them. */
  def interpolated(ds: Dataset[SeriesPoint],
                   stepMs: Long = 3600000L): Dataset[InterpRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SeriesPoint],
         state: GroupState[InterpState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[InterpRow]
          var last = state.getOption
          sorted.foreach { p =>
            val pMs = p.ts.getTime
            last.foreach { l =>
              // Contract guard: the batch twin generates gap points with
              // sequence(prev + step, next - step, step), which assumes
              // every observed point sits on the step grid. A misaligned
              // point would make this side emit points the batch side
              // never generates (silent parity divergence) — fail loud
              // instead, naming the offending key and timestamps.
              require((pMs - l.ms) % stepMs == 0,
                s"interpolated: misaligned point for user $uid: " +
                  s"prev=${l.ms} next=$pMs step=$stepMs — input must be " +
                  "pre-bucketed to the step grid")
              var t = l.ms + stepMs
              while (t < pMs) {
                // same op sequence as the batch expression: v0 +
                // (v1-v0) * (double(dt) / double(dt01))
                val frac = (t - l.ms).toDouble / (pMs - l.ms).toDouble
                out += InterpRow(uid, new java.sql.Timestamp(t), 0,
                  l.v + (p.v - l.v) * frac)
                t += stepMs
              }
            }
            out += InterpRow(uid, p.ts, 1, p.v)
            last = Some(InterpState(pMs, p.v))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming SCD2 maintenance — the CDC form of the batch
    * `scd2_history` build: per-user state is the OPEN validity interval
    * (attr, valid_from, version); a consecutive repeat of the same attr
    * is absorbed, a change CLOSES the open interval (emitting the
    * finished history row) and opens the next. Append mode can emit
    * only immutable facts, so the stream emits exactly the CLOSED rows —
    * the batch query's `is_current = 0` set — while the open row lives
    * in state (queryable via the state store, or emitted on a timeout
    * policy a warehouse load would choose). Same (ts, event_id) total
    * order and in-order-per-key assumption as [[transitions]].
    * StreamingSpec asserts the micro-batched run equals the batch plan's
    * closed set, including intervals that SPAN micro-batch boundaries
    * and equal-timestamp mutations. */
  def scd2Closed(ds: Dataset[TransEvent]): Dataset[Scd2Closed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TransEvent],
         state: GroupState[Scd2Open]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Scd2Closed]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(o) if o.attr == e.event_type => // repeat: absorb
              case Some(o) =>
                out += Scd2Closed(uid, o.attr,
                  new java.sql.Timestamp(o.fromMs), e.ts, o.version)
                open = Some(Scd2Open(e.event_type, e.ts.getTime,
                  o.version + 1))
              case None =>
                open = Some(Scd2Open(e.event_type, e.ts.getTime, 1L))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming JOURNEY COMPLETION — the incremental face of the batch
    * `event_paths` rank-then-collect: per user, state is (count, path
    * prefix) over the first five events in (ts, event_id) order, and
    * the completed `a>b>c>d>e` path is emitted exactly when the fifth
    * event arrives. Users that never reach five never emit — in an
    * unbounded stream "the first five" is only DECIDED once five exist,
    * so completion is the only sound append-mode emission point; the
    * path census is then a plain aggregate over this emission stream.
    * O(1) state per user (one int + a ≤5-stage string), same
    * in-order-per-key assumption as [[transitions]]. StreamingSpec
    * asserts the emitted set equals the batch plan's len=5 per-user
    * paths bit-for-bit, including journeys that SPAN micro-batch
    * boundaries. */
  def journeyPaths(ds: Dataset[PatEvent], stages: Int = 5)
      : Dataset[UserPath] = {
    import ds.sparkSession.implicits._
    def key(t: java.sql.Timestamp) =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000 // exact micros
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PatEvent],
         state: GroupState[PathState]) =>
          val sorted = rows.toSeq.sortBy(e => (key(e.ts), e.event_id))
          var s = state.getOption.getOrElse(PathState(0, ""))
          val out = Seq.newBuilder[UserPath]
          sorted.foreach { e =>
            if (s.n < stages) {
              s = PathState(s.n + 1,
                if (s.n == 0) e.event_type else s.path + ">" + e.event_type)
              if (s.n == stages) out += UserPath(uid, s.path)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming SEQUENTIAL PATTERN MATCH — the CEP form of the batch
    * `pattern_seq` window plan: per-user state is the automaton's
    * frontier (latest view; latest QUALIFIED click and its view — the
    * exact prefix the batch plan's running maxes carry), so each
    * arriving purchase emits its match immediately with O(1) state per
    * user. Same (ts, event_id) total order as the batch windows, same
    * in-order-per-key assumption as [[transitions]]. StreamingSpec
    * asserts the micro-batched run equals the batch plan on the same
    * rows, including chains that SPAN micro-batch boundaries. */
  def patternMatches(ds: Dataset[PatEvent]): Dataset[PatMatch] = {
    import ds.sparkSession.implicits._
    def key(t: java.sql.Timestamp) =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000 // exact micros
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PatEvent],
         state: GroupState[PatState]) =>
          val sorted = rows.toSeq.sortBy(e => (key(e.ts), e.event_id))
          val out = Seq.newBuilder[PatMatch]
          var s = state.getOption.getOrElse(PatState(None, None, None))
          sorted.foreach { e =>
            e.event_type match {
              case "purchase" =>
                for (c <- s.qc; v <- s.qcLv)
                  out += PatMatch(uid, e.event_id, e.ts, c, v)
              case "click" =>
                if (s.lv.isDefined) s = s.copy(qc = Some(e.ts), qcLv = s.lv)
              case "view" => s = s.copy(lv = Some(e.ts))
              case _ => ()
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming LAST-TOUCH ATTRIBUTION — the CEP form of the batch
    * `attribution_lastclick` window plan: per-user state is the latest
    * click's integer-encoded key (the exact value the batch running max
    * carries), each arriving purchase emits its credit immediately with
    * O(1) state per user, and the campaign census is a plain downstream
    * aggregate over the credit stream (exactly as `retentionEdges`
    * separates edge emission from the cohort aggregate). Same
    * (ts, event_id) total order and in-order-per-key delivery
    * assumption as [[transitions]]. */
  def attributionCredits(ds: Dataset[AttrEvent]): Dataset[AttrCredit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrEvent],
         state: GroupState[AttrState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[AttrCredit]
          var lck = state.getOption.map(_.lck)
          sorted.foreach { e =>
            e.event_type match {
              case "purchase" =>
                lck.foreach(k =>
                  out += AttrCredit(uid, e.event_id, k % 1000 % 4, e.value))
              case "click" => lck = Some(e.ck)
              case _ => ()
            }
          }
          lck.foreach(k => state.update(AttrState(k)))
          out.result().iterator
      }
  }

  /** Streaming LINEAR (multi-touch) attribution — the CEP form of the
    * batch `attribution_linear` suffix-sum plan. The batch form never
    * materializes (purchase × click) pairs and neither does this one:
    * per-user state is the equal-split denominator (total preceding
    * clicks) plus, per NON-NULL campaign, (clicks seen, clicks already
    * credited) — bounded by the campaign universe, not the stream. Each
    * qualifying purchase (cents > 0, ≥ 1 preceding click) emits ONE row
    * per campaign with clicks: the campaign's whole-click credit
    * `clicks × (cents·10⁶ div totalClicks)` and the count of clicks this
    * purchase credits FIRST, so the downstream campaign census
    * (Σ new_clicks, Σ credit) equals the batch output exactly — the
    * share is the identical positive-operand integer floor division,
    * and every sum is exact BIGINT arithmetic, so parity is bit-level,
    * not approximate. Null-campaign clicks count in the denominator but
    * never receive an emitted credit, mirroring the batch plan's
    * `campaign IS NOT NULL` census filter. Same (ts, event_id) total
    * order and in-order-per-key delivery assumption as [[transitions]]. */
  def attributionLinearCredits(
      ds: Dataset[AttrLinEvent]): Dataset[AttrLinCredit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AttrLinEvent],
         state: GroupState[AttrLinState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[AttrLinCredit]
          var s = state.getOption.getOrElse(
            AttrLinState(0L, Seq(), Seq(), Seq()))
          sorted.foreach { e =>
            e.event_type match {
              case "click" =>
                val total = s.totalClicks + 1
                s = e.campaign match {
                  case Some(c) =>
                    val i = s.camps.indexOf(c)
                    if (i < 0)
                      AttrLinState(total, s.camps :+ c, s.clicks :+ 1L,
                                   s.credited :+ 0L)
                    else
                      AttrLinState(total, s.camps,
                        s.clicks.updated(i, s.clicks(i) + 1), s.credited)
                  case None => s.copy(totalClicks = total)
                }
              case "purchase" if e.cents > 0 && s.totalClicks > 0 =>
                // identical op to the batch share: positive operands, so
                // Java's truncating / IS the floor division DuckDB's //
                // and Spark's `div` compute
                val share = e.cents * 1000000L / s.totalClicks
                var i = 0
                while (i < s.camps.length) {
                  if (s.clicks(i) > 0)
                    out += AttrLinCredit(uid, e.event_id, s.camps(i),
                      s.clicks(i) - s.credited(i), s.clicks(i) * share)
                  i += 1
                }
                // every click seen so far is now credited — only
                // QUALIFYING purchases advance this, because the batch
                // credit of a click whose later purchases all have NULL
                // share is NULL (filtered from the census)
                s = s.copy(credited = s.clicks)
              case _ => ()
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming CONVERSION FUNNEL — the automaton form of the batch
    * `funnel` aggregate-then-join plan ([[graft.operators.Streaming]]):
    * per-user state is (first signup ms, converted?), O(1) forever; the
    * FIRST purchase inside the 24 h window after the first signup fires
    * the conversion row. In-order-per-key delivery makes "first seen" ≡
    * the batch min() on both stages, and (user_id, ts) uniqueness (the
    * events-table contract [[ohlcBars]] also rests on) keeps the
    * signup/purchase order unambiguous at equal timestamps. Append mode
    * emits immutable facts only, so the stream emits exactly the
    * CONVERTED rows — the batch query's `converted = true` set; the
    * not-(yet-)converted remainder lives in state, the same
    * closed-vs-open split [[scd2Closed]] documents. StreamingSpec
    * asserts set equality with the batch plan across micro-batch
    * boundaries, including signup→purchase chains that straddle them. */
  def funnelConversions(ds: Dataset[FunnelEvent]): Dataset[FunnelConv] = {
    import ds.sparkSession.implicits._
    // exact micros, as [[patternMatches]] — ts.getTime alone drops the
    // sub-millisecond digits the batch min()/BETWEEN compare on
    def key(t: java.sql.Timestamp) =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    val WindowUs = 24L * 3600L * 1000000L
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (key(e.ts), e.event_id))
          val out = Seq.newBuilder[FunnelConv]
          var s = state.getOption
          sorted.foreach { e =>
            e.event_type match {
              case "signup" if s.isEmpty =>
                s = Some(FunnelState(e.ts, converted = false))
              case "purchase" =>
                s.filter(!_.converted).foreach { st =>
                  val us = key(e.ts)
                  val su = key(st.signup_ts)
                  // [signup, signup + 24 h] inclusive — the batch BETWEEN
                  if (us >= su && us <= su + WindowUs) {
                    out += FunnelConv(uid, st.signup_ts, e.ts)
                    s = Some(st.copy(converted = true))
                  }
                }
              case _ => ()
            }
          }
          s.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming EWMA — the incremental form of the batch `ts_ewma`
    * secondary-sort recurrence: per-user state is just the previous
    * smoothed value, each arriving event emits its EWMA immediately,
    * and because the recurrence is the IDENTICAL IEEE operation
    * sequence (α = 1/2: two exact halvings + one rounded add), the
    * stream output is bit-equal to the batch `mapPartitions` pass at
    * any prefix — including sequences spanning micro-batch boundaries.
    * Same in-order-per-key delivery assumption as [[transitions]];
    * within a micro-batch, rows sort by the batch plan's (ts, event_id)
    * total order. */
  def ewma(ds: Dataset[EwmaEvent]): Dataset[EwmaOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EwmaEvent],
         state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[EwmaOut]
          var y = state.getOption.map(_.y)
          sorted.foreach { e =>
            val ny = y match {
              case Some(p) => 0.5 * e.v + 0.5 * p
              case None    => e.v
            }
            out += EwmaOut(uid, e.event_id, ny)
            y = Some(ny)
          }
          y.foreach(v => state.update(EwmaState(v)))
          out.result().iterator
      }
  }

  /** Streaming OHLC bars — the incremental counterpart of the batch
    * `ohlc_bars` aggregate: state per (user, hour) folds each event into
    * (n, open, high, low, close, volume) as it arrives — min_by/max_by
    * become "keep the value with the smallest/largest ts seen so far" —
    * and the bar EMITS exactly once, when the event-time watermark passes
    * the hour end (EventTimeTimeout). State is O(1) per open bar and
    * bars close themselves, so state never grows with stream length.
    * Volume accumulates as exact HALF_UP cents (order-independent,
    * bit-equal to the batch DECIMAL(18,2) sum route). StreamingSpec
    * asserts micro-batched bars equal the batch aggregate on the same
    * rows, including bars spanning micro-batch boundaries. */
  def ohlcBars(ds: Dataset[OhlcEvent]): Dataset[OhlcBar] = {
    import ds.sparkSession.implicits._
    val HourMs = 3600000L
    def cents(v: Double): Long =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue.longValueExact
    ds.withWatermark("ts", "0 seconds")
      .groupByKey(e => (e.user_id, e.ts.getTime / HourMs))
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[OhlcEvent],
         state: GroupState[OhlcState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(OhlcBar(key._1, new java.sql.Timestamp(key._2 * HourMs),
              s.n, s.open, s.high, s.low, s.close, s.volCents / 100.0))
          } else {
            var s = state.getOption.orNull
            rows.foreach { e =>
              val t = e.ts.getTime
              s =
                if (s == null)
                  OhlcState(1L, t, e.value, e.value, e.value, t, e.value,
                            cents(e.value))
                else OhlcState(
                  s.n + 1,
                  if (t < s.openMs) t else s.openMs,
                  if (t < s.openMs) e.value else s.open,
                  math.max(s.high, e.value), math.min(s.low, e.value),
                  if (t > s.closeMs) t else s.closeMs,
                  if (t > s.closeMs) e.value else s.close,
                  s.volCents + cents(e.value))
            }
            if (s != null) {
              state.update(s)
              // the bar closes when the watermark passes the hour end
              state.setTimeoutTimestamp((key._2 + 1) * HourMs)
            }
            Iterator.empty
          }
      }
  }

  /** RUNNING per-source MinHash signatures — the streaming face of the
    * sketch-mergeability property [[graft.operators.Dedup.dedupSourceSim]]
    * demonstrates in batch: each signature slot is a min of an affine
    * hash, and min is associative/commutative/idempotent, so a source's
    * signature folds INCREMENTALLY as shingles arrive (state = 32
    * longs per source, O(1) per observation) and after any prefix of the
    * stream equals the batch aggregate over the same rows exactly
    * (StreamingSpec proves bit-equality across micro-batch boundaries).
    * Same affine family and modulus as the batch queries — the emitted
    * signatures are directly comparable/joinable against a batch-built
    * index. Emits the updated signature each micro-batch (Update mode);
    * duplicate shingles and replays are absorbed by idempotence, the
    * property that makes the sketch safe under at-least-once delivery. */
  def sourceSignatures(ds: Dataset[ShingleObs]): Dataset[SourceSig] = {
    import ds.sparkSession.implicits._
    import graft.operators.Dedup.{MinhashAB, MinhashP}
    val K = MinhashAB.length
    ds.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[ShingleObs],
         state: GroupState[SourceSig]) =>
          val cur = state.getOption.map(_.sig.toArray)
            .getOrElse(Array.fill(K)(Long.MaxValue))
          rows.foreach { o =>
            val x = o.sgl % MinhashP
            var j = 0
            while (j < K) {
              val (a, b) = MinhashAB(j)
              val v = (a * x + b) % MinhashP
              if (v < cur(j)) cur(j) = v
              j += 1
            }
          }
          val out = SourceSig(src, cur.toSeq)
          state.update(out)
          Iterator(out)
      }
  }

  /** Streaming Misra–Gries heavy-hitter candidates — the incremental
    * counterpart of `text_heavy_hitters`' pass 1. Tokens arrive keyed
    * by a HASH SHARD (the router applies hash(token) % shards), so
    * every occurrence of a token lands on one shard's state and the
    * per-shard counter map is a true one-pass MG summary of that
    * shard's entire stream. The fold across micro-batches is the
    * factored [[graft.operators.TextAnalysis.misraGriesInto]] step over
    * the PERSISTED map, so "resume from state" is definitionally one
    * pass over the concatenated stream — the deterministic guarantee
    * (every token with shard frequency > n_shard/(cap+1) present)
    * survives streaming with zero merge error. State is ≤ cap counters
    * per shard, bounded regardless of vocabulary or stream length; the
    * union of summaries ⊇ all global > n/200 hitters for any sane
    * fan-out, and the exact recount stage runs against the sink exactly
    * like the batch query's pass 2 (StreamingSpec drives both).
    * Update mode: last emitted row per shard is the live summary. */
  def mgSummaries(ds: Dataset[TokObs], cap: Int): Dataset[MgSummary] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[TokObs],
         state: GroupState[MgSummary]) =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          val prev = state.getOption
          prev.foreach(p => p.tokens.iterator.zip(p.counts.iterator)
            .foreach { case (t, c) => m(t) = c })
          var n = prev.map(_.n_shard).getOrElse(0L)
          graft.operators.TextAnalysis.misraGriesInto(
            m, rows.map { o => n += 1; o.token }, cap)
          val toks = m.keysIterator.toSeq.sorted
          val out = MgSummary(shard, toks, toks.map(m), n)
          state.update(out)
          Iterator(out)
      }
  }

  /** Streaming cohort retention — the incremental counterpart of the
    * batch `retention_cohort` aggregate: per-user state holds the
    * first-seen day and the days already reported, and each arriving
    * event emits at most one (cohort_day, day_offset) edge — the first
    * activity of that user on that day within the 7-day horizon. The
    * cohort table is then a plain aggregate over the emitted edges
    * (count per (cohort_day, day_offset)), which any sink can maintain
    * incrementally. State is O(horizon) per user. Same per-user in-order
    * arrival contract as [[transitions]] (the cohort day is fixed by the
    * first event seen); cross-micro-batch day dedup is exactly what the
    * state proves (StreamingSpec). Day boundaries are UTC epoch days —
    * the same cut `to_date` makes under the engine's UTC session. */
  def retentionEdges(ds: Dataset[RetEvent]): Dataset[RetEdge] = {
    import ds.sparkSession.implicits._
    val DayMs = 86400000L
    val Horizon = 7
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) =>
          val out = Seq.newBuilder[RetEdge]
          var s = state.getOption.orNull
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val day = math.floorDiv(e.ts.getTime, DayMs).toInt
            if (s == null) s = RetState(day, Nil)
            val off = day - s.cohortDay
            if (off >= 0 && off <= Horizon && !s.seen.contains(day)) {
              out += RetEdge(uid,
                java.sql.Date.valueOf(
                  java.time.LocalDate.ofEpochDay(s.cohortDay.toLong)),
                off)
              s = s.copy(seen = s.seen :+ day)
            }
          }
          if (s != null) state.update(s)
          out.result().iterator
      }
  }

  /** Streaming concurrency sweep — the incremental counterpart of the
    * batch `session_concurrency` peak scan (sixteenth twin): per
    * epoch-day state holds (current level, running peak, earliest peak
    * instant); each micro-batch folds its delta instants into it and
    * Update mode emits the live per-day summary (last emitted row per
    * day = the current answer, the `sourceSignatures` read discipline).
    *
    * In-order arrival contract is PER DAY at instant granularity: delta
    * instants arrive in ms order and a micro-batch boundary never splits
    * one instant's deltas (the `transitions` contract family — violated
    * loudly by the require, never a silent divergence). Same-instant
    * deltas are summed BEFORE applying — the batch query's per-instant
    * total — so the level trajectory is a function of the timeline, not
    * of tie order, and `>` (strict) keeps the EARLIEST peak instant
    * exactly like the batch `ORDER BY c DESC, ms` tie-break. State is
    * O(1) per day regardless of stream length. */
  def concurrencyPeaks(ds: Dataset[ConcDelta]): Dataset[ConcPeak] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.di)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (di: Long, rows: Iterator[ConcDelta],
         state: GroupState[ConcState]) =>
          var s = state.getOption.getOrElse(
            ConcState(0L, Long.MinValue, Long.MinValue, Long.MinValue))
          rows.toSeq.groupBy(_.ms).toSeq.sortBy(_._1).foreach {
            case (ms, dd) =>
              require(ms > s.lastMs,
                s"day $di: delta instant $ms arrived after ${s.lastMs} — " +
                  "per-day in-order contract violated")
              val cur = s.cur + dd.map(_.d.toLong).sum
              s = if (cur > s.peak) ConcState(cur, cur, ms, ms)
                  else s.copy(cur = cur, lastMs = ms)
          }
          state.update(s)
          Iterator(ConcPeak(di, s.cur, s.peak, s.peakMs))
      }
  }

  /** Streaming A/B experiment flags — the incremental counterpart of the
    * batch `ab_lift_ztest` per-user stage: state carries (first-view ms,
    * converted) per user; each micro-batch folds its events in and
    * Update mode emits the live flag row (last emitted row per user =
    * the current answer, the `sourceSignatures` read discipline). The
    * z-test aggregation downstream is four conditional sums over these
    * flags, identical to the batch query's 1-row stage.
    *
    * In-order arrival contract is PER USER at event-time granularity
    * (the `transitions` family): under it the first view is processed
    * before any later purchase, so the streaming t0 equals the batch
    * global min(view ts) at every prefix, and a purchase with ts ≤ t0
    * can never convert in either semantics — including the exact-tie
    * case, which the batch strict `>` rejects no matter which side of
    * the micro-batch boundary it lands on. State is O(1) per user. */
  /** Streaming SRM census — the incremental counterpart of the batch
    * `ab_srm` distinct stage: per-user state carries the set of
    * epoch-days already seen (bounded by the day domain, like
    * [[retention]]'s RetState), and each (user, day) pair emits EXACTLY
    * ONCE, on first sight — so a per-(day, arm) count over the emitted
    * rows equals the batch distinct-user census at every prefix,
    * regardless of where micro-batch boundaries fall. The chi-square
    * downstream is one integer expression over those counts, identical
    * to the batch query's scalar stage. Day derivation is epoch-ms
    * floor-division (UTC), the same day `to_date` yields under the
    * session's UTC clock. */
  def srmSeenDays(ds: Dataset[AbEvent]): Dataset[SrmSeen] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AbEvent], state: GroupState[SrmState]) =>
          val seen = scala.collection.mutable.Set[Int](
            state.getOption.map(_.days).getOrElse(Seq.empty): _*)
          val fresh = rows.map { e =>
            java.lang.Math.floorDiv(e.ts.getTime, 86400000L).toInt
          }.filter(seen.add).toVector // add returns true on first sight
          state.update(SrmState(seen.toSeq))
          fresh.sorted.iterator.map { di =>
            SrmSeen(java.sql.Date.valueOf(
                java.time.LocalDate.ofEpochDay(di.toLong)),
              uid, (uid % 2).toInt)
          }
      }
  }

  /** Streaming firsts for the sequential-monitoring dashboard — the
    * incremental counterpart of batch `ab_sequential`'s user-keyed
    * aggregate (fe = min event day, fp = min purchase day): per user,
    * the first event emits a kind-0 row and the first purchase a kind-1
    * row, each EXACTLY ONCE (Append mode — the [[srmSeenDays]] one-shot
    * discipline). Under the per-user in-order arrival contract the first
    * event processed IS min(ts), so the emitted day equals the batch
    * min at every prefix regardless of micro-batch boundaries. The
    * daily dashboard downstream — cumulative (n0, n1, x0, x1), z, and
    * the OBF boundary — is the same day-domain-bounded arithmetic as
    * the batch query, over counts of these rows. State is two booleans
    * per user. Day derivation is epoch-ms floor-division (UTC), the
    * same day `CAST(ts AS DATE)` yields under the session's UTC clock. */
  def abSeqFirsts(ds: Dataset[AbEvent]): Dataset[AbFirst] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AbEvent], state: GroupState[AbSeqState]) =>
          var s = state.getOption.getOrElse(AbSeqState(false, false))
          val out = scala.collection.mutable.ArrayBuffer.empty[AbFirst]
          def dayOf(e: AbEvent): java.sql.Date =
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
              java.lang.Math.floorDiv(e.ts.getTime, 86400000L)))
          // fe/fp are DAY-granular minima, so only within-batch ts order
          // matters for correctness of the emitted day — sort to make the
          // fold independent of iterator order inside a micro-batch
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (!s.fe) {
              out += AbFirst(uid, (uid % 2).toInt, dayOf(e), 0)
              s = s.copy(fe = true)
            }
            if (!s.fp && e.event_type == "purchase") {
              out += AbFirst(uid, (uid % 2).toInt, dayOf(e), 1)
              s = s.copy(fp = true)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming token-bucket rate limiter — the LIVE half of the batch
    * `rate_limit_sim` replay (this is the operator a real quota service
    * runs; the batch query is its what-if backtest): per-user state is
    * the same exact integer (credit ms, last ms) pair, each arriving
    * event emits one admit/deny decision (Append — decisions are
    * immutable facts), and under the per-user in-order contract every
    * decision equals the batch fold's at any prefix, regardless of
    * micro-batch boundaries. */
  /** Streaming ingest-completeness census — the LIVE half of batch
    * `dq_sequence_gaps` (this is the monitor a real ingest runs: the
    * batch query is its end-of-day audit): per event-day, the id-span
    * census updates as surviving rows arrive. Under in-order arrival,
    * gap detection needs only the PREDECESSOR id — one comparison per
    * row against O(1) state (last/min/max/count/runs per day) — and the
    * emitted census equals the batch audit at every prefix that ends on
    * a day boundary. Update mode: the census row is re-emitted per
    * micro-batch, the last row per day is the live answer. */
  def gapCensus(ds: Dataset[GapEvent]): Dataset[GapRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => java.lang.Math.floorDiv(e.ts.getTime, 86400000L))
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (di: Long, rows: Iterator[GapEvent], state: GroupState[GapState]) =>
          var s = state.getOption
            .getOrElse(GapState(-1L, Long.MaxValue, Long.MinValue, 0L, 0L))
          var (last, mn, mx, n, runs) =
            (s.lastId, s.minId, s.maxId, s.n, s.runs)
          rows.toSeq.sortBy(_.event_id).foreach { e =>
            if (n > 0 && e.event_id - last > 1) runs += 1
            last = e.event_id
            mn = math.min(mn, e.event_id)
            mx = math.max(mx, e.event_id)
            n += 1
          }
          state.update(GapState(last, mn, mx, n, runs))
          Iterator(GapRow(
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(di)),
            n, mx - mn + 1, mx - mn + 1 - n, runs))
      }
  }

  /** Streaming trailing-hour burst census — the LIVE half of batch
    * `event_burst` (the abuse screen a rate-limited API watches in real
    * time): per-user state keeps a run-length census of the current
    * trailing hour — (last-ms-of-run, count) pairs, equal-millisecond
    * events collapsed — so ordinary users cost O(events-in-hour) pairs
    * and equal-ms floods cost O(1). Under the per-user in-order
    * contract, older events can never re-enter a future trailing
    * window, so the drop is lossless. The adversarial hot user (the
    * input this screen exists to catch) is explicitly bounded: past
    * `MaxRlePairs` distinct-ms runs the census coarsens to per-SECOND
    * buckets keyed at each bucket's last observed ms — at most 3601
    * pairs thereafter — and boundary events leave the window up to
    * 999 ms late, so the reported `max_burst_1h` saturates to an UPPER
    * bound (never an undercount; the `is_burst` flag, thresholded at 3,
    * is unaffected). Below the cap the census is exact and equals the
    * batch RANGE frame bit-for-bit: equal-millisecond peers are counted
    * together whichever arrives first (the count at the LAST peer
    * includes all of them, matching the frame's peer semantics on the
    * max). Each micro-batch re-emits the user's row (Update mode — a
    * census, not a fact log). */
  def burstCensus(ds: Dataset[UserEvent2]): Dataset[BurstRow] = {
    import ds.sparkSession.implicits._
    val WindowMs = 3599999L
    val MaxRlePairs = 4096
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent2],
         state: GroupState[BurstState]) =>
          val s = state.getOption
            .getOrElse(BurstState(Seq.empty, Seq.empty, 0L, 0L, false))
          val recent = scala.collection.mutable.ArrayDeque.from(
            s.recentMs.iterator.zip(s.recentCnt.iterator))
          var tot = recent.iterator.map(_._2).sum
          var mx = s.maxBurst
          var n = s.n
          var coarse = s.coarse
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val ms = e.ts.getTime
            n += 1
            // in-order per user ⇒ ms is the run's (or bucket's) last ms
            val sameRun = recent.nonEmpty && (
              if (coarse) recent.last._1 / 1000 == ms / 1000
              else recent.last._1 == ms)
            if (sameRun) {
              val (_, c) = recent.removeLast()
              recent.append((ms, c + 1L))
            } else recent.append((ms, 1L))
            tot += 1
            while (recent.nonEmpty && recent.head._1 < ms - WindowMs) {
              tot -= recent.removeHead()._2
            }
            if (tot > mx) mx = tot
            if (!coarse && recent.size > MaxRlePairs) {
              // saturate: collapse runs into per-second buckets keyed
              // at each bucket's LAST ms (conservative — events expire
              // no earlier than exact, so counts never undershoot)
              coarse = true
              val bySec = scala.collection.mutable.LinkedHashMap
                .empty[Long, (Long, Long)]
              recent.foreach { case (t, c) =>
                val k = t / 1000
                val prev = bySec.getOrElse(k, (t, 0L))
                bySec.update(k, (math.max(prev._1, t), prev._2 + c))
              }
              recent.clear()
              bySec.valuesIterator.foreach(recent.append(_))
            }
          }
          state.update(BurstState(recent.iterator.map(_._1).toSeq,
            recent.iterator.map(_._2).toSeq, mx, n, coarse))
          Iterator(BurstRow(uid, n, mx, mx >= 3))
      }
  }

  def rateLimit(ds: Dataset[RateEvent]): Dataset[RateDecision] = {
    import ds.sparkSession.implicits._
    val CapMs = 10800000L
    val CostMs = 3600000L
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[RateEvent],
         state: GroupState[TokenBucketState]) =>
          var s = state.getOption.orNull
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val ms = e.ts.getTime
              s = if (s == null) TokenBucketState(CapMs, ms)
                  else TokenBucketState(
                    math.min(s.credit + (ms - s.lastMs), CapMs), ms)
              val allowed = s.credit >= CostMs
              if (allowed) s = s.copy(credit = s.credit - CostMs)
              RateDecision(uid, e.event_id, e.event_type, ms, allowed)
            }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming multi-step funnel — the incremental counterpart of batch
    * `funnel_multistep`: per-user state carries the first-seen epoch ms
    * of each stage (signup/view/click/purchase); under the per-user
    * in-order contract each is the stage's global min, so the derived
    * `max_step` (strict ordered-firsts chain, the batch CASE verbatim)
    * equals the batch answer at every prefix. Update mode emits the live
    * position row; the dashboard census downstream is the same ≤5-row
    * aggregate as the batch query's `c` frame. State is 4 longs. */
  def funnelPositions(ds: Dataset[AbEvent]): Dataset[FunnelPos] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AbEvent],
         state: GroupState[FunnelStageState]) =>
          var s = state.getOption
            .getOrElse(FunnelStageState(-1L, -1L, -1L, -1L))
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val ms = e.ts.getTime
            e.event_type match {
              case "signup"   if s.t1 < 0 => s = s.copy(t1 = ms)
              case "view"     if s.t2 < 0 => s = s.copy(t2 = ms)
              case "click"    if s.t3 < 0 => s = s.copy(t3 = ms)
              case "purchase" if s.t4 < 0 => s = s.copy(t4 = ms)
              case _ =>
            }
          }
          state.update(s)
          // the batch query's strict ordered-firsts CASE, verbatim
          val step =
            if (s.t1 < 0) 0
            else if (s.t2 < 0 || s.t2 <= s.t1) 1
            else if (s.t3 < 0 || s.t3 <= s.t2) 2
            else if (s.t4 < 0 || s.t4 <= s.t3) 3
            else 4
          Iterator(FunnelPos(uid, step,
            if (step == 4) s.t4 - s.t1 else -1L))
      }
  }

  def abUserFlags(ds: Dataset[AbEvent]): Dataset[AbFlags] = {
    import ds.sparkSession.implicits._
    val WindowMs = 86400000L
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[AbEvent], state: GroupState[AbState]) =>
          var s = state.getOption.getOrElse(AbState(Long.MaxValue, false))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
            val ms = e.ts.getTime
            if (e.event_type == "view" && ms < s.t0)
              s = AbState(ms, s.converted)
            if (e.event_type == "purchase" && s.t0 != Long.MaxValue &&
                ms > s.t0 && ms <= s.t0 + WindowMs)
              s = s.copy(converted = true)
          }
          state.update(s)
          Iterator(AbFlags(uid, (uid % 2).toInt,
            if (s.t0 != Long.MaxValue) 1 else 0,
            if (s.converted) 1 else 0))
      }
  }

  /** Streaming CDC apply: every micro-batch of keyed updates MERGEs into
    * the [[graft.pipeline.Store]] via `upsertProject` (stage-then-swap),
    * so the store always holds the latest version of each key — the
    * "change stream → serving table" shape. Per-batch merge is
    * idempotent for a replayed batch (same keys, same rows), which is
    * exactly the retry semantics foreachBatch needs. The store must be
    * bootstrapped (first full load via `put`) before streaming updates,
    * mirroring real CDC onboarding. Caller drives/stops the returned
    * query (tests: `processAllAvailable`). */
  def upsertStream(updates: DataFrame, store: graft.pipeline.Store,
                   projectId: String, key: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          store.upsertProject(batch.sparkSession, projectId, batch, key)
      }
      .start()

  /** Incremental batch-drain: process everything currently available in
    * a streaming source, then stop — the scheduled-ingest shape (a cron
    * job that picks up only files that arrived since the last run, with
    * the checkpoint carrying the high-water mark). `Trigger.AvailableNow`
    * bounds the run; `foreachBatch` writes each micro-batch to its own
    * `batch_id=N` partition with overwrite, so a retried batch lands
    * idempotently (the file-sink exactly-once pattern without a custom
    * commit protocol). At scale this is how 100 TB arrives: not one job,
    * but checkpointed increments. */
  def drainAvailableNow(transformed: DataFrame, outDir: String,
                        checkpoint: String): Unit = {
    val q = transformed.writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        b.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream-static enrichment: the event stream joined to a bounded
    * dimension table (user → attributes). The static side is planned as
    * a fresh batch scan inside EVERY micro-batch (so a dim table backed
    * by files picks up updates between batches), and `broadcast` keeps
    * the join map-side — no state store, no shuffle of the stream. This
    * is the standard 100 TB enrichment shape: the stream never pays more
    * than a hash probe per event. Left-outer so events with no dim row
    * survive null-padded (dropping them silently is the classic
    * enrichment bug). */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left_outer")

  /** Session windows per user with a 5-minute inactivity gap. Spark's
    * session end = last event + gap (half-open [start, end)). */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sumMoneyAsDouble(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("sum_value"))

  /** STREAMING near-dup candidate detection — incremental MinHash dedup
    * as documents arrive. Possible at all because the signature is the
    * map-only native `minhash_sig` expression (an aggregation-based
    * signature would be watermark-hostile mid-stream): each doc's 8 band
    * rows ride the micro-batch, and a `flatMapGroupsWithState` keyed by
    * (band, bhash) holds the bucket's member ids — when a new document
    * lands in a known bucket, it emits one candidate pair per existing
    * member, exactly the pairs the batch band join would produce
    * (StreamingSpec asserts set-equality with the batch candidates, and
    * that pairs arrive incrementally across micro-batches).
    *
    * The state IS the streaming form of the persisted minhash index
    * (`dedup_incremental`'s corpus side): one Seq[id] per occupied
    * bucket, sharded by the group key like any keyed state. At 100 TB
    * the bucket membership that ages out of the hot window is compacted
    * into the on-disk index and the stream join covers only the recent
    * horizon — the same split every streaming-dedup deployment runs.
    * A pair colliding in several bands is emitted once per band (the
    * batch path pays a dropDuplicates for the same reason); downstream
    * consumers dedupe or verify idempotently. */
  /** STREAMING keep-first segment dedup — the C4 rewrite decision
    * ([[graft.operators.Dedup.dedupKeepfirst]]) made incrementally as
    * documents arrive: each doc's non-overlapping 8-token segments ride
    * the micro-batch; keyed state per segment text records the first
    * owner, and every later occurrence — same batch or any later one —
    * is emitted `keep = false`. Within one micro-batch the group's rows
    * are ordered by (doc_id, seg_idx) before deciding, so a batch
    * replayed as one micro-batch is BIT-equal to the batch operator;
    * across micro-batches first-arrival wins, which equals the batch
    * answer whenever the stream is fed in corpus order (the resume/
    * append contract real ingest pipelines run — StreamingSpec asserts
    * the per-doc rollup matches dedup_keepfirst exactly across a
    * two-batch split). State is one (doc_id, seg_idx) pair per DISTINCT
    * segment — the streaming form of the keep-first window's partition,
    * sharded by the segment key like any keyed state. */
  def keepFirstSegments(docs: Dataset[DocIn]): Dataset[SegDecision] = {
    import docs.sparkSession.implicits._
    val SegTokens = 8
    val segs = docs.toDF()
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(SegTokens)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / SegTokens).cast("int").as("seg_idx"),
        size(slice(col("toks"), col("start") + 1, lit(SegTokens)))
          .as("seg_len"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(SegTokens)))
          .as("seg_text"))
      .as[SegRow]
    segs
      .groupByKey(_.seg_text)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[SegRow], state: GroupState[SegSeen]) =>
          // the group's within-batch rows are bounded (occurrences of ONE
          // segment text in one micro-batch); sorting restores the batch
          // operator's (doc_id, seg_idx) keep-first order
          val sorted = rows.toSeq.sortBy(r => (r.doc_id, r.seg_idx))
          var seen = state.getOption
          val out = sorted.map { r =>
            val keep = seen.isEmpty
            if (keep) {
              seen = Some(SegSeen(r.doc_id, r.seg_idx))
              state.update(seen.get)
            }
            SegDecision(r.doc_id, r.seg_idx, r.seg_len, keep)
          }
          out.iterator
      }
  }

  /** Per-order basket items an incremental co-occurrence tier must not
    * outgrow: real baskets here are ≤7 items; a pathological feed that
    * streams thousands of distinct items into one order saturates at
    * this cap (further items are dropped with their pairs — a documented
    * UPPER-bound contract like [[burstCensus]]'s, not silent state
    * growth). */
  val BasketCap = 1024

  /** Streaming item co-occurrence — the LIVE half of batch
    * `rec_item_cooccur`: as (order, item) rows arrive IN ANY micro-batch
    * interleaving, per-order state is the basket's item set (bounded by
    * [[BasketCap]]) and each genuinely-new item emits one increment pair
    * against every item already in the basket — so summing the emitted
    * pairs at any point equals the batch pair-support counts over the
    * data seen so far. Within a micro-batch the group's rows sort by
    * item_id, mirroring the batch operator's set semantics (duplicate
    * (order, item) arrivals emit nothing, exactly like the batch
    * DISTINCT). StreamingSpec proves stream≡batch across a two-batch
    * split and that the second batch emits against first-batch state. */
  def cooccurPairs(items: Dataset[BasketItem]): Dataset[CoPair] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.order_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BasketItem],
         state: GroupState[BasketState]) =>
          var members = state.getOption.map(_.items).getOrElse(Seq.empty)
          val out = Seq.newBuilder[CoPair]
          rows.toSeq.sortBy(_.item_id).foreach { r =>
            if (!members.contains(r.item_id) && members.size < BasketCap) {
              members.foreach { m =>
                out += CoPair(math.min(m, r.item_id),
                  math.max(m, r.item_id))
              }
              members = members :+ r.item_id
            }
          }
          state.update(BasketState(members))
          out.result().iterator
      }
  }

  def nearDupCandidates(docs: Dataset[DocIn]): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    val bands = Dedup.minhashBands(
      Dedup.minhashSignatureCols(docs.toDF().select("doc_id", "text")))
      .as[BandRow]
    bands
      .groupByKey(r => (r.band, r.bhash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow],
         state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val out = Seq.newBuilder[CandPair]
          rows.foreach { r =>
            if (!members.contains(r.doc_id)) {
              members.foreach { m =>
                out += CandPair(math.min(m, r.doc_id), math.max(m, r.doc_id))
              }
              members = members :+ r.doc_id
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** Streaming daily-volume anomaly monitor — the LIVE half of batch
    * `dq_volume_anomaly` (this is the alert a real ingest pages on; the
    * batch query is its historical audit): per event_type the state is
    * the trailing ≤7 CLOSED-day counts plus the open day's accumulator
    * — O(1) regardless of volume — and each day CLOSES when the first
    * event of a later day arrives (per-type in-order contract), emitting
    * exactly one immutable row (Append mode) with the same
    * cleared-denominator Poisson 3σ arithmetic as the batch query:
    * anomaly iff (n·k − Σ)² > 9·k·Σ over the trailing window, dev_ppm
    * sign-split exactly like the batch column. StreamingSpec proves the
    * emitted rows equal the batch frame on every closed day across a
    * micro-batch split (the open last day is the one row a live monitor
    * cannot yet know). */
  def volumeCensus(ds: Dataset[VolEvent]): Dataset[VolRow] = {
    import ds.sparkSession.implicits._
    def close(t: String, di: Long, n: Long,
              days: Seq[Long], counts: Seq[Long]): VolRow = {
      val k = counts.length.toLong
      val s = counts.sum
      val dev =
        if (s > 0) {
          val diff = n * k - s
          val sign = if (diff >= 0) 1L else -1L
          Some(sign * ((1000000L * math.abs(diff)) / s))
        } else None
      val anomaly = k >= 4 && s > 0 &&
        BigInt(n * k - s) * BigInt(n * k - s) > BigInt(9) * k * s
      VolRow(t, di, n, k, s, dev, anomaly)
    }
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (t: String, rows: Iterator[VolEvent],
         state: GroupState[VolState]) =>
          var s = state.getOption
            .getOrElse(VolState(Seq.empty, Seq.empty, Long.MinValue, 0L))
          val out = Seq.newBuilder[VolRow]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val di = java.lang.Math.floorDiv(e.ts.getTime, 86400000L)
            if (s.curDi == Long.MinValue) s = s.copy(curDi = di, curN = 1L)
            else if (di == s.curDi) s = s.copy(curN = s.curN + 1L)
            else {
              out += close(t, s.curDi, s.curN, s.days, s.counts)
              val nd = (s.days :+ s.curDi).takeRight(7)
              val nc = (s.counts :+ s.curN).takeRight(7)
              s = VolState(nd, nc, di, 1L)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming heavy-hitter candidates — the LIVE half of batch
    * `text_heavy_hitters` (the trending-vocabulary monitor a live corpus
    * intake runs; the batch query is its end-of-corpus exact audit):
    * tokens shard by portable hash, each shard maintains ONE
    * Misra–Gries sketch of capacity [[graft.operators.TextAnalysis
    * .MgCap]] across micro-batches (the same `misraGriesInto` fold the
    * batch mapPartitions pass runs, carried in ≤cap state), and every
    * micro-batch re-emits the shard's full candidate set stamped with an
    * epoch (Update mode — counters can DROP between batches, so only the
    * latest epoch's rows are the live answer).
    *
    * The contract is the MG SUPERSET GUARANTEE, not bit-equality: after
    * any prefix, each shard's candidates provably contain every token
    * with true shard frequency > shard_n/(cap+1); a token's shard never
    * changes, so the union over shards contains every GLOBAL heavy
    * hitter at threshold 1/200 ≪ cap/(cap+1) — StreamingSpec asserts
    * containment against the exact batch answer across a two-batch
    * split, plus the ≤cap state bound. State per shard: ≤[[graft
    * .operators.TextAnalysis.MgCap]] counters regardless of vocabulary
    * size — the only streaming-vocabulary shape that survives an
    * unbounded token domain. */
  def heavyHitterCandidates(ds: Dataset[TokEvent],
                            shards: Int = 8): Dataset[HhCand] = {
    import ds.sparkSession.implicits._
    val cap = graft.operators.TextAnalysis.MgCap
    ds.groupByKey(e => java.lang.Math.floorMod(
        e.token.hashCode, shards))
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[TokEvent],
         state: GroupState[HhShardState]) =>
          val s = state.getOption
            .getOrElse(HhShardState(Seq.empty, Seq.empty, 0L, 0L))
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          s.toks.iterator.zip(s.cnts.iterator).foreach { case (t, c) =>
            m(t) = c
          }
          var n = s.n
          val counted = rows.map { e => n += 1; e.token }
          graft.operators.TextAnalysis.misraGriesInto(m, counted, cap)
          val epoch = s.epoch + 1
          state.update(HhShardState(m.keys.toSeq, m.keys.toSeq.map(m),
            n, epoch))
          m.iterator.map { case (t, c) =>
            HhCand(shard, t, c, n, epoch)
          }.toSeq.iterator
      }
  }
}
