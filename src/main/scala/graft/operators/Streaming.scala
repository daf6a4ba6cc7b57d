package graft.operators

import graft.{Q, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-parity streaming queries (SURVEY.md §2.10): the same transforms
  * [[graft.streaming.Streams]] runs under Structured Streaming, executed
  * in batch mode over `events` so the DuckDB oracle applies. Streaming
  * execution (MemoryStream + watermark/late-data) is exercised in
  * StreamingSpec.
  */
object Streaming {

  /** Tumbling window aggregation. Spark's window origin and DuckDB's
    * time_bucket origin both align 10-minute buckets on the epoch grid. */
  val streamTumbling: Q = Q(
    "stream_tumbling",
    """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    // bucket-keyed full census outputs carry no presentation sort
    // (driver compare is row-order-insensitive; the range exchange +
    // sampling re-execution it cost is pure overhead — r11 opt, see
    // operators.Windows scaladoc)
    Streams.tumbling(Tables.events(s, d))
  }

  /** Hopping (sliding) windows, width 10 / slide 5: every event belongs to
    * the bucket it falls in and the one starting 5 minutes earlier. */
  val streamHopping: Q = Q(
    "stream_hopping",
    """WITH b AS (SELECT event_type,
      |    time_bucket(INTERVAL '5 minutes', ts) AS b5 FROM events),
      |x AS (SELECT event_type, b5 AS wstart FROM b
      |      UNION ALL
      |      SELECT event_type, b5 - INTERVAL 5 MINUTE AS wstart FROM b)
      |SELECT wstart AS window_start, event_type, count(*) AS n
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    Streams.hopping(Tables.events(s, d)) // no presentation sort (r11 opt)
  }

  /** Session windows (5-minute gap) via gaps-and-islands in the oracle:
    * a new session starts when the gap from the previous event is >= the
    * gap duration (Spark sessions are half-open [start, last+gap)). */
  val streamSession: Q = Q(
    "stream_session",
    """WITH x AS (SELECT user_id, ts, value,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |y AS (SELECT user_id, ts, value,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                 ROWS UNBOUNDED PRECEDING) AS sess FROM x)
      |SELECT min(ts) AS session_start, max(ts) + INTERVAL 5 MINUTE AS session_end,
      |  user_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM y GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin
  ) { (s, d) =>
    Streams.session(Tables.events(s, d)) // no presentation sort (r11 opt)
  }

  /** Resample + gap-fill: per-user hourly grid from first to last
    * event, zero-filled where no events fall — the dense-time-series
    * shape model training wants. Grid generation is `sequence` + explode
    * per user (rows ∝ user activity span, never a global calendar).
    * The user-level aggregate carries (lo, hi, bkt→n map) in ONE row per
    * user, so the grid fills by map lookup — no join of the grid back
    * onto the hourly counts, and the hourly aggregate is computed once
    * instead of once per consumer (the remaining sf0.1 cost is the
    * 1M-row presentation sort). The per-user map is bounded by the
    * activity span in hours — the same bound the sequence explode
    * already assumes. */
  val resampleGapfill: Q = Q(
    "resample_gapfill",
    """WITH c AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bkt,
      |             count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id AS uid, min(bkt) AS lo, max(bkt) AS hi FROM c GROUP BY 1),
      |g AS (SELECT uid AS user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bkt
      |      FROM b)
      |SELECT g.user_id, g.bkt AS bucket, COALESCE(c.n, 0) AS n
      |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bkt = c.bkt
      |ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"),
               window(col("ts"), "1 hour")("start").as("bkt"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(min(col("bkt")).as("lo"), max(col("bkt")).as("hi"),
           map_from_entries(collect_list(struct(col("bkt"), col("n"))))
             .as("m"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("bucket"), col("m"))
      .select(col("user_id"), col("bucket"),
              coalesce(element_at(col("m"), col("bucket")), lit(0L))
                .as("n")) // 1M-row grid: no presentation sort (r11 opt)
  }

  /** Linear-interpolation resampling — [[resampleGapfill]]'s sibling for
    * VALUE series (LOCF answers "what was the last reading?", interp
    * answers "what was the level AT this instant?" — the Timescale
    * `interpolate`/pandas `resample().interpolate()` contract). Per
    * user: known points are the hourly buckets that saw an event (value
    * picked by an INTEGER-ENCODED earliest-(ts, event_id) arg-min — no
    * engine-dependent tie rule), the grid spans first→last known
    * bucket, and every gap point gets v0 + (v1−v0)·(Δt/Δt01) from its
    * surrounding knowns. Observed points pass their value through the
    * CASE untouched, so only genuine gaps carry interpolation floats —
    * and those are exact-integer ms ratios under one correctly-rounded
    * multiply-add each, identical in both engines.
    *
    * Plan: ONE lead window over the SERIES frame (observed buckets —
    * bounded by events, usually far smaller than the grid) pairs each
    * known point with its successor; the gap points are then GENERATED
    * per segment (explode of an hour sequence with v0/v1 already in
    * hand) and unioned with the observed rows. The first cut of this
    * query instead ran four prev/next-carry windows over the GRID —
    * 40s at sf0.1 against ~1s for this form, the measured cost of
    * windowing a frame 10× larger than the information it carries;
    * generate-from-segments is also the 100 TB shape (grid rows never
    * enter an exchange: they are born in the map stage that follows
    * the series window). */
  val resampleInterp: Q = Q(
    "resample_interp",
    """WITH c AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bkt,
      |    arg_min(value, epoch_ms(ts) * 1000000 + event_id) AS v
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT user_id, bkt, v,
      |    lead(bkt) OVER (PARTITION BY user_id ORDER BY bkt) AS b1,
      |    lead(v) OVER (PARTITION BY user_id ORDER BY bkt) AS v1
      |  FROM c),
      |gaps AS (SELECT user_id,
      |    unnest(generate_series(bkt + INTERVAL '1 hour',
      |                           b1 - INTERVAL '1 hour',
      |                           INTERVAL '1 hour')) AS bucket,
      |    bkt AS b0, v AS v0, b1, v1
      |  FROM l WHERE b1 IS NOT NULL AND b1 > bkt + INTERVAL '1 hour')
      |SELECT user_id, bkt AS bucket, 1 AS observed, v AS v_interp FROM c
      |UNION ALL
      |SELECT user_id, bucket, 0 AS observed,
      |  v0 + (v1 - v0) *
      |    (CAST(epoch_ms(bucket) - epoch_ms(b0) AS DOUBLE)
      |     / CAST(epoch_ms(b1) - epoch_ms(b0) AS DOUBLE)) AS v_interp
      |FROM gaps
      |ORDER BY user_id, bucket""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("bkt")
    val series = Tables.events(s, d)
      .groupBy(col("user_id"),
               window(col("ts"), "1 hour")("start").as("bkt"))
      .agg(min_by(col("value"),
        unix_millis(col("ts")) * 1000000 + col("event_id")).as("v"))
    val led = series
      .withColumn("b1", lead(col("bkt"), 1).over(w))
      .withColumn("v1", lead(col("v"), 1).over(w))
    val hour = expr("INTERVAL 1 HOUR")
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
    series
      .select(col("user_id"), col("bkt").as("bucket"),
        lit(1).as("observed"), col("v").as("v_interp"))
      .unionAll(gaps) // 1M-row grid: no presentation sort (r11 opt)
  }

  /** Conversion funnel: per user, did a purchase follow a signup within
    * 24 hours? Built as min-signup vs min-qualifying-purchase per user —
    * two partial aggregations and one join by user key (no event-level
    * self-join blow-up). */
  val funnel: Q = Q(
    "funnel",
    """WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
      |           WHERE event_type = 'signup' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
      |      FROM events e JOIN s ON e.user_id = s.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      |        AND e.ts <= s.signup_ts + INTERVAL 24 HOURS
      |      GROUP BY 1)
      |SELECT s.user_id, s.signup_ts, p.purchase_ts,
      |  p.user_id IS NOT NULL AS converted
      |FROM s LEFT JOIN p ON s.user_id = p.user_id
      |ORDER BY s.user_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(signup, Seq("user_id"))
      .filter(col("ts") >= col("signup_ts") &&
              col("ts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
    signup.join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("purchase_ts"),
              col("purchase_ts").isNotNull.as("converted"))
  }

  /** MULTI-STEP FUNNEL CENSUS — the 4-stage product-analytics readout
    * [[funnel]]'s two-step per-user frame doesn't give: how many users
    * reach each stage of signup → view → click → purchase IN ORDER, the
    * per-stage drop-off, and the mean signup→purchase latency of full
    * converters. Ordering semantics are ORDERED FIRSTS (strict): stage k
    * counts only when the user's FIRST stage-k event is strictly later
    * than their first stage-(k−1) event — the conservative funnel that
    * needs only per-stage minima, is tie-stable (equal-ms events fail
    * the strict chain identically on both engines), and computes in ONE
    * user-keyed aggregate instead of a per-user sequence scan.
    *
    * Plan: one corpus-sized partial+final aggregate (user × 4 minima) →
    * a ≤5-row max_step census carrying the converter latency sum → the
    * 4-row stage spine cross-joins THAT (20-row broadcast frame). Exact
    * integers throughout: epoch-ms minima, floor-DIV ppm drop-offs,
    * floor-DIV mean latency. At 100 TB the only corpus-sized stage is
    * the first aggregate — the [[abSequential]] shape. */
  val funnelMultistep: Q = Q(
    "funnel_multistep",
    """WITH u AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS t1,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS t2,
      |    min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS t3,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t4
      |  FROM events GROUP BY 1),
      |s AS (SELECT user_id, t1, t4,
      |    CASE WHEN t1 IS NULL THEN 0
      |         WHEN t2 IS NULL OR t2 <= t1 THEN 1
      |         WHEN t3 IS NULL OR t3 <= t2 THEN 2
      |         WHEN t4 IS NULL OR t4 <= t3 THEN 3
      |         ELSE 4 END AS max_step
      |  FROM u),
      |c AS (SELECT max_step, count(*) AS n,
      |    CAST(sum(CASE WHEN max_step = 4 THEN t4 - t1 END) AS BIGINT)
      |      AS conv_ms
      |  FROM s GROUP BY 1),
      |spine AS (SELECT unnest([1, 2, 3, 4]) AS step),
      |r AS (SELECT sp.step,
      |    CAST(coalesce(sum(CASE WHEN c.max_step >= sp.step
      |                           THEN c.n END), 0) AS BIGINT) AS n_reached,
      |    CAST(coalesce(sum(CASE WHEN c.max_step >= sp.step - 1
      |                           THEN c.n END), 0) AS BIGINT) AS n_prev,
      |    CAST(sum(CASE WHEN sp.step = 4 AND c.max_step = 4
      |                  THEN c.conv_ms END) AS BIGINT) AS conv_ms_sum
      |  FROM spine sp CROSS JOIN c GROUP BY 1)
      |SELECT CAST(step AS INT) AS step, n_reached,
      |  CAST(CASE WHEN n_prev > 0
      |       THEN (1000000 * n_reached) // n_prev END AS BIGINT)
      |    AS reach_ppm,
      |  CAST(CASE WHEN step = 4 AND n_reached > 0
      |       THEN conv_ms_sum // n_reached END AS BIGINT)
      |    AS mean_convert_ms
      |FROM r ORDER BY step""".stripMargin
  ) { (s, d) =>
    def tmin(t: String): Column =
      min(when(col("event_type") === t, unix_millis(col("ts"))))
    val u = Tables.events(s, d)
      .groupBy("user_id")
      .agg(tmin("signup").as("t1"), tmin("view").as("t2"),
           tmin("click").as("t3"), tmin("purchase").as("t4"))
    val st = u.select(col("t1"), col("t4"),
      when(col("t1").isNull, 0)
        .when(col("t2").isNull || col("t2") <= col("t1"), 1)
        .when(col("t3").isNull || col("t3") <= col("t2"), 2)
        .when(col("t4").isNull || col("t4") <= col("t3"), 3)
        .otherwise(4).as("max_step"))
    val c = st.groupBy("max_step")
      .agg(count(lit(1)).as("n"),
        sum(when(col("max_step") === 4, col("t4") - col("t1")))
          .cast("long").as("conv_ms"))
    val spine = (1 to 4).map(Tuple1(_))
    val spineDf = s.createDataFrame(spine).toDF("step")
    spineDf.crossJoin(broadcast(c))
      .groupBy("step")
      .agg(
        coalesce(sum(when(col("max_step") >= col("step"), col("n"))),
          lit(0L)).cast("long").as("n_reached"),
        coalesce(sum(when(col("max_step") >= col("step") - 1, col("n"))),
          lit(0L)).cast("long").as("n_prev"),
        sum(when(col("step") === 4 && col("max_step") === 4,
          col("conv_ms"))).cast("long").as("conv_ms_sum"))
      .select(col("step").cast("int").as("step"), col("n_reached"),
        when(col("n_prev") > 0,
          expr("(1000000 * n_reached) div n_prev")).cast("long")
          .as("reach_ppm"),
        when(col("step") === 4 && col("n_reached") > 0,
          expr("conv_ms_sum div n_reached")).cast("long")
          .as("mean_convert_ms"))
  }

  /** TOKEN-BUCKET RATE-LIMITER SIMULATION — the capacity-planning query
    * behind every quota decision: replay the event stream through a
    * per-user bucket (capacity 3 tokens, refill 1/hour, continuous
    * accrual) and report, per event_type, how much traffic a proposed
    * limit would have denied. The per-user fold is the [[TimeSeries]]
    * ts_ewma SEQUENTIAL-RECURRENCE idiom: one user-keyed exchange, an
    * in-partition (user, ts, event_id) secondary sort, a mapPartitions
    * pass carrying O(1) state — here the bucket as exact REFILL-TIME
    * CREDIT in ms (credit += Δt, capped at 3 h; an allow spends 1 h),
    * so the whole simulation is integer arithmetic with zero float
    * surface and the strict (ts, event_id) order makes every decision
    * bit-deterministic. Oracle: the same recurrence as a RECURSIVE CTE
    * (the ewma discipline), then the same type census — the hash match
    * proves the distributed fold equals the sequential definition. */
  val rateLimitSim: Q = Q(
    "rate_limit_sim",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_type, ms, rn,
      |    CAST(10800000 - 3600000 AS BIGINT) AS credit,
      |    1 AS allowed
      |  FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.event_type, x.ms, x.rn,
      |    CASE WHEN least(r.credit + x.ms - r.ms, 10800000) >= 3600000
      |         THEN least(r.credit + x.ms - r.ms, 10800000) - 3600000
      |         ELSE least(r.credit + x.ms - r.ms, 10800000) END,
      |    CASE WHEN least(r.credit + x.ms - r.ms, 10800000) >= 3600000
      |         THEN 1 ELSE 0 END
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(allowed) AS BIGINT) AS n_allowed,
      |  CAST(count(*) - sum(allowed) AS BIGINT) AS n_denied,
      |  CAST((1000000 * (count(*) - sum(allowed))) // count(*) AS BIGINT)
      |    AS denied_ppm
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val CapMs = 10800000L  // 3 tokens × 1h refill each
    val CostMs = 3600000L  // one allow spends one hour of credit
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .select("user_id", "event_type", "ms")
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var credit = 0L
        var lastMs = 0L
        it.map { case (u, et, ms) =>
          if (u != curUser) { curUser = u; credit = CapMs; lastMs = ms }
          else { credit = math.min(credit + (ms - lastMs), CapMs); lastMs = ms }
          val allowed = credit >= CostMs
          if (allowed) credit -= CostMs
          (et, if (allowed) 1L else 0L)
        }
      }
      .toDF("event_type", "allowed")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("allowed")).cast("long").as("n_allowed"))
      .select(col("event_type"), col("n_events"), col("n_allowed"),
        (col("n_events") - col("n_allowed")).as("n_denied"),
        expr("(1000000 * (n_events - n_allowed)) div n_events")
          .cast("long").as("denied_ppm"))
  }

  /** GAP-CONSTRAINED SEQUENTIAL FUNNEL (the ClickHouse `windowFunnel`
    * semantics) — the strict companion to [[funnelMultistep]]'s
    * ordered-firsts census: stage k here is the EARLIEST stage-k event
    * strictly after the user's realized stage-(k−1) instant AND within
    * a 24 h gap of it, so a user who viewed before signing up still
    * converts if a later view follows the signup (ordered-firsts says
    * no — the two operators bracket real funnel behavior, and shipping
    * both makes the difference a queryable quantity).
    *
    * The sequential dependency (t₂ needs t₁'s value) cannot ride one
    * aggregate; it unrolls as FOUR chained per-user min-aggregates,
    * each one stage's events joined to the previous stage frame —
    * every round a user-keyed partial+final aggregate over ONE
    * event-type slice (partition-prunable at scale), state one BIGINT
    * per user per round. Exact epoch-ms integers; strict `>` makes
    * equal-instant chains fail identically on both engines.
    *
    * Oracle: the same four stages as chained CTEs — structurally the
    * plan itself, so the hash match proves the unroll. */
  val funnelWindowed: Q = Q(
    "funnel_windowed",
    """WITH s1 AS (SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
      |       FROM events e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'view' AND epoch_ms(e.ts) > s1.t1
      |         AND epoch_ms(e.ts) <= s1.t1 + 86400000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
      |       FROM events e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s2.t2
      |         AND epoch_ms(e.ts) <= s2.t2 + 86400000 GROUP BY 1),
      |s4 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t4
      |       FROM events e JOIN s3 ON e.user_id = s3.user_id
      |       WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s3.t3
      |         AND epoch_ms(e.ts) <= s3.t3 + 86400000 GROUP BY 1),
      |c AS (SELECT 1 AS step, CAST(count(*) AS BIGINT) AS n_reached
      |        FROM s1
      |      UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM s2
      |      UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM s3
      |      UNION ALL SELECT 4, CAST(count(*) AS BIGINT) FROM s4)
      |SELECT CAST(step AS INT) AS step, n_reached
      |FROM c ORDER BY step""".stripMargin
  ) { (s, d) =>
    val G = 86400000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    def stage(prev: DataFrame, tPrev: String, t: String,
              etype: String): DataFrame =
      ev.filter(col("event_type") === etype)
        .join(prev, Seq("user_id"))
        .filter(col("ms") > col(tPrev) && col("ms") <= col(tPrev) + G)
        .groupBy("user_id").agg(min(col("ms")).as(t))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ms")).as("t1"))
    val s2 = stage(s1, "t1", "t2", "view")
    val s3 = stage(s2, "t2", "t3", "click")
    val s4 = stage(s3, "t3", "t4", "purchase")
    def cnt(df: DataFrame, step: Int): DataFrame =
      df.agg(count(lit(1)).as("n_reached"))
        .select(lit(step).cast("int").as("step"), col("n_reached"))
    cnt(s1, 1).union(cnt(s2, 2)).union(cnt(s3, 3)).union(cnt(s4, 4))
      .orderBy("step")
  }

  /** TOP USER JOURNEYS (path analysis, the product-analytics sibling of
    * [[eventTransitions]]' Markov edges): each user's first five events
    * in (ts, event_id) order collapse to a `a>b>c` path string, and the
    * paths rank by user count — "what do people actually do first",
    * which single-step transition counts cannot answer (they lose the
    * sequence).
    *
    * Determinism: event_id breaks ts ties, so every user has exactly one
    * path on both engines; (n_users DESC, path) totally orders the cut.
    *
    * Plan shape: events shuffle ONCE keyed by user for the rank window;
    * the `rn <= 5` cut bounds everything after — the per-user
    * collect_list holds at most five (rn, type) structs (NOT the user's
    * whole history: the window streams sorted rows and keeps only a
    * counter, which is why rank-then-collect beats collect-then-sort at
    * scale), the user-keyed aggregate reuses the window's partitioning
    * (no second exchange), the path-keyed count is partial+final, and
    * the top-20 is TakeOrderedAndProject. */
  val eventPaths: Q = Q(
    "event_paths",
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
      |        count(*) AS len
      |      FROM r WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, CAST(len AS BIGINT) AS len,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM p GROUP BY 1, 2
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val r = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("rn") <= 5)
    r.groupBy("user_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("rn"),
                      col("event_type")))),
                    x => x.getField("event_type")), ">").as("path"),
        count(lit(1)).as("len"))
      .groupBy("path", "len").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path")).limit(20)
  }

  /** Cohort retention (product-analytics staple): users grouped by the
    * day of their first activity; for each (cohort day, day offset ≤ 7)
    * the number of cohort members active that day. Aggregate-then-join:
    * activity reduces to DISTINCT (user, day) and cohorts to one row per
    * user BEFORE the join, so the join input is bounded by users×days,
    * never raw events; with distinct activity rows and one cohort per
    * user, count(*) IS the distinct-user count — no second distinct
    * shuffle. */
  val retentionCohort: Q = Q(
    "retention_cohort",
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
      |SELECT cohort_day, CAST(datediff('day', cohort_day, day) AS INT) AS day_offset,
      |  count(*) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id
      |WHERE datediff('day', cohort_day, day) <= 7
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin
  ) { (s, d) =>
    val activity = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = activity.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, Seq("user_id"))
      .select(col("cohort_day"),
              datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Markov transition census over the event stream: for every ordered
    * per-user event pair, how often each `event_type → next` transition
    * occurs and the mean gap between them (the input to next-action
    * prediction and anomalous-flow detection). Plan: ONE shuffle keyed
    * by user_id feeds the `lead` window, then a partial+final aggregate
    * on the (type, next) pair — event rows never shuffle twice. Gap math
    * is integer milliseconds summed as BIGINT (exact, order-independent);
    * the mean is a single int/int double division. Ordering ties break on
    * event_id so the transition sequence is deterministic under any
    * partitioning. */
  val eventTransitions: Q = Q(
    "event_transitions",
    """WITH o AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
      |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ms
      |  FROM events)
      |SELECT event_type, next_type, count(*) AS n,
      |  CAST(sum(next_ms - ms) AS BIGINT) AS sum_gap_ms,
      |  CAST(sum(next_ms - ms) AS DOUBLE) / count(*) AS avg_gap_ms
      |FROM o WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts"), unix_millis(col("ts")).as("ms"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_ms", lead(col("ms"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"),
           sum(col("next_ms") - col("ms")).as("sum_gap_ms"),
           (sum(col("next_ms") - col("ms")).cast("double") / count(lit(1)))
             .as("avg_gap_ms"))
  }

  /** OHLC bars (time-series downsampling staple): per (user, hour), the
    * first/highest/lowest/last `value` plus row count and exact volume.
    * Open/close are ordered picks — `min_by`/`max_by` keyed by event
    * time, deterministic because (user_id, ts) is unique in `events`
    * (enforced by the oracle's arg_min needing a total order). Plan: one
    * hash aggregate, partial+final — the ordered picks fold map-side, so
    * raw events cross the exchange only as per-group partial states.
    * Volume sums as DECIMAL (exact, order-independent) then casts. */
  val ohlcBars: Q = Q(
    "ohlc_bars",
    """SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour,
      |  CAST(count(*) AS BIGINT) AS n,
      |  arg_min(value, ts) AS open,
      |  max(value) AS high, min(value) AS low,
      |  arg_max(value, ts) AS close,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
           min_by(col("value"), col("ts")).as("open"),
           max(col("value")).as("high"), min(col("value")).as("low"),
           max_by(col("value"), col("ts")).as("close"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("volume")) // no presentation sort (r11 opt)
  }

  /** Gaps-and-islands sessionization: the SQL formulation of what
    * [[streamSession]] gets from `session_window` — a session-break flag
    * (gap > 5 min) cumulatively summed per user numbers the sessions,
    * then one aggregate per (user, session). The two window passes and
    * the aggregate all key by user, so events shuffle ONCE; gap math is
    * exact BIGINT millis over a provably-total order (event_id breaks
    * ts ties). The technique matters beyond sessions: any "number the
    * runs of consecutive rows" problem (downtime intervals, streak
    * analysis) is this exact plan. */
  val sessionizeGaps: Q = Q(
    "sessionize_gaps",
    """WITH g AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         > 300000 THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, ms,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS INT) AS session_id,
      |  count(*) AS n_events,
      |  CAST(min(ms) AS BIGINT) AS start_ms, CAST(max(ms) AS BIGINT) AS end_ms,
      |  CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val wMs = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Long.MinValue, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              unix_millis(col("ts")).as("ms"))
      .withColumn("brk",
        when(col("ms") - lag(col("ms"), 1).over(w) > 300000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(wMs).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
           (max(col("ms")) - min(col("ms"))).as("duration_ms"))
      // no presentation sort (r11 opt, see operators.Windows)
  }

  /** SEQUENTIAL PATTERN MATCH (the MATCH_RECOGNIZE / Flink-CEP shape):
    * find view → click → purchase subsequences per user — strictly
    * increasing (ts, event_id) order, arbitrary other events in between
    * — and emit one match row per purchase that completes a chain,
    * carrying the matched click and view timestamps.
    *
    * The trick that keeps this ONE window pass per pattern step (instead
    * of a k-way self-join over the event stream): a running max over
    * strictly-preceding rows carries "the latest qualifying prefix" —
    * lv = latest view; then a click is QUALIFIED iff lv is set, and
    * because both the qualified-click ts sequence AND the lv sequence
    * are nondecreasing in event order, running maxes over
    * (qualified-click ts, its lv) recover exactly the latest qualified
    * click and ITS view. Every comparison is on raw (ts, event_id) —
    * no floats — and the total order is provably total, so both engines
    * agree row-for-row.
    *
    * Scale: both window steps share one user-keyed sort (Spark plans
    * adjacent same-spec windows on a single exchange+sort); frames are
    * user-history-sized — the standard event-analytics bound, as in
    * `event_transitions`. A longer pattern adds one running max per
    * step, never a join. */
  val patternSeq: Q = Q(
    "pattern_seq",
    """WITH w1 AS (SELECT user_id, event_id, ts, event_type,
      |    max(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
      |  FROM events),
      |w2 AS (SELECT *,
      |    max(CASE WHEN event_type = 'click' AND lv IS NOT NULL THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts,
      |    max(CASE WHEN event_type = 'click' AND lv IS NOT NULL THEN lv END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
      |  FROM w1)
      |SELECT user_id, event_id, ts AS purchase_ts, click_ts, view_ts
      |FROM w2 WHERE event_type = 'purchase' AND click_ts IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("lv",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("click_ts",
        max(when(col("event_type") === "click" && col("lv").isNotNull,
                 col("ts"))).over(w))
      .withColumn("view_ts",
        max(when(col("event_type") === "click" && col("lv").isNotNull,
                 col("lv"))).over(w))
      .filter(col("event_type") === "purchase" && col("click_ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
              col("click_ts"), col("view_ts"))
  }

  /** LAST-TOUCH ATTRIBUTION (the marketing-analytics staple): each
    * purchase's revenue is credited to the campaign of the latest click
    * that preceded it, then credit aggregates per campaign. The campaign
    * id lives in the event's JSON props (`$.k` — exercised through real
    * JSON extraction, not a pre-split column).
    *
    * The "value AT the latest preceding click" lookup uses the
    * [[patternSeq]] running-max trick with an INTEGER ENCODING: carrying
    * max(ms·1000 + k) over preceding clicks preserves the time order
    * (k < 1000) and decodes to the campaign with one modulo — both
    * engines do exact int64 arithmetic, so no arg-max tie rules are ever
    * engine-dependent. One user-keyed window sort + one partial+final
    * aggregate; revenue sums as DECIMAL (exact in any order). */
  val attributionLastclick: Q = Q(
    "attribution_lastclick",
    """WITH e AS (SELECT user_id, event_id, ts, event_type, value,
      |    epoch_ms(ts) * 1000 + CAST(json_extract_string(props, '$.k') AS BIGINT) AS ck
      |  FROM events),
      |w AS (SELECT *,
      |    max(CASE WHEN event_type = 'click' THEN ck END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lck
      |  FROM e)
      |SELECT CAST(lck % 1000 AS BIGINT) % 4 AS campaign,
      |  count(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM w WHERE event_type = 'purchase' AND lck IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"),
        (unix_millis(col("ts")) * 1000 +
          get_json_object(col("props"), "$.k").cast("long")).as("ck"))
      .withColumn("lck",
        max(when(col("event_type") === "click", col("ck"))).over(w))
      .filter(col("event_type") === "purchase" && col("lck").isNotNull)
      .groupBy((col("lck") % 1000 % 4).as("campaign"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
  }

  /** LINEAR (multi-touch) attribution — [[attributionLastclick]]'s
    * equal-split sibling: each purchase's revenue divides equally over
    * ALL of that user's preceding clicks. The naive form materializes
    * every (purchase × preceding click) pair — a user-bounded but
    * quadratic blowup. This plan never builds pairs: a purchase's
    * per-click share rides a suffix-sum window back onto the clicks
    * (credit(click) = Σ shares of later purchases), so the whole
    * computation is ONE user-keyed sort carrying three window
    * functions.
    *
    * Exactness: revenue quantizes to micro-cents and the equal split is
    * INTEGER floor division (positive operands, so Spark's truncating
    * `div` and DuckDB's flooring `//` agree), making every suffix sum
    * an exact BIGINT — a double suffix sum would be frame-order-
    * dependent (the [[graft.operators.TimeSeries]] DECIMAL-through-
    * windows rule). The floor remainder (< n_clicks µ¢ per purchase)
    * is the documented cost of exactness. */
  val attributionLinear: Q = Q(
    "attribution_linear",
    """WITH e AS (SELECT user_id, event_id, ts, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS campaign
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |w1 AS (SELECT *, count(CASE WHEN event_type = 'click' THEN 1 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_clicks
      |  FROM e),
      |w2 AS (SELECT *, CASE WHEN event_type = 'purchase' AND cents > 0
      |                       AND n_clicks > 0
      |                 THEN (cents * 1000000) // n_clicks END AS share
      |  FROM w1),
      |w3 AS (SELECT *, sum(share)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS credit
      |  FROM w2)
      |SELECT campaign, CAST(count(*) AS BIGINT) AS n_clicks_credited,
      |  CAST(sum(credit) AS BIGINT) AS credit_microcents,
      |  CAST(sum(credit) AS DOUBLE) / 100000000 AS credit_usd
      |FROM w3 WHERE event_type = 'click' AND credit IS NOT NULL
      |  AND campaign IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val sort = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val before = sort.rowsBetween(Window.unboundedPreceding, -1)
    val after = sort.rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (get_json_object(col("props"), "$.k").cast("long") % 4)
          .as("campaign"))
      .withColumn("n_clicks",
        count(when(col("event_type") === "click", 1)).over(before))
      .withColumn("share",
        when(col("event_type") === "purchase" && col("cents") > 0 &&
             col("n_clicks") > 0,
          expr("(cents * 1000000) div n_clicks")))
      .withColumn("credit", sum(col("share")).over(after))
      // campaign IS NOT NULL on BOTH sides: a missing/non-numeric props.$.k
      // yields a NULL campaign group, and DuckDB orders NULLs last where
      // Spark orders them first — the parity would then rest on a fixture
      // invariant instead of the plan (ADVICE r4).
      .filter(col("event_type") === "click" && col("credit").isNotNull &&
        col("campaign").isNotNull)
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_clicks_credited"),
        sum(col("credit")).as("credit_microcents"),
        (sum(col("credit")).cast("double") / lit(100000000))
          .as("credit_usd"))
  }

  /** TIME-DECAY attribution — the triad's third member after last-touch
    * ([[attributionLastclick]]) and equal-split ([[attributionLinear]]):
    * each purchase's revenue divides over its preceding clicks with
    * weight 2^(−days between) — yesterday's click earns twice the credit
    * of the day before's. Weights are DYADIC on whole-day gaps, so
    * `w_ppm = 1000000 div 2^d` is exact integer on both engines (no
    * pow/ln rounding in the value path), and each pair's credit is one
    * BIGINT floor division of cents·10⁶·w by the purchase's weight sum.
    *
    * Plan-shape note — why this is a bounded PAIR JOIN when
    * [[attributionLinear]] rides suffix-sum windows: the decay kernel
    * factorizes (2^{−(tₚ−t_c)} = 2^{−tₚ}·2^{t_c}), so a window form
    * exists, but its running factors grow as 2^{t/τ} — double overflow
    * on any user whose history spans a few hundred halflives, i.e. a
    * latent data-dependent bomb at 100 TB. The deployment-standard form
    * is an explicit LOOKBACK window (d ≤ 19 days, where the ppm weight
    * hits zero anyway): the join keys on user_id with a range predicate,
    * fan-out is bounded by per-user clicks inside the lookback, and
    * every downstream stage is pair- or purchase-keyed. */
  val attributionTimedecay: Q = Q(
    "attribution_timedecay",
    """WITH e AS (SELECT user_id, event_id, ts, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS campaign,
      |    epoch_ms(ts) // 86400000 AS day
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |c AS (SELECT user_id, event_id, ts, campaign, day FROM e
      |      WHERE event_type = 'click' AND campaign IS NOT NULL),
      |p AS (SELECT user_id, event_id, ts, cents, day FROM e
      |      WHERE event_type = 'purchase' AND cents > 0),
      |pr AS (SELECT c.campaign, p.event_id AS purch_id, p.cents,
      |         1000000 // CAST(power(2, p.day - c.day) AS BIGINT) AS w_ppm
      |       FROM c JOIN p ON c.user_id = p.user_id
      |        AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
      |        AND p.day - c.day <= 19),
      |z AS (SELECT purch_id, sum(w_ppm) AS z FROM pr GROUP BY 1),
      |cr AS (SELECT pr.campaign,
      |         (CAST(pr.cents AS HUGEINT) * 1000000 * pr.w_ppm) // z.z
      |           AS credit
      |       FROM pr JOIN z USING (purch_id))
      |SELECT campaign, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(credit) AS BIGINT) AS credit_microcents,
      |  CAST(sum(credit) AS DOUBLE) / 100000000 AS credit_usd
      |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (get_json_object(col("props"), "$.k").cast("long") % 4)
          .as("campaign"),
        expr("unix_millis(ts) div 86400000").as("day"))
    val c = e.filter(col("event_type") === "click" &&
        col("campaign").isNotNull)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"), col("campaign"), col("day").as("cday"))
    val p = e.filter(col("event_type") === "purchase" && col("cents") > 0)
      .select(col("user_id"), col("event_id").as("purch_id"),
        col("ts").as("pts"), col("cents"), col("day").as("pday"))
    val pr = c.join(p, Seq("user_id"))
      .filter((col("cts") < col("pts") ||
        (col("cts") === col("pts") && col("click_id") < col("purch_id"))) &&
        col("pday") - col("cday") <= 19)
      .select(col("campaign"), col("purch_id"), col("cents"),
        expr("1000000 div cast(power(2, pday - cday) as bigint)")
          .as("w_ppm"))
    val z = pr.groupBy("purch_id").agg(sum(col("w_ppm")).as("z"))
    pr.join(z, Seq("purch_id"))
      .select(col("campaign"),
        // HUGEINT/DECIMAL(38,0) numerator on BOTH engines: cents·10⁶·w_ppm
        // overflows int64 for any purchase above ~$92K — DuckDB would raise,
        // non-ANSI Spark would wrap silently (ADVICE r7). credit itself is
        // ≤ cents·10⁶ (w_ppm ≤ z), so the div lands back in BIGINT.
        expr("(cast(cents as decimal(38,0)) * 1000000 * w_ppm) div z")
          .as("credit"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("credit")).as("credit_microcents"),
        (sum(col("credit")).cast("double") / lit(100000000))
          .as("credit_usd"))
  }

  /** SHAPLEY-VALUE ATTRIBUTION (Shapley 1953 applied to conversion paths
    * — the game-theoretic credit rule behind "data-driven attribution"):
    * each purchase's journey is the SET of channel types the user touched
    * in the 19-day lookback, the coalition value v(S) is the number of
    * conversions reachable using only channels in S (v(S) = Σ conversions
    * whose touch set ⊆ S — monotone by construction), and channel i's
    * credit is the Shapley value Σ_{S ∌ i} |S|!·(n−1−|S|)!/n! ·
    * (v(S∪i) − v(S)). Unlike [[attributionLastclick]]/[[attributionLinear]]
    * /[[attributionTimedecay]] (positional rules), Shapley credits
    * channels by their marginal contribution over every coalition — the
    * only rule that is efficient, symmetric, and dummy-free.
    *
    * Exactness: the channel domain is the four non-purchase event types
    * (click=1, error=2, signup=4, view=8 — alphabetical bit order), so
    * n = 4 and every Shapley weight is |S|!·(3−|S|)!/4! — kept as the
    * INTEGER numerator (6,2,2,6 by |S|) over the constant 24. Credits
    * ship as the exact ×24 integer (`shapley_num24`), a milli-unit
    * floor-div, and a ppm share of attributed conversions; untouched
    * conversions (empty set) appear in v(∅) and cancel in every marginal,
    * exactly as the axioms require. The ppm numerator widens to
    * HUGEINT/DECIMAL(38,0) (10⁶·24·conversions clears int64 past ~4e11
    * conversions — the [[attributionTimedecay]] overflow discipline).
    *
    * Plan: the only corpus-sized work is the same user-keyed
    * purchase×touch pair join as [[attributionTimedecay]] followed by a
    * purchase-keyed bit_or — one exchange, one BIGINT of state per
    * conversion. Everything after operates on the 16-row mask census:
    * the subset-sum v(S), the 4×8 marginal fold, and the shares are
    * joins over ≤16-row broadcast frames — constant work at any corpus
    * size. (A |C|-channel domain grows this tail as 2^|C|; the bounded
    * event-type domain is what makes exact Shapley tractable — the same
    * |types|-bounded-state argument as [[markovStationary]].) */
  val attributionShapley: Q = Q(
    "attribution_shapley",
    """WITH p AS (SELECT user_id, event_id AS purch_id, ts AS pts,
      |        epoch_ms(ts) // 86400000 AS pday
      |      FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id, ts,
      |        CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |             WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS bit,
      |        epoch_ms(ts) // 86400000 AS day
      |      FROM events WHERE event_type <> 'purchase'),
      |m AS (SELECT p.purch_id,
      |        CAST(COALESCE(bit_or(t.bit), 0) AS BIGINT) AS mask
      |      FROM p LEFT JOIN t ON t.user_id = p.user_id
      |        AND (t.ts < p.pts OR (t.ts = p.pts AND t.event_id < p.purch_id))
      |        AND p.pday - t.day <= 19
      |      GROUP BY 1),
      |cnt AS (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1),
      |sets AS (SELECT CAST(s AS BIGINT) AS s FROM range(0, 16) t(s)),
      |v AS (SELECT sets.s, CAST(COALESCE(sum(cnt.c), 0) AS BIGINT) AS v
      |      FROM sets LEFT JOIN cnt ON (cnt.mask | sets.s) = sets.s
      |      GROUP BY 1),
      |ch(bit, channel) AS (VALUES (1, 'click'), (2, 'error'),
      |                            (4, 'signup'), (8, 'view')),
      |sh AS (SELECT ch.channel, ch.bit,
      |         CAST(sum((CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
      |                   WHEN 2 THEN 2 ELSE 6 END) * (v1.v - v0.v))
      |           AS BIGINT) AS num
      |       FROM ch JOIN v v0 ON (v0.s & ch.bit) = 0
      |               JOIN v v1 ON v1.s = (v0.s | ch.bit)
      |       GROUP BY 1, 2),
      |tc AS (SELECT ch.bit, CAST(COALESCE(sum(cnt.c), 0) AS BIGINT)
      |         AS n_touched
      |       FROM ch LEFT JOIN cnt ON (cnt.mask & ch.bit) <> 0
      |       GROUP BY 1),
      |tot AS (SELECT max(CASE WHEN s = 15 THEN v END)
      |             - max(CASE WHEN s = 0 THEN v END) AS attributed FROM v)
      |SELECT sh.channel, tc.n_touched,
      |  sh.num AS shapley_num24,
      |  CAST((1000 * sh.num) // 24 AS BIGINT) AS shapley_milli,
      |  CAST(CASE WHEN tot.attributed > 0
      |       THEN (1000000 * CAST(sh.num AS HUGEINT))
      |            // (24 * tot.attributed) ELSE 0 END AS BIGINT)
      |    AS share_ppm
      |FROM sh JOIN tc ON tc.bit = sh.bit CROSS JOIN tot
      |ORDER BY channel""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purch_id"),
        col("ts").as("pts"), col("day").as("pday"))
    val t = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("ts").as("tts"), col("day").as("tday"),
        when(col("event_type") === "click", 1L)
          .when(col("event_type") === "error", 2L)
          .when(col("event_type") === "signup", 4L)
          .when(col("event_type") === "view", 8L).as("bit"))
    val m = p.join(t,
        col("user_id") === col("t_user") &&
          (col("tts") < col("pts") ||
            (col("tts") === col("pts") && col("t_id") < col("purch_id"))) &&
          col("pday") - col("tday") <= 19, "left")
      .groupBy("purch_id")
      .agg(coalesce(expr("bit_or(bit)"), lit(0L)).as("mask"))
    val cnt = m.groupBy("mask").agg(count(lit(1)).as("c"))
    val sets = (0L until 16L).toDF("s")
    val v = sets.join(broadcast(cnt),
        (col("mask").bitwiseOR(col("s"))) === col("s"), "left")
      .groupBy("s").agg(coalesce(sum(col("c")), lit(0L)).as("v"))
    val ch = Seq((1L, "click"), (2L, "error"), (4L, "signup"),
      (8L, "view")).toDF("bit", "channel")
    val weight = when(expr("bit_count(s0)").isin(0, 3), 6L).otherwise(2L)
    val sh = ch
      .join(broadcast(v.select(col("s").as("s0"), col("v").as("v0"))),
        col("s0").bitwiseAND(col("bit")) === 0)
      .join(broadcast(v.select(col("s").as("s1"), col("v").as("v1"))),
        col("s1") === col("s0").bitwiseOR(col("bit")))
      .groupBy("bit", "channel")
      .agg(sum(weight * (col("v1") - col("v0"))).as("num"))
    val tc = ch.select(col("bit").as("tbit"))
      .join(broadcast(cnt), col("mask").bitwiseAND(col("tbit")) =!= 0,
        "left")
      .groupBy("tbit").agg(coalesce(sum(col("c")), lit(0L)).as("n_touched"))
    val tot = v.agg(
      (max(when(col("s") === 15, col("v"))) -
        max(when(col("s") === 0, col("v")))).as("attributed"))
    sh.join(tc, col("bit") === col("tbit"))
      .crossJoin(broadcast(tot))
      .select(col("channel"), col("n_touched"),
        col("num").as("shapley_num24"),
        expr("(1000 * num) div 24").cast("long").as("shapley_milli"),
        when(col("attributed") > 0,
          expr("""(1000000 * cast(num as decimal(38,0)))
                  div (24 * attributed)"""))
          .otherwise(lit(0L)).cast("long").as("share_ppm"))
  }

  /** Slowly-changing-dimension type-2 build from the event stream: per
    * user, change-capture on event_type (consecutive repeats collapse
    * into one validity interval), then each surviving change becomes a
    * history row [valid_from, valid_to) with `is_current` on the open
    * interval and a per-user version counter — the dimension-table shape
    * every warehouse load job derives from a mutation log.
    *
    * Plan: ONE user-keyed exchange; the change-capture lag, the
    * valid_to lead and the version row_number all share the same
    * (user_id | ts, event_id) sort, and the filter between them
    * preserves that order, so Catalyst plans one Exchange + one Sort
    * with three window operators stacked on it. The (ts, event_id)
    * secondary key makes equal-timestamp mutations deterministic —
    * the ADVICE.md tie-break discipline. At 100 TB this is the minimal
    * shape: no self-join, no second shuffle, state bounded per user. */
  /** The SCD2 history as a shared CTE chain: `h` is the versioned
    * dimension. Shared verbatim by [[scd2]] and [[joinPit]] so the
    * history build and the point-in-time join cannot drift. */
  private val Scd2Sql: String =
    """e AS (SELECT user_id, event_id, ts, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_id, ts, event_type FROM e
      |      WHERE prev IS NULL OR prev <> event_type),
      |h AS (SELECT user_id, event_type AS attr, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current,
      |  CAST(row_number() OVER w AS BIGINT) AS version
      |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin

  /** The SCD2 history frame (Spark side of [[Scd2Sql]]'s `h`). */
  private def scd2Frame(s: SparkSession, d: String): DataFrame =
    scd2Of(Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type")))

  /** Change-extraction + versioning over an arbitrary (user_id,
    * event_id, ts, event_type) frame — shared by the full rebuild
    * ([[scd2]]) and the incremental maintainer ([[scd2Incremental]]'s
    * base-history build). */
  private def scd2Of(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("attr"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L)
          .as("is_current"),
        row_number().over(w).cast("long").as("version"))
  }

  /** INCREMENTAL SCD2 MAINTENANCE — the daily dimension load a
    * warehouse actually runs (full rebuilds over a 100 TB fact history
    * are the thing SCD2 exists to avoid): build the base history from
    * events up to the data's own midpoint, then MERGE the later batch
    * in — new change rows seed their change detection against each
    * user's current attr, versions continue from the user's base max,
    * and the displaced current rows close at their user's first new
    * change. The oracle is the FULL REBUILD over all events (the
    * [[scd2]] CTE verbatim), so the driver's hash compare is exactly
    * the merge ≡ rebuild theorem — the [[graft.operators.Relational]]
    * agg_incremental discipline applied to a type-2 dimension.
    *
    * Equivalence argument, mirrored in code: the seed attr equals the
    * last base EVENT's type (events after a user's last base change all
    * share its attr — that is what "no further change" means), so
    * boundary change detection matches the rebuild; version numbering
    * concatenates; and the base current row's valid_to in the rebuild
    * is precisely the user's first new change ts.
    *
    * Plan: two user-keyed window exchanges (base build, new-batch
    * detection over the seed union) plus broadcast joins of the
    * users×1 seed/base-version frames — the batch is the only
    * corpus-sized input touched twice, the base history never rebuilds.
    */
  val scd2Incremental: Q = Q(
    "scd2_incremental",
    s"""WITH $Scd2Sql
       |SELECT user_id, attr, valid_from, valid_to, is_current, version
       |FROM h ORDER BY user_id, version""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
    val mid = ev.agg(expr(
      "(min(unix_millis(ts)) + max(unix_millis(ts))) div 2").as("mid"))
    val withMid = ev.crossJoin(broadcast(mid))
    val base = scd2Of(withMid
      .filter(expr("unix_millis(ts) <= mid"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type")))
    val batch = withMid.filter(expr("unix_millis(ts) > mid"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
    // seed: each user's current attr, injected as a pseudo-event BELOW
    // every batch event (base events all precede the batch in ts)
    val seed = base.filter(col("is_current") === 1)
      .select(col("user_id"), lit(-1L).as("event_id"),
        col("valid_from").as("ts"), col("attr").as("event_type"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = batch.unionByName(seed)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("event_id") =!= -1L &&
        (col("prev").isNull || col("prev") =!= col("event_type")))
    val vbase = base.groupBy(col("user_id").as("vb_user"))
      .agg(max(col("version")).as("vbase"))
    val wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newRows = changes
      .withColumn("rn", row_number().over(wc).cast("long"))
      .join(broadcast(vbase), col("user_id") === col("vb_user"), "left")
      .select(col("user_id"), col("event_type").as("attr"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(wc).as("valid_to"),
        when(lead(col("ts"), 1).over(wc).isNull, 1L).otherwise(0L)
          .as("is_current"),
        (coalesce(col("vbase"), lit(0L)) + col("rn")).as("version"),
        col("rn"))
    val firstNew = newRows.filter(col("rn") === 1)
      .select(col("user_id").as("fn_user"),
        col("valid_from").as("first_new"))
    val baseAdj = base
      .join(broadcast(firstNew), col("user_id") === col("fn_user"),
        "left")
      .select(col("user_id"), col("attr"), col("valid_from"),
        when(col("is_current") === 1 && col("first_new").isNotNull,
          col("first_new")).otherwise(col("valid_to")).as("valid_to"),
        when(col("is_current") === 1 && col("first_new").isNotNull, 0L)
          .otherwise(col("is_current")).as("is_current"),
        col("version"))
    baseAdj.unionByName(newRows.drop("rn"))
      // no presentation sort (r11 opt, see operators.Windows)
  }

  val scd2: Q = Q(
    "scd2_history",
    s"""WITH $Scd2Sql
       |SELECT user_id, attr, valid_from, valid_to, is_current, version
       |FROM h ORDER BY user_id, version""".stripMargin
  ) { (s, d) => scd2Frame(s, d) } // no presentation sort (r11 opt)

  /** POINT-IN-TIME JOIN (the warehouse "join fact to the dimension
    * version valid at event time"): each purchase looks up the SCD2
    * version whose [valid_from, valid_to) interval covers its timestamp
    * — the lookup every feature-store and revenue-reporting pipeline
    * runs, and the one an as-of join approximates only when history is
    * append-only. Shares the history definition with [[scd2]] verbatim
    * (same CTE chain / same [[scd2Frame]]), so "the history you audited"
    * and "the history you joined" are provably the same relation.
    *
    * Exactly one version matches per purchase: non-empty intervals
    * partition [first_ts, ∞) per user, and empty intervals (equal-ts
    * mutation chains) can cover nothing — so the join is a pure filter,
    * deterministic on both engines with no arg-max tie rule.
    *
    * Plan shape: the history build is [[scd2]]'s ONE user-keyed window
    * exchange; the join is an equi join on user_id with the interval
    * predicate as a post-join filter (never a cartesian); the history
    * side is users×versions — orders of magnitude smaller than the fact
    * stream, so AQE broadcasts it at scale. Output ordered by the unique
    * event_id. */
  val joinPit: Q = Q(
    "join_pit",
    s"""WITH $Scd2Sql,
       |p AS (SELECT event_id, user_id, ts FROM events
       |      WHERE event_type = 'purchase')
       |SELECT p.event_id, p.user_id, p.ts, h.attr, h.version, h.is_current
       |FROM p JOIN h ON p.user_id = h.user_id
       |  AND h.valid_from <= p.ts
       |  AND (h.valid_to IS NULL OR p.ts < h.valid_to)
       |ORDER BY p.event_id""".stripMargin
  ) { (s, d) =>
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val h = scd2Frame(s, d)
      .select(col("user_id").as("h_user"), col("attr"), col("valid_from"),
              col("valid_to"), col("is_current"), col("version"))
    p.join(h,
        col("user_id") === col("h_user") &&
        col("valid_from") <= col("ts") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"), col("attr"),
              col("version"), col("is_current"))
  }

  /** CONCURRENCY SWEEP-LINE over the [[sessionizeGaps]] sessions — peak
    * simultaneous active sessions per day and when it happened, the
    * capacity-planning census (how many live contexts must the serving
    * tier hold?). The scalable shape is NOT an interval self-join
    * (quadratic in overlap): each session contributes a +1 delta at its
    * clipped start and a −1 just after its clipped end, per day it
    * touches; concurrency is the running sum of per-instant delta
    * totals — the classic sweep-line, distributed.
    *
    * Determinism: all integers; deltas aggregate per (day, ms) BEFORE
    * the running sum, so the prefix is a function of the timeline, not
    * of tie order; the peak row breaks ties to the earliest instant.
    *
    * Scale posture: sessions come from the one user-keyed exchange
    * sessionization already pays; the day explode is a narrow
    * generator (sessions span ~1 day); the sweep windows partition BY
    * DAY over per-instant delta totals. A day with ~10⁹ distinct
    * instants would recurse the prefix sum two-level exactly like
    * [[graft.operators.Corpus.corpusPack]] — noted, not needed at any
    * benchable scale. */
  val sessionConcurrency: Q = Q(
    "session_concurrency",
    """WITH g AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         > 300000 THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, ms,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |sess AS (SELECT user_id, sid, min(ms) AS st, max(ms) AS en
      |         FROM s GROUP BY 1, 2),
      |sd AS (SELECT st, en, unnest(generate_series(st // 86400000,
      |                                             en // 86400000)) AS di
      |       FROM sess),
      |clip AS (SELECT di,
      |    greatest(st, di * 86400000) AS cst,
      |    least(en, di * 86400000 + 86399999) + 1 AS cen
      |  FROM sd),
      |delta AS (SELECT di, cst AS ms, 1 AS d FROM clip
      |          UNION ALL SELECT di, cen, -1 FROM clip),
      |tl AS (SELECT di, ms, sum(d) AS dd FROM delta GROUP BY 1, 2),
      |conc AS (SELECT di, ms,
      |    sum(dd) OVER (PARTITION BY di ORDER BY ms
      |                  ROWS UNBOUNDED PRECEDING) AS c
      |  FROM tl),
      |pk AS (SELECT di, ms, c,
      |    row_number() OVER (PARTITION BY di ORDER BY c DESC, ms) AS rn
      |  FROM conc),
      |ns AS (SELECT di, count(*) AS n_sessions FROM sd GROUP BY 1)
      |SELECT DATE '1970-01-01' + CAST(pk.di AS INT) AS day,
      |  CAST(ns.n_sessions AS BIGINT) AS n_sessions,
      |  CAST(pk.c AS BIGINT) AS peak_concurrency,
      |  CAST(pk.ms AS BIGINT) AS peak_ms
      |FROM pk JOIN ns ON pk.di = ns.di
      |WHERE pk.rn = 1 ORDER BY day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wMs = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Long.MinValue, 0)
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
              unix_millis(col("ts")).as("ms"))
      .withColumn("brk",
        when(col("ms") - lag(col("ms"), 1).over(w) > 300000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(wMs))
      .groupBy("user_id", "sid")
      .agg(min(col("ms")).as("st"), max(col("ms")).as("en"))
    val sd = sess.select(col("st"), col("en"),
      explode(sequence(expr("st DIV 86400000"), expr("en DIV 86400000")))
        .as("di"))
    val clip = sd.select(col("di"),
      greatest(col("st"), col("di") * 86400000L).as("cst"),
      (least(col("en"), col("di") * 86400000L + 86399999L) + 1).as("cen"))
    val delta = clip.select(col("di"), col("cst").as("ms"), lit(1).as("d"))
      .unionByName(clip.select(col("di"), col("cen").as("ms"),
                               lit(-1).as("d")))
    val wDay = Window.partitionBy("di").orderBy("ms")
      .rowsBetween(Long.MinValue, 0)
    // r11 opt: n_sessions(di) = #sd rows = #(+1 deltas) per day, so it
    // rides the SAME (di, ms) aggregate and day partition as the sweep
    // (one more window sum over the existing exchange+sort) — the old
    // separate sd.groupBy + join re-ran the whole sessionization chain
    // (events window sort included) a second time.
    val conc = delta.groupBy("di", "ms").agg(sum(col("d")).as("dd"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("dp"))
      .withColumn("c", sum(col("dd")).over(wDay))
      .withColumn("n_sessions", sum(col("dp")).over(Window.partitionBy("di")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("di").orderBy(desc("c"), asc("ms"))))
      .filter(col("rn") === 1)
    conc
      .select(date_add(lit("1970-01-01").cast("date"), col("di").cast("int"))
          .as("day"),
        col("n_sessions"), col("c").as("peak_concurrency"),
        col("ms").as("peak_ms"))
  }

  /** TWO-STEP MARKOV CLOSURE of the [[eventTransitions]] chain — "where
    * is a user two events from now?": P²(a→c) = Σ_b P(a→b)·P(b→c) over
    * the per-user next-event transition matrix, the reachability /
    * journey-prediction companion to the one-step census and the
    * [[eventPaths]] top journeys.
    *
    * Determinism — a matrix product with NO floats: one-step
    * probabilities are exact integer ppm ((10⁶·n) DIV row-total);
    * each product term is ppm×ppm (≤ 10¹², exact BIGINT); the Σ over
    * middle states is an exact BIGINT sum; the final DIV 10⁶ returns to
    * ppm. The float-sum problem of a naive matrix multiply never arises.
    *
    * Plan: the transition counts ride ONE user-keyed lead window +
    * partial+final aggregate (the eventTransitions shape); the closure
    * is a |types|²-row self-join on the middle state — broadcast-sized
    * at any corpus (types, not events, bound it). */
  val markovTwoStep: Q = Q(
    "markov_two_step",
    """WITH o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT a, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
      |p AS (SELECT c.a, c.b, (1000000 * c.n) // t.tot AS ppm
      |      FROM c JOIN t ON c.a = t.a)
      |SELECT p1.a AS from_type, p2.b AS to_type,
      |  CAST(sum(p1.ppm * p2.ppm) // 1000000 AS BIGINT) AS p2_ppm
      |FROM p p1 JOIN p p2 ON p1.b = p2.a
      |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("a").agg(sum(col("n")).as("tot"))
    val p = c.join(t, Seq("a"))
      .select(col("a"), col("b"), expr("(1000000 * n) DIV tot").as("ppm"))
    p.as("p1")
      .join(p.as("p2"), col("p1.b") === col("p2.a"))
      .groupBy(col("p1.a").as("from_type"), col("p2.b").as("to_type"))
      .agg(expr("CAST(sum(p1.ppm * p2.ppm) DIV 1000000 AS BIGINT)")
        .as("p2_ppm"))
  }

  /** BRANCHING ENTROPY per journey state — the predictability readout of
    * the transition matrix [[markovTwoStep]] squares and
    * [[markovStationary]] solves: per event type, the Shannon entropy
    * (micro-bits) of its successor distribution, the uniform ceiling
    * log₂(distinct successors), and entropy/ceiling in ppm. A state near
    * 0 is a deterministic funnel step (its dominant edge IS the journey);
    * a state near 10⁶ ppm branches uniformly — personalization target,
    * not funnel.
    *
    * Parity: each successor term (c/n)·log₂(n/c) follows the
    * multimodal_byte_entropy dyadic discipline verbatim — terms whose
    * n/c is an exact power of two sit ON the floor-quantization boundary
    * (engines' last-ulp ln drift lands on opposite sides), so they
    * compute in pure integer arithmetic, while every other term is
    * irrational and quantizes safely; the ceiling gets the same branch
    * on the successor count. The per-type entropy is then an exact
    * BIGINT sum of ≤|types| terms; the ratio is floor-DIV ppm with a
    * nullif guard for single-successor states.
    *
    * Plan: the one corpus-sized stage is the shared transition count
    * (user-keyed lead window + aggregate); everything after runs on the
    * ≤|types|² count frame. */
  val markovEntropy: Q = Q(
    "markov_entropy",
    """WITH o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS c
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT a, CAST(sum(c) AS BIGINT) AS n,
      |             CAST(count(*) AS BIGINT) AS n_succ FROM c GROUP BY 1),
      |tm AS (SELECT c.a,
      |    CASE WHEN n % c = 0 AND ((n // c) & (n // c - 1)) = 0
      |    THEN (1000000 * c * CAST(round(ln(CAST(n // c AS DOUBLE))
      |           / ln(2)) AS BIGINT)) // n
      |    ELSE CAST(floor(1000000 * (CAST(c AS DOUBLE) / n)
      |      * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE))) / ln(2))
      |      AS BIGINT) END AS term
      |  FROM c JOIN t ON c.a = t.a WHERE n > 0),
      |e AS (SELECT a, CAST(sum(term) AS BIGINT) AS ent FROM tm GROUP BY 1)
      |SELECT t.a AS event_type, t.n AS n_out, t.n_succ,
      |  e.ent AS entropy_micro_bits,
      |  CASE WHEN (t.n_succ & (t.n_succ - 1)) = 0
      |  THEN 1000000 * CAST(round(ln(CAST(t.n_succ AS DOUBLE))
      |         / ln(2)) AS BIGINT)
      |  ELSE CAST(floor(1000000 * ln(CAST(t.n_succ AS DOUBLE)) / ln(2))
      |    AS BIGINT) END AS max_entropy_micro_bits,
      |  CAST((1000000 * e.ent) // nullif(
      |    CASE WHEN (t.n_succ & (t.n_succ - 1)) = 0
      |    THEN 1000000 * CAST(round(ln(CAST(t.n_succ AS DOUBLE))
      |           / ln(2)) AS BIGINT)
      |    ELSE CAST(floor(1000000 * ln(CAST(t.n_succ AS DOUBLE)) / ln(2))
      |      AS BIGINT) END, 0) AS BIGINT) AS normalized_ppm
      |FROM t JOIN e ON t.a = e.a ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("c"))
    val t = c.groupBy("a").agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_succ"))
    // SQL-authored exact-integer branch (the byte_entropy discipline:
    // Spark `div` is the true integral divide the dyadic case needs)
    val tm = c.join(t, Seq("a"))
      .select(col("a"), expr(
        """CASE WHEN n % c = 0 AND ((n div c) & (n div c - 1)) = 0
          |THEN (1000000 * c * CAST(round(ln(CAST(n div c AS DOUBLE))
          |       / ln(2)) AS BIGINT)) div n
          |ELSE CAST(floor(1000000 * (CAST(c AS DOUBLE) / n)
          |  * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE))) / ln(2))
          |  AS BIGINT) END""".stripMargin).as("term"))
    val e = tm.groupBy("a").agg(sum(col("term")).as("ent"))
    val maxEnt =
      """CASE WHEN (n_succ & (n_succ - 1)) = 0
        |THEN 1000000 * CAST(round(ln(CAST(n_succ AS DOUBLE))
        |       / ln(2)) AS BIGINT)
        |ELSE CAST(floor(1000000 * ln(CAST(n_succ AS DOUBLE)) / ln(2))
        |  AS BIGINT) END""".stripMargin
    t.join(e, Seq("a"))
      .select(col("a").as("event_type"), col("n").as("n_out"),
        col("n_succ"), col("ent").as("entropy_micro_bits"),
        expr(maxEnt).as("max_entropy_micro_bits"),
        expr(s"(1000000 * ent) div nullif($maxEnt, 0)").cast("long")
          .as("normalized_ppm"))
  }

  // the chain's spectral gap sets the transient length: at ppm
  // resolution a second eigenvalue of ~0.95 needs ~270 rounds to settle,
  // and each round is a |types|²-entry driver-side map — thousands are
  // free, so the cap is sized for slow-mixing chains, not for cost
  private val MarkovMaxRounds = 4096

  // the bounded-collect bound itself (VERDICT r6 #3): |types|² ppm
  // entries at 1024 types is ~1M tuples — comfortably driver-sized; past
  // that the operator must refuse loudly instead of OOMing the driver
  private[operators] val MarkovMaxTypes = 1024L

  /** Measured power-iteration round count of the last
    * [[markovStationary]] run — unrolled by [[markovOracleSql]]
    * post-run (the graph_kcore oracleGen discipline). */
  private val markovMeasuredRounds =
    new java.util.concurrent.atomic.AtomicReference[Option[Int]](None)

  private def markovOracleSql(r: Int): String = {
    val steps = (1 to r).map { i =>
      s"""r$i AS (SELECT p.b AS t,
         |  CAST(sum(pi${i - 1}.v * p.ppm) // 1000000 AS BIGINT) AS v
         |  FROM pi${i - 1} JOIN p ON pi${i - 1}.t = p.a GROUP BY 1),
         |pi$i AS (SELECT t,
         |  CAST((v * 1000000) // (SELECT sum(v) FROM r$i) AS BIGINT) AS v
         |  FROM r$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH o AS (SELECT user_id, event_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS next_type
       |  FROM events),
       |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
       |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT a, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
       |p AS (SELECT c.a, c.b, (1000000 * c.n) // t.tot AS ppm
       |      FROM c JOIN t ON c.a = t.a),
       |ty AS (SELECT DISTINCT event_type AS t FROM events),
       |pi0 AS (SELECT t,
       |  CAST(1000000 // (SELECT count(*) FROM ty) AS BIGINT) AS v FROM ty),
       |$steps
       |SELECT t AS event_type, CAST(v AS BIGINT) AS pi_ppm
       |FROM pi$r ORDER BY event_type""".stripMargin
  }

  /** STATIONARY DISTRIBUTION of the event-type Markov chain — the
    * long-run visit share each event type commands, the journey-level
    * summary [[eventTransitions]]'s one-step probabilities and
    * [[markovTwoStep]]'s P² feed into: power-iterate π ← normalize(πP)
    * from the uniform start in EXACT ppm arithmetic (BIGINT products,
    * one floor DIV per entry — [[markovTwoStep]]'s quantization — then
    * an exact integer renormalization back to Σ≈10⁶, without which the
    * per-entry floors DRAIN ~|types| ppm of mass per round and the
    * iteration decreases forever instead of stabilizing) until the
    * vector is a FIXPOINT, `require`d within [[MarkovMaxRounds]]. A
    * ±1-ppm limit cycle (possible in floored integer iteration) stops
    * DETERMINISTICALLY at the first revisited state — the oracle
    * replays the same rounds either way, so the stopping rule is part
    * of the certified semantics, not a heuristic.
    *
    * Scale posture: P comes from ONE corpus-sized partial+final
    * aggregate (the [[eventTransitions]] plan); the iteration state is
    * bounded by the TYPE DOMAIN (|types|² entries), so it runs
    * driver-side — the [[Bpe]] bounded-collect discipline, identical at
    * any corpus size because types, not events, bound it. The measured
    * round count is recorded and the DuckDB oracle replays exactly those
    * rounds as chained CTEs over its own independently-computed P, so
    * the hash match certifies transition extraction AND every iteration
    * round across engines. */
  val markovStationary: Q = Q.noOracle("markov_stationary") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val t = c.groupBy("a").agg(sum(col("n")).as("tot"))
    // GUARD the bound before collecting: the |types|² design is only
    // driver-safe while the state domain is a type enum. On a frame whose
    // event_type is effectively high-cardinality (ids, URLs) this must
    // fail with a message, not OOM the driver mid-collect.
    val nTypes = Tables.events(s, d)
      .agg(count_distinct(col("event_type"))).head().getLong(0)
    require(nTypes <= MarkovMaxTypes,
      s"markov_stationary collects the |types|^2 transition matrix " +
      s"driver-side (bounded-collect discipline); $nTypes distinct " +
      s"event_type values exceeds the $MarkovMaxTypes cap. For a " +
      "high-cardinality state domain keep the iteration distributed: " +
      "join the pi vector against the transition DataFrame per round " +
      "with checkpointTruncated (the graph_pagerank plan shape).")
    // the bounded collects: |types|² transition entries + the type list
    val p = c.join(t, Seq("a"))
      .select(col("a"), col("b"), expr("(1000000 * n) DIV tot").as("ppm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = Tables.events(s, d).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).sorted
    var pi: Map[String, Long] =
      types.map(_ -> java.lang.Math.floorDiv(1000000L, types.length.toLong))
        .toMap
    val targets = p.map(_._2).distinct
    def step(cur: Map[String, Long]): Map[String, Long] = {
      val raw = targets.flatMap { b =>
        val terms = p.filter(e => e._2 == b && cur.contains(e._1))
        if (terms.isEmpty) None
        else Some(b -> java.lang.Math.floorDiv(
          terms.map(e => cur(e._1) * e._3).sum, 1000000L))
      }.toMap
      // renormalize: per-entry floors drain ~|types| ppm per round —
      // without this the vector strictly decreases and never stabilizes
      val mass = raw.values.sum
      if (mass == 0) raw
      else raw.map { case (k, v) =>
        k -> java.lang.Math.floorDiv(v * 1000000L, mass)
      }
    }
    val seen = scala.collection.mutable.Set[Map[String, Long]](pi)
    var rounds = 0
    var done = false
    while (!done && rounds < MarkovMaxRounds) {
      val next = step(pi)
      rounds += 1
      if (next == pi) done = true
      else if (!seen.add(next)) { pi = next; done = true } // limit cycle:
        // stop deterministically at the first revisited state
      else pi = next
    }
    require(done,
      s"markov_stationary did not converge in $MarkovMaxRounds rounds")
    markovMeasuredRounds.set(Some(rounds))
    import s.implicits._
    pi.toSeq.sortBy(_._1).toDF("event_type", "pi_ppm")
  }.copy(
    eager = true, // transition collect + driver iteration at plan build
    oracleGen = Some(() => markovMeasuredRounds.get().map(markovOracleSql)))

  /** STRONGLY CONNECTED COMPONENTS of the dominant-transition skeleton —
    * the journey CORE-LOOP detector: keep each event type's single most
    * frequent successor (rank by count DESC then successor name — the
    * deterministic cut every top-1 in the catalog uses) and decompose
    * the resulting out-degree-1 graph into SCCs. The skeleton of a
    * functional graph is ρ-shaped, so the decomposition splits the type
    * domain into the recurrent CORE CYCLES users orbit (scc_size > 1,
    * or a dominant self-loop) and the transient types that only feed
    * them — the qualitative summary [[markovStationary]]'s π quantifies.
    *
    * Scale posture: the one corpus-sized stage is the transition count
    * (user-keyed lead window + partial+final aggregate, the
    * [[eventTransitions]] plan); the skeleton rank window partitions by
    * source type over the |types|²-row count frame, and the SCC run is
    * driver-side iterative Tarjan over ≤|types| edges — the
    * [[markovStationary]] bounded-collect discipline, guarded by the
    * same [[MarkovMaxTypes]] cap so a high-cardinality state domain
    * fails loudly instead of OOMing the driver. The oracle recomputes
    * mutual reachability from scratch: a recursive-CTE transitive
    * closure over its own independently-ranked skeleton, SCC id = min
    * type with reach in both directions — so the hash match certifies
    * the extraction, the rank cut, AND the component structure. */
  val graphScc: Q = Q(
    "graph_scc",
    """WITH RECURSIVE o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |rk AS (SELECT a, b,
      |    row_number() OVER (PARTITION BY a ORDER BY n DESC, b) AS r
      |  FROM c),
      |e AS (SELECT a, b FROM rk WHERE r = 1),
      |ty AS (SELECT DISTINCT event_type AS t FROM events),
      |reach AS (SELECT a, b FROM e
      |          UNION
      |          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      |m AS (SELECT t AS a, t AS b FROM ty
      |      UNION
      |      SELECT r1.a, r1.b FROM reach r1
      |        JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
      |comp AS (SELECT a AS event_type, min(b) AS scc_id FROM m GROUP BY 1),
      |sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
      |       FROM comp GROUP BY 1)
      |SELECT c.event_type, c.scc_id, s.scc_size
      |FROM comp c JOIN sz s ON c.scc_id = s.scc_id
      |ORDER BY c.event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val nTypes = Tables.events(s, d)
      .agg(count_distinct(col("event_type"))).head().getLong(0)
    require(nTypes <= MarkovMaxTypes,
      s"graph_scc collects the dominant-transition skeleton driver-side " +
      s"(bounded-collect discipline); $nTypes distinct event_type values " +
      s"exceeds the $MarkovMaxTypes cap. For a high-cardinality state " +
      "domain run SCC distributed (forward/backward hash-to-min label " +
      "exchange, the dedup_cluster plan shape).")
    // bounded collects: ≤|types| skeleton edges + the type list
    val rk = Window.partitionBy("a").orderBy(desc("n"), asc("b"))
    val edges = counts.withColumn("r", row_number().over(rk))
      .filter(col("r") === 1).select(col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val types = Tables.events(s, d).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).sorted
    // iterative Tarjan (explicit stack — no recursion-depth dependence on
    // the type domain); components keyed by their minimum member name to
    // match the oracle's min-over-mutual-reach labeling
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = scala.collection.mutable.Map[String, Int]()
    val low = scala.collection.mutable.Map[String, Int]()
    val onStack = scala.collection.mutable.Set[String]()
    val stack = scala.collection.mutable.Stack[String]()
    val sccOf = scala.collection.mutable.Map[String, String]()
    var counter = 0
    for (root <- types if !index.contains(root)) {
      // work stack of (node, next-child offset)
      val work = scala.collection.mutable.Stack[(String, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.pop()
        if (ci == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack.push(v); onStack += v
        }
        val children = adj.getOrElse(v, Array.empty[String])
        var i = ci
        var descended = false
        while (i < children.length && !descended) {
          val c = children(i)
          if (!index.contains(c)) {
            work.push((v, i + 1)); work.push((c, 0)); descended = true
          } else {
            if (onStack(c)) low(v) = math.min(low(v), index(c))
            i += 1
          }
        }
        if (!descended) {
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.Buffer[String]()
            var done = false
            while (!done) {
              val x = stack.pop(); onStack -= x; members += x
              if (x == v) done = true
            }
            val id = members.min
            members.foreach(m => sccOf(m) = id)
          }
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    val sizes = sccOf.values.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    import s.implicits._
    types.map(t => (t, sccOf(t), sizes(sccOf(t)))).toSeq
      .toDF("event_type", "scc_id", "scc_size")
  }.copy(eager = true) // skeleton collect + driver Tarjan at plan build

  /** BETWEENNESS CENTRALITY of the dominant-transition skeleton — which
    * event types are the CHOKEPOINTS every journey routes through (the
    * funnel-redesign signal: a high-betweenness type is a single point
    * of failure for every downstream conversion). On the out-degree-1
    * skeleton (same rank-1 cut as [[graphScc]]) every reachable pair
    * (s,t) has a UNIQUE path, so betweenness reduces from Brandes'
    * σ-ratio sums to an exact integer pair count: v lies between s and
    * t iff d(s,v) + d(v,t) = d(s,t) with all three first-occurrence
    * walk distances defined — no fractional path-count credit, hence an
    * exactly hashable output.
    *
    * Scale posture: the one corpus-sized stage is the transition count
    * ([[eventTransitions]]'s user-keyed lead window + aggregate); the
    * walks run driver-side over the ≤|types| skeleton edges under the
    * [[MarkovMaxTypes]] bounded-collect guard. The oracle recomputes the
    * distances from scratch via a depth-bounded recursive-CTE closure
    * over its own independently-ranked skeleton and counts the d(s,v) +
    * d(v,t) = d(s,t) triples — so the hash match certifies the skeleton
    * extraction, the walk distances, AND the betweenness identity. */
  val graphBetweenness: Q = Q(
    "graph_betweenness",
    """WITH RECURSIVE o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |rk AS (SELECT a, b,
      |    row_number() OVER (PARTITION BY a ORDER BY n DESC, b) AS r
      |  FROM c),
      |e AS (SELECT a, b FROM rk WHERE r = 1),
      |ty AS (SELECT DISTINCT event_type AS t FROM events),
      |walk AS (SELECT a, b, 1 AS dist FROM e
      |         UNION
      |         SELECT w.a, e.b, w.dist + 1 FROM walk w JOIN e ON w.b = e.a
      |         WHERE w.dist < (SELECT count(*) FROM ty)),
      |d AS (SELECT a, b, min(dist) AS dist FROM walk GROUP BY 1, 2),
      |bt AS (SELECT sv.b AS v, CAST(count(*) AS BIGINT) AS btw
      |  FROM d st
      |  JOIN d sv ON sv.a = st.a
      |  JOIN d vt ON vt.a = sv.b AND vt.b = st.b
      |  WHERE st.a <> st.b AND sv.b <> st.a AND sv.b <> st.b
      |    AND sv.dist + vt.dist = st.dist
      |  GROUP BY 1)
      |SELECT ty.t AS event_type,
      |  CAST(coalesce(bt.btw, 0) AS BIGINT) AS betweenness
      |FROM ty LEFT JOIN bt ON bt.v = ty.t
      |ORDER BY ty.t""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val nTypes = Tables.events(s, d)
      .agg(count_distinct(col("event_type"))).head().getLong(0)
    require(nTypes <= MarkovMaxTypes,
      s"graph_betweenness collects the dominant-transition skeleton " +
      s"driver-side (bounded-collect discipline); $nTypes distinct " +
      s"event_type values exceeds the $MarkovMaxTypes cap. For a " +
      "high-cardinality state domain run sampled Brandes distributed " +
      "(per-source BFS fan-out, the graph_shortest_path plan shape).")
    val rk = Window.partitionBy("a").orderBy(desc("n"), asc("b"))
    val edges = counts.withColumn("r", row_number().over(rk))
      .filter(col("r") === 1).select(col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val types = Tables.events(s, d).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).sorted
    // per-source walk: out-degree ≤1, so the path is unique and first
    // occurrences are ordered along it — every t at walk index j puts
    // one betweenness unit on each strictly-interior v (indices 1..j-1)
    val btw = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for (s0 <- types) {
      val order = scala.collection.mutable.ArrayBuffer(s0)
      val seen = scala.collection.mutable.Set(s0)
      var cur = s0
      var going = true
      while (going) edges.get(cur) match {
        case Some(nxt) if !seen(nxt) =>
          order += nxt; seen += nxt; cur = nxt
        case _ => going = false
      }
      // order = [s0, v1, .., vm]; vi (1-based, i<m) is interior to
      // (s0, vj) for every j > i
      val m = order.length - 1
      for (i <- 1 until m) btw(order(i)) += (m - i).toLong
    }
    import s.implicits._
    types.map(t => (t, btw(t))).toSeq
      .toDF("event_type", "betweenness")
  }.copy(eager = true) // skeleton collect + driver walks at plan build

  /** DIAMETER / PATH-LENGTH CENSUS of the dominant-transition skeleton —
    * the journey-compactness summary closing the skeleton triad
    * ([[graphScc]] structure, [[graphBetweenness]] chokepoints, this
    * query reach): over all ordered reachable pairs (s ≠ t), the pair
    * count, the mean first-occurrence walk distance (milli-steps,
    * exact-integer floor), and the DIAMETER (longest shortest walk) —
    * one row. A diameter near |types| is a deep funnel; near 1 is a
    * hub-and-spoke journey.
    *
    * Same bounded-collect discipline and oracle machinery as
    * [[graphBetweenness]]: driver walks under [[MarkovMaxTypes]], the
    * oracle recomputes distances via the depth-bounded recursive-CTE
    * closure and aggregates — corpus-sized work is only the shared
    * transition count. */
  val graphDiameter: Q = Q(
    "graph_diameter",
    """WITH RECURSIVE o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |rk AS (SELECT a, b,
      |    row_number() OVER (PARTITION BY a ORDER BY n DESC, b) AS r
      |  FROM c),
      |e AS (SELECT a, b FROM rk WHERE r = 1),
      |ty AS (SELECT DISTINCT event_type AS t FROM events),
      |walk AS (SELECT a, b, 1 AS dist FROM e
      |         UNION
      |         SELECT w.a, e.b, w.dist + 1 FROM walk w JOIN e ON w.b = e.a
      |         WHERE w.dist < (SELECT count(*) FROM ty)),
      |d AS (SELECT a, b, CAST(min(dist) AS BIGINT) AS dist FROM walk
      |      WHERE a <> b GROUP BY 1, 2)
      |SELECT CAST((SELECT count(*) FROM ty) AS BIGINT) AS n_nodes,
      |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
      |  CAST(count(*) AS BIGINT) AS n_pairs_reachable,
      |  CAST(coalesce((1000 * CAST(sum(dist) AS BIGINT))
      |    // nullif(count(*), 0), 0) AS BIGINT) AS avg_dist_milli,
      |  CAST(coalesce(max(dist), 0) AS BIGINT) AS diameter
      |FROM d""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val nTypes = Tables.events(s, d)
      .agg(count_distinct(col("event_type"))).head().getLong(0)
    require(nTypes <= MarkovMaxTypes,
      s"graph_diameter collects the dominant-transition skeleton " +
      s"driver-side (bounded-collect discipline); $nTypes types exceed " +
      s"the $MarkovMaxTypes cap — run distributed BFS instead " +
      "(graph_shortest_path plan shape).")
    val rk = Window.partitionBy("a").orderBy(desc("n"), asc("b"))
    val edges = counts.withColumn("r", row_number().over(rk))
      .filter(col("r") === 1).select(col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val types = Tables.events(s, d).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).sorted
    var pairs = 0L; var sumD = 0L; var diam = 0L
    for (s0 <- types) {
      val seen = scala.collection.mutable.Set(s0)
      var cur = s0
      var dist = 0L
      var going = true
      while (going) edges.get(cur) match {
        case Some(nxt) if !seen(nxt) =>
          dist += 1; seen += nxt; cur = nxt
          pairs += 1; sumD += dist
          if (dist > diam) diam = dist
        case _ => going = false
      }
    }
    import s.implicits._
    Seq((nTypes, edges.size.toLong, pairs,
      if (pairs > 0) 1000L * sumD / pairs else 0L, diam))
      .toDF("n_nodes", "n_edges", "n_pairs_reachable", "avg_dist_milli",
        "diameter")
  }.copy(eager = true) // skeleton collect + driver walks at plan build

  /** CLOSENESS CENTRALITY (out-closeness) of every node of the
    * dominant-transition skeleton — the fourth member of the skeleton
    * census ([[graphScc]] structure, [[graphBetweenness]] chokepoints,
    * [[graphDiameter]] reach, this query PER-NODE reach): for each
    * event_type s, the count of types reachable along the unique
    * out-degree-1 walk, the total walk distance, and closeness
    * n_reachable²/Σdist in milli units (the Wasserman–Faust-unnormalized
    * harmonic-free form; exact floor-DIV of BIGINTs). Nodes that reach
    * nothing emit zeros rather than dividing by zero — mirrored on both
    * engines.
    *
    * Same bounded-collect discipline as its siblings: corpus-sized work
    * is only the shared transition count; the walk runs driver-side
    * under [[MarkovMaxTypes]]; the oracle recomputes distances via the
    * depth-bounded recursive-CTE closure. */
  val graphCloseness: Q = Q(
    "graph_closeness",
    """WITH RECURSIVE o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |rk AS (SELECT a, b,
      |    row_number() OVER (PARTITION BY a ORDER BY n DESC, b) AS r
      |  FROM c),
      |e AS (SELECT a, b FROM rk WHERE r = 1),
      |ty AS (SELECT DISTINCT event_type AS t FROM events),
      |walk AS (SELECT a, b, 1 AS dist FROM e
      |         UNION
      |         SELECT w.a, e.b, w.dist + 1 FROM walk w JOIN e ON w.b = e.a
      |         WHERE w.dist < (SELECT count(*) FROM ty)),
      |d AS (SELECT a, b, CAST(min(dist) AS BIGINT) AS dist FROM walk
      |      WHERE a <> b GROUP BY 1, 2),
      |cl AS (SELECT a, CAST(count(*) AS BIGINT) AS n_reach,
      |       CAST(sum(dist) AS BIGINT) AS sum_dist FROM d GROUP BY 1)
      |SELECT ty.t AS event_type,
      |  CAST(coalesce(cl.n_reach, 0) AS BIGINT) AS n_reachable,
      |  CAST(coalesce(cl.sum_dist, 0) AS BIGINT) AS sum_dist,
      |  CAST(coalesce((1000 * cl.n_reach * cl.n_reach) // cl.sum_dist, 0)
      |       AS BIGINT) AS closeness_milli
      |FROM ty LEFT JOIN cl ON cl.a = ty.t ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    val nTypes = Tables.events(s, d)
      .agg(count_distinct(col("event_type"))).head().getLong(0)
    require(nTypes <= MarkovMaxTypes,
      s"graph_closeness collects the dominant-transition skeleton " +
      s"driver-side (bounded-collect discipline); $nTypes types exceed " +
      s"the $MarkovMaxTypes cap — run distributed BFS instead " +
      "(graph_shortest_path plan shape).")
    val rk = Window.partitionBy("a").orderBy(desc("n"), asc("b"))
    val edges = counts.withColumn("r", row_number().over(rk))
      .filter(col("r") === 1).select(col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val types = Tables.events(s, d).select(col("event_type"))
      .distinct().collect().map(_.getString(0)).sorted
    val rows = types.map { s0 =>
      val seen = scala.collection.mutable.Set(s0)
      var cur = s0
      var dist = 0L; var nReach = 0L; var sumD = 0L
      var going = true
      while (going) edges.get(cur) match {
        case Some(nxt) if !seen(nxt) =>
          dist += 1; seen += nxt; cur = nxt
          nReach += 1; sumD += dist
        case _ => going = false
      }
      (s0, nReach, sumD,
        if (sumD > 0) 1000L * nReach * nReach / sumD else 0L)
    }
    import s.implicits._
    rows.toSeq
      .toDF("event_type", "n_reachable", "sum_dist", "closeness_milli")
  }.copy(eager = true) // skeleton collect + driver walks at plan build

  /** A/B EXPERIMENT LIFT with a two-proportion z-test — the readout an
    * experimentation platform computes per assignment split: users hash
    * into control/treatment (`user_id % 2`, the deterministic assignment
    * both engines share), exposure is "saw a view event", conversion is
    * "purchased within 24h of the FIRST view" (an attribution window, so
    * the metric separates even on users whose full history touches every
    * event type), and the output is one row of exact counts, floor-DIV
    * ppm rates, the lift, and the pooled two-proportion z statistic in
    * micro-units with a |z| > 1.96 significance flag.
    *
    * Parity discipline: the conversion window is pure epoch-millisecond
    * integer arithmetic (no interval types — the dq-family epoch_ms
    * discipline); all sufficient statistics (n₀, n₁, x₀, x₁) are exact
    * BIGINT counts; rates and lift are nonneg floor-DIV ppm; the z
    * statistic is a scalar IEEE expression over those exact integers —
    * identical operation tree on both engines, so bit-equal doubles (the
    * [[graft.operators.Pipeline]] dq_drift_ttest discipline). Degenerate
    * splits (an empty arm, zero or total conversion — pooled variance 0,
    * z undefined) are excluded by a mirrored WHERE instead of letting
    * NaN/∞ casts diverge across engines.
    *
    * Plan: ONE user-keyed exchange carries both the first-view window
    * and the per-user flag aggregate (the sessionize_gaps sharing), then
    * a 1-row global aggregate — no join. At 100 TB: the per-user frame
    * is the only corpus-sized shuffle and it carries 4 small columns;
    * everything after is O(1). */
  val abLiftZtest: Q = Q(
    "ab_lift_ztest",
    """WITH t AS (SELECT user_id, user_id % 2 AS grp, event_type,
      |    epoch_ms(ts) AS ms,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
      |      OVER (PARTITION BY user_id) AS t0
      |  FROM events),
      |u AS (SELECT user_id, grp,
      |    max(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS v,
      |    max(CASE WHEN event_type = 'purchase' AND ms > t0
      |             AND ms <= t0 + 86400000 THEN 1 ELSE 0 END) AS p
      |  FROM t GROUP BY 1, 2),
      |s AS (SELECT
      |    CAST(sum(CASE WHEN grp = 0 THEN v END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN grp = 1 THEN v END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN grp = 0 THEN v * p END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN grp = 1 THEN v * p END) AS BIGINT) AS x1
      |  FROM u),
      |z AS (SELECT n0, n1, x0, x1,
      |    (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
      |      / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1.0 / n0 + 1.0 / n1)) AS zstat
      |  FROM s WHERE n0 > 0 AND n1 > 0
      |    AND x0 + x1 > 0 AND x0 + x1 < n0 + n1)
      |SELECT n0 AS n_control, n1 AS n_treat,
      |  x0 AS conv_control, x1 AS conv_treat,
      |  (1000000 * x0) // n0 AS rate_control_ppm,
      |  (1000000 * x1) // n1 AS rate_treat_ppm,
      |  (1000000 * x1) // n1 - (1000000 * x0) // n0 AS lift_ppm,
      |  CAST(floor(1000000 * zstat) AS BIGINT) AS z_micro,
      |  abs(CAST(floor(1000000 * zstat) AS BIGINT)) > 1960000
      |    AS significant
      |FROM z""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val t = Tables.events(s, d)
      .select(col("user_id"), (col("user_id") % 2).as("grp"),
        col("event_type"), expr("unix_millis(ts)").as("ms"))
      .withColumn("t0",
        min(when(col("event_type") === "view", col("ms"))).over(byUser))
    val u = t.groupBy(col("user_id"), col("grp"))
      .agg(max(when(col("t0").isNotNull, 1).otherwise(0)).as("v"),
           max(when(col("event_type") === "purchase" &&
               col("ms") > col("t0") &&
               col("ms") <= col("t0") + 86400000L, 1).otherwise(0))
             .as("p"))
    val st = u.agg(
      sum(when(col("grp") === 0, col("v"))).cast("long").as("n0"),
      sum(when(col("grp") === 1, col("v"))).cast("long").as("n1"),
      sum(when(col("grp") === 0, col("v") * col("p"))).cast("long").as("x0"),
      sum(when(col("grp") === 1, col("v") * col("p"))).cast("long").as("x1"))
    // degenerate-split guard, mirrored in the oracle's WHERE: an empty
    // arm or an all-or-nothing conversion zeroes the pooled variance and
    // the engines disagree on casting the resulting NaN/∞
    val pooled = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1"))
    val zstat = (col("x1").cast("double") / col("n1") -
        col("x0").cast("double") / col("n0")) /
      sqrt(pooled * (lit(1) - pooled) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val zMicro = floor(lit(1000000) * zstat).cast("long")
    st.filter(col("n0") > 0 && col("n1") > 0 &&
        col("x0") + col("x1") > 0 &&
        col("x0") + col("x1") < col("n0") + col("n1"))
      .select(col("n0").as("n_control"), col("n1").as("n_treat"),
        col("x0").as("conv_control"), col("x1").as("conv_treat"),
        expr("(1000000 * x0) div n0").as("rate_control_ppm"),
        expr("(1000000 * x1) div n1").as("rate_treat_ppm"),
        expr("(1000000 * x1) div n1 - (1000000 * x0) div n0")
          .as("lift_ppm"),
        zMicro.as("z_micro"),
        (abs(zMicro) > 1960000L).as("significant"))
  }

  /** Attribution-window sensitivity sweep — the analysis that decides
    * WHICH conversion window ([[abLiftZtest]]'s hardcoded 24 h, or 1 h /
    * 6 h / 7 d) an experiment platform should standardize on: per
    * candidate window, how many first-viewers convert within it and the
    * conversion rate. A rate that keeps climbing at 7 d means the 24 h
    * readout truncates real conversions; a flat curve past 6 h means the
    * platform can report days sooner — this query IS that judgment call.
    *
    * Plan: the SAME one user-keyed exchange as the parent (first-view
    * window + per-user min-qualifying-purchase aggregate), then the
    * 4-window census rides a 4× explode of the per-user 2-column frame —
    * user rows fan out, never events. All integers exact; the per-user
    * time-to-convert is a min over qualifying purchases, total-ordered
    * by definition (min of ms values). */
  val funnelWindowSweep: Q = Q(
    "funnel_window_sweep",
    """WITH t AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
      |      OVER (PARTITION BY user_id) AS t0
      |  FROM events),
      |u AS (SELECT user_id,
      |    max(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS v,
      |    min(CASE WHEN event_type = 'purchase' AND ms > t0
      |             THEN ms - t0 END) AS ttc
      |  FROM t GROUP BY 1),
      |w AS (SELECT unnest([3600000, 21600000, 86400000, 604800000])
      |        AS win_ms),
      |x AS (SELECT w.win_ms, u.v,
      |    CASE WHEN u.ttc IS NOT NULL AND u.ttc <= w.win_ms
      |         THEN 1 ELSE 0 END AS c
      |  FROM u CROSS JOIN w WHERE u.v = 1)
      |SELECT CAST(win_ms AS BIGINT) AS win_ms,
      |  CAST(count(*) AS BIGINT) AS n_viewers,
      |  CAST(sum(c) AS BIGINT) AS n_converted,
      |  CAST((1000000 * sum(c)) // count(*) AS BIGINT) AS rate_ppm
      |FROM x GROUP BY 1 ORDER BY win_ms""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
      .withColumn("t0",
        min(when(col("event_type") === "view", col("ms"))).over(byUser))
    val u = t.groupBy("user_id")
      .agg(max(when(col("t0").isNotNull, 1).otherwise(0)).as("v"),
           min(when(col("event_type") === "purchase" &&
               col("ms") > col("t0"), col("ms") - col("t0"))).as("ttc"))
    u.filter(col("v") === 1)
      .select(col("ttc"),
        explode(typedlit(Seq(3600000L, 21600000L, 86400000L, 604800000L)))
          .as("win_ms"))
      .select(col("win_ms"),
        when(col("ttc").isNotNull && col("ttc") <= col("win_ms"), 1)
          .otherwise(0).as("c"))
      .groupBy("win_ms")
      .agg(count(lit(1)).as("n_viewers"), sum(col("c")).as("n_converted"))
      .select(col("win_ms"), col("n_viewers"), col("n_converted"),
        expr("(1000000 * n_converted) div n_viewers").as("rate_ppm"))
  }

  /** Heterogeneous-treatment-effect readout — [[abLiftZtest]] broken out
    * by user segment (the "who does the feature actually work for"
    * analysis every experiment review asks for next): users tier into
    * light / mid / heavy by total event volume (fixed integer cutoffs —
    * quantile tiers would make each user's segment depend on a global
    * sort; fixed cutoffs keep segmentation a PER-ROW function, which is
    * also what makes it computable in the same aggregate), and each
    * segment gets the full two-proportion z readout. Degenerate segments
    * (empty arm, all-or-nothing conversion) are excluded by the same
    * mirrored predicate as the parent query, so NaN/∞ casts never meet
    * an engine.
    *
    * Plan: the parent's ONE user-keyed exchange — the first-view window
    * and the per-user (flags + event count) aggregate share it — then a
    * ≤3-row segment aggregate. Nothing new shuffles. */
  val abLiftSegmented: Q = Q(
    "ab_lift_segmented",
    """WITH t AS (SELECT user_id, user_id % 2 AS grp, event_type,
      |    epoch_ms(ts) AS ms,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
      |      OVER (PARTITION BY user_id) AS t0
      |  FROM events),
      |u AS (SELECT user_id, grp, count(*) AS n_ev,
      |    max(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS v,
      |    max(CASE WHEN event_type = 'purchase' AND ms > t0
      |             AND ms <= t0 + 86400000 THEN 1 ELSE 0 END) AS p
      |  FROM t GROUP BY 1, 2),
      |g AS (SELECT CASE WHEN n_ev < 62 THEN 'light'
      |             WHEN n_ev <= 70 THEN 'mid'
      |             ELSE 'heavy' END AS segment, grp, v, p FROM u),
      |s AS (SELECT segment,
      |    CAST(sum(CASE WHEN grp = 0 THEN v END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN grp = 1 THEN v END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN grp = 0 THEN v * p END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN grp = 1 THEN v * p END) AS BIGINT) AS x1
      |  FROM g GROUP BY 1),
      |z AS (SELECT segment, n0, n1, x0, x1,
      |    (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
      |      / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1.0 / n0 + 1.0 / n1)) AS zstat
      |  FROM s WHERE n0 > 0 AND n1 > 0
      |    AND x0 + x1 > 0 AND x0 + x1 < n0 + n1)
      |SELECT segment, n0 AS n_control, n1 AS n_treat,
      |  x0 AS conv_control, x1 AS conv_treat,
      |  (1000000 * x1) // n1 - (1000000 * x0) // n0 AS lift_ppm,
      |  CAST(floor(1000000 * zstat) AS BIGINT) AS z_micro,
      |  abs(CAST(floor(1000000 * zstat) AS BIGINT)) > 1960000
      |    AS significant
      |FROM z ORDER BY segment""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val t = Tables.events(s, d)
      .select(col("user_id"), (col("user_id") % 2).as("grp"),
        col("event_type"), expr("unix_millis(ts)").as("ms"))
      .withColumn("t0",
        min(when(col("event_type") === "view", col("ms"))).over(byUser))
    val u = t.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("n_ev"),
           max(when(col("t0").isNotNull, 1).otherwise(0)).as("v"),
           max(when(col("event_type") === "purchase" &&
               col("ms") > col("t0") &&
               col("ms") <= col("t0") + 86400000L, 1).otherwise(0))
             .as("p"))
    val st = u
      .select(when(col("n_ev") < 62, "light")
          .when(col("n_ev") <= 70, "mid")
          .otherwise("heavy").as("segment"),
        col("grp"), col("v"), col("p"))
      .groupBy("segment")
      .agg(
        sum(when(col("grp") === 0, col("v"))).cast("long").as("n0"),
        sum(when(col("grp") === 1, col("v"))).cast("long").as("n1"),
        sum(when(col("grp") === 0, col("v") * col("p"))).cast("long")
          .as("x0"),
        sum(when(col("grp") === 1, col("v") * col("p"))).cast("long")
          .as("x1"))
    val pooled = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1"))
    val zstat = (col("x1").cast("double") / col("n1") -
        col("x0").cast("double") / col("n0")) /
      sqrt(pooled * (lit(1) - pooled) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val zMicro = floor(lit(1000000) * zstat).cast("long")
    st.filter(col("n0") > 0 && col("n1") > 0 &&
        col("x0") + col("x1") > 0 &&
        col("x0") + col("x1") < col("n0") + col("n1"))
      .select(col("segment"), col("n0").as("n_control"),
        col("n1").as("n_treat"),
        col("x0").as("conv_control"), col("x1").as("conv_treat"),
        expr("(1000000 * x1) div n1 - (1000000 * x0) div n0")
          .as("lift_ppm"),
        zMicro.as("z_micro"),
        (abs(zMicro) > 1960000L).as("significant"))
  }

  /** DELTA-METHOD RATIO-METRIC TEST — [[abLiftZtest]]'s sibling for the
    * metrics experimentation actually ships on: revenue-per-event (any
    * per-user ratio Σx/Σy) has no binomial variance, so the arm variance
    * comes from the delta method — Var(R) ≈ (s²ₓ + R²s²ᵧ − 2R·sₓᵧ) /
    * (n·ȳ²) — computed from six exact sufficient statistics per arm
    * (n, Σx, Σy, Σx², Σy², Σxy in cents, DECIMAL(38,0)/HUGEINT). One
    * row: per-arm sizes, the two ratios and the z statistic in
    * micro-units.
    *
    * Parity discipline: the [[graft.operators.Pipeline]] dq_drift_ttest
    * family's — integer sufficient statistics, every double from shared
    * scalar expressions, degenerate frames (an arm with ≤1 user, zero
    * total denominator, zero pooled variance) excluded by mirrored
    * HAVING/filter instead of letting NaN/∞ casts diverge.
    *
    * Plan: one user-keyed partial+final aggregate (the only corpus-sized
    * shuffle), a 2-row arm aggregate, a 1-row pivot — no joins, no
    * windows. */
  val abRatioDelta: Q = Q(
    "ab_ratio_delta",
    """WITH u AS (SELECT user_id, user_id % 2 AS grp,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        ELSE 0 END) AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM u GROUP BY 1),
      |v AS (SELECT grp, n,
      |    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
      |    (CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) AS vx,
      |    (CAST(syy AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) AS vy,
      |    (CAST(sxy AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1) AS cxy,
      |    CAST(sy AS DOUBLE) / n AS ybar
      |  FROM s WHERE n > 1 AND sy > 0),
      |w AS (SELECT grp, n, r,
      |    (vx + r * r * vy - 2 * r * cxy) / (n * ybar * ybar) AS var_r
      |  FROM v)
      |SELECT
      |  max(CASE WHEN grp = 0 THEN n END) AS n_control,
      |  max(CASE WHEN grp = 1 THEN n END) AS n_treat,
      |  CAST(floor(1000000 * max(CASE WHEN grp = 0 THEN r END)) AS BIGINT)
      |    AS ratio_control_micro,
      |  CAST(floor(1000000 * max(CASE WHEN grp = 1 THEN r END)) AS BIGINT)
      |    AS ratio_treat_micro,
      |  CAST(floor(1000000 * ((max(CASE WHEN grp = 1 THEN r END)
      |      - max(CASE WHEN grp = 0 THEN r END))
      |    / sqrt(max(CASE WHEN grp = 1 THEN var_r END)
      |         + max(CASE WHEN grp = 0 THEN var_r END)))) AS BIGINT)
      |    AS z_micro
      |FROM w
      |HAVING count(*) = 2
      |  AND max(CASE WHEN grp = 1 THEN var_r END)
      |    + max(CASE WHEN grp = 0 THEN var_r END) > 0""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val u = Tables.events(s, d)
      .groupBy(col("user_id"), (col("user_id") % 2).as("grp"))
      .agg(sum(when(col("event_type") === "purchase",
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
          .otherwise(0L)).cast("long").as("x"),
        count(lit(1)).as("y"))
    val st = u.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast(dec38).as("sx"),
        sum(col("y")).cast(dec38).as("sy"),
        sum(col("x").cast(dec38) * col("x")).as("sxx"),
        sum(col("y").cast(dec38) * col("y")).as("syy"),
        sum(col("x").cast(dec38) * col("y")).as("sxy"))
    def dbl(c: Column): Column = c.cast("double")
    val r = dbl(col("sx")) / dbl(col("sy"))
    val vx = (dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) / col("n")) /
      (col("n") - 1)
    val vy = (dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")) / col("n")) /
      (col("n") - 1)
    val cxy = (dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")) / col("n")) /
      (col("n") - 1)
    val ybar = dbl(col("sy")) / col("n")
    val w = st.filter(col("n") > 1 && col("sy") > 0)
      .select(col("grp"), col("n"), r.as("r"),
        ((vx + r * r * vy - lit(2) * r * cxy) /
          (col("n") * ybar * ybar)).as("var_r"))
    def arm(g: Int, c: Column): Column = max(when(col("grp") === g, c))
    val zden = sqrt(arm(1, col("var_r")) + arm(0, col("var_r")))
    w.agg(
        arm(0, col("n")).as("n_control"), arm(1, col("n")).as("n_treat"),
        floor(lit(1000000) * arm(0, col("r"))).cast("long")
          .as("ratio_control_micro"),
        floor(lit(1000000) * arm(1, col("r"))).cast("long")
          .as("ratio_treat_micro"),
        floor(lit(1000000) *
          ((arm(1, col("r")) - arm(0, col("r"))) / zden)).cast("long")
          .as("z_micro"),
        count(lit(1)).as("n_arms"),
        (arm(1, col("var_r")) + arm(0, col("var_r"))).as("vsum"))
      .filter(col("n_arms") === 2 && col("vsum") > 0)
      .drop("n_arms", "vsum")
  }

  /** CUPED VARIANCE-REDUCED LIFT — the experimentation triad's third
    * member ([[abLiftZtest]] proportions, [[abRatioDelta]] ratios, this
    * one variance reduction): the experiment metric (second-half
    * purchase cents per user) is adjusted by the pre-period covariate
    * (first-half event count) with the pooled θ = cov(x,p)/var(p), and
    * the arms compare on adjusted means — the industry-standard way to
    * shrink experiment confidence intervals with pre-experiment data.
    * The half split reuses the dq drift pair's integer day midpoint.
    *
    * Parity discipline: six exact cent-unit sufficient statistics per
    * arm (DECIMAL(38,0)/HUGEINT); θ, adjusted means, adjusted variances
    * (var(x) − 2θcov + θ²var(p) — derived from the same exact sums) and
    * z are shared scalar IEEE expressions; degenerate frames (zero
    * covariate variance, an arm with ≤1 user, zero adjusted variance)
    * are excluded by mirrored WHERE/HAVING.
    *
    * Plan: one user-keyed partial+final aggregate (the only corpus-sized
    * shuffle; the day midpoint broadcasts onto it), a 2-row arm
    * aggregate, a 1-row θ frame broadcast back, a 1-row pivot. */
  val abCuped: Q = Q(
    "ab_cuped",
    """WITH e AS (SELECT user_id, user_id % 2 AS grp, event_type,
      |    epoch_ms(ts) // 86400000 AS di,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |mid AS (SELECT (min(di) + max(di)) // 2 AS m FROM e),
      |u AS (SELECT user_id, grp,
      |    CAST(count(CASE WHEN di <= (SELECT m FROM mid) THEN 1 END)
      |      AS BIGINT) AS p,
      |    CAST(sum(CASE WHEN di > (SELECT m FROM mid)
      |        AND event_type = 'purchase' THEN cents ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM e GROUP BY 1, 2),
      |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(p) AS DECIMAL(38,0)) AS sp,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(p AS HUGEINT) * p) AS spp,
      |    sum(CAST(x AS HUGEINT) * p) AS sxp
      |  FROM u GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS DOUBLE) AS gn,
      |    CAST(sum(sx) AS DOUBLE) AS gsx, CAST(sum(sp) AS DOUBLE) AS gsp,
      |    CAST(sum(sxx) AS DOUBLE) AS gsxx,
      |    CAST(sum(spp) AS DOUBLE) AS gspp,
      |    CAST(sum(sxp) AS DOUBLE) AS gsxp
      |  FROM s),
      |t AS (SELECT (gsxp - gsx * gsp / gn) / (gspp - gsp * gsp / gn)
      |      AS theta,
      |    gsp / gn AS pbar FROM g WHERE gspp - gsp * gsp / gn > 0),
      |a AS (SELECT grp, n, theta,
      |    CAST(sx AS DOUBLE) / n - theta * (CAST(sp AS DOUBLE) / n - pbar)
      |      AS madj,
      |    ((CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |     - 2 * theta * (CAST(sxp AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sp AS DOUBLE) / n)
      |     + theta * theta * (CAST(spp AS DOUBLE)
      |        - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n))
      |    / (n - 1) AS vadj
      |  FROM s CROSS JOIN t WHERE n > 1)
      |SELECT
      |  max(CASE WHEN grp = 0 THEN n END) AS n_control,
      |  max(CASE WHEN grp = 1 THEN n END) AS n_treat,
      |  CAST(floor(1000 * max(theta)) AS BIGINT) AS theta_milli,
      |  CAST(floor(max(CASE WHEN grp = 0 THEN madj END)) AS BIGINT)
      |    AS adj_mean_control_cents,
      |  CAST(floor(max(CASE WHEN grp = 1 THEN madj END)) AS BIGINT)
      |    AS adj_mean_treat_cents,
      |  CAST(floor(1000000 * ((max(CASE WHEN grp = 1 THEN madj END)
      |      - max(CASE WHEN grp = 0 THEN madj END))
      |    / sqrt(max(CASE WHEN grp = 1 THEN vadj END)
      |             / max(CASE WHEN grp = 1 THEN n END)
      |         + max(CASE WHEN grp = 0 THEN vadj END)
      |             / max(CASE WHEN grp = 0 THEN n END)))) AS BIGINT)
      |    AS z_micro
      |FROM a
      |HAVING count(*) = 2
      |  AND max(CASE WHEN grp = 1 THEN vadj END)
      |        / max(CASE WHEN grp = 1 THEN n END)
      |    + max(CASE WHEN grp = 0 THEN vadj END)
      |        / max(CASE WHEN grp = 0 THEN n END) > 0""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val e = Tables.events(s, d)
      .select(col("user_id"), (col("user_id") % 2).as("grp"),
        col("event_type"),
        expr("unix_millis(ts) DIV 86400000").as("di"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("cents"))
    val mid = e.agg(expr("(min(di) + max(di)) DIV 2").as("m"))
    val u = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(when(col("di") <= col("m"), 1)).as("p"),
        sum(when(col("di") > col("m") &&
            col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).cast("long").as("x"))
    val st = u.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast(dec38).as("sx"),
        sum(col("p")).cast(dec38).as("sp"),
        sum(col("x").cast(dec38) * col("x")).as("sxx"),
        sum(col("p").cast(dec38) * col("p")).as("spp"),
        sum(col("x").cast(dec38) * col("p")).as("sxp"))
    def dbl(c: Column): Column = c.cast("double")
    val g = st.agg(dbl(sum(col("n"))).as("gn"), dbl(sum(col("sx"))).as("gsx"),
      dbl(sum(col("sp"))).as("gsp"), dbl(sum(col("sxx"))).as("gsxx"),
      dbl(sum(col("spp"))).as("gspp"), dbl(sum(col("sxp"))).as("gsxp"))
    val t = g.filter(col("gspp") - col("gsp") * col("gsp") / col("gn") > 0)
      .select(((col("gsxp") - col("gsx") * col("gsp") / col("gn")) /
          (col("gspp") - col("gsp") * col("gsp") / col("gn"))).as("theta"),
        (col("gsp") / col("gn")).as("pbar"))
    val madj = dbl(col("sx")) / col("n") -
      col("theta") * (dbl(col("sp")) / col("n") - col("pbar"))
    val vadj = ((dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) / col("n"))
      - lit(2) * col("theta") *
        (dbl(col("sxp")) - dbl(col("sx")) * dbl(col("sp")) / col("n"))
      + col("theta") * col("theta") *
        (dbl(col("spp")) - dbl(col("sp")) * dbl(col("sp")) / col("n"))) /
      (col("n") - 1)
    val a = st.filter(col("n") > 1).crossJoin(broadcast(t))
      .select(col("grp"), col("n"), col("theta"),
        madj.as("madj"), vadj.as("vadj"))
    def arm(gi: Int, c: Column): Column = max(when(col("grp") === gi, c))
    val vz = arm(1, col("vadj")) / arm(1, col("n")) +
      arm(0, col("vadj")) / arm(0, col("n"))
    a.agg(
        arm(0, col("n")).as("n_control"), arm(1, col("n")).as("n_treat"),
        floor(lit(1000) * max(col("theta"))).cast("long").as("theta_milli"),
        floor(arm(0, col("madj"))).cast("long").as("adj_mean_control_cents"),
        floor(arm(1, col("madj"))).cast("long").as("adj_mean_treat_cents"),
        floor(lit(1000000) *
          ((arm(1, col("madj")) - arm(0, col("madj"))) / sqrt(vz)))
          .cast("long").as("z_micro"),
        count(lit(1)).as("n_arms"), vz.as("vsum"))
      .filter(col("n_arms") === 2 && col("vsum") > 0)
      .drop("n_arms", "vsum")
  }

  /** TRANSITION RECIPROCITY census — the journey-SYMMETRY readout over
    * the directed type-transition graph, complementing [[graphScc]]'s
    * structural decomposition: per unordered type pair, both directed
    * transition counts and the weighted reciprocity
    * 2·min(n_ab, n_ba)/(n_ab + n_ba) in ppm — 10⁶ for perfectly
    * bidirectional browse loops (view↔click), 0 for strict one-way
    * funnel edges (cart→purchase with no return). The per-pair grain is
    * the diagnostic form: a global average hides which edges are
    * funnels.
    *
    * Parity discipline: pure integer — exact BIGINT counts, a
    * nonnegative floor DIV (min and sum of counts are nonnegative), no
    * real number anywhere. Self-loops are excluded by the mirrored
    * a ≠ b (reciprocity of a self-loop is degenerately 1).
    *
    * Plan: the one corpus-sized stage is the [[eventTransitions]]
    * user-keyed lead-window count; the unordered-pair fold is a second
    * aggregate over the |types|²-bounded frame — least/greatest
    * canonicalization needs NO self-join, both directions land in the
    * same group as conditional sums. */
  val graphReciprocity: Q = Q(
    "graph_reciprocity",
    """WITH o AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS a, next_type AS b, count(*) AS n
      |      FROM o WHERE next_type IS NOT NULL AND event_type <> next_type
      |      GROUP BY 1, 2),
      |u AS (SELECT LEAST(a, b) AS t_a, GREATEST(a, b) AS t_b,
      |    CAST(sum(CASE WHEN a < b THEN n ELSE 0 END) AS BIGINT) AS n_ab,
      |    CAST(sum(CASE WHEN a > b THEN n ELSE 0 END) AS BIGINT) AS n_ba
      |  FROM c GROUP BY 1, 2)
      |SELECT t_a, t_b, n_ab, n_ba,
      |  (2000000 * LEAST(n_ab, n_ba)) // (n_ab + n_ba) AS recip_ppm
      |FROM u ORDER BY t_a, t_b""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull &&
        col("event_type") =!= col("next_type"))
      .groupBy(col("event_type").as("a"), col("next_type").as("b"))
      .agg(count(lit(1)).as("n"))
    c.groupBy(least(col("a"), col("b")).as("t_a"),
        greatest(col("a"), col("b")).as("t_b"))
      .agg(sum(when(col("a") < col("b"), col("n")).otherwise(0L))
             .cast("long").as("n_ab"),
           sum(when(col("a") > col("b"), col("n")).otherwise(0L))
             .cast("long").as("n_ba"))
      .select(col("t_a"), col("t_b"), col("n_ab"), col("n_ba"),
        expr("(2000000 * least(n_ab, n_ba)) div (n_ab + n_ba)")
          .as("recip_ppm"))
  }

  /** POWER ANALYSIS / sample-size planner — the question every
    * experimenter asks BEFORE [[abLiftZtest]] runs: how many users per
    * arm (and how many days at current traffic) to detect a given
    * relative lift at α = 0.05 two-sided, power 0.8? Anchored on the
    * OBSERVED funnel: the baseline conversion is the corpus's own
    * exposed→converted rate and the traffic rate is its exposed users
    * per active day, so the grid row for "+10%" is this product's real
    * runway, not a textbook example. n/arm =
    * (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/δ² with the z-sum squared
    * pre-folded into one literal (7.848878512225001) — no pow() in the
    * value path.
    *
    * Parity discipline: the baseline quantizes ONCE to exact ppm
    * (floor DIV of exact counts); the per-row formula is one shared
    * scalar IEEE expression over that integer (÷ × only — correctly
    * rounded, no transcendental) with a single ceil quantization to
    * whole users; the day estimate is a pure INTEGER ceiling division
    * (2n+u−1) DIV u against the floor-DIV'd users-per-day rate, NULL
    * (mirrored nullif) when traffic is below one user/day.
    *
    * Plan: ONE user-keyed aggregate (the abLiftZtest per-user stage,
    * pooled) to a 1-row sufficient-statistics frame; the MDE grid
    * explodes from that row — 4 output rows, no second corpus touch. */
  val abPower: Q = Q(
    "ab_power",
    """WITH t AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)
      |      OVER (PARTITION BY user_id) AS t0,
      |    epoch_ms(ts) AS ms, event_type, CAST(ts AS DATE) AS day
      |  FROM events),
      |u AS (SELECT user_id,
      |    max(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS v,
      |    max(CASE WHEN event_type = 'purchase' AND ms > t0
      |             AND ms <= t0 + 86400000 THEN 1 ELSE 0 END) AS p
      |  FROM t GROUP BY 1),
      |s AS (SELECT CAST(sum(v) AS BIGINT) AS n,
      |    CAST(sum(v * p) AS BIGINT) AS x FROM u),
      |dd AS (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
      |       AS n_days FROM events),
      |g AS (SELECT s.n, s.x, dd.n_days, (1000000 * s.x) // s.n AS p_ppm,
      |    m.mde_pm
      |  FROM s, dd, (VALUES (50), (100), (200), (500)) m(mde_pm)
      |  WHERE s.n > 0 AND s.x > 0 AND s.x < s.n),
      |f AS (SELECT mde_pm, p_ppm,
      |    CAST(ceil(7.848878512225001
      |        * ((CAST(p_ppm AS DOUBLE) / 1000000)
      |             * (1 - CAST(p_ppm AS DOUBLE) / 1000000)
      |           + (CAST(p_ppm AS DOUBLE) / 1000000
      |              * (1 + CAST(mde_pm AS DOUBLE) / 1000))
      |             * (1 - CAST(p_ppm AS DOUBLE) / 1000000
      |                  * (1 + CAST(mde_pm AS DOUBLE) / 1000)))
      |        / ((CAST(p_ppm AS DOUBLE) / 1000000
      |            * (CAST(mde_pm AS DOUBLE) / 1000))
      |           * (CAST(p_ppm AS DOUBLE) / 1000000
      |              * (CAST(mde_pm AS DOUBLE) / 1000))))
      |      AS BIGINT) AS n_per_arm,
      |    n // n_days AS upd
      |  FROM g)
      |SELECT CAST(mde_pm AS INT) AS mde_pm, p_ppm AS base_rate_ppm,
      |  n_per_arm,
      |  (2 * n_per_arm + nullif(upd, 0) - 1) // nullif(upd, 0)
      |    AS days_required
      |FROM f ORDER BY mde_pm""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id")
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
      .withColumn("t0",
        min(when(col("event_type") === "view", col("ms"))).over(byUser))
    val u = t.groupBy(col("user_id"))
      .agg(max(when(col("t0").isNotNull, 1).otherwise(0)).as("v"),
           max(when(col("event_type") === "purchase" &&
               col("ms") > col("t0") &&
               col("ms") <= col("t0") + 86400000L, 1).otherwise(0))
             .as("p"))
    val st = u.agg(sum(col("v")).cast("long").as("n"),
                   sum(col("v") * col("p")).cast("long").as("x"))
    val dd = Tables.events(s, d)
      .agg(count_distinct(to_date(col("ts"))).cast("long").as("n_days"))
    val g = st.crossJoin(broadcast(dd))
      .filter(col("n") > 0 && col("x") > 0 && col("x") < col("n"))
      .select(col("n"), col("x"), col("n_days"),
        expr("(1000000 * x) div n").as("p_ppm"),
        explode(array(lit(50), lit(100), lit(200), lit(500)))
          .as("mde_pm"))
    val p1 = col("p_ppm").cast("double") / lit(1000000)
    val mult = lit(1) + col("mde_pm").cast("double") / lit(1000)
    val delta = p1 * (col("mde_pm").cast("double") / lit(1000))
    val nArm = ceil(lit(7.848878512225001) *
        (p1 * (lit(1) - p1) + (p1 * mult) * (lit(1) - p1 * mult)) /
        (delta * delta)).cast("long")
    g.select(col("mde_pm").cast("int").as("mde_pm"),
        col("p_ppm").as("base_rate_ppm"),
        nArm.as("n_per_arm"),
        expr("n div n_days").as("upd"))
      .select(col("mde_pm"), col("base_rate_ppm"), col("n_per_arm"),
        expr("(2 * n_per_arm + nullif(upd, 0) - 1) div nullif(upd, 0)")
          .as("days_required"))
      .orderBy("mde_pm")
  }

  /** COHORT LIFETIME-VALUE curves — the revenue side of the retention
    * pair: [[retentionCohort]] counts who comes back,
    * [[retentionSurvivalKm]] models when they stop, and THIS reports
    * what they are WORTH — per signup-quarter cohort and quarter
    * offset, the active-customer count, the cohort's cumulative revenue
    * in exact cents, and the LTV (cumulative cents per cohort member) a
    * payback model reads off directly. Cohort size needs no extra join:
    * every member orders in their own first quarter, so it is
    * first_value(n_active) over the cohort's offset-ordered frame.
    *
    * Parity discipline: pure integer — money through DECIMAL(18,2)
    * cents, quarter numbers as int arithmetic, an exact BIGINT window
    * sum for the cumulative and one nonnegative floor DIV for the LTV.
    *
    * Plan: one orders pass to (customer, quarter, cents), one
    * customer-keyed first-quarter aggregate joined back (the cohort
    * assignment — both sides customer-hashed), one (cohort, offset)
    * aggregate carrying the distinct-active count, then bounded
    * cohort-partitioned windows over the ≤|quarters|² frame. */
  val retentionLtv: Q = Q(
    "retention_ltv",
    """WITH o AS (SELECT o_custkey,
      |    (year(o_orderdate) - 1995) * 4 + (quarter(o_orderdate) - 1)
      |      AS qn,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, min(qn) AS cq FROM o GROUP BY 1),
      |a AS (SELECT f.cq AS cohort_q, o.qn - f.cq AS offset_q,
      |    CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
      |    CAST(sum(o.cents) AS BIGINT) AS rev_cents
      |  FROM o JOIN f ON o.o_custkey = f.o_custkey
      |  GROUP BY 1, 2),
      |c AS (SELECT cohort_q, offset_q, n_active,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_q ORDER BY offset_q
      |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
      |    first_value(n_active) OVER (PARTITION BY cohort_q
      |         ORDER BY offset_q) AS cohort_size
      |  FROM a)
      |SELECT CAST(cohort_q AS INT) AS cohort_q,
      |  CAST(offset_q AS INT) AS offset_q, n_active, cum_cents,
      |  cum_cents // cohort_size AS ltv_cents
      |FROM c ORDER BY cohort_q, offset_q""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d).select(col("o_custkey"),
      ((year(col("o_orderdate")) - 1995) * 4
        + (quarter(col("o_orderdate")) - 1)).as("qn"),
      (Tables.money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val f = o.groupBy("o_custkey").agg(min(col("qn")).as("cq"))
    val a = o.join(f, Seq("o_custkey"))
      .groupBy(col("cq").as("cohort_q"), (col("qn") - col("cq")).as("offset_q"))
      .agg(count_distinct(col("o_custkey")).cast("long").as("n_active"),
           sum(col("cents")).cast("long").as("rev_cents"))
    val wc = Window.partitionBy("cohort_q").orderBy("offset_q")
    a.select(col("cohort_q").cast("int").as("cohort_q"),
        col("offset_q").cast("int").as("offset_q"), col("n_active"),
        sum(col("rev_cents"))
          .over(wc.rowsBetween(Window.unboundedPreceding,
                               Window.currentRow))
          .cast("long").as("cum_cents"),
        first(col("n_active")).over(wc).as("cohort_size"))
      .select(col("cohort_q"), col("offset_q"), col("n_active"),
        col("cum_cents"),
        expr("cum_cents div cohort_size").as("ltv_cents"))
  }

  /** Rolling DAU / WAU / MAU active-user census + stickiness — the
    * engagement dashboard every product ships: for each observed day,
    * distinct users active that day (DAU), in the trailing 7 days (WAU),
    * in the trailing 28 days (MAU), and DAU/MAU stickiness in ppm.
    *
    * Plan shape — why this is a RECENCY aggregate, not three
    * count-distincts: the naive `count(DISTINCT user) FILTER (...)` ×3
    * per day makes Spark EXPAND the frame 3× before the distinct
    * shuffle. Instead activity first reduces to DISTINCT (user, day) —
    * one exchange, bounded by users×days, never raw events — then each
    * user-day fans out to its ≤28 trailing target days and a (target
    * day, user) aggregate keeps only `rec = min(day gap)`, the user's
    * RECENCY on that day. DAU/WAU/MAU are then plain conditional counts
    * over recency (rec=0 / rec≤6 / any) in one day-keyed partial+final
    * aggregate — no distinct expand, no second distinct shuffle, and the
    * 28× fan-out applies to the already-collapsed user-day frame. The
    * observed-day dimension is tiny (|calendar days|) and broadcasts.
    * Stickiness is a nonnegative integer floor-div, exact on both
    * engines. */
  val retentionDauMau: Q = Q(
    "retention_dau_mau",
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |           FROM events),
      |days AS (SELECT DISTINCT day FROM a),
      |r AS (SELECT d.day, a.user_id,
      |        min(datediff('day', a.day, d.day)) AS rec
      |      FROM days d JOIN a
      |        ON datediff('day', a.day, d.day) BETWEEN 0 AND 27
      |      GROUP BY 1, 2)
      |SELECT day,
      |  CAST(count(*) FILTER (WHERE rec = 0) AS BIGINT) AS dau,
      |  CAST(count(*) FILTER (WHERE rec <= 6) AS BIGINT) AS wau,
      |  CAST(count(*) AS BIGINT) AS mau,
      |  CAST((1000000 * CAST(count(*) FILTER (WHERE rec = 0) AS BIGINT))
      |       // count(*) AS BIGINT) AS stickiness_ppm
      |FROM r GROUP BY 1 ORDER BY day""".stripMargin
  ) { (s, d) =>
    val a = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = a.select(col("day").as("tday")).distinct()
    val fan = a
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(27))).as("i"))
      .select(col("user_id"), expr("date_add(day, i)").as("tday"), col("i"))
    fan.join(broadcast(days), Seq("tday"))
      .groupBy("tday", "user_id")
      .agg(min(col("i")).as("rec"))
      .groupBy(col("tday").as("day"))
      .agg(count(when(col("rec") === 0, 1)).as("dau"),
           count(when(col("rec") <= 6, 1)).as("wau"),
           count(lit(1)).as("mau"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(1000000 * dau) div mau").as("stickiness_ppm"))
  }

  /** Traffic-seasonality heatmap — the day-of-week × hour-of-day load
    * census capacity planning reads (when to schedule maintenance, what
    * the peak:trough ratio is, whether weekend traffic justifies a
    * separate fleet): per (dow, hour) cell, the event count, its share
    * of all traffic in ppm, and the cell's load rank WITHIN its weekday
    * (rank 1 = that weekday's peak hour). The within-dow rank makes
    * daily load curves comparable across weekdays with different
    * volumes.
    *
    * Parity: counts are exact; share is a nonnegative integer floor-div
    * (numerator widened — 10⁶·cell count clears int64 at ~10¹³ events);
    * the rank orders by (count DESC, hour) — hour breaks count ties
    * deterministically on both engines.
    *
    * Plan: ONE partial+final aggregate to the fixed 168-cell frame;
    * the total and the rank window ride that bounded frame. */
  val eventSeasonality: Q = Q(
    "event_seasonality",
    """WITH c AS (SELECT CAST(isodow(ts) AS INT) AS dow,
      |    CAST(hour(ts) AS INT) AS hr, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT dow, hr, n, sum(n) OVER () AS tot,
      |    CAST(row_number() OVER (PARTITION BY dow ORDER BY n DESC, hr)
      |         AS INT) AS rank_in_dow
      |  FROM c)
      |SELECT dow, hr, n,
      |  CAST((1000000 * CAST(n AS HUGEINT)) // tot AS BIGINT)
      |    AS share_ppm,
      |  rank_in_dow
      |FROM t ORDER BY dow, hr""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // ISO weekday (Mon=1..Sun=7): Spark's dayofweek is Sunday-first while
    // DuckDB's is 0-based — weekday()+1 ≡ isodow() is the one aligned pair
    val c = Tables.events(s, d)
      .groupBy((weekday(col("ts")) + 1).cast("int").as("dow"),
        hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rk = Window.partitionBy("dow").orderBy(desc("n"), asc("hr"))
    c.withColumn("tot", sum(col("n")).over(tot)) // 168-row frame
      .withColumn("rank_in_dow", row_number().over(rk))
      .select(col("dow"), col("hr"), col("n"),
        expr("(1000000 * cast(n as decimal(38,0))) div tot")
          .cast("long").as("share_ppm"),
        col("rank_in_dow"))
      .orderBy("dow", "hr")
  }

  /** Inter-arrival-time distribution — the burstiness fingerprint
    * ([[eventBurst]] flags the peaks; this shows the whole shape): for
    * every consecutive per-user event pair, the gap in milliseconds
    * log₂-binned, counted per type of the LATER event ("how long was
    * the user idle before doing X"). A Poisson user shows a geometric
    * tail; a bot shows mass piled in the bottom bins — the two shapes
    * this histogram separates at a glance.
    *
    * The log₂ bin is the portable-arithmetic trick of the round:
    * `length(bin(gap))` — both engines' `bin()` renders the minimal
    * binary string, so its LENGTH is ⌊log₂ gap⌋+1 exactly, with no
    * float log (and no ln-ulp boundary risk) anywhere.
    *
    * Plan: ONE user-keyed exchange for the lag window, a partial+final
    * aggregate to the (type × ≤41 bins) frame, and the share window
    * rides that bounded frame; the ppm numerator widens (10⁶·n clears
    * int64 at ~10¹³ events). */
  val eventInterarrival: Q = Q(
    "event_interarrival",
    """WITH o AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS prev
      |  FROM events),
      |g AS (SELECT event_type,
      |        CAST(length(bin(ms - prev)) AS INT) AS bucket
      |      FROM o WHERE prev IS NOT NULL),
      |a AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
      |      FROM g GROUP BY 1, 2)
      |SELECT event_type, bucket, n,
      |  CAST((1000000 * CAST(n AS HUGEINT))
      |       // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
      |    AS share_ppm
      |FROM a ORDER BY event_type, bucket""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val byType = Window.partitionBy("event_type")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), expr("unix_millis(ts)").as("ms"))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        length(bin(col("ms") - col("prev"))).cast("int").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(byType))
      .select(col("event_type"), col("bucket"), col("n"),
        expr("(1000000 * cast(n as decimal(38,0))) div tot")
          .cast("long").as("share_ppm"))
  }

  /** Burst detection — the bot/abuse screen a rate-limited API runs over
    * its event log: per user, the maximum number of events inside ANY
    * trailing 60-minute window (computed exactly by a RANGE frame over
    * epoch milliseconds — every event's trailing window is a candidate,
    * so the max is the true sliding-window peak, not an hourly-bucket
    * approximation that splits bursts across bucket edges), the total
    * event count, and the burst flag.
    *
    * Parity: the RANGE frame is tie-STABLE by construction — all rows
    * with equal `ms` are frame peers on both engines, so no total-order
    * tie-break is needed (the agg_weighted_median lesson). Counts are
    * BIGINT; the flag is a plain comparison.
    *
    * Plan: ONE user-keyed exchange feeds the range window, and the
    * per-user max/count aggregate reuses that partitioning — the event
    * frame shuffles once. Frame width is bounded by per-user events per
    * hour; an adversarial hot user concentrates one partition, the same
    * skew envelope the salted-join family documents. */
  val eventBurst: Q = Q(
    "event_burst",
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
      |b AS (SELECT user_id,
      |        CAST(count(*) OVER (PARTITION BY user_id ORDER BY ms
      |          RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW)
      |          AS BIGINT) AS burst
      |      FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(burst) AS BIGINT) AS max_burst_1h,
      |  max(burst) >= 3 AS burst_flag
      |FROM b GROUP BY 1 ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ms")
      .rangeBetween(-3599999L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           max(col("burst")).as("max_burst_1h"))
      .select(col("user_id"), col("n_events"), col("max_burst_1h"),
        (col("max_burst_1h") >= 3).as("burst_flag"))
  }

  /** SAMPLE-RATIO MISMATCH audit — the pre-test gate every
    * experimentation platform runs BEFORE reading [[abLiftZtest]] /
    * [[abRatioDelta]] / [[abCuped]]: if the observed arm split deviates
    * from the designed 50/50 beyond chance, the randomizer (or a
    * logging path) is broken and every downstream readout is invalid.
    * Per event-day: distinct active users per arm (`user_id % 2`, the
    * triad's assignment) and the one-df chi-square against the equal
    * split — for a 50/50 two-arm design it collapses to
    * (n₀−n₁)²/(n₀+n₁) — flagged at the industry-standard p < 0.001
    * alarm (χ²₁ = 10.8276). The per-day grain is the diagnostic form:
    * a deploy that breaks assignment shows up as the flag flipping on
    * from one day forward, which a single whole-experiment row hides.
    *
    * Parity discipline: the statistic is PURE INTEGER — the squared
    * difference is nonnegative so the floor DIV never meets the
    * engines' differing negative-division conventions, and there is no
    * transcendental anywhere (the chi-square THRESHOLD constant carries
    * the only real number, pre-quantized to micro units). The square is
    * DECIMAL(38,0)/HUGEINT-widened so a billion-user day cannot
    * overflow the 10⁶-scaled numerator.
    *
    * Plan: one exchange on the distinct (day, user) pair — arm is a
    * function of user_id, so the per-arm counts are conditional sums in
    * the same day-keyed partial+final aggregate, not a second distinct;
    * the output is ≤|days| rows. */
  val abSrm: Q = Q(
    "ab_srm",
    """WITH u AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      |           FROM events),
      |c AS (SELECT day,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_control,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_treat
      |  FROM u GROUP BY 1)
      |SELECT day, n_control, n_treat,
      |  CAST((1000000 * CAST(n_control - n_treat AS HUGEINT)
      |        * (n_control - n_treat)) // (n_control + n_treat)
      |    AS BIGINT) AS chi2_micro,
      |  CAST((1000000 * CAST(n_control - n_treat AS HUGEINT)
      |        * (n_control - n_treat)) // (n_control + n_treat)
      |    AS BIGINT) > 10827600 AS srm
      |FROM c ORDER BY day""".stripMargin
  ) { (s, d) =>
    val u = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val c = u.groupBy("day").agg(
      sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
        .cast("long").as("n_control"),
      sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
        .cast("long").as("n_treat"))
    val chi2 = expr(
      "CAST(CAST(1000000 AS DECIMAL(38,0)) * (n_control - n_treat)" +
      " * (n_control - n_treat) DIV (n_control + n_treat) AS BIGINT)")
    c.select(col("day"), col("n_control"), col("n_treat"),
        chi2.as("chi2_micro"), (chi2 > 10827600L).as("srm"))
  }

  /** SEQUENTIAL MONITORING scan with an O'Brien-Fleming-shaped boundary —
    * the peeking correction that completes the experimentation suite:
    * [[abSrm]] gates the assignment, [[abLiftZtest]]/[[abRatioDelta]]/
    * [[abCuped]] read the fixed-horizon result, and THIS is the daily
    * dashboard that may be read EVERY day without inflating false
    * positives: per event-day the cumulative two-proportion z over all
    * exposure/conversion data up to that day, the information fraction,
    * and the OBF-shaped boundary C·√(1/t) that starts strict and relaxes
    * toward C as information accrues (C fixed at the classical 2.0400;
    * users calibrate C to their look count — the SHAPE is the
    * operator's semantics). `crossed` marks days where early stopping
    * is licensed.
    *
    * Parity discipline: cumulative counts are exact BIGINTs from one
    * user-keyed aggregate; z and the boundary are shared scalar IEEE
    * expressions over those integers using only correctly-rounded ops
    * (÷, ×, √ — the [[abLiftZtest]] precedent; no libm transcendental),
    * each floor-quantized ONCE to micro units so the crossing flag
    * compares two integers and cannot straddle engine rounding.
    * Degenerate days (an empty arm, all-or-nothing conversions) are
    * excluded by the mirrored WHERE.
    *
    * Plan: ONE corpus-sized stage — the user-keyed first-event/
    * first-purchase aggregate; the per-(arm, day, kind) census, the
    * spine×census cumulative join (both sides post-aggregate,
    * ≤|days|-bounded, so the broadcast nested loop is over two tiny
    * frames), and the scalar math all run at day-domain cardinality. */
  val abSequential: Q = Q(
    "ab_sequential",
    """WITH u AS (SELECT user_id, user_id % 2 AS grp,
      |    min(CAST(ts AS DATE)) AS fe,
      |    min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
      |      AS fp
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT grp, fe AS d, 0 AS k FROM u
      |      UNION ALL
      |      SELECT grp, fp, 1 FROM u WHERE fp IS NOT NULL),
      |ce AS (SELECT grp, k, d, count(*) AS c FROM m GROUP BY 1, 2, 3),
      |sp AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |cum AS (SELECT sp.day,
      |    CAST(coalesce(sum(CASE WHEN grp = 0 AND k = 0 THEN c END), 0)
      |      AS BIGINT) AS n0,
      |    CAST(coalesce(sum(CASE WHEN grp = 1 AND k = 0 THEN c END), 0)
      |      AS BIGINT) AS n1,
      |    CAST(coalesce(sum(CASE WHEN grp = 0 AND k = 1 THEN c END), 0)
      |      AS BIGINT) AS x0,
      |    CAST(coalesce(sum(CASE WHEN grp = 1 AND k = 1 THEN c END), 0)
      |      AS BIGINT) AS x1
      |  FROM sp LEFT JOIN ce ON ce.d <= sp.day GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM u),
      |z AS (SELECT day, n0, n1, x0, x1, nn,
      |    (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
      |      / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
      |             * (1.0 / n0 + 1.0 / n1)) AS zstat,
      |    sqrt(CAST(nn AS DOUBLE) / (n0 + n1)) AS binv
      |  FROM cum, tot
      |  WHERE n0 > 0 AND n1 > 0 AND x0 + x1 > 0 AND x0 + x1 < n0 + n1)
      |SELECT day, n0 AS n_control, n1 AS n_treat,
      |  x0 AS conv_control, x1 AS conv_treat,
      |  (1000000 * (n0 + n1)) // nn AS info_ppm,
      |  CAST(floor(1000000 * zstat) AS BIGINT) AS z_micro,
      |  CAST(floor(2040000 * binv) AS BIGINT) AS obf_boundary_micro,
      |  abs(CAST(floor(1000000 * zstat) AS BIGINT)) >
      |    CAST(floor(2040000 * binv) AS BIGINT) AS crossed
      |FROM z ORDER BY day""".stripMargin
  ) { (s, d) =>
    val dayOf = to_date(col("ts"))
    // cache: the user aggregate has THREE consumers (both melt branches
    // + the total) — without it each one re-runs the corpus-sized stage
    // (lazy cache keeps the query a pure plan; the graph_modularity
    // reuse discipline)
    val u = Tables.events(s, d)
      .groupBy(col("user_id"), (col("user_id") % 2).as("grp"))
      .agg(min(dayOf).as("fe"),
           min(when(col("event_type") === "purchase", dayOf)).as("fp"))
      .cache()
    val m = u.select(col("grp"), col("fe").as("d"), lit(0).as("k"))
      .union(u.filter(col("fp").isNotNull)
        .select(col("grp"), col("fp").as("d"), lit(1).as("k")))
    val ce = m.groupBy("grp", "k", "d").agg(count(lit(1)).as("c"))
    val sp = Tables.events(s, d).select(dayOf.as("day")).distinct()
    def cnt(g: Int, k: Int): Column =
      coalesce(sum(when(col("grp") === g && col("k") === k, col("c"))),
        lit(0L)).cast("long")
    val cum = sp.join(broadcast(ce), col("d") <= col("day"), "left")
      .groupBy("day")
      .agg(cnt(0, 0).as("n0"), cnt(1, 0).as("n1"),
           cnt(0, 1).as("x0"), cnt(1, 1).as("x1"))
    val tot = u.agg(count(lit(1)).cast("long").as("nn"))
    val pooled = (col("x0") + col("x1")).cast("double") /
      (col("n0") + col("n1"))
    val zstat = (col("x1").cast("double") / col("n1") -
        col("x0").cast("double") / col("n0")) /
      sqrt(pooled * (lit(1) - pooled) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val binv = sqrt(col("nn").cast("double") / (col("n0") + col("n1")))
    val zMicro = floor(lit(1000000) * zstat).cast("long")
    val bMicro = floor(lit(2040000) * binv).cast("long")
    cum.crossJoin(broadcast(tot))
      .filter(col("n0") > 0 && col("n1") > 0 &&
        col("x0") + col("x1") > 0 &&
        col("x0") + col("x1") < col("n0") + col("n1"))
      .select(col("day"), col("n0").as("n_control"),
        col("n1").as("n_treat"),
        col("x0").as("conv_control"), col("x1").as("conv_treat"),
        expr("(1000000 * (n0 + n1)) div nn").as("info_ppm"),
        zMicro.as("z_micro"), bMicro.as("obf_boundary_micro"),
        (abs(zMicro) > bMicro).as("crossed"))
  }

  /** KAPLAN-MEIER SURVIVAL curve over customer lifetimes — the
    * churn-analytics staple [[retentionCohort]] doesn't cover: cohort
    * retention counts who is still active per period; the KM estimator
    * gives the survival FUNCTION S(t) = Π(1 − dᵢ/nᵢ) with its per-period
    * hazard. Lifetime = 30-day buckets between a customer's first and
    * last order; per bucket: churn count, the at-risk suffix count, the
    * hazard in ppm, and S(t) in log-nano units.
    *
    * Parity discipline: the survival PRODUCT is the trap — a float
    * running product (or exp-of-float-sum) is order- and libm-sensitive.
    * Log domain fixes both: each bucket's ln(1 − d/n) quantizes ONCE to
    * nano units (the PSI ln discipline — scalar per bucket, from exact
    * integers), and the cumulative is an exact BIGINT window sum; the
    * reader exponentiates. The terminal bucket (d = n, S = 0, ln
    * undefined) is excluded by a mirrored WHERE — the
    * standard KM curve support. Hazard is nonneg floor-DIV ppm.
    *
    * Plan: one customer-keyed partial+final aggregate (the only
    * corpus-sized stage), then a ≤|buckets|-row frame carries the
    * suffix-sum and cumulative windows (both above the aggregate — the
    * catalog-wide bounded-frame rule). */
  val retentionSurvivalKm: Q = Q(
    "retention_survival_km",
    """WITH u AS (SELECT o_custkey,
      |    min(date_diff('day', DATE '1992-01-01', o_orderdate)) AS fd,
      |    max(date_diff('day', DATE '1992-01-01', o_orderdate)) AS ld
      |  FROM orders GROUP BY 1),
      |l AS (SELECT (ld - fd) // 30 AS t FROM u),
      |d AS (SELECT t, CAST(count(*) AS BIGINT) AS churned FROM l GROUP BY 1),
      |r AS (SELECT t, churned,
      |    CAST(sum(churned) OVER (ORDER BY t DESC) AS BIGINT) AS at_risk
      |  FROM d),
      |s AS (SELECT t, churned, at_risk,
      |    (1000000 * churned) // at_risk AS hazard_ppm,
      |    CAST(floor(1000000000
      |      * ln(1.0 - CAST(churned AS DOUBLE) / at_risk)) AS BIGINT)
      |      AS lognano
      |  FROM r WHERE churned < at_risk)
      |SELECT t, churned, at_risk, hazard_ppm,
      |  CAST(sum(lognano) OVER (ORDER BY t) AS BIGINT)
      |    AS log_survival_nano
      |FROM s ORDER BY t""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val u = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(min(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
             .as("fd"),
           max(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
             .as("ld"))
    val dd = u.select(expr("(ld - fd) div 30").as("t"))
      .groupBy("t").agg(count(lit(1)).as("churned"))
    val r = dd.withColumn("at_risk",
      sum(col("churned")).over(Window.orderBy(desc("t"))))
    val sv = r.filter(col("churned") < col("at_risk"))
      .select(col("t"), col("churned"), col("at_risk"),
        expr("(1000000 * churned) div at_risk").as("hazard_ppm"),
        floor(lit(1000000000L) *
          log(lit(1.0) - col("churned").cast("double") / col("at_risk")))
          .cast("long").as("lognano"))
    sv.withColumn("log_survival_nano",
        sum(col("lognano")).over(Window.orderBy("t")).cast("long"))
      .drop("lognano")
      .orderBy("t")
  }

  /** UPLIFT DECILE / QINI CURVE — the targeting readout on top of the
    * [[abLiftZtest]] experiment: rank every user by a deterministic
    * targeting score (here pre-treatment engagement — click count — the
    * proxy an uplift model would replace), cut the ranking into 10
    * population deciles, and report per-decile and CUMULATIVE
    * treatment-vs-control conversion lift. A monotonically decaying
    * qini_ppm curve means the score successfully concentrates
    * persuadable users at the top — the decision input for "how deep to
    * target"; a flat curve means the score carries no uplift signal.
    *
    * The scale point is the RANKING: the naive plan is a corpus-wide
    * `row_number() OVER (ORDER BY score DESC, user_id)` — a
    * single-partition global sort over every user. Here the global rank
    * is ARITHMETIC (the [[graft.operators.Corpus.corpusInterleave]]
    * proof pattern): the score domain is small (bounded per-user click
    * counts), so rank = Σ counts of strictly-higher scores (a broadcast
    * |scores|-row frame) + rank within the score by user_id (one
    * exchange keyed by score). The DuckDB oracle USES the naive global
    * window, so the driver's hash compare proves the distributed
    * arithmetic equals the global sort. All statistics are exact BIGINT
    * counts; rates are floor-DIV ppm with nullif guards for empty arms.
    */
  val abQiniDecile: Q = Q(
    "ab_qini_decile",
    """WITH u AS (SELECT user_id, user_id % 2 AS grp,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS score,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT grp, conv,
      |    row_number() OVER (ORDER BY score DESC, user_id) AS rn,
      |    count(*) OVER () AS nu
      |  FROM u),
      |c AS (SELECT CAST((10 * (rn - 1)) // nu AS INT) AS decile,
      |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1
      |  FROM r GROUP BY 1),
      |q AS (SELECT decile, n0, n1, x0, x1,
      |    CAST(sum(n0) OVER (ORDER BY decile) AS BIGINT) AS cn0,
      |    CAST(sum(n1) OVER (ORDER BY decile) AS BIGINT) AS cn1,
      |    CAST(sum(x0) OVER (ORDER BY decile) AS BIGINT) AS cx0,
      |    CAST(sum(x1) OVER (ORDER BY decile) AS BIGINT) AS cx1
      |  FROM c)
      |SELECT decile, n0 AS n_control, n1 AS n_treat,
      |  x0 AS conv_control, x1 AS conv_treat,
      |  (1000000 * x1) // nullif(n1, 0)
      |    - (1000000 * x0) // nullif(n0, 0) AS uplift_ppm,
      |  (1000000 * cx1) // nullif(cn1, 0)
      |    - (1000000 * cx0) // nullif(cn0, 0) AS qini_ppm
      |FROM q ORDER BY decile""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val u = Tables.events(s, d)
      .groupBy(col("user_id"), (col("user_id") % 2).as("grp"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0))
             .cast("long").as("score"),
           max(when(col("event_type") === "purchase", 1).otherwise(0))
             .as("conv"))
    // arithmetic global rank: offsets from the tiny per-score count
    // frame (broadcast), within-score rank keyed BY score — no
    // single-partition corpus sort
    val sc = u.groupBy(col("score").as("sc")).agg(count(lit(1)).as("cnt"))
    val wHigher = Window.orderBy(desc("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(desc("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off = sc
      .withColumn("offset", coalesce(sum(col("cnt")).over(wHigher), lit(0L)))
      .withColumn("nu", sum(col("cnt")).over(wAll))
    val wIn = Window.partitionBy("score").orderBy("user_id")
    val ranked = u.join(broadcast(off), col("score") === col("sc"))
      .withColumn("rn", col("offset") + row_number().over(wIn))
      .withColumn("decile", expr("(10 * (rn - 1)) div nu").cast("int"))
    val c = ranked.groupBy("decile")
      .agg(sum(when(col("grp") === 0, 1).otherwise(0)).as("n0"),
           sum(when(col("grp") === 1, 1).otherwise(0)).as("n1"),
           sum(when(col("grp") === 0, col("conv")).otherwise(0)).as("x0"),
           sum(when(col("grp") === 1, col("conv")).otherwise(0)).as("x1"))
    val wCum = Window.orderBy("decile")  // bounded ≤10-row frame
    val q = c
      .withColumn("cn0", sum(col("n0")).over(wCum))
      .withColumn("cn1", sum(col("n1")).over(wCum))
      .withColumn("cx0", sum(col("x0")).over(wCum))
      .withColumn("cx1", sum(col("x1")).over(wCum))
    q.select(col("decile"), col("n0").as("n_control"),
        col("n1").as("n_treat"), col("x0").as("conv_control"),
        col("x1").as("conv_treat"),
        expr("""(1000000 * x1) div nullif(n1, 0)
                - (1000000 * x0) div nullif(n0, 0)""").as("uplift_ppm"),
        expr("""(1000000 * cx1) div nullif(cn1, 0)
                - (1000000 * cx0) div nullif(cn0, 0)""").as("qini_ppm"))
      .orderBy("decile")
  }

  val all: Seq[Q] = Seq(streamTumbling, streamHopping, streamSession,
    resampleGapfill, resampleInterp, funnel, funnelMultistep, funnelWindowed, rateLimitSim, eventPaths,
    retentionCohort,
    eventTransitions, ohlcBars, sessionizeGaps, patternSeq,
    attributionLastclick, attributionLinear, attributionTimedecay,
    attributionShapley,
    scd2, scd2Incremental, joinPit, abLiftZtest, abLiftSegmented, funnelWindowSweep,
    abRatioDelta, abCuped, abSrm,
    abSequential, abPower, abQiniDecile, retentionSurvivalKm, retentionLtv,
    retentionDauMau, eventBurst, eventSeasonality, eventInterarrival,
    sessionConcurrency, markovTwoStep, markovStationary, markovEntropy,
    graphScc, graphBetweenness, graphDiameter, graphReciprocity,
    graphCloseness)
}
