package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series model diagnostics over the `events` stream table —
  * the statistical layer above the resample/OHLC/sessionize family in
  * [[Streaming]]: autocorrelation (seasonality detection), CUSUM
  * changepoint location, and exponentially weighted smoothing.
  *
  * Scale posture: every query first reduces raw events to a per-key
  * SERIES frame (hourly/daily counts, or per-user ordered values) with
  * one partial+final aggregate or one user-keyed exchange; all series
  * math then runs over the reduced frame, whose size is bounded by
  * keys × buckets (never raw event count). The determinism discipline
  * is the repo standard: counts and cumulative sums stay exact BIGINTs,
  * each double is produced by one correctly-rounded operation sequence
  * identical in both engines.
  */
object TimeSeries {

  /** AUTOCORRELATION of the hourly event-count series per event_type at
    * lags 1..3 — the seasonality/self-similarity diagnostic that decides
    * resampling granularity and feature windows. Pearson r over
    * (x_t, x_{t-k}) pairs from integer-exact sufficient statistics:
    * n·Σxy − Σx·Σy over √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)); every Σ is a
    * BIGINT, the two variance factors cast to double BEFORE multiplying
    * (their product overflows int64 long before the factors do), and a
    * shared `nullif` guards constant series.
    *
    * Plan: one aggregate reduces events to the series frame; the three
    * lag columns share ONE type-keyed window sort; the map-explode melts
    * them into (lag_k, prev) rows — adding a lag adds a column, never a
    * pass — and a final partial+final aggregate on (type, lag_k) emits
    * the sufficient statistics. Window frames are series-sized (buckets
    * per type), not event-sized. */
  val tsAutocorr: Q = Q(
    "ts_autocorr",
    """WITH c AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bkt,
      |             count(*) AS x
      |           FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, x,
      |    lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2, lag(x, 3) OVER w AS x3
      |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
      |p AS (SELECT event_type, 1 AS lag_k, x, x1 AS prev FROM l WHERE x1 IS NOT NULL
      |      UNION ALL
      |      SELECT event_type, 2, x, x2 FROM l WHERE x2 IS NOT NULL
      |      UNION ALL
      |      SELECT event_type, 3, x, x3 FROM l WHERE x3 IS NOT NULL),
      |s AS (SELECT event_type, lag_k, count(*) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(prev) AS BIGINT) AS sy,
      |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(prev*prev) AS BIGINT) AS syy,
      |        CAST(sum(x*prev) AS BIGINT) AS sxy
      |      FROM p GROUP BY 1, 2)
      |SELECT event_type, lag_k, CAST(n AS BIGINT) AS n_pairs,
      |  CAST(n*sxy - sx*sy AS DOUBLE) /
      |  nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 0)
      |    AS acf
      |FROM s ORDER BY event_type, lag_k""".stripMargin
  ) { (s, d) =>
    val series = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bkt"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("bkt")
    series
      .withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("x2", lag(col("x"), 2).over(w))
      .withColumn("x3", lag(col("x"), 3).over(w))
      .select(col("event_type"), col("x"),
        explode(map(lit(1), col("x1"), lit(2), col("x2"), lit(3), col("x3")))
          .as(Seq("lag_k", "prev")))
      .filter(col("prev").isNotNull)
      .groupBy("event_type", "lag_k")
      .agg(count(lit(1)).as("n"),
           sum(col("x")).as("sx"), sum(col("prev")).as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("prev") * col("prev")).as("syy"),
           sum(col("x") * col("prev")).as("sxy"))
      .select(col("event_type"), col("lag_k"),
        col("n").as("n_pairs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          expr("""nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)), 0)"""))
          .as("acf"))
  }

  /** CUSUM CHANGEPOINT location over the daily event-count series per
    * event_type — "when did the level shift?", the monitoring companion
    * to `dq_drift_ks`'s "did the distribution move?". The classic
    * statistic argmax_t |Σ_{i≤t}(x_i − μ)| stays exact by scaling
    * through by N: cusum_t = N·Σ_{i≤t}x_i − t·Σx is a BIGINT for any
    * input that fits one, so the argmax is bit-deterministic (ties break
    * to the earliest day via the rank ordering). The normalized
    * magnitude is one double division at the end.
    *
    * Plan: events reduce to (type, day, x) in one aggregate; the running
    * sum, per-type totals, and rank all share the type-keyed sort over
    * series-sized frames (≤ days per type — bounded by construction, the
    * `dq_drift_ks` discipline). */
  val tsChangepoint: Q = Q(
    "ts_changepoint",
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      |           FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, day, x,
      |    sum(x) OVER (PARTITION BY event_type ORDER BY day
      |                 ROWS UNBOUNDED PRECEDING) AS cum,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
      |    sum(x) OVER (PARTITION BY event_type) AS s,
      |    count(*) OVER (PARTITION BY event_type) AS nd
      |  FROM c),
      |k AS (SELECT event_type, day, nd, s, abs(nd*cum - t*s) AS a,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY abs(nd*cum - t*s) DESC, day) AS rn
      |  FROM t)
      |SELECT event_type, CAST(nd AS BIGINT) AS n_days, day AS cp_day,
      |  CAST(a AS BIGINT) AS max_abs_cusum,
      |  CAST(a AS DOUBLE) / (nd * s) AS cusum_norm
      |FROM k WHERE rn = 1 ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val series = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.partitionBy("event_type").orderBy("day")
    val wTot = Window.partitionBy("event_type")
    val scored = series
      .withColumn("cum", sum(col("x")).over(wCum))
      .withColumn("t", row_number().over(wRn))
      .withColumn("s", sum(col("x")).over(wTot))
      .withColumn("nd", count(lit(1)).over(wTot))
      .withColumn("a", abs(col("nd") * col("cum") - col("t") * col("s")))
    val wPick = Window.partitionBy("event_type")
      .orderBy(desc("a"), asc("day"))
    scored.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("nd").as("n_days"),
        col("day").as("cp_day"), col("a").as("max_abs_cusum"),
        (col("a").cast("double") / (col("nd") * col("s"))).as("cusum_norm"))
  }

  /** EWMA — the per-key SEQUENTIAL RECURRENCE pattern (y_i = αx_i +
    * (1−α)y_{i−1}, α = 1/2, seeded y_1 = x_1) that no SQL window can
    * express without either a recursive CTE or an unstable power-weight
    * closed form. The engine answer is the secondary-sort idiom: ONE
    * exchange hash-keyed by user, an in-partition (user, ts, event_id)
    * sort, then a single `mapPartitions` pass carrying O(1) state per
    * key — the same plan serves any linear filter (decayed counters,
    * Kalman-style smoothers, rate limiters). Per-user history must fit
    * one partition — the identical bound every user-keyed window query
    * here already lives with.
    *
    * Float parity without quantization: α = 1/2 makes both multiplies
    * EXACT (halving only decrements the exponent), so each step is one
    * correctly-rounded addition — the oracle's recursive CTE performs
    * the literally identical IEEE operation sequence, and the hash
    * compare is bit-for-bit. `value` first becomes exact cents via the
    * [[Tables.Money]] cast (cents < 2⁵³ ⇒ the double is exact). */
  val tsEwma: Q = Q(
    "ts_ewma",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, rn, v AS ewma FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.event_id, x.rn, 0.5 * x.v + 0.5 * r.ewma
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1)
      |SELECT user_id, event_id, ewma FROM r
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.asDouble(Tables.money(col("value"))).as("v"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .select("user_id", "event_id", "v").as[(Long, Long, Double)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var y = 0.0
        it.map { case (u, id, x) =>
          y = if (u == curUser) 0.5 * x + 0.5 * y else x
          curUser = u
          (u, id, y)
        }
      }
      .toDF("user_id", "event_id", "ewma")
      // full-table output: no presentation sort (r11 opt, see
      // operators.Windows scaladoc)
  }

  /** SEASONAL DECOMPOSITION (the classical additive model's profile
    * step): per event_type, the hour-of-day seasonal profile — mean
    * `value` and mean hourly count per clock hour — plus each hour's
    * deviation from the type's overall level. The profile is what
    * anomaly detection subtracts before thresholding and what capacity
    * planning reads directly.
    *
    * Exactness: value sums go through DECIMAL(18,2) ([[Tables.money]])
    * and STAY decimal through the type-level window sum — a double
    * window sum would be frame-order-dependent and diverge between
    * engines; decimal addition is exact in any order. Each mean casts
    * to double only at its one division; the deviation subtracts two
    * such means — all correctly-rounded IEEE ops, identical in both
    * engines. Plan: ONE partial+final aggregate to the 24×|types|
    * profile frame; the overall level rides a type-keyed window over
    * that bounded frame (the `dq_drift_ks` bounded-window discipline). */
  val tsDecompose: Q = Q(
    "ts_decompose",
    """WITH h AS (SELECT event_type, CAST(hour(ts) AS INT) AS hod,
      |    count(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, hod, n, sv,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tn,
      |    sum(sv) OVER (PARTITION BY event_type) AS tsv
      |  FROM h)
      |SELECT event_type, hod, CAST(n AS BIGINT) AS n,
      |  CAST(sv AS DOUBLE) / n AS hourly_mean,
      |  CAST(sv AS DOUBLE) / n - CAST(tsv AS DOUBLE) / tn AS seasonal_dev
      |FROM t ORDER BY event_type, hod""".stripMargin
  ) { (s, d) =>
    val prof = Tables.events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.money(col("value"))).as("sv"))
    val wT = Window.partitionBy("event_type")
    prof
      .withColumn("tn", sum(col("n")).over(wT))
      .withColumn("tsv", sum(col("sv")).over(wT))
      .select(col("event_type"), col("hod"), col("n"),
        (Tables.asDouble(col("sv")) / col("n")).as("hourly_mean"),
        (Tables.asDouble(col("sv")) / col("n") -
          Tables.asDouble(col("tsv")) / col("tn")).as("seasonal_dev"))
  }

  /** HOLT double-exponential smoothing (level + trend) — the forecasting
    * step above [[tsEwma]]: lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁),
    * bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁, α = β = 1/2, seeded l₁ = x₁, b₁ = 0;
    * the emitted one-step-ahead forecast is lᵢ + bᵢ. The state is now a
    * VECTOR (level, trend) but the plan is unchanged from the EWMA
    * recurrence — same single user-keyed exchange, same in-partition
    * sort, same O(1)-state sequential pass — demonstrating that the
    * secondary-sort idiom carries any linear state-space filter
    * (Kalman-style smoothers included) without new plan machinery.
    *
    * Same bit-parity argument as [[tsEwma]]: halving is exact, each
    * addition/subtraction is one correctly-rounded op, and the
    * recursive-CTE oracle performs the literally identical sequence. */
  val tsHolt: Q = Q(
    "ts_holt",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, rn, v AS l, CAST(0 AS DOUBLE) AS b
      |  FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.event_id, x.rn,
      |    0.5 * x.v + 0.5 * (r.l + r.b),
      |    0.5 * ((0.5 * x.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1)
      |SELECT user_id, event_id, l AS level, b AS trend,
      |  l + b AS forecast
      |FROM r ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.asDouble(Tables.money(col("value"))).as("v"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .select("user_id", "event_id", "v").as[(Long, Long, Double)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var l = 0.0
        var b = 0.0
        it.map { case (u, id, x) =>
          if (u == curUser) {
            val nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (nl - l) + 0.5 * b
            l = nl
          } else { l = x; b = 0.0 }
          curUser = u
          (u, id, l, b, l + b)
        }
      }
      .toDF("user_id", "event_id", "level", "trend", "forecast")
      // full-table output: no presentation sort (r11 opt)
  }

  /** MANN–KENDALL TREND TEST (the nonparametric "is this series
    * monotonically drifting?" census — robust to outliers and
    * distribution-free, unlike a slope fit): per event_type over the
    * daily count series, S = Σ_{i<j} sign(xⱼ − xᵢ) and Kendall's
    * τ_a = S / (n(n−1)/2). S and the pair count are exact BIGINTs;
    * τ is one division.
    *
    * Plan: events reduce to the (type, day, x) series frame FIRST, so
    * the sign self-join is bounded by days² per type — by construction,
    * never events² (the same reduced-frame discipline as
    * [[tsAutocorr]]); one partial+final aggregate finishes. */
  val tsMkTrend: Q = Q(
    "ts_mk_trend",
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |        CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
      |             ELSE 0 END AS sgn
      |      FROM c a JOIN c b
      |        ON a.event_type = b.event_type AND a.day < b.day)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(sgn) AS BIGINT) AS s_stat,
      |  CAST(sum(sgn) AS DOUBLE) / count(*) AS tau
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val series = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val a = series.select(col("event_type"), col("day").as("day_a"),
      col("x").as("x_a"))
    val b = series.select(col("event_type"), col("day").as("day_b"),
      col("x").as("x_b"))
    a.join(b, Seq("event_type"))
      .filter(col("day_a") < col("day_b"))
      .select(col("event_type"),
        when(col("x_b") > col("x_a"), 1)
          .when(col("x_b") < col("x_a"), -1).otherwise(0).as("sgn"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("s_stat"),
        (sum(col("sgn")).cast("double") / count(lit(1))).as("tau"))
  }

  /** SEASONAL-PROFILE ANOMALY CENSUS: which hours deviate from what is
    * normal FOR THAT HOUR OF DAY? The robust profile (median + MAD over
    * each (event_type, hour-of-day) cell's daily counts) is the
    * monitoring rule [[tsDecompose]]'s mean-based profile graduates to
    * when outliers must not poison the baseline; the flag is the
    * classic |x − med| > 3·MAD with a floor of 1.5 so a zero-MAD cell
    * (constant history) doesn't flag ±1 noise.
    *
    * Determinism: counts are BIGINTs; the 0.5-quantile interpolates at
    * most (a+b)/2 of two integers — a division by a power of two, so
    * `med` and `mad` are EXACT doubles and the 3·MAD compare has no
    * rounding ambiguity ([[aggQuantile]] proved the interpolation
    * formulas align across engines).
    *
    * Plan: one aggregate reduces events to the hourly series; both
    * quantiles ride ONE (type, hour-of-day) window exchange over that
    * reduced frame (partitions are bounded by days-of-history, never
    * events) — the join-back formulation would scan the series twice.
    * No funnel: the window partitions by the profile cell. */
  val tsAnomaly: Q = Q(
    "ts_anomaly",
    """WITH c AS (SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bkt,
      |             count(*) AS x
      |           FROM events GROUP BY 1, 2),
      |w1 AS (SELECT event_type, bkt, x,
      |    CAST(quantile_cont(x, 0.5)
      |         OVER (PARTITION BY event_type, hour(bkt)) AS DOUBLE) AS med
      |  FROM c),
      |w2 AS (SELECT *,
      |    CAST(quantile_cont(abs(x - med), 0.5)
      |         OVER (PARTITION BY event_type, hour(bkt)) AS DOUBLE) AS mad
      |  FROM w1)
      |SELECT event_type, bkt, CAST(x AS BIGINT) AS x, med, mad
      |FROM w2
      |WHERE abs(x - med) > greatest(3 * mad, CAST(1.5 AS DOUBLE))
      |ORDER BY event_type, bkt""".stripMargin
  ) { (s, d) =>
    // hod is materialized ONCE so both quantile windows partition on the
    // same attribute — a per-window hour(bkt) alias re-exchanges
    val wp = Window.partitionBy("event_type", "hod")
    Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bkt"))
      .agg(count(lit(1)).as("x"))
      .withColumn("hod", hour(col("bkt")))
      .withColumn("med", expr("percentile(x, 0.5)").over(wp))
      .withColumn("mad",
        expr("percentile(abs(x - med), 0.5)").over(wp))
      .filter(abs(col("x") - col("med")) >
        greatest(lit(3) * col("mad"), lit(1.5)))
      .select(col("event_type"), col("bkt"), col("x"), col("med"),
        col("mad"))
  }

  /** ROLLING CORRELATION between two event streams (clicks vs views,
    * hourly) over a trailing 24-bucket window — "are these signals
    * still coupled?", the co-movement monitor behind alerting on
    * metric decoupling. [[tsAutocorr]]'s integer-exact sufficient-
    * statistics discipline inside a moving ROWS frame: both series
    * come from ONE conditional aggregate (no join, absent hours cost
    * zero on both sides identically), the six frame sums are exact
    * BIGINTs, and each emitted r is one double expression with the
    * variance factors cast before multiplying. Windows with fewer than
    * 24 buckets are suppressed (count rides the same frame).
    *
    * Plan: events reduce to the global hourly series in one
    * partial+final aggregate; the moving frame runs over that
    * series-sized frame (bounded by hours-of-history — the ONE
    * deliberate unpartitioned window in the catalog, safe because its
    * input is buckets, never events; same posture as ts_changepoint's
    * per-type frames). */
  val tsRollingCorr: Q = Q(
    "ts_rolling_corr",
    """WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS bkt,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS x,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS y
      |  FROM events GROUP BY 1),
      |w AS (SELECT bkt, x, y,
      |    count(*) OVER f AS n,
      |    sum(x) OVER f AS sx, sum(y) OVER f AS sy,
      |    sum(x*x) OVER f AS sxx, sum(y*y) OVER f AS syy,
      |    sum(x*y) OVER f AS sxy
      |  FROM c WINDOW f AS (ORDER BY bkt ROWS BETWEEN 23 PRECEDING
      |                      AND CURRENT ROW))
      |SELECT bkt, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
      |  CAST(n*sxy - sx*sy AS DOUBLE) /
      |  nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
      |              * CAST(n*syy - sy*sy AS DOUBLE)), 0) AS r
      |FROM w WHERE n = 24 ORDER BY bkt""".stripMargin
  ) { (s, d) =>
    val f = Window.orderBy("bkt").rowsBetween(-23, Window.currentRow)
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("bkt"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("x"),
           sum(when(col("event_type") === "view", 1).otherwise(0)).as("y"))
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("x")).over(f))
      .withColumn("sy", sum(col("y")).over(f))
      .withColumn("sxx", sum(col("x") * col("x")).over(f))
      .withColumn("syy", sum(col("y") * col("y")).over(f))
      .withColumn("sxy", sum(col("x") * col("y")).over(f))
      .filter(col("n") === 24)
      .select(col("bkt"), col("x"), col("y"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          expr("""nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)), 0)"""))
          .as("r"))
      .orderBy("bkt")
  }

  /** LEAD/LAG CROSS-CORRELATION between the click and purchase hourly
    * series at lags 0..12 — "how many hours does purchasing trail
    * clicking?", the causal-delay diagnostic that sizes attribution
    * windows ([[Streaming]]'s attribution pair) and feature look-backs.
    * r(L) = Pearson over pairs (x_t, y_{t+L}); the argmax lag is the
    * measured response delay. [[tsAutocorr]] is the self-series special
    * case; this one correlates two different series, so the pair frame
    * comes from a bucket-keyed self-join rather than a window lag.
    *
    * Determinism: both series come from ONE conditional aggregate; the
    * lag shift is exact integer epoch-millis arithmetic (bkt + L·3600000);
    * the six sufficient statistics are exact BIGINTs and each r is one
    * double expression (variance factors cast before multiplying, shared
    * nullif for constant series).
    *
    * Plan: events reduce to the hourly series in one partial+final
    * aggregate; the 13-lag explode fans the SERIES (hours-bounded, never
    * events) 13×; one bucket-keyed equi-join aligns x_t with y_{t+L};
    * one final partial+final aggregate on lag_k emits the statistics.
    * At 100 TB the join's build side is the same hours-sized series —
    * AQE broadcasts it; nothing here scales with event count. */
  val tsCrossCorr: Q = Q(
    "ts_cross_corr",
    """WITH c AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS ms,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS y
      |  FROM events GROUP BY 1),
      |l AS (SELECT CAST(unnest(range(0, 13)) AS INT) AS lag_k),
      |p AS (SELECT l.lag_k, a.x, b.y
      |      FROM l CROSS JOIN c a
      |      JOIN c b ON b.ms = a.ms + l.lag_k * 3600000),
      |s AS (SELECT lag_k, count(*) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
      |        CAST(sum(x*y) AS BIGINT) AS sxy
      |      FROM p GROUP BY 1)
      |SELECT lag_k, CAST(n AS BIGINT) AS n_pairs,
      |  CAST(n*sxy - sx*sy AS DOUBLE) /
      |  nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
      |              * CAST(n*syy - sy*sy AS DOUBLE)), 0) AS r
      |FROM s WHERE n >= 2 ORDER BY lag_k""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("ms"))
      .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("x"),
           sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("y"))
    val xs = c.select(col("ms"), col("x"))
      .withColumn("lag_k", explode(sequence(lit(0), lit(12))))
      .withColumn("yms", col("ms") + col("lag_k") * 3600000L)
    val ys = c.select(col("ms").as("yms"), col("y"))
    xs.join(ys, Seq("yms"))
      .groupBy("lag_k")
      .agg(count(lit(1)).as("n"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"),
           sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") >= 2)
      .select(col("lag_k"), col("n").as("n_pairs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          expr("""nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                            * CAST(n*syy - sy*sy AS DOUBLE)), 0)"""))
          .as("r"))
  }

  /** THEIL–SEN robust slope of the daily event-count series per
    * event_type — the median of all pairwise slopes, the trend estimator
    * that shrugs off the outlier days that bias [[tsMkTrend]]'s
    * companion OLS (Sen 1968; up to ~29% contamination tolerated). The
    * natural pair to Mann–Kendall: MK answers "is there a monotone
    * trend?", Theil–Sen answers "how steep?" with matching robustness.
    *
    * Determinism: each slope is ONE correctly-rounded double division of
    * two exact BIGINTs (count delta over day delta), identical bits in
    * both engines; the median picks values at fixed ranks of the sorted
    * slope multiset — tie order between equal doubles cannot change the
    * value at a rank — and the even-n midpoint average is one add and
    * one divide of identical operands. No quantization needed.
    *
    * Scale posture: events reduce to the (type, day, x) series frame in
    * one aggregate; the pair self-join and the rank window are keyed by
    * event_type over series-sized frames (days²/2 pairs per type — ~400
    * for a month, bounded by calendar, never by event volume). At
    * multi-year granularity the refinement is the O(n log n) repeated-
    * median selection; the all-pairs form IS the estimator's definition
    * and stays exact. */
  val tsTheilSen: Q = Q(
    "ts_theil_sen",
    """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
      |           FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |        CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
      |          AS slope
      |      FROM c a JOIN c b
      |        ON a.event_type = b.event_type AND a.day < b.day),
      |r AS (SELECT event_type, slope,
      |        row_number() OVER (PARTITION BY event_type ORDER BY slope)
      |          AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS n
      |      FROM p)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
      |  avg(slope) FILTER (WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
      |    AS sen_slope
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val p = c.as("a")
      .join(c.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        ((col("b.x") - col("a.x")).cast("double") /
          datediff(col("b.day"), col("a.day")).cast("double")).as("slope"))
    val w = Window.partitionBy("event_type")
    p.withColumn("rn", row_number().over(w.orderBy("slope")))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy("event_type")
      .agg(max(col("n")).as("n_pairs"),
        avg(when(col("rn") === expr("(n + 1) DIV 2") ||
                 col("rn") === expr("(n + 2) DIV 2"), col("slope")))
          .as("sen_slope"))
  }

  /** FORECAST BACKTEST — [[tsHolt]] graded on its own data: the one-step-
    * ahead forecast ŷ_t = l_{t−1} + b_{t−1} scored against the realized
    * value, per user — the walk-forward evaluation that decides whether
    * the smoother's parameters are fit to serve ("how wrong would we
    * have been?"), completing the model loop the way
    * [[graft.operators.Vectors.vectorRecallEval]] completes ANN's.
    *
    * Determinism: the recurrence is [[tsHolt]]'s α=β=1/2 exact-multiply
    * chain verbatim; each absolute error is one subtract + abs of
    * identically-produced doubles, quantized to integer micro-units
    * BEFORE the per-user sum (the repo's quantize-then-sum discipline),
    * and MAE is one integer division.
    *
    * Plan: the same per-user secondary-sort pass as tsHolt (ONE
    * user-keyed exchange; the sequential fold is the operator), then a
    * partial+final per-user aggregate. */
  val tsBacktestMae: Q = Q(
    "ts_backtest_mae",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, rn, v, v AS l, CAST(0 AS DOUBLE) AS b
      |  FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.rn, x.v,
      |    0.5 * x.v + 0.5 * (r.l + r.b),
      |    0.5 * ((0.5 * x.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1),
      |e AS (SELECT user_id, v,
      |        lag(l + b) OVER (PARTITION BY user_id ORDER BY rn) AS fc
      |      FROM r)
      |SELECT user_id,
      |  CAST(count(fc) AS BIGINT) AS n_preds,
      |  CAST(sum(CAST(floor(1000000 * abs(v - fc)) AS BIGINT)) AS BIGINT)
      |    AS sum_abs_err_micro,
      |  CAST(sum(CAST(floor(1000000 * abs(v - fc)) AS BIGINT)) AS BIGINT)
      |    // count(fc) AS mae_micro
      |FROM e WHERE fc IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        Tables.asDouble(Tables.money(col("value"))).as("v"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .select("user_id", "v").as[(Long, Double)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var l = 0.0
        var b = 0.0
        it.flatMap { case (u, x) =>
          if (u == curUser) {
            val fc = l + b // yesterday's state forecasts today
            val nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (nl - l) + 0.5 * b
            l = nl
            Some((u, math.floor(1000000.0 * math.abs(x - fc)).toLong))
          } else { curUser = u; l = x; b = 0.0; None }
        }
      }
      .toDF("user_id", "err_micro")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_preds"),
           sum(col("err_micro")).as("sum_abs_err_micro"))
      .select(col("user_id"), col("n_preds"), col("sum_abs_err_micro"),
        expr("sum_abs_err_micro DIV n_preds").as("mae_micro"))
  }

  /** SEASONALITY STRENGTH — the one-number readout of [[tsDecompose]]'s
    * hour-of-day profile: ANOVA η² = SS_between / SS_total, the fraction
    * of value variance the hour-of-day explains per event_type (≈0 says
    * the seasonal profile is noise; near 1 says the hour IS the signal —
    * the decide-whether-to-deseasonalize diagnostic).
    *
    * Determinism at ANY scale: everything is computed in NORMALIZED
    * (per-event) units, so magnitudes never grow with the corpus —
    * per-hour terms (n_h/N)·mean_h², the grand mean², and S2/N all sit
    * near mean², are produced by ONE shared double sequence from exact
    * BIGINT cent sums, and are quantized to integer micro-units BEFORE
    * the only cross-hour sum (the [[graphModularity]] discipline; a
    * cents²-scale formulation would overflow int64 at sf1000 — the
    * normalization is what makes the quantization scale-stable).
    *
    * Plan: one partial+final (type, hod) aggregate over a 3-column scan;
    * everything downstream is |types|×24 rows. */
  val tsSeasonalStrength: Q = Q(
    "ts_seasonal_strength",
    """WITH h AS (SELECT event_type, CAST(hour(ts) AS INT) AS hod,
      |    count(*) AS n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS s1,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |           * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS s2
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type,
      |    CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s1) AS BIGINT) AS ts1,
      |    CAST(sum(s2) AS BIGINT) AS ts2
      |  FROM h GROUP BY 1),
      |q AS (SELECT h.event_type,
      |    CAST(floor(1000000 * (CAST(h.n AS DOUBLE) / t.nn
      |        * (CAST(h.s1 AS DOUBLE) / h.n)
      |        * (CAST(h.s1 AS DOUBLE) / h.n))) AS BIGINT)
      |      AS term_q
      |  FROM h JOIN t ON h.event_type = t.event_type),
      |f AS (SELECT q.event_type, t.nn,
      |    CAST(sum(q.term_q) AS BIGINT)
      |      - CAST(floor(1000000 * ((CAST(t.ts1 AS DOUBLE) / t.nn)
      |          * (CAST(t.ts1 AS DOUBLE) / t.nn))) AS BIGINT) AS ssbn_q,
      |    CAST(floor(1000000 * (CAST(t.ts2 AS DOUBLE) / t.nn)) AS BIGINT)
      |      - CAST(floor(1000000 * ((CAST(t.ts1 AS DOUBLE) / t.nn)
      |          * (CAST(t.ts1 AS DOUBLE) / t.nn))) AS BIGINT) AS sstn_q
      |  FROM q JOIN t ON q.event_type = t.event_type
      |  GROUP BY 1, 2, t.ts1, t.ts2)
      |SELECT event_type, CAST(nn AS BIGINT) AS n_events,
      |  ssbn_q AS ssb_norm_micro, sstn_q AS sst_norm_micro,
      |  CAST(ssbn_q AS DOUBLE) / sstn_q AS eta2
      |FROM f ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
      * 100).cast("long")
    val h = Tables.events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hod"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
           sum(cents * cents).as("s2"))
    val t = h.groupBy("event_type")
      .agg(sum(col("n")).as("nn"), sum(col("s1")).as("ts1"),
           sum(col("s2")).as("ts2"))
    val termQ = floor(lit(1000000) * (col("n").cast("double") / col("nn")
        * (col("s1").cast("double") / col("n"))
        * (col("s1").cast("double") / col("n")))).cast("long")
    val grandQ = floor(lit(1000000) * ((col("ts1").cast("double") / col("nn"))
        * (col("ts1").cast("double") / col("nn")))).cast("long")
    val sstQ = (floor(lit(1000000) * (col("ts2").cast("double") / col("nn")))
      .cast("long") - grandQ)
    h.join(t, Seq("event_type"))
      .select(col("event_type"), col("nn"), col("ts1"), col("ts2"),
              termQ.as("term_q"))
      .groupBy("event_type", "nn", "ts1", "ts2")
      .agg(sum(col("term_q")).as("sum_term_q"))
      .select(col("event_type"), col("nn").as("n_events"),
        (col("sum_term_q") - grandQ).as("ssb_norm_micro"),
        sstQ.as("sst_norm_micro"))
      .withColumn("eta2",
        col("ssb_norm_micro").cast("double") / col("sst_norm_micro"))
  }

  /** VARIANCE-RATIO random-walk test (Lo–MacKinlay) over each event
    * type's hourly count series — the econometric complement of
    * [[tsMkTrend]] (trend) and [[tsAutocorr]] (linear memory): under a
    * random walk the variance of q-period differences is exactly q times
    * the 1-period variance, so VR(q) = Var(x_t − x_{t−q}) / (q·Var(x_t −
    * x_{t−1})) ≈ 1; VR < 1 flags mean-reversion, VR > 1 momentum. Per
    * (event_type, q ∈ {2,4,8}): the pair count, VR in micro units, the
    * homoskedastic z = (VR−1)/√(2(2q−1)(q−1)/(3q·n)), and the
    * random-walk verdict at |z| ≤ 1.96.
    *
    * Parity discipline: both variances come from exact BIGINT
    * sufficient statistics (n·Σd² − (Σd)² over integer count diffs);
    * VR and z are shared scalar IEEE expressions (÷ × √ only, the
    * ab_lift_ztest precedent) floor-quantized once to micro units so
    * the verdict compares integers. Zero-variance base series (a type
    * with a constant hourly count) excluded by the mirrored WHERE.
    *
    * Plan: the corpus-sized stage is the (type, hour) count aggregate
    * (the [[tsAutocorr]] series); the lag windows partition by type
    * over the bucket-domain frame (time-bounded, not corpus-bounded),
    * and everything after the diff aggregates is |types|·3 rows. */
  val tsVarRatio: Q = Q(
    "ts_var_ratio",
    """WITH c AS (SELECT event_type,
      |    time_bucket(INTERVAL '1 hour', ts) AS bkt, count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, x,
      |    lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
      |    lag(x, 4) OVER w AS x4, lag(x, 8) OVER w AS x8
      |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
      |p AS (SELECT event_type, 2 AS q, x - x2 AS dq FROM l
      |        WHERE x2 IS NOT NULL
      |      UNION ALL
      |      SELECT event_type, 4, x - x4 FROM l WHERE x4 IS NOT NULL
      |      UNION ALL
      |      SELECT event_type, 8, x - x8 FROM l WHERE x8 IS NOT NULL),
      |b AS (SELECT event_type, count(*) AS n1,
      |    CAST(sum(x - x1) AS BIGINT) AS s1,
      |    CAST(sum((x - x1) * (x - x1)) AS BIGINT) AS ss1
      |  FROM l WHERE x1 IS NOT NULL GROUP BY 1),
      |sq AS (SELECT event_type, q, count(*) AS nq,
      |    CAST(sum(dq) AS BIGINT) AS sdq,
      |    CAST(sum(dq * dq) AS BIGINT) AS ssq
      |  FROM p GROUP BY 1, 2),
      |j AS (SELECT s.event_type, s.q, CAST(s.nq AS BIGINT) AS n_pairs,
      |    (CAST(s.nq AS DOUBLE) * s.ssq - CAST(s.sdq AS DOUBLE) * s.sdq)
      |      / (CAST(s.nq AS DOUBLE) * s.nq) AS vq,
      |    (CAST(b.n1 AS DOUBLE) * b.ss1 - CAST(b.s1 AS DOUBLE) * b.s1)
      |      / (CAST(b.n1 AS DOUBLE) * b.n1) AS v1,
      |    CAST(b.n1 AS BIGINT) AS n1
      |  FROM sq s JOIN b ON s.event_type = b.event_type
      |  WHERE CAST(b.n1 AS HUGEINT) * b.ss1 - CAST(b.s1 AS HUGEINT) * b.s1 > 0),
      |z AS (SELECT event_type, q, n_pairs,
      |    vq / (q * v1) AS vr,
      |    (vq / (q * v1) - 1)
      |      / sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n1)) AS zst
      |  FROM j)
      |SELECT event_type, CAST(q AS INT) AS q, n_pairs,
      |  CAST(floor(1000000 * vr) AS BIGINT) AS vr_micro,
      |  CAST(floor(1000000 * zst) AS BIGINT) AS z_micro,
      |  abs(CAST(floor(1000000 * zst) AS BIGINT)) <= 1960000
      |    AS random_walk
      |FROM z ORDER BY event_type, q""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bkt"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("bkt")
    // cache: FOUR consumers (three q-diff arms + the base-variance
    // frame) would each re-run the corpus-sized hourly aggregate
    // (lazy cache — the ab_sequential/graph_modularity discipline)
    val l = c.select(col("event_type"), col("x"),
      lag(col("x"), 1).over(w).as("x1"), lag(col("x"), 2).over(w).as("x2"),
      lag(col("x"), 4).over(w).as("x4"), lag(col("x"), 8).over(w).as("x8"))
      .cache()
    def arm(q: Int): DataFrame =
      l.filter(col(s"x$q").isNotNull)
        .select(col("event_type"), lit(q).as("q"),
          (col("x") - col(s"x$q")).as("dq"))
    val p = arm(2).union(arm(4)).union(arm(8))
    val b = l.filter(col("x1").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n1"),
        sum(col("x") - col("x1")).cast("long").as("s1"),
        sum((col("x") - col("x1")) * (col("x") - col("x1")))
          .cast("long").as("ss1"))
    val sq = p.groupBy("event_type", "q")
      .agg(count(lit(1)).as("nq"),
        sum(col("dq")).cast("long").as("sdq"),
        sum(col("dq") * col("dq")).cast("long").as("ssq"))
    def dbl(cn: Column): Column = cn.cast("double")
    val vq = (dbl(col("nq")) * col("ssq") - dbl(col("sdq")) * col("sdq")) /
      (dbl(col("nq")) * col("nq"))
    val v1 = (dbl(col("n1")) * col("ss1") - dbl(col("s1")) * col("s1")) /
      (dbl(col("n1")) * col("n1"))
    val j = sq.join(broadcast(b), Seq("event_type"))
      // zero-variance guard on WIDENED exact integers (ADVICE r7): in raw
      // BIGINT n1·ss1 can wrap for large hourly counts — DuckDB raises,
      // Spark wraps silently and the engines would admit different rows
      .filter(col("n1").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("ss1")
        - col("s1").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("s1") > 0)
      .select(col("event_type"), col("q"),
        col("nq").cast("long").as("n_pairs"),
        vq.as("vq"), v1.as("v1"), col("n1").cast("long").as("n1"))
    val vr = col("vq") / (col("q") * col("v1"))
    val zst = (col("vq") / (col("q") * col("v1")) - lit(1)) /
      sqrt(lit(2.0) * (lit(2) * col("q") - lit(1)) * (col("q") - lit(1)) /
        (lit(3.0) * col("q") * col("n1")))
    val zMicro = floor(lit(1000000) * zst).cast("long")
    j.select(col("event_type"), col("q").cast("int").as("q"),
        col("n_pairs"),
        floor(lit(1000000) * vr).cast("long").as("vr_micro"),
        zMicro.as("z_micro"),
        (abs(zMicro) <= 1960000L).as("random_walk"))
  }

  /** SAX SYMBOLIZATION + MOTIF CENSUS — the symbolic time-series mining
    * primitive (Lin/Keogh SAX) none of the numeric TS operators cover:
    * per event_type the hourly count series aggregates to 4-hour PAA
    * frames, frames discretize to a 4-letter alphabet, and the top
    * recurring 3-symbol MOTIFS are reported — "what shapes does this
    * series keep repeating", the index behind motif/discord discovery
    * at scale.
    *
    * Parity discipline: classical SAX breakpoints are Gaussian
    * quantiles of a z-normalized series (two float traps); here
    * discretization is ntile(4) over the EXACT integer frame sums with
    * the (s, f) total order — rank-equivalent to quantile breakpoints,
    * bit-deterministic on both engines, and z-normalization is
    * unnecessary since ranks are shift/scale-invariant. Missing frames
    * count as zero via the frame spine (the resample_gapfill rule:
    * absence of events is data, not absence of data).
    *
    * Plan: ONE corpus-sized hourly aggregate; the spine, PAA join,
    * ntile, motif window and top-3 cut all run on the frame domain
    * (hours/4 per type — bounded by time span, not data volume). At
    * 100 TB the hourly aggregate is the only stage that sees the
    * corpus; a decade more data with the same time span changes ONLY
    * that stage's input. */
  val tsSax: Q = Q(
    "ts_sax",
    """WITH c AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1
      |      FROM c GROUP BY 1),
      |sp AS (SELECT event_type, h0,
      |       unnest(range((h1 - h0) // 4 + 1)) AS f FROM b),
      |pa AS (SELECT sp.event_type, sp.f,
      |    CAST(coalesce(sum(c.x), 0) AS BIGINT) AS s
      |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type
      |    AND (c.h - sp.h0) // 4 = sp.f
      |  GROUP BY 1, 2),
      |sym AS (SELECT event_type, f,
      |    ntile(4) OVER (PARTITION BY event_type ORDER BY s, f) AS q
      |  FROM pa),
      |m AS (SELECT event_type,
      |    CAST(q AS VARCHAR) || CAST(lead(q, 1) OVER w AS VARCHAR)
      |      || CAST(lead(q, 2) OVER w AS VARCHAR) AS motif
      |  FROM sym WINDOW w AS (PARTITION BY event_type ORDER BY f)),
      |mc AS (SELECT event_type, motif, CAST(count(*) AS BIGINT) AS n
      |       FROM m WHERE motif IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, motif, n, CAST(rk AS INT) AS rank
      |FROM (SELECT event_type, motif, n,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY n DESC, motif) AS rk
      |      FROM mc)
      |WHERE rk <= 3 ORDER BY event_type, rank""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("x"))
    val b = c.groupBy("event_type")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val sp = b.select(col("event_type"), col("h0"),
      explode(sequence(lit(0L), expr("(h1 - h0) div 4"))).as("f"))
    val pa = sp.join(c.withColumnRenamed("event_type", "et2"),
        col("et2") === col("event_type") &&
          expr("(h - h0) div 4") === col("f"), "left")
      .groupBy(col("event_type"), col("f"))
      .agg(coalesce(sum(col("x")), lit(0L)).cast("long").as("s"))
    val wq = Window.partitionBy("event_type").orderBy("s", "f")
    val wf = Window.partitionBy("event_type").orderBy("f")
    val sym = pa.select(col("event_type"), col("f"),
      ntile(4).over(wq).as("q"))
    val m = sym.select(col("event_type"),
      concat(col("q").cast("string"),
        lead(col("q"), 1).over(wf).cast("string"),
        lead(col("q"), 2).over(wf).cast("string")).as("motif"))
    val mc = m.filter(col("motif").isNotNull)
      .groupBy("event_type", "motif").agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy("event_type").orderBy(desc("n"), asc("motif"))
    mc.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("motif"), col("n"),
        col("rank").cast("int").as("rank"))
  }

  /** HURST EXPONENT via rescaled-range (R/S) analysis per event_type —
    * the long-memory diagnostic that separates trending series (H > 0.5,
    * shocks persist), mean-reverting series (H < 0.5) and memoryless
    * ones (H ≈ 0.5): slice each type's value series into disjoint
    * windows of w ∈ {8,16,32,64}, compute the range of cumulative
    * mean-deviations over the window stddev, and fit log E[R/S] against
    * log w — the classic log-log ladder, the [[tsVarRatio]] finding from
    * the range side.
    *
    * Exactness: values quantize to cents (the `Tables.money`
    * discipline); within a window the deviation prefix is computed at
    * denominator w — D_i = w·P_i − i·S — so R (max−min of D) and the
    * variance numerator N = w·Σv² − S² are exact BIGINTs, and R/S =
    * R/√N needs exactly one sqrt + one division (w cancels). Each
    * window's ratio floor-quantizes to micro units BEFORE the per-scale
    * mean (exact integer division — no engine-ordered double sum), and
    * the 4-point OLS runs on nano-quantized logs with exact
    * HUGEINT/DECIMAL(38,0) sufficient statistics (the [[graft.operators
    * .TextAnalysis]] text_zipf_fit pattern). Zero-variance windows and
    * degenerate fits are excluded by mirrored WHEREs.
    *
    * Plan: one type-keyed window sort ranks the series; the ×4 scale
    * explode carries only (type, cents, rn); window frames partition by
    * (type, scale, window-index) — bounded by w — and everything after
    * the per-window aggregate is |types|×4 rows. At 100 TB the one
    * corpus-sized stage is the series rank, which [[tsSax]] and the
    * autocorr family already pay identically. */
  val tsHurst: Q = Q(
    "ts_hurst",
    """WITH v AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |                            ORDER BY ts, event_id) AS BIGINT) AS rn
      |  FROM events),
      |e AS (SELECT event_type, cents, rn,
      |    CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS w FROM v),
      |e2 AS (SELECT event_type, cents, rn, w, (rn - 1) // w AS win,
      |    rn - w * ((rn - 1) // w) AS i FROM e),
      |p AS (SELECT event_type, w, win, i, cents,
      |    CAST(sum(cents) OVER (PARTITION BY event_type, w, win
      |                          ORDER BY rn) AS BIGINT) AS pre,
      |    CAST(sum(cents) OVER (PARTITION BY event_type, w, win)
      |      AS BIGINT) AS s,
      |    CAST(count(*) OVER (PARTITION BY event_type, w, win)
      |      AS BIGINT) AS cnt
      |  FROM e2),
      |g AS (SELECT event_type, w, win,
      |    CAST(max(w * pre - i * s) - min(w * pre - i * s) AS BIGINT) AS r,
      |    CAST(w * sum(cents * cents) - max(s) * max(s) AS BIGINT) AS nvar
      |  FROM p WHERE cnt = w GROUP BY 1, 2, 3),
      |rs AS (SELECT event_type, w,
      |    CAST(floor(1000000 * (CAST(r AS DOUBLE)
      |      / sqrt(CAST(nvar AS DOUBLE)))) AS BIGINT) AS rs_micro
      |  FROM g WHERE nvar > 0),
      |m AS (SELECT event_type, w, CAST(count(*) AS BIGINT) AS n_win,
      |    CAST(sum(rs_micro) // count(*) AS BIGINT) AS rs_mean
      |  FROM rs GROUP BY 1, 2),
      |q AS (SELECT event_type, w, n_win, rs_mean,
      |    CAST(floor(1000000000 * ln(CAST(w AS DOUBLE))) AS BIGINT) AS x,
      |    CAST(floor(1000000000 * ln(CAST(rs_mean AS DOUBLE))) AS BIGINT)
      |      AS y
      |  FROM m WHERE rs_mean > 0),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(n_win) AS BIGINT) AS n_windows,
      |    CAST(max(CASE WHEN w = 8 THEN rs_mean END) AS BIGINT) AS rs8,
      |    CAST(max(CASE WHEN w = 64 THEN rs_mean END) AS BIGINT) AS rs64,
      |    CAST(sum(x) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(y) AS DECIMAL(38,0)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM q GROUP BY 1),
      |c AS (SELECT event_type, k, n_windows, rs8, rs64,
      |    (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
      |  FROM st
      |  WHERE k > 1 AND CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0)
      |SELECT event_type, CAST(k AS INT) AS n_scales, n_windows, rs8, rs64,
      |  CAST(floor(1000000 * slope) AS BIGINT) AS hurst_micro,
      |  CAST(floor(1000000 * slope) AS BIGINT) > 600000 AS persistent
      |FROM c ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val wSeries = Window.partitionBy("event_type").orderBy("ts", "event_id")
    val v = Tables.events(s, d)
      .select(col("event_type"),
        (Tables.money(col("value")) * 100).cast("long").as("cents"),
        col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(wSeries).cast("long"))
      .select(col("event_type"), col("cents"), col("rn"))
    val e2 = v
      .withColumn("w", explode(typedlit(Seq(8L, 16L, 32L, 64L))))
      .withColumn("win", expr("(rn - 1) div w"))
      .withColumn("i", expr("rn - w * ((rn - 1) div w)"))
    // materialized (w, win) keys: both frames share one exchange
    val part = Window.partitionBy("event_type", "w", "win")
    val p = e2
      .withColumn("pre", sum(col("cents")).over(part.orderBy("rn")))
      .withColumn("s", sum(col("cents")).over(
        part.orderBy("rn").rowsBetween(Window.unboundedPreceding,
                                       Window.unboundedFollowing)))
      .withColumn("cnt", count(lit(1)).over(
        part.orderBy("rn").rowsBetween(Window.unboundedPreceding,
                                       Window.unboundedFollowing)))
    val g = p.filter(col("cnt") === col("w"))
      .withColumn("dev", col("w") * col("pre") - col("i") * col("s"))
      .groupBy("event_type", "w", "win")
      .agg((max(col("dev")) - min(col("dev"))).as("r"),
        sum(expr("cents * cents")).as("ssq"), max(col("s")).as("stot"))
      .select(col("event_type"), col("w"),
        col("r"), (col("w") * col("ssq") - col("stot") * col("stot"))
          .as("nvar"))
    val rs = g.filter(col("nvar") > 0)
      .select(col("event_type"), col("w"),
        floor(lit(1000000) * (col("r").cast("double")
          / sqrt(col("nvar").cast("double")))).cast("long").as("rs_micro"))
    val m = rs.groupBy("event_type", "w")
      .agg(count(lit(1)).as("n_win"),
           expr("sum(rs_micro) div count(*)").as("rs_mean"))
    val q = m.filter(col("rs_mean") > 0)
      .select(col("event_type"), col("w"), col("n_win"), col("rs_mean"),
        floor(lit(1000000000L) * log(col("w").cast("double")))
          .cast("long").as("x"),
        floor(lit(1000000000L) * log(col("rs_mean").cast("double")))
          .cast("long").as("y"))
    val st = q.groupBy("event_type")
      .agg(count(lit(1)).as("k"), sum(col("n_win")).as("n_windows"),
        max(when(col("w") === 8, col("rs_mean"))).as("rs8"),
        max(when(col("w") === 64, col("rs_mean"))).as("rs64"),
        sum(col("x")).cast(dec38).as("sx"),
        sum(col("y")).cast(dec38).as("sy"),
        sum(col("x").cast(dec38) * col("y")).as("sxy"),
        sum(col("x").cast(dec38) * col("x")).as("sxx"))
    def dbl(c: Column): Column = c.cast("double")
    val denom = dbl(col("k")) * dbl(col("sxx")) -
      dbl(col("sx")) * dbl(col("sx"))
    val slope = (dbl(col("k")) * dbl(col("sxy")) -
      dbl(col("sx")) * dbl(col("sy"))) / denom
    val hurst = floor(lit(1000000) * slope).cast("long")
    st.filter(col("k") > 1 && denom > 0)
      .select(col("event_type"), col("k").cast("int").as("n_scales"),
        col("n_windows"), col("rs8"), col("rs64"),
        hurst.as("hurst_micro"), (hurst > 600000).as("persistent"))
  }

  /** GRANGER-STYLE LAG TEST over every ordered event-type pair — does
    * type a's hourly series yesterday-hour improve the 1-lag
    * autoregression of type b beyond b's own lag? The restricted model
    * y_t ~ [1, y_{t−1}] and the full model y_t ~ [1, y_{t−1}, x_{t−1}]
    * are both solved in closed form from exact-BIGINT sufficient
    * statistics (the [[tsAutocorr]] discipline): centered second
    * moments c·· = n·Σ·· − Σ·Σ· stay integers, and the two SSRs plus
    * the F statistic are one shared double expression tree evaluated
    * identically by both engines (int→double conversion and each
    * subsequent op are correctly rounded — the dq_drift_ttest rule).
    * Degenerate pairs (constant regressors, singular 2×2 normal matrix,
    * zero residual) are excluded by mirrored predicates, never cast.
    *
    * Plan: events reduce once to the (type, hour, count) series frame;
    * pairs come from two series-frame self-joins on the hour key (the
    * [[tsCrossCorr]] shape — observed-bucket pairs, no grid
    * densification); the output is |types|²-bounded. */
  val tsGranger: Q = Q(
    "ts_granger",
    """WITH c AS (SELECT event_type,
      |    epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS ms,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT la.event_type AS a, tb.event_type AS b,
      |    tb.x AS y, lb.x AS u, la.x AS v
      |  FROM c tb
      |  JOIN c lb ON lb.event_type = tb.event_type
      |           AND lb.ms = tb.ms - 3600000
      |  JOIN c la ON la.ms = tb.ms - 3600000
      |           AND la.event_type <> tb.event_type),
      |s AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(u*u) AS BIGINT) AS suu,
      |    CAST(sum(v*v) AS BIGINT) AS svv,
      |    CAST(sum(y*y) AS BIGINT) AS syy,
      |    CAST(sum(u*v) AS BIGINT) AS suv,
      |    CAST(sum(u*y) AS BIGINT) AS suy,
      |    CAST(sum(v*y) AS BIGINT) AS svy
      |  FROM p GROUP BY 1, 2),
      |m AS (SELECT a, b, n,
      |    CAST(n*suu - su*su AS DOUBLE) AS cuu,
      |    CAST(n*svv - sv*sv AS DOUBLE) AS cvv,
      |    CAST(n*suv - su*sv AS DOUBLE) AS cuv,
      |    CAST(n*suy - su*sy AS DOUBLE) AS cuy,
      |    CAST(n*svy - sv*sy AS DOUBLE) AS cvy,
      |    CAST(n*syy - sy*sy AS DOUBLE) AS cyy
      |  FROM s WHERE n >= 10),
      |f AS (SELECT a, b, n,
      |    cyy - (cuy * cuy) / cuu AS ssr_r,
      |    cyy - ((cuy * cuy * cvv - 2 * cuy * cvy * cuv)
      |           + (cvy * cvy * cuu)) / (cuu * cvv - cuv * cuv) AS ssr_f
      |  FROM m WHERE cuu > 0 AND cuu * cvv - cuv * cuv > 0)
      |SELECT a, b, CAST(n AS BIGINT) AS n_hours,
      |  (ssr_r - ssr_f) * (n - 3) / ssr_f AS f_stat,
      |  (ssr_r - ssr_f) * (n - 3) / ssr_f > 4.0 AS significant
      |FROM f WHERE ssr_f > 0 ORDER BY a, b""".stripMargin
  ) { (s, d) =>
    val c = Tables.events(s, d)
      .groupBy(col("event_type"),
        unix_millis(date_trunc("hour", col("ts"))).as("ms"))
      .agg(count(lit(1)).as("x"))
    val tb = c.select(col("event_type").as("b"), col("ms"),
      col("x").as("y"))
    val lb = c.select(col("event_type").as("b"),
      (col("ms") + 3600000L).as("ms"), col("x").as("u"))
    val la = c.select(col("event_type").as("a"),
      (col("ms") + 3600000L).as("ms"), col("x").as("v"))
    val p = tb.join(lb, Seq("b", "ms"))
      .join(la, Seq("ms")).filter(col("a") =!= col("b"))
    val st = p.groupBy("a", "b").agg(count(lit(1)).as("n"),
      sum(col("u")).as("su"), sum(col("v")).as("sv"),
      sum(col("y")).as("sy"), sum(col("u") * col("u")).as("suu"),
      sum(col("v") * col("v")).as("svv"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("u") * col("v")).as("suv"),
      sum(col("u") * col("y")).as("suy"),
      sum(col("v") * col("y")).as("svy"))
    val m = st.filter(col("n") >= 10).select(col("a"), col("b"), col("n"),
      (col("n") * col("suu") - col("su") * col("su")).cast("double")
        .as("cuu"),
      (col("n") * col("svv") - col("sv") * col("sv")).cast("double")
        .as("cvv"),
      (col("n") * col("suv") - col("su") * col("sv")).cast("double")
        .as("cuv"),
      (col("n") * col("suy") - col("su") * col("sy")).cast("double")
        .as("cuy"),
      (col("n") * col("svy") - col("sv") * col("sy")).cast("double")
        .as("cvy"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        .as("cyy"))
    val f = m
      .filter(col("cuu") > 0 &&
        col("cuu") * col("cvv") - col("cuv") * col("cuv") > 0)
      .select(col("a"), col("b"), col("n"),
        (col("cyy") - (col("cuy") * col("cuy")) / col("cuu")).as("ssr_r"),
        (col("cyy") -
          ((col("cuy") * col("cuy") * col("cvv")
            - lit(2) * col("cuy") * col("cvy") * col("cuv"))
            + (col("cvy") * col("cvy") * col("cuu")))
          / (col("cuu") * col("cvv") - col("cuv") * col("cuv")))
          .as("ssr_f"))
    f.filter(col("ssr_f") > 0)
      .select(col("a"), col("b"), col("n").cast("long").as("n_hours"),
        ((col("ssr_r") - col("ssr_f")) * (col("n") - 3) / col("ssr_f"))
          .as("f_stat"),
        (((col("ssr_r") - col("ssr_f")) * (col("n") - 3) / col("ssr_f"))
          > 4.0).as("significant"))
  }

  val all: Seq[Q] = Seq(tsAutocorr, tsChangepoint, tsEwma, tsDecompose,
    tsHolt, tsMkTrend, tsAnomaly, tsRollingCorr, tsCrossCorr, tsTheilSen,
    tsBacktestMae, tsSeasonalStrength, tsVarRatio, tsSax, tsHurst,
    tsGranger)
}
