package graft.operators

import graft.{Q, Tables}
import graft.Tables.{asDouble, money, sumExactAsDouble, sumMoneyAsDouble}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.3–§2.5, §2.7–§2.9).
  *
  * Design notes for 100 TB posture:
  *  - Every query is a declarative DataFrame plan: filters/projections reach
  *    the parquet scan (predicate pushdown + column pruning), aggregations
  *    run partial+final (map-side combine), and joins pick
  *    broadcast/sort-merge via Catalyst + AQE.
  *  - Small dimension tables (region/nation/supplier, and the derived query
  *    vectors) are explicitly `broadcast()` so no shuffle of the fact side
  *    is wasted on a tiny build side.
  *  - Money sums use exact DECIMAL(18,2) arithmetic (see [[graft.Tables]])
  *    so results are partition-order independent — both an oracle-parity and
  *    a determinism-at-scale requirement.
  */
object Relational {

  /** Reference's one real query: per-partition-key count
    * (fhir_import_export.py:263-274 — ES `size=0` count of patients in a
    * project). Here: customers per nation key.
    */
  val countByProject: Q = Q(
    "count_by_project",
    """SELECT c_nationkey AS project_key, count(*) AS patient_count
      |FROM customer GROUP BY c_nationkey ORDER BY project_key""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("project_key"))
      .agg(count(lit(1)).as("patient_count"))
  }

  /** Comparison / boolean / between predicates (SURVEY §2.4) — all pushed
    * into the parquet scan. */
  val filterPred: Q = Q(
    "filter_pred",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |  AND l_quantity BETWEEN 5 AND 20
      |  AND (l_returnflag = 'A' OR l_linestatus = 'O')
      |  AND l_discount < 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
                                  lit("1997-12-31").cast("timestamp")) &&
        col("l_quantity").between(5, 20) &&
        (col("l_returnflag") === "A" || col("l_linestatus") === "O") &&
        col("l_discount") < 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** TPC-H Q1-shaped hash aggregation: partial+final HashAggregate with
    * exact decimal money arithmetic. */
  val aggGroupBy: Q = Q(
    "agg_groupby",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    val disc1 = lit(1).cast(Tables.Money) - money(col("l_discount"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoneyAsDouble(col("l_quantity")).as("sum_qty"),
        sumMoneyAsDouble(col("l_extendedprice")).as("sum_base_price"),
        sumExactAsDouble(money(col("l_extendedprice")) * disc1, 4).as("sum_disc_price"),
        (sumMoneyAsDouble(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  val aggDistinct: Q = Q(
    "agg_distinct",
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
      |       count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))
  }

  /** ROLLUP grouping sets. NULLS FIRST is explicit in the oracle because
    * DuckDB defaults to NULLS LAST while Spark defaults to NULLS FIRST. */
  val aggRollup: Q = Q(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sumMoneyAsDouble(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))
  }

  /** Global top-k → Catalyst TakeOrderedAndProject (no full sort at scale:
    * per-partition top-k then merge on the driver/final stage). */
  val topk: Q = Q(
    "topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
  }

  /** Equi inner join; nation is a dimension → broadcast (no shuffle of the
    * customer side). */
  val joinInner: Q = Q(
    "join_inner",
    """SELECT c_custkey, c_name, n_name
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select("c_custkey", "c_name", "n_name")
  }

  /** TPC-H Q3-shaped 3-way join + agg + top-k. customer is the small side
    * after its filter → broadcast hint; orders⋈lineitem is the big
    * sort-merge/shuffled-hash join on the shared key. */
  val joinMultiway: Q = Q(
    "join_multiway",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-30'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    val disc1 = lit(1).cast(Tables.Money) - money(col("l_discount"))
    broadcast(c)
      .join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumExactAsDouble(money(col("l_extendedprice")) * disc1, 4).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(20)
  }

  /** SIX-TABLE STAR JOIN (TPC-H Q5 shape) — the deepest join tree in the
    * catalog and the canonical Catalyst join-reorder / broadcast-mix
    * exhibit: region→nation→(customer, supplier)→orders→lineitem with
    * the LOCAL-SUPPLIER constraint c_nationkey = s_nationkey (the
    * second, non-hierarchical equi edge that makes Q5 a join-ORDER
    * problem, not a chain). Revenue per nation for ASIA in 1996.
    *
    * Plan: the three dimension legs (region⋈nation, then customer and
    * supplier restricted by it) broadcast — they are region-filtered
    * and tiny at any scale; the two FACT tables join hash-to-hash on
    * orderkey (the only corpus-sized exchange pair), and the
    * local-supplier predicate applies post-join as a filter between
    * two broadcast lookups, so no fact row is shuffled twice. Money
    * through the DECIMAL(18,2) route, output as the standard DOUBLE
    * cast ([[joinMultiway]] discipline). At 100 TB this is exactly the
    * plan a warehouse wants: one shuffle pair, dimensions riding the
    * broadcast bus. */
  val joinStar: Q = Q(
    "join_star",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |             AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(s, d)
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(asiaNations),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val disc1 = lit(1).cast(Tables.Money) - money(col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sumExactAsDouble(money(col("l_extendedprice")) * disc1, 4)
             .as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Left-semi / left-anti joins (EXISTS / NOT EXISTS). */
  val semiAnti: Q = Q(
    "semi_anti",
    """SELECT 'no_orders' AS kind, count(*) AS n FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'with_orders' AS kind, count(*) AS n FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |ORDER BY kind""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    val withO = c.join(o, Seq("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val noO = c.join(o, Seq("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
    noO.unionByName(withO).orderBy("kind")
  }

  /** UNION / INTERSECT / EXCEPT set algebra on key sets. */
  val setOps: Q = Q(
    "setops",
    """WITH a AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      |UNION ALL
      |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL
      |SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM a UNION SELECT k FROM b)
      |ORDER BY op""".stripMargin
  ) { (s, d) =>
    val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k")).distinct()
    def cnt(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), col("n"))
    cnt(a.except(b), "except")
      .unionByName(cnt(a.intersect(b), "intersect"))
      .unionByName(cnt(a.union(b).distinct(), "union"))
      .orderBy("op")
  }

  /** Multiset (ALL) set operations — intersectAll / exceptAll / unionAll
    * keep duplicate multiplicities, unlike the distinct variants in
    * [[setOps]]. */
  val setopsAll: Q = Q(
    "setops_all",
    """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
      |     b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'except_all' AS op, count(*) AS n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t1
      |UNION ALL
      |SELECT 'intersect_all' AS op, count(*) AS n FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t2
      |UNION ALL
      |SELECT 'union_all' AS op, count(*) AS n FROM (SELECT k FROM a UNION ALL SELECT k FROM b) t3
      |ORDER BY op""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    def cnt(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), col("n"))
    cnt(a.exceptAll(b), "except_all")
      .unionByName(cnt(a.intersectAll(b), "intersect_all"))
      .unionByName(cnt(a.unionAll(b), "union_all"))
      .orderBy("op")
  }

  /** Pagination: ORDER BY … OFFSET … LIMIT — the portal-style page fetch.
    * Catalyst still plans the offset+limit as a single global top-(o+k). */
  val topkPaged: Q = Q(
    "topk_paged",
    """SELECT o_orderkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10 OFFSET 10""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .offset(10)
      .limit(10)
  }

  /** Scalar string/date function family (SURVEY §2.9): split/concat/case
    * conversion + year/quarter/trunc/datediff — the reference's
    * project_id.split('-') and %Y%m%d formatting generalized. */
  val scalarStringDate: Q = Q(
    "scalar_string_date",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(quarter(o_orderdate) AS INT) AS o_quarter,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month_start,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch95,
      |  lower(o_orderpriority) AS prio_lower,
      |  string_split(o_orderpriority, '-')[1] AS prio_code,
      |  concat_ws('#', o_orderstatus, o_orderpriority) AS status_prio,
      |  CAST(length(o_orderpriority) AS INT) AS prio_len,
      |  strftime(o_orderdate, '%Y%m%d-%H%M%S') AS snapshot_ts
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      quarter(col("o_orderdate")).as("o_quarter"),
      date_trunc("month", col("o_orderdate")).as("o_month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .as("days_since_epoch95"),
      lower(col("o_orderpriority")).as("prio_lower"),
      split(col("o_orderpriority"), "-").getItem(0).as("prio_code"),
      concat_ws("#", col("o_orderstatus"), col("o_orderpriority"))
        .as("status_prio"),
      length(col("o_orderpriority")).as("prio_len"),
      date_format(col("o_orderdate"), "yyyyMMdd-HHmmss").as("snapshot_ts")
    ) // full-table output: no presentation sort (driver compare is
      // row-order-insensitive; the range exchange + sampling pass it cost
      // re-executed the projection — see Windows scaladoc, r11 opt)
  }

  /** JSON envelope extraction (reference json.loads of INPUT_DATA /
    * study_meta, fhir_import_export.py:52,287) over events.props. */
  val jsonExtract: Q = Q(
    "json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(sum(k).as("sum_k"), max(k).as("max_k"), count(lit(1)).as("n"))
  }

  /** Array ops + higher-order functions over the embedding column
    * (SURVEY §2.9 / north-star multimodal column). No float arithmetic in
    * the output — element extraction and counts only, so parity is exact. */
  val arrayOps: Q = Q(
    "array_ops",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(embedding[1] AS DOUBLE) AS first_val,
      |  CAST(embedding[64] AS DOUBLE) AS last_val,
      |  label
      |FROM embeddings ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      size(filter(col("embedding"), x => x > 0)).as("n_pos"),
      // try_element_at: ANSI mode makes element_at THROW out-of-bounds,
      // while the DuckDB oracle returns NULL — try_ matches the oracle
      try_element_at(col("embedding"), lit(1)).cast("double").as("first_val"),
      try_element_at(col("embedding"), lit(64)).cast("double").as("last_val"),
      col("label")
    )
  }

  /** Range (interval) join: event pairs per user within 60s. Equi on
    * user_id + range predicate → shuffle join on user_id, range filter
    * post-join; at scale the equi key bounds the join fan-out. */
  val joinRange: Q = Q(
    "join_range",
    """SELECT a.user_id AS user_id, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.ts > a.ts
      | AND b.ts <= a.ts + INTERVAL 60 SECOND
      |GROUP BY a.user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    val a = Tables.events(s, d).select(col("user_id"), col("ts").as("ts_a"))
    val b = Tables.events(s, d).select(col("user_id"), col("ts").as("ts_b"))
    a.join(b, Seq("user_id"))
      .filter(col("ts_b") > col("ts_a") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 60 SECONDS"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** As-of join (nearest signup at-or-before each purchase, per user).
    * Spark lacks a native ASOF join; implemented as the classic
    * union + last(ignoreNulls) over an ordered window — one shuffle by
    * user_id, no N×M blow-up (contrast a range self-join), which is the
    * scalable formulation. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val joinAsof: Q = Q(
    "join_asof",
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      |       p.ts AS purchase_ts, s.ts AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val tagged = ev
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"),
        // signup sorts before purchase at equal ts so p.ts >= s.ts matches
        when(col("event_type") === "signup", lit(0)).otherwise(lit(1)).as("tag"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("signup_ts", last(col("sig_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
              col("signup_ts"))
  }

  /** As-of join WITH TOLERANCE (the pandas `merge_asof(tolerance=...)`
    * contract): the nearest preceding signup matches only if it is
    * within 24h of the purchase; staler matches null out. Same
    * single-window plan as [[joinAsof]] — the tolerance is one more
    * narrow projection over the matched row, NOT a different join — so
    * the scale posture is unchanged. Oracle: DuckDB's ASOF JOIN with the
    * tolerance applied as a CASE over the match (ASOF has no tolerance
    * parameter; the CASE is definitionally the same cut). Gap math in
    * exact epoch millis on both sides. */
  val joinAsofTol: Q = Q(
    "join_asof_tol",
    """SELECT event_id, user_id, purchase_ts,
      |  CASE WHEN epoch_ms(purchase_ts) - epoch_ms(signup_ts) <= 86400000
      |       THEN signup_ts END AS signup_ts
      |FROM (
      |  SELECT p.event_id AS event_id, p.user_id AS user_id,
      |         p.ts AS purchase_ts, s.ts AS signup_ts
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |    ON p.user_id = s.user_id AND p.ts >= s.ts)
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val TolMs = 86400000L
    joinAsof.fn(s, d)
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        when(unix_millis(col("purchase_ts")) - unix_millis(col("signup_ts"))
               <= TolMs,
             col("signup_ts")).as("signup_ts"))
  }

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`) —
    * completes the as-of family: each purchase matches the NEAREST
    * FOLLOWING signup (the "next maintenance window / next rebalance"
    * lookup shape). Same tagged-union single-window plan as
    * [[joinAsof]] mirrored in time: the first-following carry rides a
    * (ts, tag) sort where purchases order BEFORE signups at equal ts,
    * so a same-instant signup matches (`p.ts <= s.ts` inclusive, like
    * the backward variant's `>=`). ONE user-keyed exchange, never an
    * N×M join. Oracle: DuckDB's native ASOF with the flipped
    * inequality — a genuinely different algorithm. */
  val joinAsofFwd: Q = Q(
    "join_asof_fwd",
    """SELECT p.event_id AS event_id, p.user_id AS user_id,
      |       p.ts AS purchase_ts, s.ts AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts <= s.ts
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tagged = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"),
        // purchase sorts before signup at equal ts so p.ts <= s.ts matches
        when(col("event_type") === "signup", lit(1)).otherwise(lit(0)).as("tag"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("signup_ts", first(col("sig_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
              col("signup_ts"))
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`) —
    * the last member of the as-of family: each purchase matches the
    * signup CLOSEST in time, either direction, ties (equal distance,
    * including a same-instant signup seen by both carries) breaking
    * BACKWARD. Both directional carries ride ONE tagged frame and ONE
    * user-keyed exchange (two window functions re-sort locally but
    * share the partitioning — never a second shuffle, never an N×M
    * join); the nearest pick is a final narrow CASE in exact epoch
    * millis. Oracle: both DuckDB native ASOF directions (inclusive on
    * both sides, mirroring the tie rule) CASE-combined — a genuinely
    * different algorithm reaching the same contract. */
  val joinAsofNearest: Q = Q(
    "join_asof_nearest",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT * FROM events WHERE event_type = 'signup'),
      |b AS (SELECT p.event_id AS event_id, p.user_id AS user_id,
      |             p.ts AS purchase_ts, s.ts AS bts
      |      FROM p ASOF LEFT JOIN s
      |        ON p.user_id = s.user_id AND p.ts >= s.ts),
      |f AS (SELECT p.event_id AS event_id, s.ts AS fts
      |      FROM p ASOF LEFT JOIN s
      |        ON p.user_id = s.user_id AND p.ts <= s.ts)
      |SELECT b.event_id AS event_id, user_id, purchase_ts,
      |  CASE WHEN bts IS NULL THEN fts
      |       WHEN fts IS NULL THEN bts
      |       WHEN epoch_ms(purchase_ts) - epoch_ms(bts)
      |            <= epoch_ms(fts) - epoch_ms(purchase_ts) THEN bts
      |       ELSE fts END AS signup_ts
      |FROM b JOIN f ON b.event_id = f.event_id
      |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tagged = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"),
        // backward order: signup before purchase at equal ts (>= matches)
        when(col("event_type") === "signup", lit(0)).otherwise(lit(1)).as("tb"),
        // forward order: purchase before signup at equal ts (<= matches)
        when(col("event_type") === "signup", lit(1)).otherwise(lit(0)).as("tf"))
    val wb = Window.partitionBy("user_id").orderBy(col("ts"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy(col("ts"), col("tf"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("bts", last(col("sig_ts"), ignoreNulls = true).over(wb))
      .withColumn("fts", first(col("sig_ts"), ignoreNulls = true).over(wf))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        when(col("bts").isNull, col("fts"))
          .when(col("fts").isNull, col("bts"))
          .when(unix_millis(col("ts")) - unix_millis(col("bts"))
                  <= unix_millis(col("fts")) - unix_millis(col("ts")),
                col("bts"))
          .otherwise(col("fts")).as("signup_ts"))
  }

  /** NULL-preserving generator (`explode_outer`): documents whose filter
    * yields an EMPTY token list still emit one row with a NULL token —
    * the outer-generator semantics every flatten-with-provenance
    * pipeline needs (an inner explode silently drops the document).
    * Oracle: DuckDB has no outer unnest, so the empty list is padded to
    * `[NULL]` before unnesting — definitionally the same semantics. */
  val generatorOuter: Q = Q(
    "generator_outer",
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text,' '), x -> len(x) >= 8) AS ts
      |  FROM documents),
      |u AS (SELECT doc_id,
      |    unnest(CASE WHEN len(ts) = 0 THEN [CAST(NULL AS VARCHAR)]
      |           ELSE ts END) AS token
      |  FROM t)
      |SELECT doc_id, token FROM u
      |ORDER BY doc_id, token NULLS FIRST""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode_outer(filter(split(col("text"), " "),
                             x => length(x) >= 8)).as("token"))
  }

  /** CUBE grouping sets (all 4 combinations of the two keys). */
  val aggCube: Q = Q(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sumMoneyAsDouble(col("o_totalprice")).as("sum_price"))
  }

  /** Explicit GROUPING SETS (completes §2.5 alongside rollup/cube) —
    * arbitrary grouping combinations in ONE pass with `grouping()`
    * indicator columns disambiguating real NULL keys from subtotal rows
    * (the indicator is part of the output contract; consumers routing on
    * NULL alone misread any null-keyed group). Same expand+aggregate
    * physical shape as rollup/cube: rows replicate once per set
    * (bounded ×3 here), then partial+final hash aggregation. */
  val aggGroupingSets: Q = Q(
    "agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY g_flag, g_status,
      |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
           grouping(col("l_linestatus")).cast("int").as("g_status"),
           count(lit(1)).as("n"),
           sumMoneyAsDouble(col("l_quantity")).as("sum_qty"))
  }

  /** Full-outer join (completes the equi-join family: inner/left via
    * denormalize, semi/anti, full here) — orders-per-day vs lineitems
    * shipped-per-day keyed by date, unmatched sides surface as nulls. */
  val joinOuter: Q = Q(
    "join_outer",
    """SELECT COALESCE(o.d, l.d) AS day, o.n_orders, l.n_ship
      |FROM (SELECT o_orderdate AS d, count(*) AS n_orders FROM orders GROUP BY 1) o
      |FULL JOIN (SELECT l_shipdate AS d, count(*) AS n_ship FROM lineitem GROUP BY 1) l
      |  ON o.d = l.d
      |ORDER BY day""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d).groupBy(col("o_orderdate").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(s, d).groupBy(col("l_shipdate").as("d"))
      .agg(count(lit(1)).as("n_ship"))
    o.as("o").join(l.as("l"), col("o.d") === col("l.d"), "full")
      .select(coalesce(col("o.d"), col("l.d")).as("day"),
              col("n_orders"), col("n_ship"))
  }

  /** Map-typed column ops (SURVEY §2.9): JSON envelope → map<string,string>,
    * key extraction and key-set introspection. The oracle reads the same
    * facts through DuckDB's JSON functions. */
  val mapOps: Q = Q(
    "map_ops",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |  array_to_string(list_sort(json_keys(props)), '|') AS keys,
      |  CAST(len(json_keys(props)) AS INT) AS n_keys
      |FROM events ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.{MapType, StringType}
    // parse ONCE in a separate projection: the parsed map is referenced 3×
    // below and from_json is non-cheap, so CollapseProject keeps the two
    // Projects apart instead of re-inlining (and re-parsing) per output
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
      .select(
        col("event_id"),
        // try_element_at: ANSI element_at throws on a missing map key;
        // DuckDB's json_extract_string yields NULL — try_ matches
        try_element_at(col("m"), lit("k")).cast("long").as("k_val"),
        array_join(array_sort(map_keys(col("m"))), "|").as("keys"),
        size(map_keys(col("m"))).as("n_keys")
      ) // full-table output: no presentation sort (r11 opt, see Windows)
  }

  /** HyperLogLog++ approximate distinct (SURVEY §2.5) next to the exact
    * count — the raw sketch frame; RelationalSpec bounds the relative
    * error on it directly. */
  private[graft] def approxDistinctRaw(s: SparkSession, d: String): DataFrame =
    // two-level: reduce to distinct (status, custkey) pairs first
    // (partial+final, map-side combine), then exact = count(*) and the
    // HLL runs over the already-distinct pairs — bit-identical estimate
    // (HLL is duplicate-insensitive) without the Expand a mixed
    // exact-distinct + sketch aggregate plans, and the shape that scales:
    // the wide fact stream reduces before anything sketch-sized shuffles.
    Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_custkey").agg(count(lit(1)).as("_n"))
      .groupBy("o_orderstatus")
      .agg(
        // rsd 0.02: the contract below asserts 5% relative error — 2.5σ
        // of margin (the default 0.05 rsd leaves the 1σ tail outside its
        // own bound on real groups; measured ≤1.7% across all SFs here),
        // at the same per-row cost as the default width
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
        count(lit(1)).as("exact_cust"))
      .orderBy("o_orderstatus")

  /** Driver-checked HLL++ query: the raw estimate is engine-specific
    * (DuckDB's sketch differs by construction), so the DECLARED output is
    * the sketch's CONTRACT — the exact distinct count (fully
    * value-checked) plus `approx_within_5pct`, which Spark computes
    * genuinely from its sketch and the oracle asserts as literal truth.
    * A sketch regression past 5% relative error flips the boolean and
    * fails the hash compare — a real driver gate, unlike `no_oracle`. */
  val aggApproxDistinct: Q = Q(
    "agg_approx_distinct",
    """SELECT o_orderstatus,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
      |  true AS approx_within_5pct
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    approxDistinctRaw(s, d)
      .select(col("o_orderstatus"), col("exact_cust"),
        (abs(col("approx_cust") - col("exact_cust")).cast("double") /
          col("exact_cust") <= 0.05).as("approx_within_5pct"))
  }

  /** Pivot (wide conditional aggregation): returnflag columns per
    * linestatus. The oracle is the equivalent CASE-WHEN expansion — which
    * is also exactly how Catalyst executes `pivot` (one pass, no join). */
  val aggPivot: Q = Q(
    "agg_pivot",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
      |  CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
      |  CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sumMoneyAsDouble(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_A", "N" -> "qty_N", "R" -> "qty_R"))
  }

  /** Moment statistics with deterministic results: variance/stddev derived
    * from EXACT decimal sums (Σx, Σx² as DECIMAL, combine in double) —
    * partition-order independent, unlike the streaming stddev aggregate,
    * and therefore both oracle-stable and reproducible at 100 TB. */
  val aggStats: Q = Q(
    "agg_stats",
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_qty,
      |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |     * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |  / (count(*) - 1) AS var_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val q = money(col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           asDouble(sum(q)).as("s1"), asDouble(sum(q * q)).as("s2"),
           min(col("l_quantity")).as("min_qty"),
           max(col("l_quantity")).as("max_qty"))
      .select(col("l_returnflag"), col("n"),
        (col("s1") / col("n")).as("mean_qty"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("var_qty"),
        col("min_qty"), col("max_qty"))
  }

  /** Mode (most frequent value) per group with a DETERMINISTIC tie-break
    * (engine-native `mode()` breaks ties arbitrarily): count per (group,
    * value), then rank by (count desc, value asc). The ranking window
    * runs over the aggregated count rows — |groups|·|distinct values|,
    * not the fact table — so the plan is partial+final agg plus a window
    * over a tiny frame. */
  val aggMode: Q = Q(
    "agg_mode",
    """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c
      |           FROM orders GROUP BY 1, 2),
      |r AS (SELECT o_orderstatus, o_orderpriority, c,
      |        row_number() OVER (PARTITION BY o_orderstatus
      |                           ORDER BY c DESC, o_orderpriority) AS rn
      |      FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority,
      |  CAST(c AS BIGINT) AS n
      |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(desc("c"), asc("o_orderpriority"))
    Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
              col("c").as("n"))
  }

  /** Numeric histogram: explicit floor bucketing (identical arithmetic in
    * both engines; DuckDB has no width_bucket). Bucket width 50k over
    * [0, 600k). */
  val aggHistogram: Q = Q(
    "agg_histogram",
    """SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
      |  count(*) AS n,
      |  CAST(min(o_totalprice) AS DOUBLE) AS lo,
      |  CAST(max(o_totalprice) AS DOUBLE) AS hi
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("o_totalprice")).cast("double").as("lo"),
           max(col("o_totalprice")).cast("double").as("hi"))
  }

  /** Ordered string aggregation (listagg family): sorted distinct values
    * joined with a delimiter — deterministic regardless of partitioning. */
  val aggStringagg: Q = Q(
    "agg_stringagg",
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), "|")
        .as("priorities"))
  }

  /** Pearson correlation & covariance from EXACT decimal sums (same
    * determinism argument as [[aggStats]]: Σx, Σy, Σxy, Σx², Σy² are
    * exact decimals, the final combine is a handful of double ops —
    * partition-order independent, unlike the streaming corr aggregate). */
  val aggCorr: Q = Q(
    "agg_corr",
    """SELECT l_returnflag, count(*) AS n,
      |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |     * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |  / (count(*) - 1) AS covar_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val x = money(col("l_quantity"))
    val y = money(col("l_extendedprice"))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           asDouble(sum(x * y)).as("sxy"),
           asDouble(sum(x)).as("sx"), asDouble(sum(y)).as("sy"))
      .select(col("l_returnflag"), col("n"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
          .as("covar_qty_price"))
  }

  /** Generator / UDTF surface (SURVEY §2.11): posexplode over the token
    * array — one output row per (element, ordinal). */
  val generatorPosexplode: Q = Q(
    "generator_posexplode",
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
      |           WHERE doc_id < 50),
      |u AS (SELECT doc_id,
      |        unnest([{'pos': i-1, 'tok': toks[i]} FOR i IN range(1, len(toks)+1)]) AS e
      |      FROM t)
      |SELECT doc_id, CAST(e.pos AS INT) AS pos, e.tok AS token
      |FROM u ORDER BY doc_id, pos""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
  }

  /** Exact continuous quantiles (median/p90) — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition, so
    * results match bit-for-bit. (The approximate sketch variant for
    * 100 TB is `percentile_approx`; exact needs a per-group sort.) */
  val aggQuantile: Q = Q(
    "agg_quantile",
    """SELECT l_returnflag,
      |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
      |  CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty,
      |  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("median_price"))
  }

  /** WEIGHTED MEDIAN per group (the warehouse "median price weighted by
    * units sold" — unweighted quantiles answer a different question when
    * line sizes vary 50×): smallest price whose cumulative quantity
    * weight reaches half the group total. Exact and engine-stable
    * without any tie rule: the cumulative window uses the default RANGE
    * frame, so equal prices contribute their weight TOGETHER (order
    * among ties cannot move the crossing), the crossing test 2·cum ≥
    * total is exact BIGINT arithmetic (quantities are integral — cast,
    * not rounded), and min(price) at the crossing is tie-invariant.
    *
    * Plan shape: ONE group-keyed sort exchange carries both windows
    * (cumulative and group total), then a partial+final aggregate; no
    * self-join against a totals table. At 100 TB the same shape holds —
    * the sort is per group, and the sketch alternative (weighted
    * GK/t-digest) trades this sort for mergeable partials exactly as
    * [[aggQuantile]]'s scaladoc documents for the unweighted case. */
  val aggWeightedMedian: Q = Q(
    "agg_weighted_median",
    """WITH c AS (SELECT l_returnflag AS flag, l_extendedprice AS price,
      |             CAST(round(l_quantity) AS BIGINT) AS wgt FROM lineitem),
      |s AS (SELECT flag, price,
      |        sum(wgt) OVER (PARTITION BY flag ORDER BY price) AS cum,
      |        sum(wgt) OVER (PARTITION BY flag) AS total
      |      FROM c)
      |SELECT flag, CAST(max(total) AS BIGINT) AS total_weight,
      |  min(price) AS weighted_median
      |FROM s WHERE 2 * cum >= total GROUP BY flag ORDER BY flag""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val cum = Window.partitionBy("flag").orderBy("price")
    val tot = Window.partitionBy("flag")
    Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
              col("l_extendedprice").as("price"),
              round(col("l_quantity"), 0).cast("long").as("wgt"))
      .withColumn("cum", sum(col("wgt")).over(cum))
      .withColumn("total", sum(col("wgt")).over(tot))
      .filter(lit(2) * col("cum") >= col("total"))
      .groupBy("flag")
      .agg(max(col("total")).as("total_weight"),
           min(col("price")).as("weighted_median"))
  }

  /** The 100 TB quantile path named in [[aggQuantile]]: GK-sketch
    * `percentile_approx` — mergeable partial sketches, one partial+final
    * aggregation, NO per-group sort. Deterministic for a given dataset
    * (the sketch is order-insensitive on merge) but not reproducible in
    * DuckDB (different sketch) — this raw frame feeds the declared
    * contract query below and RelationalSpec's value-error bound.
    * Accuracy 10000 ≈ max rank error 0.01%. */
  private[graft] def quantileSketchRaw(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("median_qty"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(10000))
          .as("p90_qty"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("median_price"))
      .orderBy("l_returnflag")

  /** Mergeable-sketch cardinality — the cross-shard shape
    * [[aggApproxDistinct]] doesn't exercise: one Datasketches HLL sketch
    * per event_type (the "per shard/partition summary"), then
    * `hll_union_agg` merges the BINARY sketches and one estimate comes
    * out — exactly how a 1000-executor fleet combines per-shard
    * cardinality summaries without re-scanning anything. Declared output
    * is the contract (the sketch bytes are engine-specific): the
    * value-checked exact distinct-user count, the number of per-type
    * sketches merged, and a genuinely computed 5%-error boolean the
    * oracle asserts as literal truth. */
  val aggHllUnion: Q = Q(
    "agg_hll_union",
    """SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_sketches,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  true AS union_within_5pct
      |FROM events""".stripMargin
  ) { (s, d) =>
    val perType = Tables.events(s, d)
      .groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val merged = perType.agg(
      count(lit(1)).as("n_sketches"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    val exact = Tables.events(s, d)
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
      .select(col("n_sketches"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("union_within_5pct"))
  }

  /** Sketch SET ALGEBRA (Datasketches theta): purchaser and signup user
    * sets sketched independently, then |∩|, |∪| and |P∖S| estimated
    * purely from the two sketches — the audience-overlap question
    * answered WITHOUT a join, which is the point at 100 TB: each side's
    * sketch builds in its own partial+final pass, and the set algebra
    * happens on two kilobyte-sized summaries. Declared output is the
    * contract: value-checked exact cardinalities (distinct-join SQL)
    * plus genuinely computed 5%-error booleans for all three estimates
    * (theta lgK=12 ⇒ ~1.6% RSE; intersection error scales with the
    * union, covered by the margin and checked at all SFs). */
  val aggThetaSetops: Q = Q(
    "agg_theta_setops",
    """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
      |SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS exact_p,
      |  CAST((SELECT count(*) FROM s) AS BIGINT) AS exact_s,
      |  CAST((SELECT count(*) FROM p JOIN s USING (user_id)) AS BIGINT) AS exact_inter,
      |  CAST((SELECT count(*) FROM (SELECT user_id FROM p UNION SELECT user_id FROM s)) AS BIGINT) AS exact_union,
      |  true AS inter_within_5pct, true AS union_within_5pct,
      |  true AS diff_within_5pct""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    def sideSk(t: String) = ev.filter(col("event_type") === t)
      .agg(theta_sketch_agg(col("user_id")).as(s"sk_$t"))
    def sideExact(t: String) = ev.filter(col("event_type") === t)
      .select("user_id").distinct()
    val (p, sg) = (sideExact("purchase"), sideExact("signup"))
    val exacts = p.agg(count(lit(1)).as("exact_p")).crossJoin(
        sg.agg(count(lit(1)).as("exact_s"))).crossJoin(
        p.join(sg, Seq("user_id")).agg(count(lit(1)).as("exact_inter")))
      .withColumn("exact_union",
        col("exact_p") + col("exact_s") - col("exact_inter"))
    val ests = sideSk("purchase").crossJoin(sideSk("signup"))
      .select(
        theta_sketch_estimate(
          theta_intersection(col("sk_purchase"), col("sk_signup")))
          .as("est_i"),
        theta_sketch_estimate(
          theta_union(col("sk_purchase"), col("sk_signup"))).as("est_u"),
        theta_sketch_estimate(
          theta_difference(col("sk_purchase"), col("sk_signup")))
          .as("est_d"))
    // zero-set guard: an empty exact set (here P∖S — every purchaser
    // also signed up in the synthetic corpus) has no relative error;
    // the sketch must simply estimate ~0 (theta difference of identical
    // sketches is exactly empty)
    def ok(est: Column, exact: Column) =
      when(exact === 0, est < 1)
        .otherwise(abs(est - exact).cast("double") / exact <= 0.05)
    exacts.crossJoin(ests)
      .select(col("exact_p"), col("exact_s"), col("exact_inter"),
        col("exact_union"),
        ok(col("est_i"), col("exact_inter")).as("inter_within_5pct"),
        ok(col("est_u"), col("exact_union")).as("union_within_5pct"),
        ok(col("est_d"), col("exact_p") - col("exact_inter"))
          .as("diff_within_5pct"))
  }

  /** Driver-checked GK-sketch query: the sketch VALUE is engine-specific,
    * but the GK contract is rank-based and checkable — for quantile φ and
    * returned value v, `count(x < v) ≤ (φ+ε)·n` and `count(x ≤ v) ≥
    * (φ−ε)·n` (tie-robust, unlike a value-distance check). Spark computes
    * both rank counts genuinely (sketch per group, broadcast back, one
    * counting pass); the oracle asserts the booleans as literal truth
    * next to the fully value-checked group sizes. ε = 0.001, 10× the
    * sketch's configured 0.0001 rank error. */
  val aggQuantileSketch: Q = Q(
    "agg_quantile_sketch",
    """SELECT l_returnflag, count(*) AS n,
      |  true AS q50_rank_ok, true AS q90_rank_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val eps = 0.001
    val sk = quantileSketchRaw(s, d)
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").as("x"))
      .join(broadcast(sk), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum(when(col("x") < col("median_qty"), 1L).otherwise(0L)).as("lt50"),
           sum(when(col("x") <= col("median_qty"), 1L).otherwise(0L)).as("le50"),
           sum(when(col("x") < col("p90_qty"), 1L).otherwise(0L)).as("lt90"),
           sum(when(col("x") <= col("p90_qty"), 1L).otherwise(0L)).as("le90"))
      .select(col("l_returnflag"), col("n"),
        (col("lt50") <= (lit(0.5) + eps) * col("n") &&
         col("le50") >= (lit(0.5) - eps) * col("n")).as("q50_rank_ok"),
        (col("lt90") <= (lit(0.9) + eps) * col("n") &&
         col("le90") >= (lit(0.9) - eps) * col("n")).as("q90_rank_ok"))
  }

  /** Math + bitwise scalar family (SURVEY §2.9). Function picks are
    * parity-exact by construction: abs/floor/ceil/sign are exact, sqrt
    * is IEEE-correctly-rounded in both engines, integer powers avoid
    * libm's pow (which differs in the last ulp), and bitwise ops are
    * integer-exact. Pure projection — whole-stage codegen, no shuffle. */
  val scalarMath: Q = Q(
    "scalar_math",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25.0) AS dev_qty,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
      |  CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_decile,
      |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_side,
      |  sqrt(l_extendedprice) AS price_sqrt,
      |  l_quantity * l_quantity AS qty_sq,
      |  CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
      |  greatest(l_quantity, l_discount * 100) AS g,
      |  least(l_tax, l_discount) AS l,
      |  CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS key_xor,
      |  CAST(l_orderkey & 255 AS BIGINT) AS key_and,
      |  CAST(l_orderkey << 2 AS BIGINT) AS key_shl
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("dev_qty"),
      floor(col("l_extendedprice") / 1000).as("price_k"),
      ceil(col("l_quantity") / 10).as("qty_decile"),
      signum(col("l_discount") - 0.05).as("disc_side"),
      sqrt(col("l_extendedprice")).as("price_sqrt"),
      (col("l_quantity") * col("l_quantity")).as("qty_sq"),
      (col("l_orderkey") % 97).as("key_mod"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
      least(col("l_tax"), col("l_discount")).as("l"),
      col("l_orderkey").bitwiseXOR(col("l_partkey")).as("key_xor"),
      col("l_orderkey").bitwiseAND(lit(255L)).as("key_and"),
      shiftleft(col("l_orderkey"), 2).as("key_shl")
    ) // full-table output: no presentation sort (r11 opt, see Windows)
  }

  /** Extended datetime family (SURVEY §2.9): month arithmetic, calendar
    * boundaries, ISO-week truncation, component extracts. Picks avoid
    * the known cross-engine divergences: dayofweek numbering differs
    * (DuckDB 0=Sun, Spark 1=Sun) so the oracle normalizes; both engines
    * truncate weeks to Monday. */
  val scalarDatetimeExt: Q = Q(
    "scalar_datetime_ext",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
      |  CAST(extract(day FROM o_orderdate) AS INT) AS d,
      |  CAST(extract(month FROM o_orderdate) AS INT) AS m,
      |  CAST(extract(quarter FROM o_orderdate) AS INT) AS q,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
      |  CAST(datediff('day', DATE '1995-06-01', o_orderdate) AS INT) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      add_months(col("o_orderdate"), 3).as("plus3m"),
      last_day(col("o_orderdate")).as("month_end"),
      trunc(col("o_orderdate"), "week").as("week_start"),
      dayofmonth(col("o_orderdate")).as("d"),
      month(col("o_orderdate")).as("m"),
      quarter(col("o_orderdate")).as("q"),
      dayofweek(col("o_orderdate")).as("dow_sun1"),
      datediff(col("o_orderdate"), lit("1995-06-01").cast("date"))
        .as("days_since")
    ) // full-table output: no presentation sort (r11 opt, see Windows)
  }

  /** Extended string family (SURVEY §2.9): regex group extraction, field
    * split, padding, character translation, reversal, repetition, and
    * edit distance (levenshtein — integer-exact in both engines; the
    * fuzzy-match primitive entity-resolution pipelines key on). All
    * projections; regex classes used are identical in Java regex and
    * DuckDB's RE2. */
  val scalarStringExt: Q = Q(
    "scalar_string_ext",
    """SELECT o_orderkey,
      |  regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2) AS prio_word,
      |  split_part(o_orderpriority, '-', 1) AS prio_num,
      |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
      |  rpad(o_orderstatus, 3, '.') AS status_padded,
      |  translate(o_orderpriority, '-', '_') AS prio_snake,
      |  reverse(o_orderstatus) AS status_rev,
      |  repeat(o_orderstatus, 3) AS status_x3,
      |  CAST(levenshtein(o_orderpriority, '1-URGENT') AS INT) AS dist_urgent,
      |  CAST(strpos(o_orderpriority, '-') AS INT) AS dash_at
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      regexp_extract(col("o_orderpriority"), "([0-9]+)-([A-Z]+)", 2)
        .as("prio_word"),
      // DuckDB split_part(s, d, n) ≡ Spark element_at(split(s, d), n)
      element_at(split(col("o_orderpriority"), "-"), 1).as("prio_num"),
      lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
      rpad(col("o_orderstatus"), 3, ".").as("status_padded"),
      translate(col("o_orderpriority"), "-", "_").as("prio_snake"),
      reverse(col("o_orderstatus")).as("status_rev"),
      repeat(col("o_orderstatus"), 3).as("status_x3"),
      levenshtein(col("o_orderpriority"), lit("1-URGENT")).as("dist_urgent"),
      instr(col("o_orderpriority"), "-").as("dash_at")
    ) // full-table output: no presentation sort (r11 opt, see Windows)
  }

  /** Null-semantics corner cases pinned down as a query: NULLIF-injected
    * nulls, a NULLABLE GROUP KEY (both engines place all-null keys in one
    * group), null-safe equality (`<=>` ≡ IS NOT DISTINCT FROM), count(*)
    * vs count(col), and COALESCE fallback — the semantics a user silently
    * relies on in every pipeline with optional fields. ORDER BY carries
    * an explicit NULLS FIRST (engines disagree on the default). */
  val scalarNullSemantics: Q = Q(
    "scalar_null_semantics",
    """WITH t AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
      |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS pr
      |  FROM orders)
      |SELECT st, count(*) AS n_rows,
      |  CAST(count(pr) AS BIGINT) AS n_pr,
      |  CAST(sum(CASE WHEN st IS NOT DISTINCT FROM pr THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nullsafe_eq,
      |  coalesce(min(pr), 'none') AS first_pr
      |FROM t GROUP BY st ORDER BY st NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val t = Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("nullif(o_orderstatus, 'O')").as("st"),
      when(col("o_orderkey") % 3 === 0, lit(null))
        .otherwise(col("o_orderpriority")).as("pr"))
    t.groupBy("st")
      .agg(count(lit(1)).as("n_rows"),
           count(col("pr")).as("n_pr"),
           sum(when(col("st") <=> col("pr"), 1).otherwise(0)).as("n_nullsafe_eq"),
           coalesce(min(col("pr")), lit("none")).as("first_pr"))
  }

  /** Data-profiling pass over `orders` ("ANALYZE TABLE" shape — the data
    * quality gate every pipeline runs before training): row count,
    * per-column null and distinct counts, value ranges — ONE aggregation,
    * one scan, all partial+final combinable. */
  val profileTable: Q = Q(
    "profile_table",
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT o_custkey) AS custkey_distinct,
      |  count(DISTINCT o_orderstatus) AS status_distinct,
      |  count(DISTINCT o_orderpriority) AS priority_distinct,
      |  CAST(count(*) - count(o_custkey) AS BIGINT) AS custkey_nulls,
      |  CAST(count(*) - count(o_orderpriority) AS BIGINT) AS priority_nulls,
      |  min(o_orderdate) AS date_min, max(o_orderdate) AS date_max,
      |  CAST(min(o_totalprice) AS DOUBLE) AS price_min,
      |  CAST(max(o_totalprice) AS DOUBLE) AS price_max,
      |  CAST(min(length(o_orderpriority)) AS INT) AS priority_len_min,
      |  CAST(max(length(o_orderpriority)) AS INT) AS priority_len_max
      |FROM orders""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_custkey")).as("custkey_distinct"),
      countDistinct(col("o_orderstatus")).as("status_distinct"),
      countDistinct(col("o_orderpriority")).as("priority_distinct"),
      (count(lit(1)) - count(col("o_custkey"))).as("custkey_nulls"),
      (count(lit(1)) - count(col("o_orderpriority"))).as("priority_nulls"),
      min(col("o_orderdate")).as("date_min"),
      max(col("o_orderdate")).as("date_max"),
      min(col("o_totalprice")).cast("double").as("price_min"),
      max(col("o_totalprice")).cast("double").as("price_max"),
      min(length(col("o_orderpriority"))).as("priority_len_min"),
      max(length(col("o_orderpriority"))).as("priority_len_max"))
  }

  /** Z-score outlier flagging per group — group mean/std derived from
    * EXACT decimal sums (the [[aggStats]] determinism argument), then a
    * broadcast of the per-group stats back onto the rows; |z| > 1.5
    * rows counted per group. Two scans, no row ever leaves its
    * partition for the stats join (broadcast).
    *
    * Oracle converts DECIMAL→DOUBLE via VARCHAR: at ≥17 significant
    * digits DuckDB's direct decimal→double is off by an ulp (not
    * correctly rounded) while Spark's BigDecimal.doubleValue is; strtod
    * is correctly rounded in both (see docs/ORACLE_PARITY.md). */
  /** Equi-DEPTH histogram (quantile-edged buckets) — the profiling
    * complement to the equi-width `agg_histogram`: bucket edges come
    * from the data's quartiles, so each bucket holds ~25% of rows
    * regardless of skew (the shape optimizers and monitors actually
    * want). One exact percentile pass produces the three edges as a
    * single row BROADCAST back onto the stream; bucketing is a pure
    * projection and the count is one partial+final aggregate. Same
    * percentile ↔ quantile_cont parity as agg_quantile; `<=` edge
    * comparisons act on identical bits. */
  val aggHistogramEqd: Q = Q(
    "agg_histogram_eqd",
    """WITH e AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS q
      |           FROM events),
      |b AS (SELECT CASE WHEN value <= q[1] THEN 0
      |                  WHEN value <= q[2] THEN 1
      |                  WHEN value <= q[3] THEN 2 ELSE 3 END AS bucket,
      |             value
      |      FROM events, e)
      |SELECT bucket, count(*) AS n,
      |  CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("value"))
    val edges = ev.agg(
      expr("percentile(value, array(0.25, 0.5, 0.75))").as("q"))
    ev.crossJoin(broadcast(edges))
      .select(col("value"),
        when(col("value") <= element_at(col("q"), 1), 0)
          .when(col("value") <= element_at(col("q"), 2), 1)
          .when(col("value") <= element_at(col("q"), 3), 2)
          .otherwise(3).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min(col("value")).as("lo"), max(col("value")).as("hi"))
  }

  /** Robust outlier detection via MEDIAN absolute deviation — the
    * companion to [[outlierZscore]] for heavy-tailed data where the mean
    * and stddev are themselves dragged by the outliers (|x − med| >
    * 3·1.4826·MAD ≈ the robust 3σ rule). Two exact per-group medians
    * (the declared-exact [[aggQuantile]] family; `percentile_approx` is
    * the 100 TB sketch path) with the tiny per-type tables BROADCAST
    * back onto the stream — events shuffle only for the percentile
    * groupings. Parity: same percentile ↔ quantile_cont interpolation as
    * agg_quantile; deviations and thresholds are pure double arithmetic
    * on identical bits. */
  val outlierMad: Q = Q(
    "outlier_mad",
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |           FROM events GROUP BY 1),
      |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
      |      FROM events e JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |       FROM d GROUP BY 1)
      |SELECT d.event_type, CAST(max(d.med) AS DOUBLE) AS med,
      |  CAST(max(md.mad) AS DOUBLE) AS mad, count(*) AS n,
      |  CAST(sum(CASE WHEN d.adev > 4.4478 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN md USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
           count(lit(1)).as("n"),
           sum(when(col("adev") > lit(4.4478) * col("mad"), 1).otherwise(0))
             .as("n_outliers"))
  }

  val outlierZscore: Q = Q(
    "outlier_zscore",
    """WITH g AS (SELECT l_returnflag, count(*) AS n,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM lineitem GROUP BY l_returnflag),
      |s AS (SELECT l_returnflag, n, sx / n AS mean,
      |  sqrt((sxx - sx * sx / n) / (n - 1)) AS std FROM g)
      |SELECT s.l_returnflag, CAST(s.n AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN abs((CAST(l.l_extendedprice AS DOUBLE) - s.mean) / s.std) > 1.5
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  max(abs((CAST(l.l_extendedprice AS DOUBLE) - s.mean) / s.std)) AS max_abs_z
      |FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
      |GROUP BY s.l_returnflag, s.n ORDER BY s.l_returnflag""".stripMargin
  ) { (s, d) =>
    val price = money(col("l_extendedprice"))
    val stats = Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           asDouble(sum(price)).as("sx"),
           asDouble(sum(price * price)).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / col("n")).as("mean"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
             (col("n") - 1)).as("std"))
    val z = abs((col("l_extendedprice").cast("double") - col("mean")) /
                col("std"))
    Tables.lineitem(s, d)
      .join(broadcast(stats), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("n"))
      .agg(sum(when(z > 1.5, 1).otherwise(0)).as("n_outliers"),
           max(z).as("max_abs_z"))
  }

  /** Skew-safe salted aggregation (SURVEY §4 / salting note): two-phase
    * groupBy over (key, salt) then key — result-identical to the plain
    * GROUP BY, which IS the oracle. The pattern for a 100 TB aggregation
    * where one key holds half the rows. */
  val aggSalted: Q = Q(
    "agg_salted",
    """SELECT l_returnflag AS k,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY k""".stripMargin
  ) { (s, d) =>
    graft.functions.SkewOps.saltedSumCount(
        Tables.lineitem(s, d),
        key = col("l_returnflag"),
        value = money(col("l_quantity")),
        n = 16,
        saltSource = col("l_orderkey"), col("l_linenumber"))
      .select(col("k"), asDouble(col("total")).as("total"), col("n"))
  }

  /** Stratified sampling (training-data pipeline staple): per-stratum
    * Bernoulli fractions (F→10%, O→50%, P→100%) decided by a salted
    * portable hash of the row key, not an RNG. Hash-based sampling is
    * the 100 TB-correct formulation: a row's inclusion is a pure
    * function of (key, salt), so the sample is stable under
    * repartitioning, task retries, AND incremental appends — the three
    * things that silently reshuffle an RNG-based `sampleBy` sample. The
    * salt string plays the seed's role. Fully portable, so unlike
    * `sampleBy` it carries a complete DuckDB value oracle. */
  val sampleStratified: Q = Q(
    "sample_stratified",
    """WITH s AS (SELECT o_orderstatus,
      |  CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':s42'), 1, 7)) AS BIGINT) % 1000 AS slot
      |FROM orders)
      |SELECT o_orderstatus, count(*) AS n_sampled FROM s
      |WHERE slot < CASE o_orderstatus WHEN 'F' THEN 100 WHEN 'O' THEN 500 ELSE 1000 END
      |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val slot =
      graft.functions.TextFns.saltedHash(col("o_orderkey"), ":s42", 7) % 1000
    val keep = when(col("o_orderstatus") === "F", 100)
      .when(col("o_orderstatus") === "O", 500).otherwise(1000)
    Tables.orders(s, d)
      .filter(slot < keep)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n_sampled"))
  }

  /** KEYLESS interval-overlap join via time-bucket binning — the join
    * algorithm for "what co-occurs within Δt, across the whole stream"
    * when there is NO equi key to ride ([[joinRange]] has user_id; this
    * has nothing). A naive formulation is a cartesian with a range
    * filter — quadratic, banned. The binned formulation buckets time
    * into Δt-wide cells: a right event lives in exactly one bucket, a
    * left event's (t, t+Δt] window spans at most two, so the left side
    * EXPLODES to ≤2 bucket probes and the join is a plain shuffled
    * equi join on the bucket — linear in data + true pair density, hash
    * partitioned by time cell, and each matched pair is seen exactly
    * once (the right event's single bucket is one of the left's two).
    * A traffic spike makes its minute a hot bucket — the shuffle is an
    * ordinary hash exchange, so AQE's skew-join split (or the
    * [[graft.functions.SkewOps]] salting used by join_salted) applies
    * unchanged when one cell dwarfs the rest.
    * The census here: which event types follow which within 60 s,
    * corpus-wide — the cross-correlation shape behind alert-storm and
    * funnel-leak diagnosis. Oracle: DuckDB's own range self-join (its
    * IEJoin handles the quadratic form at oracle scale). */
  val joinIntervalBin: Q = Q(
    "join_interval_bin",
    """SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
      |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin
  ) { (s, d) =>
    val BktUs = 60000000L // Δt = 60 s in exact integer microseconds
    val e = Tables.events(s, d).select(col("event_type"), col("ts"))
    val b = e.select(col("event_type").as("type_b"), col("ts").as("ts_b"),
      floor(unix_micros(col("ts")) / BktUs).as("bkt"))
    val a = e.select(col("event_type").as("type_a"), col("ts").as("ts_a"),
        floor(unix_micros(col("ts")) / BktUs).as("bkt0"))
      .select(col("type_a"), col("ts_a"),
        explode(array(col("bkt0"), col("bkt0") + 1)).as("bkt"))
    a.join(b, Seq("bkt"))
      .filter(col("ts_b") > col("ts_a") &&
              col("ts_b") <= col("ts_a") + expr("INTERVAL 60 SECONDS"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Exact-k-per-group sample ("reservoir sampling's output, without the
    * reservoir"): rank every row within its group by a salted portable
    * hash of its key and keep the k smallest. The hash order is a
    * uniform random permutation of each group, so the result is exactly
    * a uniform without-replacement k-sample — but as a pure function of
    * (key, salt) it is deterministic under repartitioning and task
    * retries, where a streaming reservoir's state depends on encounter
    * order. This is how eval/holdout sets get carved from a 100 TB
    * corpus: one shuffle (group-keyed window), per-partition sort, no
    * global state. For a group so large its sort dominates, the known
    * refinement is a threshold pre-pass (keep rows whose hash falls
    * under an over-estimated k-th-hash quantile, then exact-rank the
    * survivors) — same result, bounded sort; not needed at any
    * benchmarked scale. The companion [[sampleStratified]] covers
    * FRACTIONAL sampling; this covers exact COUNT contracts ("exactly
    * 20 docs per source"). Tie-break beyond the hash is the unique key
    * itself, so the rank is total and the oracle hashes bit-exactly. */
  val sampleReservoir: Q = Q(
    "sample_reservoir",
    s"""WITH h AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
       |  ${graft.functions.expressions.PortableHash
              .duckdbSaltedSql("o_orderkey", ":r7", 15)} AS hv
       |FROM orders),
       |r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
       |  row_number() OVER (PARTITION BY o_orderstatus
       |                     ORDER BY hv, o_orderkey) AS rn FROM h)
       |SELECT o_orderstatus, o_orderkey, o_totalprice
       |FROM r WHERE rn <= 20
       |ORDER BY o_orderstatus, o_orderkey""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hv = graft.functions.TextFns.saltedHash(col("o_orderkey"), ":r7", 15)
    Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
              hv.as("hv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_orderstatus").orderBy(asc("hv"), asc("o_orderkey"))))
      .filter(col("rn") <= 20)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
  }

  /** Poisson(1) bootstrap standard error — the ONLINE bootstrap (Oza &
    * Russell's Poisson trick): resampling-with-replacement is classically
    * a per-replicate global draw, but for n→∞ the multinomial replicate
    * weights converge to iid Poisson(1), so each row can draw its own
    * weight per replicate from a salted hash — NO global coordination,
    * which is the only bootstrap shape that works on a 100 TB table. 16
    * replicates of the mean order value, the bootstrap SE of the mean.
    *
    * Exactness: the Poisson draw is an integer inverse-CDF walk — a
    * uniform residue against the fixed cumulative-ppm thresholds of
    * Poisson(1) (367879 = ⌊10⁶/e⌋, ...) — identical on both engines by
    * construction. Replicate means quantize to exact micro-cent integers
    * (wide-int floor-div), the between-replicate variance is exact
    * wide-int arithmetic, and the only doubles are one VARCHAR-routed
    * conversion (the DECIMAL→DOUBLE ulp trap) and one correctly-rounded
    * sqrt.
    *
    * Cost discipline: the row seed is a splitmix-style integer mix of
    * the key (two xor-shift-multiply rounds kept inside 31 bits so every
    * intermediate is exact BIGINT on both engines — shifts are
    * nonnegative floor-divs, multiplies peak at 1.6e17), and the 16
    * per-replicate uniforms come from a 31-bit LCG stream over that
    * seed. Measured ladder at sf1: 16 portable MD5s/row = 30.8 s warm →
    * 1 MD5/row + LCG = 12.2 s → pure integer mix + LCG keeps the whole
    * draw inside whole-stage codegen (no hash-string churn). MD5 remains
    * the discipline where hash QUALITY is load-bearing (permutations,
    * shuffles); bootstrap weights only need decorrelation.
    *
    * Plan: a 16× narrow fan-out (explode of a constant range) feeding a
    * 16-group partial+final aggregate — the corpus crosses ONE exchange
    * as 16 partial states per partition; the 16-row replicate frame and
    * the 1-row grand mean then combine via broadcast. */
  val sampleBootstrap: Q = Q(
    "sample_bootstrap",
    s"""WITH b AS (SELECT o_orderkey,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM orders),
       |s0 AS (SELECT cents, o_orderkey % 2147483648 AS x0 FROM b),
       |s1 AS (SELECT cents,
       |    (xor(x0 // 65536, x0) * 73244475) % 2147483648 AS x1 FROM s0),
       |sd AS (SELECT cents,
       |    xor(((xor(x1 // 65536, x1) * 73244475) % 2147483648) // 65536,
       |        (xor(x1 // 65536, x1) * 73244475) % 2147483648)
       |      % 2147483648 AS seed
       |  FROM s1),
       |r AS (SELECT cents, seed, unnest(range(16)) AS rep FROM sd),
       |h AS (SELECT rep, cents,
       |    (((seed + rep * 97531) % 2147483648) * 1103515245 + 12345)
       |      % 2147483648 % 1000000 AS u
       |  FROM r),
       |w AS (SELECT rep, cents,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
       |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
       |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
       |         WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
       |         WHEN u < 999999 THEN 8 ELSE 9 END AS w
       |  FROM h),
       |m AS (SELECT rep,
       |    CAST((1000000 * sum(w * cents)) // sum(w) AS BIGINT) AS mm
       |  FROM w GROUP BY 1),
       |s AS (SELECT count(*) AS rn, sum(mm) AS s1,
       |    sum(CAST(mm AS HUGEINT) * mm) AS s2 FROM m),
       |g AS (SELECT CAST((1000000 * sum(cents)) // count(*) AS BIGINT)
       |    AS mean_microcents FROM b)
       |SELECT CAST(s.rn AS BIGINT) AS n_reps, g.mean_microcents,
       |  CAST(floor(sqrt(
       |    CAST(CAST(s.rn * s.s2 - s.s1 * s.s1 AS VARCHAR) AS DOUBLE)
       |    / (s.rn * (s.rn - 1)))) AS BIGINT) AS boot_se_micro
       |FROM s, g""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val wide = DecimalType(38, 0)
    val b = Tables.orders(s, d)
      .select(col("o_orderkey"),
        (money(col("o_totalprice")) * 100).cast("long").as("cents"))
    val r = b
      .select(col("cents"), expr("o_orderkey % 2147483648").as("x0"))
      .select(col("cents"),
        expr("((x0 div 65536) ^ x0) * 73244475 % 2147483648").as("x1"))
      .select(col("cents"),
        expr("((x1 div 65536) ^ x1) * 73244475 % 2147483648").as("x2"))
      .select(col("cents"),
        expr("((x2 div 65536) ^ x2) % 2147483648").as("seed"))
    val thresholds = Seq(367879L -> 0, 735759L -> 1, 919699L -> 2,
      981012L -> 3, 996340L -> 4, 999406L -> 5, 999917L -> 6,
      999990L -> 7, 999999L -> 8)
    // wide-buffer form (the vector_dim_corr rewrite): the 16 replicate
    // sums are 32 aggregate COLUMNS of one corpus pass — the exploded
    // (row × replicate) form measured dead-linear at 5.3 s/sf1 ·
    // 51 s/sf10, all of it row-generation; here no row is ever
    // replicated and the 16 draws are codegen integer math per row
    def uExpr(rep: Int) =
      expr(s"""(((seed + $rep * 97531) % 2147483648) * 1103515245
               + 12345) % 2147483648 % 1000000""")
    def drawExpr(rep: Int) = {
      val u = uExpr(rep)
      thresholds.tail.foldLeft(when(u < thresholds.head._1,
          thresholds.head._2)) {
        case (c, (t, k)) => c.when(u < t, k)
      }.otherwise(9)
    }
    val aggs = (0 until 16).flatMap { rep =>
      val w = drawExpr(rep)
      Seq(sum((w * col("cents")).cast(wide)).as(s"swc$rep"),
          sum(w).as(s"sw$rep"))
    }
    val wideRow = r.agg(aggs.head, aggs.tail: _*)
    val m = wideRow
      .select(explode(array((0 until 16).map(rep =>
        struct(lit(rep.toLong).as("rep"),
          expr(s"(1000000 * swc$rep) div sw$rep").cast("long").as("mm"))
      ): _*)).as("s"))
      .select(col("s.rep").as("rep"), col("s.mm").as("mm"))
    val st = m.agg(count(lit(1)).as("rn"),
      sum(col("mm")).cast(wide).as("s1"),
      sum(col("mm").cast(wide) * col("mm")).as("s2"))
    val g = b.agg(
      expr("(1000000 * cast(sum(cents) as decimal(38,0))) div count(*)")
        .cast("long").as("mean_microcents"))
    // the between-replicate numerator (~1e24) exceeds int64, so the
    // Spark `div` path would wrap its LONG quotient — the division runs
    // in DOUBLE instead, entered via the VARCHAR route (exact wide-int
    // → correctly-rounded strtod on both engines)
    st.crossJoin(broadcast(g))
      .select(col("rn").cast("long").as("n_reps"), col("mean_microcents"),
        floor(sqrt(expr("rn * s2 - s1 * s1").cast("string").cast("double")
          / (col("rn") * (col("rn") - 1)))).cast("long")
          .as("boot_se_micro"))
  }

  /** UNPIVOT (wide→long, the inverse of [[aggPivot]]): a per-status
    * priority-bucket revenue matrix melted back to (status, priority,
    * total) rows via `stack` — a generator projection, no shuffle beyond
    * the aggregation that built the wide frame. Buckets with no orders
    * stay as NULL totals (melting must not invent zeros). */
  val unpivotStack: Q = Q(
    "unpivot_stack",
    """WITH w AS (SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS u,
      |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS m,
      |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS l
      |FROM orders GROUP BY 1)
      |SELECT o_orderstatus, k AS priority, v AS total FROM (
      |  SELECT o_orderstatus, '1-URGENT' AS k, u AS v FROM w
      |  UNION ALL SELECT o_orderstatus, '3-MEDIUM', m FROM w
      |  UNION ALL SELECT o_orderstatus, '5-LOW', l FROM w)
      |ORDER BY o_orderstatus, priority""".stripMargin
  ) { (s, d) =>
    def bucket(p: String) =
      asDouble(sum(when(col("o_orderpriority") === p,
        money(col("o_totalprice")))))
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(bucket("1-URGENT").as("u"), bucket("3-MEDIUM").as("m"),
           bucket("5-LOW").as("l"))
      .select(col("o_orderstatus"),
        expr("stack(3, '1-URGENT', u, '3-MEDIUM', m, '5-LOW', l) " +
             "AS (priority, total)"))
  }

  /** Salted fact-fact JOIN as a driver-visible query: lineitem joined to
    * orders through [[graft.functions.SkewOps.saltedJoin]] (key spread
    * over 8 sub-keys, dimension replicated 8×), then rolled up per
    * priority. The oracle is the PLAIN join+rollup — salting must be
    * result-invariant, and the hash-compare proves it on real data, not
    * just the SkewOpsSpec fixture. This is the manual fallback for hot
    * keys AQE can't split (skew inside one aggregation input). */
  val joinSalted: Q = Q(
    "join_salted",
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  ) { (s, d) =>
    import graft.functions.SkewOps
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("jk"), col("l_linenumber"),
              col("l_extendedprice"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("jk"), col("o_orderpriority"))
    SkewOps.saltedJoin(li, o, "jk", 8, col("l_linenumber"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sumMoneyAsDouble(col("l_extendedprice")).as("revenue"))
  }

  /** ADVERSARIAL-skew salted join — [[joinSalted]] exercised on a
    * fixture where salting is load-bearing, not incidental: collapsing
    * every 5th part key makes ONE key own ~20% of lineitem rows, the
    * hot-key shape (an empty-string join key, a boilerplate shingle, a
    * dominant tenant) that turns a shuffle join into a single-straggler
    * stage. The salted plan spreads that key over 8 sub-keys;
    * SkewOpsSpec proves the ≥3× max-reducer-load cut on this exact
    * fixture using the same Murmur3 `hash()` the exchange partitions by,
    * while this query's oracle (the PLAIN DuckDB join on the identically
    * mapped keys) proves result-invariance on real data. The dimension
    * keeps one row per mapped key — the hot key stays one-to-many, so
    * salting changes distribution only, never multiplicity. */
  val joinSaltedHot: Q = Q(
    "join_salted_hot",
    """WITH f AS (SELECT
      |    CASE WHEN l_partkey % 5 = 0 THEN 0 ELSE l_partkey END AS jk,
      |    l_extendedprice FROM lineitem),
      |d AS (SELECT DISTINCT
      |    CASE WHEN p_partkey % 5 = 0 THEN 0 ELSE p_partkey END AS jk
      |  FROM part)
      |SELECT jk % 8 AS bucket, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM f JOIN d USING (jk)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import graft.functions.SkewOps
    val f = Tables.lineitem(s, d).select(
      when(col("l_partkey") % 5 === 0, lit(0L))
        .otherwise(col("l_partkey")).as("jk"),
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val dim = Tables.part(s, d).select(
      when(col("p_partkey") % 5 === 0, lit(0L))
        .otherwise(col("p_partkey")).as("jk"))
      .distinct()
    SkewOps.saltedJoin(f, dim, "jk", 8, col("l_orderkey"),
        col("l_linenumber"))
      .groupBy((col("jk") % 8).as("bucket"))
      .agg(count(lit(1)).as("n"),
           sumMoneyAsDouble(col("l_extendedprice")).as("revenue"))
  }

  /** Bloom-filter pre-filtered fact join (the explicit form of runtime
    * row-level filtering): a kilobyte bloom bitmap built from the
    * FILTERED dimension's keys prunes the fact side in a map-side
    * projection BEFORE the join's exchange, so only `match-rate + fpp`
    * of the fact table ever shuffles; the exact semi join above it
    * removes the false positives. This is the tool for the case
    * broadcast can't cover — a dimension whose hash relation is too big
    * for executor memory but whose KEY SET fits a bloom at 1% fpp
    * (~1.2 GB per 10⁹ keys vs ~30+ GB of hash relation). The probe is a
    * native codegen expression ([[graft.functions.expressions.BloomMightContain]])
    * — one virtual call inside whole-stage codegen, no UDF dispatch.
    * Oracle: the plain semi join — the bloom must be result-invariant,
    * and the hash compare proves it on real data. Eager: building the
    * bitmap runs the dim-side aggregate at plan-build time. */
  val joinBloom: Q = Q(
    "join_bloom",
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  ) { (s, d) =>
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // size the bitmap from the dim's real cardinality (one count job),
    // build it with the partial+final bloom aggregate, then ship it as a
    // torrent broadcast — executors fetch it once per JVM instead of
    // receiving a plan-embedded literal in every task (the difference
    // between kilobytes and gigabytes of per-task overhead at a
    // 10⁹-key dim)
    val bloom = dim.stat.bloomFilter(
      "c_custkey", math.max(dim.count(), 64L), 0.01)
    val bloomBc = s.sparkContext.broadcast(bloom)
    import org.apache.spark.sql.graft.Bridge
    val mightContain = Bridge.column(
      graft.functions.expressions.BloomMightContain(
        Bridge.expression(col("o_custkey")), bloomBc))
    Tables.orders(s, d)
      .filter(mightContain) // map-side prune below the join exchange
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           sumMoneyAsDouble(col("o_totalprice")).as("revenue"))
  }.copy(eager = true) // bitmap build runs dim count + aggregate jobs

  /** EXACT distinct counting via BITMAP OR-aggregation (the roaring /
    * bitmap-index shape) — the third point on the distinct-count design
    * spectrum alongside `agg_distinct` (exact, Expand-based) and
    * `agg_approx_distinct`/`agg_hll_union` (approximate, mergeable):
    * when the counted key lives in a BOUNDED integer domain (user ids,
    * enum dims), each 64-id block reduces to one BIGINT mask whose
    * bit_or partial states are tiny, exactly mergeable, and
    * shard-friendly — the popcount sum at the end is the EXACT distinct
    * count with no Expand blow-up and no sketch error. Two-level
    * partial+final: (type, block) masks first — each mask bounded at 32
    * bits by CONSTRUCTION regardless of row count (32-id blocks keep
    * the shift off the int64 sign bit, where DuckDB's checked `<<`
    * overflows) — then per-type popcount sums. A row costs one
    * shift+or; the exchange moves only (type × blocks) masks.
    * PropertiesSpec proves equality with countDistinct. */
  val aggBitmapDistinct: Q = Q(
    "agg_bitmap_distinct",
    """WITH m AS (SELECT event_type, user_id // 32 AS blk,
      |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS mask
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), expr("user_id div 32").as("blk"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
          .as("bit"))
      .groupBy("event_type", "blk")
      .agg(bit_or(col("bit")).as("mask"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_blocks"),
           sum(bit_count(col("mask"))).as("n_users"))
  }

  /** Per-group ordinary least squares (SURVEY §2.5 extension): slope /
    * intercept / r² of extendedprice on quantity per returnflag — the
    * "trend per key" primitive (drift slopes, per-source quality trends,
    * scaling-law fits over training runs). Both engines HAVE streaming
    * `regr_*` aggregates, but their float accumulation order is
    * engine- and partition-dependent; this derives the same statistics
    * from EXACT integer sums in CENT units (Σx, Σy, Σxy, Σx², Σy² —
    * the [[aggStats]] discipline, sharpened: a DECIMAL with fractional
    * scale above 2⁵³ converts to double DIFFERENTLY per engine (int128
    * → double → ÷10ˢ is two roundings; BigDecimal rounds once), while
    * an INTEGER-valued sum converts correctly-rounded in both), then
    * combines in double through an IDENTICAL expression tree on both
    * sides. Deterministic at any parallelism: one partial+final
    * aggregate, five narrow sums, no second pass. Slope/r² are
    * scale-invariant in the cent units; the intercept divides back by
    * 100 at the end. */
  val aggRegression: Q = Q(
    "agg_regression",
    """WITH c AS (SELECT l_returnflag,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yi
      |  FROM lineitem),
      |s AS (SELECT l_returnflag, count(*) AS n,
      |  CAST(SUM(xi) AS DOUBLE) AS sx, CAST(SUM(yi) AS DOUBLE) AS sy,
      |  CAST(SUM(CAST(xi AS DECIMAL(19,0)) * CAST(yi AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
      |  CAST(SUM(CAST(xi AS DECIMAL(19,0)) * CAST(xi AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
      |  CAST(SUM(CAST(yi AS DECIMAL(19,0)) * CAST(yi AS DECIMAL(19,0))) AS DOUBLE) AS syy
      |  FROM c GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
      |  ((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n) / 100 AS intercept,
      |  ((n*sxy - sx*sy) * (n*sxy - sx*sy)) / ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS r2
      |FROM s ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val st = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        (money(col("l_quantity")) * 100).cast("long").as("xi"),
        (money(col("l_extendedprice")) * 100).cast("long").as("yi"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           asDouble(sum(col("xi"))).as("sx"),
           asDouble(sum(col("yi"))).as("sy"),
           asDouble(sum(col("xi").cast(dec19) * col("yi").cast(dec19)))
             .as("sxy"),
           asDouble(sum(col("xi").cast(dec19) * col("xi").cast(dec19)))
             .as("sxx"),
           asDouble(sum(col("yi").cast(dec19) * col("yi").cast(dec19)))
             .as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    st.select(col("l_returnflag"), col("n"),
        slope.as("slope"),
        (((col("sy") - slope * col("sx")) / col("n")) / 100).as("intercept"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) *
         (col("n") * col("sxy") - col("sx") * col("sy")) /
         ((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** Pareto frontier / skyline operator (SURVEY §2.7 extension): per
    * nation, the suppliers not dominated on (total cost ASC better,
    * total quantity DESC better) — multi-objective selection (the
    * cost/quality frontier a data-mixing or vendor-selection pass
    * optimizes over). The naive semantics is the O(n²) dominance
    * anti-join; this plan is the O(n log n) sweep expressed in TWO
    * partitioned windows over the AGGREGATED table: (1) per (nation,
    * cost) the max qty — same-cost dominance; (2) over DISTINCT costs
    * per nation, the running max qty of STRICTLY cheaper costs (ROWS
    * frame on the distinct-cost table makes "strictly cheaper" exact —
    * no RANGE-frame numeric-offset trick needed). A supplier survives
    * iff it holds its cost group's max AND beats every cheaper group's
    * max. All windows are partitioned by nation (no global funnel; at
    * 100 TB the frontier of each group computes independently). The
    * ORACLE is the quadratic NOT EXISTS dominance query — a genuinely
    * different algorithm, so the hash match proves the sweep correct
    * rather than re-deriving it. */
  val skylinePareto: Q = Q(
    "skyline_pareto",
    """WITH s AS (SELECT n_name, s_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS cost,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |                JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name, s_suppkey)
      |SELECT n_name, s_suppkey, cost, qty FROM s a
      |WHERE NOT EXISTS (SELECT 1 FROM s b WHERE b.n_name = a.n_name
      |  AND b.cost <= a.cost AND b.qty >= a.qty
      |  AND (b.cost < a.cost OR b.qty > a.qty))
      |ORDER BY n_name, s_suppkey""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val sup = broadcast(Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")))
    val agg = Tables.lineitem(s, d)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name", "s_suppkey")
      .agg(sumMoneyAsDouble(col("l_extendedprice")).as("cost"),
           sumMoneyAsDouble(col("l_quantity")).as("qty"))
    // (1) same-cost dominance: max qty within each (nation, cost)
    val gq = max(col("qty")).over(Window.partitionBy("n_name", "cost"))
    // (2) strictly-cheaper dominance: running max over DISTINCT costs
    val g = agg.groupBy("n_name", "cost").agg(max(col("qty")).as("cmax"))
      .withColumn("prevmax", max(col("cmax")).over(
        Window.partitionBy("n_name").orderBy("cost")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("n_name"), col("cost"), col("prevmax"))
    agg.withColumn("gq", gq)
      .join(g, Seq("n_name", "cost"))
      .filter(col("qty") === col("gq") &&
              (col("prevmax").isNull || col("qty") > col("prevmax")))
      .select(col("n_name"), col("s_suppkey"), col("cost"), col("qty"))
  }

  /** Fuzzy join / entity resolution (SURVEY §2.3 extension): customer
    * names within edit distance 1 of each other, found WITHOUT an
    * all-pairs compare. Blocking is the deletion-neighborhood (masked
    * key) technique: each 9-digit name suffix emits 9 keys, one per
    * position with that position wildcarded; two equal-length names at
    * Hamming distance 1 share EXACTLY the key masked at their one
    * differing position — so blocking is EXACT (zero false negatives,
    * pigeonhole) and each true pair surfaces EXACTLY ONCE (no dedup
    * exchange needed — the property that makes this shape cheap). Block
    * sizes are bounded by the alphabet (≤10 names share a masked key),
    * so the candidate join is linear in n regardless of corpus size —
    * the same reason [[graft.operators.Dedup]] bands signatures. The
    * levenshtein verify stage then confirms each candidate (the standard
    * ER block→verify shape; here verification is provably total but the
    * stage is kept to pin the semantics the oracle checks). Output: the
    * pair census by differing digit position. */
  val joinFuzzy: Q = Q(
    "join_fuzzy",
    """WITH d AS (SELECT c_custkey, substr(c_name, 10) AS dig FROM customer),
      |k AS (SELECT c_custkey, dig, i,
      |        substr(dig, 1, i) || '_' || substr(dig, i + 2) AS masked
      |      FROM d CROSS JOIN (SELECT unnest(range(9)) AS i)),
      |p AS (SELECT a.i AS pos
      |      FROM k a JOIN k b ON a.i = b.i AND a.masked = b.masked
      |        AND a.c_custkey < b.c_custkey
      |      WHERE levenshtein(a.dig, b.dig) = 1)
      |SELECT pos, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM p GROUP BY pos ORDER BY pos""".stripMargin
  ) { (s, d) =>
    val dig = Tables.customer(s, d)
      .select(col("c_custkey"), substring(col("c_name"), 10, 9).as("dig"))
    val keyed = dig.select(col("c_custkey"), col("dig"),
      explode(array((0 until 9).map { i =>
        struct(lit(i).as("pos"),
          concat(substring(col("dig"), 1, i), lit("_"),
                 substring(col("dig"), i + 2, 9 - i - 1)).as("masked"))
      }: _*)).as("k"))
      .select(col("c_custkey"), col("dig"),
              col("k.pos").as("pos"), col("k.masked").as("masked"))
    val b = keyed.select(col("c_custkey").as("ck_b"), col("dig").as("dig_b"),
                         col("pos"), col("masked"))
    keyed.join(b, Seq("pos", "masked"))
      .filter(col("c_custkey") < col("ck_b"))
      .filter(levenshtein(col("dig"), col("dig_b")) === 1)
      .groupBy("pos")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Materialized-view maintenance (the incremental-rollup shape a
    * warehouse runs nightly): the standing aggregate state (history
    * before the delta day) MERGES with the delta day's partial state —
    * counts add, DECIMAL sums add exactly, maxes max — instead of
    * re-aggregating raw history. The oracle is the full one-pass
    * recompute, so the hash match proves state-merge = recompute, which
    * is precisely the mergeability contract that lets 100 TB of history
    * stay aggregated while only the new partition is scanned. (The
    * sketch family — [[aggHllUnion]], theta, bitmap — gives the same
    * merge story for approximate state; this is the exact-state
    * variant.) Both branches scan `events` with partition-prunable
    * timestamp predicates pushed to parquet. */
  val aggIncremental: Q = Q(
    "agg_incremental",
    """WITH f AS (SELECT event_type,
      |    ts >= TIMESTAMP '2024-01-29 00:00:00' AS is_delta,
      |    count(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv,
      |    max(ts) AS mx
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(COALESCE(sum(n) FILTER (WHERE is_delta), 0) AS BIGINT) AS n_from_delta,
      |  CAST(sum(sv) AS DOUBLE) AS sum_value,
      |  max(mx) AS last_ts
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val cut = lit("2024-01-29 00:00:00").cast("timestamp")
    val ev = Tables.events(s, d)
    // standing state and delta state aggregated SEPARATELY (in
    // production the standing side is a stored table, not a scan), then
    // merged state-to-state
    // the mergeable money state rides LONG cents end to end (the
    // Tables.sumExactAsDouble discipline, state-to-state mergeable)
    def state(df: DataFrame, isDelta: Boolean) = df
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum((money(col("value")) * 100).cast("long")).as("sv"),
           max(col("ts")).as("mx"))
      .withColumn("is_delta", lit(isDelta))
    state(ev.filter(col("ts") < cut), isDelta = false)
      .unionAll(state(ev.filter(col("ts") >= cut), isDelta = true))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"),
        coalesce(sum(when(col("is_delta"), col("n"))), lit(0L))
          .as("n_from_delta"),
        (sum(col("sv"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / 100)
          .cast("double").as("sum_value"),
        max(col("mx")).as("last_ts"))
  }

  /** INTERVAL × INTERVAL OVERLAP JOIN — the missing member of the
    * temporal-join family ([[joinRange]] is point-in-range,
    * [[joinIntervalBin]] is interval-vs-FIXED-grid; this is two interval
    * SETS, both derived from data): user activity sessions overlapped
    * with error-incident windows — "whose sessions were exposed to which
    * outages, and for how long?". Neither side is assumed broadcastable;
    * the scalable shape is the BIN-REPLICATION equi join: each interval
    * replicates to the 1-hour bins it touches, the join keys on the bin,
    * and each qualifying pair is counted EXACTLY ONCE by the standard
    * guard `bin == floor(max(start_a, start_b) / W)` — the bin where the
    * overlap begins. Replication factor = interval span / W (sessions
    * span minutes, incidents span minutes-to-hours ⇒ ~1), and the join
    * fan-out per bin is bounded by per-bin interval counts, never
    * |A|×|B|.
    *
    * Determinism: all epoch-ms integers; overlap length is exact; the
    * census keys on the overlap-start day. The only unpartitioned window
    * is the gaps-islands merge over ERROR MINUTES — calendar-bounded
    * (≤ 44640 rows/month), the [[graft.operators.TimeSeries]] series
    * discipline. */
  val joinIntervalOverlap: Q = Q(
    "join_interval_overlap",
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
      |em AS (SELECT DISTINCT epoch_ms(ts) // 60000 AS mnt FROM events
      |       WHERE event_type = 'error'),
      |gi AS (SELECT mnt, mnt - row_number() OVER (ORDER BY mnt) AS grp
      |       FROM em),
      |inc AS (SELECT min(mnt) * 60000 AS bs,
      |               (max(mnt) + 1) * 60000 - 1 AS be
      |        FROM gi GROUP BY grp),
      |sb AS (SELECT user_id, st, en,
      |    unnest(generate_series(st // 3600000, en // 3600000)) AS bin
      |  FROM sess),
      |ib AS (SELECT bs, be,
      |    unnest(generate_series(bs // 3600000, be // 3600000)) AS bin
      |  FROM inc),
      |ov AS (SELECT greatest(sb.st, ib.bs) AS os,
      |              least(sb.en, ib.be) AS oe
      |  FROM sb JOIN ib USING (bin)
      |  WHERE sb.st <= ib.be AND ib.bs <= sb.en
      |    AND bin = greatest(sb.st, ib.bs) // 3600000)
      |SELECT DATE '1970-01-01' + CAST(os // 86400000 AS INT) AS day,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(oe - os + 1) AS BIGINT) AS overlap_ms
      |FROM ov GROUP BY 1 ORDER BY day""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wMs = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Long.MinValue, 0)
    val sess = ev
      .select(col("user_id"), col("ts"), col("event_id"),
              unix_millis(col("ts")).as("ms"))
      .withColumn("brk",
        when(col("ms") - lag(col("ms"), 1).over(w) > 300000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(wMs))
      .groupBy("user_id", "sid")
      .agg(min(col("ms")).as("st"), max(col("ms")).as("en"))
    val inc = ev.filter(col("event_type") === "error")
      .select(expr("unix_millis(ts) DIV 60000").as("mnt"))
      .distinct()
      .withColumn("grp",
        col("mnt") - row_number().over(Window.orderBy("mnt")))
      .groupBy("grp")
      .agg((min(col("mnt")) * 60000L).as("bs"),
           ((max(col("mnt")) + 1) * 60000L - 1).as("be"))
    val sb = sess.select(col("st"), col("en"),
      explode(sequence(expr("st DIV 3600000"), expr("en DIV 3600000")))
        .as("bin"))
    val ib = inc.select(col("bs"), col("be"),
      explode(sequence(expr("bs DIV 3600000"), expr("be DIV 3600000")))
        .as("bin"))
    sb.join(ib, Seq("bin"))
      .filter(col("st") <= col("be") && col("bs") <= col("en") &&
        col("bin") === expr("greatest(st, bs) DIV 3600000"))
      .select(greatest(col("st"), col("bs")).as("os"),
              least(col("en"), col("be")).as("oe"))
      .groupBy(date_add(lit("1970-01-01").cast("date"),
                 expr("os DIV 86400000").cast("int")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(col("oe") - col("os") + 1).as("overlap_ms"))
  }

  /** GINI CONCENTRATION of order value per priority class — the
    * inequality/concentration audit (revenue concentration, partition
    * skew, hot-key risk all read off the same number): G = (2·Σᵢ i·x₍ᵢ₎
    * − (n+1)·Σx) / (n·Σx) over the value-sorted sequence. EXACT until
    * the final division: values in integer cents, ranks from a
    * group-keyed row_number, every product and sum a BIGINT — and the
    * formula is tie-order-invariant (swapping equal values across ranks
    * leaves Σ i·x unchanged), so no tie-break column is even needed for
    * determinism; one is added anyway to keep the sort total.
    *
    * Scale posture: ONE priority-keyed exchange carries the rank window
    * and the partial+final aggregate; frames are per-class. Σ i·x is
    * accumulated WIDE on both engines — Spark DECIMAL(38,0), DuckDB
    * HUGEINT — because the int64 ceiling for that sum arrives at only
    * ~10⁶ rows per class at these cent magnitudes (i·c ~ rank·5·10⁷);
    * the final 2·six − (n+1)·sx numerator is likewise computed wide and
    * converted to double ONCE (both engines correctly-rounded from an
    * exact integer value). The cents conversion rounds EXPLICITLY
    * (round-then-cast on both sides) so the decimal→long step never
    * relies on Spark-truncate ≡ DuckDB-round holding only for integral
    * inputs. The rank itself at extreme scale recurses two-level exactly
    * like [[graft.operators.Corpus.corpusPack]]'s prefix sum. */
  val aggGini: Q = Q(
    "agg_gini",
    """WITH x AS (SELECT o_orderpriority AS pri,
      |    CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
      |      AS BIGINT) AS c,
      |    o_orderkey
      |  FROM orders),
      |r AS (SELECT pri, c,
      |    row_number() OVER (PARTITION BY pri ORDER BY c, o_orderkey) AS i
      |  FROM x),
      |s AS (SELECT pri, count(*) AS n,
      |    CAST(sum(c) AS BIGINT) AS sx,
      |    sum(CAST(i AS HUGEINT) * c) AS six
      |  FROM r GROUP BY 1)
      |SELECT pri AS priority, CAST(n AS BIGINT) AS n_orders, sx AS sum_cents,
      |  CAST(2 * six - (CAST(n AS HUGEINT) + 1) * CAST(sx AS HUGEINT)
      |       AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * sx) AS gini
      |FROM s ORDER BY priority""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val c = round(col("o_totalprice").cast(DecimalType(18, 2)) * 100, 0)
      .cast("long")
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), c.as("c"), col("o_orderkey"))
      .withColumn("i", row_number().over(
        Window.partitionBy("pri").orderBy(asc("c"), asc("o_orderkey"))))
      .groupBy("pri")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
           sum(col("i").cast(dec38) * col("c")).as("six"))
      .select(col("pri").as("priority"), col("n").as("n_orders"),
        col("sx").as("sum_cents"),
        ((lit(2) * col("six") -
            (col("n") + 1).cast(dec38) * col("sx").cast(dec38))
           .cast("double") /
          (col("n").cast("double") * col("sx"))).as("gini"))
  }

  /** MARKET-BASKET ASSOCIATION RULES — support / confidence / lift over
    * parts co-ordered in the same order (Agrawal-Srikant shape, the
    * recommender/affinity primitive): for each unordered part pair with
    * support ≥ 2, both directed confidences and the symmetric lift,
    * top-20 by lift. [[graft.operators.Pipeline.graphJaccard]] asks "are
    * these nodes' neighborhoods similar?"; this asks the RULE question —
    * "does buying a make buying b more likely than chance?" — a
    * different functional over a different (order-keyed) co-occurrence.
    *
    * Scale posture: baskets are tiny (≤ 7 lineitems per order), so the
    * pair generator is a self-join KEYED BY ORDER with per-key fan-out
    * ≤ |basket|² — never a corpus-wide product; pair/item counts are
    * partial+final aggregates; item counts join back by part key. The
    * n_orders scalar broadcasts. Determinism: all counts exact BIGINT,
    * each ratio ONE double division, lift's two divisions in a fixed
    * written order, top-20 total-ordered.
    */
  val marketBasket: Q = Q(
    "market_basket",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |           FROM lineitem),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
      |ic AS (SELECT pk, count(*) AS c FROM b GROUP BY 1),
      |pr AS (SELECT a.pk AS pa, bb.pk AS pb, count(*) AS sup
      |       FROM b a JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pr.pa, pr.pb, CAST(pr.sup AS BIGINT) AS support,
      |  CAST(ia.c AS BIGINT) AS n_a, CAST(ib.c AS BIGINT) AS n_b,
      |  CAST(pr.sup AS DOUBLE) / ia.c AS conf_a_b,
      |  CAST(pr.sup AS DOUBLE) / ib.c AS conf_b_a,
      |  (CAST(pr.sup AS DOUBLE) / ia.c)
      |    / (CAST(ib.c AS DOUBLE) / (SELECT n_orders FROM n)) AS lift
      |FROM pr JOIN ic ia ON pr.pa = ia.pk JOIN ic ib ON pr.pb = ib.pk
      |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin
  ) { (s, d) =>
    // r11 opt (guide §2.4, the graph_jaccard shape): ONE order-keyed
    // collect_set aggregate replaces the (ok, pk)-distinct frame the old
    // plan evaluated FOUR times (n, ic, both self-join sides — 5
    // lineitem scans, 5 exchanges, zero reuse in the before plan). The
    // set IS the distinct, partial sets shrink the exchange map-side,
    // pairs stream from the sorted basket through the native
    // OrderedPairs generator (pa < pb ≡ the a.pk < b.pk self-join); the
    // item counts / basket count re-derive from the same (cheaper)
    // aggregate — measured -25% warm with identical output.
    val sets = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(array_sort(collect_set(struct(col("l_partkey").as("pk"))))
        .as("parts"))
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("parts"))))
    }
    val n = sets.agg(count(lit(1)).as("n_orders"))
    val ic = sets.select(explode(col("parts")).as("e"))
      .groupBy(col("e.pk").as("pk")).agg(count(lit(1)).as("c"))
    val pr = sets
      .select(pairGen.as(Seq("pa", "pb")))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
    pr.join(ic.select(col("pk").as("pa"), col("c").as("ca")), Seq("pa"))
      .join(ic.select(col("pk").as("pb"), col("c").as("cb")), Seq("pb"))
      .crossJoin(broadcast(n))
      .select(col("pa"), col("pb"), col("sup").as("support"),
        col("ca").as("n_a"), col("cb").as("n_b"),
        (col("sup").cast("double") / col("ca")).as("conf_a_b"),
        (col("sup").cast("double") / col("cb")).as("conf_b_a"),
        ((col("sup").cast("double") / col("ca")) /
          (col("cb").cast("double") / col("n_orders"))).as("lift"))
      .orderBy(desc("lift"), asc("pa"), asc("pb")).limit(20)
  }

  /** HIGHER-MOMENT shape statistics — population skewness g1 and excess
    * kurtosis g2 of l_quantity per return flag, the distribution-shape
    * census behind [[outlierZscore]]'s symmetric-tails assumption and
    * [[aggHistogram]]'s bucet choice. Built from raw integer power sums
    * rather than the engines' built-in `skewness`/`kurtosis` (whose
    * sample-correction conventions differ across engines — the same
    * reason [[aggStats]] pins its own stddev form).
    *
    * Determinism: l_quantity is integral in this schema (DECIMAL(15,2)
    * with .00 fraction), and the decimal→long step ROUNDS EXPLICITLY on
    * both engines (round-then-cast) rather than relying on
    * Spark-truncate ≡ DuckDB-round agreeing only on integral inputs, so
    * all four power sums are exact BIGINTs under partial+final
    * aggregation in any order (q ≤ 50 ⇒ Σq⁴ < 2⁶³ until ~10¹² rows);
    * every double then comes from ONE shared, fully-parenthesized
    * op sequence over exact-int casts — correctly-rounded and identical
    * both engines, the [[TimeSeries]] discipline.
    *
    * Scale posture: a single partial+final hash aggregate over a
    * 2-column scan; output is |flags| rows. At the row counts where Σq⁴
    * approaches 2⁶³ the sums move to DECIMAL(38,0) — noted, not needed
    * at any benchable scale. */
  val aggMoments: Q = Q(
    "agg_moments",
    """WITH s AS (SELECT l_returnflag,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT))
      |      AS BIGINT) AS s2,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)
      |           * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s3,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)
      |           * CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT))
      |      AS BIGINT) AS s4
      |  FROM lineitem GROUP BY 1),
      |m AS (SELECT l_returnflag, n, s1,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS ex2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS ex3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS ex4
      |  FROM s),
      |c AS (SELECT l_returnflag, n, s1, mean,
      |    ex2 - mean * mean AS m2,
      |    ex3 - 3 * mean * ex2 + 2 * mean * mean * mean AS m3,
      |    ex4 - 4 * mean * ex3 + 6 * mean * mean * ex2
      |        - 3 * mean * mean * mean * mean AS m4
      |  FROM m)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |  CAST(s1 AS BIGINT) AS sum_qty, mean,
      |  m3 / nullif(m2 * sqrt(m2), 0) AS skewness,
      |  m4 / nullif(m2 * m2, 0) - 3 AS kurtosis_excess
      |FROM c ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val q = round(col("l_quantity"), 0).cast("long")
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("s1"), sum(q * q).as("s2"),
           sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
      .select(col("l_returnflag"), col("n"), col("s1"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        (col("s2").cast("double") / col("n").cast("double")).as("ex2"),
        (col("s3").cast("double") / col("n").cast("double")).as("ex3"),
        (col("s4").cast("double") / col("n").cast("double")).as("ex4"))
      .select(col("l_returnflag"), col("n"), col("s1"), col("mean"),
        (col("ex2") - col("mean") * col("mean")).as("m2"),
        (col("ex3") - lit(3) * col("mean") * col("ex2")
          + lit(2) * col("mean") * col("mean") * col("mean")).as("m3"),
        (col("ex4") - lit(4) * col("mean") * col("ex3")
          + lit(6) * col("mean") * col("mean") * col("ex2")
          - lit(3) * col("mean") * col("mean") * col("mean") * col("mean"))
          .as("m4"))
      .select(col("l_returnflag"), col("n").as("n_rows"),
        col("s1").as("sum_qty"), col("mean"),
        (col("m3") / expr("nullif(m2 * sqrt(m2), 0)")).as("skewness"),
        (col("m4") / expr("nullif(m2 * m2, 0)") - lit(3))
          .as("kurtosis_excess"))
  }

  /** RFM CUSTOMER SEGMENTATION — the classic warehouse marketing
    * census: per customer, Recency (days since last order, vs the
    * corpus max date), Frequency (order count) and Monetary (exact cent
    * total through the [[Tables]] money discipline), each scored 1–5
    * against the customer population's interpolated quintile
    * breakpoints, rolled up to the RFM cells with a champions/loyal/
    * at-risk/hibernating label.
    *
    * Parity discipline: R/F/M are exact integers (the recency day diff
    * is the [[scalarDatetimeExt]] date_diff twin); breakpoints use
    * `percentile` ≡ `quantile_cont` (the long-green [[aggQuantile]]
    * pairing — interpolation over exact integers is shared IEEE
    * arithmetic); scores are mirrored CASE chains over those doubles;
    * the cell rollup is exact counts and cent sums.
    *
    * Plan: one customer-keyed partial+final aggregate (the corpus
    * stage), ONE 1-row exact-percentile aggregate over the customer
    * frame broadcast back (at 100 TB swap in approx_percentile — same
    * plan shape, sketch mergeable), then a ≤125-cell rollup. */
  val rfmSegmentation: Q = Q(
    "rfm_segmentation",
    """WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
      |u AS (SELECT o_custkey,
      |    date_diff('day', max(o_orderdate), (SELECT mx FROM mx)) AS r,
      |    CAST(count(*) AS BIGINT) AS f,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS m
      |  FROM orders GROUP BY 1),
      |bp AS (SELECT
      |    quantile_cont(r, 0.2) AS r20, quantile_cont(r, 0.4) AS r40,
      |    quantile_cont(r, 0.6) AS r60, quantile_cont(r, 0.8) AS r80,
      |    quantile_cont(f, 0.2) AS f20, quantile_cont(f, 0.4) AS f40,
      |    quantile_cont(f, 0.6) AS f60, quantile_cont(f, 0.8) AS f80,
      |    quantile_cont(m, 0.2) AS m20, quantile_cont(m, 0.4) AS m40,
      |    quantile_cont(m, 0.6) AS m60, quantile_cont(m, 0.8) AS m80
      |  FROM u),
      |sc AS (SELECT o_custkey, m,
      |    CASE WHEN r <= r20 THEN 5 WHEN r <= r40 THEN 4
      |         WHEN r <= r60 THEN 3 WHEN r <= r80 THEN 2 ELSE 1 END
      |      AS r_score,
      |    CASE WHEN f <= f20 THEN 1 WHEN f <= f40 THEN 2
      |         WHEN f <= f60 THEN 3 WHEN f <= f80 THEN 4 ELSE 5 END
      |      AS f_score,
      |    CASE WHEN m <= m20 THEN 1 WHEN m <= m40 THEN 2
      |         WHEN m <= m60 THEN 3 WHEN m <= m80 THEN 4 ELSE 5 END
      |      AS m_score
      |  FROM u CROSS JOIN bp)
      |SELECT r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |         THEN 'champion'
      |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
      |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |       ELSE 'other' END AS segment,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(m) AS BIGINT) AS monetary_cents
      |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  ) { (s, d) =>
    val mx = Tables.orders(s, d).agg(max(col("o_orderdate")).as("mx"))
    val u = Tables.orders(s, d).crossJoin(broadcast(mx))
      .groupBy("o_custkey")
      .agg(min(datediff(col("mx"), col("o_orderdate"))).as("r"),
        count(lit(1)).as("f"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("m"))
    val bp = u.agg(
      expr("percentile(r, 0.2)").as("r20"), expr("percentile(r, 0.4)").as("r40"),
      expr("percentile(r, 0.6)").as("r60"), expr("percentile(r, 0.8)").as("r80"),
      expr("percentile(f, 0.2)").as("f20"), expr("percentile(f, 0.4)").as("f40"),
      expr("percentile(f, 0.6)").as("f60"), expr("percentile(f, 0.8)").as("f80"),
      expr("percentile(m, 0.2)").as("m20"), expr("percentile(m, 0.4)").as("m40"),
      expr("percentile(m, 0.6)").as("m60"), expr("percentile(m, 0.8)").as("m80"))
    def score(v: Column, b: Seq[String], asc: Boolean): Column = {
      val s1 = when(v <= col(b(0)), if (asc) 1 else 5)
        .when(v <= col(b(1)), if (asc) 2 else 4)
        .when(v <= col(b(2)), 3)
        .when(v <= col(b(3)), if (asc) 4 else 2)
        .otherwise(if (asc) 5 else 1)
      s1
    }
    val sc = u.crossJoin(broadcast(bp))
      .select(col("m"),
        score(col("r"), Seq("r20", "r40", "r60", "r80"), asc = false)
          .as("r_score"),
        score(col("f"), Seq("f20", "f40", "f60", "f80"), asc = true)
          .as("f_score"),
        score(col("m"), Seq("m20", "m40", "m60", "m80"), asc = true)
          .as("m_score"))
    sc.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m")).cast("long").as("monetary_cents"))
      .select(col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
             col("m_score") >= 4, "champion")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("other").as("segment"),
        col("n_customers"), col("monetary_cents"))
  }

  /** HERFINDAHL–HIRSCHMAN concentration index per nation — the classic
    * market-concentration readout next to [[aggGini]]'s inequality
    * curve: each supplier's revenue share within its nation, squared
    * and summed — 10⁶ micro for a monopoly, →0 for atomized supply —
    * with the antitrust-convention flags (HHI > 0.25 concentrated,
    * > 0.15 moderately). The procurement-risk question ("is this
    * nation's supply one failure away from an outage?") read straight
    * off a table.
    *
    * Parity discipline: pure integer — DECIMAL(18,2) cents, shares as
    * ppm floor DIVs of exact sums (the deterministic mass-floor both
    * engines replay), HHI = Σ share_ppm² // 10⁶; the flags compare
    * integers.
    *
    * Plan: one lineitem pass joined to the broadcast supplier dim, one
    * (nation, supplier) partial+final aggregate; the nation total rides
    * a window over the supplier-domain frame (post-aggregate, bounded)
    * and the rollup is per-nation. */
  val aggHhi: Q = Q(
    "agg_hhi",
    """WITH r AS (SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
      |    CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
      |                  AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |w AS (SELECT nk, sk, cents,
      |    CAST(sum(cents) OVER (PARTITION BY nk) AS BIGINT) AS tot
      |  FROM r),
      |p AS (SELECT nk, (1000000 * cents) // tot AS share_ppm FROM w)
      |SELECT nk AS nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_micro,
      |  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) > 250000
      |    AS concentrated,
      |  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) > 150000
      |    AS moderate
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val r = Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        (Tables.money(col("l_extendedprice")) * 100).cast("long")
          .as("cents0"))
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nk"), col("l_suppkey").as("sk"))
      .agg(sum(col("cents0")).cast("long").as("cents"))
    val p = r.withColumn("tot",
        sum(col("cents")).over(Window.partitionBy("nk")).cast("long"))
      .select(col("nk"), expr("(1000000 * cents) div tot").as("share_ppm"))
    p.groupBy(col("nk").as("nationkey"))
      .agg(count(lit(1)).cast("long").as("n_suppliers"),
        expr("CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)")
          .as("hhi_micro"))
      .select(col("nationkey"), col("n_suppliers"), col("hhi_micro"),
        (col("hhi_micro") > 250000L).as("concentrated"),
        (col("hhi_micro") > 150000L).as("moderate"))
  }

  /** HEAVY-CHANGE DETECTION (the "deltoids" question — Cormode &
    * Muthukrishnan's *What's new?*): which keys CHANGED frequency most
    * between two periods, the monitoring query behind traffic-shift,
    * canary and abuse dashboards. The drift family (`dq_drift_*`)
    * answers "did the distribution move"; this answers WHICH keys moved,
    * ranked. Key = (event_type, props.k), periods split on the
    * [[graft.operators.Pipeline]] drift date; output = top 10 movers by
    * absolute delta with both period counts and the signed delta.
    *
    * Exactness: counts are exact BIGINTs, the ranking key
    * (|Δ| DESC, event_type, k) is a total order, so the cut is
    * bit-deterministic. Plan: ONE corpus pass to a (type, k)-keyed
    * partial+final aggregate with the period split riding as
    * conditional counts (no join between periods, no second scan),
    * then a TakeOrderedAndProject at k=10 — the heavy-hitters shape
    * pointed at deltas. At 100 TB the aggregate output is bounded by
    * the key domain, not the corpus. */
  val aggHeavyChange: Q = Q(
    "agg_heavy_change",
    """WITH e AS (SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS p
      |  FROM events),
      |c AS (SELECT event_type, k,
      |    CAST(count(CASE WHEN p = 0 THEN 1 END) AS BIGINT) AS n_before,
      |    CAST(count(CASE WHEN p = 1 THEN 1 END) AS BIGINT) AS n_after
      |  FROM e GROUP BY 1, 2)
      |SELECT event_type, k, n_before, n_after,
      |  n_after - n_before AS delta
      |FROM c
      |ORDER BY abs(n_after - n_before) DESC, event_type, k
      |LIMIT 10""".stripMargin
  ) { (s, d) =>
    // session-UTC cast, the driftCounts split discipline (a JVM-local
    // Timestamp literal would follow the default zone, not the session)
    val split = lit("2024-01-16").cast("timestamp")
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        when(col("ts") < split, 0).otherwise(1).as("p"))
      .groupBy("event_type", "k")
      .agg(count(when(col("p") === 0, 1)).as("n_before"),
           count(when(col("p") === 1, 1)).as("n_after"))
      .select(col("event_type"), col("k"), col("n_before"), col("n_after"),
        (col("n_after") - col("n_before")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("event_type"), col("k"))
      .limit(10)
  }

  /** CONTRIBUTION BOUNDING — the differential-privacy PRE-AGGREGATION
    * step (and the abuse-robustness cap behind rate-limited metrics):
    * before a per-type total can carry a DP noise budget, each user's
    * contribution must be capped to C events (here C = 8, keeping each
    * user's FIRST eight by time — the deterministic keep rule a
    * replayable pipeline needs). The query audits what the cap costs:
    * raw vs capped event counts and cent totals, how many users hit
    * the cap, and the clipping loss in ppm — the number that picks C.
    *
    * Exactness: money through the DECIMAL(18,2)→cents BIGINT route
    * (the [[graft.Tables.money]] discipline), the keep rule ranks on
    * the provably-total (ts, event_id) chain, loss is floor-DIV ppm on
    * nonnegative integers. Plan: ONE (user, type)-keyed exchange — the
    * rank window — then a type-keyed partial+final aggregate with the
    * user-cap census riding a distinct-user conditional count; nothing
    * after the window exceeds the type domain. */
  val aggContributionBound: Q = Q(
    "agg_contribution_bound",
    """WITH r AS (SELECT event_type, user_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY event_type, user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |u AS (SELECT event_type, user_id, count(*) AS n_u,
      |    CAST(sum(cents) AS BIGINT) AS cents_u,
      |    CAST(sum(CASE WHEN rn <= 8 THEN cents ELSE 0 END) AS BIGINT)
      |      AS kept_cents_u,
      |    CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS kept_u
      |  FROM r GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(n_u) AS BIGINT) AS n_events,
      |  CAST(sum(kept_u) AS BIGINT) AS n_kept,
      |  CAST(count(CASE WHEN n_u > 8 THEN 1 END) AS BIGINT)
      |    AS n_users_capped,
      |  CAST(sum(cents_u) AS BIGINT) AS raw_cents,
      |  CAST(sum(kept_cents_u) AS BIGINT) AS kept_cents,
      |  CAST((1000000 * (sum(cents_u) - sum(kept_cents_u)))
      |       // nullif(sum(cents_u), 0) AS BIGINT) AS clip_loss_ppm
      |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy("ts", "event_id")
    val r = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
    val u = r.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_u"),
        sum(col("cents")).cast("long").as("cents_u"),
        sum(when(col("rn") <= 8, col("cents")).otherwise(0L))
          .cast("long").as("kept_cents_u"),
        sum(when(col("rn") <= 8, 1L).otherwise(0L))
          .cast("long").as("kept_u"))
    u.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_u")).cast("long").as("n_events"),
        sum(col("kept_u")).cast("long").as("n_kept"),
        count(when(col("n_u") > 8, 1)).as("n_users_capped"),
        sum(col("cents_u")).cast("long").as("raw_cents"),
        sum(col("kept_cents_u")).cast("long").as("kept_cents"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        col("n_kept"), col("n_users_capped"), col("raw_cents"),
        col("kept_cents"),
        // DECIMAL(38,0) numerator: 10⁶ × a 100 TB cent total clears
        // int64 (DuckDB's sum is already HUGEINT; Spark must widen)
        when(col("raw_cents") > 0,
          expr("""(1000000 * cast(raw_cents - kept_cents as decimal(38,0)))
                  div raw_cents"""))
          .cast("long").as("clip_loss_ppm"))
  }

  /** CORRELATED SCALAR SUBQUERIES — the one SQL surface class the
    * catalog had not yet exercised END TO END through Catalyst's
    * DECORRELATION machinery (RewriteCorrelatedScalarSubquery +
    * PullupCorrelatedPredicates): "customers strictly above their own
    * nation's average balance", written exactly the way an analyst
    * writes it — TWO correlated scalar subqueries in the WHERE — and
    * authored through `spark.sql` so the optimizer must rewrite them
    * into aggregate-join form itself (the DataFrame equivalent would
    * hand-build the join and prove nothing about the rewrite).
    * PlanAuditSpec locks the decorrelated shape: no nested-loop
    * per-row subquery execution, no cartesian.
    *
    * Parity: the above-average test clears denominators — cents·n >
    * Σcents, exact BIGINTs via the `Tables.money` cents route — so no
    * rational mean is ever compared; outputs are exact counts and a
    * cents max.
    *
    * Scale: after decorrelation both subqueries collapse into ONE
    * per-nation aggregate joined back (nation is a tiny broadcast key);
    * the naive reading — one aggregate per ROW — is exactly what the
    * rewrite exists to prevent. */
  val subqueryCorrelated: Q = Q(
    "subquery_correlated",
    """WITH c AS (SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM customer)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above,
      |  CAST(max(cents) AS BIGINT) AS max_above_cents
      |FROM c
      |WHERE cents * (SELECT count(*) FROM c c2
      |               WHERE c2.c_nationkey = c.c_nationkey)
      |    > (SELECT CAST(sum(cents) AS BIGINT) FROM c c3
      |       WHERE c3.c_nationkey = c.c_nationkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        (Tables.money(col("c_acctbal")) * 100).cast("long").as("cents"))
      .createOrReplaceTempView("graft_cust_cents")
    s.sql(
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_above,
        |  CAST(max(cents) AS BIGINT) AS max_above_cents
        |FROM graft_cust_cents c
        |WHERE cents * (SELECT count(*) FROM graft_cust_cents c2
        |               WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT CAST(sum(cents) AS BIGINT) FROM graft_cust_cents c3
        |       WHERE c3.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey""".stripMargin)
  }

  /** NEYMAN OPTIMAL STRATIFIED ALLOCATION — the sampling-design audit
    * that turns [[sampleStratified]]'s fixed fractions into a budgeted
    * plan: per (returnflag, linestatus) stratum, allocate the 10,000-row
    * budget ∝ N_h·σ_h (Neyman 1934), and report the variance-reduction
    * ratio (Σ W_hσ_h)² / Σ W_hσ_h² against proportional allocation.
    * Determinism is the corpus_mix_temperature rule: each stratum's σ is
    * ONE correctly-rounded sqrt over exact-BIGINT centered moments,
    * quantized to micro units immediately — every share, allocation and
    * the ratio is then exact integer arithmetic (the ratio's numerator
    * rides the wide-integer domain; s² terms pass int64).
    *
    * Plan: one scan to per-stratum exact sufficient statistics
    * (partial+final); everything after is |strata|-bounded windows. */
  val sampleNeymanAlloc: Q = Q(
    "sample_neyman_alloc",
    """WITH x AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
      |    CAST(floor(l_quantity) AS BIGINT) AS q FROM lineitem),
      |s AS (SELECT rf, ls, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(q) AS BIGINT) AS sx, CAST(sum(q*q) AS BIGINT) AS sxx
      |  FROM x GROUP BY 1, 2),
      |m AS (SELECT rf, ls, n,
      |    CAST(floor(1000000 * sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / n)
      |      AS BIGINT) AS sd_micro
      |  FROM s),
      |w AS (SELECT rf, ls, n, sd_micro, n * sd_micro AS wt,
      |    CAST(sum(n) OVER () AS BIGINT) AS tn,
      |    CAST(sum(n * sd_micro) OVER () AS BIGINT) AS tw,
      |    CAST(sum(CAST(n AS HUGEINT) * sd_micro * sd_micro) OVER ()
      |      AS HUGEINT) AS tv
      |  FROM m)
      |SELECT rf, ls, CAST(n AS BIGINT) AS n_rows,
      |  CAST(sd_micro AS BIGINT) AS sd_micro,
      |  CAST((CAST(1000000 AS HUGEINT) * wt) // tw AS BIGINT)
      |    AS neyman_ppm,
      |  CAST((CAST(1000000 AS HUGEINT) * n) // tn AS BIGINT) AS prop_ppm,
      |  CAST((CAST(10000 AS HUGEINT) * wt) // tw AS BIGINT) AS alloc_n,
      |  CAST((1000000 * CAST(tw AS HUGEINT) * tw) // (CAST(tn AS HUGEINT)
      |    * tv) AS BIGINT) AS neyman_vs_prop_ppm
      |FROM w ORDER BY rf, ls""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    def dec38(c: Column): Column = c.cast("decimal(38,0)")
    val st = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        floor(col("l_quantity")).cast("long").as("q"))
      .groupBy("rf", "ls")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sx"),
        sum(col("q") * col("q")).as("sxx"))
    val m = st.select(col("rf"), col("ls"), col("n"),
      floor(lit(1000000) *
          sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) / col("n"))
        .cast("long").as("sd_micro"))
    val w = m.withColumn("wt", col("n") * col("sd_micro"))
      .withColumn("tn", sum(col("n")).over(wAll))
      .withColumn("tw", sum(col("wt")).over(wAll))
      .withColumn("tv",
        sum(dec38(col("n")) * dec38(col("sd_micro")) * dec38(col("sd_micro")))
          .over(wAll))
    w.select(col("rf"), col("ls"), col("n").cast("long").as("n_rows"),
        col("sd_micro").cast("long").as("sd_micro"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * wt) div tw""")
          .cast("long").as("neyman_ppm"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * n) div tn""")
          .cast("long").as("prop_ppm"),
        expr("""(CAST(10000 AS DECIMAL(38,0)) * wt) div tw""")
          .cast("long").as("alloc_n"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * CAST(tw AS DECIMAL(38,0))
                * CAST(tw AS DECIMAL(38,0)))
               div (CAST(tn AS DECIMAL(38,0)) * tv)""")
          .cast("long").as("neyman_vs_prop_ppm"))
      .orderBy("rf", "ls")
  }

  /** ITEM-ITEM COLLABORATIVE-FILTERING NEIGHBOR LISTS over order
    * baskets — the serving table a "customers also bought" tier reads:
    * for every part, its top-3 co-occurrence neighbors ranked by
    * SQUARED cosine over the binary order-incidence vectors,
    * cos²(a,b) = sup²/(n_a·n_b) — an exact rational of BIGINTs, so the
    * ranking needs no sqrt and no float (the sqrt-free twist on
    * [[marketBasket]], which ranks GLOBAL rules by float lift; this
    * one emits PER-ITEM lists, the CF deliverable).
    *
    * Plan: distinct (order, part) incidence; unordered pairs generated
    * once by an orderkey-equi self-join (per-order fan-out is bounded
    * by basket size, ~7 in this schema — Σ|basket|², not |items|²),
    * min-support 2; both directions emitted by a union of projections
    * (the symmetric-pair rule: compute once, mirror); per-item top-3
    * via an item-partitioned row_number with an exact-integer total
    * order (cos2_ppm DESC, sup DESC, neighbor ASC). The ppm divide
    * rides the wide-integer domain (HUGEINT `//` ≡ DECIMAL(38,0)
    * `div` on nonnegative operands). */
  val recItemCooccur: Q = Q(
    "rec_item_cooccur",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |           FROM lineitem),
      |ic AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
      |pr AS (SELECT a.pk AS pa, bb.pk AS pb, CAST(count(*) AS BIGINT) AS sup
      |       FROM b a JOIN b bb ON a.ok = bb.ok AND a.pk < bb.pk
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |pr2 AS (SELECT pa, pb, sup FROM pr
      |        UNION ALL SELECT pb AS pa, pa AS pb, sup FROM pr),
      |sc AS (SELECT p.pa, p.pb, p.sup, ia.c AS n_a, ib.c AS n_b,
      |    CAST((1000000 * CAST(p.sup AS HUGEINT) * p.sup)
      |         // (CAST(ia.c AS HUGEINT) * ib.c) AS BIGINT) AS cos2_ppm
      |  FROM pr2 p JOIN ic ia ON ia.pk = p.pa JOIN ic ib ON ib.pk = p.pb),
      |r AS (SELECT *, row_number() OVER (PARTITION BY pa
      |    ORDER BY cos2_ppm DESC, sup DESC, pb ASC) AS rn FROM sc)
      |SELECT CAST(pa AS BIGINT) AS item, CAST(pb AS BIGINT) AS neighbor,
      |  CAST(sup AS BIGINT) AS sup, CAST(n_a AS BIGINT) AS n_a,
      |  CAST(n_b AS BIGINT) AS n_b, CAST(cos2_ppm AS BIGINT) AS cos2_ppm,
      |  CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn <= 3 ORDER BY item, rn""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // r11 opt: same rewrite as [[marketBasket]] — the order-keyed
    // collect_set aggregate feeds pair generation and the item counts;
    // the old plan evaluated the (ok, pk)-distinct frame three times
    // (6 lineitem scans in the before plan).
    val sets = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(array_sort(collect_set(struct(col("l_partkey").as("pk"))))
        .as("parts"))
    val pairGen = {
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.functions.expressions.OrderedPairs(
        Bridge.expression(col("parts"))))
    }
    val ic = sets.select(explode(col("parts")).as("e"))
      .groupBy(col("e.pk").as("pk")).agg(count(lit(1)).as("c"))
    val pr = sets
      .select(pairGen.as(Seq("pa", "pb")))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
    val pr2 = pr.unionByName(pr.select(col("pb").as("pa"),
      col("pa").as("pb"), col("sup")))
    def dec38(c: Column): Column = c.cast("decimal(38,0)")
    val sc = pr2
      .join(ic.select(col("pk").as("pa"), col("c").as("n_a")), Seq("pa"))
      .join(ic.select(col("pk").as("pb"), col("c").as("n_b")), Seq("pb"))
      .select(col("pa"), col("pb"), col("sup"), col("n_a"), col("n_b"),
        (dec38(lit(1000000L)) * dec38(col("sup")) * dec38(col("sup")))
          .as("num"),
        (dec38(col("n_a")) * dec38(col("n_b"))).as("den"))
      .withColumn("cos2_ppm", expr("num div den"))
    sc.withColumn("rn", row_number().over(Window.partitionBy("pa")
        .orderBy(desc("cos2_ppm"), desc("sup"), asc("pb"))))
      .filter(col("rn") <= 3)
      .select(col("pa").cast("long").as("item"),
        col("pb").cast("long").as("neighbor"),
        col("sup").cast("long").as("sup"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        col("cos2_ppm").cast("long").as("cos2_ppm"),
        col("rn").cast("long").as("rn"))
      // rn carries the per-item ranking; no presentation sort of the
      // ~|items|·3 result (r11 opt, see Windows scaladoc)
  }

  val all: Seq[Q] = Seq(
    subqueryCorrelated,
    aggHeavyChange, aggContributionBound, joinStar,
    rfmSegmentation,
    countByProject, filterPred, aggGroupBy, aggRollup, aggMoments,
    aggDistinct, topk,
    joinInner, joinMultiway, semiAnti, setOps, scalarStringDate, jsonExtract,
    arrayOps, joinRange, joinAsof, mapOps, aggApproxDistinct, aggCube,
    joinOuter, aggPivot, aggStats, generatorPosexplode, sampleStratified,
    sampleBootstrap,
    aggSalted, aggQuantile, aggQuantileSketch, aggWeightedMedian, setopsAll,
    topkPaged, aggCorr,
    aggHistogram, aggStringagg, profileTable, outlierZscore, scalarMath,
    scalarDatetimeExt, scalarStringExt, aggMode, scalarNullSemantics,
    unpivotStack, joinSalted, joinSaltedHot, aggGroupingSets, outlierMad,
    aggHistogramEqd,
    joinAsofTol, joinAsofFwd, joinAsofNearest, generatorOuter, aggHllUnion,
    aggThetaSetops,
    joinBloom, sampleReservoir, joinIntervalBin, joinIntervalOverlap,
    aggBitmapDistinct,
    aggRegression, skylinePareto, joinFuzzy, aggIncremental, marketBasket,
    aggGini, aggHhi, recItemCooccur, sampleNeymanAlloc)

}
