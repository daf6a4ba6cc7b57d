package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Spatial operators — grid-bucketed density, radius join, and kNN, the
  * three plan shapes every geo-analytics engine ships. The fixtures
  * carry no coordinates, so points are SYNTHESIZED deterministically
  * from keys with pure integer arithmetic (the multimodal synth-from-
  * table discipline: the synthesis is part of the query and the oracle
  * recomputes it, so the whole pipeline is value-checked on both
  * engines): lat/lon in integer MICRO-DEGREES via a Knuth
  * multiplicative hash of the key, modulo the degree range. Every
  * distance is the planar squared distance in micro-degrees — exact
  * BIGINT arithmetic end to end (the metric a production engine swaps
  * for haversine without touching the plan; transcendental-free keeps
  * the oracle bit-exact).
  *
  * Scale posture — the point of the family: the GRID turns the O(n·m)
  * all-pairs spatial join into a cell-keyed equi-join. Each probe side
  * explodes to its 3×3 neighborhood (a constant ×9 of the point count),
  * the build side partitions by cell, and the radius/kNN filter runs
  * inside matching cells only. Cell size (2°) is ≥ the radius, so the
  * 3×3 neighborhood is provably sufficient — no pair can be missed.
  * At 100 TB the cell key is the partition key; skewed cells (urban
  * density) would take the salted-join treatment, same as any hot key.
  */
object Geo {

  /** 2° cells in micro-degrees. Radius R = cell, so 3×3 covers R. */
  private val Cell = 2000000L
  private val R = 2000000L

  /** Portable integer point synthesis: key → (lat, lon) micro-degrees.
    * The key is reduced mod 1e5 FIRST so the Knuth multiply stays far
    * inside int64 in DuckDB's overflow-checked BIGINT domain. */
  private def latOf(k: Column): Column =
    ((k % 100000L) * 2654435761L) % 180000001L - 90000000L
  private def lonOf(k: Column): Column =
    ((k % 100000L) * 2246822519L) % 360000001L - 180000000L
  private val latSql =
    (k: String) => s"((($k % 100000) * 2654435761) % 180000001 - 90000000)"
  private val lonSql =
    (k: String) => s"((($k % 100000) * 2246822519) % 360000001 - 180000000)"

  /** (id, lat, lon, cx, cy) point frame for a key column of a table. */
  private def points(df: DataFrame, key: String): DataFrame =
    df.select(col(key).as("id")).distinct()
      .select(col("id"), latOf(col("id")).as("lat"),
        lonOf(col("id")).as("lon"))
      .withColumn("cx", expr(s"(lon + 180000000) div $Cell"))
      .withColumn("cy", expr(s"(lat + 90000000) div $Cell"))

  private def pointsSql(table: String, key: String): String =
    s"""SELECT DISTINCT $key AS id, ${latSql(key)} AS lat,
       |    ${lonSql(key)} AS lon,
       |    (${lonSql(key)} + 180000000) // $Cell AS cx,
       |    (${latSql(key)} + 90000000) // $Cell AS cy
       |  FROM $table""".stripMargin

  /** GRID DENSITY CENSUS over the synthesized customer points — the
    * "where is the data" heatmap feeding partition sizing and hot-cell
    * salting decisions: per occupied 2° cell, the point count and its
    * ppm share, top-20 cells with a total order. One partial+final
    * aggregate over the cell-keyed frame. */
  val geoGridDensity: Q = Q(
    "geo_grid_density",
    s"""WITH p AS (${pointsSql("customer", "c_custkey")}),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM p)
       |SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST((1000000 * count(*)) // (SELECT t FROM tot) AS BIGINT)
       |    AS share_ppm
       |FROM p GROUP BY 1, 2
       |ORDER BY n DESC, cx ASC, cy ASC LIMIT 20""".stripMargin
  ) { (s, d) =>
    val p = points(Tables.table(s, d, "customer"), "c_custkey")
    val tot = p.agg(count(lit(1)).as("t"))
    p.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("cx").cast("long").as("cx"),
        col("cy").cast("long").as("cy"),
        col("n").cast("long").as("n"),
        expr("(1000000 * n) div t").cast("long").as("share_ppm"))
      .orderBy(desc("n"), asc("cx"), asc("cy"))
      .limit(20)
  }

  /** GRID-BUCKETED RADIUS JOIN customers ↔ suppliers (within R = 2° in
    * the planar micro-degree metric), reported as the per-cell pair
    * census: the canonical spatial-join plan — probe points explode to
    * their 3×3 cell neighborhood (constant ×9), the build side keys by
    * cell, the exact d² ≤ R² predicate runs inside cell-matched pairs
    * only. Because Cell ≥ R, the neighborhood is sufficient: a pair
    * within R differs by ≤1 in each cell coordinate, so no pair
    * escapes (the count-once guard of join_interval_overlap is not
    * needed — each pair's cells match exactly once since the build side
    * is NOT exploded). */
  val geoRadiusJoin: Q = Q(
    "geo_radius_join",
    s"""WITH c AS (${pointsSql("customer", "c_custkey")}),
       |sup AS (${pointsSql("supplier", "s_suppkey")}),
       |probe AS (SELECT id, lat, lon,
       |    cx + dxs.dx AS px, cy + dys.dy AS py
       |  FROM c, range(-1, 2) dxs(dx), range(-1, 2) dys(dy)),
       |pr AS (SELECT probe.id AS cid, sup.id AS sid,
       |    (probe.lat - sup.lat) * (probe.lat - sup.lat)
       |      + (probe.lon - sup.lon) * (probe.lon - sup.lon) AS d2,
       |    sup.cx, sup.cy
       |  FROM probe JOIN sup ON sup.cx = probe.px AND sup.cy = probe.py
       |  WHERE (probe.lat - sup.lat) * (probe.lat - sup.lat)
       |      + (probe.lon - sup.lon) * (probe.lon - sup.lon)
       |      <= ${R * R})
       |SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT cid) AS BIGINT) AS n_customers,
       |  CAST(min(d2) AS BIGINT) AS min_d2
       |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val c = points(Tables.table(s, d, "customer"), "c_custkey")
    val sup = points(Tables.table(s, d, "supplier"), "s_suppkey")
      .select(col("id").as("sid"), col("lat").as("slat"),
        col("lon").as("slon"), col("cx").as("px"), col("cy").as("py"))
    val probe = c
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("cid"), col("lat"), col("lon"),
        (col("cx") + col("dx")).as("px"), (col("cy") + col("dy")).as("py"))
    val d2 = (col("lat") - col("slat")) * (col("lat") - col("slat")) +
      (col("lon") - col("slon")) * (col("lon") - col("slon"))
    probe.join(sup, Seq("px", "py"))
      .withColumn("d2", d2)
      .filter(col("d2") <= R * R)
      .groupBy(col("px").as("cx"), col("py").as("cy"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("cid")).as("n_customers"),
        min(col("d2")).as("min_d2"))
      .select(col("cx").cast("long").as("cx"),
        col("cy").cast("long").as("cy"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("n_customers").cast("long").as("n_customers"),
        col("min_d2").cast("long").as("min_d2"))
      .orderBy("cx", "cy")
  }

  /** GRID kNN: each customer's 3 nearest suppliers found INSIDE its 3×3
    * cell neighborhood (the bounded-probe contract a serving tier uses;
    * customers with an empty neighborhood emit nothing — at production
    * density the grid is sized so that case is the exception, and the
    * row's absence is the honest readout). Ranking is the exact-integer
    * total order (d², supplier id) — no float, no tie ambiguity. */
  val geoKnn: Q = Q(
    "geo_knn",
    s"""WITH c AS (${pointsSql("customer", "c_custkey")}),
       |sup AS (${pointsSql("supplier", "s_suppkey")}),
       |probe AS (SELECT id, lat, lon,
       |    cx + dxs.dx AS px, cy + dys.dy AS py
       |  FROM c, range(-1, 2) dxs(dx), range(-1, 2) dys(dy)),
       |pr AS (SELECT probe.id AS cid, sup.id AS sid,
       |    (probe.lat - sup.lat) * (probe.lat - sup.lat)
       |      + (probe.lon - sup.lon) * (probe.lon - sup.lon) AS d2
       |  FROM probe JOIN sup ON sup.cx = probe.px AND sup.cy = probe.py),
       |r AS (SELECT cid, sid, d2,
       |    row_number() OVER (PARTITION BY cid ORDER BY d2 ASC, sid ASC)
       |      AS rn
       |  FROM pr)
       |SELECT CAST(cid AS BIGINT) AS cid, CAST(rn AS BIGINT) AS rn,
       |  CAST(sid AS BIGINT) AS sid, CAST(d2 AS BIGINT) AS d2
       |FROM r WHERE rn <= 3 ORDER BY cid, rn""".stripMargin
  ) { (s, d) =>
    val c = points(Tables.table(s, d, "customer"), "c_custkey")
    val sup = points(Tables.table(s, d, "supplier"), "s_suppkey")
      .select(col("id").as("sid"), col("lat").as("slat"),
        col("lon").as("slon"), col("cx").as("px"), col("cy").as("py"))
    val probe = c
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("cid"), col("lat"), col("lon"),
        (col("cx") + col("dx")).as("px"), (col("cy") + col("dy")).as("py"))
    val d2 = (col("lat") - col("slat")) * (col("lat") - col("slat")) +
      (col("lon") - col("slon")) * (col("lon") - col("slon"))
    val pr = probe.join(sup, Seq("px", "py")).withColumn("d2", d2)
    pr.withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(asc("d2"), asc("sid"))))
      .filter(col("rn") <= 3)
      .select(col("cid").cast("long").as("cid"),
        col("rn").cast("long").as("rn"),
        col("sid").cast("long").as("sid"),
        col("d2").cast("long").as("d2"))
      .orderBy("cid", "rn")
  }

  /** DBSCAN CORE/BORDER/NOISE CENSUS over the customer points — the
    * density-classification step of DBSCAN (the expensive half; the
    * flood-fill after it is [[Dedup]]'s connected-components machinery
    * on the core graph): a point is CORE when its R-ball holds ≥ minPts
    * points (itself included), BORDER when non-core but within R of a
    * core point, NOISE otherwise. Both passes ride the same 3×3
    * grid-bucketed self-join frame (computed once, cached) — the grid
    * is what keeps the neighbor count sub-quadratic at any density.
    * One summary row of exact counts + core ppm. */
  val geoDbscanCore: Q = Q(
    "geo_dbscan_core",
    s"""WITH c AS (${pointsSql("customer", "c_custkey")}),
       |probe AS (SELECT id, lat, lon,
       |    cx + dxs.dx AS px, cy + dys.dy AS py
       |  FROM c, range(-1, 2) dxs(dx), range(-1, 2) dys(dy)),
       |pr AS (SELECT probe.id AS a, b.id AS b
       |  FROM probe JOIN c b ON b.cx = probe.px AND b.cy = probe.py
       |  WHERE (probe.lat - b.lat) * (probe.lat - b.lat)
       |      + (probe.lon - b.lon) * (probe.lon - b.lon) <= ${R * R}),
       |nc AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS n FROM pr
       |       GROUP BY 1),
       |core AS (SELECT id FROM nc WHERE n >= 4),
       |border AS (SELECT DISTINCT pr.a AS id FROM pr
       |  JOIN core ON core.id = pr.b
       |  WHERE pr.a <> pr.b
       |    AND pr.a NOT IN (SELECT id FROM core)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM c)
       |SELECT tot.t AS n_points,
       |  CAST((SELECT count(*) FROM core) AS BIGINT) AS n_core,
       |  CAST((SELECT count(*) FROM border) AS BIGINT) AS n_border,
       |  CAST(tot.t - (SELECT count(*) FROM core)
       |    - (SELECT count(*) FROM border) AS BIGINT) AS n_noise,
       |  CAST((1000000 * (SELECT count(*) FROM core)) // tot.t AS BIGINT)
       |    AS core_ppm
       |FROM tot""".stripMargin
  ) { (s, d) =>
    val c = points(Tables.table(s, d, "customer"), "c_custkey")
    val b = c.select(col("id").as("bid"), col("lat").as("blat"),
      col("lon").as("blon"), col("cx").as("px"), col("cy").as("py"))
    val probe = c
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("a"), col("lat"), col("lon"),
        (col("cx") + col("dx")).as("px"), (col("cy") + col("dy")).as("py"))
    val pr = probe.join(b, Seq("px", "py"))
      .filter((col("lat") - col("blat")) * (col("lat") - col("blat")) +
        (col("lon") - col("blon")) * (col("lon") - col("blon")) <= R * R)
      .select(col("a"), col("bid").as("bb"))
      .cache() // two consumers: the neighbor census and the border pass
    val core = pr.groupBy("a").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 4).select(col("a").as("id"))
    val border = pr.filter(col("a") =!= col("bb"))
      .join(core.select(col("id").as("bb")), Seq("bb"))
      .join(core.select(col("id").as("a")), Seq("a"), "left_anti")
      .select(col("a")).distinct()
    val tot = c.agg(count(lit(1)).as("t"))
    val nCore = core.agg(count(lit(1)).as("n_core"))
    val nBorder = border.agg(count(lit(1)).as("n_border"))
    tot.crossJoin(broadcast(nCore)).crossJoin(broadcast(nBorder))
      .select(col("t").cast("long").as("n_points"),
        col("n_core").cast("long").as("n_core"),
        col("n_border").cast("long").as("n_border"),
        (col("t") - col("n_core") - col("n_border")).cast("long")
          .as("n_noise"),
        expr("(1000000 * n_core) div t").cast("long").as("core_ppm"))
  }

  val all: Seq[Q] = Seq(geoGridDensity, geoRadiusJoin, geoKnn,
    geoDbscanCore)
}
