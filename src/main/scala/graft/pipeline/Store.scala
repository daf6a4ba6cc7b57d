package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Project-partitioned parquet store — the engine's replacement for the
  * reference's four stores (SURVEY.md §1.4, §2.12). The reference loads a
  * graph DB + three Elasticsearch indices + an ES `fhir` index per project
  * (fhir_import_export.py:224-293) and deletes per project
  * (:372-385, `empty_project` / `meta_flat_delete` / `fhir_delete`).
  *
  * Here every store is one parquet table partitioned by `project_id`
  * (optionally sub-partitioned, e.g. `resource_type` for the fhir_raw
  * table). At 100 TB this gives:
  *  - dynamic partition pruning for every per-project read (the reference's
  *    ES `match: project_id` filter becomes a directory prune, zero I/O for
  *    other projects);
  *  - per-project delete/reload as an O(1) metadata partition overwrite —
  *    no row-level rewrite (`partitionOverwriteMode=dynamic` replaces only
  *    the partitions present in the written frame);
  *  - idempotent re-import (the reference wipes and reloads a project per
  *    commit, :451-470): overwriting the same partition twice converges.
  */
final class Store(root: String, partitionCols: Seq[String] = Seq("project_id")) {

  /** Append-or-overwrite the partitions present in `df` (put verb). Also
    * persists the schema as a `_schema.ddl` sidecar (underscore-prefixed →
    * invisible to Spark's file listing) so an empty table — the
    * reference's "/dev/null" empty-load, which writes zero partition
    * directories — still reads back as an empty-but-schema'd frame. */
  def put(df: DataFrame): Unit = put(df, Map.empty)

  /** As [[put]], with extra parquet writer options (e.g. a small
    * `parquet.block.size` in tests to force multiple row groups). */
  def put(df: DataFrame, options: Map[String, String]): Unit = {
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .options(options)
      .partitionBy(partitionCols: _*)
      .parquet(root)
    val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(schemaPath, true)
    try out.write(df.schema.toDDL.getBytes("UTF-8")) finally out.close()
  }

  /** Read the whole table; partition filters prune directories. */
  def read(spark: SparkSession): DataFrame = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(schemaPath)) {
      val in = fs.open(schemaPath)
      val ddl = try new String(
        in.readAllBytes(), "UTF-8") finally in.close()
      spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(ddl)).parquet(root)
    } else spark.read.parquet(root)
  }

  /** Compact one project's partition to `nFiles` files — the maintenance
    * op that keeps long-lived stores healthy (every re-import/append
    * cycle leaves task-count-many files; small files dominate scan
    * overhead at scale). Rewrite-in-place via dynamic overwrite of just
    * this partition.
    *
    * `clusterBy` additionally sorts rows within the rewritten files: a
    * sorted file gives every parquet row group (and page) a NARROW,
    * mutually disjoint min/max range on the cluster key, so a selective
    * filter skips whole row groups at the footer — the data-skipping
    * lever that turns a partition scan into a few-row-group read at
    * 100 TB. StoreSpec proves the disjoint-ranges property from the
    * actual parquet footers. */
  def compactProject(spark: SparkSession, projectId: String,
                     nFiles: Int = 1, clusterBy: Seq[String] = Nil,
                     writerOptions: Map[String, String] = Map.empty): Unit = {
    val part = readProject(spark, projectId)
    val clustered =
      if (clusterBy.isEmpty) part.coalesce(nFiles)
      // range-partition on the cluster key FIRST so multiple output files
      // get disjoint key ranges (coalesce would merge arbitrary inputs
      // and every file would span the full range, defeating skipping);
      // then partition cols lead the per-file sort: the partitioned-file
      // writer demands rows ordered by partition columns and would
      // inject its own (non-stable) sort otherwise, destroying the
      // cluster order
      else part
        .repartitionByRange(nFiles, clusterBy.map(col): _*)
        .sortWithinPartitions((partitionCols ++ clusterBy).map(col): _*)
    put(clustered, writerOptions)
  }

  /** Z-order variant of [[compactProject]]: cluster one project's
    * partition on the Morton interleave of TWO dimensions
    * ([[graft.functions.expressions.InterleaveBits]]), so row-group
    * min/max pruning works for range predicates on either dimension — a
    * linear cluster key only ever serves its leading column (a filter on
    * the second column skips nothing). Same write path as linear
    * clustering: range-partition on the z key for disjoint ranges across
    * files, partition cols lead the per-file sort so the writer doesn't
    * inject its own. ZOrderSpec quantifies the pruning from the actual
    * parquet footers. */
  def compactProjectZOrder(spark: SparkSession, projectId: String,
                           nFiles: Int, zCols: (String, String),
                           writerOptions: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.functions.{floor, least, lit, max, min}
    val part = readProject(spark, projectId)
    // normalize each dimension onto the full signed-int range via its
    // [min, max] (one tiny agg job — this is a maintenance op, already
    // eager). A raw cast-to-int would abort on BIGINT epochs under ANSI
    // or silently wrap without it, destroying the layout; the affine map
    // preserves per-dimension order for any numeric range and spreads
    // bit entropy even when the two dimensions' scales differ wildly.
    val stats = part.agg(
      min(col(zCols._1)).cast("double"), max(col(zCols._1)).cast("double"),
      min(col(zCols._2)).cast("double"), max(col(zCols._2)).cast("double"))
      .collect()(0)
    def norm(c: String, loIdx: Int): org.apache.spark.sql.Column =
      if (stats.isNullAt(loIdx) || stats.isNullAt(loIdx + 1) ||
          stats.getDouble(loIdx + 1) <= stats.getDouble(loIdx)) lit(0)
      else {
        val (lo, hi) = (stats.getDouble(loIdx), stats.getDouble(loIdx + 1))
        // [lo,hi] → [-(2³¹-1), 2³¹-1]; least() guards the v=hi edge
        (least(floor((col(c).cast("double") - lit(lo)) / lit(hi - lo)
            * lit(4294967294.0)), lit(4294967294.0)) - lit(2147483647L))
          .cast("int")
      }
    val z = Bridge.column(graft.functions.expressions.InterleaveBits(
      Bridge.expression(norm(zCols._1, 0)),
      Bridge.expression(norm(zCols._2, 2))))
    val clustered = part
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions((partitionCols.map(col) :+ col("__z")): _*)
      .drop("__z")
    put(clustered, writerOptions)
  }

  /** Keyed upsert into one project's partition — the MERGE INTO shape on
    * plain parquet: rows of `updates` replace existing rows with the same
    * `key`; unmatched updates insert. Implemented as a partition rewrite:
    * anti-join the old partition against the (broadcastable) update keys,
    * union, write to a STAGING root, then swap the partition directory
    * in. Stage-then-swap matters twice over — the merged plan reads the
    * very files the write replaces (overwriting in place would corrupt
    * the input mid-scan), and the old partition stays intact until the
    * staged write has fully committed. At scale the cost is one
    * partition's rewrite, never a table scan, and nothing is ever
    * collected to the driver. */
  def upsertProject(spark: SparkSession, projectId: String,
                    updates: DataFrame, key: String): Unit = {
    val pcol = partitionCols.head
    // confine updates to the target partition BEFORE touching anything: a
    // stray row with another (or null) partition value would delete its
    // key here and then be silently discarded with the staging dir
    val stray = updates
      .filter(col(pcol).isNull || col(pcol) =!= projectId).limit(1).count()
    require(stray == 0,
      s"upsertProject($projectId): every update row must carry $pcol = $projectId")
    val merged = readProject(spark, projectId)
      .join(broadcast(updates.select(col(key))), Seq(key), "left_anti")
      .unionByName(updates)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    // unique staging root: concurrent upserts (the per-project
    // parallelism this store promises) must not share staging state
    val tmpRoot = new org.apache.hadoop.fs.Path(
      root + "_upsert_staging_" + java.util.UUID.randomUUID().toString)
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmpRoot.toString)
    def cleanup(): Unit = { fs.delete(tmpRoot, true); () }
    // locate the staged partition by LISTING (Hive path-escapes special
    // characters in partition values; recomputing the name would miss)
    val staged = fs.listStatus(tmpRoot).map(_.getPath)
      .filter(_.getName.startsWith(s"$pcol="))
    if (staged.length != 1) {
      cleanup()
      throw new IllegalStateException(
        s"expected exactly one staged $pcol partition, got " +
        staged.map(_.getName).mkString("[", ", ", "]"))
    }
    val live = new org.apache.hadoop.fs.Path(path, staged.head.getName)
    val backup = new org.apache.hadoop.fs.Path(
      tmpRoot, "backup_" + staged.head.getName)
    // backup-swap, checking EVERY rename (Hadoop reports most failures as
    // a false return, not an exception): the old partition survives any
    // failure, and a failed swap restores it. The staging root is only
    // removed once the data is safe — in the swap-AND-restore-failed
    // worst case it is deliberately LEFT for manual recovery.
    if (fs.exists(live) && !fs.rename(live, backup)) {
      cleanup()
      throw new java.io.IOException(s"could not move $live aside")
    }
    if (!fs.rename(staged.head, live)) {
      if (fs.exists(backup) && !fs.rename(backup, live))
        throw new java.io.IOException(
          s"swap AND restore failed for $live; old data kept at $backup")
      cleanup()
      throw new java.io.IOException(s"could not swap staged partition into $live")
    }
    cleanup()
  }

  private def path = new org.apache.hadoop.fs.Path(root)
  private def schemaPath = new org.apache.hadoop.fs.Path(root, "_schema.ddl")

  /** Whether this store has ever been written — reading a never-written
    * root throws (no files, no schema sidecar), so existence-sensitive
    * callers (e.g. the delete verb's discovery guard) check first, like
    * [[deleteProject]] does. */
  def isInitialized(spark: SparkSession): Boolean =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)

  /** Read one project's partition (get verb) — a directory prune, not a
    * scan-and-filter. */
  def readProject(spark: SparkSession, projectId: String): DataFrame =
    read(spark).filter(col(partitionCols.head) === projectId)

  /** Delete one project (delete verb): rewrite the table without the
    * project's partitions. On plain parquet this is a partition drop via
    * overwrite of nothing — implemented as an overwrite of the remaining
    * partition list is wrong at scale, so instead we delete the partition
    * directories directly (the parquet-table equivalent of the reference's
    * per-project ES delete-by-query, fhir_import_export.py:375-376).
    */
  def deleteProject(spark: SparkSession, projectId: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(root)
    val fs = base.getFileSystem(conf)
    val dir = new org.apache.hadoop.fs.Path(
      base, s"${partitionCols.head}=$projectId")
    if (fs.exists(dir)) { fs.delete(dir, true); () }
  }
}
