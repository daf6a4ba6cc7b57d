/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of ACED-IDP/aced_etl_pod (see
  * /root/repo/SURVEY.md for the full blueprint and reference citations),
  * extended with the training-data-pipeline operator families
  * (deduplication, similarity search, text analysis, multimodal columns,
  * streaming) and designed for 100 TB scale (docs/SCALE.md).
  *
  * Entry points:
  *  - [[graft.SparkEntry]] — the driver-facing query inventory
  *    (`queries` / `oracleSql` / `entry`).
  *  - [[graft.pipeline.JobRunner]] — the reference's INPUT_DATA job
  *    envelope (put/get/delete verbs over partitioned parquet stores).
  *  - [[graft.plans.GraftExtensions]] — SparkSessionExtensions injection
  *    of the engine's native SQL functions (e.g. `cosine_sim`).
  *
  * Design stance: DataFrame-first declarative plans that Catalyst can
  * optimize (pushdown, pruning, broadcast, AQE); custom code only where
  * built-ins genuinely cannot express the semantics — one codegen'd
  * Catalyst expression, one typed UDAF, a schema-walk flattener, and
  * batched `mapPartitions` pipelines for opaque media blobs.
  */
package object graft
