package graft

import graft.operators.{Dedup, Vectors}

/** Self-verifying checks for the approximate dedup/ANN operators that have
  * no ANSI-SQL oracle (SURVEY.md §7.4): MinHash-LSH is validated against
  * the exact n-gram Jaccard pairs, SimHash against basic metric
  * properties, ANN against brute-force recall.
  */
class DedupSpec extends SparkSpec {

  private def pairs(q: Q): Set[(Long, Long)] =
    q.fn(spark, sf0001).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates are a subset of exact J>=0.8 pairs, recall >= 0.8") {
    val exact = Dedup.dedupNgram.fn(spark, sf0001)
      .filter("jaccard >= 0.8").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairs(Dedup.dedupMinhash)
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-duplicate pairs: ${lsh.diff(exact)}")
    assert(lsh.size >= 0.8 * exact.size,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash pairs include the planted exact-Jaccard near-dups' shape") {
    val sim = pairs(Dedup.dedupSimhash)
    val exact = Dedup.dedupNgram.fn(spark, sf0001)
      .filter("jaccard >= 0.8").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash at hamming<=3 should recover most planted near-dup pairs
    val recalled = exact.intersect(sim)
    assert(recalled.size >= 0.7 * exact.size,
      s"simhash recall ${recalled.size}/${exact.size}")
  }

  test("ann-ivf probes nearest cells and returns true cosines") {
    val ivf = Vectors.vectorAnnIvf.fn(spark, sf0001)
      .select("vec_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val brute = Vectors.vectorTopk.fn(spark, sf0001)
      .select("vec_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ivf.nonEmpty)
    ivf.keySet.intersect(brute.keySet).foreach { id =>
      assert(math.abs(ivf(id) - brute(id)) < 1e-12)
    }
    assert(ivf.keySet.intersect(brute.keySet).nonEmpty,
      "IVF should recover part of the true top-20")
  }

  test("persisted LSH index: bucket probe is a partition prune") {
    import org.apache.spark.sql.functions._
    val idxDir = java.nio.file.Files.createTempDirectory("lshidx").toString
    // build + persist the index partitioned by bucket (the 100 TB layout)
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("bucket", graft.operators.Vectors.bucketOf(col("v")))
      .write.mode("overwrite").partitionBy("bucket").parquet(idxDir)
    val idx = spark.read.parquet(idxDir)
    val someBucket = idx.select("bucket").limit(1).collect()(0).getInt(0)
    val probe = idx.filter(col("bucket") === someBucket)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
           plan.contains(s"(bucket"),
      s"bucket probe should prune partitions:\n${plan.take(600)}")
    assert(probe.count() > 0)
  }

  test("ann-lsh results are true vectors with correct cosines (precision)") {
    val ann = Vectors.vectorAnnLsh.fn(spark, sf0001)
      .select("vec_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val brute = Vectors.vectorTopk.fn(spark, sf0001)
      .select("vec_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ann.nonEmpty)
    // every ANN hit that is also a brute-force top-20 must agree on cosine
    ann.keySet.intersect(brute.keySet).foreach { id =>
      assert(math.abs(ann(id) - brute(id)) < 1e-12)
    }
    // recall@20 of a 37/256-bucket probe is approximate by design; just
    // require non-trivial overlap with the true top-20
    assert(ann.keySet.intersect(brute.keySet).nonEmpty)
  }
}
