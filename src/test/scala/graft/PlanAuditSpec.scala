package graft

import graft.operators.{Dedup, Pipeline, Relational, Vectors}

/** Physical-plan audits (builder prompt: ".explain the plan and iterate
  * until it's the plan you'd want"). These lock in the scale-critical plan
  * shapes so a refactor that silently loses pushdown / broadcast / top-k /
  * partial aggregation fails CI, not the 100 TB run.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(q: Q): String = {
    // the Q.eager contract, enforced where plans are built for
    // inspection: eager queries run Spark jobs at plan-build time and
    // must not be audited through this plan-only helper
    assert(!q.eager, s"${q.name} is eager — audit it with an explicit run")
    // plan locks must not depend on suite ORDER: a cache() left behind
    // by another suite in the shared test JVM substitutes an
    // InMemoryRelation into the audited plan and shifts its exchange
    // counts (seen: StreamingSpec before this suite grew ab_sequential
    // 3 → 4 exchanges). Audit the uncached plan.
    spark.catalog.clearCache()
    q.fn(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("the eager set is exactly the declared convergence/training queries") {
    assert(SparkEntry.catalog.filter(_.eager).map(_.name).toSet ===
      Set("dedup_cluster", "dedup_cluster_sizes", "dedup_cluster_star",
          "vector_ann_ivf",
          "vector_index_stats", "bpe_train", "bpe_encode",
          "graph_triangles", "join_bloom", "vector_pq", "dedup_semantic",
          "vector_ivf_pq", "vector_index_delta", "text_countmin",
          "dedup_cluster_rep", "store_pruning_stats", "graph_kcore",
          "graph_shortest_path", "graph_clustering_coeff", "dedup_cluster_incr",
          "vector_ivf_probe_sweep", "multimodal_dhash_dedup",
          "vector_mmr_rerank",
          "graph_assortativity", "dedup_threshold_sweep", "markov_stationary", "graph_hits",
          "graph_pagerank", "graph_label_prop", "graph_modularity",
          "graph_scc", "graph_betweenness", "graph_diameter",
          "graph_closeness", "vector_pca_power",
          "vector_nsw_search", "vector_ef_sweep", "vector_residual_energy",
          "vector_kmeans_converged", "vector_ood_census",
          "corpus_tokenizer_compression",
          // adaptive-cell consumers: the derivation collect (1 row)
          // fixes the cell/ring literals at plan-build time
          "geo_radius_join", "geo_knn", "geo_dbscan_core",
          "geo_radius_spread", "geo_knn_spread", "geo_dbscan_spread"),
      "new Q entries that run jobs at plan-build time must set eager=true")
  }

  test("no catalog query plans a CartesianProduct") {
    // blanket regression net over the WHOLE catalog: broadcast nested
    // loop joins over tiny sides are fine (dedup_cosine, pair frames);
    // an actual CartesianProductExec — both sides shuffled, all pairs
    // materialized — is never the plan we want at any scale
    SparkEntry.catalog.filterNot(_.eager).foreach { q =>
      val p = q.fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a cartesian:\n${p.take(400)}")
    }
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan(Relational.filterPred)
    assert(p.contains("PushedFilters:"), p.take(400))
    assert(p.contains("GreaterThanOrEqual(l_quantity") ||
           p.contains("LessThan(l_discount"),
      "expected lineitem predicates in PushedFilters")
  }

  test("join_inner broadcasts the nation dimension") {
    assert(plan(Relational.joinInner).contains("BroadcastHashJoin"))
  }

  test("join_multiway broadcasts filtered customer, shuffles the fact join") {
    val p = plan(Relational.joinMultiway)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("topk compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan(Relational.topk).contains("TakeOrderedAndProject"))
  }

  test("vector_topk is a TakeOrderedAndProject over the cosine projection") {
    val p = plan(Vectors.vectorTopk)
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("cosine_sim"), "native expression should be in the plan")
  }

  test("agg_groupby runs partial+final hash aggregation") {
    val p = plan(Relational.aggGroupBy)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected map-side partial + final HashAggregate")
  }

  test("simplify_flatten prunes unread columns at the scan") {
    val p = plan(Pipeline.simplifyFlatten)
    assert(!p.contains("c_nationkey"),
      "flatten projection must not read unused columns")
  }

  test("dedup_cosine evaluates the native cosine, threshold pushed into join") {
    val p = plan(Dedup.dedupCosine)
    assert(p.contains("cosine_sim"))
    // Catalyst pushes `cosine >= τ` into the nested-loop join condition,
    // so pairs below threshold never materialize a row
    assert(p.contains("BroadcastNestedLoopJoin") &&
           p.contains("cosine_sim(v"))
  }

  test("count_by_project aggregates with partial combine before shuffle") {
    val p = plan(Relational.countByProject)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("join_asof_tol adds no exchange over join_asof (projection only)") {
    def exchanges(q: Q) =
      "Exchange".r.findAllIn(plan(q)).size
    assert(exchanges(Relational.joinAsofTol) === exchanges(Relational.joinAsof),
      "the tolerance must stay a narrow projection over the as-of window")
  }

  test("join_asof is one keyed window, not an N x M join") {
    val p = plan(Relational.joinAsof)
    assert(p.contains("Window") || p.contains("WindowGroupLimit"),
      "asof should be window-based")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"asof must not fall back to a product join:\n${p.take(600)}")
  }

  test("text_tokens explode feeds a partial+final aggregate") {
    val p = plan(graft.operators.TextAnalysis.textTokens)
    assert(p.contains("Generate explode"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("ml_naive_bayes scores through one explode + partial+final aggregates") {
    val p = plan(graft.operators.MlEval.mlNaiveBayes)
    assert(p.contains("Generate explode"), "tokenization must be an explode")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "model counts and scoring must both aggregate partial+final")
    assert(!p.contains("CartesianProduct"),
      "class fan-out must ride broadcasts, never a cartesian")
  }

  test("geo family stays cell-keyed equi-joins (never a product)") {
    // eager queries (the adaptive-cell derivation collect runs at
    // plan-build) — audited with an explicit build, not plan()
    for (q <- Seq(graft.operators.Geo.geoRadiusJoin,
                  graft.operators.Geo.geoKnn,
                  graft.operators.Geo.geoDbscanCore,
                  graft.operators.Geo.geoRadiusSpread,
                  graft.operators.Geo.geoKnnSpread,
                  graft.operators.Geo.geoDbscanSpread)) {
      val p = q.fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name}: grid join regressed to a product:\n${p.take(600)}")
      // the dbscan census ends in broadcast cross-combines of 1-row
      // scalar aggregates (fine); the pair frame itself must never
      // ride a nested loop — count the BNLJs and bound them
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnl <= 2, s"${q.name}: $bnl nested-loop joins:\n${p.take(600)}")
      assert(p.contains("Generate explode"),
        s"${q.name}: the ring neighborhood probe must be a generator")
    }
  }

  test("sample_neyman_alloc reads lineitem exactly once") {
    val p = plan(graft.operators.Relational.sampleNeymanAlloc)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"stratum stats + shares must share ONE scan:\n${p.take(600)}")
  }

  test("dedup_ngram has no cartesian/nested-loop join anywhere") {
    val p = plan(Dedup.dedupNgram)
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"posting-list plan regressed to a product join:\n${p.take(800)}")
  }

  test("ngram_freq is explode -> partial+final agg -> TakeOrderedAndProject") {
    val p = plan(graft.operators.TextAnalysis.ngramFreq)
    assert(p.contains("Generate ngram_tokens"),
      "expected the native n-gram generator")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("doc_chunk shuffles only for the output sort") {
    val p = plan(graft.operators.Corpus.docChunk)
    assert(p.contains("Generate"), "expected the chunk-start generator")
    // exactly one exchange: the ORDER BY range partition — chunking
    // itself must be narrow
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"chunking should not shuffle:\n${p.take(800)}")
  }

  test("text_repetition aggregates partial+final on both levels") {
    val p = plan(graft.operators.TextAnalysis.textRepetition)
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final at (doc,bigram) and (doc) levels")
  }

  test("corpus_pack: every corpus-proportional window is partitioned") {
    // audit the LOGICAL plan's Window nodes directly: any window whose
    // input is proportional to corpus size must carry a partitionBy; the
    // one permitted unpartitioned window is the superbucket rollup, whose
    // input is n/W² rows (constant at any plausible scale) — identified
    // by sitting above BOTH aggregation levels.
    val df = graft.operators.Corpus.corpusPack.fn(spark, sf0001)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.size >= 3, s"expected the 3-level prefix sum, got $wins")
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"at most the superbucket window may be unpartitioned:\n$wins")
    unpartitioned.foreach { w =>
      val aggsBelow = w.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggsBelow.size >= 2,
        "the unpartitioned window must sit above both aggregation " +
          s"levels (n/W² input), found ${aggsBelow.size} below:\n$w")
    }
    // doc-level and bucket-level prefix sums carry their partition keys
    val specs = wins.map(_.partitionSpec.map(_.sql).mkString(","))
    assert(specs.exists(s => s.contains("bkt") && !s.contains("sbkt")) &&
           specs.exists(_.contains("sbkt")),
      s"expected bkt- and sbkt-partitioned windows, got: $specs")
  }

  test("corpus_entropy: the corpus is scanned once; cross-source stats ride windows") {
    val p = plan(graft.operators.Corpus.corpusEntropy)
    // the self-join formulation re-derives the (source, token) aggregate
    // per reference — 4 corpus tokenizations; the window formulation
    // scans the documents parquet exactly once
    assert("FileScan".r.findAllIn(p).size == 1,
      s"corpus must be scanned exactly once:\n${p.take(1000)}")
    // global token counts = vocab-keyed window; corpus total =
    // unpartitioned window over the |sources|-row aggregate
    assert("Window".r.findAllIn(p).size >= 2, p.take(600))
    val df = graft.operators.Corpus.corpusEntropy.fn(spark, sf0001)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // any unpartitioned window must sit above the per-source aggregate
    // (bounded input), never over the corpus-proportional token frame
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggsBelow = w.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggsBelow.size >= 2,
        s"unpartitioned window over an unbounded input:\n$w")
    }
  }

  test("dedup_source_sim: no cartesian; bounded recomputation of the shingle frame") {
    val p = plan(Dedup.dedupSourceSim)
    assert(!p.contains("CartesianProduct"),
      "the source-pair join must stay a broadcast nested loop over " +
        "|sources| rows, never a cartesian of anything corpus-sized")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "size+signature and intersection aggregates should be partial+final")
    assert("Generate".r.findAllIn(p).size <= 4,
      "shingle-frame recomputation crept past the fused-aggregate shape")
  }

  test("text_heavy_hitters: exact recount sits behind a broadcast semi join") {
    val p = plan(graft.operators.TextAnalysis.textHeavyHitters)
    assert(p.contains("LeftSemi"),
      "the full-vocabulary aggregate must be pre-filtered to MG candidates")
    assert(p.contains("MapPartitions"), "the MG sketch stage is missing")
  }

  test("minhash signature step is map-only (no exchange before the bands)") {
    val p = Dedup.minhashSignaturesExpr(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"signature step must not shuffle:\n${p.take(600)}")
    assert(p.contains("minhash_sig"), "native expression should be in the plan")
  }

  test("dedup_cosine_lsh is equi-join banding, never a cartesian product") {
    val p = plan(Dedup.dedupCosineLsh)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"LSH dedup must not degrade to all-pairs:\n${p.take(600)}")
    assert(p.contains("dot_product"),
      "native dot kernel should band and verify candidates (cosine from " +
        "precomputed norms; banding needs only the dot's sign)")
  }

  test("dedup_incremental joins batch bands against all bands, no cartesian") {
    val p = plan(Dedup.dedupIncremental)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"incremental dedup must stay an equi-join:\n${p.take(600)}")
  }

  test("text_contamination broadcasts the benchmark shingle set") {
    val p = plan(graft.operators.TextAnalysis.textContamination)
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark side should broadcast:\n${p.take(600)}")
  }

  test("unpivot_stack melts via a generator, no post-agg shuffle") {
    val p = plan(Relational.unpivotStack)
    assert(p.contains("Generate stack"),
      s"expected the stack generator:\n${p.take(600)}")
    // one exchange for the groupBy, one for the output sort — the melt
    // itself must not add a third
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"melt should be shuffle-free beyond agg+sort:\n${p.take(800)}")
  }

  test("subquery_correlated decorrelates to aggregate-join, no per-row eval") {
    val p = plan(Relational.subqueryCorrelated)
    // Catalyst must rewrite both correlated scalars into ONE per-nation
    // aggregate joined back — a surviving per-row subquery would show as
    // a nested-loop/cartesian or an InSubquery/ScalarSubquery exec node
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected the decorrelated per-nation aggregate")
    assert(p.contains("Join"), "expected the aggregate joined back")
  }

  test("join_salted joins on the composite (key, salt) so one hot key spreads") {
    val p = plan(Relational.joinSalted)
    // the invariant is the composite equi-join key — the physical join
    // (broadcast at tiny SF, shuffle at scale) is AQE/size's choice
    assert(p.contains("_salt"),
      s"salt must be part of the join key:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"))
  }

  test("retention_cohort aggregates activity before the self-join") {
    val p = plan(graft.operators.Streaming.retentionCohort)
    // distinct (partial+final) and the min-cohort agg both precede the join
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"activity must reduce to distinct (user, day) pre-join:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"))
  }

  test("window_range_frame is a single keyed window, RANGE frame in the spec") {
    val p = plan(graft.operators.Windows.windowRangeFrame)
    assert(p.contains("RangeFrame, -30"),
      s"expected the value-based frame:\n${p.take(800)}")
    assert("Window".r.findAllIn(p).size >= 1)
  }

  test("event_transitions: events shuffle once (lead window), then reduce") {
    val p = plan(graft.operators.Streaming.eventTransitions)
    assert(p.contains("Window"), s"expected the lead window:\n${p.take(600)}")
    // one exchange feeds the user-keyed window, one the pair aggregate,
    // one the output sort — raw events must not shuffle a second time
    assert("Exchange".r.findAllIn(p).size <= 3,
      s"events should shuffle once before reduction:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "transition counts must combine partially before the exchange")
  }

  test("ohlc_bars is one partial+final aggregate (ordered picks fold map-side)") {
    val p = plan(graft.operators.Streaming.ohlcBars)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
             .findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n${p.take(800)}")
    // agg exchange + output sort only
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"OHLC must be a single-shuffle aggregate:\n${p.take(800)}")
  }

  test("text_perplexity broadcasts the vocabulary-bounded LM table") {
    val p = plan(graft.operators.TextAnalysis.textPerplexity)
    assert(p.contains("BroadcastHashJoin"),
      s"LM scoring join should broadcast the model:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"))
  }

  test("runtime bloom filter prunes the fact side of a selective fact-fact join") {
    // THE 100 TB fact-fact join mechanism: when one shuffle-join side has
    // a selective filter, Catalyst injects a bloom filter built from it
    // into the other side's scan stage, so most of the big side drops
    // BEFORE the shuffle. Local thresholds are sized for clusters, so
    // lower them to demonstrate the rewrite on test data; on defaults the
    // same plan appears once the creation side exceeds ~10 MB.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      import org.apache.spark.sql.functions._
      val li = graft.Tables.lineitem(spark, sf0001)
      val ord = graft.Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected a runtime bloom filter on the lineitem side:\n${p.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("join_interval_bin: the keyless time join is a bucket equi join") {
    val p = plan(Relational.joinIntervalBin)
    // the whole point: the range predicate must NOT plan as a nested
    // loop / cartesian — the bucket column carries it as an equi key
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"keyless interval join must ride the bucket key:\n${p.take(800)}")
    assert(p.contains("bkt"), s"expected the bucket join key:\n${p.take(600)}")
  }

  test("vector_pq: the ADC scan is one narrow pass — no exchange, no join") {
    // eager (codebook training) — explicit build. The whole point of PQ
    // with literal codebooks/LUTs: encode + ADC score is a projection
    // inside whole-stage codegen feeding TakeOrderedAndProject; nothing
    // shuffles, nothing joins, the corpus is scanned once.
    val p = graft.operators.Vectors.vectorPq.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PQ scan must not shuffle:\n${p.take(600)}")
    assert(!p.contains("Join"), s"PQ scan must not join:\n${p.take(600)}")
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 2,
      s"expected candidate-cut + rerank TakeOrdered pair:\n${p.take(600)}")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"corpus must be scanned once:\n${p.take(600)}")
  }

  test("dedup_semantic: cell assignment is a narrow kernel, pair join is equi") {
    // eager query (centroid training) — explicit build. The point of the
    // native nearest_centroid kernel: assignment adds NO exchange and no
    // n x k explode; the only corpus-sized shuffles are the cell-keyed
    // self-join's own exchanges.
    val p = graft.operators.Dedup.dedupSemantic.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroid"),
      s"expected the native assignment kernel:\n${p.take(800)}")
    assert(!p.toLowerCase.contains("cartesian"),
      s"pair generation must be the cell equi join:\n${p.take(800)}")
    // no vec_id-keyed aggregate before the join (the assignCells shape
    // this kernel replaces would hash-aggregate n x k rows by vec_id)
    assert(!p.contains("max_by"),
      s"assignment must not run the n x k max_by aggregate:\n${p.take(800)}")
  }

  test("vector_ivf_pq: prune + encode + score is one narrow pass, no exchange") {
    // eager (index training) — explicit build. The IVFADC serving shape:
    // assignment, probe filter, and residual ADC are all narrow kernels
    // in one whole-stage-codegen pass over a single corpus scan, feeding
    // the candidate-cut/rerank TakeOrdered pair — no shuffle, no join.
    val p = graft.operators.Vectors.vectorIvfPq.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("nearest_centroid") && p.contains("pq_residual_adc"),
      s"expected both native kernels:\n${p.take(800)}")
    assert(!p.contains("Exchange"), s"IVFADC scan must not shuffle:\n${p.take(600)}")
    assert(!p.contains("Join"), s"IVFADC scan must not join:\n${p.take(600)}")
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 2,
      s"expected candidate-cut + rerank TakeOrdered pair:\n${p.take(600)}")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"corpus must be scanned once:\n${p.take(600)}")
  }

  test("join_bloom probes the bitmap below the join, in the fact scan stage") {
    // eager query (bitmap build runs jobs) — audited with an explicit
    // build, not the plan-only helper
    val p = graft.operators.Relational.joinBloom.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"),
      s"expected the native bloom probe:\n${p.take(800)}")
    // the probe must sit BELOW the semi join: everything before the first
    // join operator in the plan string is the post-join pipeline, so the
    // probe's filter has to appear AFTER the join node (plan trees print
    // top-down)
    val joinAt = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findFirstMatchIn(p).map(_.start).getOrElse(fail("no join in plan"))
    val probeAt = p.indexOf("bloom_might_contain")
    assert(probeAt > joinAt,
      s"bloom probe must prune below the join, not above it:\n${p.take(800)}")
  }

  test("corpus_mix broadcasts the per-source rates onto the document stream") {
    val p = plan(graft.operators.Corpus.corpusMix)
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast, not shuffle the corpus:\n${p.take(800)}")
    // the single-row n_min attach is a broadcast nested loop (fine);
    // an unbroadcast cartesian product is not
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("sessionize_gaps: both windows and the aggregate ride one user shuffle") {
    val p = plan(graft.operators.Streaming.sessionizeGaps)
    assert("Window".r.findAllIn(p).size >= 2, p.take(600))
    // user-keyed exchange + final sort; the second window and the
    // per-session aggregate must reuse the user partitioning
    assert("Exchange".r.findAllIn(p).size <= 3,
      s"events must shuffle once for sessionization:\n${p.take(800)}")
  }

  test("span_dedup: global df via span-keyed window, no self-join") {
    val p = plan(graft.operators.TextAnalysis.spanDedup)
    assert(p.contains("Window"), p.take(600))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"))
    assert("Join".r.findAllIn(p).isEmpty,
      s"df must ride the window, not a join:\n${p.take(800)}")
  }

  test("outlier_mad / agg_histogram_eqd broadcast their tiny stats tables") {
    val pm = plan(graft.operators.Relational.outlierMad)
    assert(pm.contains("BroadcastHashJoin"), pm.take(600))
    val ph = plan(graft.operators.Relational.aggHistogramEqd)
    assert(ph.contains("BroadcastNestedLoopJoin") ||
           ph.contains("BroadcastHashJoin"),
      s"single-row edges must broadcast:\n${ph.take(600)}")
    assert(!ph.contains("CartesianProduct"))
  }

  test("knn_join_lsh joins bands on (tbl, sig), never a cartesian product") {
    val p = plan(Vectors.knnJoinLsh)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"kNN candidates must come from the band equi-join:\n${p.take(800)}")
    assert(p.contains("Window"), "per-vector rank window expected")
    assert(p.contains("dot_product"),
      "native dot kernel expected in the plan (banding + norm-scored pairs)")
  }

  test("ts_ewma/ts_holt: one user-keyed exchange feeds the sequential pass") {
    Seq(graft.operators.TimeSeries.tsEwma,
        graft.operators.TimeSeries.tsHolt).foreach { q =>
      val p = plan(q)
      assert(p.contains("MapPartitions"),
        s"${q.name}: the recurrence pass is missing")
      // one hash exchange (repartition by user) + one range exchange (the
      // presentation sort) — a window/join formulation would add more
      assert("Exchange".r.findAllIn(p).size <= 2, s"${q.name}: ${p.take(800)}")
    }
  }

  test("ts_autocorr: the three lags share one window; events scanned once") {
    val p = plan(graft.operators.TimeSeries.tsAutocorr)
    assert("FileScan".r.findAllIn(p).size == 1,
      s"events must be scanned exactly once:\n${p.take(800)}")
    assert("Window".r.findAllIn(p).size == 1,
      "lag columns must share a single type-keyed window sort")
  }

  test("ts_changepoint windows run over the reduced series frame") {
    val df = graft.operators.TimeSeries.tsChangepoint.fn(spark, sf0001)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    // every window sits above the (type, day) aggregate, never raw events
    wins.foreach { w =>
      assert(w.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, s"window over raw events:\n$w")
      assert(w.partitionSpec.nonEmpty, "unpartitioned window in changepoint")
    }
  }

  test("dq_referential joins key-count frames, not raw child rows") {
    val p = plan(Pipeline.dqReferential)
    // r11 melt: ONE (edge, fk) key-count aggregate for all 7 edges and
    // ONE (edge, pk) distinct for all 7 parents feed the join — child
    // keys still aggregate (partial+final) BEFORE the parent join, and
    // the exchange count is edge-count-independent
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(800))
    assert("Exchange hashpartitioning\\(edge".r.findAllIn(p).size <= 2,
      s"the melted child side must ride one (edge, fk) exchange:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("graph_jaccard reuses the posting-list pair generator") {
    val p = plan(Pipeline.graphJaccard)
    assert(p.contains("ordered_pairs") || p.contains("OrderedPairs") ||
      "Generate".r.findAllIn(p).size >= 1,
      "pairs must stream from posting lists, not a self-join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-30 must not be a global sort")
  }

  test("scd2_history: change-capture and validity windows ride ONE user exchange") {
    val p = plan(graft.operators.Streaming.scd2)
    assert("Window".r.findAllIn(p).size >= 2,
      s"lag change-capture + lead/row_number windows expected:\n${p.take(600)}")
    // one user-keyed hash exchange; the filter preserves the sort so the
    // second window stack adds NO exchange; + the presentation range sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"all three window functions must share the user partitioning:\n${p.take(800)}")
    assert("FileScan".r.findAllIn(p).size == 1, "events scanned once")
  }

  test("text_bm25: the term filter sits below the aggregate; dims broadcast") {
    val p = plan(graft.operators.TextAnalysis.textBm25)
    // hits-only shuffles: the IN filter must appear under the partial agg
    assert(p.contains("IN (spark,merge,window)"),
      s"query-term filter missing from the plan:\n${p.take(600)}")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "df and dl attachments must broadcast, never shuffle the hits")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
  }

  test("text_inverted_index: posting heads are capped map-side (WindowGroupLimit)") {
    val p = plan(graft.operators.TextAnalysis.textInvertedIndex)
    // the rank<=8 filter must compile to a partial WindowGroupLimit so at
    // most 8 rows per token leave each mapper — collect_list never sees a
    // full posting list (the stopword-at-100TB guard)
    assert(p.contains("WindowGroupLimit"),
      s"rank cap must push to the map side:\n${p.take(800)}")
    assert(p.contains("partial_collect_list"),
      "posting heads must combine partially before the final aggregate")
    assert(p.contains("TakeOrderedAndProject"), "top-30 must not global-sort")
  }

  test("text_boilerplate: segment df joins back without reshuffling segments") {
    val p = plan(graft.operators.TextAnalysis.textBoilerplate)
    assert("Generate posexplode".r.findAllIn(p).size >= 1,
      s"segmentation must be a generator, not a join:\n${p.take(600)}")
    // the stitch is a partial+final ObjectHashAggregate whose lists are
    // bounded by segments-per-document
    assert(p.contains("partial_collect_list"),
      "per-doc stitch lists must combine partially")
    assert(!p.contains("CartesianProduct"))
  }

  test("attribution_linear: no purchase x click pairs — three windows, one sort") {
    val p = plan(graft.operators.Streaming.attributionLinear)
    assert("Join".r.findAllIn(p).isEmpty,
      s"credits must ride the suffix-sum window, never a pair join:\n${p.take(800)}")
    // user-keyed exchange + campaign agg exchange + presentation sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"the three window functions must share one user sort:\n${p.take(800)}")
    assert(p.contains("In(event_type"),
      "the click/purchase filter must push into the parquet scan")
  }

  test("ts_anomaly: both quantiles share one profile-cell window exchange") {
    val p = plan(graft.operators.TimeSeries.tsAnomaly)
    assert("FileScan".r.findAllIn(p).size == 1,
      s"events must reduce to the series frame once:\n${p.take(800)}")
    assert("Window".r.findAllIn(p).size == 2, "med + mad window stack expected")
    // series agg + ONE (type, hod) window exchange + presentation sort —
    // a per-window hour(bkt) alias would re-exchange between the windows
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"med and mad must partition on the same materialized hod:\n${p.take(800)}")
  }

  test("resample_interp: the lead window runs over the series, gaps are generated") {
    val p = plan(graft.operators.Streaming.resampleInterp)
    // ONE series-sized window; grid rows are born in the explode ABOVE it
    // (the grid-windowed formulation measured 40s vs 2s at sf0.1)
    assert("Window".r.findAllIn(p).size == 1,
      s"exactly one lead window over observed buckets expected:\n${p.take(800)}")
    assert(p.contains("Generate explode"),
      "gap points must be generated per segment, not joined from a grid")
    assert("Join".r.findAllIn(p).isEmpty,
      s"no grid left-join — segments carry v0/v1 with them:\n${p.take(800)}")
  }

  test("text_collocations: exactly two corpus passes, one broadcast join") {
    val p = plan(graft.operators.TextAnalysis.textCollocations)
    assert("FileScan".r.findAllIn(p).size == 2,
      s"unigram + bigram generators are the floor; totals and both " +
        s"unigram attachments must not rescan:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"),
      "unigram-count attachment should broadcast at dim scale")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "scalar totals must ride windows, not cross joins")
  }

  test("event_paths: rank window and path collect share ONE user exchange") {
    val p = plan(graft.operators.Streaming.eventPaths)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"window and per-user aggregate must reuse one user shuffle:\n${p.take(800)}")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-20 path cut must be TakeOrderedAndProject, not a global sort")
  }

  test("dq_uniqueness: each table scan reads only its key columns") {
    val p = plan(graft.operators.Pipeline.dqUniqueness)
    // column pruning must reach every scan: non-key payload columns
    // (fact comments, prices, document text) stay out of ReadSchema
    // schema-token forms: bare "embedding"/"text" would false-match the
    // fixture paths (embeddings.parquet) in FileScan locations
    for (c <- Seq("l_comment", "l_extendedprice", "o_totalprice",
                  "text:string", "embedding:array"))
      assert(!p.contains(c), s"key census must not read payload column $c")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "key counts must be partial+final hash aggregation")
  }

  test("join_pit: the interval lookup is an equi join on user_id") {
    val p = plan(graft.operators.Streaming.joinPit)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"PIT join must hash on user_id with the interval as filter:\n${p.take(800)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval predicate must ride the equi join, not a nested loop")
  }

  test("vector_filtered_topk: the label predicate reaches the parquet scan") {
    val p = plan(graft.operators.Vectors.vectorFilteredTopk)
    assert(p.contains("PushedFilters:") && p.contains("EqualTo(label,3)"),
      s"metadata filter must push into the scan, not post-filter:\n${p.take(800)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("agg_weighted_median: both windows ride one group-keyed exchange") {
    val p = plan(graft.operators.Relational.aggWeightedMedian)
    assert("hashpartitioning\\(flag".r.findAllIn(p).size == 1,
      s"cumulative and total windows must share one exchange:\n${p.take(800)}")
  }

  test("vector_matryoshka_topk: both cuts are TakeOrderedAndProject") {
    val p = plan(graft.operators.Vectors.vectorMatryoshkaTopk)
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"coarse top-100 and exact-audit top-20 are per-partition " +
        s"top-k merges, never global sorts:\n${p.take(800)}")
  }

  test("agg_moments: one partial+final aggregate over a 2-column scan") {
    val p = plan(Relational.aggMoments)
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"power sums must be one partial+final pair, not stacked aggs:\n" +
        p.take(800))
    assert(p.contains("l_returnflag") && p.contains("l_quantity") &&
      !p.contains("l_extendedprice"),
      "scan must prune to the two referenced lineitem columns")
  }

  test("ts_theil_sen: pair join and rank window are event_type-keyed") {
    val p = plan(graft.operators.TimeSeries.tsTheilSen)
    assert(!p.contains("CartesianProduct"))
    // every window sort is partitioned — the series self-join must not
    // plan an unpartitioned global sort anywhere
    assert(!p.linesIterator.exists(l =>
        l.contains("Window ") && !l.contains("event_type")),
      s"windows must partition by event_type:\n${p.take(800)}")
  }

  test("corpus_sample_balanced: minority size broadcasts, rank is lang-keyed") {
    val p = plan(graft.operators.Corpus.corpusSampleBalanced)
    assert(p.contains("BroadcastExchange") ||
           p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row minority size must broadcast, never shuffle:\n" +
        p.take(800))
    assert(p.contains("row_number"), "rank window present")
  }

  test("vector_range_search: queries broadcast; corpus never shuffles " +
       "before the radius cut") {
    val p = plan(graft.operators.Vectors.vectorRangeSearch)
    assert(p.contains("BroadcastExchange") ||
           p.contains("BroadcastNestedLoopJoin"),
      s"query rows must broadcast:\n${p.take(800)}")
    // the only wide exchange allowed is the query_id window over the
    // tau-survivors: no aggregate/join exchange on the full corpus
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"at most the survivor window's exchange:\n${p.take(1200)}")
  }

  test("text_vocab_growth: corpus-sized work is aggregate-only (windows " +
       "ride the 10-row histogram)") {
    val p = plan(graft.operators.TextAnalysis.textVocabGrowth)
    assert(p.contains("BroadcastExchange"),
      "max(doc_id) scalar must broadcast into both decile maps")
    // the running-sum window must sit ABOVE the decile aggregates
    // (frame ≤ 10 rows), i.e. below it in the plan string there is no
    // explode — generator output never feeds a window sort
    val winIdx = p.indexOf("Window")
    val genIdx = p.indexOf("Generate")
    assert(winIdx >= 0 && genIdx > winIdx,
      s"window must consume the aggregated histogram, not token rows:\n" +
        p.take(1200))
  }
  test("text_rake_keywords: explode -> partial+final agg -> top-k merge") {
    val p = plan(graft.operators.TextAnalysis.textRakeKeywords)
    assert(p.contains("Generate"), "expected the zipped token explode")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-30 must be a per-partition merge, not a global sort:\n${p.take(600)}")
  }

  test("session_concurrency: every sweep window is user- or day-keyed") {
    val p = plan(graft.operators.Streaming.sessionConcurrency)
    assert(!p.linesIterator.exists(l =>
        l.trim.startsWith("Window") && !l.contains("user_id") &&
          !l.contains("di")),
      s"no unpartitioned window may touch the event/delta timeline:\n${p.take(1000)}")
  }

  test("corpus_mix_temperature: shares ride the |langs|-row aggregate") {
    val p = plan(graft.operators.Corpus.corpusMixTemperature)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-lang counts must partial+final aggregate")
    assert(!p.contains("Generate"),
      "no explode anywhere — the mix is pure aggregate arithmetic")
  }
  test("graph_modularity: labels decorate edges by equi joins; no window") {
    // eager (shared labelprop artifact trains at build) — explicit run
    val p = Pipeline.graphModularity.fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange"),
      "the 2m scalar and vote argmaxes must broadcast, never shuffle wide")
  }

  test("catalog-wide: every unpartitioned window rides a bounded frame") {
    // The "No Partition Defined for Window" class of scale bug: a window
    // with an empty partitionSpec serializes its whole input through ONE
    // task. That is fine over a frame whose size is bounded by something
    // other than the corpus — an aggregate keyed by a small domain
    // (sources, langs, deciles) or a top-k GlobalLimit cut — and fatal
    // over anything corpus-proportional. Lock the structural invariant
    // for the WHOLE catalog: an unpartitioned window must sit above an
    // Aggregate or a GlobalLimit. (Residual risk — an aggregate keyed by
    // doc_id is corpus-sized and would still pass; the per-query audits
    // above pin the grouping keys for the known heavy hitters.)
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, Window => LWindow}
    val offenders = SparkEntry.catalog.filterNot(_.eager).flatMap { q =>
      val bare = q.fn(spark, sf0001).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      bare.collect {
        case w if w.child.collectFirst {
              case _: Aggregate => (); case _: GlobalLimit => ()
            }.isEmpty =>
          s"${q.name}: unpartitioned window over an unbounded frame:\n$w"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
  }

  test("corpus_prune_sweep: one corpus pass; grid points are predicates") {
    val p = plan(graft.operators.Corpus.corpusPruneSweep)
    // exactly one scan of documents — the threshold grid must not
    // re-read the corpus per tau
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"per-doc metrics + total scan only:\n${p.take(800)}")
  }

  test("ab_srm: arm counts ride the distinct's exchange, one day agg") {
    val p = plan(graft.operators.Streaming.abSrm)
    // distinct (day,user) + day rollup — nothing else may shuffle, and
    // the arm split must NOT add a second distinct
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"ab_srm grew an extra shuffle:\n${p.take(800)}")
  }

  test("ab_sequential: nested-loop joins only over post-aggregate frames") {
    val p = plan(graft.operators.Streaming.abSequential)
    // the spine x census cumulative join is a broadcast nested loop by
    // design — over two <=|days|-bounded frames; the corpus may only be
    // touched by the CACHED user-keyed aggregate (one exchange, rendered
    // once per consumer — count DISTINCT plan ids) and the day spine
    assert(!p.contains("CartesianProduct"), p.take(600))
    val distinctHashExchanges =
      "Exchange hashpartitioning[^\\[]*\\[plan_id=(\\d+)\\]".r
        .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(distinctHashExchanges <= 3,
      s"ab_sequential shuffle count grew ($distinctHashExchanges):\n" +
      p.take(800))
    assert(p.contains("InMemoryRelation"),
      "the 3-consumer user aggregate must be cached")
  }

  test("window_islands: rank window, island agg and rollup share the " +
       "user-hash exchange") {
    val p = plan(graft.operators.Windows.windowIslands)
    // distinct (user,day) partitions by user_id's hash; the window and
    // both user-keyed aggregates must reuse it — only the final bounded
    // streak-length aggregate may add one more exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"window_islands lost exchange reuse:\n${p.take(800)}")
  }

  test("vector_norm_census: no generator — the HOF fold stays per-row") {
    val p = plan(graft.operators.Vectors.vectorNormCensus)
    assert(!p.contains("Generate"),
      s"norm census must not explode the embedding column:\n${p.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"one bucket aggregate only:\n${p.take(800)}")
  }

  test("graph_reciprocity: the pair fold adds no self-join") {
    val p = plan(graft.operators.Streaming.graphReciprocity)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"least/greatest canonicalization must not join:\n${p.take(800)}")
  }

  test("dq_reconciliation: one lineitem aggregate + one order-key join") {
    val p = plan(graft.operators.Pipeline.dqReconciliation)
    // the reconciliation's inherent cost is two key exchanges plus the
    // bounded bucket rollup — a plan that re-reads or re-shuffles the
    // fact tables beyond that is wrong at 100 TB
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4,
      s"dq_reconciliation shuffle count grew:\n${p.take(800)}")
  }

  test("retention_dau_mau: no count-distinct EXPAND; day dim broadcasts") {
    val p = plan(graft.operators.Streaming.retentionDauMau)
    // the recency rewrite exists to avoid Spark's multi-count-distinct
    // Expand (3× the frame before the distinct shuffle) — its return is
    // the regression this lock guards
    assert(!p.contains("Expand"),
      s"recency aggregate replaced by count-distinct Expand:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"),
      s"observed-day dimension must broadcast:\n${p.take(800)}")
  }

  test("vector_kmeans_step: assignment join broadcasts the seed frame") {
    val p = plan(graft.operators.Vectors.vectorKmeansStep)
    // O(n·k·d) assignment must fan out against a BROADCAST 8×64 seed
    // frame; a shuffled join would re-key the exploded corpus by dim —
    // 64 shuffle groups for the whole corpus, a guaranteed hot-spot
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      s"seed join degraded to sort-merge:\n${p.take(800)}")
  }

  test("event_burst: range window and census share one user exchange") {
    val p = plan(graft.operators.Streaming.eventBurst)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"burst window and per-user aggregate must share the user " +
      s"partitioning:\n${p.take(800)}")
  }

  test("sample_bootstrap: the draw stays inside whole-stage codegen") {
    val p = plan(graft.operators.Relational.sampleBootstrap)
    // the splitmix+LCG rewrite exists to keep the per-(row×replicate)
    // draw in codegen integer arithmetic — an md5/conv reappearance in
    // the hot projection is the 15× regression the ladder measured
    assert(!p.contains("md5("), s"bootstrap draw re-grew a hash:\n${p.take(800)}")
  }
}
