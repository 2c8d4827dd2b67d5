package graft

import graft.operators.Envelope
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB levers must actually appear
  * in the plan, not just in comments: bucketed co-located joins (no
  * shuffle), partition pruning, filter pushdown.
  */
class PlanShapeSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val env = Envelope.withEnvelope(Tables.events(spark, sf()))
      env.select("event_id", "tenant_id", "value")
        .write.mode("overwrite").bucketBy(8, "tenant_id").sortBy("tenant_id")
        .option("path", s"$wh/t_left").saveAsTable("t_left")
      env.select(col("tenant_id"), col("event_type"))
        .write.mode("overwrite").bucketBy(8, "tenant_id").sortBy("tenant_id")
        .option("path", s"$wh/t_right").saveAsTable("t_right")

      val joined = spark.table("t_left").join(spark.table("t_right"), "tenant_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS t_left")
      spark.sql("DROP TABLE IF EXISTS t_right")
    }
  }

  test("partition pruning: event-type filter prunes partitioned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Envelope.withEnvelope(Tables.events(spark, sf()))
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(2000))
    assert(scan.contains("event_type"), scan.take(2000))
    // only the click partition's rows come back
    val total = Envelope.withEnvelope(Tables.events(spark, sf()))
      .filter(col("event_type") === "click").count()
    assert(q.count() == total)
  }

  test("predicate pushdown reaches the parquet scan for q1") {
    val plan = SparkEntry.registry("q1_pricing").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.take(2000))
  }

  test("IVF probe join keeps the corpus distributed (no corpus-side broadcast)") {
    // At 100 TB the "queries" side of the probe IS the corpus; a broadcast
    // hint there is a guaranteed OOM. Pin the plan: the only broadcast in
    // the seeded variant is the nLists-row codebook, and the probe
    // self-join on list_id is a shuffle join. Auto-broadcast is disabled so
    // a hint (the regression this guards against) is the only way a
    // BroadcastExchange could appear.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val embs = Tables.embeddings(spark, sf())
      val seeded = graft.scale.Similarity
        .ivfSeededTopK(embs, "vec_id", "embedding", k = 3, nLists = 8)
      val plan = seeded.queryExecution.executedPlan.toString
      // The probe self-join on list_id must be a shuffle join: the corpus
      // side may never build a broadcast relation. (The codebook crossJoin
      // is a BroadcastNestedLoopJoin of nLists rows — legitimate, and
      // printed once per reference to the cached assignment frame, so the
      // join TYPE on list_id is the stable thing to pin, not a broadcast
      // count over the whole plan string.)
      assert(plan.contains("SortMergeJoin [list_id") ||
        plan.contains("ShuffledHashJoin [list_id"), plan.take(3000))
      assert(!plan.contains("BroadcastHashJoin [list_id"),
        s"corpus-side broadcast on the probe join:\n${plan.take(3000)}")
      val kmeans = graft.scale.Similarity
        .ivfTopK(embs, "vec_id", "embedding", k = 3, nLists = 4)
      val kplan = kmeans.queryExecution.executedPlan.toString
      assert(!kplan.contains("BroadcastHashJoin [list_id"), kplan.take(3000))
      assert(kplan.contains("SortMergeJoin [list_id") ||
        kplan.contains("ShuffledHashJoin [list_id"), kplan.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("semantic near-dup verify join is corpus-distributed (cluster id shuffle, no broadcast)") {
    // Same 100 TB rule as the IVF probe: the within-cluster self-join must
    // shuffle on list_id — broadcasting the assigned corpus would pin the
    // whole table on every executor. The only legitimate broadcast is the
    // nLists-row codebook crossJoin.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val pairs = graft.scale.Similarity.semanticNearDupPairs(
        Tables.embeddings(spark, sf()), "vec_id", "embedding",
        threshold = 0.35, nLists = 8)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin [list_id") ||
        plan.contains("ShuffledHashJoin [list_id"), plan.take(3000))
      assert(!plan.contains("BroadcastHashJoin [list_id"),
        s"corpus-side broadcast on the cluster verify join:\n${plan.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      graft.Caches.release()
    }
  }

  test("per-doc repetition stat is a pure map: no exchange before the sort") {
    // The native kernel keeps the statistic per-row; the only exchange in
    // the whole plan is the final presentation orderBy's range partition.
    // (The explode composition this replaced shuffled every n-gram row.)
    graft.functions.Hashing.register(spark)
    val plan = SparkEntry.registry("txt_repetition").build(spark, sf())
      .queryExecution.executedPlan.toString
    val nExchange = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(nExchange == 1, s"expected only the orderBy exchange:\n${plan.take(3000)}")
    assert(!plan.contains("Generate"), s"no explode expected:\n${plan.take(3000)}")
  }

  test("contamination probe is a semi-join; eval side never carries text") {
    val plan = SparkEntry.registry("txt_contamination").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("flipped-role set-probe decontamination is a pure map: zero exchanges") {
    // the suite gram set collects at build; the corpus-side probe itself
    // must plan as scan -> project -> filter with NO shuffle and NO join —
    // the exact claim that lets the corpus never move at 100 TB
    graft.functions.Hashing.register(spark)
    val d = graft.sources.Tables.documents(spark, sf())
    val bench = d.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val plan = graft.scale.Contamination
      .overlapSetProbe(bench, d, "doc_id", shingleN = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"probe must not join:\n${plan.take(3000)}")
  }

  test("keepFirst dedup aggregates map-side (partial min_by), no sort-window") {
    val e = graft.sources.Tables.events(spark, sf())
    val plan = graft.operators.Dedup
      .keepFirst(e, Seq("event_id"), Seq("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min_by") || plan.contains("partial_minby") ||
      (plan.contains("HashAggregate") && plan.contains("min_by")),
      s"expected a partial-aggregating min_by plan:\n${plan.take(3000)}")
    assert(!plan.contains("Window"), s"no window expected:\n${plan.take(3000)}")
  }

  test("range sharding broadcasts only the boundary row; data side unshuffled") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val tagged = graft.scale.Sharding.rangeShards(
        Tables.documents(spark, sf()), "n_chars", nShards = 8)
      val plan = tagged.queryExecution.executedPlan.toString
      // one broadcast (the 7 boundary doubles); no hash/range exchange of
      // the data side before assignment
      assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      assert(!plan.contains("Exchange rangepartitioning"), plan.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("per-key top-k runs through WindowGroupLimit, not a full sort") {
    // Spark 3.5+ rewrites rank()<=k into a per-partition group limit —
    // the reason a native bounded-heap operator is NOT needed here (the
    // build-ladder's compose-first rule). Pin it so a query rewrite that
    // silently loses the optimization gets caught.
    val plan = SparkEntry.registry("topk_per_priority").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("vocab top-k is TakeOrderedAndProject, never a full-vocabulary sort") {
    // The heavy-hitter tail: ranking the aggregated vocabulary through one
    // unpartitioned window sorts (and single-partitions) the whole key
    // space. orderBy+limit plans as TakeOrderedAndProject — per-partition
    // bounded heaps, driver merges k·nPartitions rows — so the vocabulary
    // is never globally sorted; only the 50 survivors see a window.
    graft.functions.Hashing.register(spark)
    val plan = SparkEntry.registry("txt_vocab_topk").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("domain cap rides WindowGroupLimit; fixed-n sample is TakeOrdered") {
    graft.functions.Hashing.register(spark)
    val capPlan = SparkEntry.registry("sample_domain_cap").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(capPlan.contains("WindowGroupLimit"), capPlan.take(3000))
    val fixPlan = SparkEntry.registry("sample_fixed_n").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(fixPlan.contains("TakeOrderedAndProject"), fixPlan.take(3000))
  }

  test("A-ES weighted draw is a TakeOrdered heap; shard shuffle never single-partitions") {
    graft.functions.Hashing.register(spark)
    // the weighted sample's "one scan + top-n" claim: the pow-keyed draw
    // must plan as per-partition heaps, not a global sort
    val aes = SparkEntry.registry("sample_weighted").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(aes.contains("TakeOrderedAndProject"), aes.take(3000))
    // the training-shard shuffle claims per-shard ranks only — no global
    // single-partition exchange anywhere in the plan
    val sh = SparkEntry.registry("corpus_shuffle_shards").build(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!sh.contains("Exchange SinglePartition"),
      s"shard shuffle must not single-partition:\n${sh.take(3000)}")
  }

  test("no cached frames survive a stage-persisted query + Caches.release") {
    Caches.release()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.registry("dedup_minhash_lsh").build(spark, sf())
      .write.format("noop").mode("overwrite").save()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "expected the MinHash stage frames to be cached during the query")
    Caches.release()
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "Caches.release must unpersist every tracked stage frame")
  }

  test("skyline window is a growing frame, never the O(n^2) shrinking RANGE frame") {
    // Spark executes (k FOLLOWING, UNBOUNDED FOLLOWING) frames by
    // recomputing the aggregate per row — the 97 s regression this pin
    // keeps dead. The O(n) rewrite uses only growing frames.
    val plan =
      try SparkEntry.registry("skyline_orders").build(spark, sf())
        .queryExecution.executedPlan.toString
      finally Caches.release()
    assert(!plan.toLowerCase.contains("unboundedfollowing"), plan.take(3000))
  }

  test("covariance product generation runs through the native kernel") {
    // emb_pca_power shares the same triPairSums path but hides it behind
    // a lineage barrier (localCheckpoint truncates the visible plan), so
    // the pin lives on the unbarriered emb_dim_cov.
    graft.functions.Hashing.register(spark)
    val plan =
      try SparkEntry.registry("emb_dim_cov").build(spark, sf())
        .queryExecution.executedPlan.toString
      finally Caches.release()
    assert(plan.contains("graft_tri_products"),
      s"emb_dim_cov must use the fused kernel, not the interpreted HOF:\n${plan.take(2000)}")
  }

  test("burst/attribution window joins are bucketed equi-joins, never per-user crosses") {
    Seq("evt_burst_windows", "evt_attribution_linear").foreach { q =>
      val plan =
        try SparkEntry.registry(q).build(spark, sf())
          .queryExecution.executedPlan.toString
        finally Caches.release()
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must stay an equi-join on the bucket key:\n${plan.take(2000)}")
    }
  }

  test("matryoshka scoring runs through the native prefix-dot kernel") {
    graft.functions.Hashing.register(spark)
    Seq("emb_matryoshka_eval", "emb_matryoshka_topk").foreach { q =>
      val plan =
        try SparkEntry.registry(q).build(spark, sf())
          .queryExecution.executedPlan.toString
        finally Caches.release()
      assert(plan.contains("graft_dot_range"),
        s"$q must score via the codegen'd kernel, not interpreted HOF folds:\n${plan.take(2000)}")
      // the query side is broadcast against the corpus scan — never a
      // shuffled all-pairs join
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"$q query side must broadcast:\n${plan.take(2000)}")
    }
  }

  test("rag_context_pack ranks all queries in ONE melted window pass") {
    val plan =
      try SparkEntry.registry("rag_context_pack").build(spark, sf())
        .queryExecution.executedPlan.toString
      finally Caches.release()
    // ONE hash shuffle on query_id feeds both the rank window and the
    // cum-sum window (same partitioning + sort — the melted layout's
    // point); per-retrieval-query window subtrees would shuffle 3 times
    val rankExchanges =
      "Exchange hashpartitioning\\(query_id".r.findAllIn(plan).length
    assert(rankExchanges == 1,
      s"expected exactly one query_id shuffle, found $rankExchanges:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("matryoshka retrieval: no shuffle exchange carries a vector column") {
    // the round-8 fix pinned: the Q×N shortlist window exchanges
    // (ids, score) rows only, and the 64-dim rerank re-enters via
    // broadcast — with vectors in the exchange, curve ×10 measured 24.7 s
    // against ~3 s for the slim layout
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = SparkEntry.registry("emb_matryoshka_topk").build(spark, sf())
        .queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty, s"expected at least one exchange:\n$plan")
      shuffles.foreach { e =>
        val names = e.output.map(_.name.toLowerCase)
        assert(!names.exists(n =>
          n.contains("qv") || n.contains("nv") || n.contains("embedding")),
          s"vector column crosses a shuffle: ${names.mkString(", ")}")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Caches.release()
    }
  }

  test("vector admission probe exchanges carry ints only, even with broadcast disabled") {
    // closes the sf0.001 blind spot the round-9 verdict named: at fixture
    // size every join broadcasts, so the registry-wide vector-shuffle
    // audit never saw the posting-probe exchange that appears at scale.
    // With broadcast joins off (no hints on this path), the (band_idx,
    // bucket) collision exchanges must carry NO array column — the float
    // vectors re-enter by id once, downstream of the distinct.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = graft.sources.Tables.embeddings(spark, sf())
        .select("vec_id", "embedding")
      val idxSrc = e.filter(col("vec_id") % 4 =!= 0)
      val batch = e.filter(col("vec_id") % 4 === 0)
      val plan = graft.scale.Similarity.vectorBandPlanFor(idxSrc)
      val postings = graft.scale.Similarity.vectorPostings(
        idxSrc, "vec_id", "embedding", plan)
      val physical = graft.scale.Similarity.admitAgainstVectors(
          postings, idxSrc, batch, "vec_id", "embedding", 0.99, plan)
        .queryExecution.executedPlan
      val shuffles = physical.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex
      }
      assert(shuffles.nonEmpty, s"expected real exchanges with broadcast off:\n$physical")
      val probeExchanges = shuffles.filter(
        _.output.exists(a => a.name == "bucket" || a.name == "band_idx"))
      assert(probeExchanges.nonEmpty, "expected a posting-probe exchange")
      probeExchanges.foreach { ex =>
        assert(!ex.output.exists(_.dataType
            .isInstanceOf[org.apache.spark.sql.types.ArrayType]),
          s"posting exchange carries an array column: ${ex.output.mkString(", ")}")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Caches.release()
    }
  }
}
