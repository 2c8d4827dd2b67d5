package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Whole-registry plan audit, automated (was a manual judge/round-3 pass).
  * ONE planning pass over every registered query (executedPlan is built,
  * nothing is executed, except the handful of builds that eagerly compute
  * a broadcast scalar at sf0.001), two structural 100-TB gates:
  *
  *  1. No CartesianProduct anywhere — the one join shape that cannot
  *     survive a 100× scale-up under any partitioning. The broadcast
  *     nested-loop joins the registry does contain are deliberate 1-row
  *     scalar / bounded-codebook broadcasts (planned as BNLJ, never
  *     CartesianProduct).
  *  2. No float/double VECTOR column in any ShuffleExchangeExec output,
  *     outside an explicit reasoned allowlist. The round-8 matryoshka
  *     lesson (vectors through the rank exchange: 24.7 s at curve ×10;
  *     ids+score only: 5.4 s) was pinned for one query in PlanShapeSpec —
  *     this generalizes it registry-wide so the next regression is caught
  *     before it ships. Allowlisted queries move vectors through a shuffle
  *     exactly once by design (blocking joins that co-locate vectors by
  *     bucket/list id — the move that REPLACES an all-pairs exchange);
  *     each entry names why. A stale allowlist entry (query no longer
  *     shuffles vectors) fails the spec too, so the list cannot rot.
  *
  * AQE is disabled for the pass: AdaptiveSparkPlanExec hides the exchange
  * nodes behind a leaf wrapper before runtime; the static plan is the
  * honest shuffle inventory.
  */
class RegistryPlanAuditSpec extends SparkSpec {

  /** Why each allowlisted query may carry a vector column through ONE
    * shuffle exchange: the blocking move that replaces an all-pairs plan.
    * Everything else in the registry — brute/banded/binary/matryoshka
    * retrieval, the capstones, k-means, all quantized scoring (byte
    * arrays since r9) — exchanges ids+scores only.
    */
  private val vectorShuffleAllow: Map[String, String] = Map(
    "emb_ivf_topk" -> ("IVF probe join: each corpus vector moves exactly " +
      "once into its nProbe lists, keyed by list_id — the blocking " +
      "exchange that REPLACES the Q x N all-pairs plan; within-list " +
      "scoring then needs both float vectors co-located"),
    "emb_ivf_recall" -> "IVF arm of the recall eval — same single-move probe join as emb_ivf_topk",
    "emb_ivf_ndcg" -> "IVF arm of the nDCG eval — same single-move probe join as emb_ivf_topk",
    "emb_ivf_probe2" -> "multi-probe IVF (nProbe=2): each vector moves into 2 bounded lists, still O(corpus) exchange bytes",
    "emb_mrr_eval" -> "IVF arm of the MRR eval — same single-move probe join as emb_ivf_topk",
    "dedup_semantic" -> ("SemDeDup centroid blocking: each vector moves " +
      "once into its cluster bucket (cid-keyed exchange) for the " +
      "within-cluster verify join — the move that bounds candidates at " +
      "sum(n_c^2) instead of N^2"))

  test("registry-wide: no CartesianProduct; no vector column through a shuffle (reasoned allowlist)") {
    graft.functions.Hashing.register(spark)
    val dir = "/root/testdata/sf0.001"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val cartesians = Seq.newBuilder[String]
    val vectorOffenders = Seq.newBuilder[(String, Seq[String])]
    val vectorShufflers = Set.newBuilder[String]
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val plan =
          try SparkEntry.registry(name).build(spark, dir).queryExecution.executedPlan
          finally Caches.release()
        if (plan.toString.contains("CartesianProduct")) cartesians += name
        val vecCols = plan.collect { case e: ShuffleExchangeExec =>
          e.output.filter(_.dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          }).map(_.name)
        }.flatten.distinct
        if (vecCols.nonEmpty) {
          vectorShufflers += name
          if (!vectorShuffleAllow.contains(name))
            vectorOffenders += (name -> vecCols)
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val cart = cartesians.result()
    assert(cart.isEmpty, s"cartesian-product plans (scale bug): ${cart.mkString(", ")}")
    val off = vectorOffenders.result()
    assert(off.isEmpty,
      "vector columns cross a shuffle exchange without an allowlist reason " +
        "(the matryoshka lesson — carry ids+score, re-join vectors via " +
        "broadcast or blocking): " +
        off.map { case (n, cs) => s"$n(${cs.mkString(",")})" }.mkString("; "))
    val stale = vectorShuffleAllow.keySet.diff(vectorShufflers.result())
    assert(stale.isEmpty,
      s"stale vector-shuffle allowlist entries (no longer shuffle vectors — " +
        s"delete them): ${stale.mkString(", ")}")
  }

  /** Why each allowlisted query may plan a CartesianProduct ONLY when
    * broadcast is globally disabled: every entry is a join against a
    * provably bounded side (a 1-row aggregate scalar or a suite-bounded
    * constant), so the "cartesian" is O(N·1) — at any scale. In the
    * production configuration these plan as BroadcastNestedLoopJoin; the
    * no-broadcast pass exists to prove nothing ELSE degenerates.
    */
  private val noBroadcastCartesianAllow: Map[String, String] = Map.empty

  /** Extra vector-shuffle allowances that appear only with broadcast off:
    * joins whose small side is bounded by construction (query sets gated
    * to a benchmark suite, codebooks of k centroids) and broadcast in the
    * production plan. Each reason names the bound.
    */
  private val noBroadcastVectorAllow: Map[String, String] = Map(
    "dedup_embedding" -> ("sign-bucket blocking (cosineNearDupPairs): each " +
      "vector moves ONCE into its bucket-keyed exchange to co-locate " +
      "candidates — the move that replaces the all-pairs plan; O(corpus) " +
      "exchange bytes"),
    "dedup_threshold_sweep" -> ("same sign-bucket blocking exchange as " +
      "dedup_embedding — the sweep reuses one bucketed pair pass"),
    "dedup_vector_eval" -> ("banded-SRP verify: candidates are ids-only " +
      "through the (band,bucket) exchange; the flagged exchange is the " +
      "id-keyed RE-ENTRY join that scores surviving pairs — each vector " +
      "crosses it once per pair side, O(corpus) bytes"),
    "dedup_vector_incremental" -> ("posting-probe admission: probe " +
      "exchanges carry ints (pinned in PlanShapeSpec); the flagged " +
      "exchanges are the id-keyed re-entry joins for batch and corpus " +
      "vectors scoring surviving candidates — one move each"),
    "corpus_prepare_incremental" -> ("v9 vector arms: candidates are " +
      "ids-only through the (band,bucket) posting exchanges (index " +
      "probe, intra-shard pairs, and the one-shot batch twin); the " +
      "flagged exchanges are the id-keyed re-entry joins that score " +
      "surviving pairs from the session-pinned side tables — one move " +
      "per pair side, O(corpus) bytes, the dedup_vector_incremental " +
      "discipline applied to both arms"),
    "emb_banded_recall" -> ("recall eval: the banded arm re-joins query " +
      "and corpus vectors by id to score candidate pairs — the ids-only " +
      "candidate design's single re-entry move per side"),
    "emb_rerank" -> ("two-stage rerank: shortlist is ids+score; the " +
      "flagged exchange re-enters query vectors by id for the exact " +
      "rerank — one move of the (bounded) query set"),
    "vector_delete_propagation" -> ("same posting-probe admission shape " +
      "as dedup_vector_incremental over the PURGED index — probe " +
      "exchanges carry ints; the flagged exchanges are the id-keyed " +
      "re-entry joins for batch and surviving corpus vectors"))

  /** Column names that mean "the raw document text" (or its token-array
    * form — the same bytes, differently shaped). SURVEY claims "text never
    * shuffles" for the dedup/novelty/diff families; this is the registry-
    * wide enforcement. Short token/term columns (t, tok, w1, phrase…) are
    * deliberately NOT matched — shuffling single tokens keyed by token is
    * the standard shape; the gate is about full-document payloads.
    */
  private val rawTextNames = Set(
    "text", "toks", "tokens", "body", "content", "chunk", "chunks",
    "raw_text", "norm_text", "doc_text", "chunk_text", "sentence",
    "paragraph", "snippet")

  /** Why each allowlisted query may move a raw-text column through ONE
    * shuffle exchange: each entry is the single id-keyed re-entry join of
    * a decision computed on ids+digests (text moves once, never through
    * the decision exchanges).
    */
  private val textShuffleAllow: Map[String, String] = Map(
    "dedup_chunks" -> ("survivor reassembly: the keep/drop decision " +
      "shuffles (doc_id, idx, sha256) only; the flagged exchange is the " +
      "single doc_id-keyed re-entry join that rebuilds kept chunk text " +
      "from the original token arrays — text moves once, never through " +
      "the decision"))

  test("registry-wide with broadcast DISABLED: no cartesian, no vector through a shuffle") {
    // The sf0.001 blind spot where the round-8 (matryoshka) and round-9
    // (vector posting probe) scale bugs hid: at fixture size every join
    // broadcasts, so the default-config audit above never sees the
    // exchanges that appear at 100 TB when the "small" side outgrows the
    // threshold. Planning every query with
    // spark.sql.autoBroadcastJoinThreshold=-1 forces the shuffle-join
    // shape and makes those exchanges auditable. Explicit broadcast()
    // hints in production code still broadcast under this config — which
    // is the point: a side that is KNOWN bounded should be hinted, so the
    // plan does not silently flip to a vector-carrying shuffle at scale.
    graft.functions.Hashing.register(spark)
    val dir = "/root/testdata/sf0.001"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val cartesians = Seq.newBuilder[String]
    val vectorOffenders = Seq.newBuilder[(String, Seq[String])]
    val textOffenders = Seq.newBuilder[(String, Seq[String])]
    val cartesianed = Set.newBuilder[String]
    val vectorShufflers = Set.newBuilder[String]
    val textShufflers = Set.newBuilder[String]
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val plan =
          try SparkEntry.registry(name).build(spark, dir).queryExecution.executedPlan
          finally Caches.release()
        if (plan.toString.contains("CartesianProduct")) {
          cartesianed += name
          if (!noBroadcastCartesianAllow.contains(name)) cartesians += name
        }
        val vecCols = plan.collect { case e: ShuffleExchangeExec =>
          e.output.filter(_.dataType match {
            case ArrayType(FloatType | DoubleType, _) => true
            case _ => false
          }).map(_.name)
        }.flatten.distinct
        if (vecCols.nonEmpty) {
          vectorShufflers += name
          if (!vectorShuffleAllow.contains(name) &&
              !noBroadcastVectorAllow.contains(name))
            vectorOffenders += (name -> vecCols)
        }
        val txtCols = plan.collect { case e: ShuffleExchangeExec =>
          e.output.filter(a => rawTextNames.contains(a.name.toLowerCase) &&
            (a.dataType match {
              case org.apache.spark.sql.types.StringType => true
              case ArrayType(org.apache.spark.sql.types.StringType, _) => true
              case _ => false
            })).map(_.name)
        }.flatten.distinct
        if (txtCols.nonEmpty) {
          textShufflers += name
          if (!textShuffleAllow.contains(name))
            textOffenders += (name -> txtCols)
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    val cart = cartesians.result()
    assert(cart.isEmpty,
      s"cartesian-product plans under no-broadcast (either a real scale " +
        s"bug, or a bounded scalar join missing an explicit broadcast() " +
        s"hint): ${cart.mkString(", ")}")
    val off = vectorOffenders.result()
    assert(off.isEmpty,
      "vector columns cross a shuffle exchange under no-broadcast without " +
        "an allowlist reason (hint the bounded side with broadcast(), or " +
        "carry ids+score and re-join vectors): " +
        off.map { case (n, cs) => s"$n(${cs.mkString(",")})" }.mkString("; "))
    val staleCart = noBroadcastCartesianAllow.keySet.diff(cartesianed.result())
    assert(staleCart.isEmpty,
      s"stale no-broadcast cartesian allowlist entries: ${staleCart.mkString(", ")}")
    val staleVec = (noBroadcastVectorAllow.keySet ++ vectorShuffleAllow.keySet)
      .diff(vectorShufflers.result())
      .diff(vectorShuffleAllow.keySet) // default-pass staleness is checked above
    assert(staleVec.isEmpty,
      s"stale no-broadcast vector allowlist entries: ${staleVec.mkString(", ")}")
    val txtOff = textOffenders.result()
    assert(txtOff.isEmpty,
      "raw-text columns cross a shuffle exchange without an allowlist " +
        "reason (decide on ids+digests, re-enter text once by id): " +
        txtOff.map { case (n, cs) => s"$n(${cs.mkString(",")})" }.mkString("; "))
    val staleTxt = textShuffleAllow.keySet.diff(textShufflers.result())
    assert(staleTxt.isEmpty,
      s"stale text-shuffle allowlist entries: ${staleTxt.mkString(", ")}")
  }
}
