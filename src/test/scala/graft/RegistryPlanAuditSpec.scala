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
}
