package graft

import org.apache.spark.sql.DataFrame

/** Semantic invariants of the statistical-inference layer — properties the
  * DuckDB hash-compare cannot express (it proves engine parity, not that
  * the statistics MEAN anything). All at sf0.001 via the registry builds.
  */
class InferencePropertiesSpec extends SparkSpec {

  private def run(name: String): Array[org.apache.spark.sql.Row] =
    try SparkEntry.registry(name).build(spark, sf()).collect()
    finally Caches.release()

  test("Kaplan-Meier survival is a valid, non-increasing curve") {
    val rows = run("ts_kaplan_meier").sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val km = rows.map(r => r.getDouble(4))
    assert(km.forall(s => s >= 0.0 && s <= 1.0), s"S(t) outside [0,1]: ${km.toSeq}")
    assert(km.sliding(2).forall { case Array(a, b) => b <= a + 1e-9; case _ => true },
      s"S(t) must be non-increasing: ${km.toSeq}")
    // at-risk counts strictly decrease as (d + c) leave the risk set
    val risk = rows.map(_.getLong(1))
    assert(risk.sliding(2).forall { case Array(a, b) => b < a; case _ => true })
  }

  test("Mann-Whitney U lies in [0, n0*n1] and is consistent with its z sign") {
    val r = run("stats_mannwhitney").head
    val (n0, n1, u0, z) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(u0 >= 0.0 && u0 <= n0.toDouble * n1.toDouble)
    // z > 0 iff U exceeds its null mean n0*n1/2
    assert((z > 0) == (u0 > n0.toDouble * n1.toDouble / 2.0))
  }

  test("bootstrap CI brackets the point estimate and is ordered") {
    val r = run("stats_bootstrap_ci").head
    val (point, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi)
    assert(lo <= point && point <= hi,
      s"point mean $point outside replicate range [$lo, $hi]")
  }

  test("Gini concentration stays in [0, 1)") {
    val rows = run("stats_gini")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini out of range for ${r.getString(0)}: $g")
    }
  }

  test("MMR round 1 is the pure-relevance pick; selections are distinct") {
    val rows = run("emb_mmr_select").sortBy(_.getInt(0))
    assert(rows.length == 8)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "MMR re-selected a vector")
    // round-1 score is -lambda*dq <= 0 (pure relevance, no diversity term)
    assert(rows.head.getDouble(2) <= 0.0)
    // later rounds trade relevance for diversity - scores must not be the
    // monotone FPS radius pattern; just pin that each is finite
    assert(rows.forall(r => !r.getDouble(2).isNaN))
  }

  test("mutual information is non-negative and bounded by H(next)") {
    val r = run("evt_markov_infogain").head
    val (hNext, hCond, gain) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(hNext >= hCond - 1e-6, s"conditioning increased entropy: $hNext < $hCond")
    assert(gain >= -1e-6 && gain <= hNext + 1e-6)
  }

  test("ANOVA F is positive and its sums of squares are non-negative") {
    val r = run("stats_anova").head
    assert(r.getDouble(2) >= 0.0, "SSB negative")
    assert(r.getDouble(3) >= 0.0, "SSW negative")
    assert(r.getDouble(4) > 0.0, "F must be positive on the fixture")
  }

  test("SPRT decisions are well-formed and the cumulative LLR is a prefix sum") {
    val rows = run("stats_sprt").sortBy(_.getString(0))
    assert(rows.nonEmpty)
    val decisions = rows.map(_.getString(2)).toSet
    assert(decisions.subsetOf(Set("accept_h0", "accept_h1", "continue")))
    // once |cum| crosses ln(19) on the last day, the decision must match
    val last = rows.last
    val cum = last.getDouble(1)
    val want = if (cum >= 2.944438979) "accept_h1"
      else if (cum <= -2.944438979) "accept_h0" else "continue"
    assert(last.getString(2) == want)
  }

  test("ABC classes partition the parts and A holds the largest revenue share") {
    val rows = run("orders_abc_analysis")
    val byCls = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byCls.keySet == Set("A", "B", "C"))
    assert(math.abs(byCls.values.sum - 1.0) < 1e-4, s"shares must sum to 1: $byCls")
    assert(byCls("A") >= byCls("B") && byCls("A") >= byCls("C"))
  }

  test("capstone v6 LM gate keeps the higher-scoring quartile boundary honest") {
    val rows = run("corpus_prepare_v6")
    assert(rows.nonEmpty)
    // train/val/test all present and every split's mean LM score is finite
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    rows.foreach(r => assert(!r.getDouble(4).isNaN))
  }
}
