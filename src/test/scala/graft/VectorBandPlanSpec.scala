package graft

import graft.scale.Similarity
import graft.scale.Similarity.VectorBandPlan
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the corpus-scaled SRP band planner (the vector twin of
  * NearDupSpec's bandPlanAuto pins): minimality, monotonicity in the
  * corpus size, and both error-rate guarantees — the properties the
  * banded dedup/admission oracles rely on when they replay the search
  * from COUNT(*).
  */
class VectorBandPlanSpec extends AnyFunSuite {

  private val Ns = Seq(100L, 375L, 520L, 1000L, 2080L, 20800L, 208000L,
    1000000L, 50000000L, 1000000000L)

  /** Brute-force reimplementation of the search space (not the search):
    * every (b, r) pair with minimal r for its b under the integer
    * candidate ceiling.
    */
  private def feasibleSet(n: Long, dupCosine: Double, minRecall: Double,
                          f: Long): Seq[VectorBandPlan] =
    (1 to 64).flatMap { b =>
      (1 to 30).find(r => n * b <= f * (1L << r))
        .map(r => VectorBandPlan(b, r))
        .filter(_.candidateProbability(dupCosine) >= minRecall)
    }

  test("chosen plan is feasible and has provably minimal bands") {
    for (n <- Ns) {
      val plan = Similarity.vectorBandPlanAuto(n)
      val feasible = feasibleSet(n, 0.99, 0.95, 64L)
      assert(feasible.nonEmpty, s"n=$n should be feasible")
      assert(plan == feasible.minBy(_.bands),
        s"n=$n: chose $plan, brute-force minimum ${feasible.minBy(_.bands)}")
      // recall floor at the dup cosine level
      assert(plan.candidateProbability(0.99) >= 0.95)
      // integer candidate ceiling: expected false candidates per vector at
      // background (orthogonal) similarity <= 64 by the union bound
      assert(n * plan.bands <= 64L * (1L << plan.bitsPerBand))
    }
  }

  test("geometry grows with the corpus: bands and bits are monotone in n") {
    val plans = Ns.map(Similarity.vectorBandPlanAuto(_))
    plans.sliding(2).foreach { case Seq(a, b) =>
      assert(b.bitsPerBand >= a.bitsPerBand,
        s"bits must not shrink as n grows: $a -> $b")
      assert(b.bands >= a.bands, s"bands must not shrink as n grows: $a -> $b")
    }
    // and it actually MOVES — the whole point vs the fixed 4x4 geometry
    assert(plans.last.bitsPerBand > plans.head.bitsPerBand)
  }

  test("fixed geometry is the quadratic trap the planner avoids") {
    // at n=1e9 a fixed (4, 4) plan expects n*4/16 = 250M false candidates
    // PER VECTOR; the auto plan keeps it <= 64
    val fixed = VectorBandPlan(4, 4)
    val n = 1000000000L
    assert(n * fixed.bands / (1L << fixed.bitsPerBand) > 100000000L)
    val auto = Similarity.vectorBandPlanAuto(n)
    assert(n * auto.bands <= 64L * (1L << auto.bitsPerBand))
  }

  test("infeasible targets throw instead of silently overshooting") {
    // a lax dup definition (cosine 0.5 -> per-bit p ~ 0.667) cannot reach
    // 0.99 recall at the bit widths a 1e9 corpus forces
    intercept[IllegalArgumentException] {
      Similarity.vectorBandPlanAuto(1000000000L, dupCosine = 0.5,
        minRecall = 0.99)
    }
    intercept[IllegalArgumentException] {
      Similarity.vectorBandPlanAuto(0L)
    }
  }

  test("the SQL replay constants are the exact doubles the planner uses") {
    // the oracles embed srpBitCollisionProb(dupCosine) via Double.toString;
    // round-tripping through the decimal form must be lossless or the two
    // engines could disagree at a recall boundary
    val p = Similarity.srpBitCollisionProb(0.99)
    assert(p.toString.toDouble == p)
    assert(math.abs(p - 0.954946586) < 1e-8)
  }
}
