package graft

import graft.scale.Agreement
import org.apache.spark.sql.functions._

/** HAND-COMPUTED known-answer values for the agreement trio. The DuckDB
  * oracle parity cannot catch a formula error (the oracle mirrors the
  * same formula and would hash-match a shared mistake); these fixtures
  * were worked out on paper from the published definitions.
  */
class AgreementSpec extends SparkSpec {

  import spark.implicits._

  test("Cohen's kappa: po=0.6, pe=0.5, kappa=0.2 on the hand-built table") {
    // 10 items: agree on 6 (4×A/A + 2×B/B); X marginals A=5,B=5;
    // Y marginals A=7,B=3 → pe = (5·7 + 5·3)/100 = 0.5
    val d = (Seq.fill(4)(("A", "A")) ++ Seq.fill(2)(("B", "B")) ++
      Seq.fill(1)(("A", "B")) ++ Seq.fill(3)(("B", "A")))
      .toDF("x", "y")
    val r = Agreement.cohenKappa(d, "x", "y").head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("agree") == 6L)
    assert(r.getAs[Double]("po") == 0.6)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.2)
  }

  // shared 3-rater fixture: units (AAA, AAA, AAB, ABB, BBB, BBB)
  //   pooled: A=9, B=9, N=18
  private def melt3 = Seq(
    (1L, "A"), (1L, "A"), (1L, "A"),
    (2L, "A"), (2L, "A"), (2L, "A"),
    (3L, "A"), (3L, "A"), (3L, "B"),
    (4L, "A"), (4L, "B"), (4L, "B"),
    (5L, "B"), (5L, "B"), (5L, "B"),
    (6L, "B"), (6L, "B"), (6L, "B")).toDF("unit", "cls")

  test("Fleiss' kappa: p_bar=14/18, p_e=0.5, kappa=5/9 on the hand-built table") {
    // per-unit Σk(k−1): 6,6,2,2,6,6 → Σ=28; P̄ = 28/(6·6) = 0.777778
    // P_e = (9² + 9²)/18² = 0.5 → κ = (P̄−0.5)/0.5 = 0.555556
    val r = Agreement.fleissKappa(melt3, "unit", "cls", m = 3).head()
    assert(r.getAs[Long]("n_units") == 6L)
    assert(r.getAs[Double]("p_bar") == 0.777778)
    assert(r.getAs[Double]("p_e") == 0.5)
    assert(r.getAs[Double]("fleiss_kappa") == 0.555556)
  }

  test("Krippendorff alpha: Do=4/18, De=162/306, alpha=0.580247 on the hand-built table") {
    // per-unit agreeing pairs ΣC(k,2): 3,3,1,1,3,3 → dis = 3−that:
    // 0,0,2,2,0,0 → Σ=4; Do = 4/(3·6) = 0.222222
    // De = (18·17 − 2·9·8)/(18·17) = 162/306 = 0.529412
    // α = 1 − 0.222222/0.529412 = 0.580247 (computed UNROUNDED inside)
    val r = Agreement.krippendorffAlpha(melt3, "unit", "cls", m = 3).head()
    assert(r.getAs[Long]("n_units") == 6L && r.getAs[Long]("dis_pairs") == 4L)
    assert(r.getAs[Long]("n_values") == 18L)
    assert(r.getAs[Double]("d_obs") == 0.222222)
    assert(r.getAs[Double]("d_exp") == 0.529412)
    assert(r.getAs[Double]("alpha") == 0.580247)
  }

  test("Cohen's kappa: NULL-labeled rows are excluded, not counted as disagreement") {
    // the 10-row fixture plus 3 rows with a null on either side must give
    // the exact same statistics — nulls are outside the statistic's domain
    val d = (Seq.fill(4)((Option("A"), Option("A"))) ++
      Seq.fill(2)((Option("B"), Option("B"))) ++
      Seq.fill(1)((Option("A"), Option("B"))) ++
      Seq.fill(3)((Option("B"), Option("A"))) ++
      Seq((None: Option[String], Option("A")), (Option("B"), None),
        (None: Option[String], None: Option[String])))
      .toDF("x", "y")
    val r = Agreement.cohenKappa(d, "x", "y").head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("agree") == 6L)
    assert(r.getAs[Double]("po") == 0.6 && r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.2)
  }

  test("degenerate guards: perfect agreement gives kappa/alpha = 1") {
    val perfect = Seq(("A", "A"), ("B", "B"), ("A", "A")).toDF("x", "y")
    assert(Agreement.cohenKappa(perfect, "x", "y").head()
      .getAs[Double]("kappa") == 1.0)
    val meltPerfect = Seq((1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"), (2L, "B")).toDF("unit", "cls")
    assert(Agreement.krippendorffAlpha(meltPerfect, "unit", "cls", 3).head()
      .getAs[Double]("alpha") == 1.0)
    assert(Agreement.fleissKappa(meltPerfect, "unit", "cls", 3).head()
      .getAs[Double]("fleiss_kappa") == 1.0)
  }
}
