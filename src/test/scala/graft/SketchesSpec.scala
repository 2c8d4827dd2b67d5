package graft

import graft.scale.Sketches
import org.apache.spark.sql.functions._

/** scale/Sketches — count-min heavy hitters: the CMS hard guarantees that
  * the rows-only query can't pin through the DuckDB oracle.
  */
class SketchesSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("CMS never underestimates; overestimate stays within the eps bound") {
    val rows = Sketches.cmsVocabCheck(docs).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est, ok) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"),
        r.getAs[Boolean]("within_bound"))
      assert(est >= exact, s"CMS underestimated '${r.getString(1)}': $est < $exact")
      assert(ok, s"'${r.getString(1)}' est $est breaches exact+eps*N over $exact")
    }
  }

  test("sketch estimates are deterministic for a fixed seed") {
    val a = Sketches.cmsVocabCheck(docs).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getAs[Long]("n_est"))).toSeq
    val b = Sketches.cmsVocabCheck(docs.repartition(7)).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getAs[Long]("n_est"))).toSeq
    assert(a == b, "estimate changed under repartition — sketch not merge-stable")
  }
}
