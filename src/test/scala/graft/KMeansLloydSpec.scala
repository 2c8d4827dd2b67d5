package graft

import graft.scale.KMeansLloyd
import org.apache.spark.sql.functions._

/** Semantic checks the oracle can't express directly: Lloyd over planted
  * well-separated clusters must recover the exact planted partition, and
  * repeated runs must be bit-identical (the operator's whole design claim
  * is determinism under shuffle nondeterminism).
  */
class KMeansLloydSpec extends SparkSpec {

  import spark.implicits._

  // 4 tight clusters around orthogonal centers; ids interleaved so the 4
  // lowest ids (the seeds) land one per planted cluster
  private def planted(): org.apache.spark.sql.DataFrame = {
    val centers = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val rows = for {
      m <- 0 until 10
      c <- 0 until 4
    } yield {
      val id = (m * 4 + c).toLong
      val eps = 0.01f * (((id % 7).toInt - 3).toFloat / 7f)
      (id, centers(c).map(v => v + eps))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted well-separated clusters are exactly recovered") {
    val out = KMeansLloyd.assign(planted(), "vec_id", "embedding",
        k = 4, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 40)
    // seed with vec_id c (c < 4) is planted cluster c and becomes cid c+1;
    // every member of planted cluster c must land in cid c+1
    out.foreach { case (id, cid, dist) =>
      assert(cid == (id % 4).toInt + 1, s"vec $id in cid $cid")
      assert(dist >= 0 && dist < 0.01 * 1e12, s"vec $id dist $dist")
    }
    assert(out.groupBy(_._2).values.forall(_.length == 10))
  }

  test("assignment is bit-identical across runs") {
    val a = KMeansLloyd.assign(planted(), "vec_id", "embedding", k = 4,
      iterations = 2).collect().map(_.toSeq).toSeq
    val b = KMeansLloyd.assign(planted()
        .repartition(7, col("vec_id")), "vec_id", "embedding", k = 4,
      iterations = 2).collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.head.asInstanceOf[Long].toString.toLong) ==
      b.sortBy(_.head.asInstanceOf[Long].toString.toLong))
  }
}
