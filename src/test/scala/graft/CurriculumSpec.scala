package graft

import graft.scale.Curriculum
import org.apache.spark.sql.functions._

/** Training-order scheduling invariants (scale/Curriculum): shard
  * positions are contiguous ranks, the whole assignment is reproducible
  * from the salt, epoch expansion matches weights exactly, and curriculum
  * stages are ordered by difficulty.
  */
class CurriculumSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("shuffleShards: every doc lands in exactly one shard with contiguous pos") {
    graft.functions.Hashing.register(spark)
    val out = Curriculum.shuffleShards(docs.select("doc_id"), "doc_id", "s1", 8)
    assert(out.count() == docs.count(), "no rows lost or duplicated")
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .collect()
    byShard.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L,
        s"shard ${r.getInt(0)}: pos must be the contiguous 1..n ranks")
    }
    assert(byShard.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
  }

  test("shuffleShards is reproducible and salt-sensitive") {
    graft.functions.Hashing.register(spark)
    val a = Curriculum.shuffleShards(docs.select("doc_id"), "doc_id", "s1", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getAs[Number](0).longValue, (r.getInt(1), r.getLong(2)))).toMap
    val b = Curriculum.shuffleShards(docs.select("doc_id"), "doc_id", "s1", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getAs[Number](0).longValue, (r.getInt(1), r.getLong(2)))).toMap
    assert(a == b, "same salt => identical assignment")
    val c = Curriculum.shuffleShards(docs.select("doc_id"), "doc_id", "s2", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getAs[Number](0).longValue, (r.getInt(1), r.getLong(2)))).toMap
    assert(a != c, "different salt => different order")
  }

  test("epochRepeat emits exactly weight copies with epoch 1..weight") {
    val d = docs.select(col("doc_id"))
      .withColumn("weight", (col("doc_id") % 3 + 1).cast("int"))
    val out = Curriculum.epochRepeat(d, "weight")
    val per = out.groupBy("doc_id", "weight")
      .agg(count(lit(1)).as("n"), min("epoch").as("mn"), max("epoch").as("mx"))
      .collect()
    per.foreach { r =>
      assert(r.getLong(2) == r.getInt(1).toLong, "copies == weight")
      assert(r.getInt(3) == 1 && r.getInt(4) == r.getInt(1), "epochs are 1..weight")
    }
  }

  test("curriculumOrder: stages partition the corpus easy->hard") {
    graft.functions.Hashing.register(spark)
    val out = Curriculum.curriculumOrder(
      docs.select("doc_id", "n_chars"), "doc_id", "n_chars", "c1")
    val stages = out.groupBy("stage")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"), count(lit(1)).as("n"))
      .orderBy("stage").collect()
    assert(stages.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    stages.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Number](2).longValue <= b.getAs[Number](1).longValue,
          s"stage ${a.getInt(0)} max n_chars must not exceed stage ${b.getInt(0)} min")
      case _ =>
    }
    val sizes = stages.map(_.getLong(3))
    assert(sizes.max - sizes.min <= 1, "ntile stages are balanced")
  }
}
