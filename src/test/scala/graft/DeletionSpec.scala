package graft

import graft.scale.{Deletion, NearDup, Similarity}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Deletion propagation (right-to-be-forgotten): the pinned semantics of
  * Deletion.purge over the persisted admission indexes, and the scale
  * shape — purge NEVER shuffles the index, even with broadcast disabled.
  */
class DeletionSpec extends SparkSpec {

  private def fixtureDocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("purge(index(C), T) == index(C minus T): exact row equivalence") {
    graft.functions.Hashing.register(spark)
    val corpus = fixtureDocs.limit(120)
    val tomb = corpus.filter(col("doc_id") % 7 === 3).select("doc_id")
    val purged = Deletion.purge(
        NearDup.signatureIndex(corpus, "doc_id"), tomb, "doc")
      .select("doc", "band_idx", "band_hash")
      .collect().map(_.toSeq).toSet
    val rebuilt = NearDup.signatureIndex(
        corpus.join(tomb, Seq("doc_id"), "left_anti"), "doc_id")
      .select("doc", "band_idx", "band_hash")
      .collect().map(_.toSeq).toSet
    assert(purged == rebuilt,
      s"purge must equal rebuild-from-survivors: ${purged.size} vs ${rebuilt.size}")
    assert(purged.nonEmpty)
  }

  test("purge removes ONLY the tombstoned ids' rows — dups of deleted content stay") {
    import spark.implicits._
    // admitted output with a planted near-dup relationship: 10 is a dup
    // of 3; tombstoning 3 must not remove 10 (deleting X is not deleting
    // X's look-alikes)
    val admitted = Seq((3L, "x"), (10L, "x near dup"), (7L, "y")).toDF("doc_id", "text")
    val out = Deletion.purge(admitted, Seq(3L).toDF("doc_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(10L, 7L))
  }

  test("purge plan: index side never shuffles, even with broadcast disabled") {
    import spark.implicits._
    graft.functions.Hashing.register(spark)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // filter, not limit: a global limit adds its own single-partition
      // shuffle and would pollute the purge plan under inspection
      val index = NearDup.signatureIndex(
        fixtureDocs.filter(col("doc_id") < 50), "doc_id")
      val plan = Deletion.purge(index, Seq(1L, 2L).toDF("doc_id"), "doc")
        .queryExecution.executedPlan
      // the ONLY legal exchange is the takedown set's own dedup inside
      // the broadcast subtree (ids-only, takedown-sized); the index side
      // must stay exchange-free
      val indexShuffles = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot(_.output.forall(_.name == "__tombstone_id"))
      assert(indexShuffles.isEmpty,
        s"purge must be a map-side broadcast anti-join (a 100 TB index " +
          s"must not shuffle to forget a takedown set):\n$plan")
      assert(plan.toString.contains("BroadcastHashJoin") &&
        plan.toString.contains("LeftAnti"), plan.toString.take(2000))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("vector postings purge: geometry is preserved (the index owns its plan)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val plan = Similarity.vectorBandPlanFor(e)
    val postings = Similarity.vectorPostings(e, "vec_id", "embedding", plan)
    val tomb = e.filter(col("vec_id") % 5 === 0).select("vec_id")
    val purged = Deletion.purge(postings, tomb, "id")
    // purged posting rows are exactly the survivors' rows under the SAME
    // plan — band indexes unchanged, no tombstoned id remains
    assert(purged.filter(col("id") % 5 === 0).count() == 0)
    assert(purged.select(max("band_idx")).head().getInt(0) == plan.bands - 1)
    val expected = postings.filter(col("id") % 5 =!= 0).count()
    assert(purged.count() == expected)
  }

  test("rewritePurged: physical rewrite drops tombstoned rows, reports counts") {
    import spark.implicits._
    graft.functions.Hashing.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("del-idx").toString
    val out = java.nio.file.Files.createTempDirectory("del-out").resolve("p").toString
    val index = NearDup.signatureIndex(fixtureDocs.limit(40), "doc_id")
    index.write.mode("overwrite").parquet(dir)
    val tomb = Seq.range(0L, 40L).filter(_ % 4 == 1).toDF("doc_id")
    val (before, after) = Deletion.rewritePurged(spark, dir, out, tomb, "doc")
    assert(before == index.count())
    val rewritten = spark.read.parquet(out)
    assert(after == rewritten.count())
    assert(rewritten.filter(col("doc") % 4 === 1).count() == 0)
    assert(after < before)
  }
}
