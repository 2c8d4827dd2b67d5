package graft

import graft.scale.{Multimodal, NearDup, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Sanity properties for the scale/ operators (the oracle queries check
  * exact values; these check invariants that must survive refactors).
  */
class ScaleOpsSpec extends SparkSpec {

  test("jaccard: identical docs 1.0, disjoint docs 0.0") {
    import spark.implicits._
    val df = Seq(("a b c d e", "a b c d e"), ("a b c d e", "x y z w v"))
      .toDF("t1", "t2")
      .select(TextOps.jaccard(TextOps.shingles(col("t1")), TextOps.shingles(col("t2"))).as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }

  test("native PolyHashExpr matches the HOF form over the real corpus") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sf())
      .select(TextOps.polyHash(col("text")).as("native"),
              TextOps.polyHashHof(col("text")).as("hof"))
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("polyHash is order-sensitive and stable") {
    import spark.implicits._
    val h = Seq("abc", "acb", "abc").toDF("t")
      .select(TextOps.polyHash(col("t")).as("h")).collect().map(_.getLong(0))
    assert(h(0) == h(2) && h(0) != h(1))
  }

  test("minhash signatures: near-identical docs collide on most components") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "s"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today", "s"),
      (3L, "completely different content with no overlap whatsoever at all", "s"))
      .toDF("doc_id", "text", "source")
    val sigs = NearDup.withSignatures(docs)
      .select("doc_id", "minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val match12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val match13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(match12 > match13)
    assert(match13 == 0)
  }

  test("LSH candidates find the injected near-dup and skip the unrelated doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "s"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today", "s"),
      (3L, "completely different content with no overlap whatsoever at all", "s"))
      .toDF("doc_id", "text", "source")
    val cands = NearDup.lshCandidates(NearDup.withSignatures(docs), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("native graft_dot_f matches the HOF dot over the real embeddings") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf()).limit(100)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b")).limit(500)
      .select(Similarity.dot(col("va"), col("vb")).as("native"),
              Similarity.dotHof(col("va"), col("vb")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)))
      .toDF("a", "b")
      .select(round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }

  test("bucketed topk only pairs vectors in the same sign bucket") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 1f, 1f, 1f, 0.5f)),
      (2L, Array(1f, 1f, 1f, 1f, 0.9f)),   // same bucket as 1
      (3L, Array(-1f, 1f, 1f, 1f, 0.5f)))  // different bucket
      .toDF("vec_id", "embedding")
    val got = Similarity.bucketedTopK(vecs, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("multimodal decode stub: typed mapPartitions yields deterministic meta") {
    import spark.implicits._
    val docs = Seq((6L, "hello world", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val meta = Multimodal.decodeMeta(Multimodal.mediaFromDocuments(docs)).collect()
    assert(meta.length == 1)
    val m = meta(0)
    assert(m.media_type == "image" && m.byte_len == 11L &&
      m.width == 11 && m.height == 77 && m.n_frames == 'h'.toInt % 16)
  }
}
