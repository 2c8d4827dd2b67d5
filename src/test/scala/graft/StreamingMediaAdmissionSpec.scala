package graft

import graft.scale.Multimodal
import graft.streaming.StreamingMediaAdmission
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class Img(doc_id: Long, payload: Array[Byte])

/** Streaming media admission: perceptual-hash dedup over REAL decoded PNG
  * pixels — cross-batch through the parquet band index only, intra-batch
  * via the band-bucket self-join, undecodable payloads audited (never
  * thrown on), and replay idempotency via per-batch partition overwrite.
  */
class StreamingMediaAdmissionSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString

  private def png(seed: Long, edit: Int = 0): Array[Byte] = {
    val (w, h) = Multimodal.pixDims(seed)
    Multimodal.pngEncodeGray(w, h, Multimodal.plantedPixels(w, h, seed, edit))
  }

  test("cross-batch dup rejected via index, intra pair keeps smaller id, poison audited, replay idempotent") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("madm-index")
    val admittedDir = tmp("madm-out")
    val rejectedDir = tmp("madm-side")

    val input = MemoryStream[Img]
    val q = StreamingMediaAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("madm-ckpt"),
      rejectedDir = Some(rejectedDir))
    try {
      // batch 0: two distinct images seed the index
      input.addData(Img(1L, png(1L)), Img(2L, png(500L)))
      q.processAllAvailable()
      // batch 1: 4 = pixel-identical to the INDEXED image 1 (cross-batch
      // dup); 3 = novel; (5, 6) = intra-batch identical pair; 7 = not a
      // PNG at all (poison — audited, not thrown)
      input.addData(Img(4L, png(1L)), Img(3L, png(900L)),
        Img(5L, png(1300L)), Img(6L, png(1300L)),
        Img(7L, "definitely not an image".getBytes("UTF-8")))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 3L, 5L), s"got $admitted")

    val rej = spark.read.parquet(rejectedDir)
      .select("doc_id", "reason", "batch_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue)).toSet
    assert(rej == Set((4L, "index_dup", 1L), (6L, "intra_batch_dup", 1L),
      (7L, "undecodable", 1L)), s"got $rej")
    // audit is total: admitted ∪ rejected == every input, disjointly
    assert((admitted ++ rej.map(_._1)) == (1L to 7L).toSet)
    assert(admitted.intersect(rej.map(_._1)) == Set.empty)

    // the index holds band rows only for ADMITTED images (4 per image)
    val indexed = spark.read.parquet(indexDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 3L, 5L), s"index must track admitted only, got $indexed")

    // replay idempotency: re-admitting batch 0 under its batch id
    // overwrites its partitions — no duplicate index/corpus/sidecar rows
    val before = spark.read.parquet(indexDir).count()
    StreamingMediaAdmission.admitBatch(
      Seq(Img(1L, png(1L)), Img(2L, png(500L))).toDF(), 0L,
      indexDir, admittedDir, rejectedDir = Some(rejectedDir))
    assert(spark.read.parquet(indexDir).count() == before)
    assert(spark.read.parquet(admittedDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() == 1)
  }

  test("near-duplicate (edited columns) is caught by Hamming verify, not just exact match") {
    import spark.implicits._
    val indexDir = tmp("mnear-index")
    val admittedDir = tmp("mnear-out")
    // seed the index with the original, then admit an EDITED clone (two
    // pixel columns brightened by 40 — the mm_phash_pairs plant) in a
    // later batch: band blocking + Hamming <= 8 must reject it even
    // though the payloads differ byte-wise
    StreamingMediaAdmission.admitBatch(
      Seq(Img(10L, png(42L))).toDF(), 0L, indexDir, admittedDir)
    StreamingMediaAdmission.admitBatch(
      Seq(Img(11L, png(42L, edit = 40))).toDF(), 1L, indexDir, admittedDir)
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(10L),
      s"the edited near-clone must be rejected by the Hamming verify, got $admitted")
  }

  test("tombstones mask the media index: copy of a deleted-only image re-admits") {
    import spark.implicits._
    val indexDir = tmp("mtomb-index")
    val admittedDir = tmp("mtomb-out")
    val tombDir = tmp("mtomb-ids")
    StreamingMediaAdmission.admitBatch(
      Seq(Img(1L, png(1L)), Img(2L, png(500L))).toDF(), 0L,
      indexDir, admittedDir)
    Seq(1L).toDF("doc_id").write.parquet(tombDir)
    StreamingMediaAdmission.admitBatch(
      Seq(Img(4L, png(1L)), Img(5L, png(500L))).toDF(), 1L,
      indexDir, admittedDir, tombstonesDir = Some(tombDir))
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(4L),
      s"copy of the deleted-only image must re-admit, got $admitted")
    assert(!admitted.contains(5L),
      s"copy of the surviving image must stay rejected, got $admitted")
  }
}
