package graft

import graft.scale.Multimodal
import graft.streaming.StreamingPairAdmission
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class ImgCap(doc_id: Long, payload: Array[Byte], text: String)

/** Streaming cross-modal PAIR admission — the sixth twin: joint verdicts
  * against the persisted image band index AND caption signature index
  * (both match ⇒ rejected pair_dup; one ⇒ admitted flagged disagree),
  * intra-batch joint dedup, shared tombstone masking of both indices,
  * rejected-reason sidecar, and checkpoint-replay idempotency.
  */
class StreamingPairAdmissionSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString

  private def png(seed: Long, edit: Int = 0): Array[Byte] = {
    val (w, h) = Multimodal.pixDims(seed)
    Multimodal.pngEncodeGray(w, h, Multimodal.plantedPixels(w, h, seed, edit))
  }

  // tokens embed the seed so captions of different seeds share NO tokens
  // (a pure offset formula makes every caption a cyclic shift of one
  // token ring — near-identical shingle sets, accidental near-dups)
  private def cap(seed: Long): String =
    (0 until 30).map(i => s"t${seed}w${(i * 17 + seed) % 997}").mkString(" ")

  test("joint verdicts: both-dup rejected, one-modality admitted+flagged, intra pair deduped, poison audited, replay idempotent") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imgIdx = tmp("padm-img")
    val txtIdx = tmp("padm-txt")
    val admittedDir = tmp("padm-out")
    val rejectedDir = tmp("padm-side")

    val input = MemoryStream[ImgCap]
    val q = StreamingPairAdmission.start(
      input.toDF(), imgIdx, txtIdx, admittedDir, tmp("padm-ckpt"),
      rejectedDir = Some(rejectedDir))
    try {
      // batch 0: two distinct pairs seed both indices
      input.addData(ImgCap(1L, png(1L), cap(1L)), ImgCap(2L, png(500L), cap(500L)))
      q.processAllAvailable()
      // batch 1:
      //  4 = full dup of pair 1 (near-identical image + same caption) -> pair_dup
      //  5 = re-captioned: image of pair 1, NOVEL caption -> admitted, disagree
      //  6 = re-illustrated: novel image, caption of pair 2 -> admitted, disagree
      //  7 = fully novel -> admitted clean
      //  (8, 9) = intra-batch identical pair -> 9 dropped intra
      //  11 = poison payload -> undecodable
      input.addData(
        ImgCap(4L, png(1L, edit = 40), cap(1L)),
        ImgCap(5L, png(1L), cap(7777L)),
        ImgCap(6L, png(8888L), cap(500L)),
        ImgCap(7L, png(9999L), cap(9999L)),
        ImgCap(8L, png(1300L), cap(1300L)),
        ImgCap(9L, png(1300L), cap(1300L)),
        ImgCap(11L, "not a png".getBytes("UTF-8"), cap(11L)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id", "img_dup", "txt_dup", "disagree").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(admitted.keySet == Set(1L, 2L, 5L, 6L, 7L, 8L), s"got $admitted")
    assert(admitted(5L) == ((true, false, true)), s"re-captioned flags: ${admitted(5L)}")
    assert(admitted(6L) == ((false, true, true)), s"re-illustrated flags: ${admitted(6L)}")
    assert(admitted(7L) == ((false, false, false)), s"novel flags: ${admitted(7L)}")

    val rej = spark.read.parquet(rejectedDir)
      .select("doc_id", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rej == Set((4L, "pair_dup"), (9L, "intra_pair_dup"),
      (11L, "undecodable")), s"got $rej")

    // both indices track admitted pairs only
    val imgIds = spark.read.parquet(imgIdx)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val txtIds = spark.read.parquet(txtIdx)
      .select("doc").distinct().collect().map(_.getLong(0)).toSet
    assert(imgIds == admitted.keySet, s"img index $imgIds")
    assert(txtIds == admitted.keySet, s"txt index $txtIds")

    // replay idempotency: re-admitting batch 0 overwrites its partitions
    val before = (spark.read.parquet(imgIdx).count(),
      spark.read.parquet(txtIdx).count(),
      spark.read.parquet(admittedDir).count())
    StreamingPairAdmission.admitBatch(
      Seq(ImgCap(1L, png(1L), cap(1L)), ImgCap(2L, png(500L), cap(500L))).toDF(),
      0L, imgIdx, txtIdx, admittedDir, rejectedDir = Some(rejectedDir))
    val after = (spark.read.parquet(imgIdx).count(),
      spark.read.parquet(txtIdx).count(),
      spark.read.parquet(admittedDir).count())
    assert(after == before, s"replay must be idempotent: $before -> $after")
  }

  test("tombstones mask BOTH indices: a re-upload of a deleted-only pair re-admits") {
    import spark.implicits._
    val imgIdx = tmp("ptomb-img")
    val txtIdx = tmp("ptomb-txt")
    val admittedDir = tmp("ptomb-out")
    val tombDir = tmp("ptomb-ids")
    StreamingPairAdmission.admitBatch(
      Seq(ImgCap(1L, png(1L), cap(1L)), ImgCap(2L, png(500L), cap(500L))).toDF(),
      0L, imgIdx, txtIdx, admittedDir)
    Seq(1L).toDF("doc_id").write.parquet(tombDir)
    StreamingPairAdmission.admitBatch(
      Seq(ImgCap(4L, png(1L), cap(1L)), ImgCap(5L, png(500L), cap(500L))).toDF(),
      1L, imgIdx, txtIdx, admittedDir, tombstonesDir = Some(tombDir))
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(4L),
      s"re-upload of the deleted-only pair must re-admit, got $admitted")
    assert(!admitted.contains(5L),
      s"re-upload of the surviving pair must stay rejected, got $admitted")
  }
}
