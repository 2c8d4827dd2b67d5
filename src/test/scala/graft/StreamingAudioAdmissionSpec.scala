package graft

import graft.scale.{AudioDedup, Multimodal}
import graft.streaming.StreamingAudioAdmission
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class Clip(doc_id: Long, payload: Array[Byte])

/** Streaming audio admission (the 5th admission twin): energy-difference
  * fingerprint dedup over REAL decoded PCM16 — cross-batch through the
  * parquet band index only, intra-batch via the capped band-bucket
  * self-join, undecodable payloads audited (never thrown on), replay
  * idempotency via per-batch partition overwrite, and tombstone masking
  * (the audio row of the right-to-be-forgotten family).
  */
class StreamingAudioAdmissionSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString

  /** Planted WAV (AudioDedup.mediaWavPlanted's sample plan). */
  private def wav(seed: Long, edit: Int = 0, stereo: Boolean = false): Array[Byte] = {
    val ch = if (stereo) 2 else 1
    val n = 1024
    val body = new Array[Byte](n * 2 * ch)
    var i = 0
    while (i < n) {
      val base = (if ((i / 64) % 4 == 0)
        ((i * 37 + seed * 101) % 4001 % 21 - 10)
      else
        ((i * 73 + seed * 151 + 17) % 251) * ((i * 31 + seed * 61 + 5) % 241) % 4001 - 2000).toInt
      val s = base + (if (i >= 64 && i < 96) edit else 0)
      var c = 0
      while (c < ch) {
        val off = 2 * (i * ch + c)
        body(off) = (s & 0xff).toByte
        body(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    Multimodal.wavWrap(if (stereo) 16000 else 8000, ch, 16, body)
  }

  test("cross-batch dup rejected via index, intra pair keeps smaller id, poison audited, replay idempotent") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("aadm-index")
    val admittedDir = tmp("aadm-out")
    val rejectedDir = tmp("aadm-side")

    val input = MemoryStream[Clip]
    val q = StreamingAudioAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("aadm-ckpt"),
      rejectedDir = Some(rejectedDir))
    try {
      // batch 0: two distinct clips seed the index
      input.addData(Clip(1L, wav(1L)), Clip(2L, wav(500L)))
      q.processAllAvailable()
      // batch 1: 4 = a STEREO RE-ENCODE of indexed clip 1 (cross-batch
      // dup through the container); 3 = novel; (5, 6) = intra-batch
      // identical pair; 7 = not a WAV at all (poison — audited)
      input.addData(Clip(4L, wav(1L, stereo = true)), Clip(3L, wav(900L)),
        Clip(5L, wav(1300L)), Clip(6L, wav(1300L)),
        Clip(7L, "definitely not audio".getBytes("UTF-8")))
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

    // the index holds band rows only for ADMITTED clips (4 per clip)
    val indexed = spark.read.parquet(indexDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 3L, 5L), s"index must track admitted only, got $indexed")

    // replay idempotency: re-admitting batch 0 under its batch id
    // overwrites its partitions — no duplicate index/corpus/sidecar rows
    val before = spark.read.parquet(indexDir).count()
    StreamingAudioAdmission.admitBatch(
      Seq(Clip(1L, wav(1L)), Clip(2L, wav(500L))).toDF(), 0L,
      indexDir, admittedDir, rejectedDir = Some(rejectedDir))
    assert(spark.read.parquet(indexDir).count() == before)
    assert(spark.read.parquet(admittedDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() == 1)
  }

  test("near-duplicate (edited loud region) caught by Hamming verify, not just exact match") {
    import spark.implicits._
    val indexDir = tmp("anear-index")
    val admittedDir = tmp("anear-out")
    StreamingAudioAdmission.admitBatch(
      Seq(Clip(10L, wav(42L))).toDF(), 0L, indexDir, admittedDir)
    StreamingAudioAdmission.admitBatch(
      Seq(Clip(11L, wav(42L, edit = 100, stereo = true))).toDF(), 1L,
      indexDir, admittedDir)
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(10L),
      s"the edited re-encoded clone must be rejected by the Hamming verify, got $admitted")
  }

  test("tombstones mask the audio index: re-encode of a deleted-only clip re-admits") {
    import spark.implicits._
    val indexDir = tmp("atomb-index")
    val admittedDir = tmp("atomb-out")
    val tombDir = tmp("atomb-ids")
    StreamingAudioAdmission.admitBatch(
      Seq(Clip(1L, wav(1L)), Clip(2L, wav(500L))).toDF(), 0L,
      indexDir, admittedDir)
    Seq(1L).toDF("doc_id").write.parquet(tombDir)
    StreamingAudioAdmission.admitBatch(
      Seq(Clip(4L, wav(1L, stereo = true)), Clip(5L, wav(500L, stereo = true))).toDF(), 1L,
      indexDir, admittedDir, tombstonesDir = Some(tombDir))
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(4L),
      s"re-encode of the deleted-only clip must re-admit, got $admitted")
    assert(!admitted.contains(5L),
      s"re-encode of the surviving clip must stay rejected, got $admitted")
  }
}
