package graft

import graft.scale.{AudioDedup, MediaDedup, Multimodal}

/** The audio energy-difference fingerprint ([[graft.scale.AudioDedup]]):
  * invariances the design claims (container re-encode, uniform gain),
  * the planted-clone detection the queries rely on, and the decode-
  * failure contract.
  */
class AudioDedupSpec extends SparkSpec {

  /** The planted sample plan (AudioDedup.mediaWavPlanted's formula), with
    * a gain knob the fixture generator doesn't expose — 2× samples stay
    * inside int16 (|base| ≤ 2000, edit ≤ 100).
    */
  private def wav(seed: Long, edit: Int = 0, stereo: Boolean = false,
                  gain: Int = 1, nSamples: Int = 1024): Array[Byte] = {
    val ch = if (stereo) 2 else 1
    val body = new Array[Byte](nSamples * 2 * ch)
    var i = 0
    while (i < nSamples) {
      val base = (if ((i / 64) % 4 == 0)
        ((i * 37 + seed * 101) % 4001 % 21 - 10)
      else
        ((i * 73 + seed * 151 + 17) % 251) * ((i * 31 + seed * 61 + 5) % 241) % 4001 - 2000).toInt
      val s = (base + (if (i >= 64 && i < 96) edit else 0)) * gain
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

  private def fp(payloads: (Long, Array[Byte])*): Map[Long, (Int, Int, Int, Int)] = {
    import spark.implicits._
    val ds = payloads.toSeq.toDS().map { case (id, p) =>
      Multimodal.MediaRecord(id, "audio", p)
    }
    AudioDedup.fingerprintsWav(ds).collect()
      .map(f => f.doc_id -> ((f.b0, f.b1, f.b2, f.b3))).toMap
  }

  private def ham(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
    Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
      Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)

  test("container invariance: a stereo L=R re-encode fingerprints bit-identically") {
    val m = fp(1L -> wav(42L), 2L -> wav(42L, stereo = true))
    assert(m(1L) == m(2L), s"mono ${m(1L)} vs stereo ${m(2L)}")
  }

  test("gain invariance: doubling every sample leaves the fingerprint unchanged") {
    val m = fp(1L -> wav(42L), 2L -> wav(42L, gain = 2))
    assert(m(1L) == m(2L), s"1x ${m(1L)} vs 2x ${m(2L)}")
  }

  test("edit-100 clone lands within Hamming 8; distinct seeds land far apart") {
    val m = fp(1L -> wav(42L), 2L -> wav(42L, edit = 100, stereo = true),
      3L -> wav(43L))
    val clone = ham(m(1L), m(2L))
    val other = ham(m(1L), m(3L))
    assert(clone <= 8, s"re-encoded clone at Hamming $clone")
    assert(other > 8, s"distinct-seed clip unexpectedly close: Hamming $other")
  }

  test("mediaWavPlanted and the spec formula agree (the oracle replays this plan)") {
    import spark.implicits._
    val viaFixture = AudioDedup.fingerprintsWav(
      AudioDedup.mediaWavPlanted(Seq(42L).toDS(), shift = 7L, edit = 100,
        stereo = true)).collect().head
    val m = fp(1L -> wav(42L, edit = 100, stereo = true))
    assert((viaFixture.b0, viaFixture.b1, viaFixture.b2, viaFixture.b3) == m(1L))
    assert(viaFixture.doc_id == 49L) // shift applied to the record id only
  }

  test("undecodable and sub-window payloads are absent, not thrown") {
    val m = fp(1L -> wav(42L),
      2L -> "definitely not audio".getBytes("UTF-8"),
      3L -> wav(42L, nSamples = 32)) // 32 samples < 64 windows
    assert(m.keySet == Set(1L), s"got ${m.keySet}")
  }

  test("segment fingerprints: a whole-segment trim shifts positions, content fingerprints are equal") {
    import spark.implicits._
    val orig = AudioDedup.mediaWavPlanted(Seq(42L).toDS(), nSamples = 2048)
    val trimmed = AudioDedup.mediaWavPlanted(Seq(42L).toDS(), shift = 1L,
      nSamples = 2048, trimSamples = 512)
    val segs = AudioDedup.segmentFingerprintsWav(orig.union(trimmed))
      .collect().map(f => (f.video_id, f.pos) -> ((f.b0, f.b1, f.b2, f.b3))).toMap
    assert(segs.count(_._1._1 == 42L) == 4 && segs.count(_._1._1 == 43L) == 3)
    (0 until 3).foreach { p =>
      assert(segs((43L, p)) == segs((42L, p + 1)),
        s"trimmed seg $p must equal original seg ${p + 1}")
    }
    // and the offset-voting video operator resolves the trim verbatim
    val fph = AudioDedup.segmentFingerprintsWav(orig.union(trimmed)).toDF()
    val pairs = graft.scale.AviMjpeg.videoDupPairsOffset(fph,
      maxHamming = 8, minMatch = 2).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("video_a") == 42L && r.getAs[Long]("video_b") == 43L &&
      r.getAs[Int]("offset") == 1 && r.getAs[Int]("n_match") == 3, s"got $r")
  }

  test("fingerprints drive the capped band machinery end to end (dedup + admission)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // index: seeds 10, 11; batch: a stereo clone of 10 (dup), a novel 12
    val idx = MediaDedup.bandRows(AudioDedup.fingerprintsWav(
      Seq((10L, wav(10L)), (11L, wav(11L))).toDS()
        .map { case (id, p) => Multimodal.MediaRecord(id, "audio", p) }).toDF())
    val batch = AudioDedup.fingerprintsWav(
      Seq((20L, wav(10L, edit = 100, stereo = true)), (21L, wav(12L))).toDS()
        .map { case (id, p) => Multimodal.MediaRecord(id, "audio", p) }).toDF()
    val verdicts = MediaDedup.admitAgainst(idx, batch, maxHamming = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map(20L -> true, 21L -> false), s"got $verdicts")
    // intra-set dedup: larger id of the planted pair drops
    val all = AudioDedup.fingerprintsWav(
      Seq((1L, wav(5L)), (2L, wav(5L, stereo = true)), (3L, wav(6L))).toDS()
        .map { case (id, p) => Multimodal.MediaRecord(id, "audio", p) }).toDF()
    val dropped = MediaDedup.phashDuplicates(all, maxHamming = 8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L), s"got $dropped")
  }
}
