package graft

import graft.scale.{AviMjpeg, JpegGray, Mp4Mjpeg, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The sampled-MP4 video path: sample-table demux roundtrip, the general
  * multi-chunk stsc run-length form (which this writer never emits —
  * exercised by a hand-assembled file), container-agnostic operator
  * parity with AVI, and malformed rejection.
  */
class Mp4MjpegSpec extends AnyFunSuite {

  private def be4(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def box(kind: String, body: Array[Byte]): Array[Byte] =
    be4(8L + body.length) ++ ascii(kind) ++ body

  private def frames(id: Long): IndexedSeq[Array[Byte]] = {
    val (w, h) = AviMjpeg.videoDims(id)
    (0 until AviMjpeg.videoFrameCount(id)).map(f =>
      JpegGray.jpegEncodeGray(w, h, AviMjpeg.videoFramePixels(id, f, 0)))
  }

  test("wrap → demuxSamples returns dims and every sample byte-exactly") {
    for (id <- Seq(0L, 8L, 24L, 96L, 488L)) {
      val (w, h) = AviMjpeg.videoDims(id)
      val fs = frames(id)
      val (dw, dh, out) = Mp4Mjpeg.demuxSamples(Mp4Mjpeg.wrap(w, h, fs)).get
      assert(dw == w && dh == h)
      assert(out.length == fs.length)
      for (i <- fs.indices)
        assert(java.util.Arrays.equals(out(i), fs(i)), s"sample $i of video $id")
    }
  }

  test("Multimodal.parseHeader/extractBody still read the sampled MP4 (mvhd/tkhd/mdat)") {
    val id = 16L
    val (w, h) = AviMjpeg.videoDims(id)
    val fs = frames(id)
    val b = Mp4Mjpeg.wrap(w, h, fs)
    assert(Multimodal.parseHeader(b) === (("mp4", w, h, fs.length)))
    // mdat content is the concatenated samples
    val body = Multimodal.extractBody(b).get
    assert(body.length == fs.map(_.length).sum)
  }

  test("general stsc: a hand-assembled TWO-chunk table demuxes correctly") {
    // 3 samples: chunk 1 holds 2 (run: first_chunk=1, spc=2), chunk 2
    // holds 1 (run: first_chunk=2, spc=1); offsets point into one mdat
    val s0 = Array.tabulate(10)(_.toByte)
    val s1 = Array.tabulate(7)(i => (i + 50).toByte)
    val s2 = Array.tabulate(5)(i => (i + 99).toByte)
    val tkhd = box("tkhd", be4(7) ++ be4(0) ++ be4(0) ++ be4(1) ++ be4(0) ++
      be4(3) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
      be4(16L << 16) ++ be4(16L << 16))
    val stsz = box("stsz", be4(0) ++ be4(0) ++ be4(3) ++
      be4(s0.length.toLong) ++ be4(s1.length.toLong) ++ be4(s2.length.toLong))
    val stsc = box("stsc", be4(0) ++ be4(2) ++
      be4(1) ++ be4(2) ++ be4(1) ++ // first_chunk=1: 2 samples/chunk
      be4(2) ++ be4(1) ++ be4(1))   // first_chunk=2: 1 sample/chunk
    def assemble(stcoBody: Array[Byte]): Array[Byte] = {
      val stco = box("stco", stcoBody)
      val stbl = box("stbl", stsz ++ stsc ++ stco)
      val moov = box("moov", box("trak", tkhd ++ box("mdia", box("minf", stbl))))
      val ftyp = box("ftyp", ascii("isom") ++ be4(0) ++ ascii("isom"))
      val mdatHdrAt = ftyp.length + moov.length
      (ftyp ++ moov ++ box("mdat", s0 ++ s1 ++ s2), mdatHdrAt + 8)._1
    }
    // compute the data offset in a first pass, then re-assemble with it
    val probe = assemble(be4(0) ++ be4(2) ++ be4(0) ++ be4(0))
    val dataStart = probe.length - (s0.length + s1.length + s2.length)
    val b = assemble(be4(0) ++ be4(2) ++
      be4(dataStart.toLong) ++ be4((dataStart + s0.length + s1.length).toLong))
    val (w, h, out) = Mp4Mjpeg.demuxSamples(b).get
    assert(w == 16 && h == 16)
    assert(out.length == 3)
    assert(java.util.Arrays.equals(out(0), s0))
    assert(java.util.Arrays.equals(out(1), s1))
    assert(java.util.Arrays.equals(out(2), s2))
  }

  test("container-agnostic operators: AVI and MP4 of the same video agree exactly") {
    val spark = SparkSpec.session
    import spark.implicits._
    val ids = spark.createDataset(Seq(0L, 8L, 32L, 120L))
    val a = AviMjpeg.sceneCuts(AviMjpeg.mediaAviVideos(ids)).collect()
      .map(v => v.doc_id -> v).toMap
    val m = AviMjpeg.sceneCuts(AviMjpeg.mediaMp4Videos(ids)).collect()
      .map(v => v.doc_id -> v).toMap
    assert(a.keySet == m.keySet && a.keySet.size == 4)
    for ((k, va) <- a) assert(va == m(k), s"container disagreement on video $k")
    val ha = AviMjpeg.keyframeHashes(AviMjpeg.mediaAviVideos(ids)).collect().toSet
    val hm = AviMjpeg.keyframeHashes(AviMjpeg.mediaMp4Videos(ids)).collect().toSet
    assert(ha == hm && ha.size == 12)
  }

  test("tx3g timed text: length-prefixed samples roundtrip; video trak resolves by format") {
    val id = 16L
    val (w, h) = AviMjpeg.videoDims(id)
    val fs = frames(id)
    val caps = fs.indices.map(f => AviMjpeg.captionText(id, f))
    val b = Mp4Mjpeg.wrap(w, h, fs, caps)
    assert(Mp4Mjpeg.demuxText(b).get == caps)
    // the video trak still demuxes by its 'jpeg' sample description even
    // though the file now has two traks
    val (dw, dh, out) = Mp4Mjpeg.demuxSamples(b).get
    assert(dw == w && dh == h && out.length == fs.length)
    for (i <- fs.indices) assert(java.util.Arrays.equals(out(i), fs(i)))
    // caption-less MP4: empty text, not an error; junk: None
    assert(Mp4Mjpeg.demuxText(Mp4Mjpeg.wrap(w, h, fs)).get.isEmpty)
    assert(Mp4Mjpeg.demuxText(b.take(50)).isEmpty)
    // container-agnostic extraction agrees with the AVI twin
    val spark = SparkSpec.session
    import spark.implicits._
    val ids = spark.createDataset(Seq(8L, 16L))
    val a = AviMjpeg.videoCaptions(AviMjpeg.mediaAviVideosCaptioned(ids))
      .collect().map(c => c.doc_id -> c).toMap
    val m = AviMjpeg.videoCaptions(AviMjpeg.mediaMp4VideosCaptioned(ids))
      .collect().map(c => c.doc_id -> c).toMap
    assert(a.keySet == m.keySet && a.keySet.size == 2)
    for ((k, va) <- a) assert(va == m(k), s"caption container disagreement on $k")
  }

  test("malformed sampled MP4s: None, never a throw") {
    val good = Mp4Mjpeg.wrap(16, 16, frames(8L))
    assert(Mp4Mjpeg.demuxSamples(good.take(40)).isEmpty)
    assert(Mp4Mjpeg.demuxSamples(Array.empty[Byte]).isEmpty)
    // corrupt the stco offset so a sample range runs past EOF
    val idx = good.sliding(4).indexWhere(s => s.sameElements(ascii("stco")))
    val evil = good.clone()
    evil(idx + 12) = 0x7f.toByte // absurd chunk offset
    assert(Mp4Mjpeg.demuxSamples(evil).isEmpty)
    // a WAV is not BMFF
    assert(Mp4Mjpeg.demuxSamples("RIFFxxxxWAVEdata".getBytes("US-ASCII")).isEmpty)
  }
}
