package graft

import graft.scale.{AviMjpeg, JpegGray, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The MJPEG-in-AVI video path: container roundtrip (write → header parse
  * → demux → per-frame T.81 decode back to the planted pixels), word-
  * alignment mechanics on odd-length frames, the scene-cut arithmetic on
  * a hand-computed video, keyframe stride selection, and the never-throw
  * malformed-input posture shared with the other container walks.
  */
class AviMjpegSpec extends AnyFunSuite {

  private def video(id: Long, cloneEdit: Int = 0): Array[Byte] = {
    val (w, h) = AviMjpeg.videoDims(id)
    val frames = (0 until AviMjpeg.videoFrameCount(id)).map(f =>
      JpegGray.jpegEncodeGray(w, h, AviMjpeg.videoFramePixels(id, f, cloneEdit)))
    AviMjpeg.wrap(w, h, fps = 10, frames)
  }

  test("wrap → parseAviHeader returns the avih width/height/frame count") {
    for (id <- Seq(0L, 8L, 24L, 40L, 96L, 488L)) {
      val (w, h) = AviMjpeg.videoDims(id)
      val nf = AviMjpeg.videoFrameCount(id)
      assert(AviMjpeg.parseAviHeader(video(id)) === Some((w, h, nf)))
    }
  }

  test("Multimodal.parseHeader sniffs AVI and reports the real header") {
    val b = video(16L)
    val (w, h) = AviMjpeg.videoDims(16L)
    assert(Multimodal.parseHeader(b) ===
      (("avi", w, h, AviMjpeg.videoFrameCount(16L))))
    // extractBody returns the demuxable movi region, which demux accepts
    val body = Multimodal.extractBody(b)
    assert(body.isDefined && body.get.length > 0)
  }

  test("demux recovers every frame; each entropy-decodes to the planted pixels") {
    for (id <- Seq(0L, 8L, 32L, 120L)) {
      val (w, h) = AviMjpeg.videoDims(id)
      val nf = AviMjpeg.videoFrameCount(id)
      val frames = AviMjpeg.demux(video(id)).get
      assert(frames.length === nf)
      for (f <- 0 until nf) {
        val img = JpegGray.jpegDecodeGray(frames(f)).get
        assert(img.width == w && img.height == h)
        assert(java.util.Arrays.equals(img.pixels,
          AviMjpeg.videoFramePixels(id, f, 0)),
          s"frame $f of video $id drifted through the AVI+JPEG roundtrip")
      }
    }
  }

  test("odd-length frame chunks are word-aligned without corrupting payloads") {
    // hand-build frames of odd byte length: demux must return exact
    // lengths with the pad byte stripped
    val f1 = Array.tabulate(33)(i => (i * 7).toByte)
    val f2 = Array.tabulate(40)(i => (i * 11).toByte)
    val b = AviMjpeg.wrap(16, 16, 10, Seq(f1, f2))
    val out = AviMjpeg.demux(b).get
    assert(out.length == 2)
    assert(java.util.Arrays.equals(out(0), f1))
    assert(java.util.Arrays.equals(out(1), f2))
    assert(AviMjpeg.parseAviHeader(b) === Some((16, 16, 2)))
  }

  test("scene-cut arithmetic matches a hand computation") {
    // 16x16, 2 blocks per side. Build 4 frames by hand: scenes {0,1} and
    // {2,3}; within a scene frames differ by +2 on the left block column
    // (2 of 4 blocks -> per-pixel diff 2 on half the pixels -> mad=1);
    // across scenes blocks jump by 98/100/98/100 -> mad = 396*64/256 = 99.
    def flat(vals: (Int, Int, Int, Int)): Array[Byte] = {
      val (a, b, c, d) = vals
      val px = new Array[Byte](256)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = (y / 8, x / 8) match {
          case (0, 0) => a; case (0, 1) => b; case (1, 0) => c; case _ => d
        }
        px(y * 16 + x) = v.toByte
      }
      px
    }
    val frames = Seq(
      flat((10, 20, 30, 40)), flat((12, 20, 32, 40)),      // scene 0 + motion
      flat((110, 120, 130, 140)), flat((112, 120, 132, 140))) // scene 1 + motion
      .map(JpegGray.jpegEncodeGray(16, 16, _))
    val avi = AviMjpeg.wrap(16, 16, 10, frames)
    val spark = SparkSpec.session
    import spark.implicits._
    val ds = spark.createDataset(Seq(Multimodal.MediaRecord(1L, "video", avi)))
    val out = AviMjpeg.sceneCuts(ds, threshold = 16).collect()
    assert(out.length == 1)
    val v = out.head
    assert(v.n_frames == 4)
    assert(v.n_cuts == 1)
    assert(v.first_cut == 2)
    assert(v.sum_mad == 1L + 99L + 1L)
  }

  test("keyframe stride picks floor(p*nf/k) and hashes decode-true frames") {
    val spark = SparkSpec.session
    import spark.implicits._
    val ids = spark.createDataset(Seq(0L, 8L, 16L, 24L))
    val fph = AviMjpeg.keyframeHashes(
      AviMjpeg.mediaAviVideos(ids), k = 3).collect()
    // every video has >= 3 frames so exactly 3 positions each
    assert(fph.length == 12)
    assert(fph.groupBy(_.video_id).forall(_._2.map(_.pos).sorted.sameElements(Seq(0, 1, 2))))
    // position hashes equal the direct hash of the planted frame
    for (r <- fph) {
      val nf = AviMjpeg.videoFrameCount(r.video_id)
      val f = r.pos * nf / 3
      val (w, h) = AviMjpeg.videoDims(r.video_id)
      val img = Multimodal.PngImage(w, h,
        AviMjpeg.videoFramePixels(r.video_id, f, 0))
      val (b0, b1, b2, b3) = Multimodal.aHash64(img).get
      assert((r.b0, r.b1, r.b2, r.b3) === ((b0, b1, b2, b3)))
    }
  }

  test("malformed inputs: never throw, always None/unknown") {
    val good = video(8L)
    assert(AviMjpeg.parseAviHeader(Array.empty[Byte]).isEmpty)
    assert(AviMjpeg.parseAviHeader(good.take(20)).isEmpty)
    assert(AviMjpeg.demux(good.take(60)).isEmpty)
    // sign-bit chunk length: the forward-progress guard must bail
    val evil = good.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(AviMjpeg.parseAviHeader(evil).isEmpty)
    assert(AviMjpeg.demux(evil).isEmpty)
    // a WAV is RIFF but not AVI: the AVI path must not claim it
    val wav = Multimodal.parseHeader(good)
    assert(wav._1 == "avi")
    assert(!AviMjpeg.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII")))
  }

  test("hot-bucket suppression: over-wide buckets generate no candidates, cool pairs survive") {
    val spark = SparkSpec.session
    import spark.implicits._
    // 5 videos share EVERY band value (the blank-frame class): with
    // maxBucket=4 all their buckets are hot -> zero pairs from them.
    // 2 more share a distinct cool hash -> exactly one verified pair.
    val hot = for (v <- 1L to 5L; p <- 0 to 2)
      yield AviMjpeg.FrameHash(v, p, 7, 7, 7, 7)
    val cool = for (v <- Seq(100L, 101L); p <- 0 to 2)
      yield AviMjpeg.FrameHash(v, p, 9, 1, 2, 3)
    val fph = spark.createDataset(hot ++ cool).toDF()
    val out = AviMjpeg.videoDupPairs(fph, maxHamming = 8, minMatch = 2,
      maxBucket = 4).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 100L && out.head.getLong(1) == 101L)
    assert(out.head.getInt(2) == 3 && out.head.getInt(3) == 0)
    // with the cap lifted the hot class pairs reappear (5 choose 2 + 1)
    val uncapped = AviMjpeg.videoDupPairs(fph, maxHamming = 8, minMatch = 2,
      maxBucket = 1000).collect()
    assert(uncapped.length == 11)
  }

  test("caption stream: '01tx' chunks roundtrip; video demux is undisturbed by them") {
    val spark = SparkSpec.session
    import spark.implicits._
    val ids = spark.createDataset(Seq(2L, 10L))
    val media = AviMjpeg.mediaAviVideosCaptioned(ids).collect()
    for (m <- media) {
      val nf = AviMjpeg.videoFrameCount(m.doc_id)
      // captions come back verbatim and in order
      assert(AviMjpeg.demuxCaptions(m.payload).get ==
        (0 until nf).map(AviMjpeg.captionText(m.doc_id, _)))
      // the video stream still demuxes to exactly nf decodable frames
      val frames = AviMjpeg.demux(m.payload).get
      assert(frames.length == nf)
      assert(frames.forall(JpegGray.jpegDecodeGray(_).isDefined))
      // and the header still reports the video stream's frame count
      assert(AviMjpeg.parseAviHeader(m.payload).map(_._3) === Some(nf))
    }
    // a caption-less video has an EMPTY caption stream, not a missing one
    val (pw, ph) = AviMjpeg.videoDims(8L)
    val plain = AviMjpeg.wrap(pw, ph, 10,
      Seq(JpegGray.jpegEncodeGray(pw, ph, AviMjpeg.videoFramePixels(8L, 0, 0))))
    assert(AviMjpeg.demuxCaptions(plain).get.isEmpty)
    assert(AviMjpeg.demuxCaptions(plain.take(40)).isEmpty) // malformed -> None
  }

  test("offset-tolerant dedup finds trimmed clones at their true offset") {
    val spark = SparkSpec.session
    import spark.implicits._
    val ids = spark.createDataset(Seq(8L, 32L, 96L, 120L))
    val media = AviMjpeg.mediaAviVideos(ids)
      .union(AviMjpeg.mediaAviVideosTrimmed(ids, shift = 700000L, trim = 1))
    val pairs = AviMjpeg.videoDupPairsOffset(
        AviMjpeg.allFrameHashes(media).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    for (id <- Seq(8L, 32L, 96L, 120L)) {
      val nf = AviMjpeg.videoFrameCount(id)
      val got = pairs.get((id, id + 700000L))
      assert(got.isDefined, s"trimmed clone of $id not detected")
      val (off, nAligned, nMatch) = got.get
      assert(off == 1, s"video $id: expected offset 1, got $off")
      // every overlapping frame is byte-identical -> all aligned match
      assert(nAligned == nf - 1 && nMatch == nf - 1,
        s"video $id: $nMatch/$nAligned of ${nf - 1}")
    }
  }

  test("stereo de-interleave: per-channel energies match a direct computation; mono skipped") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = spark.createDataset(Seq(3L, 7L)).toDF("doc_id")
    val out = Multimodal.audioStereoStats(Multimodal.mediaWavStereo(docs, nFrames = 64))
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- Seq(3L, 7L)) {
      var el = 0L; var er = 0L; var dot = 0L
      for (i <- 0 until 64) {
        val l = (i * 37 + id * 101) % 4001 - 2000
        val r = (i * 53 + id * 67) % 4001 - 2000
        el += l * l; er += r * r; dot += l * r
      }
      assert(out(id).n_frames == 64)
      assert(out(id).e_left == el && out(id).e_right == er && out(id).dot_lr == dot)
    }
    // a mono WAV must be skipped by the stereo operator, not misread
    val mono = Multimodal.audioStereoStats(
      Multimodal.mediaWavSquare(spark.createDataset(Seq(1L)).toDF("doc_id")))
    assert(mono.collect().isEmpty)
  }

  test("square-wave pitch detector finds the planted full period") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = spark.createDataset(Seq(1L, 5L, 13L, 29L)).toDF("doc_id")
    val out = Multimodal.audioPitch(Multimodal.mediaWavSquare(docs), maxLag = 32)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- Seq(1L, 5L, 13L, 29L)) {
      val p = (3 + id % 14).toInt
      assert(out(id).best_lag == 2 * p,
        s"doc $id: expected full period ${2 * p}, got ${out(id).best_lag}")
      assert(out(id).r_best <= out(id).r_zero)
    }
  }
}
