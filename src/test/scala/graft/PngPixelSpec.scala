package graft

import graft.scale.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real PNG grayscale-8 codec (public-spec implementation — zlib via
  * java.util.zip, all five scanline filters) and the WAV PCM16 sample
  * decode: exact round trips, poison tolerance, and the planted-content
  * contract the mm_* oracles rely on.
  */
class PngPixelSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, seed: Long): Array[Byte] =
    Multimodal.plantedPixels(w, h, seed)

  test("PNG round trip is pixel-exact across sizes (all 5 filters exercised)") {
    // encoder assigns filter r % 5, so any h >= 5 covers None/Sub/Up/
    // Average/Paeth; include tiny, non-square, and 1-wide edge shapes
    val shapes = Seq((1, 1), (1, 7), (7, 1), (3, 5), (16, 16), (32, 17), (17, 32))
    for ((w, h) <- shapes; seed <- Seq(0L, 7L, 123456L)) {
      val px = img(w, h, seed)
      val bytes = Multimodal.pngEncodeGray(w, h, px)
      val dec = Multimodal.pngDecodeGray(bytes)
      assert(dec.isDefined, s"decode failed at ${w}x$h seed=$seed")
      assert(dec.get.width == w && dec.get.height == h)
      assert(dec.get.pixels.sameElements(px),
        s"pixel mismatch at ${w}x$h seed=$seed")
    }
  }

  test("PNG round trip on adversarial pixel content (random, constant, extremes)") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 30) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = new Array[Byte](w * h)
      rnd.nextBytes(px)
      assert(Multimodal.pngDecodeGray(Multimodal.pngEncodeGray(w, h, px))
        .exists(_.pixels.sameElements(px)))
    }
    val flat = Array.fill(64)(0xff.toByte)
    assert(Multimodal.pngDecodeGray(Multimodal.pngEncodeGray(8, 8, flat))
      .exists(_.pixels.sameElements(flat)))
  }

  test("PNG decode: every truncation and every single-byte flip degrades to None, never throws") {
    val bytes = Multimodal.pngEncodeGray(16, 16, img(16, 16, 42L))
    (0 until bytes.length).foreach { n =>
      assert(Multimodal.pngDecodeGray(bytes.take(n)).isEmpty,
        s"truncation at $n must not decode (IEND cannot have been seen)")
    }
    // every byte is covered by signature sniff, length bounds, or a CRC32
    // (single-byte flips are <= 32-bit bursts — always detected)
    (0 until bytes.length).foreach { i =>
      val m = bytes.clone(); m(i) = (m(i) ^ 0x5a).toByte
      assert(Multimodal.pngDecodeGray(m).isEmpty, s"flip at $i must not decode")
    }
  }

  test("PNG decode rejects out-of-scope color types / depths, accepts ancillary chunks") {
    // parseHeader's RGBA wrap (color type 6) sniffs fine but is outside
    // the grayscale-8 pixel decoder's declared scope
    val rgba = Multimodal.pngWrap(10, 10, "body".getBytes)
    assert(Multimodal.parseHeader(rgba)._1 == "png")
    assert(Multimodal.pngDecodeGray(rgba).isEmpty)
  }

  test("WAV PCM16 round trip: planted samples decode exactly; container junk degrades") {
    // pure-JVM check, no session needed: build one planted body by hand
    val id = 17L
    val n = 1024
    val body = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val u = (i * 37 + id * 101) % 4001
      val s = (if ((i / 64) % 4 == 0) u % 21 - 10 else u - 2000).toInt
      body(2 * i) = (s & 0xff).toByte
      body(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val wav = Multimodal.wavWrap(8000, 1, 16, body)
    val dec = Multimodal.wavDecodePcm16(wav)
    assert(dec.isDefined && dec.get.sampleRate == 8000 && dec.get.channels == 1)
    assert(dec.get.samples.length == n)
    (0 until n).foreach { j =>
      val u = (j * 37 + id * 101) % 4001
      val want = if ((j / 64) % 4 == 0) u % 21 - 10 else u - 2000
      assert(dec.get.samples(j) == want, s"sample $j: ${dec.get.samples(j)} != $want")
    }
    assert(Multimodal.wavDecodePcm16("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.wavDecodePcm16(Array.empty[Byte]).isEmpty)
    // 8-bit (non-PCM16) fmt is out of the decoder's declared scope
    assert(Multimodal.wavDecodePcm16(Multimodal.wavWrap(8000, 1, 8, body)).isEmpty)
  }

  test("truecolor RGB-8 PNG: lossless round trip, byte-wise filters, exact luma dispatch") {
    for ((w, h, seed) <- Seq((16, 16, 1L), (32, 17, 42L), (3, 7, 9L), (1, 6, 5L))) {
      val r = img(w, h, seed)
      val g = img(w, h, seed + 3000007L)
      val bl = img(w, h, seed + 4000009L)
      val rgb = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h) {
        rgb(3 * i) = r(i); rgb(3 * i + 1) = g(i); rgb(3 * i + 2) = bl(i)
      }
      val bytes = Multimodal.pngEncodeRgb(w, h, rgb)
      val dec = Multimodal.pngDecodeRgb(bytes).get
      assert(dec.width == w && dec.height == h)
      assert(dec.rgb.sameElements(rgb), s"RGB drift at ${w}x$h seed=$seed")
      // the gray decoder must refuse color type 2; dispatch takes the luma
      assert(Multimodal.pngDecodeGray(bytes).isEmpty)
      val luma = Multimodal.decodeGray(bytes).get
      for (i <- 0 until w * h) {
        val expect = ((r(i) & 0xff) * 77 + (g(i) & 0xff) * 151 +
          (bl(i) & 0xff) * 28) >> 8
        assert((luma.pixels(i) & 0xff) == expect, s"luma at $i of ${w}x$h")
      }
      // and the RGB decoder must refuse a grayscale payload
      assert(Multimodal.pngDecodeRgb(
        Multimodal.pngEncodeGray(w, h, r)).isEmpty)
    }
  }

  test("WAV LIST INFO: roundtrip, decode-through-metadata, malformed rejection") {
    val body = Array.tabulate(64)(i => (i * 3).toByte)
    val info = Seq("IART" -> "someone", "INAM" -> "a track", "ICRD" -> "2021")
    val b = Multimodal.wavWrapInfo(8000, 1, 16, body, info)
    assert(Multimodal.wavInfo(b) === Some(info.toMap))
    // samples decode THROUGH the LIST block, exact
    val pcm = Multimodal.wavDecodePcm16(b).get
    assert(pcm.samples.length == 32)
    assert(pcm.samples(1) == (((body(3) & 0xff) << 8) | (body(2) & 0xff)).toShort)
    // and the header walk still reports the stream facts
    assert(Multimodal.parseHeader(b)._1 == "wav")
    // INFO-less WAV: empty map, not an error; junk: None
    assert(Multimodal.wavInfo(
      Multimodal.wavWrap(8000, 1, 16, body)) === Some(Map.empty[String, String]))
    assert(Multimodal.wavInfo("junk".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.wavInfo(b.take(30)) === Some(Map.empty[String, String]))
  }

  test("planted-pixel edit perturbs only the two leftmost columns") {
    val (w, h) = Multimodal.pixDims(33L)
    val a = Multimodal.plantedPixels(w, h, 33L)
    val b = Multimodal.plantedPixels(w, h, 33L, edit = 40)
    for (y <- 0 until h; x <- 0 until w) {
      if (x < 2) assert(a(y * w + x) != b(y * w + x) ||
        ((a(y * w + x) & 0xff) + 40) % 256 == (b(y * w + x) & 0xff))
      else assert(a(y * w + x) == b(y * w + x), s"unexpected diff at ($y,$x)")
    }
  }
}
