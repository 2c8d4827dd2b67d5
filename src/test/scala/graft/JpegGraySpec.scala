package graft

import graft.scale.{JpegGray, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline-JPEG grayscale codec (T.81): exactness on the DC-only
  * content class the oracles hash-check, bounded error on ARBITRARY
  * content (the property the fixture cannot exercise), entropy-stream
  * mechanics (byte stuffing), container dispatch, and the never-throw
  * poison posture.
  */
class JpegGraySpec extends AnyFunSuite {

  test("block-constant content round-trips bit-exactly (the oracle contract)") {
    for ((w, h, seed) <- Seq((16, 16, 1L), (24, 17, 7L), (32, 25, 123L),
                             (19, 31, 999983L))) {
      val px = Multimodal.plantedBlockPixels(w, h, seed)
      val decoded = JpegGray.jpegDecodeGray(JpegGray.jpegEncodeGray(w, h, px))
      assert(decoded.isDefined, s"decode failed for ($w,$h,$seed)")
      val img = decoded.get
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.pixels, px),
        s"lossy drift on block-constant content ($w,$h,$seed)")
    }
  }

  test("clone edits on the leftmost block column stay bit-exact too") {
    val (w, h) = (24, 24)
    val px = Multimodal.plantedBlockPixels(w, h, 42L, edit = 24)
    val img = JpegGray.jpegDecodeGray(JpegGray.jpegEncodeGray(w, h, px)).get
    assert(java.util.Arrays.equals(img.pixels, px))
  }

  test("arbitrary content: quantization error is bounded, never structural") {
    val rnd = new scala.util.Random(7)
    // all-ones quant table: the only loss left is per-coefficient rounding
    // (|err| <= 0.5 per coefficient -> worst-case pixel error bounded by
    // the basis l1 norm, ~8; typical content lands far below)
    val q1 = Array.fill(64)(1)
    for (_ <- 0 until 5) {
      val (w, h) = (16 + rnd.nextInt(17), 16 + rnd.nextInt(17))
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = JpegGray.jpegDecodeGray(
        JpegGray.jpegEncodeGray(w, h, px, quant = q1)).get
      assert(img.width == w && img.height == h)
      var sumErr = 0L; var maxErr = 0
      var i = 0
      while (i < w * h) {
        val e = math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))
        sumErr += e; maxErr = math.max(maxErr, e)
        i += 1
      }
      assert(maxErr <= 8, s"max roundtrip error $maxErr on random ${w}x$h")
      assert(sumErr.toDouble / (w * h) <= 2.0,
        s"mean roundtrip error ${sumErr.toDouble / (w * h)}")
    }
  }

  test("entropy stream really exercises byte stuffing (0xFF 0x00) and varied DC codes") {
    val rnd = new scala.util.Random(11)
    var stuffed = 0
    for (_ <- 0 until 50) {
      val (w, h) = (16 + rnd.nextInt(17), 16 + rnd.nextInt(17))
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val b = JpegGray.jpegEncodeGray(w, h, px, quant = Array.fill(64)(1))
      var i = 2
      while (i < b.length - 2) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00) stuffed += 1
        i += 1
      }
    }
    assert(stuffed > 0, "no stuffed 0xFF bytes across 50 random scans")
  }

  test("container dispatch: PNG and JPEG of the same planted grid decode identically") {
    val (w, h) = (24, 20)
    val px = Multimodal.plantedBlockPixels(w, h, 5L)
    val viaPng = Multimodal.decodeGray(Multimodal.pngEncodeGray(w, h, px)).get
    val viaJpeg = Multimodal.decodeGray(JpegGray.jpegEncodeGray(w, h, px)).get
    assert(java.util.Arrays.equals(viaPng.pixels, viaJpeg.pixels))
    assert(viaPng.width == viaJpeg.width && viaPng.height == viaJpeg.height)
  }

  test("poison posture: out-of-scope or malformed streams return None, never throw") {
    val good = JpegGray.jpegEncodeGray(16, 16,
      Multimodal.plantedBlockPixels(16, 16, 1L))
    // truncations at every structural boundary
    for (cut <- Seq(1, 2, 10, 30, good.length / 2, good.length - 3))
      assert(JpegGray.jpegDecodeGray(good.take(cut)).isEmpty, s"cut=$cut")
    // the header-only 3-component SOF0 wrap (the metadata fixture) has no
    // tables or scan -> out of this decoder's scope
    assert(JpegGray.jpegDecodeGray(
      Multimodal.jpegWrap(16, 16, Array.fill(64)(0.toByte))).isEmpty)
    // progressive marker
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegGray.jpegDecodeGray(prog).isEmpty)
    // garbage
    assert(JpegGray.jpegDecodeGray(Array.fill(100)(0x5a.toByte)).isEmpty)
    assert(JpegGray.jpegDecodeGray(Array.empty[Byte]).isEmpty)
  }
}
