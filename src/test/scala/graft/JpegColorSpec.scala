package graft

import graft.scale.{JpegGray, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline COLOR JPEG path (T.81 interleaved 4:2:0 MCUs): per-plane
  * bit-exactness on the block-constant content class, the chroma
  * upsample mapping, grayscale parity through the generic decoder, the
  * container-sniffing dispatch, and malformed/out-of-scope rejection.
  */
class JpegColorSpec extends AnyFunSuite {

  private def planes(w: Int, h: Int, seed: Long) = {
    val (cw, ch) = ((w + 1) / 2, (h + 1) / 2)
    (Multimodal.plantedBlockPixels(w, h, seed),
      Multimodal.plantedBlockPixels(cw, ch, seed + 1000003L),
      Multimodal.plantedBlockPixels(cw, ch, seed + 2000003L))
  }

  test("block-constant Y/Cb/Cr round-trip bit-exactly through 4:2:0 (the oracle contract)") {
    for ((w, h, seed) <- Seq((16, 16, 1L), (32, 16, 7L), (32, 32, 123L),
                             (24, 24, 42L), (20, 28, 999983L))) {
      val (yP, cb, cr) = planes(w, h, seed)
      val img = JpegGray.jpegDecodeYcc(
        JpegGray.jpegEncodeYcc420(w, h, yP, cb, cr)).get
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.yP, yP),
        s"luma drift at ($w,$h,$seed)")
      // chroma comes back upsampled: out(y,x) must equal half-res (y/2,x/2)
      val cw = (w + 1) / 2
      for (y <- 0 until h; x <- 0 until w) {
        assert(img.cb(y * w + x) == cb((y / 2) * cw + x / 2),
          s"cb drift at ($x,$y) of ($w,$h,$seed)")
        assert(img.cr(y * w + x) == cr((y / 2) * cw + x / 2),
          s"cr drift at ($x,$y) of ($w,$h,$seed)")
      }
    }
  }

  test("arbitrary color content: bounded quantization error, never structural") {
    val rnd = new scala.util.Random(19)
    val q1 = Array.fill(64)(1)
    val (w, h) = (32, 32)
    val (cw, ch) = (16, 16)
    val yP = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val cb = Array.fill(cw * ch)(rnd.nextInt(256).toByte)
    val cr = Array.fill(cw * ch)(rnd.nextInt(256).toByte)
    val img = JpegGray.jpegDecodeYcc(
      JpegGray.jpegEncodeYcc420(w, h, yP, cb, cr, quant = q1)).get
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs((img.yP(i) & 0xff) - (yP(i) & 0xff)))
    for (y <- 0 until h; x <- 0 until w) {
      val e = math.abs((img.cb(y * w + x) & 0xff) - (cb((y / 2) * cw + x / 2) & 0xff))
      maxErr = math.max(maxErr, e)
    }
    assert(maxErr <= 8, s"roundtrip error $maxErr on random color content")
  }

  test("grayscale JPEGs decode identically through the generic path, neutral chroma") {
    val (w, h) = (24, 17)
    val px = Multimodal.plantedBlockPixels(w, h, 5L)
    val b = JpegGray.jpegEncodeGray(w, h, px)
    val gray = JpegGray.jpegDecodeGray(b).get
    val ycc = JpegGray.jpegDecodeYcc(b).get
    assert(java.util.Arrays.equals(ycc.yP, gray.pixels))
    assert(ycc.cb.forall(_ == 128.toByte) && ycc.cr.forall(_ == 128.toByte))
  }

  test("decodeGray dispatch: color JPEG feeds the existing pixel operators via its luma") {
    val (w, h) = Multimodal.colorDims(10L)
    val (yP, cb, cr) = planes(w, h, 10L)
    val b = JpegGray.jpegEncodeYcc420(w, h, yP, cb, cr)
    // the grayscale decoder must refuse (3 components), the dispatch must not
    assert(JpegGray.jpegDecodeGray(b).isEmpty)
    val img = Multimodal.decodeGray(b).get
    assert(img.width == w && img.height == h)
    assert(java.util.Arrays.equals(img.pixels, yP))
  }

  test("restart intervals (DRI/RSTn): bit-exact roundtrips at every interval, gray and color") {
    // gray: 24x24 = 9 MCUs; intervals 1..4 exercise marker-at-every-MCU,
    // mid-row, and row-crossing restarts plus the m-cycling RST0..7
    val (w, h) = (24, 24)
    val px = Multimodal.plantedBlockPixels(w, h, 77L)
    for (ri <- 1 to 4) {
      val b = JpegGray.jpegEncodeGray(w, h, px, restartInterval = ri)
      // the stream really contains restart markers
      assert(b.sliding(2).exists(s => (s(0) & 0xff) == 0xff &&
        (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7), s"no RSTn at ri=$ri")
      val img = JpegGray.jpegDecodeGray(b).get
      assert(java.util.Arrays.equals(img.pixels, px), s"gray drift at ri=$ri")
    }
    // color: 48x32 = 6 MCUs
    val (cw2, ch2) = (48, 32)
    val (yP, cb, cr) = planes(cw2, ch2, 9L)
    for (ri <- 1 to 3) {
      val b = JpegGray.jpegEncodeYcc420(cw2, ch2, yP, cb, cr, restartInterval = ri)
      val img = JpegGray.jpegDecodeYcc(b).get
      assert(java.util.Arrays.equals(img.yP, yP), s"color luma drift at ri=$ri")
    }
    // a missing/corrupted restart marker must fail closed, not misdecode:
    // overwrite the first RSTn with a data-looking byte pair
    val good = JpegGray.jpegEncodeGray(w, h, px, restartInterval = 2)
    val idx = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) >= 0xd0 &&
        (good(i + 1) & 0xff) <= 0xd7 && i > 100)
    val evil = good.clone()
    evil(idx + 1) = 0x00.toByte // FF D0 -> FF 00 (stuffed data, not a marker)
    assert(JpegGray.jpegDecodeGray(evil).isEmpty)
  }

  test("malformed/out-of-scope color streams: None, never a throw") {
    val (w, h) = (16, 16)
    val (yP, cb, cr) = planes(w, h, 3L)
    val good = JpegGray.jpegEncodeYcc420(w, h, yP, cb, cr)
    assert(JpegGray.jpegDecodeYcc(good.take(good.length / 2)).isEmpty)
    // patch the SOF luma sampling byte (0x22) to an out-of-scope 3x1:
    // SOF0 layout is fixed for this writer — find the marker, then
    // comp 1's sampling byte sits 7 bytes past the 0xFFC0
    val idx = good.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc0)
    val evil = good.clone()
    evil(idx + 11) = 0x31.toByte
    assert(JpegGray.jpegDecodeYcc(evil).isEmpty)
    assert(JpegGray.jpegDecodeYcc(Array.empty[Byte]).isEmpty)
  }
}
