package graft

import graft.scale.{Exif, JpegGray, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The EXIF APP1/TIFF path: roundtrip in BOTH byte orders, offset-stored
  * ASCII values, coexistence with pixel decode (APPn is skipped by the
  * image decoders), and malformed rejection.
  */
class ExifSpec extends AnyFunSuite {

  private def jpegWithExif(id: Long): Array[Byte] = {
    val (w, h) = Multimodal.pixDims(id)
    val (make, ori, dt, le) = Exif.plantedFields(id)
    Exif.insertApp1(
      JpegGray.jpegEncodeGray(w, h, Multimodal.plantedBlockPixels(w, h, id)),
      Exif.app1(make, ori, dt, le))
  }

  test("roundtrip in both TIFF byte orders, offset-stored ASCII values exact") {
    for (id <- Seq(1L, 2L, 13L, 40L, 999L)) {
      val (make, ori, dt, le) = Exif.plantedFields(id)
      val parsed = Exif.parse(jpegWithExif(id))
      assert(parsed === Some((make, ori, dt, if (le) "II" else "MM")),
        s"EXIF roundtrip failed for id $id")
    }
    // a long Make forces the ASCII-through-offset layout in both orders
    for (le <- Seq(true, false)) {
      val seg = Exif.app1("An Unusually Long Camera Maker Name", 6,
        "1999:12:31 23:59:59", le)
      val b = Exif.insertApp1(
        JpegGray.jpegEncodeGray(16, 16, Multimodal.plantedBlockPixels(16, 16, 1L)), seg)
      assert(Exif.parse(b) === Some(("An Unusually Long Camera Maker Name", 6,
        "1999:12:31 23:59:59", if (le) "II" else "MM")))
    }
  }

  test("APP1 coexists with pixel decode: the image decoders skip it untouched") {
    val id = 4L
    val b = jpegWithExif(id)
    val (w, h) = Multimodal.pixDims(id)
    val img = JpegGray.jpegDecodeGray(b).get
    assert(java.util.Arrays.equals(img.pixels,
      Multimodal.plantedBlockPixels(w, h, id)))
    // and parseHeader still reports the JPEG dims past the APP1
    assert(Multimodal.parseHeader(b) === (("jpeg", w, h, 1)))
  }

  test("missing/malformed EXIF: None, never a throw") {
    // plain JPEG without APP1
    assert(Exif.parse(JpegGray.jpegEncodeGray(16, 16,
      Multimodal.plantedBlockPixels(16, 16, 2L))).isEmpty)
    val good = jpegWithExif(2L)
    assert(Exif.parse(good.take(20)).isEmpty)
    assert(Exif.parse(Array.empty[Byte]).isEmpty)
    // corrupt the TIFF byte-order mark
    val evil = good.clone()
    val t = 2 + 10 // SOI + APP1 header + "Exif\0\0"
    evil(t) = 'X'.toByte
    assert(Exif.parse(evil).isEmpty)
    // corrupt the magic 42
    val evil2 = good.clone()
    evil2(t + 2) = 0x77.toByte
    assert(Exif.parse(evil2).isEmpty)
    // not a JPEG at all
    assert(Exif.parse("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("GPS redaction: allowlist re-emit strips GPS+owner, keeps fields, body byte-identical, idempotent") {
    Seq(6L /* II, gps */, 9L /* MM, gps */, 2L /* no gps class */).foreach { id =>
      val (w, h) = Multimodal.pixDims(id)
      val (make, ori, dt, le) = Exif.plantedFields(id)
      val (artist, gps) = Exif.plantedGps(id)
      val b = Exif.insertApp1(
        JpegGray.jpegEncodeGray(w, h, Multimodal.plantedBlockPixels(w, h, id)),
        Exif.app1Gps(make, ori, dt, artist, gps, le))
      val before = Exif.parseAll(b).get
      assert(before._5 === artist, s"id=$id artist before")
      assert(before._6.isDefined === gps.isDefined, s"id=$id gps before")
      val red = Exif.redactApp1(b)
      val after = Exif.parseAll(red).get
      assert((after._1, after._2, after._3, after._4) === ((make, ori, dt, if (le) "II" else "MM")))
      assert(after._5.isEmpty && after._6.isEmpty && after._7.isEmpty, s"id=$id leak survived")
      // everything outside the APP1 segment byte-identical
      assert(java.util.Arrays.equals(Exif.stripApp1(b), Exif.stripApp1(red)))
      // pixels still decode identically
      assert(java.util.Arrays.equals(JpegGray.jpegDecodeGray(red).get.pixels,
        Multimodal.plantedBlockPixels(w, h, id)))
      // idempotent: redacting a redacted image is byte-identical
      assert(java.util.Arrays.equals(Exif.redactApp1(red), red))
    }
    // non-JPEG and EXIF-less inputs pass through unchanged
    val wav = "RIFFxxxxWAVE".getBytes("US-ASCII")
    assert(Exif.redactApp1(wav) eq wav)
    val plain = JpegGray.jpegEncodeGray(16, 16, Multimodal.plantedBlockPixels(16, 16, 2L))
    assert(java.util.Arrays.equals(Exif.redactApp1(plain), plain))
  }
}
