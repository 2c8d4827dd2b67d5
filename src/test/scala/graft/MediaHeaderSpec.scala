package graft

import graft.scale.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer and adversarial vectors for the real container-header
  * parsers (PNG IHDR / JPEG SOF0 / RIFF-WAV / ISO-BMFF), independent of
  * the fixture wrap: byte layouts are hand-assembled per the public specs
  * so a parser that misreads any offset fails here, not only at the
  * oracle gate.
  */
class MediaHeaderSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG: signature + IHDR big-endian dims") {
    val b = Multimodal.pngWrap(800, 601, "body".getBytes)
    // spec bytes: 8-byte signature, IHDR length 13, type at offset 12
    assert((b(0) & 0xff) == 0x89 && new String(b.slice(1, 4)) == "PNG")
    assert(new String(b.slice(12, 16)) == "IHDR")
    assert(Multimodal.parseHeader(b) == (("png", 800, 601, 1)))
  }

  test("PNG: CRC32 over type+data matches an independent computation") {
    val b = Multimodal.pngWrap(1, 2, Array.empty)
    val crc = new java.util.zip.CRC32
    crc.update(b.slice(12, 29)) // "IHDR" + 13 data bytes
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored == crc.getValue)
  }

  test("JPEG: marker walk reaches SOF0 past APP segments; height before width") {
    val b = Multimodal.jpegWrap(640, 480, "x".getBytes)
    assert(Multimodal.parseHeader(b) == (("jpeg", 640, 480, 1)))
  }

  test("JPEG: fill bytes and RST markers before SOF are walked over") {
    val base = Multimodal.jpegWrap(33, 44, Array.empty)
    // splice extra 0xFF fill bytes + a bare RST0 between SOI and APP0
    val spliced = base.slice(0, 2) ++ bytes(0xff, 0xff, 0xd0) ++ base.drop(2)
    assert(Multimodal.parseHeader(spliced) == (("jpeg", 33, 44, 1)))
  }

  test("JPEG: progressive SOF2 is a frame header too; DHT (C4) is not") {
    val base = Multimodal.jpegWrap(12, 34, Array.empty)
    // rewrite SOF0 -> SOF2
    val i = base.indexOfSlice(bytes(0xff, 0xc0))
    val sof2 = base.clone(); sof2(i + 1) = 0xc2.toByte
    assert(Multimodal.parseHeader(sof2) == (("jpeg", 12, 34, 1)))
    // a DHT segment before SOF must be skipped, not parsed as a frame
    val dht = base.slice(0, 2) ++ bytes(0xff, 0xc4, 0x00, 0x04, 0x00, 0x00) ++ base.drop(2)
    assert(Multimodal.parseHeader(dht) == (("jpeg", 12, 34, 1)))
  }

  test("WAV: RIFF chunk walk reads fmt and data; frames = bytes/blockAlign") {
    val b = Multimodal.wavWrap(44100, 2, 16, new Array[Byte](400))
    // 400 data bytes / (2 ch * 2 bytes) = 100 sample frames
    assert(Multimodal.parseHeader(b) == (("wav", 44100, 2, 100)))
  }

  test("WAV: an unknown chunk before fmt is skipped (word-aligned)") {
    val plain = Multimodal.wavWrap(8000, 1, 16, new Array[Byte](64))
    // inject a 3-byte LIST chunk (padded to 4) between WAVE and fmt
    val extra = "LIST".getBytes ++ Array(3, 0, 0, 0).map(_.toByte) ++ bytes(1, 2, 3, 0)
    val spliced = plain.slice(0, 12) ++ extra ++ plain.drop(12)
    assert(Multimodal.parseHeader(spliced) == (("wav", 8000, 1, 32)))
  }

  test("MP4: box walk reads mvhd duration and tkhd 16.16 dims") {
    val b = Multimodal.mp4Wrap(1920, 1080, timescale = 1000, duration = 123,
      "payload".getBytes)
    assert(Multimodal.parseHeader(b) == (("mp4", 1920, 1080, 123)))
  }

  test("truncated / junk payloads sniff as unknown, never throw") {
    assert(Multimodal.parseHeader(Array.empty)._1 == "unknown")
    assert(Multimodal.parseHeader("plain text".getBytes)._1 == "unknown")
    assert(Multimodal.parseHeader(bytes(0x89, 0x50))._1 == "unknown")
    assert(Multimodal.parseHeader(bytes(0xff, 0xd8, 0x00))._1 == "unknown")
    // PNG signature but truncated before IHDR completes
    assert(Multimodal.parseHeader(
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0))._1 == "unknown")
  }

  test("fuzz: random bytes and every truncation of valid wraps never throw") {
    val rnd = new scala.util.Random(4242) // deterministic
    // pure noise, and noise behind each format's magic prefix (the
    // adversarial case: sniff succeeds, structure is garbage)
    val magics = Seq(Array.empty[Byte],
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      bytes(0xff, 0xd8), "RIFF".getBytes ++ bytes(1, 0, 0, 0) ++ "WAVE".getBytes,
      bytes(0, 0, 0, 20) ++ "ftyp".getBytes)
    for (_ <- 0 until 300; magic <- magics) {
      val noise = new Array[Byte](rnd.nextInt(80))
      rnd.nextBytes(noise)
      val r = Multimodal.parseHeader(magic ++ noise) // must not throw
      assert(r._1.nonEmpty)
    }
    // every prefix of every valid container parses or degrades, no throw
    val wraps = Seq(
      Multimodal.pngWrap(100, 50, "body".getBytes),
      Multimodal.jpegWrap(100, 50, "body".getBytes),
      Multimodal.wavWrap(8000, 2, 16, new Array[Byte](32)),
      Multimodal.mp4Wrap(100, 50, 1000, 7, "body".getBytes))
    wraps.foreach { w =>
      (0 to w.length).foreach { n =>
        val r = Multimodal.parseHeader(w.take(n))
        assert(r._1.nonEmpty)
      }
      // and with flipped bytes at every position past the magic
      (8 until w.length).foreach { i =>
        val m = w.clone(); m(i) = (m(i) ^ 0x5a).toByte
        assert(Multimodal.parseHeader(m)._1.nonEmpty)
      }
    }
  }

  test("extractBody demuxes every container back to its exact body; fuzz never throws") {
    val body = "the original media payload bytes".getBytes("UTF-8")
    val wraps = Seq(
      Multimodal.pngWrap(100, 50, body),
      Multimodal.jpegWrap(100, 50, body),
      Multimodal.wavWrap(8000, 2, 16, body),
      Multimodal.mp4Wrap(100, 50, 1000, 7, body))
    wraps.foreach { w =>
      val got = Multimodal.extractBody(w)
      assert(got.exists(_.sameElements(body)),
        s"demux must return the exact body (got ${got.map(_.length)})")
      // truncations and byte flips degrade (None or partial), never throw
      (0 to w.length).foreach(n => Multimodal.extractBody(w.take(n)))
      (0 until w.length).foreach { i =>
        val m = w.clone(); m(i) = (m(i) ^ 0x5a).toByte
        Multimodal.extractBody(m)
      }
    }
    assert(Multimodal.extractBody("not a container".getBytes).isEmpty)
  }

  test("fuzz: 0xFF-filled length fields terminate, never spin (WAV sign-bit guard)") {
    // a 0x5a byte-flip can never set a length's high bit, so the zero/
    // negative-step path needs its own adversarial case: saturate every
    // 4-byte window with 0xFF (lengths 0xFFFFFFFF -> step would be 0) and
    // the two exact poison values called out in review
    val wraps = Seq(
      Multimodal.wavWrap(8000, 2, 16, new Array[Byte](32)),
      Multimodal.pngWrap(100, 50, "body".getBytes),
      Multimodal.jpegWrap(100, 50, "body".getBytes),
      Multimodal.mp4Wrap(100, 50, 1000, 7, "body".getBytes))
    wraps.foreach { w =>
      (8 until w.length).foreach { i =>
        val m = w.clone()
        (i until math.min(i + 4, m.length)).foreach(j => m(j) = 0xff.toByte)
        assert(Multimodal.parseHeader(m)._1.nonEmpty) // terminates, no throw
      }
    }
    // exact poison chunk lengths 0xFFFFFFF8 / 0xFFFFFFF7 (step == 0)
    Seq(0xFFFFFFF8, 0xFFFFFFF7).foreach { len =>
      val chunk = "LIST".getBytes ++ Array(
        (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        ((len >> 16) & 0xff).toByte, ((len >> 24) & 0xff).toByte)
      val b = "RIFF".getBytes ++ Array(1, 0, 0, 0).map(_.toByte) ++
        "WAVE".getBytes ++ chunk ++ new Array[Byte](16)
      assert(Multimodal.parseHeader(b) == (("unknown", 0, 0, 0)))
    }
  }
}
