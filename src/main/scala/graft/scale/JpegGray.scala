package graft.scale

/** Baseline-JPEG grayscale codec (ITU-T Rec. T.81, public spec) — the
  * round-10 closure of "the JPEG entropy-coded payload remains the one
  * declared stub". Same discipline as the PNG decoder
  * ([[Multimodal.pngDecodeGray]]): the arithmetic is the published
  * standard's (§A.3.3 FDCT/IDCT, §F.1.2 Huffman entropy coding, Annex C
  * canonical code generation, Annex K.3 example tables), implemented
  * from the spec — not a ported library.
  *
  * Scope, stated precisely: baseline DCT (SOF0), 8-bit, one component
  * (grayscale) or three (YCbCr — interleaved MCUs with sampling factors
  * in {1, 2}; the in-repo encoder emits 4:2:0), restart intervals
  * (DRI/RSTn with per-restart predictor resets, F.2.1.3.1), Huffman
  * tables read from the stream's own DHT segments (so any standard
  * encoder's baseline output decodes, not just ours). Progressive
  * (SOF2), arithmetic coding and >2 sampling factors are out of
  * declared scope → None, the poison-tolerance posture of every media
  * parser here.
  *
  * 100 TB posture: decode is a pure per-row map (mapPartitions over
  * payload bytes, no shuffle); the direct O(64²)-per-block double DCT is
  * exact-simple at fixture scale — a production hot path would swap in
  * the separable/AAN factorization, which changes arithmetic order, not
  * the contract.
  *
  * Reference parity: the reference service treats media payloads as
  * opaque bytes end-to-end (event-streaming-service
  * `service/EventPublisher.java` byte[] value path); pixel-level decode
  * is part of this repo's §7 training-data extension surface.
  */
object JpegGray {

  // ---- zigzag order (T.81 Figure A.6) ---------------------------------
  private[scale] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K.3.1 example Huffman tables (luminance) ------------------
  // BITS: number of codes of length 1..16; HUFFVAL: symbols in code order.
  private[scale] val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[scale] val DcVals: Array[Int] = (0 to 11).toArray
  private[scale] val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[scale] val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Quant table used by the fixture encoder: DC step 8 (so a constant
    * block's DC = 8·(c−128) quantizes LOSSLESSLY — the oracle-exactness
    * trick, see [[Multimodal.plantedBlockPixels]]), AC steps 16 (any
    * residual FDCT noise on constant blocks, ~1e-13, rounds to zero with
    * margin). A real encoder's tables also decode — they ride in DQT.
    */
  private[scale] val FixtureQuant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 8 else 16)

  // ---- canonical Huffman (T.81 Annex C) --------------------------------
  /** (symbol -> (code, length)) for an encoder. */
  private[scale] def buildEncodeTable(bits: Array[Int],
                                      vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Decoder tables: (mincode, maxcode, valptr) per length (T.81 F.2.2.3). */
  private[scale] final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  // ---- bit IO with 0xFF byte stuffing (T.81 F.1.2.3 / F.2.1.3) ---------
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** 1-fill the final partial byte (spec padding). */
    def finish(): Array[Byte] = {
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(acc)
        if (acc == 0xff) out.write(0x00)
      }
      out.toByteArray
    }

    /** Byte-align (1-fill) and emit a restart marker RSTm (T.81 F.1.2.3:
      * markers sit on byte boundaries and are NOT byte-stuffed). */
    def restartMarker(m: Int): Unit = {
      if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        out.write(acc)
        if (acc == 0xff) out.write(0x00)
        acc = 0; nbits = 0
      }
      out.write(0xff)
      out.write(0xd0 + (m & 7))
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var broken = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { broken = true; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { broken = true; return 0 }
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal FF
          else { broken = true; v = 0 } // a real marker inside the scan
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: DecodeTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      if (len > 16 || broken) { broken = true; 0 }
      else t.values(t.valPtr(len) + code - t.minCode(len))
    }

    /** Consume a restart marker (T.81 F.2.1.3.1): discard the current
      * byte's pad bits, step over an unread whole-byte padding (stuffed
      * if it padded to X'FF'), then require FF D0..D7. Sets `broken` and
      * returns false on anything else.
      */
    def restart(): Boolean = {
      nbits = 0
      def marker(p: Int): Boolean =
        p + 1 < b.length && (b(p) & 0xff) == 0xff && {
          val m = b(p + 1) & 0xff; m >= 0xd0 && m <= 0xd7
        }
      if (marker(pos)) { pos += 2; return true }
      // one unread padding byte may precede the marker
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) == 0x00) pos += 2
      else pos += 1
      if (marker(pos)) { pos += 2; true }
      else { broken = true; false }
    }
  }

  /** DCT basis: c(u)·cos((2x+1)uπ/16) with c(0)=1/√2, else 1. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Forward DCT of one level-shifted 8×8 block (T.81 A.3.3), separable
    * row/column factorization: 2×8×64 multiplies instead of the direct
    * form's 64×64 — the standard rewrite (the AAN factorization goes
    * further; unnecessary at this scale). Exactness note: block-constant
    * content still quantizes identically — its AC energy is fp noise
    * (≤1e-12) under either factorization and the DC path is the same
    * exact sum of equal terms.
    */
  private[scale] def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    // columns: tmp(u, x) = Σ_y C(u,y)·block(y, x)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += Cos(u)(y) * block(y * 8 + x); y += 1 }
        tmp(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    val f = new Array[Double](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += Cos(v)(x) * tmp(u * 8 + x); x += 1 }
        f(u * 8 + v) = s / 4.0
        v += 1
      }
      u += 1
    }
    f
  }

  /** Inverse DCT to a level-shifted 8×8 block (T.81 A.3.3), separable. */
  private[scale] def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    // rows: tmp(y, v) = Σ_u C(u,y)·coef(u, v)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cos(u)(y) * coef(u * 8 + v); u += 1 }
        tmp(y * 8 + v) = s
        v += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cos(v)(x) * tmp(y * 8 + v); v += 1 }
        out(y * 8 + x) = s / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Magnitude category (SSSS): bit length of |v|, 0 for 0. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Additional bits for a value in its category (T.81 F.1.2.1.1/F12:
    * positive values verbatim, negative values as v + 2^s − 1).
    */
  private def magBits(v: Int, s: Int): Int =
    if (v >= 0) v else v + (1 << s) - 1

  private def extend(bits: Int, s: Int): Int =
    if (s == 0) 0 else if (bits >= (1 << (s - 1))) bits else bits - (1 << s) + 1

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload

  /** Level-shifted 8×8 block at block coords (bx, by) of a `pw`×`ph`
    * plane, edge-replicated past the right/bottom borders. */
  private def sampleBlock(px: Array[Byte], pw: Int, ph: Int,
                          bx: Int, by: Int): Array[Double] = {
    val blk = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, pw - 1)
        blk(y * 8 + x) = (px(sy * pw + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
    blk
  }

  /** FDCT + quantize + Huffman-code one block (T.81 F.1.2): DC as
    * category+bits on the predictor diff, AC as run/size with ZRL and
    * EOB. Returns the new DC predictor. Shared by the grayscale and the
    * interleaved-MCU color encoders — one arithmetic, two framings.
    */
  private def encodeBlock(bw: BitWriter, blk: Array[Double], quant: Array[Int],
                          dcTab: Map[Int, (Int, Int)], acTab: Map[Int, (Int, Int)],
                          prevDc: Int): Int = {
    val f = fdct(blk)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val z = f(Zigzag(i)) / quant(i)
      q(i) = math.round(z).toInt
      i += 1
    }
    // DC: category + bits on the diff
    val diff = q(0) - prevDc
    val s = category(diff)
    val (dcCode, dcLen) = dcTab(s)
    bw.put(dcCode, dcLen)
    if (s > 0) bw.put(magBits(diff, s), s)
    // AC: run-length of zeros + category, ZRL for 16-runs, EOB
    var run = 0
    var k = 1
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) {
          val (zc, zl) = acTab(0xf0); bw.put(zc, zl); run -= 16
        }
        val ss = category(q(k))
        val (c, l) = acTab((run << 4) | ss)
        bw.put(c, l)
        bw.put(magBits(q(k), ss), ss)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
    q(0)
  }

  /** Encode a grayscale-8 image as a REAL baseline JPEG: SOI, DQT
    * ([[FixtureQuant]]), SOF0 (1 component), DHT (Annex K.3.1 DC + AC),
    * SOS, Huffman-coded byte-stuffed entropy data, EOI. Edge blocks pad
    * by edge replication. Any 8-bit quant table works; the fixture's is
    * chosen so block-constant content round-trips bit-exactly (doc on
    * [[FixtureQuant]]).
    */
  private[graft] def jpegEncodeGray(w: Int, h: Int, px: Array[Byte],
                                    quant: Array[Int] = FixtureQuant,
                                    restartInterval: Int = 0): Array[Byte] = {
    require(px.length == w * h, s"pixel buffer ${px.length} != $w x $h")
    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter
    val bw2 = (w + 7) / 8
    val bh2 = (h + 7) / 8
    val nMcu = bw2 * bh2
    var prevDc = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < bh2) {
      var bx = 0
      while (bx < bw2) {
        prevDc = encodeBlock(bw, sampleBlock(px, w, h, bx, by),
          quant, dcTab, acTab, prevDc)
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 && mcu < nMcu) {
          bw.restartMarker(rst); rst = (rst + 1) & 7; prevDc = 0
        }
        bx += 1
      }
      by += 1
    }
    val scan = bw.finish()
    val dqt = seg(0xdb, Array(0x00.toByte) ++ quant.map(_.toByte))
    val sof = seg(0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0))
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]) =
      seg(0xc4, Array(((cls << 4) | 0).toByte) ++ bits.map(_.toByte) ++
        vals.map(_.toByte))
    val dri =
      if (restartInterval > 0)
        seg(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
          (restartInterval & 0xff).toByte))
      else Array.empty[Byte]
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++
      dht(0, DcBits, DcVals) ++ dht(1, AcBits, AcVals) ++ dri ++ sos ++ scan ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  /** Entropy-decode + dequantize + IDCT one block (T.81 F.2.2): the
    * spatial 8×8 (still level-shifted) and the new DC predictor; null on
    * a broken stream (Option boxing per block would be pure overhead on
    * the innermost loop). Shared by the grayscale and interleaved-MCU
    * color decoders.
    */
  private def decodeBlock(br: BitReader, dc: DecodeTable, ac: DecodeTable,
                          qt: Array[Int], prevDc: Int): (Array[Double], Int) = {
    val zz = new Array[Int](64)
    val s = br.decode(dc)
    val newDc = prevDc + extend(br.bits(s), s)
    zz(0) = newDc
    var k = 1
    while (k < 64) {
      val rs = br.decode(ac)
      if (br.broken) return null
      val run = rs >> 4
      val ss = rs & 0x0f
      if (ss == 0) {
        if (run == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += run
        if (k > 63) return null
        zz(k) = extend(br.bits(ss), ss)
        k += 1
      }
    }
    if (br.broken) return null
    val coef = new Array[Double](64)
    var j = 0
    while (j < 64) { coef(Zigzag(j)) = (zz(j) * qt(j)).toDouble; j += 1 }
    (idct(coef), newDc)
  }

  /** Decode a baseline grayscale JPEG to its true pixel grid: marker
    * walk, DQT/DHT read FROM THE STREAM (any baseline encoder's tables),
    * SOF0 (single 8-bit component only), DRI restart intervals (RSTn
    * consumption + predictor reset), Huffman entropy decode with byte
    * unstuffing, dequantize, de-zigzag, IDCT, level shift, clamp, crop
    * to the SOF dims. None — never throws — on anything outside the
    * declared scope or malformed (progressive, multi-component,
    * truncated scans, undefined tables). Multi-component baselines
    * decode via [[jpegDecodeYcc]].
    */
  private[graft] def jpegDecodeGray(b: Array[Byte]): Option[Multimodal.PngImage] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
      val dcTabs = scala.collection.mutable.Map.empty[Int, DecodeTable]
      val acTabs = scala.collection.mutable.Map.empty[Int, DecodeTable]
      var w = -1; var h = -1; var qId = -1; var ri = 0
      var dcId = -1; var acId = -1
      var scanStart = -1
      while (scanStart < 0) {
        if (i + 4 > b.length || (b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9) return None // EOI before any scan
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        val p = i + 4
        marker match {
          case 0xdb => // DQT: possibly several tables per segment
            var q = p
            while (q < i + 2 + len) {
              val pq = (b(q) & 0xff) >> 4
              val tq = b(q) & 0x0f
              if (pq != 0) return None // 16-bit tables out of scope
              if (q + 65 > i + 2 + len) return None
              quant(tq) = Array.tabulate(64)(k => b(q + 1 + k) & 0xff)
              q += 65
            }
          case 0xc4 => // DHT: possibly several tables per segment
            var q = p
            while (q < i + 2 + len) {
              val tc = (b(q) & 0xff) >> 4
              val th = b(q) & 0x0f
              if (q + 17 > i + 2 + len) return None
              val bits = Array.tabulate(16)(k => b(q + 1 + k) & 0xff)
              val n = bits.sum
              if (q + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => b(q + 17 + k) & 0xff)
              val t = new DecodeTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (len < 11 || (b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            if ((b(p + 5) & 0xff) != 1) return None // grayscale only
            qId = b(p + 8) & 0xff
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // progressive/extended/arithmetic out of scope
          case 0xdd => // DRI: restart interval in MCUs
            if (len < 4) return None
            ri = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          case 0xda => // SOS
            if ((b(p) & 0xff) != 1) return None
            dcId = (b(p + 2) & 0xff) >> 4
            acId = b(p + 2) & 0x0f
            scanStart = i + 2 + len
          case _ => // APPn/COM/...: skip
        }
        i += 2 + len
      }
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      val qt = quant.getOrElse(qId, return None)
      val dc = dcTabs.getOrElse(dcId, return None)
      val ac = acTabs.getOrElse(acId, return None)
      val br = new BitReader(b, scanStart)
      val px = new Array[Byte](w * h)
      val bw2 = (w + 7) / 8
      val bh2 = (h + 7) / 8
      val nMcu = bw2 * bh2
      var mcu = 0
      var prevDc = 0
      var by = 0
      while (by < bh2) {
        var bx = 0
        while (bx < bw2) {
          val dec = decodeBlock(br, dc, ac, qt, prevDc)
          if (dec == null) return None
          val (blk, newDc) = dec
          prevDc = newDc
          mcu += 1
          if (ri > 0 && mcu % ri == 0 && mcu < nMcu) {
            if (!br.restart()) return None
            prevDc = 0 // predictors reset at every restart (F.2.1.3.1)
          }
          var y = 0
          while (y < 8) {
            val py = by * 8 + y
            if (py < h) {
              var x = 0
              while (x < 8) {
                val pxx = bx * 8 + x
                if (pxx < w) {
                  val v = math.round(blk(y * 8 + x) + 128.0).toInt
                  px(py * w + pxx) = math.max(0, math.min(255, v)).toByte
                }
                x += 1
              }
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      Some(Multimodal.PngImage(w, h, px))
    } catch { case _: Throwable => None }
  }

  // ---- baseline COLOR (YCbCr), T.81 interleaved MCUs -------------------

  /** A decoded color image: luma at full resolution, chroma planes
    * upsampled back to full resolution (nearest neighbor, the integer
    * mapping cx = x·Hc/hmax — deterministic, so oracle-replayable). RGB
    * conversion is deliberately NOT provided: the JFIF YCbCr↔RGB matrix
    * is real-valued and implementation-defined in its rounding, while
    * every operator here (stats, thumbs, aHash) wants one 8-bit plane —
    * the luma — plus exact chroma statistics.
    */
  private[graft] final case class YccImage(width: Int, height: Int,
                                           yP: Array[Byte], cb: Array[Byte],
                                           cr: Array[Byte])

  /** Encode a YCbCr 4:2:0 image as a REAL baseline color JPEG: SOF0 with
    * three components (Y sampling 2×2, Cb/Cr 1×1), interleaved MCUs per
    * T.81 A.2.3 (four Y blocks then Cb then Cr per 16×16 MCU), one DC
    * predictor per component. All components reference the same quant
    * and Huffman tables (spec-legal — SOS/SOF carry table ids); with
    * [[FixtureQuant]] the block-constant content class round-trips every
    * PLANE bit-exactly, the same oracle-exactness trick as grayscale.
    * `cb`/`cr` are half-resolution planes (⌈w/2⌉×⌈h/2⌉), edge-replicated
    * into partial MCUs.
    */
  private[graft] def jpegEncodeYcc420(w: Int, h: Int, yP: Array[Byte],
                                      cb: Array[Byte], cr: Array[Byte],
                                      quant: Array[Int] = FixtureQuant,
                                      restartInterval: Int = 0): Array[Byte] = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    require(yP.length == w * h, s"luma buffer ${yP.length} != $w x $h")
    require(cb.length == cw * ch && cr.length == cw * ch,
      s"chroma buffers must be $cw x $ch")
    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter
    val mcuX = (w + 15) / 16
    val mcuY = (h + 15) / 16
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcuN = 0
    var rst = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) {
            dcY = encodeBlock(bw, sampleBlock(yP, w, h, mx * 2 + u, my * 2 + v),
              quant, dcTab, acTab, dcY)
            u += 1
          }
          v += 1
        }
        dcCb = encodeBlock(bw, sampleBlock(cb, cw, ch, mx, my),
          quant, dcTab, acTab, dcCb)
        dcCr = encodeBlock(bw, sampleBlock(cr, cw, ch, mx, my),
          quant, dcTab, acTab, dcCr)
        mcuN += 1
        if (restartInterval > 0 && mcuN % restartInterval == 0 &&
            mcuN < mcuX * mcuY) {
          bw.restartMarker(rst); rst = (rst + 1) & 7
          dcY = 0; dcCb = 0; dcCr = 0
        }
        mx += 1
      }
      my += 1
    }
    val scan = bw.finish()
    val dqt = seg(0xdb, Array(0x00.toByte) ++ quant.map(_.toByte))
    val sof = seg(0xc0, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]) =
      seg(0xc4, Array(((cls << 4) | 0).toByte) ++ bits.map(_.toByte) ++
        vals.map(_.toByte))
    val dri =
      if (restartInterval > 0)
        seg(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
          (restartInterval & 0xff).toByte))
      else Array.empty[Byte]
    val sos = seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++
      dht(0, DcBits, DcVals) ++ dht(1, AcBits, AcVals) ++ dri ++ sos ++ scan ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  /** Decode a baseline JPEG with one OR three components and sampling
    * factors in {1, 2} (covers grayscale, 4:4:4, 4:2:2, 4:4:0, 4:2:0 —
    * what baseline encoders actually emit): generic interleaved-MCU
    * walk per T.81 A.2.3, per-component DC predictors, per-component
    * quant/Huffman table ids from SOF/SOS, chroma planes nearest-neighbor
    * upsampled to full resolution. Single-component scans use the
    * non-interleaved MCU (one data unit) regardless of sampling, per
    * A.2.2. None on progressive / restart markers / >2 sampling /
    * malformed — the same declared-scope posture as [[jpegDecodeGray]].
    */
  private[graft] def jpegDecodeYcc(b: Array[Byte]): Option[YccImage] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
      val dcTabs = scala.collection.mutable.Map.empty[Int, DecodeTable]
      val acTabs = scala.collection.mutable.Map.empty[Int, DecodeTable]
      var w = -1; var h = -1; var ri = 0
      // per-component (in SOF order): id, hS, vS, quant id; SOS adds table ids
      var comps: Array[(Int, Int, Int, Int)] = null
      var scanTabs: Map[Int, (Int, Int)] = null // comp id -> (dc id, ac id)
      var scanOrder: Array[Int] = null          // SOS component ids in order
      var scanStart = -1
      while (scanStart < 0) {
        if (i + 4 > b.length || (b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9) return None
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        val p = i + 4
        marker match {
          case 0xdb =>
            var q = p
            while (q < i + 2 + len) {
              val pq = (b(q) & 0xff) >> 4
              val tq = b(q) & 0x0f
              if (pq != 0) return None
              if (q + 65 > i + 2 + len) return None
              quant(tq) = Array.tabulate(64)(k => b(q + 1 + k) & 0xff)
              q += 65
            }
          case 0xc4 =>
            var q = p
            while (q < i + 2 + len) {
              val tc = (b(q) & 0xff) >> 4
              val th = b(q) & 0x0f
              if (q + 17 > i + 2 + len) return None
              val bits = Array.tabulate(16)(k => b(q + 1 + k) & 0xff)
              val n = bits.sum
              if (q + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => b(q + 17 + k) & 0xff)
              val t = new DecodeTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + n
            }
          case 0xc0 =>
            if (len < 8 || (b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            val nc = b(p + 5) & 0xff
            if (nc != 1 && nc != 3) return None
            if (len < 8 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val q = p + 6 + 3 * c
              val id = b(q) & 0xff
              val hs = (b(q + 1) & 0xff) >> 4
              val vs = b(q + 1) & 0x0f
              if (hs < 1 || hs > 2 || vs < 1 || vs > 2) return None
              (id, hs, vs, b(q + 2) & 0xff)
            }
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None
          case 0xdd => // DRI: restart interval in MCUs
            if (len < 4) return None
            ri = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          case 0xda =>
            val ns = b(p) & 0xff
            if (comps == null || ns != comps.length) return None
            scanOrder = Array.tabulate(ns)(c => b(p + 1 + 2 * c) & 0xff)
            scanTabs = Array.tabulate(ns) { c =>
              val id = b(p + 1 + 2 * c) & 0xff
              val t = b(p + 2 + 2 * c) & 0xff
              id -> ((t >> 4, t & 0x0f))
            }.toMap
            scanStart = i + 2 + len
          case _ =>
        }
        i += 2 + len
      }
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      // the scan must cover the frame components in SOF order (the
      // baseline-interleaved case; partial scans are progressive's game)
      if (!scanOrder.sameElements(comps.map(_._1))) return None
      val single = comps.length == 1
      val hmax = comps.map(_._2).max
      val vmax = comps.map(_._3).max
      val mcuX = if (single) (w + 7) / 8 else (w + 8 * hmax - 1) / (8 * hmax)
      val mcuY = if (single) (h + 7) / 8 else (h + 8 * vmax - 1) / (8 * vmax)
      // per-component padded planes (block-aligned to the MCU grid)
      val planes = comps.map { case (id, hs, vs, tq) =>
        val bwc = if (single) mcuX else mcuX * hs
        val bhc = if (single) mcuY else mcuY * vs
        val qt = quant.getOrElse(tq, return None)
        val (dcId, acId) = scanTabs.getOrElse(id, return None)
        val dc = dcTabs.getOrElse(dcId, return None)
        val ac = acTabs.getOrElse(acId, return None)
        (new Array[Byte](bwc * 8 * bhc * 8), bwc * 8, qt, dc, ac)
      }
      val br = new BitReader(b, scanStart)
      val preds = new Array[Int](comps.length)
      var mcuN = 0
      var my = 0
      while (my < mcuY) {
        var mx = 0
        while (mx < mcuX) {
          var c = 0
          while (c < comps.length) {
            val (_, hs, vs, _) = comps(c)
            val (plane, pw, qt, dc, ac) = planes(c)
            val nv = if (single) 1 else vs
            val nh = if (single) 1 else hs
            var v = 0
            while (v < nv) {
              var u = 0
              while (u < nh) {
                val dec = decodeBlock(br, dc, ac, qt, preds(c))
                if (dec == null) return None
                preds(c) = dec._2
                val blk = dec._1
                val ox = (if (single) mx else mx * hs + u) * 8
                val oy = (if (single) my else my * vs + v) * 8
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    val pv = math.round(blk(y * 8 + x) + 128.0).toInt
                    plane((oy + y) * pw + ox + x) =
                      math.max(0, math.min(255, pv)).toByte
                    x += 1
                  }
                  y += 1
                }
                u += 1
              }
              v += 1
            }
            c += 1
          }
          mcuN += 1
          if (ri > 0 && mcuN % ri == 0 && mcuN < mcuX * mcuY) {
            if (!br.restart()) return None
            java.util.Arrays.fill(preds, 0) // all predictors reset (F.2.1.3.1)
          }
          mx += 1
        }
        my += 1
      }
      // crop/upsample every plane to w×h (nearest neighbor on the integer
      // grid cx = x·Hc/hmax — exact for the 2:1 ratios in scope)
      def fullRes(ci: Int): Array[Byte] = {
        val (_, hs0, vs0, _) = comps(ci)
        val (plane, pw, _, _, _) = planes(ci)
        val hs = if (single) hmax else hs0 // single-comp: no resampling
        val vs = if (single) vmax else vs0
        if (hs == hmax && vs == vmax && pw == w && plane.length == w * h) plane
        else {
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            val sy = y * vs / vmax
            var x = 0
            while (x < w) {
              out(y * w + x) = plane(sy * pw + x * hs / hmax)
              x += 1
            }
            y += 1
          }
          out
        }
      }
      val luma = fullRes(0)
      if (single) {
        val mid = Array.fill(w * h)(128.toByte) // neutral chroma
        Some(YccImage(w, h, luma, mid, mid))
      } else Some(YccImage(w, h, luma, fullRes(1), fullRes(2)))
    } catch { case _: Throwable => None }
  }

  /** The luma plane of any in-scope baseline JPEG (grayscale or color) as
    * a grayscale image — what lets every existing pixel operator (stats,
    * thumbs, aHash, media dedup) run over a COLOR corpus unchanged.
    */
  private[graft] def jpegDecodeLuma(b: Array[Byte]): Option[Multimodal.PngImage] =
    jpegDecodeYcc(b).map(c => Multimodal.PngImage(c.width, c.height, c.yP))
}
