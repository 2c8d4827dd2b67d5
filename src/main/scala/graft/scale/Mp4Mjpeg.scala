package graft.scale

/** MJPEG-in-MP4 (ISO/IEC 14496-12 + the QuickTime-lineage 'jpeg' visual
  * sample entry): a REAL sample-table video path for the ISO-BMFF
  * container, the MP4 twin of [[AviMjpeg]].
  *
  * The writer emits a full single-track video moov — mvhd, trak{tkhd,
  * mdia{mdhd, hdlr('vide'), minf{vmhd, stbl{stsd('jpeg'), stts, stsc,
  * stsz, stco}}}} — and an mdat whose payload is the concatenated
  * samples; every sample is a complete baseline JPEG. The demuxer walks
  * the real sample table: sizes from stsz, chunk offsets from stco,
  * samples-per-chunk runs from stsc (general run-length form, not just
  * this writer's single chunk), and slices the file by ABSOLUTE offsets
  * the way a real demuxer does. With this, the declared MP4 stub narrows
  * to inter-coded payload codecs (H.26x) — the part that genuinely needs
  * codec libraries.
  *
  * 100 TB posture: identical to the AVI path — the sample-table walk is
  * a bounded header read, samples decode inside mapPartitions, and the
  * per-sample offset arithmetic is what lets a real pipeline seek
  * keyframes WITHOUT reading the full mdat.
  */
object Mp4Mjpeg {

  private def be2(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be4(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def box(kind: String, body: Array[Byte]): Array[Byte] =
    be4(8L + body.length) ++ ascii(kind) ++ body

  /** A real sampled MP4 around MJPEG frames. One video track, one chunk
    * (the demuxer handles the general stsc form anyway), timescale 10,
    * one tick per sample.
    */
  private[graft] def wrap(w: Int, h: Int, frames: Seq[Array[Byte]],
                          captions: Seq[String] = Nil): Array[Byte] = {
    val n = frames.length
    // 3GPP timed text (tx3g): each text sample is a 16-bit big-endian
    // length followed by the UTF-8 bytes — the real wire layout
    val capSamples = captions.map { c =>
      val u = c.getBytes("UTF-8")
      be2(u.length) ++ u
    }
    val ftyp = box("ftyp", ascii("isom") ++ be4(0x200) ++ ascii("isom"))
    val mvhd = box("mvhd", be4(0) /* v0+flags */ ++
      be4(0) ++ be4(0) ++ be4(10) /* timescale */ ++ be4(n.toLong) ++
      be4(0x00010000L) ++ be2(0x0100) ++ be2(0) ++ new Array[Byte](8) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
      new Array[Byte](24) ++ be4(if (capSamples.isEmpty) 2 else 3))
    def tkhdBox(trackId: Int, dur: Int, tw: Int, th: Int) =
      box("tkhd", be4(7) /* v0, enabled|in-movie|in-preview */ ++
        be4(0) ++ be4(0) ++ be4(trackId.toLong) ++ be4(0) ++ be4(dur.toLong) ++
        new Array[Byte](8) ++ be2(0) ++ be2(0) ++ be2(0) ++ be2(0) ++
        (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
          be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
        be4(tw.toLong << 16) ++ be4(th.toLong << 16))
    def mdhdBox(dur: Int) = box("mdhd", be4(0) ++ be4(0) ++ be4(0) ++
      be4(10) ++ be4(dur.toLong) ++ be2(0x55c4 /* 'und' */) ++ be2(0))
    def hdlrBox(kind: String) = box("hdlr", be4(0) ++ be4(0) ++ ascii(kind) ++
      new Array[Byte](12) ++ Array(0.toByte) /* empty name, NUL */)
    def sampleTables(entry: Array[Byte], samples: Seq[Array[Byte]],
                     stco: Array[Byte]): Array[Byte] = {
      val m = samples.length
      box("stbl", box("stsd", be4(0) ++ be4(1) ++ entry) ++
        box("stts", be4(0) ++ be4(1) ++ be4(m.toLong) ++ be4(1)) ++
        box("stsc", be4(0) ++ be4(1) ++ be4(1) ++ be4(m.toLong) ++ be4(1)) ++
        box("stsz", be4(0) ++ be4(0) ++ be4(m.toLong) ++
          samples.toArray.flatMap(s => be4(s.length.toLong))) ++
        stco)
    }
    // VisualSampleEntry 'jpeg' (86 bytes): the QuickTime-lineage MJPEG
    // sample description — every sample an independent baseline JPEG
    val videoEntry = box("jpeg", new Array[Byte](6) ++ be2(1) /* dref idx */ ++
      be2(0) ++ be2(0) ++ new Array[Byte](12) ++ be2(w) ++ be2(h) ++
      be4(0x00480000L) ++ be4(0x00480000L) ++ be4(0) ++ be2(1) ++
      new Array[Byte](32) ++ be2(24) ++ be2(0xffff))
    // TextSampleEntry 'tx3g': reserved(6) + dref(2) + displayFlags(4) +
    // justification(2) + bg color(4) + default text box(8) + default
    // style record(12)
    val textEntry = box("tx3g", new Array[Byte](6) ++ be2(1) ++
      be4(0) ++ be2(0) ++ be4(0) ++ new Array[Byte](8) ++ new Array[Byte](12))
    def trakBox(tkhd: Array[Byte], dur: Int, kind: String, mhd: Array[Byte],
                entry: Array[Byte], samples: Seq[Array[Byte]],
                stco: Array[Byte]): Array[Byte] =
      box("trak", tkhd ++ box("mdia", mdhdBox(dur) ++ hdlrBox(kind) ++
        box("minf", mhd ++ sampleTables(entry, samples, stco))))
    val vmhd = box("vmhd", be4(1) ++ be2(0) ++ be2(0) ++ be2(0) ++ be2(0))
    val nmhd = box("nmhd", be4(0))
    // stco boxes have constant size (one chunk each), so the moov size —
    // and with it the mdat payload offsets — closes before the offsets
    // are known: build the moov twice, dummy offsets then real ones.
    def moovOf(videoOff: Long, textOff: Long): Array[Byte] = {
      val vTrak = trakBox(tkhdBox(1, n, w, h), n, "vide", vmhd, videoEntry,
        frames, box("stco", be4(0) ++ be4(1) ++ be4(videoOff)))
      val tTrak =
        if (capSamples.isEmpty) Array.empty[Byte]
        else trakBox(tkhdBox(2, capSamples.length, 0, 0), capSamples.length,
          "text", nmhd, textEntry, capSamples,
          box("stco", be4(0) ++ be4(1) ++ be4(textOff)))
      box("moov", mvhd ++ vTrak ++ tTrak)
    }
    val moovSize = moovOf(0L, 0L).length
    val dataStart = ftyp.length + moovSize + 8 // + mdat header
    val videoBytes = frames.iterator.map(_.length.toLong).sum
    val moov = moovOf(dataStart.toLong, dataStart.toLong + videoBytes)
    require(moov.length == moovSize, "box size bookkeeping drifted")
    val mdat = box("mdat",
      frames.toArray.flatMap(f => f) ++ capSamples.toArray.flatMap(s => s))
    ftyp ++ moov ++ mdat
  }

  /** True if the payload sniffs as ISO-BMFF (size+'ftyp' at offset 4). */
  private[graft] def isBmff(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 4) == "ftyp"

  /** Signals a box-size form this parser declares out of scope (64-bit
    * largesize) or outright illegal (2..7 — smaller than the box header).
    * Every demux entry point catches it into a clean None. */
  private final class BoxSizeException(msg: String)
    extends RuntimeException(msg)

  /** Walk children of [start, end) yielding (boxType, bodyStart, bodyEnd).
    * ISO-BMFF §4.2 size handling: size==0 means body-extends-to-end (legal
    * for the last box, common for streaming-written mdat) — yielded with
    * bodyEnd=end and the walk stops there; size==1 (64-bit largesize) and
    * sizes above Int.MaxValue are declared out of scope (files that large
    * don't fit this in-memory parser anyway) and raise [[BoxSizeException]]
    * so the caller returns a clean None instead of misparsing a garbage
    * child walk; sizes 2..7 are illegal (below the 8-byte header). */
  private def children(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = start
      def hasNext: Boolean = i + 8 <= end && i + 8 <= b.length
      def next(): (String, Int, Int) = {
        val size = u32be(b, i)
        val kind = tag(b, i + 4)
        if (size == 1L || size > Int.MaxValue.toLong)
          throw new BoxSizeException(s"box size $size out of scope")
        if (size != 0L && size < 8L)
          throw new BoxSizeException(s"illegal box size $size")
        val clampedEnd = math.min(end, b.length)
        if (size == 0L) { // body extends to the end of the enclosing range
          val out = (kind, i + 8, clampedEnd)
          i = clampedEnd
          out
        } else {
          val step = size.toInt
          val bodyEnd = math.min(i + step, clampedEnd)
          val out = (kind, i + 8, bodyEnd)
          i += step
          out
        }
      }
    }

  private def child(b: Array[Byte], start: Int, end: Int,
                    kind: String): Option[(Int, Int)] =
    children(b, start, end).collectFirst { case (k, s, e) if k == kind => (s, e) }

  /** The stbl range of a trak, plus its stsd entry format fourcc. */
  private def trakStbl(b: Array[Byte], trakS: Int,
                       trakE: Int): Option[(Int, Int, String)] =
    for {
      (mdiaS, mdiaE) <- child(b, trakS, trakE, "mdia")
      (minfS, minfE) <- child(b, mdiaS, mdiaE, "minf")
      (stblS, stblE) <- child(b, minfS, minfE, "stbl")
      (stsdS, stsdE) <- child(b, stblS, stblE, "stsd")
      if stsdS + 16 <= stsdE && stsdS + 16 <= b.length
    } yield (stblS, stblE, tag(b, stsdS + 12))

  /** The first trak whose sample description matches `format`:
    * (tkhd body start, stbl range). Multi-trak files (video + timed
    * text) resolve by format, not position.
    */
  private def trakOf(b: Array[Byte], format: String): Option[(Int, Int, Int)] = {
    val (moovS, moovE) = child(b, 0, b.length, "moov").getOrElse(return None)
    children(b, moovS, moovE).collectFirst {
      case ("trak", ts, te) if trakStbl(b, ts, te).exists(_._3 == format) =>
        val (tkhdS, _) = child(b, ts, te, "tkhd").getOrElse(return None)
        val (stblS, stblE, _) = trakStbl(b, ts, te).get
        (tkhdS, stblS, stblE)
    }
  }

  /** Demux the timed-text track (tx3g): each sample is a 16-bit
    * big-endian length + UTF-8 bytes, per 3GPP timed text. None on
    * malformed structure; Some(empty) when the file has no text track.
    */
  /** Every top-level box's declared size must fit the file — the
    * truncation check (nested walks clamp; the top level must not). */
  private def topLevelFits(b: Array[Byte]): Boolean = {
    var i = 0
    while (i + 8 <= b.length) {
      val size = u32be(b, i)
      if (size == 0L) return true // last box extends to EOF — fits
      if (size == 1L || size > Int.MaxValue.toLong) return false // largesize: out of scope
      if (size < 8L) return false // below the 8-byte box header: illegal
      if (i + size.toInt > b.length) return false
      i += size.toInt
    }
    i == b.length
  }

  private[graft] def demuxText(b: Array[Byte]): Option[IndexedSeq[String]] = {
    try {
      if (!isBmff(b)) return None
      // a TRUNCATED file is malformed; one without a text trak isn't
      if (!topLevelFits(b)) return None
      if (child(b, 0, b.length, "moov").isEmpty) return None
      trakOf(b, "tx3g") match {
        case None => Some(Vector.empty)
        case Some((_, stblS, stblE)) =>
          sliceSamples(b, stblS, stblE).flatMap { samples =>
            val texts = Vector.newBuilder[String]
            var i = 0
            var ok = true
            while (ok && i < samples.length) {
              val s = samples(i)
              if (s.length < 2) ok = false
              else {
                val len = ((s(0) & 0xff) << 8) | (s(1) & 0xff)
                if (2 + len > s.length) ok = false
                else texts += new String(s, 2, len, "UTF-8")
              }
              i += 1
            }
            if (ok) Some(texts.result()) else None
          }
      }
    } catch { case _: Throwable => None }
  }

  /** Demux via the REAL sample table: (width, height, samples). Width and
    * height come from tkhd 16.16; sample byte ranges from stsz sizes +
    * stco chunk offsets + stsc samples-per-chunk runs (general run-length
    * form per §8.7.4). The video trak resolves by its 'jpeg' sample
    * description (multi-trak files have timed text too), falling back to
    * the first trak for foreign single-trak files. None on anything
    * malformed, truncated, or missing a video sample table — the
    * never-throw posture.
    */
  private[graft] def demuxSamples(b: Array[Byte]): Option[(Int, Int, IndexedSeq[Array[Byte]])] = {
    try {
      if (!isBmff(b)) return None
      // truncated files are malformed here too, not just in demuxText
      if (!topLevelFits(b)) return None
      val (moovS, moovE) = child(b, 0, b.length, "moov").getOrElse(return None)
      val (tkhdS, stblS, stblE) = trakOf(b, "jpeg").getOrElse {
        // foreign single-trak files may omit stsd-level detail — fall
        // back to the first trak's stbl without requiring a format match
        val (trakS, trakE) = child(b, moovS, moovE, "trak").getOrElse(return None)
        val (t, _) = child(b, trakS, trakE, "tkhd").getOrElse(return None)
        val (mdiaS, mdiaE) = child(b, trakS, trakE, "mdia").getOrElse(return None)
        val (minfS, minfE) = child(b, mdiaS, mdiaE, "minf").getOrElse(return None)
        val (s, e) = child(b, minfS, minfE, "stbl").getOrElse(return None)
        (t, s, e)
      }
      if ((b(tkhdS) & 0xff) != 0) return None // v0 layout only
      val w = (u32be(b, tkhdS + 76) >> 16).toInt
      val h = (u32be(b, tkhdS + 80) >> 16).toInt
      sliceSamples(b, stblS, stblE).map(samples => (w, h, samples))
    } catch { case _: Throwable => None }
  }

  /** Slice a trak's samples out of the file by its REAL sample table. */
  private def sliceSamples(b: Array[Byte], stblS: Int,
                           stblE: Int): Option[IndexedSeq[Array[Byte]]] = {
    try {
      // stsz: sample_size (uniform if nonzero) + count (+ per-sample sizes)
      val (stszS, stszE) = child(b, stblS, stblE, "stsz").getOrElse(return None)
      val uniform = u32be(b, stszS + 4)
      val n = u32be(b, stszS + 8).toInt
      if (n < 0 || n > (1 << 20)) return None
      val sizes: Array[Long] =
        if (uniform != 0) Array.fill(n)(uniform)
        else {
          if (stszS + 12 + 4L * n > stszE) return None
          Array.tabulate(n)(i => u32be(b, stszS + 12 + 4 * i))
        }
      // stco: chunk offsets (32-bit form; co64 out of this writer's scope)
      val (stcoS, stcoE) = child(b, stblS, stblE, "stco").getOrElse(return None)
      val nChunks = u32be(b, stcoS + 4).toInt
      if (nChunks < 0 || stcoS + 8 + 4L * nChunks > stcoE) return None
      val chunkOff = Array.tabulate(nChunks)(i => u32be(b, stcoS + 8 + 4 * i))
      // stsc: (first_chunk, samples_per_chunk) run-length table
      val (stscS, stscE) = child(b, stblS, stblE, "stsc").getOrElse(return None)
      val nRuns = u32be(b, stscS + 4).toInt
      if (nRuns <= 0 || stscS + 8 + 12L * nRuns > stscE) return None
      val runs = Array.tabulate(nRuns) { i =>
        (u32be(b, stscS + 8 + 12 * i).toInt, u32be(b, stscS + 12 + 12 * i).toInt)
      }
      // walk chunks, slicing consecutive samples from each chunk's offset
      val out = Vector.newBuilder[Array[Byte]]
      var sample = 0
      var run = 0
      var chunk = 1
      while (chunk <= nChunks && sample < n) {
        while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
        val perChunk = runs(run)._2
        if (perChunk <= 0) return None
        var off = chunkOff(chunk - 1)
        var s = 0
        while (s < perChunk && sample < n) {
          val sz = sizes(sample)
          if (sz < 0 || off < 0 || off + sz > b.length) return None
          out += java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
          off += sz
          sample += 1
          s += 1
        }
        chunk += 1
      }
      if (sample != n) return None
      Some(out.result())
    } catch { case _: Throwable => None }
  }
}
