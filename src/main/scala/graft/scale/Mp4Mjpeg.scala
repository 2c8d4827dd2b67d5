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
  private[graft] def wrap(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val n = frames.length
    val ftyp = box("ftyp", ascii("isom") ++ be4(0x200) ++ ascii("isom"))
    val mvhd = box("mvhd", be4(0) /* v0+flags */ ++
      be4(0) ++ be4(0) ++ be4(10) /* timescale */ ++ be4(n.toLong) ++
      be4(0x00010000L) ++ be2(0x0100) ++ be2(0) ++ new Array[Byte](8) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
      new Array[Byte](24) ++ be4(2))
    val tkhd = box("tkhd", be4(7) /* v0, enabled|in-movie|in-preview */ ++
      be4(0) ++ be4(0) ++ be4(1) ++ be4(0) ++ be4(n.toLong) ++
      new Array[Byte](8) ++ be2(0) ++ be2(0) ++ be2(0) ++ be2(0) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
      be4(w.toLong << 16) ++ be4(h.toLong << 16))
    val mdhd = box("mdhd", be4(0) ++ be4(0) ++ be4(0) ++ be4(10) ++
      be4(n.toLong) ++ be2(0x55c4 /* 'und' */) ++ be2(0))
    val hdlr = box("hdlr", be4(0) ++ be4(0) ++ ascii("vide") ++
      new Array[Byte](12) ++ Array(0.toByte) /* empty name, NUL */)
    val vmhd = box("vmhd", be4(1) ++ be2(0) ++ be2(0) ++ be2(0) ++ be2(0))
    // VisualSampleEntry 'jpeg' (86 bytes): the QuickTime-lineage MJPEG
    // sample description — every sample an independent baseline JPEG
    val sampleEntry = box("jpeg", new Array[Byte](6) ++ be2(1) /* dref idx */ ++
      be2(0) ++ be2(0) ++ new Array[Byte](12) ++ be2(w) ++ be2(h) ++
      be4(0x00480000L) ++ be4(0x00480000L) ++ be4(0) ++ be2(1) ++
      new Array[Byte](32) ++ be2(24) ++ be2(0xffff))
    val stsd = box("stsd", be4(0) ++ be4(1) ++ sampleEntry)
    val stts = box("stts", be4(0) ++ be4(1) ++ be4(n.toLong) ++ be4(1))
    val stsc = box("stsc", be4(0) ++ be4(1) ++ be4(1) ++ be4(n.toLong) ++ be4(1))
    val stsz = box("stsz", be4(0) ++ be4(0) /* per-sample sizes */ ++
      be4(n.toLong) ++ frames.toArray.flatMap(f => be4(f.length.toLong)))
    // stco carries the ABSOLUTE file offset of the single chunk. Its own
    // box size is constant (8 + 4 + 4 + 4), so the moov size — and with
    // it the mdat payload offset — closes before stco's content is known.
    val stcoSize = 8 + 4 + 4 + 4
    val stblSize = 8 + stsd.length + stts.length + stsc.length + stsz.length + stcoSize
    val minfSize = 8 + vmhd.length + stblSize
    val mdiaSize = 8 + mdhd.length + hdlr.length + minfSize
    val trakSize = 8 + tkhd.length + mdiaSize
    val moovSize = 8 + mvhd.length + trakSize
    val dataStart = ftyp.length + moovSize + 8 // + mdat header
    val stco = box("stco", be4(0) ++ be4(1) ++ be4(dataStart.toLong))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ box("mdia",
      mdhd ++ hdlr ++ box("minf", vmhd ++
        box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)))))
    require(moov.length == moovSize, "box size bookkeeping drifted")
    val mdat = box("mdat", frames.toArray.flatMap(f => f))
    ftyp ++ moov ++ mdat
  }

  /** True if the payload sniffs as ISO-BMFF (size+'ftyp' at offset 4). */
  private[graft] def isBmff(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 4) == "ftyp"

  /** Walk children of [start, end) yielding (boxType, bodyStart, bodyEnd). */
  private def children(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = start
      def hasNext: Boolean = i + 8 <= end && i + 8 <= b.length
      def next(): (String, Int, Int) = {
        val size = u32be(b, i)
        val kind = tag(b, i + 4)
        val step = math.max(size.toInt, 8)
        val bodyEnd = math.min(math.min(i + step, end), b.length)
        val out = (kind, i + 8, bodyEnd)
        i += step
        out
      }
    }

  private def child(b: Array[Byte], start: Int, end: Int,
                    kind: String): Option[(Int, Int)] =
    children(b, start, end).collectFirst { case (k, s, e) if k == kind => (s, e) }

  /** Demux via the REAL sample table: (width, height, samples). Width and
    * height come from tkhd 16.16; sample byte ranges from stsz sizes +
    * stco chunk offsets + stsc samples-per-chunk runs (general run-length
    * form per §8.7.4). None on anything malformed, truncated, or missing
    * a video sample table — the never-throw posture.
    */
  private[graft] def demuxSamples(b: Array[Byte]): Option[(Int, Int, IndexedSeq[Array[Byte]])] = {
    try {
      if (!isBmff(b)) return None
      val (moovS, moovE) = child(b, 0, b.length, "moov").getOrElse(return None)
      val (trakS, trakE) = child(b, moovS, moovE, "trak").getOrElse(return None)
      val (tkhdS, _) = child(b, trakS, trakE, "tkhd").getOrElse(return None)
      if ((b(tkhdS) & 0xff) != 0) return None // v0 layout only
      val w = (u32be(b, tkhdS + 76) >> 16).toInt
      val h = (u32be(b, tkhdS + 80) >> 16).toInt
      val (mdiaS, mdiaE) = child(b, trakS, trakE, "mdia").getOrElse(return None)
      val (minfS, minfE) = child(b, mdiaS, mdiaE, "minf").getOrElse(return None)
      val (stblS, stblE) = child(b, minfS, minfE, "stbl").getOrElse(return None)
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
      Some((w, h, out.result()))
    } catch { case _: Throwable => None }
  }
}
