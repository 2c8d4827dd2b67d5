package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.1 scale/): image/audio/video
  * payloads ride as opaque `BINARY` columns with typed metadata beside them.
  *
  * The decode step is a STUB — the real codec libraries are not in this
  * container — but everything Spark-side is real and tested: the schema,
  * the typed `Dataset[MediaRecord] -> Dataset[MediaMeta]` mapPartitions
  * plumbing (the Scala analog of `mapInPandas` batch UDFs), partition-level
  * batching, and deterministic outputs an oracle can check.
  *
  * At 100 TB: payloads stay columnar in parquet, the decode runs once per
  * partition with per-partition codec initialization (the expensive part the
  * mapPartitions shape amortizes), and metadata-only queries never touch the
  * binary column thanks to parquet column pruning.
  */
object Multimodal {

  /** A media row: opaque payload + routing metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted metadata (decode-stub output). */
  final case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                             width: Int, height: Int, n_frames: Int)

  /** STUB decoder: deterministic pseudo-dimensions derived from the payload
    * bytes. A real build swaps `decodeOne` for the codec call; the
    * partition-iterator shape (one codec init per partition) is the part
    * that matters for scale.
    */
  private def decodeOne(r: MediaRecord): MediaMeta = {
    val len = r.payload.length.toLong
    val first = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
    MediaMeta(r.doc_id, r.media_type, len,
      width = (len % 640).toInt,
      height = ((len * 7) % 480).toInt,
      n_frames = first % 16)
  }

  /** Partition-batched decode: the per-partition prefix is where a real
    * implementation initializes its codec once.
    */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // codec init would go here (once per partition, not per record)
      it.map(decodeOne)
    }
  }

  /** One sampled frame: the decode-stub digest stands in for the frame
    * tensor a real codec would return.
    */
  final case class FrameSample(doc_id: Long, frame_idx: Int, frame_digest: String)

  /** Uniform-stride frame sampling, the video-side analog of [[decodeMeta]]:
    * up to `target` frames per media row at indices floor(i·n_frames/k),
    * k = min(target, n_frames). Index selection is pure arithmetic; the
    * per-frame "extraction" is the stub digest of (payload, index), and the
    * partition iterator is where a real build seeks/decodes — one codec
    * (and one digest instance) per partition, not per frame. Frame fan-out
    * is bounded at `target` rows per media row, so output size is
    * predictable at any corpus scale.
    */
  def sampleFrames(ds: Dataset[MediaRecord], target: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        val m = decodeOne(r)
        val k = math.min(target, m.n_frames)
        if (k <= 0) Iterator.empty
        else (0 until k).map(i => i * m.n_frames / k).distinct.iterator.map { idx =>
          md.reset()
          md.update(r.payload)
          md.update(s"#$idx".getBytes("UTF-8"))
          FrameSample(r.doc_id, idx, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Builds a deterministic media frame from the documents fixture: the
    * UTF-8 text bytes play the role of the opaque payload.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  // ------------------------------------------------------------------
  // Real container headers: the fixture text is wrapped in byte-exact
  // PNG / JPEG / WAV / MP4 framing (public file-format specs, the same
  // from-the-spec discipline as functions/ProtoWire), and the decode
  // step SNIFFS the magic bytes and parses the real header structures —
  // PNG IHDR, the JPEG marker walk to SOF0, RIFF chunk walk to fmt/data,
  // ISO-BMFF box walk to moov/mvhd/tkhd. Only the pixel/sample DECODE
  // remains out of scope (no codec libs in this container); header
  // parsing, the part a 100 TB metadata pass actually runs, is real.
  // ------------------------------------------------------------------

  private def be2(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be4(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le4(v: Long): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** PNG: signature + IHDR chunk (13-byte payload, real CRC32 over
    * type+data per the PNG spec) + the body bytes as trailing data.
    */
  private[graft] def pngWrap(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val data = ascii("IHDR") ++ be4(w) ++ be4(h) ++
      Array(8.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(data)
    sig ++ be4(13) ++ data ++ be4(crc.getValue) ++ body
  }

  /** JPEG: SOI + APP0(JFIF) + SOF0 (8-bit precision, 3 components) + body.
    * The SOF0 segment carries height then width, both big-endian.
    */
  private[graft] def jpegWrap(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be2(16) ++ ascii("JFIF") ++
      Array(0, 1, 1, 0).map(_.toByte) ++ be2(1) ++ be2(1) ++ Array(0, 0).map(_.toByte)
    val comps = Array(1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be2(8 + 9) ++
      Array(8.toByte) ++ be2(h) ++ be2(w) ++ Array(3.toByte) ++ comps
    Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ sof0 ++ body
  }

  /** WAV: RIFF/WAVE with a 16-byte PCM fmt chunk and the body as the data
    * chunk. All fields little-endian per the RIFF spec.
    */
  private[graft] def wavWrap(sampleRate: Int, channels: Int, bitsPerSample: Int,
                             body: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val fmt = ascii("fmt ") ++ le4(16) ++ le2(1) ++ le2(channels) ++
      le4(sampleRate) ++ le4(sampleRate.toLong * blockAlign) ++
      le2(blockAlign) ++ le2(bitsPerSample)
    val data = ascii("data") ++ le4(body.length)
    ascii("RIFF") ++ le4(4 + fmt.length + data.length + body.length) ++
      ascii("WAVE") ++ fmt ++ data ++ body
  }

  /** MP4 (ISO-BMFF): ftyp + moov{mvhd(v0), trak{tkhd(v0)}} + mdat(body).
    * mvhd carries timescale/duration; tkhd carries width/height as 16.16
    * fixed point — the fields a container-metadata pass extracts.
    */
  private[graft] def mp4Wrap(w: Int, h: Int, timescale: Int, duration: Long,
                             body: Array[Byte]): Array[Byte] = {
    val ftyp = be4(20) ++ ascii("ftyp") ++ ascii("isom") ++ be4(0x200) ++ ascii("isom")
    val mvhd = be4(108) ++ ascii("mvhd") ++ be4(0) /* v0+flags */ ++
      be4(0) ++ be4(0) ++ be4(timescale) ++ be4(duration) ++
      be4(0x00010000L) ++ be2(0x0100) ++ be2(0) ++ new Array[Byte](8) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) /* identity matrix */ ++
      new Array[Byte](24) ++ be4(2)
    val tkhd = be4(92) ++ ascii("tkhd") ++ be4(7) /* v0, enabled|in-movie|in-preview */ ++
      be4(0) ++ be4(0) ++ be4(1) ++ be4(0) ++ be4(duration) ++
      new Array[Byte](8) ++ be2(0) ++ be2(0) ++ be2(0) ++ be2(0) ++
      (be4(0x00010000L) ++ be4(0) ++ be4(0) ++ be4(0) ++ be4(0x00010000L) ++
        be4(0) ++ be4(0) ++ be4(0) ++ be4(0x40000000L)) ++
      be4(w.toLong << 16) ++ be4(h.toLong << 16)
    val trak = be4(8 + tkhd.length) ++ ascii("trak") ++ tkhd
    val moov = be4(8 + mvhd.length + trak.length) ++ ascii("moov") ++ mvhd ++ trak
    val mdat = be4(8L + body.length) ++ ascii("mdat") ++ body
    ftyp ++ moov ++ mdat
  }

  /** Deterministic header parameters for the fixture wrap — the formulas
    * the DuckDB oracle replays (the parse itself has no shortcut: Spark
    * reads the container bytes).
    */
  private def dims(docId: Long): (Int, Int) =
    ((16 + docId % 624).toInt, (16 + (docId * 7) % 464).toInt)

  /** Fixture docs wrapped in REAL container bytes: doc_id%3==0 → PNG
    * (even half) / JPEG (odd half); %3==1 → WAV; %3==2 → MP4.
    */
  def mediaWithHeaders(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val (w, h) = dims(id)
        val payload = (id % 3) match {
          case 0 =>
            if (id % 2 == 0) pngWrap(w, h, body) else jpegWrap(w, h, body)
          case 1 =>
            wavWrap(8000 + (id % 8).toInt * 1000, 1 + (id % 2).toInt, 16, body)
          case _ =>
            mp4Wrap(w, h, timescale = 1000, duration = 1 + id % 240, body)
        }
        MediaRecord(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          payload)
      }
    }
  }

  // --- header parsers (sniff + parse; public-spec integer reads) ---

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Sniff the container from magic bytes and parse its real header.
    * Returns (container, width, height, n_frames); unparseable payloads
    * come back as ("unknown", 0, 0, 0) — the poison-tolerance posture,
    * never a throw on the data path.
    */
  private[graft] def parseHeader(b: Array[Byte]): (String, Int, Int, Int) = {
    try {
      if (b.length >= 8 && PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i))) {
        // PNG: first chunk must be IHDR; width/height big-endian at its head
        if (b.length >= 24 && tag(b, 12) == "IHDR")
          ("png", u32be(b, 16).toInt, u32be(b, 20).toInt, 1)
        else ("unknown", 0, 0, 0)
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk marker segments from SOI until a SOF frame header
        var i = 2
        while (i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) return ("unknown", 0, 0, 0)
          val marker = b(i + 1) & 0xff
          if (marker == 0xff) { i += 1 } // fill byte
          else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // RST/EOI: bare
          else {
            val len = u16be(b, i + 2)
            if ((marker >= 0xc0 && marker <= 0xcf) && marker != 0xc4 &&
                marker != 0xc8 && marker != 0xcc) {
              // SOFn: precision(1), height(2 BE), width(2 BE)
              if (i + 9 <= b.length)
                return ("jpeg", u16be(b, i + 7), u16be(b, i + 5), 1)
              return ("unknown", 0, 0, 0)
            }
            i += 2 + len
          }
        }
        ("unknown", 0, 0, 0)
      } else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
        // WAV: chunk walk; fmt carries rate/channels, data carries samples
        var i = 12
        var rate = 0; var channels = 0; var blockAlign = 0; var dataLen = 0L
        while (i + 8 <= b.length) {
          val ck = tag(b, i); val len = u32le(b, i + 4)
          if (ck == "fmt " && i + 24 <= b.length) {
            channels = u16le(b, i + 10)
            rate = u32le(b, i + 12).toInt
            blockAlign = u16le(b, i + 20)
          } else if (ck == "data") dataLen = len
          // forward-progress guard: a crafted length with the sign bit set
          // (len.toInt < 0) would make the step zero or negative and spin
          // the walk forever — treat it as malformed, same posture as the
          // JPEG (len >= 0 by u16) and BMFF (math.max(size, 8)) walks
          if (len.toInt < 0) return ("unknown", 0, 0, 0)
          i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
        }
        if (rate > 0 && blockAlign > 0)
          ("wav", rate, channels, (dataLen / blockAlign).toInt)
        else ("unknown", 0, 0, 0)
      } else if (b.length >= 12 && tag(b, 4) == "ftyp") {
        // ISO-BMFF: top-level box walk to moov, then child walk to
        // mvhd (timescale/duration) and trak/tkhd (16.16 width/height)
        var w = 0; var h = 0; var frames = 0
        var i = 0
        while (i + 8 <= b.length) {
          val size = u32be(b, i); val box = tag(b, i + 4)
          if (box == "moov") {
            var j = i + 8
            val end = i + size.toInt
            while (j + 8 <= end && j + 8 <= b.length) {
              val csize = u32be(b, j); val cbox = tag(b, j + 4)
              if (cbox == "mvhd" && (b(j + 8) & 0xff) == 0) {
                frames = u32be(b, j + 24).toInt // v0: duration at +24
              } else if (cbox == "trak") {
                // first child assumed tkhd (this writer's layout; a full
                // demuxer would walk children — out of scope here)
                val t = j + 8
                if (t + 8 <= b.length && tag(b, t + 4) == "tkhd" &&
                    (b(t + 8) & 0xff) == 0) {
                  w = (u32be(b, t + 84) >> 16).toInt
                  h = (u32be(b, t + 88) >> 16).toInt
                }
              }
              j += math.max(csize.toInt, 8)
            }
          }
          i += math.max(size.toInt, 8)
        }
        if (w > 0 || frames > 0) ("mp4", w, h, frames) else ("unknown", 0, 0, 0)
      } else ("unknown", 0, 0, 0)
    } catch { case _: Throwable => ("unknown", 0, 0, 0) }
  }

  /** Real header decode over container-framed payloads: media_type is the
    * SNIFFED container (png/jpeg/wav/mp4), width/height/n_frames are the
    * parsed header fields (for wav: sample rate / channels / sample
    * frames). Same partition-batched typed shape as [[decodeMeta]].
    */
  def decodeHeaders(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (container, w, h, nf) = parseHeader(r.payload)
        MediaMeta(r.doc_id, container, r.payload.length.toLong, w, h, nf)
      }
    }
  }

  /** 64-bit aHash-style perceptual fingerprint, packed as FOUR 16-bit
    * bands (LSH-ready). The stub "image" is the payload resampled to an
    * 8×8 grid of byte-mean cells over equal slices; bit i = cell mean >
    * global mean — the real average-hash algorithm over fake pixels. All
    * arithmetic is integer (floor divisions), so the DuckDB oracle
    * replays it exactly. Rows shorter than 64 bytes are skipped (no
    * empty cells, no div-by-zero). Same typed mapPartitions shape as
    * [[decodeMeta]]: a real build swaps the byte slices for decoded
    * luma, everything else stands.
    */
  /** Stub resize: the payload resampled to a `side`×`side` grid of
    * byte-mean cells (same integer grid arithmetic as [[perceptualHash]])
    * emitted as a hex thumbnail — the downsample a real build replaces
    * with a codec resize, with the partition-batched shape and the
    * deterministic output contract already in place. Hex (not raw
    * binary) so the DuckDB oracle can re-derive it byte-for-byte.
    */
  final case class Thumb(doc_id: Long, side: Int, thumb_hex: String)

  def resizeThumb(ds: Dataset[MediaRecord], side: Int): Dataset[Thumb] = {
    import ds.sparkSession.implicits._
    val cells = side * side
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val b = r.payload
        val n = b.length
        if (n < cells) Iterator.empty
        else {
          val sb = new java.lang.StringBuilder(cells * 2)
          var c = 0
          while (c < cells) {
            val lo = c * n / cells
            val hi = (c + 1) * n / cells
            var s = 0L
            var j = lo
            while (j < hi) { s += (b(j) & 0xff); j += 1 }
            val m = (s / (hi - lo)).toInt
            sb.append(f"$m%02x")
            c += 1
          }
          Iterator.single(Thumb(r.doc_id, side, sb.toString))
        }
      }
    }
  }

  /** Stub audio feature-extract: payload bytes read as centered PCM
    * samples, per-frame energy = Σ(sample−128)² over fixed 64-sample
    * frames (trailing partial frame dropped) — all integer, so the
    * oracle replays it. A real build swaps the byte reads for decoded
    * PCM; the frame loop, silence threshold, and per-partition batching
    * stand.
    */
  final case class AudioFrames(doc_id: Long, n_frames: Int, max_energy: Long,
                               max_frame: Int, silence_frames: Int)

  def audioFrameEnergy(ds: Dataset[MediaRecord], frameLen: Int = 64,
                       silenceBelow: Long = 100000L): Dataset[AudioFrames] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val b = r.payload
        val nf = b.length / frameLen
        if (nf == 0) Iterator.empty
        else {
          var maxE = -1L
          var maxI = 0
          var silent = 0
          var f = 0
          while (f < nf) {
            var e = 0L
            var j = f * frameLen
            val end = j + frameLen
            while (j < end) {
              val d = (b(j) & 0xff) - 128L
              e += d * d
              j += 1
            }
            if (e > maxE) { maxE = e; maxI = f }
            if (e < silenceBelow) silent += 1
            f += 1
          }
          Iterator.single(AudioFrames(r.doc_id, nf, maxE, maxI, silent))
        }
      }
    }
  }

  final case class PHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  def perceptualHash(ds: Dataset[MediaRecord]): Dataset[PHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val b = r.payload
        val n = b.length
        if (n < 64) Iterator.empty
        else {
          var tot = 0L
          var i = 0
          while (i < n) { tot += (b(i) & 0xff); i += 1 }
          val gm = tot / n
          val bits = new Array[Int](64)
          var c = 0
          while (c < 64) {
            val lo = c * n / 64
            val hi = (c + 1) * n / 64
            var s = 0L
            var j = lo
            while (j < hi) { s += (b(j) & 0xff); j += 1 }
            bits(c) = if (s / (hi - lo) > gm) 1 else 0
            c += 1
          }
          def band(k: Int): Int = {
            var v = 0
            var j = 0
            while (j < 16) { v |= bits(16 * k + j) << j; j += 1 }
            v
          }
          Iterator.single(PHash(r.doc_id, band(0), band(1), band(2), band(3)))
        }
      }
    }
  }
}
