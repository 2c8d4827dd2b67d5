package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXIF metadata (APP1 "Exif" + TIFF 6.0 IFD walk) — the typed-metadata
  * pass a multimodal pipeline runs before any pixel ever decodes:
  * orientation for rotation-normalized hashing, capture time for
  * freshness/curriculum gates, camera make for source attribution.
  *
  * Writer: a real APP1 segment — "Exif\0\0", TIFF header (II or MM byte
  * order, magic 42, IFD0 offset), one IFD0 whose entries follow the spec
  * layout exactly (tag, type, count, value-or-offset; ASCII values
  * longer than 4 bytes live past the IFD through offsets, NUL-terminated,
  * word-aligned). Reader: marker walk to APP1, endian-aware TIFF walk,
  * SHORT/ASCII value reads, None on anything malformed — the same
  * poison posture as every parser here.
  *
  * 100 TB posture: EXIF extraction is a bounded header read (the APP1
  * segment caps at 64 KiB by the JPEG length field) — the metadata pass
  * never touches entropy-coded data, so a scan projecting only metadata
  * columns reads kilobytes per image, not the payload.
  */
object Exif {

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def p16(v: Int, le: Boolean): Array[Byte] =
    if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def p32(v: Long, le: Boolean): Array[Byte] =
    if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  val TagMake = 0x010f
  val TagOrientation = 0x0112
  val TagDateTime = 0x0132
  val TagArtist = 0x013b
  val TagGpsPointer = 0x8825
  // GPS IFD tags (EXIF 2.3 §4.6.6)
  val TagGpsLatRef = 1
  val TagGpsLat = 2
  val TagGpsLonRef = 3
  val TagGpsLon = 4

  /** A real APP1 Exif segment with IFD0 = {Make (ASCII), Orientation
    * (SHORT), DateTime (ASCII, the spec's "YYYY:MM:DD HH:MM:SS")}.
    * `littleEndian` selects the TIFF byte order ("II" vs "MM") — both
    * are legal and both occur in the wild.
    */
  private[graft] def app1(make: String, orientation: Int, dateTime: String,
                          littleEndian: Boolean): Array[Byte] = {
    val le = littleEndian
    val tiffStart = 0 // offsets are relative to the TIFF header
    val header = (if (le) "II" else "MM").getBytes("US-ASCII") ++
      p16(42, le) ++ p32(8, le) // IFD0 directly after the header
    // IFD0: count + 3 entries + next-IFD(0); data area follows
    val nEntries = 3
    val ifdBytes = 2 + nEntries * 12 + 4
    var dataOff = 8 + ifdBytes // first free byte after IFD0
    val data = new java.io.ByteArrayOutputStream()
    // (count, valueField): count is the ENCODED byte length incl. NUL --
    // TIFF 6.0 type-2 values are US-ASCII, so the entry count must come
    // from the encoded bytes, not the UTF-16 code-unit count (they differ
    // for non-ASCII input, which would otherwise corrupt the IFD).
    def asciiValue(s: String): (Int, Array[Byte]) = {
      val v = (s + "\u0000").getBytes("US-ASCII")
      val field =
        if (v.length <= 4) v ++ new Array[Byte](4 - v.length)
        else {
          val off = dataOff
          data.write(v)
          if (v.length % 2 == 1) { data.write(0) } // word alignment
          dataOff += v.length + (v.length % 2)
          p32(off.toLong + tiffStart, le)
        }
      (v.length, field)
    }
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]): Array[Byte] =
      p16(tag, le) ++ p16(typ, le) ++ p32(count.toLong, le) ++ value
    // entries must be ascending by tag per TIFF 6.0
    val (makeN, makeV) = asciiValue(make)
    val eMake = entry(TagMake, 2 /* ASCII */, makeN, makeV)
    val eOri = entry(TagOrientation, 3 /* SHORT */, 1,
      p16(orientation, le) ++ p16(0, le))
    val (dtN, dtV) = asciiValue(dateTime)
    val eDt = entry(TagDateTime, 2, dtN, dtV)
    val ifd = p16(nEntries, le) ++ eMake ++ eOri ++ eDt ++ p32(0, le)
    val tiff = header ++ ifd ++ data.toByteArray
    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff
    Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
  }

  /** [[app1]] extended with the privacy-sensitive fields a scraped
    * photo corpus actually carries: an optional Artist (owner) ASCII
    * entry in IFD0 and an optional GPS IFD (pointer tag 0x8825 → a
    * second IFD with LatRef/Lat/LonRef/Lon, rationals per EXIF 2.3)
    * laid out after IFD0's data area. With both None the segment is
    * byte-identical to [[app1]].
    */
  private[graft] def app1Gps(make: String, orientation: Int, dateTime: String,
      artist: Option[String],
      gps: Option[(String, Int, Int, String, Int, Int)],
      littleEndian: Boolean): Array[Byte] = {
    val le = littleEndian
    val header = (if (le) "II" else "MM").getBytes("US-ASCII") ++
      p16(42, le) ++ p32(8, le)
    val nE0 = 3 + artist.size + gps.size
    val ifd0Bytes = 2 + nE0 * 12 + 4
    var dataOff = 8 + ifd0Bytes
    val data = new java.io.ByteArrayOutputStream()
    def asciiValue(sv: String): (Int, Array[Byte]) = {
      val v = (sv + "\u0000").getBytes("US-ASCII")
      val field =
        if (v.length <= 4) v ++ new Array[Byte](4 - v.length)
        else {
          val off = dataOff
          data.write(v)
          if (v.length % 2 == 1) data.write(0)
          dataOff += v.length + (v.length % 2)
          p32(off.toLong, le)
        }
      (v.length, field)
    }
    def entry(tag: Int, typ: Int, count: Int, value: Array[Byte]): Array[Byte] =
      p16(tag, le) ++ p16(typ, le) ++ p32(count.toLong, le) ++ value
    val (makeN, makeV) = asciiValue(make)
    val eMake = entry(TagMake, 2, makeN, makeV)
    val eOri = entry(TagOrientation, 3, 1, p16(orientation, le) ++ p16(0, le))
    val (dtN, dtV) = asciiValue(dateTime)
    val eDt = entry(TagDateTime, 2, dtN, dtV)
    val eArtist = artist.map { a =>
      val (n, v) = asciiValue(a); entry(TagArtist, 2, n, v)
    }
    // the GPS IFD starts right after IFD0's (word-aligned) data area
    val gpsOff = dataOff
    val eGps = gps.map(_ => entry(TagGpsPointer, 4, 1, p32(gpsOff.toLong, le)))
    // entries ascending by tag: 010F, 0112, 0132, 013B, 8825
    val ifd0 = p16(nE0, le) ++ eMake ++ eOri ++ eDt ++
      eArtist.getOrElse(Array.empty[Byte]) ++
      eGps.getOrElse(Array.empty[Byte]) ++ p32(0, le)
    val gpsBytes = gps.map { case (latRef, latDeg, latMin, lonRef, lonDeg, lonMin) =>
      val nG = 4
      var gDataOff = gpsOff + 2 + nG * 12 + 4
      val gData = new java.io.ByteArrayOutputStream()
      def rational3(deg: Int, min: Int): Array[Byte] = {
        val off = gDataOff
        gData.write(p32(deg.toLong, le)); gData.write(p32(1L, le))
        gData.write(p32(min.toLong, le)); gData.write(p32(1L, le))
        gData.write(p32(0L, le)); gData.write(p32(1L, le))
        gDataOff += 24
        p32(off.toLong, le)
      }
      def refVal(r: String): Array[Byte] = {
        val v = (r + "\u0000").getBytes("US-ASCII")
        v ++ new Array[Byte](4 - v.length)
      }
      val e1 = entry(TagGpsLatRef, 2, 2, refVal(latRef))
      val e2 = entry(TagGpsLat, 5, 3, rational3(latDeg, latMin))
      val e3 = entry(TagGpsLonRef, 2, 2, refVal(lonRef))
      val e4 = entry(TagGpsLon, 5, 3, rational3(lonDeg, lonMin))
      p16(nG, le) ++ e1 ++ e2 ++ e3 ++ e4 ++ p32(0L, le) ++ gData.toByteArray
    }
    val tiff = header ++ ifd0 ++ data.toByteArray ++
      gpsBytes.getOrElse(Array.empty[Byte])
    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff
    Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
  }

  /** Insert an APP1 segment right after SOI — where the EXIF spec puts
    * it. No-op (returns the input) if the payload is not a JPEG. */
  private[graft] def insertApp1(jpeg: Array[Byte], seg: Array[Byte]): Array[Byte] =
    if (jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
      jpeg.take(2) ++ seg ++ jpeg.drop(2)
    else jpeg

  /** Extracted EXIF fields; `byte_order` records which TIFF endianness
    * the file used ("II"/"MM") — itself a parsed fact. */
  final case class ExifMeta(doc_id: Long, make: String, orientation: Int,
                            date_time: String, byte_order: String)

  /** Parse the first APP1 "Exif" segment: marker walk (same discipline
    * as the JPEG header parse), TIFF endianness + magic check, IFD0
    * entry walk reading Make/Orientation/DateTime. None on anything
    * missing or malformed — never a throw.
    */
  private[graft] def parse(b: Array[Byte]): Option[(String, Int, String, String)] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // scan: no APP1 ahead
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 16 &&
            new String(b, i + 4, 6, "US-ASCII") == "Exif\u0000\u0000") {
          val t = i + 10 // TIFF header start
          val order = new String(b, t, 2, "US-ASCII")
          val le = order match {
            case "II" => true
            case "MM" => false
            case _    => return None
          }
          if (u16(b, t + 2, le) != 42) return None
          val ifd = t + u32(b, t + 4, le).toInt
          if (ifd + 2 > i + 2 + len) return None
          val n = u16(b, ifd, le)
          var make: String = null
          var ori = -1
          var dt: String = null
          var e = 0
          while (e < n) {
            val p = ifd + 2 + e * 12
            if (p + 12 > i + 2 + len) return None
            val tag = u16(b, p, le)
            val typ = u16(b, p + 2, le)
            val count = u32(b, p + 4, le).toInt
            def asciiAt: Option[String] = {
              if (typ != 2 || count <= 0 || count > 1024) return None
              val off = if (count <= 4) p + 8 else t + u32(b, p + 8, le).toInt
              // offsets must stay INSIDE the APP1 segment — a value
              // pointing into the entropy stream is malformed, not data
              if (off < t || off + count > i + 2 + len) return None
              Some(new String(b, off, count - 1, "US-ASCII")) // strip NUL
            }
            tag match {
              case TagMake        => make = asciiAt.getOrElse(return None)
              case TagOrientation =>
                if (typ != 3) return None
                ori = u16(b, p + 8, le)
              case TagDateTime    => dt = asciiAt.getOrElse(return None)
              case _              => ()
            }
            e += 1
          }
          return if (make != null && ori >= 0 && dt != null)
            Some((make, ori, dt, order)) else None
        }
        i += 2 + len
      }
      None
    } catch { case _: Throwable => None }
  }

  /** Planted EXIF fields — the formulas the oracle replays. Byte order
    * alternates by id parity so BOTH TIFF endiannesses are gate-covered.
    */
  private[graft] def plantedFields(id: Long): (String, Int, String, Boolean) = (
    s"CAM-${id % 5}",
    (1 + id % 8).toInt,
    f"2020:01:${1 + id % 28}%02d ${id % 24}%02d:00:00",
    id % 2 == 0)

  /** Fixture docs as planted-pixel JPEGs carrying a REAL EXIF APP1. */
  def mediaJpegExif(docs: DataFrame): Dataset[Multimodal.MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = Multimodal.pixDims(id)
        val (make, ori, dt, le) = plantedFields(id)
        Multimodal.MediaRecord(id, "image", insertApp1(
          JpegGray.jpegEncodeGray(w, h, Multimodal.plantedBlockPixels(w, h, id)),
          app1(make, ori, dt, le)))
      }
    }
  }

  /** The metadata pass: EXIF fields per image, payloads never shuffled,
    * unparseable/EXIF-less images skipped (the caller anti-joins for an
    * audit, the admission pattern). */
  def exifMeta(ds: Dataset[Multimodal.MediaRecord]): Dataset[ExifMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        parse(r.payload).iterator.map { case (make, ori, dt, order) =>
          ExifMeta(r.doc_id, make, ori, dt, order)
        }
      }
    }
  }

  // ------------------- GPS / owner privacy redaction -------------------

  /** Full parse including the privacy fields: (make, orientation,
    * dateTime, order, artist?, lat "REF:deg:min"?, lon "REF:deg:min"?).
    * GPS rationals are read num/den with the minute granularity the
    * fixture plants (seconds ignored); same poison posture as [[parse]].
    */
  private[graft] def parseAll(b: Array[Byte])
      : Option[(String, Int, String, String, Option[String], Option[String], Option[String])] = {
    try {
      val (app1Start, app1Len) = findApp1(b).getOrElse(return None)
      val i = app1Start
      val len = app1Len
      val t = i + 10
      val order = new String(b, t, 2, "US-ASCII")
      val le = order match {
        case "II" => true
        case "MM" => false
        case _    => return None
      }
      if (u16(b, t + 2, le) != 42) return None
      val segEnd = i + 2 + len
      val ifd = t + u32(b, t + 4, le).toInt
      if (ifd + 2 > segEnd) return None
      val n = u16(b, ifd, le)
      var make: String = null
      var ori = -1
      var dt: String = null
      var artist: Option[String] = None
      var gpsIfd = -1
      def asciiAt(p: Int, typ: Int, count: Int): Option[String] = {
        if (typ != 2 || count <= 0 || count > 1024) return None
        val off = if (count <= 4) p + 8 else t + u32(b, p + 8, le).toInt
        if (off < t || off + count > segEnd) return None
        Some(new String(b, off, count - 1, "US-ASCII"))
      }
      var e = 0
      while (e < n) {
        val p = ifd + 2 + e * 12
        if (p + 12 > segEnd) return None
        val tag = u16(b, p, le)
        val typ = u16(b, p + 2, le)
        val count = u32(b, p + 4, le).toInt
        tag match {
          case TagMake        => make = asciiAt(p, typ, count).getOrElse(return None)
          case TagOrientation =>
            if (typ != 3) return None
            ori = u16(b, p + 8, le)
          case TagDateTime    => dt = asciiAt(p, typ, count).getOrElse(return None)
          case TagArtist      => artist = asciiAt(p, typ, count)
          case TagGpsPointer  =>
            if (typ == 4) gpsIfd = t + u32(b, p + 8, le).toInt
          case _              => ()
        }
        e += 1
      }
      var lat: Option[String] = None
      var lon: Option[String] = None
      if (gpsIfd >= t && gpsIfd + 2 <= segEnd) {
        val gn = u16(b, gpsIfd, le)
        var latRef: String = null; var lonRef: String = null
        var latDM: (Long, Long) = null; var lonDM: (Long, Long) = null
        def rationalDM(p: Int): Option[(Long, Long)] = {
          val off = t + u32(b, p + 8, le).toInt
          if (off < t || off + 24 > segEnd) return None // 3 RATIONALs = 24 B
          val dDen = u32(b, off + 4, le); val mDen = u32(b, off + 12, le)
          if (dDen == 0 || mDen == 0) return None
          Some((u32(b, off, le) / dDen, u32(b, off + 8, le) / mDen))
        }
        var g = 0
        while (g < gn) {
          val p = gpsIfd + 2 + g * 12
          if (p + 12 > segEnd) return None
          val tag = u16(b, p, le)
          val typ = u16(b, p + 2, le)
          val count = u32(b, p + 4, le).toInt
          tag match {
            case TagGpsLatRef => latRef = asciiAt(p, typ, count).orNull
            case TagGpsLonRef => lonRef = asciiAt(p, typ, count).orNull
            case TagGpsLat    => if (typ == 5 && count == 3) latDM = rationalDM(p).orNull
            case TagGpsLon    => if (typ == 5 && count == 3) lonDM = rationalDM(p).orNull
            case _            => ()
          }
          g += 1
        }
        if (latRef != null && latDM != null)
          lat = Some(s"$latRef:${latDM._1}:${latDM._2}")
        if (lonRef != null && lonDM != null)
          lon = Some(s"$lonRef:${lonDM._1}:${lonDM._2}")
      }
      if (make != null && ori >= 0 && dt != null)
        Some((make, ori, dt, order, artist, lat, lon))
      else None
    } catch { case _: Throwable => None }
  }

  /** (segment start, length-field value) of the first APP1 Exif segment. */
  private def findApp1(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      if (marker == 0xe1 && len >= 16 &&
          new String(b, i + 4, 6, "US-ASCII") == "Exif\u0000\u0000")
        return Some((i, len))
      i += 2 + len
    }
    None
  }

  /** The JPEG minus its APP1 Exif segment — every other byte verbatim.
    * The redaction audit compares this before/after to prove the
    * entropy-coded image (and every non-EXIF segment) was untouched.
    */
  private[graft] def stripApp1(b: Array[Byte]): Array[Byte] =
    findApp1(b) match {
      case Some((i, len)) => b.take(i) ++ b.drop(i + 2 + len)
      case None           => b
    }

  /** GPS/owner redaction by ALLOWLIST RE-EMIT: parse the APP1, rebuild a
    * fresh segment carrying ONLY Make/Orientation/DateTime in the same
    * byte order, splice it over the old one. Rebuilding (rather than
    * patching entries out in place) is the right privacy posture — a tag
    * the allowlist doesn't know about can never survive by accident, and
    * dangling offsets can't leak fragments of the removed values. Images
    * without a parseable EXIF pass through unchanged.
    */
  def redactApp1(b: Array[Byte]): Array[Byte] =
    (findApp1(b), parseAll(b)) match {
      case (Some((i, len)), Some((make, ori, dt, order, _, _, _))) =>
        b.take(i) ++ app1(make, ori, dt, order == "II") ++ b.drop(i + 2 + len)
      case _ => b
    }

  /** Planted GPS/owner fields (None for id % 3 == 2 — the no-op class
    * must be covered too); formulas replayed by the redaction oracle.
    */
  private[graft] def plantedGps(id: Long)
      : (Option[String], Option[(String, Int, Int, String, Int, Int)]) =
    if (id % 3 == 2) (None, None)
    else (Some(s"owner-${id % 7}"),
      Some((if (id % 4 < 2) "N" else "S", (id % 90).toInt, (id % 60).toInt,
        if (id % 8 < 4) "E" else "W", (id % 180).toInt, ((id * 7) % 60).toInt)))

  /** Fixture JPEGs carrying EXIF with planted GPS + owner fields. */
  def mediaJpegExifGps(docs: DataFrame): Dataset[Multimodal.MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = Multimodal.pixDims(id)
        val (make, ori, dt, le) = plantedFields(id)
        val (artist, gps) = plantedGps(id)
        Multimodal.MediaRecord(id, "image", insertApp1(
          JpegGray.jpegEncodeGray(w, h, Multimodal.plantedBlockPixels(w, h, id)),
          app1Gps(make, ori, dt, artist, gps, le)))
      }
    }
  }

  final case class ExifRedactAudit(doc_id: Long, byte_order: String,
      had_gps: Boolean, gps_lat: Option[String], gps_lon: Option[String],
      artist: Option[String], make: String, orientation: Int,
      date_time: String, has_gps_after: Boolean, has_artist_after: Boolean,
      body_unchanged: Boolean)

  /** The release-gate audit row per image: real parse BEFORE (with the
    * GPS coordinates the corpus would have leaked), real redact, real
    * re-parse AFTER, and the byte-level proof that only the APP1 moved.
    */
  def redactAudit(ds: Dataset[Multimodal.MediaRecord]): Dataset[ExifRedactAudit] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        parseAll(r.payload).iterator.map {
          case (_, _, _, order, artist, lat, lon) =>
            val red = redactApp1(r.payload)
            val (make2, ori2, dt2, _, artist2, lat2, lon2) =
              parseAll(red).getOrElse(("", -1, "", order, None, None, None))
            ExifRedactAudit(r.doc_id, order,
              lat.isDefined || lon.isDefined, lat, lon, artist,
              make2, ori2, dt2,
              lat2.isDefined || lon2.isDefined, artist2.isDefined,
              java.util.Arrays.equals(stripApp1(r.payload), stripApp1(red)))
        }
      }
    }
  }
}
