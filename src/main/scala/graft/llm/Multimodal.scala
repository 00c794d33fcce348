package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extraction as per-partition batch
  * functions.
  *
  * The container ships no image/audio codec libraries, so decode is a
  * DISPATCH: real dependency-free header parses for BMP, PNG, JPEG,
  * GIF, TIFF, and WebP images, WAV/FLAC/AIFF/MP3/Ogg audio, and
  * MP4/ISO-BMFF video ([[decodeBmp]]/[[decodePng]]/
  * [[decodeJpeg]]/[[decodeGif]]/[[decodeTiff]]/[[decodeWebp]]/[[decodeWav]]/[[decodeFlac]]/[[decodeAiff]]/
  * [[decodeMp3]]/[[decodeOgg]]/[[decodeMp4]]), a
  * deterministic stub (clearly marked below) for every other format. Everything Spark-side is
  * real: schema, batch shape, partitioning, and the map-partitions
  * execution pattern a Pandas-UDF (`mapInPandas`) pipeline uses —
  * per-partition iterator in, iterator out, no per-row JVM↔native
  * round trips.
  *
  * Scale: media blobs are the widest column by orders of magnitude —
  * the layout keeps them in their own projected column so Parquet
  * column pruning skips the bytes unless `decode*` is actually called,
  * and feature extraction is map-only (no shuffle).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaItem(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Extracted features. `width/height/duration` come from the decoder
    * stub; `n_bytes`/`checksum` are real byte-level facts.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** STUB — the real implementation would decode the payload with an
    * image/audio codec. Deterministic fake: dimensions derived from
    * byte-level facts so tests are reproducible. The signature (bytes →
    * features, no Spark types) is what a codec adapter must implement.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
    val n = payload.length
    kind match {
      case "image" => (n % 1920, n % 1080, 0L)
      case "audio" => (0, 0, n.toLong * 8)
      case _       => (n % 1280, n % 720, n.toLong * 40)
    }
  }

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def be32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  private def be16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

  /** REAL codec path for BMP images — a dependency-free header parse
    * (the format is public: "BM" magic, then BITMAPINFOHEADER with
    * little-endian INT32 width at offset 18 and height at offset 22; a
    * negative height is a top-down DIB). Returns None for anything
    * that is not a plausible BMP, which routes the row to the stub.
    */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int)] =
    if (payload.length >= 26 && payload(0) == 'B'.toByte &&
        payload(1) == 'M'.toByte) {
      val w = le32(payload, 18)
      val h = le32(payload, 22)
      if (w > 0 && h != 0) Some((w, math.abs(h))) else None
    } else None

  /** REAL codec path for PNG images — a dependency-free header parse
    * (public format: the 8-byte signature 89 'P' 'N' 'G' 0D 0A 1A 0A,
    * then the IHDR chunk, which the spec requires FIRST — 4-byte
    * big-endian length 13, the ASCII type "IHDR" at offset 12, then
    * big-endian INT32 width at 16 and height at 20). Returns None for
    * anything that is not a plausible PNG, routing the row onward in
    * the dispatch chain.
    */
  def decodePng(payload: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (payload.length >= 24 && payload.take(8).sameElements(sig) &&
        be32(payload, 8) == 13 &&
        payload.slice(12, 16).sameElements("IHDR".getBytes("US-ASCII"))) {
      val w = be32(payload, 16)
      val h = be32(payload, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None
  }

  /** REAL codec path for JPEG images — a dependency-free marker scan
    * (public format: FF D8 SOI, then FF-prefixed segments each
    * carrying a big-endian INT16 length that includes the length
    * field itself). Dimensions live in the first start-of-frame
    * segment (SOF0–SOF15, excluding the non-frame C4/C8/CC codes):
    * 1 byte precision, then big-endian height and width. Stand-alone
    * markers (RSTn, TEM) have no length field and are skipped; fill
    * bytes (repeated FF) are tolerated. Returns None when no SOF is
    * found before the scan runs off the payload.
    */
  def decodeJpeg(payload: Array[Byte]): Option[(Int, Int)] =
    if (payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < payload.length) {
        if ((payload(i) & 0xff) != 0xff) return None // desynced: not JPEG
        // skip fill bytes
        var j = i + 1
        while (j < payload.length && (payload(j) & 0xff) == 0xff) j += 1
        if (j + 1 >= payload.length) return None
        val marker = payload(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF segment: len(2) precision(1) height(2) width(2)
          if (j + 8 >= payload.length) return None
          val h = be16(payload, j + 4)
          val w = be16(payload, j + 6)
          return if (w > 0 && h > 0) Some((w, h)) else None
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // EOI / start-of-scan before any SOF: give up
        } else if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i = j + 1 // stand-alone marker, no length field
        } else {
          if (j + 2 >= payload.length) return None
          val len = be16(payload, j + 1)
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    } else None

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  /** REAL codec path for GIF images — a dependency-free header parse
    * (public format: 6-byte signature "GIF87a" or "GIF89a", then the
    * logical-screen descriptor with little-endian UINT16 width at
    * offset 6 and height at offset 8). Returns None for anything not
    * a plausible GIF, routing the row onward in the dispatch chain.
    */
  def decodeGif(payload: Array[Byte]): Option[(Int, Int)] =
    if (payload.length >= 10 &&
        payload.startsWith("GIF8".getBytes("US-ASCII")) &&
        (payload(4) == '7'.toByte || payload(4) == '9'.toByte) &&
        payload(5) == 'a'.toByte) {
      val w = le16(payload, 6)
      val h = le16(payload, 8)
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None

  /** REAL codec path for TIFF images — a dependency-free IFD walk
    * (public format: byte-order mark "II" (little-endian) or "MM"
    * (big-endian), magic 42, then a 4-byte offset to the first image
    * file directory; the IFD is a UINT16 entry count followed by
    * 12-byte entries of tag/type/count/value). Width is tag 256
    * (ImageWidth), height tag 257 (ImageLength), each stored inline as
    * SHORT (type 3) or LONG (type 4) — for count 1 the value occupies
    * the entry's last 4 bytes (a SHORT sits in the first 2, in file
    * byte order). Returns None unless both tags parse.
    */
  def decodeTiff(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < 8) return None
    val le =
      if (payload(0) == 'I'.toByte && payload(1) == 'I'.toByte) true
      else if (payload(0) == 'M'.toByte && payload(1) == 'M'.toByte) false
      else return None
    def u16(off: Int): Int =
      if (off + 1 >= payload.length) -1
      else if (le) le16(payload, off) else be16(payload, off)
    def u32(off: Int): Long =
      if (off + 3 >= payload.length) -1L
      else if (le) le32(payload, off) & 0xffffffffL
      else be32(payload, off) & 0xffffffffL
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd > Int.MaxValue) return None
    val n = u16(ifd.toInt)
    if (n <= 0) return None
    var w = -1L; var h = -1L
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      if (e + 11 >= payload.length) return None
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      if ((tag == 256 || tag == 257) && cnt == 1L &&
          (typ == 3 || typ == 4)) {
        val v = if (typ == 3) u16(e + 8).toLong else u32(e + 8)
        if (tag == 256) w = v else h = v
      }
      i += 1
    }
    if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
      Some((w.toInt, h.toInt))
    else None
  }

  /** REAL codec path for WAV audio — RIFF/WAVE header parse: byte rate
    * (bytes/sec) is the little-endian INT32 at offset 28 of the
    * canonical 44-byte header, data payload follows; duration_ms =
    * data_bytes · 1000 / byte_rate.
    */
  def decodeWav(payload: Array[Byte]): Option[Long] =
    if (payload.length >= 44 &&
        payload.startsWith("RIFF".getBytes("US-ASCII")) &&
        payload.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))) {
      val byteRate = le32(payload, 28)
      val dataBytes = payload.length - 44
      if (byteRate > 0) Some(dataBytes.toLong * 1000L / byteRate) else None
    } else None

  /** REAL codec path for WebP images — RIFF container: "RIFF" + size
    * + "WEBP", then one of three first-chunk flavors (all public):
    * `VP8X` (extended: 3-byte LE canvas width−1/height−1 after 4
    * flag bytes), `VP8L` (lossless: 0x2F signature then 14-bit
    * width−1/height−1 bit-packed LE), `VP8 ` (lossy keyframe: 3-byte
    * frame tag, 0x9D 0x01 0x2A sync, then 14-bit LE dimensions).
    */
  def decodeWebp(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < 30 ||
        !payload.startsWith("RIFF".getBytes("US-ASCII")) ||
        !payload.slice(8, 12).sameElements("WEBP".getBytes("US-ASCII")))
      return None
    val tag = new String(payload.slice(12, 16), "US-ASCII")
    val p = 20 // first chunk payload
    tag match {
      case "VP8X" =>
        val w = 1 + ((payload(p + 4) & 0xff) | ((payload(p + 5) & 0xff) << 8) |
          ((payload(p + 6) & 0xff) << 16))
        val h = 1 + ((payload(p + 7) & 0xff) | ((payload(p + 8) & 0xff) << 8) |
          ((payload(p + 9) & 0xff) << 16))
        if (w > 0 && h > 0) Some((w, h)) else None
      case "VP8L" if (payload(p) & 0xff) == 0x2f =>
        val b1 = payload(p + 1) & 0xff; val b2 = payload(p + 2) & 0xff
        val b3 = payload(p + 3) & 0xff; val b4 = payload(p + 4) & 0xff
        val w = 1 + (((b2 & 0x3f) << 8) | b1)
        val h = 1 + (((b4 & 0x0f) << 10) | (b3 << 2) | (b2 >> 6))
        Some((w, h))
      case "VP8 " if (payload(p + 3) & 0xff) == 0x9d &&
          (payload(p + 4) & 0xff) == 0x01 &&
          (payload(p + 5) & 0xff) == 0x2a =>
        val w = le16(payload, p + 6) & 0x3fff
        val h = le16(payload, p + 8) & 0x3fff
        if (w > 0 && h > 0) Some((w, h)) else None
      case _ => None
    }
  }

  /** REAL codec path for FLAC audio — the `fLaC` magic followed by
    * the mandatory first STREAMINFO metadata block (spec: type 0,
    * 34 bytes). Duration = totalSamples·1000 / sampleRate from the
    * packed fields at byte 10 of the block: 20-bit sample rate,
    * 3-bit channels−1, 5-bit bits−1, 36-bit total samples. A FLAC
    * whose header declares totalSamples = 0 ("unknown") returns
    * None — the dispatch must not invent a duration.
    */
  def decodeFlac(payload: Array[Byte]): Option[Long] = {
    if (payload.length < 42 ||
        !payload.startsWith("fLaC".getBytes("US-ASCII")) ||
        (payload(4) & 0x7f) != 0) return None
    val b = 8 // STREAMINFO payload offset (4 magic + 4 block header)
    val rate = ((payload(b + 10) & 0xff) << 12) |
      ((payload(b + 11) & 0xff) << 4) | ((payload(b + 12) & 0xff) >> 4)
    val samples = ((payload(b + 13) & 0x0fL) << 32) |
      ((payload(b + 14) & 0xffL) << 24) | ((payload(b + 15) & 0xffL) << 16) |
      ((payload(b + 16) & 0xffL) << 8) | (payload(b + 17) & 0xffL)
    if (rate > 0 && samples > 0) Some(samples * 1000L / rate) else None
  }

  /** REAL codec path for AIFF audio — big-endian IFF: `FORM` + size +
    * `AIFF`, then a chunk walk to `COMM` (2B channels, 4B sample
    * frames, 2B sample size, 10B IEEE-754 extended-precision sample
    * rate). The 80-bit float decodes as mantissaHigh32 ·
    * 2^(exp−16383−31) — exact integer arithmetic for every real-world
    * rate (8 kHz…192 kHz all have mantissas that fit the high word).
    */
  def decodeAiff(payload: Array[Byte]): Option[Long] = {
    if (payload.length < 12 ||
        !payload.startsWith("FORM".getBytes("US-ASCII")) ||
        !payload.slice(8, 12).sameElements("AIFF".getBytes("US-ASCII")))
      return None
    var off = 12
    while (off + 8 <= payload.length) {
      val id = new String(payload.slice(off, off + 4), "US-ASCII")
      val len = be32(payload, off + 4)
      if (id == "COMM" && len >= 18 && off + 8 + 18 <= payload.length) {
        val c = off + 8
        val frames = be32(payload, c + 2).toLong & 0xffffffffL
        val exp = be16(payload, c + 8) & 0x7fff
        val mantHi = be32(payload, c + 10).toLong & 0xffffffffL
        val shift = exp - 16383 - 31
        // Scala's Long shift masks the count to 6 bits, so a corrupt
        // exponent with |shift| > 63 would WRAP into a garbage nonzero
        // rate instead of flushing to zero — reject it outright.
        if (shift < -63 || shift > 63) return None
        val rate =
          if (shift >= 0) mantHi << shift else mantHi >> -shift
        return if (rate > 0 && frames > 0)
          Some(frames * 1000L / rate)
        else None
      }
      // A declared length with the high bit set decodes negative in the
      // signed Int; advancing by it would loop forever on one executor
      // thread. Malformed chunk length ⇒ treat the payload as corrupt.
      if (len < 0) return None
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  /** REAL codec path for MP3 audio — optional ID3v2 tag skip ("ID3" +
    * 6-byte header + 4-byte synchsafe size), then the first MPEG audio
    * frame header (11-bit sync 0xFFE). Supports MPEG-1/2/2.5 Layer III
    * via the public bitrate/sample-rate index tables. Duration is the
    * standard CBR estimate: audio_bytes · 8 / bitrate. A free-format
    * (index 0) or bad (index 15) bitrate returns None — the dispatch
    * must not invent a duration.
    */
  def decodeMp3(payload: Array[Byte]): Option[Long] = {
    var off = 0
    if (payload.length >= 10 && payload.startsWith("ID3".getBytes("US-ASCII"))) {
      // ID3v2 size: 4 synchsafe bytes (7 bits each), tag body follows the
      // 10-byte header. Negative/overflowing sizes ⇒ malformed.
      val sz = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      off = 10 + sz
      if (off < 0 || off >= payload.length) return None
    }
    if (off + 4 > payload.length) return None
    val b1 = payload(off) & 0xff; val b2 = payload(off + 1) & 0xff
    val b3 = payload(off + 2) & 0xff
    if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None
    val versionBits = (b2 >> 3) & 0x3 // 0=2.5, 2=MPEG-2, 3=MPEG-1
    val layerBits = (b2 >> 1) & 0x3 // 1 = Layer III
    if (versionBits == 1 || layerBits != 1) return None
    val brIdx = (b3 >> 4) & 0xf
    val srIdx = (b3 >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    // Layer III bitrate table (kbps): MPEG-1 row vs MPEG-2/2.5 row.
    val kbps =
      if (versionBits == 3)
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
      else
        Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)(brIdx)
    val audioBytes = payload.length - off
    Some(audioBytes.toLong * 8L / kbps)
  }

  /** REAL codec path for Ogg audio (Vorbis / Opus) — "OggS" capture
    * pattern, first page carries the codec id header ("\x01vorbis":
    * sample rate LE32 at id-header offset 12; "OpusHead": granule
    * timebase fixed at 48 kHz). Duration comes from the LAST page's
    * granule position (LE64 at page offset 6) — for Vorbis that is the
    * PCM sample count, for Opus the 48 kHz sample count. Header-only,
    * dependency-free, exact.
    */
  def decodeOgg(payload: Array[Byte]): Option[Long] = {
    val magic = "OggS".getBytes("US-ASCII")
    if (payload.length < 58 || !payload.startsWith(magic)) return None
    // First page: 27-byte header + segment table, then the id header.
    val nSegs = payload(26) & 0xff
    val body = 27 + nSegs
    if (body + 16 > payload.length) return None
    val rate: Long =
      if (payload(body) == 0x01 &&
          payload.slice(body + 1, body + 7)
            .sameElements("vorbis".getBytes("US-ASCII"))) {
        le32(payload, body + 12).toLong & 0xffffffffL
      } else if (payload.slice(body, body + 8)
          .sameElements("OpusHead".getBytes("US-ASCII"))) {
        48000L // Opus granules always count 48 kHz samples
      } else return None
    if (rate <= 0) return None
    // Scan backwards for the last page's capture pattern. The byte
    // sequence "OggS" can also occur inside page BODY data, so a
    // candidate must pass a header sanity check (stream-structure
    // version byte is 0, header-type flags fit 3 bits) before its
    // granule is trusted; a candidate with granule <= 0 (a false sync,
    // or a genuine -1 "no packet completes" continuation page) keeps
    // the scan going instead of aborting the whole decode.
    var p = payload.length - 27
    while (p >= 0) {
      if (payload(p) == 'O' && payload(p + 1) == 'g' && payload(p + 2) == 'g' &&
          payload(p + 3) == 'S' &&
          payload(p + 4) == 0 && (payload(p + 5) & 0xf8) == 0) {
        var granule = 0L
        var i = 7
        while (i >= 0) { granule = (granule << 8) | (payload(p + 6 + i) & 0xffL); i -= 1 }
        if (granule > 0) return Some(granule * 1000L / rate)
      }
      p -= 1
    }
    None
  }

  private def be64(p: Array[Byte], off: Int): Long =
    ((be32(p, off).toLong & 0xffffffffL) << 32) |
      (be32(p, off + 4).toLong & 0xffffffffL)

  /** REAL codec path for MP4 / ISO-BMFF video — the box walk:
    * `[size:BE32][type:4B]`, where size==1 pulls a BE64 largesize and
    * size==0 extends the box to the end of the enclosure. The payload
    * must LEAD with `ftyp` (the ISO-BMFF requirement); duration comes
    * from `moov`→`mvhd` (v0: u32 timescale + u32 duration at offsets
    * 12/16 past the fullbox header; v1: u64 times push them to 20/24),
    * dimensions from the first `moov`→`trak`→`tkhd` carrying nonzero
    * 16.16-fixed width/height (sound tracks encode 0×0, so the first
    * nonzero pair IS the video track). Any malformed size — negative,
    * smaller than its own header, or past the enclosure — rejects the
    * payload rather than risking a wrap or a stuck walk (the
    * [[decodeAiff]] negative-length lesson, same law fuzzed by
    * `MultimodalCodecProps`).
    */
  def decodeMp4(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    // Child boxes of [from, to): (type, payloadStart, payloadEnd).
    // Bails to Nil on any malformed size — a truncated walk must not
    // return a half-parsed box list a caller would trust.
    def boxes(from: Int, to: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var off = from
      while (off + 8 <= to) {
        val sz32 = be32(payload, off).toLong & 0xffffffffL
        val id = new String(payload, off + 4, 4, "US-ASCII")
        val hdr = if (sz32 == 1) 16L else 8L
        val size =
          if (sz32 == 0) (to - off).toLong
          else if (sz32 == 1) {
            if (off + 16 > to) return Nil
            be64(payload, off + 8)
          } else sz32
        // size is compared against the bounded (to - off), never added
        // to off first — a 2⁶³-scale largesize would wrap the sum.
        if (size < hdr || size > (to - off).toLong) return Nil
        out += ((id, off + hdr.toInt, off + size.toInt))
        off += size.toInt
      }
      out.result()
    }
    val top = boxes(0, payload.length)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val moov = top.collectFirst { case ("moov", a, b) => (a, b) }
    moov.flatMap { case (ma, mb) =>
      val kids = boxes(ma, mb)
      val dur = kids.collectFirst { case ("mvhd", a, b) => (a, b) }
        .flatMap { case (a, b) =>
          if (a >= b || b - a < 20) None
          else {
            val v = payload(a) & 0xff
            val (tsOff, durOff, durLen) =
              if (v == 1) (20, 24, 8) else (12, 16, 4)
            if (b - a < durOff + durLen) None
            else {
              val ts = be32(payload, a + tsOff).toLong & 0xffffffffL
              val d =
                if (durLen == 8) be64(payload, a + durOff)
                else be32(payload, a + durOff).toLong & 0xffffffffL
              if (ts > 0 && d > 0 && d <= Long.MaxValue / 1000)
                Some(d * 1000L / ts)
              else None
            }
          }
        }
      val dims = kids.collect { case ("trak", a, b) => boxes(a, b) }
        .flatMap(_.collectFirst { case ("tkhd", a, b) => (a, b) })
        .flatMap { case (a, b) =>
          if (a >= b) None
          else {
            val v = payload(a) & 0xff
            val wOff = if (v == 1) 88 else 76
            if (b - a < wOff + 8) None
            else {
              val w = be32(payload, a + wOff) >>> 16
              val h = be32(payload, a + wOff + 4) >>> 16
              if (w > 0 && h > 0) Some((w, h)) else None
            }
          }
        }.headOption
      dur.map { ms =>
        val (w, h) = dims.getOrElse((0, 0))
        (w, h, ms)
      }
    }
  }

  /** Codec dispatch: real header parses where the payload is a format
    * this adapter understands (BMP/PNG/JPEG/GIF/TIFF/WebP images, WAV/FLAC/
    * AIFF/MP3/Ogg audio, MP4/ISO-BMFF video — all dependency-free),
    * deterministic stub otherwise. This
    * is the full adapter contract a production pipeline fills in per
    * format.
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Long) =
    kind match {
      case "image" =>
        decodeBmp(payload).orElse(decodePng(payload))
          .orElse(decodeJpeg(payload))
          .orElse(decodeGif(payload))
          .orElse(decodeTiff(payload))
          .orElse(decodeWebp(payload))
          .map { case (w, h) => (w, h, 0L) }
          .getOrElse(decodeStub(kind, payload))
      case "audio" =>
        decodeWav(payload)
          .orElse(decodeFlac(payload))
          .orElse(decodeAiff(payload))
          .orElse(decodeMp3(payload))
          .orElse(decodeOgg(payload))
          .map(ms => (0, 0, ms))
          .getOrElse(decodeStub(kind, payload))
      case "video" =>
        decodeMp4(payload).getOrElse(decodeStub(kind, payload))
      case _ => decodeStub(kind, payload)
    }

  /** Per-partition feature extraction — the Scala analog of a
    * `mapInPandas` batch UDF: one iterator per partition, codec state
    * initialized once per partition (here: the fold constant), rows
    * streamed through.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition initialization would open the codec here
      it.map { m =>
        val checksum =
          m.payload.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) %
            1000000007L)
        val (w, h, dur) = decode(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, checksum, w, h,
          dur)
      }
    }
  }

  /** A resized media row (decode → scale → re-encode pipeline stage). */
  case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Int,
      payload: Array[Byte])

  /** One sampled frame of a video payload. */
  case class Frame(
      media_id: Long,
      frame_idx: Int,
      n_bytes: Int,
      checksum: Long)

  /** STUB — a real implementation decodes, scales to (w, h), and
    * re-encodes. Deterministic fake: stride-sample the bytes so output
    * size tracks the scale factor and tests are reproducible. The
    * signature (bytes in, bytes out, no Spark types) is the adapter
    * contract.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val stride = math.max(1, payload.length / math.max(1, w * h / 64))
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
  }

  /** Per-partition resize — same mapPartitions batch shape as
    * [[extractFeatures]]; scaler state would be initialized once per
    * partition. Map-only: no shuffle, blobs never pass the driver.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val out = resizeStub(m.payload, w, h)
        ResizedMedia(m.media_id, m.kind, w, h, out.length, out)
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size pseudo-frames
    * and keep every `everyNth` one — the flatMap row-expansion shape of
    * real video frame extraction (one input row → k frame rows, still
    * map-only). Frames carry byte-level facts so specs can assert
    * exact values without a codec.
    */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int,
      everyNth: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, idx) if idx % everyNth == 0 =>
          val checksum =
            bytes.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) %
              1000000007L)
          Frame(m.media_id, idx, bytes.length, checksum)
      }
    }
  }

  /** Build a media table from `documents` (text bytes stand in for the
    * blob payload; kind assigned round-robin).
    */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        encode(col("text"), "utf-8").as("payload"),
        col("source"))
      .as[MediaItem]
  }

  // ------------------------------------------------------ q_media_features
  /** Oracle-checkable slice of the media pipeline: byte-level facts
    * (length, polynomial checksum over bytes, hex prefix) computed on
    * the binary column. The decoder-dependent fields are exercised in
    * ScalaTest instead (no codec in DuckDB either).
    */
  private def qMediaFeatures(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        octet_length(encode(col("text"), "utf-8")).cast(IntegerType)
          .as("n_bytes"),
        substring(hex(encode(col("text"), "utf-8")), 1, 16).as("hex_prefix"))

  private val qMediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
      |    AS kind,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  substring(hex(encode(text)), 1, 16) AS hex_prefix
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> qMediaFeatures _
  )

  val oracles: Map[String, String] = Map(
    "q_media_features" -> qMediaFeaturesSql
  )
}
