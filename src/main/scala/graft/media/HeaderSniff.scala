package graft.media

import org.apache.spark.unsafe.types.UTF8String

/** Decode-free media metadata: container-header parsing over the raw
  * `binary` column — format, pixel dimensions, and WAV PCM geometry read
  * from the first few hundred bytes, with no inflate, no IDCT, no pixel
  * buffer allocation.
  *
  * This is the 100 TB fast path for media metadata: a full
  * `javax.imageio` decode of a 100 KB JPEG costs ~10^6 instructions and a
  * w*h*4-byte allocation per row; the header scan below costs O(header)
  * with zero allocation, so a metadata pass (dimension filters, aspect
  * bucketing, format routing — the reference routes payloads by
  * `content_type`, crawlers/_basic/_basic_crawler.py sends them opaque)
  * runs at parquet scan speed inside whole-stage codegen (every method is
  * a static call usable from generated Java — the HtmlToText pattern).
  *
  * Unknown/corrupt inputs yield `"unknown"` / `-1` sentinels rather than
  * nulls: the distributed pass must never throw on a malformed payload
  * (truncation IS data at crawl scale), and a sentinel survives codegen's
  * primitive paths without a nullability dance.
  */
object HeaderSniff {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var j = 0
    while (j < s.length) {
      if (b(i + j) != s.charAt(j).toByte) return false
      j += 1
    }
    true
  }

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && ascii(b, 1, "PNG") &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  def isGif(b: Array[Byte]): Boolean = b.length >= 10 && ascii(b, 0, "GIF8")

  def isBmp(b: Array[Byte]): Boolean = b.length >= 26 && ascii(b, 0, "BM")

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")

  def format(b: Array[Byte]): String =
    if (b == null) "unknown"
    else if (isJpeg(b)) "jpeg"
    else if (isPng(b)) "png"
    else if (isGif(b)) "gif"
    else if (isBmp(b)) "bmp"
    else if (isWav(b)) "wav"
    else "unknown"

  def formatUTF8(b: Array[Byte]): UTF8String = UTF8String.fromString(format(b))

  /** Walk JPEG marker segments up to the first frame header (SOF0..SOF15,
    * minus DHT/JPG/DAC) and return (height << 32) | width. Entropy-coded
    * data only begins after SOS, and every SOF precedes SOS, so the walk
    * never scans compressed bytes. -1 when no frame header is reachable.
    */
  private def jpegDims(b: Array[Byte]): Long = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return -1L // lost sync
      var m = u8(b, i + 1)
      // fill bytes: any number of 0xFF before the marker code
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xd9 || m == 0xda) {
        return -1L // EOI / SOS before any SOF
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return -1L
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= b.length || segLen < 7) return -1L
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return (h.toLong << 32) | (w.toLong & 0xffffffffL)
        }
        i += 2 + segLen
      }
    }
    -1L
  }

  /** Pixel width from the container header; -1 for non-images/corrupt. */
  def width(b: Array[Byte]): Int = {
    if (b == null) return -1
    if (isJpeg(b)) {
      val d = jpegDims(b)
      if (d < 0) -1 else (d & 0xffffffffL).toInt
    } else if (isPng(b)) {
      if (b.length >= 24 && ascii(b, 12, "IHDR")) be32(b, 16) else -1
    } else if (isGif(b)) le16(b, 6)
    else if (isBmp(b)) le32(b, 18)
    else -1
  }

  /** Pixel height from the container header; -1 for non-images/corrupt.
    * BMP height is stored signed (negative = top-down rows) — callers get
    * the magnitude, matching what a decoder reports.
    */
  def height(b: Array[Byte]): Int = {
    if (b == null) return -1
    if (isJpeg(b)) {
      val d = jpegDims(b)
      if (d < 0) -1 else (d >>> 32).toInt
    } else if (isPng(b)) {
      if (b.length >= 24 && ascii(b, 12, "IHDR")) be32(b, 20) else -1
    } else if (isGif(b)) le16(b, 8)
    else if (isBmp(b)) math.abs(le32(b, 22))
    else -1
  }

  /** RIFF chunk walk: returns the LE32/LE16 `fmt `/`data` fields packed as
    * (sampleRate, channels, bitsPerSample, dataBytes); all -1 when absent.
    */
  private def wavChunks(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (!isWav(b)) return (-1, -1, -1, -1L)
    var rate = -1; var ch = -1; var bits = -1; var data = -1L
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4).toLong & 0xffffffffL
      if (ascii(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        ch = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (ascii(b, i, "data")) {
        data = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even length
      if (size > Int.MaxValue - 16) return (rate, ch, bits, data)
    }
    (rate, ch, bits, data)
  }

  def sampleRate(b: Array[Byte]): Int = wavChunks(b)._1

  def channels(b: Array[Byte]): Int = wavChunks(b)._2

  def bitsPerSample(b: Array[Byte]): Int = wavChunks(b)._3

  /** PCM frame count = data-chunk bytes / block align; -1 when the fmt or
    * data chunk is missing or geometry is degenerate.
    */
  def audioFrames(b: Array[Byte]): Int = {
    val (rate, ch, bits, data) = wavChunks(b)
    if (rate <= 0 || ch <= 0 || bits <= 0 || data < 0) return -1
    val blockAlign = ch.toLong * bits / 8
    if (blockAlign <= 0) -1 else (data / blockAlign).toInt
  }

  /** EXIF orientation (TIFF tag 0x0112 in IFD0 of a JPEG APP1 `Exif`
    * segment, CIPA DC-008): 1..8 per the spec, 0 when the payload is not a
    * JPEG, carries no EXIF, or the tag is absent/malformed. Training
    * pipelines need this BEFORE decode — a rotation-normalizing resize pass
    * routes on it, and cameras write it far more often than they rewrite
    * pixels. Both TIFF byte orders (`II`/`MM`) are handled.
    */
  def exifOrientation(b: Array[Byte]): Int = {
    if (b == null || !isJpeg(b)) return 0
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return 0
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else if (m == 0xd9 || m == 0xda) return 0 // EOI/SOS: APP1 always precedes
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return 0
        if (m == 0xe1 && ascii(b, i + 4, "Exif") && i + 9 < b.length &&
            b(i + 8) == 0 && b(i + 9) == 0) {
          val t = i + 10 // TIFF header base
          val segEnd = math.min(b.length, i + 2 + segLen)
          if (t + 8 > segEnd) return 0
          val le =
            if (ascii(b, t, "II")) true
            else if (ascii(b, t, "MM")) false
            else return 0
          def r16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
          def r32(o: Int): Int = if (le) le32(b, o) else be32(b, o)
          if (r16(t + 2) != 42) return 0
          val ifd = t + r32(t + 4)
          if (ifd < t || ifd + 2 > segEnd) return 0
          val n = r16(ifd)
          var k = 0
          while (k < n && ifd + 2 + 12 * (k + 1) <= segEnd) {
            val e = ifd + 2 + 12 * k
            if (r16(e) == 0x0112 && r16(e + 2) == 3 && r32(e + 4) == 1) {
              val v = r16(e + 8) // SHORT value left-justified in file order
              return if (v >= 1 && v <= 8) v else 0
            }
            k += 1
          }
          return 0
        }
        i += 2 + segLen
      }
    }
    0
  }

  /** Sentinel for "no GPS coordinate present/parseable". Long.MinValue can
    * never be a valid micro-degree (|lat| ≤ 90e6, |lon| ≤ 180e6).
    */
  val NoGps: Long = Long.MinValue

  /** Exact shared arithmetic for degree°minute′second″ rationals →
    * signed micro-degrees (used by both the byte-walking extractor below
    * and fixture plans, so expected values are equal by construction;
    * the independence of the check lives in byte-walk vs plan, not in
    * the final rounding).
    */
  def microDegrees(dn: Long, dd: Long, mn: Long, md: Long, sn: Long, sd: Long,
      negative: Boolean): Long = {
    if (dd <= 0 || md <= 0 || sd <= 0) return NoGps
    val v = ((dn.toDouble / dd + mn.toDouble / (60.0 * md) +
      sn.toDouble / (3600.0 * sd)) * 1e6).round
    if (negative) -v else v
  }

  /** Locate the Exif APP1 segment's TIFF base; returns (tiffBase, segEnd)
    * packed as (base.toLong << 32) | segEnd, or -1 when absent. The walk
    * is the exifOrientation one factored out.
    */
  private def exifTiffBase(b: Array[Byte]): Long = {
    if (b == null || !isJpeg(b)) return -1L
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return -1L
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else if (m == 0xd9 || m == 0xda) return -1L
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return -1L
        if (m == 0xe1 && ascii(b, i + 4, "Exif") && i + 9 < b.length &&
            b(i + 8) == 0 && b(i + 9) == 0) {
          val t = i + 10
          val segEnd = math.min(b.length, i + 2 + segLen)
          if (t + 8 > segEnd) return -1L
          return (t.toLong << 32) | (segEnd.toLong & 0xffffffffL)
        }
        i += 2 + segLen
      }
    }
    -1L
  }

  /** GPS coordinate from the Exif GPS IFD (tags 0x8825 → 1/2 lat, 3/4 lon:
    * ASCII hemisphere ref + RATIONAL×3 deg/min/sec, TIFF 6.0 value-offset
    * rules), as signed micro-degrees; [[NoGps]] when the payload is not a
    * JPEG, carries no EXIF/GPS, or any field is malformed/out of bounds.
    * Image-side PII detection is a first-class curation gate: face/location
    * scrubbing passes route on "has GPS" long before any decode.
    */
  def exifGpsMicro(b: Array[Byte], wantLon: Boolean): Long = {
    val packed = exifTiffBase(b)
    if (packed < 0) return NoGps
    val t = (packed >>> 32).toInt
    val segEnd = (packed & 0xffffffffL).toInt
    val le =
      if (ascii(b, t, "II")) true
      else if (ascii(b, t, "MM")) false
      else return NoGps
    def r16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
    def r32(o: Int): Int = if (le) le32(b, o) else be32(b, o)
    if (r16(t + 2) != 42) return NoGps
    val ifd0 = t + r32(t + 4)
    if (ifd0 < t || ifd0 + 2 > segEnd) return NoGps
    // IFD0 → GPS IFD pointer (tag 0x8825, LONG, count 1)
    var gpsIfd = -1
    val n0 = r16(ifd0)
    var k = 0
    while (k < n0 && ifd0 + 2 + 12 * (k + 1) <= segEnd) {
      val e = ifd0 + 2 + 12 * k
      if (r16(e) == 0x8825 && r16(e + 2) == 4 && r32(e + 4) == 1) gpsIfd = t + r32(e + 8)
      k += 1
    }
    if (gpsIfd < t || gpsIfd + 2 > segEnd) return NoGps
    val refTag = if (wantLon) 0x0003 else 0x0001
    val valTag = if (wantLon) 0x0004 else 0x0002
    var negative = false
    var haveRef = false
    var ratOff = -1
    val n1 = r16(gpsIfd)
    k = 0
    while (k < n1 && gpsIfd + 2 + 12 * (k + 1) <= segEnd) {
      val e = gpsIfd + 2 + 12 * k
      val tag = r16(e)
      if (tag == refTag && r16(e + 2) == 2) {
        // ASCII count 2 fits inline, left-justified in file order
        val c = u8(b, e + 8)
        negative = c == 'S'.toInt || c == 'W'.toInt
        haveRef = c == 'N'.toInt || c == 'S'.toInt || c == 'E'.toInt || c == 'W'.toInt
      } else if (tag == valTag && r16(e + 2) == 5 && r32(e + 4) == 3) {
        ratOff = t + r32(e + 8) // 24 bytes of RATIONAL never fit inline
      }
      k += 1
    }
    if (!haveRef || ratOff < t || ratOff + 24 > segEnd) return NoGps
    def ru32(o: Int): Long = r32(o).toLong & 0xffffffffL
    microDegrees(
      ru32(ratOff), ru32(ratOff + 4),
      ru32(ratOff + 8), ru32(ratOff + 12),
      ru32(ratOff + 16), ru32(ratOff + 20), negative)
  }

  def exifGpsMicroLat(b: Array[Byte]): Long = exifGpsMicro(b, wantLon = false)

  def exifGpsMicroLon(b: Array[Byte]): Long = exifGpsMicro(b, wantLon = true)

  /** EXIF DateTime (tag 0x0132 in IFD0, ASCII "YYYY:MM:DD HH:MM:SS"), ""
    * when absent/malformed — capture-time metadata is PII under most
    * dataset policies and the strip gate needs to see it first.
    */
  def exifDateTime(b: Array[Byte]): UTF8String = {
    val empty = UTF8String.fromString("")
    val packed = exifTiffBase(b)
    if (packed < 0) return empty
    val t = (packed >>> 32).toInt
    val segEnd = (packed & 0xffffffffL).toInt
    val le =
      if (ascii(b, t, "II")) true
      else if (ascii(b, t, "MM")) false
      else return empty
    def r16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
    def r32(o: Int): Int = if (le) le32(b, o) else be32(b, o)
    if (r16(t + 2) != 42) return empty
    val ifd0 = t + r32(t + 4)
    if (ifd0 < t || ifd0 + 2 > segEnd) return empty
    val n0 = r16(ifd0)
    var k = 0
    while (k < n0 && ifd0 + 2 + 12 * (k + 1) <= segEnd) {
      val e = ifd0 + 2 + 12 * k
      if (r16(e) == 0x0132 && r16(e + 2) == 2) {
        val cnt = r32(e + 4)
        if (cnt < 1 || cnt > 32) return empty
        val off = if (cnt <= 4) e + 8 else t + r32(e + 8)
        if (off < t || off + cnt > segEnd) return empty
        var len = cnt
        while (len > 0 && b(off + len - 1) == 0) len -= 1 // NUL terminator(s)
        return UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, off, off + len))
      }
      k += 1
    }
    empty
  }

  /** PII scrub: a copy of the JPEG with every Exif APP1 segment spliced
    * out — GPS, timestamps, camera serials gone; pixels, dimensions, and
    * every other segment byte-identical (no re-encode, so no generation
    * loss). Non-JPEG or Exif-free payloads return the input array
    * unchanged (reference-equal — callers can cheaply detect "nothing to
    * do"). Malformed walks return the input unmodified rather than risk
    * truncating entropy data.
    */
  def exifStrip(b: Array[Byte]): Array[Byte] = {
    if (b == null || !isJpeg(b)) return b
    // first pass: locate Exif APP1 spans [start, end)
    var spans: List[(Int, Int)] = Nil
    var i = 2
    var done = false
    while (!done && i + 3 < b.length) {
      if (u8(b, i) != 0xff) return b // lost sync: do not touch the payload
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else if (m == 0xd9 || m == 0xda) done = true // entropy data follows: stop walking
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2 || i + 2 + segLen > b.length) return b
        if (m == 0xe1 && ascii(b, i + 4, "Exif") && i + 9 < b.length &&
            b(i + 8) == 0 && b(i + 9) == 0) {
          spans = (i, i + 2 + segLen) :: spans
        }
        i += 2 + segLen
      }
    }
    if (spans.isEmpty) return b
    val drop = spans.map { case (s, e) => e - s }.sum
    val out = new Array[Byte](b.length - drop)
    var src = 0
    var dst = 0
    spans.reverse.foreach { case (s, e) =>
      System.arraycopy(b, src, out, dst, s - src)
      dst += s - src
      src = e
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  /** 1 = progressive JPEG (SOF2/6/10/14 frame header), 0 = sequential
    * (baseline/extended/lossless SOFs), -1 = not a JPEG or no frame header
    * reachable. Progressive payloads cost a full multi-scan buffer to
    * decode — a curation pass that drops or reroutes them wants the bit
    * without the decode.
    */
  def jpegProgressive(b: Array[Byte]): Int = {
    if (b == null || !isJpeg(b)) return -1
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return -1
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2
      else if (m == 0xd9 || m == 0xda) return -1
      else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return -1
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) return if (m == 0xc2 || m == 0xc6 || m == 0xca || m == 0xce) 1 else 0
        i += 2 + segLen
      }
    }
    -1
  }

  /** GIF frame count: image descriptors (0x2C) in the block stream, walking
    * extension sub-blocks without touching LZW payloads beyond their length
    * prefixes. 1 = static, >1 = animated — the static-vs-animated split is
    * a standard image-curation gate. -1 for non-GIFs or lost sync.
    */
  def gifFrames(b: Array[Byte]): Int = {
    if (b == null || !isGif(b)) return -1
    if (b.length < 13) return -1
    var i = 13
    val gPacked = u8(b, 10)
    if ((gPacked & 0x80) != 0) i += 3 * (1 << ((gPacked & 7) + 1)) // global color table
    var frames = 0
    while (i < b.length) {
      u8(b, i) match {
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return -1
          frames += 1
          val lPacked = u8(b, i + 9)
          i += 10
          if ((lPacked & 0x80) != 0) i += 3 * (1 << ((lPacked & 7) + 1)) // local color table
          if (i >= b.length) return -1
          i += 1 // LZW minimum code size
          var len = if (i < b.length) u8(b, i) else -1
          while (len > 0) { // data sub-blocks
            i += 1 + len
            len = if (i < b.length) u8(b, i) else -1
          }
          if (len < 0) return -1
          i += 1 // block terminator
        case 0x21 => // extension: label + sub-blocks
          i += 2
          var len = if (i < b.length) u8(b, i) else -1
          while (len > 0) {
            i += 1 + len
            len = if (i < b.length) u8(b, i) else -1
          }
          if (len < 0) return -1
          i += 1
        case 0x3b => return frames // trailer
        case 0x00 => i += 1 // stray padding between blocks (seen in the wild)
        case _    => return -1 // lost sync
      }
    }
    frames // truncated tail: report what was seen (truncation IS data)
  }
}
