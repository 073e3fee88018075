package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real dependency-free GIF89a codec — the DICTIONARY-CODING member of the
  * codec family (PGM q161 = raw, BMP q167 = padded container, PNG q171 =
  * LZ77+Huffman lossless, JPEG q170 = lossy transform, WAV q168 = audio;
  * GIF adds variable-width LZW with in-stream dictionary resets AND the
  * multi-frame/animation container, which ties the codec family to the
  * frame-sampling shape of q73). No library involved: the LZW coder below
  * is written from the GIF89a specification (variable code width 9→12
  * bits, CLEAR/EOI codes, 4096-entry dictionary reset, LSB-first bit
  * packing, 255-byte sub-block framing).
  *
  * Encoder: grayscale frames through a 256-entry global color table with
  * entry i = (i,i,i) — palette indices ARE pixel values, so the round trip
  * is lossless and the oracle replays pixels directly from payload bytes.
  * Each frame carries a Graphic Control Extension with a distinct delay.
  *
  * Decoder: general — header/screen-descriptor parse, global AND local
  * color tables, extension-block walk (GCE delay capture, sub-block skip
  * for the rest), full LZW decode (code-width growth, dictionary reset,
  * the KwKwK first-use case), per-frame index→palette mapping. Fails
  * loudly on bad magic, truncation, interlacing, missing palette, LZW
  * codes beyond the dictionary, or a pixel-count mismatch.
  */
object Gif {

  final case class FrameStats(doc_id: Long, frame_idx: Int, delay_cs: Int,
                              n_px: Long, sum_px: Long, min_px: Int, max_px: Int)

  private[multimodal] val frameW = 16
  private[multimodal] val frameH = 8
  private val frameBytes = frameW * frameH // 128

  // ---------------------------------------------------------------- LZW

  /** GIF-LZW encode of 8-bit indices (minCodeSize 8): variable code width,
    * CLEAR first, dictionary reset at 4096 entries, EOI last, LSB-first.
    */
  private[multimodal] def lzwEncode(idx: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0
    var codeSize = 9
    val clear = 256; val eoi = 257
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBits; nBits += codeSize
      while (nBits >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8 }
    }
    var dict = new java.util.HashMap[Int, Int]() // key = prefix<<8 | byte
    var next = 258
    put(clear)
    if (idx.nonEmpty) {
      var cur = idx(0) & 0xff
      var i = 1
      while (i < idx.length) {
        val c = idx(i) & 0xff
        val key = cur << 8 | c
        // NB getOrDefault, not get: a Scala-side j.u.HashMap[Int, Int]
        // null-unboxes a miss to 0, which reads as a valid root code.
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) cur = hit
        else {
          put(cur)
          dict.put(key, next)
          next += 1
          if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (next == 4096) {
            put(clear)
            dict = new java.util.HashMap[Int, Int](); next = 258; codeSize = 9
          }
          cur = c
        }
        i += 1
      }
      put(cur)
    }
    put(eoi)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-LZW decode (minCodeSize 8) → exactly `expected` indices. */
  private[multimodal] def lzwDecode(id: Long, data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var on = 0
    // dictionary as (prefix-code, last-byte) pairs; roots are implicit
    val prefix = new Array[Int](4096); val last = new Array[Byte](4096)
    val len = new Array[Int](4096)
    var next = 258; var codeSize = 9
    var bitBuf = 0L; var nBits = 0; var i = 0
    var prev = -1
    def emit(code: Int): Byte = { // writes the code's string, returns its first byte
      var c = code
      var n = if (c < 256) 1 else len(c)
      require(on + n <= expected, s"doc $id: LZW output exceeds frame size")
      var p = on + n
      while (c >= 256) { p -= 1; out(p) = last(c); c = prefix(c) }
      p -= 1; out(p) = c.toByte
      on += n
      c.toByte
    }
    while (true) {
      while (nBits < codeSize) {
        require(i < data.length, s"doc $id: truncated LZW stream")
        bitBuf |= (data(i) & 0xffL) << nBits; nBits += 8; i += 1
      }
      val code = (bitBuf & ((1 << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; nBits -= codeSize
      if (code == 256) { next = 258; codeSize = 9; prev = -1 }
      else if (code == 257) {
        require(on == expected, s"doc $id: LZW pixel count $on != $expected")
        return out
      } else {
        require(code < next || (code == next && prev >= 0),
          s"doc $id: LZW code $code beyond dictionary $next")
        if (prev < 0) { // first code after CLEAR must be a root
          require(code < 256, s"doc $id: non-root first LZW code")
          emit(code)
        } else {
          val first =
            if (code < next) emit(code)
            else { // KwKwK: prev's string + its own first byte
              var c = prev
              while (c >= 256) c = prefix(c)
              require(on + (if (prev < 256) 1 else len(prev)) + 1 <= expected,
                s"doc $id: LZW output exceeds frame size")
              emit(prev)
              out(on) = c.toByte; on += 1
              c.toByte
            }
          if (next < 4096) {
            prefix(next) = prev; last(next) = first
            len(next) = (if (prev < 256) 1 else len(prev)) + 1
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
        prev = code
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ------------------------------------------------------------- encode

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, (v >> 8 & 0xff).toByte)

  /** data → a well-formed animated GIF89a: 16×8 grayscale frames of 128
    * payload bytes each (zero-padded, min 1 frame), global (i,i,i) palette,
    * per-frame GCE with delay 4+frame centiseconds, LZW sub-block framing.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val nf = math.max(1, (data.length + frameBytes - 1) / frameBytes)
    // The per-frame GCE delay is 4+f in a 16-bit field; past 65531 frames it
    // would wrap silently while the oracle computes unwrapped 4+frame_idx.
    // Fail loudly instead (mirrors the JPEG dimension guard).
    require(nf <= 65531, s"payload of ${data.length} B needs $nf frames; max 65531 (16-bit GCE delay)")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(le16(frameW)); out.write(le16(frameH))
    out.write(0xf7) // GCT present, 8-bit color resolution, GCT size 2^8
    out.write(0); out.write(0) // background index, aspect
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    var f = 0
    while (f < nf) {
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0) // no disposal, no transparency
      out.write(le16(4 + f)) // delay in cs — distinct per frame
      out.write(0); out.write(0) // transparent idx, terminator
      out.write(0x2c) // image descriptor
      out.write(le16(0)); out.write(le16(0)); out.write(le16(frameW)); out.write(le16(frameH))
      out.write(0) // no local table, not interlaced
      val idx = new Array[Byte](frameBytes)
      val base = f * frameBytes
      val n = math.min(frameBytes, math.max(0, data.length - base))
      if (n > 0) System.arraycopy(data, base, idx, 0, n)
      out.write(8) // LZW min code size
      val z = lzwEncode(idx)
      var p = 0
      while (p < z.length) {
        val k = math.min(255, z.length - p)
        out.write(k); out.write(z, p, k); p += k
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** General decoder → per-frame integer pixel statistics (through the
    * active palette's R channel; our gray palette makes that the index).
    */
  def decodeFrames(id: Long, p: Array[Byte]): Seq[FrameStats] = {
    require(p.length >= 13, s"doc $id: not a GIF (too short)")
    val magic = new String(p, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    require(magic == "GIF89a" || magic == "GIF87a", s"doc $id: bad magic '$magic'")
    def u16(at: Int): Int = (p(at) & 0xff) | (p(at + 1) & 0xff) << 8
    var i = 6
    i += 4 // logical screen w/h
    val packed = p(i) & 0xff; i += 3
    val global: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val sz = 3 * (1 << ((packed & 7) + 1))
        require(i + sz <= p.length, s"doc $id: truncated global color table")
        val t = java.util.Arrays.copyOfRange(p, i, i + sz); i += sz; t
      } else null
    val frames = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
    var delay = 0
    var done = false
    while (!done) {
      require(i < p.length, s"doc $id: missing trailer")
      (p(i) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: capture GCE delay, skip the rest
          require(i + 3 <= p.length, s"doc $id: truncated extension")
          val label = p(i + 1) & 0xff
          i += 2
          var bs = p(i) & 0xff
          if (label == 0xf9) {
            require(bs == 4 && i + 5 <= p.length, s"doc $id: bad or truncated GCE")
            delay = u16(i + 2)
          }
          while (bs != 0) {
            i += 1 + bs
            require(i < p.length, s"doc $id: truncated extension blocks")
            bs = p(i) & 0xff
          }
          i += 1
        case 0x2c =>
          require(i + 10 <= p.length, s"doc $id: truncated image descriptor")
          val (w, h) = (u16(i + 5), u16(i + 7))
          val ipacked = p(i + 9) & 0xff
          require((ipacked & 0x40) == 0, s"doc $id: interlaced GIF unsupported")
          i += 10
          val palette =
            if ((ipacked & 0x80) != 0) {
              val sz = 3 * (1 << ((ipacked & 7) + 1))
              require(i + sz <= p.length, s"doc $id: truncated local color table")
              val t = java.util.Arrays.copyOfRange(p, i, i + sz); i += sz; t
            } else global
          require(palette != null, s"doc $id: no color table in scope")
          require(i + 1 < p.length, s"doc $id: missing LZW min code size")
          require((p(i) & 0xff) == 8, s"doc $id: only 8-bit LZW supported")
          i += 1
          val z = new java.io.ByteArrayOutputStream()
          var bs = p(i) & 0xff
          while (bs != 0) {
            require(i + 1 + bs <= p.length, s"doc $id: truncated image data")
            z.write(p, i + 1, bs); i += 1 + bs
            require(i < p.length, s"doc $id: truncated image data")
            bs = p(i) & 0xff
          }
          i += 1
          val idx = lzwDecode(id, z.toByteArray, w * h)
          var (sum, mn, mx) = (0L, 255, 0)
          var k = 0
          while (k < idx.length) {
            val pi = 3 * (idx(k) & 0xff)
            require(pi + 2 < palette.length, s"doc $id: index beyond palette")
            val v = palette(pi) & 0xff // R channel = gray in our palette
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            k += 1
          }
          frames += FrameStats(id, frames.length, delay, w.toLong * h, sum, mn, mx)
          // Per GIF89a a GCE applies only to the single block that follows;
          // a frame without its own GCE must not inherit the previous delay.
          delay = 0
        case b => throw new IllegalArgumentException(s"doc $id: unknown block 0x${b.toHexString}")
      }
    }
    require(frames.nonEmpty, s"doc $id: no frames")
    frames.toSeq
  }

  /** The registered query: documents → real animated GIFs → per-frame
    * decoded stats. Map-only at any scale (one doc never leaves its task).
    */
  def gifDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encode(data)) }
      .flatMap { case (id, gif) => decodeFrames(id, gif) }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** DuckDB replay: lossless, so frame f's pixels are payload bytes
    * [128·f, 128·f+128) zero-padded — stats come straight off the hex.
    */
  val oracle: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n
      |           FROM documents),
      |fr AS (SELECT doc_id, hx, n, unnest(range(0,
      |                greatest(1, CAST(ceil(n / 128.0) AS INT)))) AS f
      |       FROM b),
      |px AS (SELECT doc_id, CAST(f AS INT) AS frame_idx,
      |         list_transform(range(1, 129), k ->
      |           CASE WHEN 128 * f + k <= n THEN
      |             CAST(strpos('0123456789ABCDEF', substr(hx, 2*(128*f + k) - 1, 1)) - 1 AS BIGINT) * 16
      |             + (strpos('0123456789ABCDEF', substr(hx, 2*(128*f + k), 1)) - 1)
      |           ELSE 0 END) AS bytes
      |       FROM fr)
      |SELECT doc_id, frame_idx, CAST(4 + frame_idx AS INT) AS delay_cs,
      |       CAST(128 AS BIGINT) AS n_px,
      |       CAST(list_sum(bytes) AS BIGINT) AS sum_px,
      |       CAST(list_min(bytes) AS INT) AS min_px,
      |       CAST(list_max(bytes) AS INT) AS max_px
      |FROM px ORDER BY doc_id, frame_idx""".stripMargin
}
