package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real dependency-free PNG codec (RFC 2083) — the COMPRESSED lossless
  * member of the codec family (PGM q161 = raw container, BMP q167 = padded
  * container, JPEG q170 = lossy transform coding; PNG adds entropy
  * compression + scanline prediction). zlib lives in the JDK
  * (`java.util.zip.Deflater`/`Inflater`), so no dependency is involved.
  *
  * Encoder: 8-bit grayscale — PNG signature, IHDR, IDAT (zlib-deflated
  * scanlines, filter byte 0, split across TWO IDAT chunks to exercise the
  * spec's chunk-concatenation rule), IEND, with a real CRC-32 per chunk.
  *
  * Decoder: general for 8-bit grayscale — signature check, chunk walk with
  * PER-CHUNK CRC VERIFICATION (a codec must reject corruption, not average
  * over it), IHDR validation, multi-IDAT concatenation, zlib inflate, and
  * scanline reconstruction supporting ALL FIVE filter types (None/Sub/Up/
  * Average/Paeth) — PngSpec drives the filters the encoder never emits via
  * hand-deflated streams.
  *
  * Decode is LOSSLESS, so the closed form needs no modeling: pixels are
  * the payload bytes zero-padded to the 48-wide grid, and the DuckDB
  * oracle replays the stats from hex(encode(text)) like q161.
  */
object Png {

  final case class PngStats(doc_id: Long, width: Int, height: Int,
                            n_px: Long, sum_px: Long, min_px: Int, max_px: Int)

  private val pngWidth = 48
  private[multimodal] val signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private[multimodal] def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private[multimodal] def chunk(out: java.io.ByteArrayOutputStream, typ: String, body: Array[Byte]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(4).putInt(body.length)
    out.write(bb.array)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t); out.write(body)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc32(t, body)).array)
  }

  /** data → a well-formed 8-bit grayscale PNG: 48 px wide, height =
    * ceil(n/48) (min 1), payload bytes row-major with zero padding; filter
    * byte 0 per scanline; IDAT split in two chunks.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val w = pngWidth
    val h = math.max(1, (data.length + w - 1) / w)
    val raw = new Array[Byte](h * (1 + w))          // filter byte + row
    var j = 0
    while (j < data.length) {
      raw((j / w) * (1 + w) + 1 + j % w) = data(j)
      j += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    // Chunked drain: a fixed out-buffer sized raw+64 would spin forever on
    // incompressible input whose stored-block overhead exceeds the slack
    // (r9 review catch).
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val dbuf = new Array[Byte](8192)
    while (!d.finished()) zOut.write(dbuf, 0, d.deflate(dbuf))
    d.end()
    val z = zOut.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)  // depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)        // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.array)
    val split = z.length / 2
    chunk(out, "IDAT", java.util.Arrays.copyOfRange(z, 0, split))
    chunk(out, "IDAT", java.util.Arrays.copyOfRange(z, split, z.length))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** General 8-bit grayscale decoder → integer pixel statistics. Verifies
    * every chunk CRC, concatenates all IDAT chunks, inflates, and
    * reconstructs scanlines under all five filter types. Throws on any
    * malformed structure, CRC mismatch, or short pixel data.
    */
  def decodeStats(id: Long, p: Array[Byte]): PngStats = {
    require(p.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(p, 8), signature), s"doc $id: not a PNG")
    val bb = java.nio.ByteBuffer.wrap(p)
    var i = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end) {
      require(i + 8 <= p.length, s"doc $id: truncated chunk header")
      val len = bb.getInt(i)
      require(len >= 0 && i + 12 + len <= p.length, s"doc $id: truncated chunk")
      val typ = new String(p, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val body = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
      require(bb.getInt(i + 8 + len) == crc32(
        java.util.Arrays.copyOfRange(p, i + 4, i + 8), body),
        s"doc $id: CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          w = bb.getInt(i + 8); h = bb.getInt(i + 12)
          require(w > 0 && h > 0, s"doc $id: bad dimensions")
          require(body(8) == 8 && body(9) == 0, s"doc $id: only 8-bit grayscale supported")
          require(body(10) == 0 && body(12) == 0, s"doc $id: compression/interlace unsupported")
        case "IDAT" => idat.write(body)
        case "IEND" => end = true
        case _ => ()                               // ancillary chunk: skip
      }
      i += 12 + len
    }
    require(w > 0, s"doc $id: no IHDR")
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    var rn = 0
    while (rn < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, rn, raw.length - rn)
      // needsDictionary: FDICT streams would otherwise spin (k = 0 with
      // needsInput false, finished false) instead of failing loudly.
      require(!inf.needsDictionary(), s"doc $id: preset-dictionary zlib stream unsupported")
      require(k > 0 || !inf.needsInput(), s"doc $id: truncated IDAT stream")
      rn += k
    }
    inf.end()
    require(rn == raw.length, s"doc $id: pixel data short: $rn of ${raw.length}")
    // Scanline reconstruction, bpp = 1 (grayscale 8-bit).
    val prev = new Array[Int](w)
    var (sum, mn, mx) = (0L, 255, 0)
    var row = 0
    while (row < h) {
      val base = row * (1 + w)
      val f = raw(base) & 0xff
      require(f <= 4, s"doc $id: unknown filter $f")
      var x = 0
      var left = 0
      var ulHold = 0                 // prev ROW's value at x−1: prev(x−1)
      while (x < w) {                // is overwritten before x reads it,
        val v = raw(base + 1 + x) & 0xff // so carry it explicitly
        val up = prev(x)
        val ul = if (x == 0) 0 else ulHold
        val rec = f match {
          case 0 => v
          case 1 => (v + left) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + (left + up) / 2) & 0xff
          case 4 => (v + paeth(left, up, ul)) & 0xff
        }
        ulHold = up
        prev(x) = rec; left = rec
        sum += rec; if (rec < mn) mn = rec; if (rec > mx) mx = rec
        x += 1
      }
      row += 1
    }
    PngStats(id, w, h, w.toLong * h, sum, mn, mx)
  }

  /** The registered query: documents → real PNGs → decoded stats. */
  def pngDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encode(data)) }
      .mapPartitions(_.map { case (id, png) => decodeStats(id, png) })
      .toDF()
      .orderBy("doc_id")
  }

  /** DuckDB replay: lossless, so decoded pixels ARE the payload bytes
    * zero-padded onto the 48-wide grid — the q161 closed form at width 48.
    */
  val oracle: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n
      |           FROM documents),
      |dims AS (SELECT doc_id, hx, n, 48 AS w,
      |                greatest(1, CAST(ceil(n / 48.0) AS INT)) AS h
      |         FROM b),
      |px AS (SELECT doc_id, w, h, n,
      |         list_transform(range(1, n + 1), k ->
      |           CAST(strpos('0123456789ABCDEF', substr(hx, 2*k - 1, 1)) - 1 AS BIGINT) * 16
      |           + (strpos('0123456789ABCDEF', substr(hx, 2*k, 1)) - 1)) AS bytes
      |       FROM dims)
      |SELECT doc_id, w AS width, h AS height,
      |       CAST(w * h AS BIGINT) AS n_px,
      |       CAST(coalesce(list_sum(bytes), 0) AS BIGINT) AS sum_px,
      |       CAST(CASE WHEN w * h > n THEN 0 ELSE list_min(bytes) END AS INT) AS min_px,
      |       CAST(CASE WHEN n = 0 THEN 0 ELSE list_max(bytes) END AS INT) AS max_px
      |FROM px ORDER BY doc_id""".stripMargin
}
