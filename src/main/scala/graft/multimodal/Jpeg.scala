package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real dependency-free BASELINE JPEG (ITU-T T.81) codec — the lossy-codec
  * capstone of the multimodal family (PGM q161 and BMP q167 are lossless
  * containers; JPEG adds entropy coding, quantization, and the DCT).
  *
  * Encoder: grayscale single-component baseline sequential — SOI/APP0/DQT/
  * SOF0/DHT/SOS markers, the Annex K luminance quantization and DC Huffman
  * tables, a compact custom AC table (an encoder may define any canonical
  * tables; this one only ever emits EOB, but the table also carries
  * run/size symbols so the DECODER's general AC path is exercisable), DC
  * difference coding with EXTEND semantics, and 0xFF byte stuffing.
  *
  * Decoder: a GENERAL baseline decoder — marker walk, arbitrary 8-bit DQT,
  * canonical DHT reconstruction (any table the file defines), entropy
  * decode with DC prediction, AC run/size + ZRL + EOB, stuffed-byte bit
  * reader, dequantization, exact separable IDCT, level shift + clamp.
  *
  * Determinism contract (the q161 playbook for a LOSSY codec): the query's
  * fixtures are images whose 8×8 blocks are CONSTANT (block b = payload
  * byte b), so every AC coefficient is exactly zero and the decoded value
  * is the closed integer form 2·round((v−128)/2)+128 (DC quant 16, IDCT of
  * a DC-only block is exact in doubles: DCq·16/8 = 2·DCq) — replayable
  * byte-for-byte by the DuckDB oracle. The decoder itself never assumes
  * this; JpegSpec drives it over files with non-zero AC coefficients.
  */
object Jpeg {

  final case class JpegStats(doc_id: Long, width: Int, height: Int,
                             n_blocks: Long, sum_px: Long, min_px: Int, max_px: Int)

  // Annex K luminance quantization table (zig-zag order in the file; the
  // top-left entry 16 is the DC step the oracle's closed form uses).
  private[multimodal] val quantTable: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Annex K DC luminance Huffman spec: #codes per length 1..16, then the
  // category symbols 0..11 in code order.
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // Compact custom AC table (canonical, decoder-agnostic): EOB and a few
  // run/size symbols incl. ZRL so general AC decoding is drivable.
  private val acBits = Array(0, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acVals = Array(0x00, 0x01, 0x02, 0x11, 0x21, 0xF0)

  /** Canonical code assignment (T.81 C.2): (code, length) per symbol. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) { out += vals(k) -> (code, len); code += 1; k += 1; i += 1 }
      code <<= 1
    }
    out.result()
  }
  private val dcEnc = canonicalCodes(dcBits, dcVals)
  private val acEnc = canonicalCodes(acBits, acVals)

  /** Zig-zag scan order: zigzag(i) = raster index of the i-th scanned coeff. */
  private[multimodal] val zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var (x, y, up) = (0, 0, true)
    for (i <- 0 until 64) {
      z(i) = y * 8 + x
      if (up) { if (x == 7) { y += 1; up = false } else if (y == 0) { x += 1; up = false }
                else { x += 1; y -= 1 } }
      else    { if (y == 7) { x += 1; up = true } else if (x == 0) { y += 1; up = true }
                else { x -= 1; y += 1 } }
    }
    z
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nb = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); nb += 1
        if (nb == 8) { out.write(acc); if (acc == 0xFF) out.write(0x00); acc = 0; nb = 0 }
        i -= 1
      }
    }
    def flush(): Unit = if (nb > 0) { // pad with 1s per spec
      acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
      out.write(acc); if (acc == 0xFF) out.write(0x00); acc = 0; nb = 0
    }
  }

  private def magnitude(v: Int): Int = { var s = 0; var a = math.abs(v); while (a > 0) { s += 1; a >>= 1 }; s }

  /** data → a well-formed baseline JPEG: one constant 8×8 block per
    * payload byte (blocks past the payload at 128), arranged on a
    * NEAR-SQUARE grid of ⌈√n⌉ blocks per row — both SOF dimensions stay
    * inside the format's 16-bit fields up to ~67 MB payloads, past which
    * the encoder fails LOUDLY (the r9 review catch: a fixed 32-px width
    * silently wrapped the height field beyond 32 764 bytes, and the skew
    * corpus's 160 K-char head document hit exactly that). ⌈√n⌉ is
    * engine-portable: IEEE sqrt is correctly rounded, so perfect squares
    * are exact and the oracle's ceil(sqrt(n)) agrees bit-for-bit.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val bpr = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val blockRows = math.max(1, (n + bpr - 1) / bpr)
    val w = 8 * bpr
    val h = 8 * blockRows
    require(w <= 65535 && h <= 65535,
      s"payload of $n bytes exceeds baseline JPEG's 16-bit dimensions")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)                                   // SOI
    marker(0xE0); u16(16); out.write("JFIF".getBytes); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    marker(0xDB); u16(2 + 1 + 64); out.write(0)    // DQT, 8-bit, id 0
    for (i <- 0 until 64) out.write(quantTable(zigzag(i)))
    marker(0xC0); u16(2 + 6 + 3); out.write(8)     // SOF0: 8-bit, 1 component
    u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)    // comp 1, 1x1, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length); out.write(cls << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, dcBits, dcVals); dht(1, acBits, acVals)
    marker(0xDA); u16(2 + 1 + 2 + 3); out.write(1) // SOS
    out.write(1); out.write(0x00)                  // comp 1: DC 0, AC 0
    out.write(0); out.write(63); out.write(0)      // Ss, Se, AhAl
    val bw = new BitWriter(out)
    var predDc = 0
    val nBlocks = bpr * blockRows
    var b = 0
    while (b < nBlocks) {
      val v = if (b < data.length) data(b) & 0xff else 128
      // FDCT of a constant block: DC = 8·(v−128), every AC exactly 0.
      val dc = 8 * (v - 128)
      val dcq = Math.round(dc.toDouble / quantTable(0)).toInt
      val diff = dcq - predDc
      predDc = dcq
      val s = magnitude(diff)
      val (c, l) = dcEnc(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      val (ec, el) = acEnc(0x00)                   // EOB: all 63 ACs zero
      bw.put(ec, el)
      b += 1
    }
    bw.flush()
    marker(0xD9)                                   // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // MINCODE/MAXCODE/VALPTR decode per T.81 F.2.2.3.
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k; minCode(len) = code
          k += bits(len - 1); code += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var code = br.bit()
      while (len < 17 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit(); len += 1
      }
      require(len < 17, "jpeg: invalid Huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitReader(p: Array[Byte], var i: Int) {
    private var acc = 0
    private var nb = 0
    def bit(): Int = {
      if (nb == 0) {
        require(i < p.length, "jpeg: entropy stream truncated")
        var b = p(i) & 0xff; i += 1
        if (b == 0xFF) {
          require(i < p.length && p(i) == 0x00, "jpeg: marker inside entropy data")
          i += 1                                   // stuffed zero
        }
        acc = b; nb = 8
      }
      nb -= 1
      (acc >>> nb) & 1
    }
    def bits(n: Int): Int = { var v = 0; var k = 0; while (k < n) { v = (v << 1) | bit(); k += 1 }; v }
  }

  private def extend(v: Int, s: Int): Int = if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // cosTab(u)(x) = C(u)·cos((2x+1)uπ/16), with C(0) = 1/√2 folded in —
  // hoisted once; identical doubles to computing them inline.
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2) else 1.0) * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  /** Exact SPARSE IDCT (T.81 A.3.3) in doubles with final half-up round and
    * [0,255] clamp: only non-zero coefficients contribute (adding zero terms
    * is the identity on doubles, so skipping them is bit-identical to the
    * dense sum). A DC-only block — every block of the query's fixtures —
    * short-circuits to its exact constant fill (dc·quant is a multiple of
    * 8, so dc'/8 is an exact double); general blocks pay O(64·nz), not
    * O(64·64) — the difference between 7 s and 0.4 s over a 5 K-doc corpus.
    */
  private def idctBlock(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var nz = 0
    var i = 1
    while (i < 64) { if (coef(i) != 0) nz += 1; i += 1 }
    if (nz == 0) {
      val px0 = Math.round(coef(0) / 8.0 + 128).toInt
      val px = math.max(0, math.min(255, px0))
      java.util.Arrays.fill(out, px)
      return out
    }
    val nzIdx = new Array[Int](nz + (if (coef(0) != 0) 1 else 0))
    var k = 0
    i = 0
    while (i < 64) { if (coef(i) != 0) { nzIdx(k) = i; k += 1 }; i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var j = 0
        while (j < nzIdx.length) {
          val idx = nzIdx(j)
          s += coef(idx) * cosTab(idx % 8)(x) * cosTab(idx / 8)(y)
          j += 1
        }
        val px = Math.round(s / 4 + 128).toInt
        out(y * 8 + x) = math.max(0, math.min(255, px))
        x += 1
      }
      y += 1
    }
    out
  }

  /** General baseline decoder → integer pixel statistics. Throws on any
    * malformed structure — markers, tables, entropy stream.
    */
  def decodeStats(id: Long, p: Array[Byte]): JpegStats = {
    require(p.length >= 4 && (p(0) & 0xff) == 0xFF && (p(1) & 0xff) == 0xD8,
      s"doc $id: not a JPEG (no SOI)")
    var i = 2
    var quant: Array[Array[Int]] = Array.fill(4)(null)
    var dcTab: Array[HuffTable] = Array.fill(4)(null)
    var acTab: Array[HuffTable] = Array.fill(4)(null)
    var w = -1; var h = -1; var qSel = -1
    var dcSel = -1; var acSel = -1
    var scanAt = -1
    def u16(at: Int): Int = ((p(at) & 0xff) << 8) | (p(at + 1) & 0xff)
    while (scanAt < 0) {
      require(i + 4 <= p.length && (p(i) & 0xff) == 0xFF, s"doc $id: bad marker sync")
      val m = p(i + 1) & 0xff
      val len = u16(i + 2)
      require(i + 2 + len <= p.length, s"doc $id: truncated segment ${m.toHexString}")
      m match {
        case 0xDB =>
          var j = i + 4
          while (j < i + 2 + len) {
            val pq = (p(j) & 0xff) >> 4; val tq = p(j) & 0x0f
            require(pq == 0, s"doc $id: 16-bit DQT unsupported")
            val t = new Array[Int](64)
            for (k <- 0 until 64) t(zigzag(k)) = p(j + 1 + k) & 0xff
            quant(tq) = t; j += 65
          }
        case 0xC0 =>
          require((p(i + 4) & 0xff) == 8, s"doc $id: precision != 8")
          h = u16(i + 5); w = u16(i + 7)
          require((p(i + 9) & 0xff) == 1, s"doc $id: only single-component (grayscale) supported")
          require((p(i + 11) & 0xff) == 0x11, s"doc $id: subsampling unsupported")
          qSel = p(i + 12) & 0xff
        case 0xC4 =>
          var j = i + 4
          while (j < i + 2 + len) {
            val cls = (p(j) & 0xff) >> 4; val tid = p(j) & 0x0f
            val bits = Array.tabulate(16)(k => p(j + 1 + k) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(k => p(j + 17 + k) & 0xff)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTab(tid) = t else acTab(tid) = t
            j += 17 + n
          }
        case 0xDA =>
          require((p(i + 4) & 0xff) == 1, s"doc $id: multi-component scan unsupported")
          dcSel = (p(i + 6) & 0xff) >> 4; acSel = p(i + 6) & 0x0f
          scanAt = i + 2 + len
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB =>
          throw new IllegalArgumentException(s"doc $id: non-baseline SOF ${m.toHexString}")
        case _ => ()                               // APPn/COM: skip
      }
      i += 2 + len
    }
    require(w > 0 && h > 0 && quant(qSel) != null && dcTab(dcSel) != null && acTab(acSel) != null,
      s"doc $id: scan before tables/frame")
    require(w % 8 == 0 && h % 8 == 0, s"doc $id: non-MCU-aligned dims unsupported")
    val q = quant(qSel); val dt = dcTab(dcSel); val at = acTab(acSel)
    val br = new BitReader(p, scanAt)
    val nBlocks = (w / 8) * (h / 8)
    var (sum, mn, mx) = (0L, 255, 0)
    var pred = 0
    var b = 0
    while (b < nBlocks) {
      val coef = new Array[Int](64)
      val s = dt.decode(br)
      pred += extend(br.bits(s), s)
      coef(0) = pred * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = at.decode(br)
        if (rs == 0x00) eob = true
        else if (rs == 0xF0) k += 16
        else {
          k += (rs >> 4)
          require(k < 64, s"doc $id: AC run past block end")
          val sz = rs & 0x0f
          coef(zigzag(k)) = extend(br.bits(sz), sz) * q(zigzag(k))
          k += 1
        }
      }
      val px = idctBlock(coef)
      var j = 0
      while (j < 64) { val v = px(j); sum += v; if (v < mn) mn = v; if (v > mx) mx = v; j += 1 }
      b += 1
    }
    JpegStats(id, w, h, nBlocks.toLong, sum, mn, mx)
  }

  /** The registered query: documents → real baseline JPEGs → decoded stats. */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encode(data)) }
      .mapPartitions(_.map { case (id, jpg) => decodeStats(id, jpg) })
      .toDF()
      .orderBy("doc_id")
  }

  /** DuckDB replay: block b < n is payload byte v with decoded value
    * clamp(2·round((v−128)/2)+128) — DC quant 16, so DCq = round(8(v−128)/16)
    * = round((v−128)/2) and the DC-only IDCT is DCq·16/8 + 128 = 2·DCq+128;
    * padding blocks (v = 128) decode to exactly 128. Math.round = floor(x+0.5).
    */
  val oracle: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n
      |           FROM documents),
      |px AS (SELECT doc_id, n,
      |         greatest(1, CAST(ceil(sqrt(n)) AS BIGINT)) AS bpr,
      |         list_transform(range(1, n + 1), k ->
      |           CAST(strpos('0123456789ABCDEF', substr(hx, 2*k - 1, 1)) - 1 AS BIGINT) * 16
      |           + (strpos('0123456789ABCDEF', substr(hx, 2*k, 1)) - 1)) AS bytes
      |       FROM b),
      |dims AS (SELECT doc_id, n, bpr, bytes,
      |           greatest(1, CAST(ceil(n / CAST(bpr AS DOUBLE)) AS BIGINT)) AS block_rows
      |         FROM px),
      |dec AS (SELECT doc_id, n, bpr, block_rows, bpr * block_rows AS nb,
      |          list_transform(bytes, v ->
      |            least(255, greatest(0, 2 * CAST(floor((v - 128) / 2.0 + 0.5) AS BIGINT) + 128))) AS dv
      |        FROM dims)
      |SELECT doc_id, CAST(8 * bpr AS INT) AS width,
      |       CAST(8 * block_rows AS INT) AS height,
      |       CAST(nb AS BIGINT) AS n_blocks,
      |       CAST(64 * (coalesce(list_sum(dv), 0) + (nb - n) * 128) AS BIGINT) AS sum_px,
      |       CAST(CASE WHEN nb > n THEN least(128, coalesce(list_min(dv), 128))
      |                 ELSE list_min(dv) END AS INT) AS min_px,
      |       CAST(CASE WHEN nb > n THEN greatest(128, coalesce(list_max(dv), 128))
      |                 ELSE list_max(dv) END AS INT) AS max_px
      |FROM dec ORDER BY doc_id""".stripMargin
}
