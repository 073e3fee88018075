package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8

/** The baseline JPEG codec is the family's one LOSSY format: these pin the
  * closed-form round trip on DC-only fixtures, drive the decoder's GENERAL
  * entropy path (non-zero AC coefficients, ZRL runs, custom tables) against
  * an independent IDCT, and pin the fail-loud malformed-payload contract.
  */
class JpegSpec extends SparkSpec {

  private def expectedPx(v: Int): Int =
    math.max(0, math.min(255, 2 * Math.round((v - 128) / 2.0).toInt + 128))

  test("JPEG round trip on DC-only fixtures matches the closed integer form") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,                       // 1 block row, all padding
      "a".getBytes(UTF_8),
      ("x" * 4).getBytes(UTF_8),                  // exactly one block row
      ("y" * 5).getBytes(UTF_8),                  // one block into row 2
      Array.tabulate(257)(i => i.toByte),         // all byte values
      Array.tabulate(40000)(i => (i * 37 + 11).toByte), // > the old 32 764-byte
    )                                             // height-overflow boundary
    cases.foreach { data =>
      val s = Jpeg.decodeStats(7L, Jpeg.encode(data))
      val bpr = math.max(1, math.ceil(math.sqrt(data.length.toDouble)).toInt)
      val blockRows = math.max(1, (data.length + bpr - 1) / bpr)
      val vals = data.map(b => expectedPx(b & 0xff)) ++
        Array.fill(bpr * blockRows - data.length)(128)
      assert(s.width == 8 * bpr && s.height == 8 * blockRows)
      assert(s.n_blocks == bpr.toLong * blockRows)
      assert(s.sum_px == 64L * vals.map(_.toLong).sum, s"n=${data.length}")
      assert(s.min_px == vals.min && s.max_px == vals.max)
    }
  }

  test("decoder handles general AC coefficients: hand-built scan vs independent IDCT") {
    // Build a 1-block file through the encoder, then rewrite its entropy
    // segment with AC symbols the encoder itself never emits: run/size
    // 0x11 (skip 1, size 1), ZRL 0xF0, and 0x21 (skip 2, size 1) from the
    // file's own custom AC table — proving the decoder's run-length path
    // is real, not just EOB. Codes (canonical over the declared table):
    // DC cat0=00; AC: EOB=00, 0x01=01, 0x02=100, 0x11=101, 0x21=1100,
    // ZRL=1101.
    val base = Jpeg.encode(Array[Byte](0x40, 0x40, 0x40, 0x40)) // 2×2 block grid = 4 blocks
    // locate SOS payload start: after marker 0xFFDA with length 8
    val sos = {
      var i = 2
      var at = -1
      while (at < 0) {
        val len = ((base(i + 2) & 0xff) << 8) | (base(i + 3) & 0xff)
        if ((base(i + 1) & 0xff) == 0xDA) at = i + 2 + len else i += 2 + len
      }
      at
    }
    val head = base.take(sos)
    // Scan bits for FOUR blocks (SOF says h=8 — keep one block row but 4
    // blocks wide): per block: DC cat0 ("00"), then AC list, then EOB.
    // blk0: DC 0; AC: 0x11 v=+1 (code 101, bit 1) → k=2 coeff zig2=+q
    // blk1: DC 0; AC: ZRL (1101) then 0x01 v=-1 (01, bit 0) → k=17 coeff −q
    // blk2: DC 0; AC: 0x21 v=+1 (1100, bit 1) → k=3 coeff +q
    // blk3: DC 0; EOB only.
    val bits = "00" + "101" + "1" + "00" +
               "00" + "1101" + "01" + "0" + "00" +
               "00" + "1100" + "1" + "00" +
               "00" + "00"
    val padded = bits + "1" * ((8 - bits.length % 8) % 8)
    val scan = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val jpg = head ++ scan ++ Array(0xFF.toByte, 0xD9.toByte)
    val s = Jpeg.decodeStats(1L, jpg)
    // Independent reference: dequantized coefficient grids → double IDCT.
    def ref(coefs: Map[Int, Int]): Seq[Int] = {
      for (y <- 0 until 8; x <- 0 until 8) yield {
        var acc = 0.0
        coefs.foreach { case (idx, c) =>
          val (u, v) = (idx % 8, idx / 8)
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          acc += cu * cv * c * math.cos((2 * x + 1) * u * math.Pi / 16) *
                 math.cos((2 * y + 1) * v * math.Pi / 16)
        }
        math.max(0, math.min(255, Math.round(acc / 4 + 128).toInt))
      }
    }
    val z = Jpeg.zigzag
    val q = Jpeg.quantTable
    val blocks = Seq(
      ref(Map(z(2) -> q(z(2)))),                  // +1 at zig 2
      ref(Map(z(17) -> -q(z(17)))),               // −1 at zig 17 (after ZRL)
      ref(Map(z(3) -> q(z(3)))),                  // +1 at zig 3
      ref(Map.empty))
    val all = blocks.flatten
    assert(s.sum_px == all.map(_.toLong).sum)
    assert(s.min_px == all.min && s.max_px == all.max)
    assert(s.n_blocks == 4L)
  }

  test("decoder fails loudly on malformed payloads") {
    val good = Jpeg.encode("abc".getBytes(UTF_8))
    val noSoi = good.clone(); noSoi(1) = 0x00
    intercept[IllegalArgumentException] { Jpeg.decodeStats(1L, noSoi) }
    intercept[IllegalArgumentException] {        // truncated entropy stream
      Jpeg.decodeStats(2L, good.dropRight(6)) }
    val prog = good.clone()                      // SOF0 → SOF2 (progressive)
    var i = 2
    var done = false
    while (!done) {
      if ((prog(i + 1) & 0xff) == 0xC0) { prog(i + 1) = 0xC2.toByte; done = true }
      else i += 2 + (((prog(i + 2) & 0xff) << 8) | (prog(i + 3) & 0xff))
    }
    intercept[IllegalArgumentException] { Jpeg.decodeStats(3L, prog) }
  }

  test("distributed decode equals per-doc local decode") {
    import org.apache.spark.sql.functions._
    val got = Jpeg.jpegDecode(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes(UTF_8))
    assert(got.size == docs.length)
    docs.foreach { case (id, data) =>
      val s = Jpeg.decodeStats(id, Jpeg.encode(data))
      assert(got(id) == ((s.width, s.height, s.n_blocks, s.sum_px, s.min_px, s.max_px)),
        s"doc $id decode mismatch")
    }
  }
}
