package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8

/** PNG is the compressed lossless codec: these pin the zlib round trip,
  * drive the decoder's scanline filters the encoder never emits (Sub/Up/
  * Average/Paeth) through a hand-deflated stream, and pin CRC rejection.
  */
class PngSpec extends SparkSpec {

  test("PNG round trip recovers dimensions and exact pixel statistics") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,                       // empty doc → 1 all-pad row
      "a".getBytes(UTF_8),
      ("x" * 48).getBytes(UTF_8),                 // exactly one row
      ("y" * 49).getBytes(UTF_8),                 // one byte into row 2
      "héllo wörld — ümlauts".getBytes(UTF_8),
      Array.tabulate(257)(i => i.toByte),
    )
    cases.foreach { data =>
      val s = Png.decodeStats(7L, Png.encode(data))
      val w = 48
      val h = math.max(1, (data.length + w - 1) / w)
      val unsigned = data.map(_ & 0xff)
      val nPad = w * h - data.length
      assert(s.width == w && s.height == h && s.n_px == w.toLong * h)
      assert(s.sum_px == unsigned.map(_.toLong).sum)
      assert(s.min_px == (if (nPad > 0) 0 else unsigned.min))
      assert(s.max_px == (if (data.isEmpty) 0 else unsigned.max))
    }
  }

  test("decoder reconstructs all five scanline filters") {
    // Target image: 4×4, pixel (r,c) = 10 + 16·r + c — then FILTER each
    // row with a different type (row0 None, row1 Sub, row2 Up, row3
    // Average; plus a 5th row under Paeth) and check the decoder inverts
    // them all. Filtered values are computed here independently.
    val w = 4
    val px = Array.tabulate(5, w)((r, c) => 10 + 16 * r + c)
    def filt(r: Int, c: Int): Int = {
      val v = px(r)(c)
      val left = if (c == 0) 0 else px(r)(c - 1)
      val up = if (r == 0) 0 else px(r - 1)(c)
      val ul = if (r == 0 || c == 0) 0 else px(r - 1)(c - 1)
      r match {
        case 0 => v
        case 1 => (v - left) & 0xff
        case 2 => (v - up) & 0xff
        case 3 => (v - (left + up) / 2) & 0xff
        case 4 =>
          val p = left + up - ul
          val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
          val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          (v - pred) & 0xff
      }
    }
    val raw = (0 until 5).flatMap(r => r.toByte +: (0 until w).map(c => filt(r, c).toByte)).toArray
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    var zn = 0
    while (!d.finished()) zn += d.deflate(buf, zn, buf.length - zn)
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Png.signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(5).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    Png.chunk(out, "IHDR", ihdr.array)
    Png.chunk(out, "IDAT", java.util.Arrays.copyOf(buf, zn))
    Png.chunk(out, "IEND", Array.emptyByteArray)
    val s = Png.decodeStats(1L, out.toByteArray)
    val flat = px.flatten
    assert(s.width == w && s.height == 5 && s.n_px == 20L)
    assert(s.sum_px == flat.map(_.toLong).sum)
    assert(s.min_px == flat.min && s.max_px == flat.max)
  }

  test("decoder rejects CRC corruption, truncation, and unsupported formats") {
    val good = Png.encode("abcdef".getBytes(UTF_8))
    // flip one pixel byte inside the first IDAT body → CRC mismatch
    val bad = good.clone()
    var i = 8
    var idatAt = -1
    while (idatAt < 0) {
      val len = java.nio.ByteBuffer.wrap(bad).getInt(i)
      if (new String(bad, i + 4, 4) == "IDAT") idatAt = i else i += 12 + len
    }
    bad(idatAt + 8) = (bad(idatAt + 8) ^ 0x41).toByte
    intercept[IllegalArgumentException] { Png.decodeStats(1L, bad) }
    intercept[IllegalArgumentException] {       // truncated file
      Png.decodeStats(2L, good.dropRight(16)) }
    val badSig = good.clone(); badSig(1) = 'X'
    intercept[IllegalArgumentException] { Png.decodeStats(3L, badSig) }
    val rgb = good.clone()                      // IHDR color type 0 → 2 (RGB)
    rgb(8 + 8 + 9) = 2
    // fix the IHDR CRC so the failure is the FORMAT check, not the CRC
    val body = java.util.Arrays.copyOfRange(rgb, 16, 29)
    val c = Png.crc32("IHDR".getBytes, body)
    java.nio.ByteBuffer.wrap(rgb).putInt(29, c)
    intercept[IllegalArgumentException] { Png.decodeStats(4L, rgb) }
  }

  test("distributed decode equals per-doc local decode") {
    import org.apache.spark.sql.functions._
    val got = Png.pngDecode(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes(UTF_8))
    assert(got.size == docs.length)
    docs.foreach { case (id, data) =>
      val s = Png.decodeStats(id, Png.encode(data))
      assert(got(id) == ((s.width, s.height, s.n_px, s.sum_px, s.min_px, s.max_px)),
        s"doc $id decode mismatch")
    }
  }
}
