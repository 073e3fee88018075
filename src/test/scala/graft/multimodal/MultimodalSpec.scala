package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8

/** The PGM path is the one REAL codec in the multimodal family — these pin
  * the encode→decode round trip byte-for-byte (ScalaCheck-style property by
  * hand over varied payload shapes) and the fail-loud contract on malformed
  * binaries. The oracle gate separately proves the distributed query.
  */
class MultimodalSpec extends SparkSpec {

  private def stats(data: Array[Byte]): Multimodal.PgmStats =
    Multimodal.decodePgmBatch(Iterator((7L, Multimodal.encodePgm(data)))).next()

  test("PGM round trip recovers dimensions and exact pixel statistics") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,                       // empty doc → 1 all-pad row
      "a".getBytes(UTF_8),                        // single byte
      ("x" * 32).getBytes(UTF_8),                 // exactly one row, no pad
      ("y" * 33).getBytes(UTF_8),                 // one byte into row 2
      "héllo wörld — ümlauts".getBytes(UTF_8),    // multi-byte UTF-8
      Array.tabulate(257)(i => i.toByte),         // all byte values incl. >127
    )
    cases.foreach { data =>
      val s = stats(data)
      val w = 32
      val h = math.max(1, (data.length + w - 1) / w)
      val unsigned = data.map(_ & 0xff)
      val nPad = w * h - data.length
      assert(s.width == w && s.height == h && s.n_px == w.toLong * h)
      assert(s.sum_px == unsigned.map(_.toLong).sum)
      assert(s.min_px == (if (nPad > 0) 0 else unsigned.min))
      assert(s.max_px == (if (data.isEmpty) 0 else unsigned.max))
    }
  }

  test("PGM decoder fails loudly on malformed payloads") {
    val good = Multimodal.encodePgm("abc".getBytes(UTF_8))
    // wrong magic
    val badMagic = good.clone(); badMagic(1) = '6'
    intercept[IllegalArgumentException] {
      Multimodal.decodePgmBatch(Iterator((1L, badMagic))).next() }
    // truncated pixel payload
    intercept[IllegalArgumentException] {
      Multimodal.decodePgmBatch(Iterator((2L, good.dropRight(1)))).next() }
    // header claims a maxval the decoder does not support
    val bad16 = "P5\n2 1\n65535\n..".getBytes(UTF_8)
    intercept[IllegalArgumentException] {
      Multimodal.decodePgmBatch(Iterator((3L, bad16))).next() }
  }

  test("distributed decode equals per-doc local decode") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.pgmDecode(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes(UTF_8))
    assert(got.size == docs.length)
    docs.foreach { case (id, data) =>
      val s = stats(data)
      assert(got(id) == ((s.width, s.height, s.n_px, s.sum_px, s.min_px, s.max_px)),
        s"doc $id decode mismatch")
    }
  }
}
