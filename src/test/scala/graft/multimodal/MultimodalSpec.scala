package graft.multimodal

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8

/** The PGM/BMP/WAV paths are the REAL codecs in the multimodal family —
  * these pin each encode→decode round trip byte-for-byte (ScalaCheck-style
  * property by hand over varied payload shapes) and the fail-loud contract
  * on malformed binaries. The oracle gate separately proves the distributed
  * queries.
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

  private def bmpStats(data: Array[Byte]): Multimodal.BmpStats =
    Multimodal.decodeBmpBatch(Iterator((7L, Multimodal.encodeBmp(data)))).next()

  test("BMP round trip recovers dimensions, channel sums, and padding layout") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,                       // empty doc → 1 all-zero row
      "a".getBytes(UTF_8),                        // single byte → B channel only
      ("x" * 93).getBytes(UTF_8),                 // exactly one pixel row
      ("y" * 94).getBytes(UTF_8),                 // one byte into row 2
      "héllo wörld — ümlauts".getBytes(UTF_8),    // multi-byte UTF-8
      Array.tabulate(257)(i => i.toByte),         // all byte values incl. >127
    )
    cases.foreach { data =>
      val s = bmpStats(data)
      val h = math.max(1, (data.length + 92) / 93)
      val unsigned = data.map(_ & 0xff)
      def chanSum(c: Int) = unsigned.zipWithIndex
        .collect { case (v, j) if j % 93 % 3 == c => v.toLong }.sum
      assert(s.width == 31 && s.height == h && s.n_px == 31L * h)
      assert((s.sum_b, s.sum_g, s.sum_r) == ((chanSum(0), chanSum(1), chanSum(2))))
      assert(s.max_px == (if (data.isEmpty) 0 else unsigned.max))
      // the encoded file really has padded rows: stride 96 ≠ 93 row bytes
      assert(Multimodal.encodeBmp(data).length == 54 + 96 * h)
    }
  }

  test("BMP decoder fails loudly on malformed payloads") {
    val good = Multimodal.encodeBmp("abcdef".getBytes(UTF_8))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmpBatch(Iterator((1L, badMagic))).next() }
    intercept[IllegalArgumentException] {       // truncated pixel array
      Multimodal.decodeBmpBatch(Iterator((2L, good.dropRight(4)))).next() }
    val bad8bpp = good.clone()                  // claims 8 bpp
    bad8bpp(28) = 8
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmpBatch(Iterator((3L, bad8bpp))).next() }
  }

  private def wavStats(data: Array[Byte]): Multimodal.WavStats =
    Multimodal.decodeWavBatch(Iterator((7L, Multimodal.encodeWav(data)))).next()

  test("WAV round trip recovers rate, framing, and integer energy") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,                       // no samples → 0 frames
      "a".getBytes(UTF_8),
      ("x" * 399).getBytes(UTF_8),                // one short of a frame
      ("y" * 400).getBytes(UTF_8),                // exactly one frame
      ("z" * 561).getBytes(UTF_8),                // 2 frames (400 + 160 + 1)
      Array.tabulate(257)(i => i.toByte),
    )
    cases.foreach { data =>
      val s = wavStats(data)
      val samples = data.map(b => ((b & 0xff) - 128) << 8)
      assert(s.sample_rate == 16000 && s.n_samples == data.length.toLong)
      assert(s.n_frames ==
        (if (data.length >= 400) (data.length - 400) / 160 + 1 else 0).toLong)
      assert(s.energy == samples.map(v => v.toLong * v).sum)
      assert(s.max_amp == (if (data.isEmpty) 0 else samples.map(math.abs).max))
    }
  }

  test("WAV decoder walks unknown chunks and fails loudly on malformed files") {
    val good = Multimodal.encodeWav("abc".getBytes(UTF_8))
    // splice an unknown chunk between fmt and data — a real RIFF layout;
    // the odd size 3 exercises the word-alignment rule (3 data + 1 pad).
    val junk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = good.take(36) ++ junk ++ good.drop(36)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)            // fix the RIFF size field
    val s = Multimodal.decodeWavBatch(Iterator((1L, spliced))).next()
    assert(s == wavStats("abc".getBytes(UTF_8)).copy(doc_id = 1L))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavBatch(Iterator((2L, badMagic))).next() }
    intercept[IllegalArgumentException] {       // truncated data chunk
      Multimodal.decodeWavBatch(Iterator((3L, good.dropRight(2)))).next() }
    intercept[IllegalArgumentException] {       // no data chunk at all
      Multimodal.decodeWavBatch(Iterator((4L, good.take(36)))).next() }
  }

  test("ADPCM decode matches a straight-line reference decoder incl. clamps and block resets") {
    // Reference: decode the nibble stream with the published recurrence in
    // the plainest possible loop, independent of the engine's chunk walk.
    def ref(data: Array[Byte]): (Int, Long, Long, Int, Int, Int) = {
      val nb = (data.length + 251) / 252
      var (pred, idx) = (0, 0)
      var (energy, mx, ns) = (0L, 0, 0L)
      for (j <- 0 until nb) {
        pred = 0; idx = 0; ns += 1 // header sample
        val blk = data.slice(j * 252, math.min((j + 1) * 252, data.length))
        for (b <- blk; code <- Seq(b & 0xf, (b & 0xff) >> 4)) {
          val step = Multimodal.imaStepTable(idx)
          var d = step >> 3
          if ((code & 4) != 0) d += step
          if ((code & 2) != 0) d += step >> 1
          if ((code & 1) != 0) d += step >> 2
          pred = math.max(-32768, math.min(32767, if ((code & 8) != 0) pred - d else pred + d))
          idx = math.max(0, math.min(88, idx + Multimodal.imaIndexTable(code)))
          energy += pred.toLong * pred; mx = math.max(mx, math.abs(pred)); ns += 1
        }
      }
      (nb, ns, energy, mx, pred, idx)
    }
    // 300 bytes crosses a block boundary; 0xFF codes drive the step table
    // to its ceiling (clamp coverage); 0x88 codes push the predictor down.
    val cases = Seq(
      "the quick brown fox".getBytes(UTF_8),
      Array.fill(300)(0xff.toByte),
      Array.fill(600)(0x88.toByte),
      Array.tabulate(505)(i => (i * 37).toByte))
    cases.foreach { data =>
      val s = Multimodal.decodeAdpcmBatch(
        Iterator((9L, Multimodal.encodeAdpcmWav(data)))).next()
      val (nb, ns, en, mx, lp, li) = ref(data)
      assert((s.n_blocks, s.n_samples, s.energy, s.max_amp, s.last_pred, s.last_idx)
        == ((nb, ns, en, mx, lp, li)), s"ADPCM mismatch for ${data.length} bytes")
    }
  }

  test("ADPCM decoder rejects foreign payloads loudly") {
    val good = Multimodal.encodeAdpcmWav("hello adpcm".getBytes(UTF_8))
    // a plain PCM16 WAV is NOT an ADPCM stream: fmt tag mismatch
    intercept[IllegalArgumentException] {
      Multimodal.decodeAdpcmBatch(
        Iterator((1L, Multimodal.encodeWav("hello".getBytes(UTF_8))))).next() }
    val badBits = good.clone()                  // claim 16-bit in fmt
    java.nio.ByteBuffer.wrap(badBits).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 16)
    intercept[IllegalArgumentException] {
      Multimodal.decodeAdpcmBatch(Iterator((2L, badBits))).next() }
    intercept[IllegalArgumentException] {       // truncated block header
      Multimodal.decodeAdpcmBatch(Iterator((3L, good.take(50)))).next() }
    val badIdx = good.clone()                   // step index out of range
    badIdx(48 + 2) = 99.toByte
    intercept[IllegalArgumentException] {
      Multimodal.decodeAdpcmBatch(Iterator((4L, badIdx))).next() }
  }

  test("mu-law decode hits the published G.711 code points and is stateless per byte") {
    // canonical G.711 extremes + zeros: code 0x00 → −32124, 0x80 → +32124,
    // 0xFF → 0, 0x7F → 0 (negative zero collapses)
    def pcm(b: Int): Int = {
      val u = (~b) & 0xff
      val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    assert(pcm(0x00) == -32124 && pcm(0x80) == 32124 &&
           pcm(0xff) == 0 && pcm(0x7f) == 0)
    val data = Array(0x00, 0x80, 0xff, 0x7f, 0x2a, 0xd5).map(_.toByte)
    val st = Multimodal.decodeUlawBatch(Iterator((7L,
      Multimodal.encodeUlawWav(data)))).next()
    val ref = data.map(b => pcm(b & 0xff))
    assert(st.n_samples == data.length)
    assert(st.energy == ref.map(s => s.toLong * s).sum)
    assert(st.max_amp == ref.map(math.abs).max)
    assert(st.sum_pcm == ref.map(_.toLong).sum)
    // statelessness: decoding the two halves separately sums to the whole
    val (a, b) = data.splitAt(3)
    val sa = Multimodal.decodeUlawBatch(Iterator((1L, Multimodal.encodeUlawWav(a)))).next()
    val sb = Multimodal.decodeUlawBatch(Iterator((2L, Multimodal.encodeUlawWav(b)))).next()
    assert(sa.energy + sb.energy == st.energy && sa.sum_pcm + sb.sum_pcm == st.sum_pcm)
  }

  test("mu-law decoder rejects foreign payloads loudly") {
    val pcm16 = Multimodal.encodeWav("hello".getBytes(UTF_8))
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeUlawBatch(Iterator((3L, pcm16))).next()
    }
    assert(e.getMessage.contains("not G.711 mu-law"))
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
