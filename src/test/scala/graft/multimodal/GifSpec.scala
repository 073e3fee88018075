package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Codec-level contracts for the GIF89a coder: LZW round trips (incl. the
  * KwKwK case, code-width growth to 12 bits, and the 4096 dictionary
  * reset), multi-frame structure with per-frame GCE delays, the local
  * color table path, and fail-loud rejection of malformed payloads.
  */
class GifSpec extends AnyFunSuite {

  private def stats(bytes: Array[Byte], f: Int): (Long, Int, Int) = {
    val fr = Array.tabulate(128) { k =>
      val p = 128 * f + k
      if (p < bytes.length) bytes(p) & 0xff else 0
    }
    (fr.map(_.toLong).sum, fr.min, fr.max)
  }

  private def roundTrip(payload: Array[Byte]): Unit = {
    val frames = Gif.decodeFrames(7L, Gif.encode(payload))
    val nf = math.max(1, (payload.length + 127) / 128)
    assert(frames.length == nf)
    frames.zipWithIndex.foreach { case (fr, i) =>
      val (s, mn, mx) = stats(payload, i)
      assert(fr.frame_idx == i && fr.delay_cs == 4 + i && fr.n_px == 128L)
      assert(fr.sum_px == s && fr.min_px == mn && fr.max_px == mx,
        s"frame $i: got (${fr.sum_px},${fr.min_px},${fr.max_px}) want ($s,$mn,$mx)")
    }
  }

  test("LZW round trip: raw symbol streams survive encode/decode") {
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](5),
      Array.fill[Byte](300)(9),                        // KwKwK chains
      Array.tabulate[Byte](1000)(i => (i % 7).toByte), // short period
      Array.tabulate[Byte](9000)(i => (i * 31 + (i >> 3) * 17 + 7).toByte),
      // 30 000 high-entropy bytes: >> 3838 emitted phrases, so the 4096
      // dictionary reset is GUARANTEED to fire (not just likely).
      Array.tabulate[Byte](30000)(i => (i * 197 + (i >> 2) * 89 + (i >> 7)).toByte))
    cases.foreach { in =>
      val got = Gif.lzwDecode(1L, Gif.lzwEncode(in), in.length)
      assert(java.util.Arrays.equals(got, in), s"LZW drift at n=${in.length}")
    }
  }

  test("LZW round trip holds on arbitrary byte arrays (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.chooseNum(0, 5000).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val prop = Prop.forAll(gen) { in =>
      java.util.Arrays.equals(Gif.lzwDecode(1L, Gif.lzwEncode(in), in.length), in)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("multi-frame GIF round trip with per-frame delays and stats") {
    roundTrip(Array.tabulate[Byte](300)(i => (i * 13 + 5).toByte)) // 3 frames
    roundTrip("snowé世界 pad pad pad".getBytes("UTF-8")) // 1 frame, multi-byte UTF-8
    roundTrip(Array.emptyByteArray)                                 // min 1 zero frame
    roundTrip(Array.fill[Byte](256)(0))                             // exactly 2 full frames
  }

  test("a payload large enough to force 12-bit codes and a dictionary reset decodes exactly") {
    roundTrip(Array.tabulate[Byte](40 * 128)(i => (i * 131 + (i >> 2) * 31).toByte))
  }

  test("local color table drives the palette lookup") {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](2, 0, 2, 0)) // screen 2x2
    out.write(0); out.write(0); out.write(0) // NO global table
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 2, 0, 2, 0)) // frame 2x2
    out.write(0x80) // local table, 2 entries, not interlaced
    out.write(Array[Byte](10, 0, 0, 200.toByte, 0, 0)) // palette R = 10, 200
    out.write(8) // min code size
    val z = Gif.lzwEncode(Array[Byte](0, 1, 1, 0))
    out.write(z.length); out.write(z); out.write(0)
    out.write(0x3b)
    val fr = Gif.decodeFrames(3L, out.toByteArray)
    assert(fr.length == 1)
    assert(fr.head.n_px == 4 && fr.head.sum_px == 420L
      && fr.head.min_px == 10 && fr.head.max_px == 200)
  }

  test("encode rejects payloads whose frame count would wrap the 16-bit GCE delay") {
    // 65531 frames is the last unwrapped delay (4 + 65531 = 65535); one more
    // frame must fail loudly rather than silently wrap vs the oracle.
    intercept[IllegalArgumentException](Gif.encode(new Array[Byte](65532 * 128)))
  }

  test("a frame without its own GCE gets delay 0, not the previous frame's") {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](2, 0, 1, 0)) // screen 2x1
    out.write(0xf0); out.write(0); out.write(0) // global table, 2 entries
    out.write(Array[Byte](0, 0, 0, 50, 50, 50)) // palette R = 0, 50
    def frame(withGce: Boolean, delay: Int): Unit = {
      if (withGce) {
        out.write(0x21); out.write(0xf9); out.write(4); out.write(0)
        out.write(delay & 0xff); out.write(delay >> 8); out.write(0); out.write(0)
      }
      out.write(0x2c)
      out.write(Array[Byte](0, 0, 0, 0, 2, 0, 1, 0)) // frame 2x1
      out.write(0) // no local table
      out.write(8)
      val z = Gif.lzwEncode(Array[Byte](0, 1))
      out.write(z.length); out.write(z); out.write(0)
    }
    frame(withGce = true, delay = 77)
    frame(withGce = false, delay = 0) // per GIF89a: GCE applies to ONE block
    out.write(0x3b)
    val fr = Gif.decodeFrames(4L, out.toByteArray)
    assert(fr.map(_.delay_cs) == Seq(77, 0))
  }

  test("malformed payloads are rejected loudly") {
    val good = Gif.encode(Array.tabulate[Byte](200)(_.toByte))
    def fails(p: Array[Byte]): Unit =
      intercept[IllegalArgumentException](Gif.decodeFrames(9L, p))
    fails("NOTGIF??".getBytes("US-ASCII") ++ good.drop(8))  // bad magic
    fails(good.dropRight(10))                               // truncation
    val interlaced = good.clone()
    interlaced(6 + 7 + 768 + 8 + 9) = 0x40.toByte           // descriptor packed byte
    fails(interlaced)                                       // interlacing unsupported
    fails(good.dropRight(1))                                // missing trailer
    val noPalette = good.clone()
    noPalette(10) = 0x77                                    // GCT flag off -> palette
    intercept[Exception](Gif.decodeFrames(9L, noPalette))   // bytes parse as garbage
  }
}
