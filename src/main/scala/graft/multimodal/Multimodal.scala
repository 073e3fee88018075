package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batches per partition.
  *
  * The Spark-side plumbing is real and at-scale shaped: binary columns
  * travel in Parquet pages, decode runs as a typed `mapPartitions` (one
  * decoder init per partition, batch-at-a-time — the Scala analog of a
  * batched pandas-UDF pipeline), and the output is a columnar feature
  * schema. Three REAL dependency-free codecs prove the decode path end to
  * end — PGM (q161), 24-bit BMP with row padding and bottom-up rows
  * (q167), and RIFF/WAV PCM16 with a generic chunk walk (q168) — while the
  * generic `decodeBatch` used by q54/q72/q73 remains a deterministic STUB
  * (checksum-seeded dimensions): lossy codecs like JPEG/MP3 aren't in this
  * container. Swap `decodeBatch`'s body for one and nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(mime: String, n_bytes: Long)
  final case class MediaRow(doc_id: Long, media_type: String,
                            payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                                 width: Int, height: Int)

  /** Media table synthesized from `documents` (the testdata carries no real
    * binaries): payload = UTF-8 bytes of text, mime derived from source.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        MediaRow(r.getAs[Long]("doc_id"), "text",
                 payload, MediaMeta("text/plain", payload.length.toLong))
      }
  }

  /** STUB decoder (see object doc): deterministic fake features from bytes.
    * Runs once per batch iterator — per-partition init cost is amortized
    * exactly like a real codec handle would be.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val cs = r.payload.foldLeft(0L)((h, b) => (h * 31 + (b & 0xffL)) % 1000000007L)
      MediaFeatures(r.doc_id, r.payload.length, cs,
                    1 + (cs % 640).toInt, 1 + (cs % 480).toInt)
    }

  /** Feature extraction over the media table — the registered query. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(decodeBatch)
      .toDF()
      .orderBy("doc_id")
  }

  /** Resize planning: aspect-preserving fit into a 224×224 box, computed as
    * pure integer arithmetic over the decoded dimensions (engine-exact; a
    * real pipeline would hand (new_w, new_h) to the codec's scaler). Runs as
    * codegen'd column expressions on the feature schema — after decode,
    * multimodal work IS relational work.
    */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(decodeBatch)
      .toDF()
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        expr("CAST(width * 224 DIV long_side AS INT)").as("new_w"),
        expr("CAST(height * 224 DIV long_side AS INT)").as("new_h"))
      .orderBy("doc_id")
  }

  /** Frame sampling for video-shaped media: the payload "is" a clip with a
    * deterministic synthetic frame count; emit every k-th frame index so
    * each clip yields ≤ 8 frames — the 1→N generator (explode) shape a real
    * frame sampler has, with the decode stub standing in for the codec.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(decodeBatch)
      .toDF()
      .withColumn("n_frames", (col("checksum") % 300 + 1).cast("int"))
      // ceil(n/8): floor would emit up to 15 frames for n in [9, 15],
      // breaking the ≤ 8 bound that is the point of the sampler.
      .withColumn("step", greatest(expr("CAST((n_frames + 7) DIV 8 AS INT)"), lit(1)))
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, step)")).as("frame_idx"))
      .select("doc_id", "frame_idx", "n_frames")
      .orderBy("doc_id", "frame_idx")
  }

  /** Audio framing plan — the fbank/MFCC windowing a speech pipeline runs
    * before feature extraction: 16 kHz PCM, 400-sample (25 ms) windows,
    * 160-sample (10 ms) hop; n_frames = (n − 400) div 160 + 1. The stub
    * codec "decodes" each payload byte to 64 PCM samples (real decoders
    * aren't in this container — same contract as `decodeBatch`: swap the
    * expansion for a real codec and the framing math is unchanged).
    * Integer arithmetic end-to-end; map-only at scale.
    */
  def audioFrames(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"), expr("meta.n_bytes * 64").as("n_samples"))
      .withColumn("n_frames",
        when(col("n_samples") >= 400, expr("(n_samples - 400) div 160 + 1"))
          .otherwise(lit(0L)))
      .withColumn("duration_ms", expr("n_samples div 16"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q161
  // One REAL codec, zero dependencies: PGM (P5) — the binary grayscale
  // image format whose whole spec is "P5\n<w> <h>\n<maxval>\n" + w·h raw
  // pixel bytes. Unlike the stubbed JPEG/audio paths (whose codecs aren't
  // in this container), this path synthesizes GENUINE binary images and
  // parses them back byte-for-byte, proving the engine's binary-column
  // plumbing end-to-end: encode → parquet-able binary payload →
  // mapPartitions decode (header parse + pixel scan) → columnar stats.
  // Pixels are the document's UTF-8 bytes padded with zeros to w·h, so the
  // DuckDB oracle can re-derive every statistic from hex(encode(text)) —
  // the decode is REAL on the Spark side and replayable on the oracle side.

  final case class PgmStats(doc_id: Long, width: Int, height: Int,
                            n_px: Long, sum_px: Long, min_px: Int, max_px: Int)

  private val pgmWidth = 32

  /** data → a well-formed P5 image: 32 px wide, height = ceil(n/32) (min 1
    * row so every doc is a valid image), zero-padded to exactly w·h pixels.
    */
  def encodePgm(data: Array[Byte]): Array[Byte] = {
    val w = pgmWidth
    val h = math.max(1, (data.length + w - 1) / w)
    val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(data, 0, out, header.length, data.length)
    out
  }

  /** A real binary parser, batch-at-a-time like `decodeBatch`: validates
    * the magic, reads the ASCII header, then computes integer pixel stats
    * (sum/min/max over UNSIGNED byte values) in one scan. Throws on a
    * malformed payload — a codec must fail loudly, not emit garbage rows.
    */
  def decodePgmBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[PgmStats] =
    rows.map { case (id, p) =>
      require(p.length >= 2 && p(0) == 'P' && p(1) == '5', s"doc $id: not a P5 PGM")
      var i = 2
      def skipWs(): Unit = { while (i < p.length && p(i).toChar.isWhitespace) i += 1 }
      def readInt(): Int = {
        skipWs(); var v = 0
        require(i < p.length && p(i) >= '0' && p(i) <= '9', s"doc $id: bad PGM header")
        while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
        v
      }
      val (w, h, maxval) = (readInt(), readInt(), readInt())
      require(maxval == 255, s"doc $id: unsupported maxval $maxval")
      i += 1 // the single whitespace byte after maxval, per spec
      require(p.length - i == w * h, s"doc $id: pixel payload ${p.length - i} != ${w * h}")
      var (sum, mn, mx) = (0L, 255, 0)
      while (i < p.length) {
        val v = p(i) & 0xff
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        i += 1
      }
      PgmStats(id, w, h, w.toLong * h, sum, mn, mx)
    }

  /** The registered query: documents → real PGM binaries → parsed stats. */
  def pgmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encodePgm(data)) }
      .mapPartitions(decodePgmBatch)
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q167
  // Second real image codec: 24-bit uncompressed BMP — unlike PGM it has
  // the two classic binary-format traps a real decoder must handle: rows
  // are padded to 4-byte boundaries (width 31 → 93 pixel bytes + 3 pad
  // bytes per row) and stored BOTTOM-UP. The encoder synthesizes genuine
  // BITMAPFILEHEADER+BITMAPINFOHEADER files from document bytes; the
  // decoder validates both headers and walks rows by stride, skipping the
  // padding. Per-channel sums are position-independent, so the DuckDB
  // oracle replays them from hex(encode(text)) by byte offset → channel
  // arithmetic without modeling the bottom-up row order.

  final case class BmpStats(doc_id: Long, width: Int, height: Int, n_px: Long,
                            sum_b: Long, sum_g: Long, sum_r: Long, max_px: Int)

  private val bmpWidth = 31          // odd width → real row padding (93 → 96)
  private val bmpRowBytes = bmpWidth * 3
  private val bmpStride = (bmpRowBytes + 3) & ~3

  /** data → a well-formed 24-bit bottom-up BMP: 31 px wide, height =
    * ceil(n/93) (min 1), payload bytes filling the BGR pixel area
    * sequentially (padding bytes stay zero, like the PGM zero-pad).
    */
  def encodeBmp(data: Array[Byte]): Array[Byte] = {
    val h = math.max(1, (data.length + bmpRowBytes - 1) / bmpRowBytes)
    val out = new Array[Byte](54 + bmpStride * h)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(out.length).putShort(0).putShort(0)
      .putInt(54)                                     // bfOffBits
      .putInt(40).putInt(bmpWidth).putInt(h)          // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0)             // planes, bpp, BI_RGB
      .putInt(bmpStride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < data.length) {
      out(54 + (j / bmpRowBytes) * bmpStride + j % bmpRowBytes) = data(j)
      j += 1
    }
    out
  }

  /** Real BMP parser: validates magic, header sizes, 24 bpp, BI_RGB; scans
    * the pixel grid bottom-up by stride (skipping row padding) for integer
    * channel sums and the max channel byte. Throws on malformed payloads.
    */
  def decodeBmpBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[BmpStats] =
    rows.map { case (id, p) =>
      require(p.length >= 54 && p(0) == 'B' && p(1) == 'M', s"doc $id: not a BMP")
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val off = bb.getInt(10)
      require(bb.getInt(14) == 40, s"doc $id: unsupported DIB header")
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      require(w > 0 && h > 0, s"doc $id: top-down or empty BMP unsupported")
      require(bb.getShort(28) == 24, s"doc $id: not 24 bpp")
      require(bb.getInt(30) == 0, s"doc $id: compressed BMP unsupported")
      val stride = (w * 3 + 3) & ~3
      require(p.length >= off + stride * h, s"doc $id: truncated pixel array")
      var (sb, sg, sr) = (0L, 0L, 0L)
      var mx = 0
      var row = h - 1                  // bottom-up: last stored row is row 0
      while (row >= 0) {
        val base = off + row * stride
        var c = 0
        while (c < w) {
          val b = p(base + 3 * c) & 0xff
          val g = p(base + 3 * c + 1) & 0xff
          val r = p(base + 3 * c + 2) & 0xff
          sb += b; sg += g; sr += r
          val m = math.max(b, math.max(g, r)); if (m > mx) mx = m
          c += 1
        }
        row -= 1
      }
      BmpStats(id, w, h, w.toLong * h, sb, sg, sr, mx)
    }

  /** The registered query: documents → real BMP binaries → parsed stats. */
  def bmpDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encodeBmp(data)) }
      .mapPartitions(decodeBmpBatch)
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q168
  // Real audio codec: WAV (RIFF) — header + chunk walk, not the q134 stub.
  // The encoder synthesizes genuine PCM16 mono 16 kHz files (sample k =
  // (byte_k − 128) · 256, a real 8-bit→16-bit companding shape); the
  // decoder walks the RIFF chunk list generically (fmt validation, unknown
  // chunks skipped with the spec's word-alignment rule) and computes
  // integer-exact energy/amplitude plus the 25 ms/10 ms framing of q134.

  final case class WavStats(doc_id: Long, sample_rate: Int, n_samples: Long,
                            n_frames: Long, energy: Long, max_amp: Int)

  /** data → a canonical 44-byte-header RIFF/WAVE file, PCM16 mono 16 kHz,
    * one sample per payload byte.
    */
  def encodeWav(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val out = new Array[Byte](44 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1)                        // PCM, mono
      .putInt(16000).putInt(16000 * 2).putShort(2).putShort(16)
      .put("data".getBytes).putInt(2 * n)
    var k = 0
    while (k < n) {
      bb.putShort((((data(k) & 0xff) - 128) << 8).toShort)
      k += 1
    }
    out
  }

  /** Real RIFF parser: validates RIFF/WAVE, walks the chunk list (word-
    * aligned, per spec), requires a PCM16-mono fmt chunk before data, and
    * computes integer stats over the samples: energy = Σ s², max_amp =
    * max |s|, n_frames = 400-sample windows at 160-sample hop (q134's
    * framing, now over REAL decoded samples). Throws on malformed payloads.
    */
  def decodeWavBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[WavStats] =
    rows.map { case (id, p) =>
      require(p.length >= 12 && new String(p, 0, 4) == "RIFF" &&
        new String(p, 8, 4) == "WAVE", s"doc $id: not a RIFF/WAVE file")
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      var rate = -1
      var stats: WavStats = null
      while (i + 8 <= p.length && stats == null) {
        val cid = new String(p, i, 4)
        val sz = bb.getInt(i + 4)
        require(sz >= 0 && i + 8 + sz <= p.length, s"doc $id: truncated chunk $cid")
        cid match {
          case "fmt " =>
            require(sz >= 16, s"doc $id: short fmt chunk")
            require(bb.getShort(i + 8) == 1, s"doc $id: not PCM")
            require(bb.getShort(i + 10) == 1, s"doc $id: not mono")
            require(bb.getShort(i + 22) == 16, s"doc $id: not 16-bit")
            rate = bb.getInt(i + 12)
          case "data" =>
            require(rate > 0, s"doc $id: data chunk before fmt")
            require(sz % 2 == 0, s"doc $id: odd PCM16 data size")
            val n = sz / 2
            var (energy, mx) = (0L, 0)
            var k = 0
            while (k < n) {
              val s = bb.getShort(i + 8 + 2 * k).toInt
              energy += s.toLong * s
              val a = math.abs(s); if (a > mx) mx = a
              k += 1
            }
            val frames = if (n >= 400) (n - 400) / 160 + 1 else 0
            stats = WavStats(id, rate, n.toLong, frames.toLong, energy, mx)
          case _ => ()                 // unknown chunk: skip
        }
        i += 8 + sz + (sz & 1)         // chunks are word-aligned
      }
      require(stats != null, s"doc $id: no data chunk")
      stats
    }

  /** The registered query: documents → real WAV binaries → parsed stats. */
  def wavDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encodeWav(data)) }
      .mapPartitions(decodeWavBatch)
      .toDF()
      .orderBy("doc_id")
  }

  // ---- q206: G.711 µ-law — the COMPANDED member of the audio family
  // (PCM16 q168, block-stateful ADPCM q194, stateless-companded µ-law
  // here). Each payload byte IS one µ-law code; decode is the CCITT
  // G.711 / Sun ulaw2linear formula: with u = ~b & 0xff,
  //   t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
  //   pcm = if (u & 0x80) 0x84 - t else t - 0x84   (range ±32124)
  // Integer-exact and PER-BYTE STATELESS — unlike q194's per-block
  // predictor, ANY byte split decodes independently: the most splittable
  // codec in the family (telephony pipelines shard µ-law streams at
  // arbitrary offsets for exactly this reason). The oracle replays the
  // formula per byte with DuckDB bitwise ops — no recurrence needed.

  final case class UlawStats(doc_id: Long, n_samples: Long, energy: Long,
                             max_amp: Int, sum_pcm: Long)

  /** data → RIFF/WAVE, wFormatTag 0x07 (µ-law), mono 8 kHz, 8-bit; spec
    * requires the extended 18-byte fmt chunk (cbSize = 0) for non-PCM tags.
    */
  def encodeUlawWav(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val out = new Array[Byte](46 + n)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(38 + n).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(18)
      .putShort(0x07).putShort(1)                     // µ-law, mono
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .putShort(0)                                    // cbSize
      .put("data".getBytes).putInt(n)
    bb.put(data)
    out
  }

  /** RIFF walk (q168's chunk rules) + the per-byte µ-law expansion.
    * Rejects non-µ-law fmt tags and bad widths loudly — the
    * foreign-payload convention of the codec family.
    */
  def decodeUlawBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[UlawStats] =
    rows.map { case (id, p) =>
      require(p.length >= 12 && new String(p, 0, 4) == "RIFF" &&
        new String(p, 8, 4) == "WAVE", s"doc $id: not a RIFF/WAVE file")
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      var haveFmt = false
      var stats: UlawStats = null
      while (i + 8 <= p.length && stats == null) {
        val cid = new String(p, i, 4)
        val sz = bb.getInt(i + 4)
        require(sz >= 0 && i + 8 + sz <= p.length, s"doc $id: truncated chunk $cid")
        cid match {
          case "fmt " =>
            require(sz >= 16, s"doc $id: short fmt chunk")
            require(bb.getShort(i + 8) == 0x07, s"doc $id: not G.711 mu-law")
            require(bb.getShort(i + 10) == 1, s"doc $id: not mono")
            require(bb.getShort(i + 22) == 8, s"doc $id: not 8-bit mu-law")
            haveFmt = true
          case "data" =>
            require(haveFmt, s"doc $id: data chunk before fmt")
            var (energy, sumPcm) = (0L, 0L)
            var mx = 0
            var k = 0
            while (k < sz) {
              val u = (~p(i + 8 + k)) & 0xff
              val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
              val s = if ((u & 0x80) != 0) 0x84 - t else t - 0x84
              energy += s.toLong * s
              sumPcm += s
              val a = math.abs(s); if (a > mx) mx = a
              k += 1
            }
            stats = UlawStats(id, sz.toLong, energy, mx, sumPcm)
          case _ => ()
        }
        i += 8 + sz + (sz & 1)
      }
      require(stats != null, s"doc $id: no data chunk")
      stats
    }

  /** The registered query: documents → µ-law WAV binaries → parsed stats. */
  def ulawDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encodeUlawWav(data)) }
      .mapPartitions(decodeUlawBatch)
      .toDF()
      .orderBy("doc_id")
  }

  // ---- q194: IMA ADPCM (DVI4) — the COMPRESSED member of the audio
  // codec family (q168 decodes plain PCM16). The decoder is the published
  // integer predictor recurrence (IMA "Recommended Practices", 1992; RFC
  // 3551 DVI4): per 4-bit code, delta = step/8 (+step if bit2, +step/2 if
  // bit1, +step/4 if bit0), predictor ± delta clamped to int16, step index
  // walked through the 89-entry table. Every operation is integer-exact,
  // so the DuckDB oracle replays the full recurrence per block with a
  // list_reduce whose accumulator is a [pred, idx, energy, max_amp]
  // BIGINT list — stateful codec decode proven end-to-end, not spot-
  // checked. Blocks reset state (4-byte header: initial predictor int16 +
  // step index), which is exactly what makes the format splittable — at
  // 100 TB each worker decodes its own blocks with no cross-row state.

  private[multimodal] val imaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
  private[multimodal] val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Bytes per ADPCM block: 4-byte state header + 252 code bytes. */
  private val adpcmBlockData = 252

  final case class AdpcmStats(doc_id: Long, n_blocks: Int, n_samples: Long,
                              energy: Long, max_amp: Int,
                              last_pred: Int, last_idx: Int)

  /** data → RIFF/WAVE, wFormatTag 0x11 (IMA ADPCM), mono 8 kHz: payload
    * bytes become the 4-bit code stream (two codes per byte, low nibble
    * first per spec), packed into 256-byte blocks whose headers carry
    * initial predictor 0 / step index 0. The last block may be short.
    */
  def encodeAdpcmWav(data: Array[Byte]): Array[Byte] = {
    val nBlocks = (data.length + adpcmBlockData - 1) / adpcmBlockData
    val dataSz = data.length + 4 * nBlocks
    // layout: 12 RIFF/WAVE + (8 + 20) fmt + (8 + dataSz) data
    val out = new Array[Byte](48 + dataSz)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(40 + dataSz).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(20)
      .putShort(0x11).putShort(1)                     // IMA ADPCM, mono
      .putInt(8000).putInt(4055)                      // avg bytes/sec (informative)
      .putShort((adpcmBlockData + 4).toShort).putShort(4) // block align, 4-bit
      .putShort(2).putShort((1 + 2 * adpcmBlockData).toShort) // cbSize, samples/block
      .put("data".getBytes).putInt(dataSz)
    var j = 0
    while (j < nBlocks) {
      bb.putShort(0).put(0.toByte).put(0.toByte)      // pred = 0, idx = 0
      val from = j * adpcmBlockData
      val len = math.min(adpcmBlockData, data.length - from)
      bb.put(data, from, len)
      j += 1
    }
    out
  }

  /** RIFF walk (same chunk rules as q168) + the IMA predictor recurrence.
    * Rejects non-ADPCM fmt tags, bad bit width, and truncated block
    * headers loudly — the foreign-payload convention of the codec family.
    */
  def decodeAdpcmBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[AdpcmStats] =
    rows.map { case (id, p) =>
      require(p.length >= 12 && new String(p, 0, 4) == "RIFF" &&
        new String(p, 8, 4) == "WAVE", s"doc $id: not a RIFF/WAVE file")
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 12
      var haveFmt = false
      var stats: AdpcmStats = null
      while (i + 8 <= p.length && stats == null) {
        val cid = new String(p, i, 4)
        val sz = bb.getInt(i + 4)
        require(sz >= 0 && i + 8 + sz <= p.length, s"doc $id: truncated chunk $cid")
        cid match {
          case "fmt " =>
            require(sz >= 16, s"doc $id: short fmt chunk")
            require(bb.getShort(i + 8) == 0x11, s"doc $id: not IMA ADPCM")
            require(bb.getShort(i + 10) == 1, s"doc $id: not mono")
            require(bb.getShort(i + 22) == 4, s"doc $id: not 4-bit ADPCM")
            haveFmt = true
          case "data" =>
            require(haveFmt, s"doc $id: data chunk before fmt")
            var off = i + 8
            val end = i + 8 + sz
            var (nBlocks, nSamples, energy, mx) = (0, 0L, 0L, 0)
            var (pred, idx) = (0, 0)
            while (off < end) {
              require(end - off > 4, s"doc $id: truncated ADPCM block header")
              pred = bb.getShort(off).toInt
              idx = bb.get(off + 2) & 0xff
              require(idx <= 88, s"doc $id: step index out of range")
              nBlocks += 1
              nSamples += 1                       // header emits sample 0
              energy += pred.toLong * pred
              if (math.abs(pred) > mx) mx = math.abs(pred)
              val dataLen = math.min(adpcmBlockData, end - off - 4)
              var k = 0
              while (k < 2 * dataLen) {
                val b = p(off + 4 + (k >> 1)) & 0xff
                val code = if ((k & 1) == 0) b & 0xf else b >> 4
                val step = imaStepTable(idx)
                var delta = step >> 3
                if ((code & 4) != 0) delta += step
                if ((code & 2) != 0) delta += step >> 1
                if ((code & 1) != 0) delta += step >> 2
                pred = if ((code & 8) != 0) pred - delta else pred + delta
                if (pred > 32767) pred = 32767
                if (pred < -32768) pred = -32768
                idx += imaIndexTable(code)
                if (idx < 0) idx = 0; if (idx > 88) idx = 88
                energy += pred.toLong * pred
                if (math.abs(pred) > mx) mx = math.abs(pred)
                k += 1
              }
              nSamples += 2L * dataLen
              off += 4 + dataLen
            }
            require(nBlocks > 0, s"doc $id: empty ADPCM data chunk")
            stats = AdpcmStats(id, nBlocks, nSamples, energy, mx, pred, idx)
          case _ => ()
        }
        i += 8 + sz + (sz & 1)
      }
      require(stats != null, s"doc $id: no data chunk")
      stats
    }

  /** The registered query: documents → real IMA-ADPCM WAV binaries →
    * full predictor-recurrence decode stats.
    */
  def adpcmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, data) => (id, encodeAdpcmWav(data)) }
      .mapPartitions(decodeAdpcmBatch)
      .toDF()
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_adpcm_decode"       -> adpcmDecode _,
    "q206_ulaw_decode"        -> ulawDecode _,
    "q134_multimodal_audio"   -> audioFrames _,
    "q54_multimodal_features" -> features _,
    "q72_multimodal_resize"   -> resizePlan _,
    "q73_multimodal_frames"   -> frameSample _,
    "q161_pgm_decode"         -> pgmDecode _,
    "q167_bmp_decode"         -> bmpDecode _,
    "q168_wav_decode"         -> wavDecode _,
    "q170_jpeg_decode"        -> (Jpeg.jpegDecode _),
    "q171_png_decode"         -> (Png.pngDecode _),
    "q174_gif_frames"         -> (Gif.gifDecode _),
  )

  // The stub decode is closed-form over the bytes (ASCII corpus → byte value
  // = ascii code), so DuckDB can replay it exactly.
  private val checksumCte =
    """WITH f AS (
      |  SELECT doc_id,
      |         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                list_transform(string_split(text, ''),
      |                               c -> CAST(ascii(c) AS BIGINT))),
      |                (h, c) -> (h * 31 + c) % 1000000007) AS BIGINT) AS checksum
      |  FROM documents)""".stripMargin

  // Byte-replay CTE shared by the q167/q168 oracles: byte k (1-based) of
  // the UTF-8 payload from two hex digits, as in the q161 replay.
  private val bytesCte =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
      |                  octet_length(encode(text)) AS n
      |           FROM documents),
      |px AS (SELECT doc_id, n,
      |         list_transform(range(1, n + 1), k ->
      |           CAST(strpos('0123456789ABCDEF', substr(hx, 2*k - 1, 1)) - 1 AS BIGINT) * 16
      |           + (strpos('0123456789ABCDEF', substr(hx, 2*k, 1)) - 1)) AS bytes
      |       FROM b)""".stripMargin

  /** q194 oracle: the full IMA predictor recurrence replayed per block as
    * a DuckDB list_reduce whose accumulator is a [pred, idx, energy,
    * max_amp] BIGINT list (codes ride as 1-element lists so the fold stays
    * type-homogeneous); the step/index tables join in as list literals so
    * the lambda references them by name. Replays from the raw payload
    * bytes — if the engine's RIFF walk or block framing were wrong, the
    * stats could not match.
    */
  private val adpcmOracle: String = {
    val step = "st[a[2] + 1]"
    val delta = s"(($step) // 8) " +
      s"+ (CASE WHEN (x[1] // 4) % 2 = 1 THEN $step ELSE 0 END) " +
      s"+ (CASE WHEN (x[1] // 2) % 2 = 1 THEN ($step) // 2 ELSE 0 END) " +
      s"+ (CASE WHEN x[1] % 2 = 1 THEN ($step) // 4 ELSE 0 END)"
    val newPred = s"least(greatest(CASE WHEN x[1] // 8 = 1 " +
      s"THEN a[1] - ($delta) ELSE a[1] + ($delta) END, -32768), 32767)"
    val newIdx = "least(greatest(a[2] + it[x[1] + 1], 0), 88)"
    val bd = adpcmBlockData
    bytesCte +
      s""",
         |tabs AS (SELECT ${imaStepTable.mkString("[", ", ", "]")} AS st,
         |                ${imaIndexTable.mkString("[", ", ", "]")} AS it),
         |rr AS (SELECT doc_id, n, (n + ${bd - 1}) // $bd AS nb,
         |         list_transform(range(0, (n + ${bd - 1}) // $bd), j ->
         |           list_reduce(
         |             list_prepend([CAST(0 AS BIGINT), 0, 0, 0],
         |               list_transform(
         |                 flatten(list_transform(
         |                   list_slice(bytes, j*$bd + 1, least((j+1)*$bd, n)),
         |                   v -> [v % 16, v // 16])),
         |                 c -> [c])),
         |             (a, x) -> [$newPred, $newIdx,
         |                        a[3] + ($newPred) * ($newPred),
         |                        greatest(a[4], abs($newPred))])) AS rs
         |       FROM px, tabs)
         |SELECT doc_id, CAST(nb AS INT) AS n_blocks,
         |       CAST(nb + 2 * n AS BIGINT) AS n_samples,
         |       CAST(list_sum(list_transform(rs, r -> r[3])) AS BIGINT) AS energy,
         |       CAST(list_max(list_transform(rs, r -> r[4])) AS INT) AS max_amp,
         |       CAST(rs[nb][1] AS INT) AS last_pred,
         |       CAST(rs[nb][2] AS INT) AS last_idx
         |FROM rr ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q194_adpcm_decode" -> adpcmOracle,
    "q170_jpeg_decode" -> Jpeg.oracle,
    "q171_png_decode" -> Png.oracle,
    "q174_gif_frames" -> Gif.oracle,
    // BMP replay: channel of payload byte j (0-based) is (j mod 93) mod 3
    // (B,G,R); padding and fill pixels are zero, so channel sums are over
    // the real bytes only and max is never below 0.
    "q167_bmp_decode" -> (bytesCte +
      """
        |SELECT doc_id, 31 AS width,
        |       CAST(greatest(1, CAST(ceil(n / 93.0) AS BIGINT)) AS INT) AS height,
        |       CAST(31 * greatest(1, CAST(ceil(n / 93.0) AS BIGINT)) AS BIGINT) AS n_px,
        |       CAST(coalesce(list_sum(list_transform(range(1, n + 1),
        |         k -> CASE WHEN ((k-1) % 93) % 3 = 0 THEN bytes[CAST(k AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_b,
        |       CAST(coalesce(list_sum(list_transform(range(1, n + 1),
        |         k -> CASE WHEN ((k-1) % 93) % 3 = 1 THEN bytes[CAST(k AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_g,
        |       CAST(coalesce(list_sum(list_transform(range(1, n + 1),
        |         k -> CASE WHEN ((k-1) % 93) % 3 = 2 THEN bytes[CAST(k AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_r,
        |       CAST(coalesce(list_max(bytes), 0) AS INT) AS max_px
        |FROM px ORDER BY doc_id""".stripMargin),
    // WAV replay: sample k = (byte_k − 128)·256, so energy = 65536·Σ(b−128)²
    // and max_amp = 256·max|b−128| — integer-exact both sides.
    // Per-byte µ-law expansion replayed with DuckDB bitwise ops — the
    // stateless contrast to q194's list_reduce recurrence.
    "q206_ulaw_decode" -> (bytesCte + """,
        |d AS (SELECT doc_id, n, list_transform(bytes, v ->
        |        CASE WHEN (xor(v, 255) & 128) = 128
        |             THEN 132 - ((((xor(v, 255) & 15) * 8) + 132)
        |                         * (1 << ((xor(v, 255) >> 4) & 7)))
        |             ELSE ((((xor(v, 255) & 15) * 8) + 132)
        |                   * (1 << ((xor(v, 255) >> 4) & 7))) - 132
        |        END) AS pcm
        |      FROM px)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(coalesce(list_sum(list_transform(pcm, s -> s * s)), 0) AS BIGINT) AS energy,
        |       CAST(coalesce(list_max(list_transform(pcm, s -> abs(s))), 0) AS INT) AS max_amp,
        |       CAST(coalesce(list_sum(pcm), 0) AS BIGINT) AS sum_pcm
        |FROM d ORDER BY doc_id""".stripMargin),
    "q168_wav_decode" -> (bytesCte +
      """
        |SELECT doc_id, 16000 AS sample_rate,
        |       CAST(n AS BIGINT) AS n_samples,
        |       CAST(CASE WHEN n >= 400 THEN (n - 400) // 160 + 1 ELSE 0 END AS BIGINT) AS n_frames,
        |       CAST(coalesce(list_sum(list_transform(bytes,
        |         v -> (v - 128) * (v - 128))), 0) * 65536 AS BIGINT) AS energy,
        |       CAST(coalesce(list_max(list_transform(bytes,
        |         v -> abs(v - 128))), 0) * 256 AS INT) AS max_amp
        |FROM px ORDER BY doc_id""".stripMargin),
    // Replays the PGM round-trip from hex(encode(text)): byte k of the
    // UTF-8 payload is two hex digits; pads are zeros, so sum is over the
    // real bytes, min is 0 whenever padding exists, and max is 0 only for
    // an empty document.
    "q161_pgm_decode" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |                  octet_length(encode(text)) AS n
        |           FROM documents),
        |dims AS (SELECT doc_id, hx, n, 32 AS w,
        |                greatest(1, CAST(ceil(n / 32.0) AS INT)) AS h
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
        |FROM px ORDER BY doc_id""".stripMargin,
    "q134_multimodal_audio" ->
      """WITH a AS (SELECT doc_id,
        |             CAST(octet_length(encode(text)) AS BIGINT) * 64 AS n_samples
        |           FROM documents)
        |SELECT doc_id, n_samples,
        |       CAST(CASE WHEN n_samples >= 400
        |                 THEN (n_samples - 400) // 160 + 1 ELSE 0 END AS BIGINT) AS n_frames,
        |       n_samples // 16 AS duration_ms
        |FROM a ORDER BY doc_id""".stripMargin,
    "q54_multimodal_features" -> (checksumCte +
      """
        |SELECT doc_id, n_bytes, checksum,
        |       CAST(1 + checksum % 640 AS INT) AS width,
        |       CAST(1 + checksum % 480 AS INT) AS height
        |FROM f ORDER BY doc_id""".stripMargin),
    "q72_multimodal_resize" -> (checksumCte +
      """,
        |dims AS (SELECT doc_id,
        |                CAST(1 + checksum % 640 AS INT) AS width,
        |                CAST(1 + checksum % 480 AS INT) AS height
        |         FROM f)
        |SELECT doc_id, width, height,
        |       CAST(width * 224 // greatest(width, height) AS INT) AS new_w,
        |       CAST(height * 224 // greatest(width, height) AS INT) AS new_h
        |FROM dims ORDER BY doc_id""".stripMargin),
    "q73_multimodal_frames" -> (checksumCte +
      """,
        |clips AS (SELECT doc_id, CAST(checksum % 300 + 1 AS INT) AS n_frames FROM f),
        |stepped AS (SELECT doc_id, n_frames,
        |                   greatest(CAST((n_frames + 7) // 8 AS INT), 1) AS step
        |            FROM clips)
        |SELECT doc_id, CAST(unnest(range(0, n_frames, step)) AS INT) AS frame_idx,
        |       n_frames
        |FROM stepped ORDER BY doc_id, frame_idx""".stripMargin),
  )
}
