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
  * schema. The DECODE STEP ITSELF IS A STUB: real image/audio codecs are
  * not available in this container, so `decodeBatch` derives deterministic
  * fake features (checksum-seeded dimensions) from the payload bytes. Swap
  * `decodeBatch`'s body for a real codec and nothing else changes.
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_multimodal_features" -> features _,
  )

  // The stub decode is closed-form over the bytes (ASCII corpus → byte value
  // = ascii code), so DuckDB can replay it exactly.
  val oracles: Map[String, String] = Map(
    "q54_multimodal_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                list_transform(string_split(text, ''),
        |                               c -> CAST(ascii(c) AS BIGINT))),
        |                (h, c) -> (h * 31 + c) % 1000000007) AS BIGINT) AS checksum
        |  FROM documents)
        |SELECT doc_id, n_bytes, checksum,
        |       CAST(1 + checksum % 640 AS INT) AS width,
        |       CAST(1 + checksum % 480 AS INT) AS height
        |FROM f ORDER BY doc_id""".stripMargin,
  )
}
