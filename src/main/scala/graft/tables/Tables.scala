package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TPC-H-ish star schema + extension tables
  * (`TESTDATA.md`). The reference engine has no sources at all — clients build
  * `InputVec` in memory (reference `MapReduceFramework.cpp:315`); here the scan
  * IS the Spark parquet source so predicate pushdown / column pruning apply.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is INT64 TIMESTAMP(NANOS) in parquet, which Spark 4 rejects
    * outright; read nanos as long and truncate to microsecond timestamps
    * (integer `div` — a double division would lose precision above 2^53 ns).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * build time by every entry point (Verify/Bench/tests) — NOT mutated here,
    * so concurrent query builders never race on session conf.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // ---- additional source formats (SURVEY §2.2 "File formats") ----
  // Schema is always explicit: schema inference re-reads the data (a full
  // extra pass at 100 TB) and can silently drift between runs.

  def csv(s: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]").csv(path)

  /** Microsecond timestamp format by default: Spark's JSON default writes
    * milliseconds, which silently truncates event times on a roundtrip.
    */
  def json(s: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType,
           timestampFormat: String = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"): DataFrame =
    s.read.schema(schema).option("timestampFormat", timestampFormat).json(path)

  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)
}
