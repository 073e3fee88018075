package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared decode helpers for the parquet-hadoop example (`Group`) readers
  * — the executor-side row materialization [[ChangeFeedSource]] and
  * [[VersionedSource]] use. Projection is by field NAME: a field the file
  * predates decodes as NULL (the store's schema-evolution backfill), and
  * only the primitive types the store writes are supported — rejected
  * loudly otherwise.
  */
object GroupRows {

  /** Decode one field of `g` as the Spark-internal value for `f`. */
  def value(g: Group, f: StructField): Any = {
    val t = g.getType
    if (!t.containsField(f.name)) return null // pre-evolution file
    val idx = t.getFieldIndex(f.name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    f.dataType match {
      case LongType => g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case BooleanType => g.getBoolean(idx, 0)
      case DoubleType => g.getDouble(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case ShortType => g.getInteger(idx, 0).toShort
      case ByteType => g.getInteger(idx, 0).toByte
      // parquet DATE is int32 epoch days — exactly Spark's internal form
      case DateType => g.getInteger(idx, 0)
      case other => throw new UnsupportedOperationException(
        s"graft group reader: unsupported column type $other for ${f.name} — " +
          "supported: int/long/short/byte/string/boolean/float/double/date")
    }
  }

  /** Convert a partition-directory STRING value (already unescaped; null =
    * the Hive default partition) to the Spark-internal value for `f`.
    */
  def constant(raw: String, f: StructField): Any = {
    if (raw == null) return null
    f.dataType match {
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case StringType => UTF8String.fromString(raw)
      case BooleanType => raw.toBoolean
      case ShortType => raw.toShort
      case ByteType => raw.toByte
      case other => throw new UnsupportedOperationException(
        s"graft group reader: unsupported partition-value type $other for ${f.name}")
    }
  }
}
