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

  /** Metadata key carrying a renamed column's FORMER on-file names
    * (comma-joined, newest first) — set by the scan from the manifest's
    * `#colmap` header, consulted by both the row and columnar readers.
    */
  val AliasesKey = "graft_aliases"

  /** Stamp each mapped field of `st` with its alias metadata — the scan
    * does this once at planning time from the manifest's `#colmap`.
    */
  def withAliases(st: StructType, m: Map[String, Seq[String]]): StructType =
    if (m.isEmpty) st
    else StructType(st.fields.map { f =>
      m.get(f.name).filter(_.nonEmpty) match {
        case Some(as) => f.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putString(AliasesKey, as.mkString(",")).build())
        case None => f
      }
    })

  /** The former names `f`'s bytes may carry in pre-rename files. */
  def aliasesOf(f: StructField): Seq[String] =
    if (f.metadata.contains(AliasesKey))
      f.metadata.getString(AliasesKey).split(",").toSeq.filter(_.nonEmpty)
    else Seq.empty

  /** `f`'s name as this file carries it: the logical name, or the first
    * alias present (a rename's former name), or None (pre-evolution or
    * post-drop file — NULL backfill).
    */
  def onFileName(hasField: String => Boolean, f: StructField): Option[String] =
    if (hasField(f.name)) Some(f.name)
    else aliasesOf(f).find(hasField)

  /** Decode one field of `g` as the Spark-internal value for `f`. */
  def value(g: Group, f: StructField): Any = {
    val t = g.getType
    val name = onFileName(t.containsField, f).getOrElse(
      return null) // pre-evolution file
    val idx = t.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    // Type-widened columns (ALTER COLUMN TYPE): files written before the
    // widen carry the NARROW physical type — decode by the file's own
    // primitive type and widen, exactly parquet-footer truth.
    def phys = t.getType(idx).asPrimitiveType().getPrimitiveTypeName
    f.dataType match {
      case LongType =>
        if (phys == PrimitiveTypeName.INT32) g.getInteger(idx, 0).toLong
        else g.getLong(idx, 0)
      case IntegerType => g.getInteger(idx, 0)
      case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
      case BooleanType => g.getBoolean(idx, 0)
      case DoubleType =>
        if (phys == PrimitiveTypeName.FLOAT) g.getFloat(idx, 0).toDouble
        else if (phys == PrimitiveTypeName.INT32) g.getInteger(idx, 0).toDouble
        else g.getDouble(idx, 0)
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
