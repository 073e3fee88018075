package graft.sources

import graft.tables.Versioned
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo, DataWriter, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 STREAMING SINK into a [[Versioned]] table — the standard
  * `writeStream.format(...)` surface for continuous ingestion, replacing
  * the hand-rolled foreachBatch recipe with the engine-native API:
  *
  * {{{
  *   df.writeStream.format("graft.sources.VersionedSink")
  *     .option("checkpointLocation", ckpt)
  *     .option("partCol", "o_year")          // required: layout column
  *     .option("fileStatsKey", "o_orderkey") // optional: keep file stats
  *     .start(tablePath)                     // table must exist (v1 published)
  * }}}
  *
  * Semantics (the public Delta streaming-sink design re-derived):
  *  - each micro-batch epoch commits as ONE new table VERSION — an
  *    append whose manifest splices the previous latest and adds exactly
  *    the epoch's files;
  *  - EXACTLY-ONCE across failures and restarts, twice over: the commit
  *    adopts only the files named in the epoch's task commit MESSAGES
  *    (a failed attempt's orphans are dropped with the staging dir), and
  *    the version carries a `sink_<queryId>_<epochId>` idempotence tag —
  *    a replayed epoch finds its tag committed and is a no-op;
  *  - executors write parquet directly (parquet-hadoop Group writer, one
  *    open file per partition VALUE per task — same `col=value` layout
  *    as Spark's own partitioned writer, so every store read path, stats
  *    scan and merge works on sink-written versions unchanged);
  *  - readers are never blocked: until the manifest commit lands, the
  *    staged files are invisible.
  *
  * Scale shape: the write itself is embarrassingly parallel (no shuffle
  * — each task writes its partition values locally; pre-partition the
  * stream by `partCol` upstream if small-files-per-epoch matter, then
  * OPTIMIZE inside the store compacts what accumulates). The driver
  * handles only file names and the manifest CAS.
  *
  * Scope: the DRIVER's session Hadoop configuration rides to executors
  * via a serializable envelope (object-store credentials and fs
  * implementations apply on the task side); supported column types are
  * the store's partitionable scalars plus double — refused loudly at
  * plan time, not mid-stream, for data and partition columns alike.
  */
class VersionedSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "VersionedSink needs a table path")
    val spark = SparkSession.active
    val v = Versioned.latestVersion(spark, path)
    require(v >= 1,
      s"VersionedSink appends to an existing table — publish v1 of $path first")
    Versioned.schemaOf(spark, path, v).getOrElse(
      throw new IllegalArgumentException(
        s"v$v of $path records no schema — republish with a current writer"))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new VersionedSinkTable(properties.get("path"), schema)
}

final class VersionedSinkTable(path: String, schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-versioned-sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new VersionedSinkWrite(
        path, info.schema(), info.options(), info.queryId())
    }
}

final class VersionedSinkWrite(path: String, schema: StructType,
                               partCol: String,
                               fileStatsKey: Option[String],
                               queryId: String)
    extends Write with StreamingWrite {

  /** Path-route constructor: partCol/fileStatsKey from writer options
    * (`writeStream.format(...).option("partCol", ...)`). The catalog
    * route (`writeStream.toTable`) passes them from the table's own
    * recorded headers instead.
    */
  def this(path: String, schema: StructType,
           options: CaseInsensitiveStringMap, queryId: String) =
    this(path, schema,
      {
        val p = options.get("partCol")
        require(p != null, "VersionedSink needs a partCol option")
        p
      },
      Option(options.get("fileStatsKey")), queryId)

  graft.tables.Versioned.partColsOf(partCol).foreach { c =>
    require(schema.fieldNames.contains(c),
      s"VersionedSink needs partCol $c among ${schema.fieldNames.mkString(",")}")
    // Fail unsupported types at PLAN time — the partition columns via
    // the directory-encoding whitelist (messageTypeOf excludes them, so
    // e.g. a double partCol would otherwise only fail per-row mid-stream).
    require(Set[org.apache.spark.sql.types.DataType](
        StringType, LongType, IntegerType, BooleanType)
        .contains(schema(c).dataType),
      s"VersionedSink partition column $c: type " +
        s"${schema(c).dataType} renders format-dependent directory " +
        "names; use int/long/string/boolean")
  }
  // ... and the data columns via the parquet message type.
  VersionedSinkWriter.messageTypeOf(schema, partCol)

  override def toStreaming: StreamingWrite = this

  private def stagingRoot = new Path(path,
    s"_sink_stage/${queryId.replaceAll("[^0-9a-zA-Z-]", "_")}")
  private def fs(spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // The session's Hadoop conf rides to the executors (object-store
    // credentials, fs implementations) — a fresh Configuration() on the
    // task side would silently drop them.
    new VersionedSinkWriterFactory(stagingRoot.toString, schema, partCol,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = fs(spark)
    val epochDir = new Path(stagingRoot, epochId.toString)
    val files = messages.flatMap(_.asInstanceOf[VersionedSinkFiles].files)
    if (files.nonEmpty) {
      // Adopt ONLY the committing attempt's files: a failed prior
      // attempt's leftovers stay in the staging dir and die with it.
      val dd = new Path(path,
        s"d_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      files.foreach { case (partDir, name) =>
        val to = new Path(dd, s"$partDir/$name")
        fsys.mkdirs(to.getParent)
        require(fsys.rename(new Path(epochDir, s"$partDir/$name"), to),
          s"failed to promote staged file $partDir/$name for epoch $epochId")
      }
      Versioned.adoptStaged(spark, path, dd.getName,
        tag = Some(s"sink_${queryId}_$epochId"), fileStatsKey = fileStatsKey)
    }
    fsys.delete(epochDir, true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    fs(spark).delete(new Path(stagingRoot, epochId.toString), true)
  }
}

final case class VersionedSinkFiles(files: Seq[(String, String)])
    extends WriterCommitMessage

/** Java-serializable Hadoop `Configuration` envelope (the Configuration
  * class itself is Writable, not Serializable) — ships the DRIVER's
  * session conf into write tasks.
  */
final class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

final class VersionedSinkWriterFactory(stagingRoot: String, schema: StructType,
                                       partCol: String,
                                       conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new VersionedSinkWriter(stagingRoot, schema, partCol,
      partitionId, taskId, epochId, conf.value)
}

object VersionedSinkWriter {
  import org.apache.parquet.schema.{MessageType, Types, LogicalTypeAnnotation}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  /** Data-file schema: every column EXCEPT the partition column (it is
    * directory-encoded, exactly like Spark's partitioned writer).
    */
  private[graft] def messageTypeOf(schema: StructType, partCol: String): MessageType = {
    val pcs = graft.tables.Versioned.partColsOf(partCol).toSet
    val b = Types.buildMessage()
    schema.fields.filterNot(f => pcs.contains(f.name)).foreach { f =>
      f.dataType match {
        case LongType => b.addField(Types.optional(INT64).named(f.name))
        case IntegerType => b.addField(Types.optional(INT32).named(f.name))
        case DoubleType => b.addField(Types.optional(DOUBLE).named(f.name))
        case FloatType => b.addField(Types.optional(FLOAT).named(f.name))
        case ShortType => b.addField(Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(16, true)).named(f.name))
        case ByteType => b.addField(Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(8, true)).named(f.name))
        case BooleanType => b.addField(Types.optional(BOOLEAN).named(f.name))
        case StringType => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        // parquet DATE = int32 epoch days (Spark's internal form)
        case DateType => b.addField(Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name))
        case other => throw new IllegalArgumentException(
          s"VersionedSink does not write ${f.name}: $other — " +
            "supported: long, int, short, byte, double, float, boolean, string, date")
      }
    }
    b.named("graft_sink")
  }
}

final class VersionedSinkWriter(stagingRoot: String, schema: StructType,
                                partCol: String, partitionId: Int,
                                taskId: Long, epochId: Long,
                                conf: org.apache.hadoop.conf.Configuration)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.metadata.CompressionCodecName
  import org.apache.parquet.io.api.Binary

  private val msgType = VersionedSinkWriter.messageTypeOf(schema, partCol)
  private val factory = new SimpleGroupFactory(msgType)
  private val partCols = graft.tables.Versioned.partColsOf(partCol)
  private val partIdxs = partCols.map(schema.fieldIndex)
  private val dataFields = schema.fields.zipWithIndex
    .filterNot { case (f, _) => partCols.contains(f.name) }

  // One open file per partition VALUE seen by this task.
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, ParquetWriter[org.apache.parquet.example.data.Group]]
  private val written = scala.collection.mutable.ListBuffer.empty[(String, String)]

  private def fileName = s"part-$epochId-$partitionId-$taskId.parquet"

  // A group-based row-level rewrite (SQL MERGE/UPDATE/DELETE) hands the
  // writer rows PREFIXED with Spark's `__row_operation` marker column
  // (RowDeltaUtils; 5/6 = whole-row writes); plain appends hand exactly
  // the declared schema. Resolve the ordinal shift from the first row,
  // loudly — anything other than 0 or 1 extra leading fields, or a
  // delta-style marker (1/2/3 = per-row delete/update/insert), is a plan
  // shape this group-replacing writer must NOT silently misread.
  private var shift = -1
  private def resolveShift(row: InternalRow): Unit = {
    shift = row.numFields - schema.size
    require(shift == 0 || shift == 1,
      s"row carries ${row.numFields} fields for a ${schema.size}-column schema")
  }

  // Nested multi-column layouts render one `col=value` level per column.
  private def partDirOf(row: InternalRow): String =
    partCols.zip(partIdxs).map { case (c, i0) =>
      val i = i0 + shift
      val raw =
        if (row.isNullAt(i)) null
        else schema.fields(i0).dataType match {
          case StringType => row.getUTF8String(i).toString
          case LongType => String.valueOf(row.getLong(i))
          case IntegerType => String.valueOf(row.getInt(i))
          case BooleanType => String.valueOf(row.getBoolean(i))
          case other => throw new IllegalArgumentException(
            s"partition column $c: unsupported type $other")
        }
      ExternalCatalogUtils.getPartitionPathString(c, raw)
    }.mkString("/")

  override def write(row: InternalRow): Unit = {
    if (shift < 0) resolveShift(row)
    if (shift == 1) {
      val op = row.getInt(0)
      require(op == 5 || op == 6,
        s"unexpected __row_operation marker $op — delta-based row-level " +
          "writes are not supported by this group-replacing sink")
    }
    val partDir = partDirOf(row)
    val w = open.getOrElseUpdate(partDir, {
      val p = new Path(stagingRoot, s"$epochId/$partDir/$fileName")
      written += ((partDir, fileName))
      ExampleParquetWriter.builder(p).withConf(conf).withType(msgType)
        .withCompressionCodec(CompressionCodecName.SNAPPY).build()
    })
    val g = factory.newGroup()
    dataFields.foreach { case (f, i0) =>
      val i = i0 + shift
      if (!row.isNullAt(i)) f.dataType match {
        case LongType => g.append(f.name, row.getLong(i))
        case IntegerType => g.append(f.name, row.getInt(i))
        case DoubleType => g.append(f.name, row.getDouble(i))
        case FloatType => g.append(f.name, row.getFloat(i))
        case ShortType => g.append(f.name, row.getShort(i).toInt)
        case ByteType => g.append(f.name, row.getByte(i).toInt)
        case BooleanType => g.append(f.name, row.getBoolean(i))
        case StringType =>
          g.append(f.name, Binary.fromString(row.getUTF8String(i).toString))
        case DateType => g.append(f.name, row.getInt(i))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    w.write(g)
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.close())
    VersionedSinkFiles(written.toList)
  }

  override def abort(): Unit = {
    open.values.foreach(w => try w.close() catch { case _: Throwable => () })
    val fsys = new Path(stagingRoot).getFileSystem(conf)
    written.foreach { case (partDir, name) =>
      try fsys.delete(new Path(stagingRoot, s"$epochId/$partDir/$name"), false)
      catch { case _: Throwable => () }
    }
  }

  override def close(): Unit = ()
}
