package graft.sources

import graft.tables.Versioned
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Append-mode streaming SOURCE over a [[Versioned]] table ITSELF — the
  * default Delta streaming source re-derived: `readStream` of a table
  * without any change-feed recording, where each micro-batch serves the
  * files APPEND commits added. This is the common "tail the table"
  * consumer ([[ChangeFeedSource]] covers the CDC case that needs
  * update/delete images and `recordChanges = true` merges; this source
  * needs nothing from the writer).
  *
  * Offsets are committed VERSION numbers (checkpointed by the engine);
  * micro-batch (s, e] plans one input partition per file that version
  * ADDED relative to its predecessor — exact manifest set-difference,
  * driver metadata only. Versions that could change or remove
  * already-delivered rows (MERGE, DELETE, UPDATE, RESTORE, OPTIMIZE,
  * ZORDER, a second PUBLISH, schema changes) FAIL THE STREAM LOUDLY —
  * the Delta default for a non-append commit under a streaming reader;
  * a CDC consumer should read the change feed instead. v1 (PUBLISH or
  * CREATE) serves as the initial snapshot when `startingVersion` = 0.
  *
  * Rows decode through the same per-file reader as the DSv2 batch
  * connector (column pruning pushed down, partition value from the
  * directory name). Exactly-once across restarts: offsets re-plan
  * deterministically from the manifests (vacuuming a version a lagging
  * stream still needs fails that stream loudly, the Delta contract).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.TableTailSource")
  *     .option("startingVersion", "0")   // 0 = initial snapshot + tail
  *     .load(tablePath)                  // "latest" = new appends only
  * }}}
  */
class TableTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableTailSource.tableSchema(SparkSession.active, options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TableTailTable(properties.get("path"), schema)
}

object TableTailSource {
  def tableSchema(spark: SparkSession, tablePath: String): StructType = {
    require(tablePath != null, "graft_tabletail: path option is required")
    val latest = Versioned.latestVersion(spark, tablePath)
    require(latest >= 1, s"graft_tabletail: $tablePath has no committed version")
    Versioned.schemaOf(spark, tablePath, latest).getOrElse(
      throw new IllegalArgumentException(
        s"graft_tabletail: $tablePath v$latest has no recorded schema — " +
          "republish or merge once to record one"))
  }

  /** Input partitions for the appended files of committed versions in
    * (start, end], gating each version's `#op`: appends stream; v1
    * snapshots stream when started from 0; anything that could mutate
    * or reorder already-delivered rows fails loudly.
    */
  def appendPartitions(spark: SparkSession, tablePath: String,
                       start: Int, end: Int): Seq[VersionedPartition] = {
    val fsPath = new org.apache.hadoop.fs.Path(tablePath)
    lazy val fsys = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ((start + 1) to end).flatMap { v =>
      val op = Versioned.opOf(spark, tablePath, v)
      val opBase = op.takeWhile(_ != '(')
      require(opBase == "APPEND" ||
          (v == 1 && (opBase == "PUBLISH" || opBase == "CREATE" || opBase == "CLONE")),
        s"graft_tabletail: v$v of $tablePath is a $op commit — a table tail " +
          "serves appends only; use ChangeFeedSource for CDC consumers")
      Versioned.appendedEntriesOf(spark, tablePath, v).flatMap { e =>
        require(e.dv.isEmpty,
          s"graft_tabletail: appended entry ${e.partDir}/${e.file.getOrElse("")} " +
            "carries a deletion vector — not an append")
        val (constCols, constVals) =
          if (e.partDir == "-") (Array.empty[String], Array.empty[String])
          else {
            val kvs = e.partDir.split('/').toSeq.map { seg =>
              val cut = seg.indexOf('=')
              val raw = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(seg.substring(cut + 1))
              (seg.substring(0, cut),
               if (raw == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                 .DEFAULT_PARTITION_NAME) null else raw)
            }
            (kvs.map(_._1).toArray, kvs.map(_._2).toArray)
          }
        e.file match {
          case Some(f) =>
            Seq(VersionedPartition(
              new org.apache.hadoop.fs.Path(fsPath,
                s"${e.dataDir}/${e.partDir}/$f").toString, constCols, constVals))
          case None =>
            val dir = new org.apache.hadoop.fs.Path(fsPath,
              if (e.partDir == "-") e.dataDir else s"${e.dataDir}/${e.partDir}")
            fsys.listStatus(dir).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName)
              .map(s => VersionedPartition(s.getPath.toString, constCols, constVals))
        }
      }
    }
  }
}

final class TableTailTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_tabletail($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val starting = Option(options.get("startingVersion")) match {
      case Some("latest") => Versioned.latestVersion(SparkSession.active, path)
      case Some(v) => v.toInt
      case None => 0
    }
    new TableTailScanBuilder(path, schema0, starting,
      Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
  }
}

final class TableTailScanBuilder(path: String, full: StructType,
                                 startingVersion: Int, maxVersions: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new TableTailScan(path, full, required, startingVersion, maxVersions)
}

final class TableTailScan(path: String, full: StructType, required: StructType,
                          startingVersion: Int, maxVersions: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTableTail path=$path from v$startingVersion, " +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    TableTailSource.appendPartitions(spark, path, startingVersion,
      Versioned.latestVersion(spark, path))
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedReaderFactory(required, full, columnarOk = true) // appends never carry DVs (gated in appendPartitions)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TableTailMicroBatchStream(path, full, required, startingVersion, maxVersions)
}

final class TableTailMicroBatchStream(path: String, full: StructType,
                                      required: StructType,
                                      protected val startingVersion: Int,
                                      protected val maxVersions: Option[Int])
    extends VersionOffsetStream {
  protected def tablePath: String = path

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[VersionOffset].v, end.asInstanceOf[VersionOffset].v)
    TableTailSource.appendPartitions(SparkSession.active, path, s, e)
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedReaderFactory(required, full, columnarOk = true) // appends never carry DVs (gated in appendPartitions)
}
