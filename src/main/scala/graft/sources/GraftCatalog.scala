package graft.sources

import graft.tables.Versioned
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over [[Versioned]] tables — the surface that makes the
  * store a first-class SQL citizen, no Scala API in sight:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.lake.warehouse", "/data/warehouse")
  *
  *   CREATE TABLE lake.ns.orders (o_orderkey BIGINT, ..., o_year INT)
  *     PARTITIONED BY (o_year) TBLPROPERTIES ('statskey' = 'o_orderkey')
  *   INSERT INTO lake.ns.orders SELECT ...
  *   DELETE FROM lake.ns.orders WHERE o_year = 1993
  *   SELECT * FROM lake.ns.orders VERSION AS OF 2
  *   SELECT * FROM lake.ns.orders TIMESTAMP AS OF '...'
  * }}}
  *
  * Identifier → path mapping is `warehouse/<namespace…>/<table>`; a
  * table EXISTS iff it has a committed version. CREATE commits an empty
  * v1 recording schema, partition column and stats column; INSERT goes
  * through the same staged-files + adopt commit as the streaming sink
  * (executors write parquet, the driver commits ONE append version);
  * DELETE maps Spark's pushed filters onto [[Versioned.deleteWhere]]
  * (partition-scoped rewrite, NULL-safe SQL semantics); time travel
  * resolves VERSION AS OF to a pinned manifest and TIMESTAMP AS OF via
  * manifest mtimes. Everything lands in the SAME manifests the Scala
  * API writes, so SQL and programmatic users interleave safely under
  * the store's CAS commit.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {
  private var catName: String = _
  private var warehouse: String = _

  override def name(): String = catName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"GraftCatalog needs spark.sql.catalog.$name.warehouse"))
  }

  private def spark = SparkSession.active
  private def fsys = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sane(part: String): String = {
    require(part.nonEmpty && !part.contains("/") && !part.contains("..") &&
      !part.startsWith("."), s"illegal identifier part: $part")
    part
  }
  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name()).map(sane)).mkString("/")
  private def pathOf(ns: Seq[String]): String =
    (warehouse +: ns.map(sane)).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    try Versioned.latestVersion(spark, pathOf(ident)) >= 1
    catch { case _: Exception => false }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new VersionedCatalogTable(pathOf(ident), None)
  }
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new VersionedCatalogTable(pathOf(ident), Some(version.toInt))
  }
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val p = pathOf(ident)
    new VersionedCatalogTable(p,
      Some(Versioned.versionAsOf(spark, p, timestampMicros / 1000L)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path(pathOf(namespace.toSeq))
    if (!fsys.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fsys.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => fsys.exists(new Path(dir, s"$n/_manifests")))
      .map(Identifier.of(namespace, _)).toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog partitions by identity columns only, got $other")
    }
    // Multi-column partitioning: the comma list lands in the #partcol
    // header; directories nest a=1/b=x, exactly Spark's own layout.
    Versioned.createEmpty(spark, pathOf(ident), schema,
      partCol = if (partCols.isEmpty) None else Some(partCols.mkString(",")),
      statsKey = Option(properties.get("statskey")),
      statsKey2 = Option(properties.get("statskey2")),
      // 'statscols': N extra stat dimensions recorded per file on every
      // append (the Delta leading-columns convention) — comma list
      statsCols = Option(properties.get("statscols"))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Seq.empty))
    new VersionedCatalogTable(pathOf(ident), None)
  }

  /** SQL `ALTER TABLE ADD / RENAME / DROP COLUMN`: pure-metadata commits
    * evolving the recorded schema — ADD appends nullable columns
    * ([[Versioned.addColumns]], NULL backfill on read), RENAME records
    * the former name in the column map so old files keep serving
    * ([[Versioned.renameColumn]]), DROP removes the column from the
    * schema leaving files untouched ([[Versioned.dropColumn]]). All give
    * per-version time-travel schemas; name reuse after a rename/drop is
    * refused (the tombstone contract). Anything else fails loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = pathOf(ident)
    def single(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"nested $what ${names.mkString(".")} is not supported")
      names(0)
    }
    // ONE statement = ONE commit: a multi-change statement must not leave
    // earlier changes committed when a later one is refused. ADD COLUMNS
    // with several fields is Spark's one multi-change statement — batch it
    // into the single addColumns commit; any other combination is one
    // change per statement by the SQL grammar, refused here if not.
    changes.toSeq match {
      case adds if adds.nonEmpty && adds.forall(_.isInstanceOf[TableChange.AddColumn]) =>
        val fields = adds.map(_.asInstanceOf[TableChange.AddColumn]).map { a =>
          require(a.position() == null,
            "ADD COLUMN appends at the end; FIRST/AFTER are not supported")
          val f = org.apache.spark.sql.types.StructField(
            single(a.fieldNames(), "ADD COLUMN"), a.dataType(), a.isNullable())
          Option(a.comment()).map(f.withComment).getOrElse(f)
        }
        Versioned.addColumns(spark, path, fields)
      case Seq(r: TableChange.RenameColumn) =>
        Versioned.renameColumn(spark, path,
          single(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case Seq(d: TableChange.DeleteColumn) =>
        Versioned.dropColumn(spark, path,
          single(d.fieldNames(), "DROP COLUMN"))
      case Seq(u: TableChange.UpdateColumnType) =>
        Versioned.widenColumnType(spark, path,
          single(u.fieldNames(), "ALTER COLUMN TYPE"), u.newDataType())
      case Seq(other) => throw new IllegalArgumentException(
        s"GraftCatalog ALTER TABLE supports ADD/RENAME/DROP COLUMN and " +
          s"ALTER COLUMN TYPE (widening) only, got $other")
      case mixed => throw new IllegalArgumentException(
        "GraftCatalog applies each ALTER TABLE statement as one atomic " +
          s"commit — ${mixed.length} heterogeneous changes in one statement " +
          "are not supported; issue separate statements")
    }
    new VersionedCatalogTable(path, None)
  }

  // ---- stored procedures (`CALL <cat>.<ns>.<proc>(...)`) ----
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(n => pathOf(Identifier.of(
      n.split('.').dropRight(1), n.split('.').last)), ident.name())
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(Identifier.of(namespace, _)).toArray

  // ---- atomic CTAS (`CREATE TABLE ... AS SELECT`) ----
  /** Nothing becomes visible until the SELECT's write commits: the staged
    * table's write creates the table (empty v1 with the declared layout
    * headers) and adopts the staged files as v2 in its own commit; an
    * aborted CTAS deletes the table directory it owned, leaving no trace.
    */
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog partitions by identity columns only, got $other")
    }
    require(partCols.nonEmpty,
      "GraftCatalog CTAS needs PARTITIONED BY column(s) (the store's layout unit)")
    // EVERY declared stats property lands in the CTAS commit — silently
    // dropping one would create the table without its stat dimensions.
    new StagedVersionedTable(pathOf(ident), schema, partCols.mkString(","),
      Option(properties.get("statskey")),
      Option(properties.get("statskey2")),
      Option(properties.get("statscols"))
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Seq.empty))
  }
  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: java.util.Map[String, String]): StagedTable =
    throw new UnsupportedOperationException(
      "REPLACE TABLE is not supported — versioned tables evolve by commit, not replacement")
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: java.util.Map[String, String]): StagedTable = {
    // OR REPLACE on an existing table would be a replacement — give the
    // store's actual position, not a misleading "already exists".
    if (tableExists(ident)) throw new UnsupportedOperationException(
      "REPLACE TABLE is not supported — versioned tables evolve by commit, not replacement")
    stageCreate(ident, schema, partitions, properties)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    if (!tableExists(ident)) false
    else fsys.delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    require(fsys.rename(new Path(pathOf(from)), new Path(pathOf(to))),
      s"rename $from -> $to failed")
  }

  // Namespaces are warehouse directories — enough for multi-part
  // identifiers; no properties are stored.
  override def listNamespaces(): Array[Array[String]] =
    if (!fsys.exists(new Path(warehouse))) Array.empty
    else fsys.listStatus(new Path(warehouse)).toSeq.filter(_.isDirectory)
      .filterNot(s => fsys.exists(new Path(s.getPath, "_manifests")))
      .map(s => Array(s.getPath.getName)).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fsys.exists(new Path(pathOf(namespace.toSeq)))
  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    fsys.mkdirs(new Path(pathOf(namespace.toSeq)))
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties are not stored")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = new Path(pathOf(namespace.toSeq))
    if (!fsys.exists(p)) false
    else {
      require(cascade || fsys.listStatus(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fsys.delete(p, true)
    }
  }
}

/** Pushed-filter → Column translation for the catalog's DELETE path.
  * Only translations with EXACT SQL semantics are attempted — anything
  * else makes `canDeleteWhere` false and the DELETE fails loudly rather
  * than deleting the wrong rows.
  */
private[sources] object FilterColumns {
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toSeq.map(lit(_)): _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(g) => toColumn(g).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case StringStartsWith(c, v) => Some(col(c).startsWith(lit(v)))
    case StringEndsWith(c, v) => Some(col(c).endsWith(lit(v)))
    case StringContains(c, v) => Some(col(c).contains(lit(v)))
    case _ => None
  }
}

/** A catalog-resolved versioned table: reads plan through the same
  * pruned [[VersionedScanBuilder]] as the path-based connector; INSERT
  * stages parquet on executors and adopts one append version; DELETE
  * maps pushed filters onto the store's partition-scoped rewrite. A
  * time-travelled instance (`VERSION AS OF`) is read-only by
  * construction — Spark resolves writes against the un-pinned table.
  */
final class VersionedCatalogTable(path: String, pinned: Option[Int])
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {
  private def spark = SparkSession.active
  private def resolvedV: Int =
    pinned.getOrElse(Versioned.latestVersion(spark, path))

  override def name(): String =
    s"graft_versioned($path${pinned.map("@v" + _).getOrElse("")})"
  override def schema(): StructType =
    VersionedSource.schemaFor(spark, path, resolvedV)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val v = resolvedV
    new VersionedScanBuilder(path, v, VersionedSource.schemaFor(spark, path, v),
      Versioned.statsKeyOf(spark, path, v), Versioned.statsKey2Of(spark, path, v))
  }

  /** Batch INSERT and streaming `writeStream.toTable` share one builder:
    * partition column and stats key come from the table's OWN recorded
    * headers, so a SQL-first user streams into `cat.ns.tbl` without
    * knowing the path or the layout options the path-based sink needs.
    * Each micro-batch epoch commits as one tagged APPEND version — the
    * same exactly-once contract as [[VersionedSink]].
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinned.isEmpty, "cannot write to a time-travelled table")
    val latest = Versioned.latestVersion(spark, path)
    val partCol = Versioned.partColOf(spark, path, latest).getOrElse(
      throw new IllegalArgumentException(
        s"$path records no partition column — writes need one (CREATE with PARTITIONED BY)"))
    val statsKey = Versioned.statsKeyOf(spark, path, latest)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch =
          new VersionedBatchWrite(path, info.schema(), partCol, statsKey).toBatch
        override def toStreaming =
          new VersionedSinkWrite(path, info.schema(), partCol, statsKey,
            info.queryId()).toStreaming
      }
    }
  }

  /** SQL MERGE INTO / UPDATE / rewriting DELETE: the group-based
    * copy-on-write protocol — the operation's scan records exactly which
    * manifest entries it planned (after partition/stats/bloom pruning of
    * the pushed condition), Spark streams the affected groups' REPLACED
    * rows through the operation's write, and the commit swaps precisely
    * the scanned entries for the staged replacement under a CAS pinned
    * to the scanned version. Untouched files splice; a concurrent commit
    * between scan and replace fails loudly.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty, "cannot modify a time-travelled table")
    () => new VersionedRowLevelOperation(path, info.command())
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinned.isEmpty && filters.forall(FilterColumns.toColumn(_).isDefined) &&
      Versioned.partColOf(spark, path, resolvedV).isDefined &&
      // mid-partition-evolution: the value-scoped delete would splice
      // wrongly — declining routes Spark to the row-level rewrite
      // DELETE, which splices by entry identity and is evolution-safe
      Versioned.hasUniformLayout(spark, path, resolvedV)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinned.isEmpty, "cannot delete from a time-travelled table")
    val predicate = filters.flatMap(FilterColumns.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val partCol = Versioned.partColOf(spark, path, resolvedV).getOrElse(
      throw new IllegalArgumentException(s"$path records no partition column"))
    Versioned.deleteWhere(spark, path, predicate, partCol)
  }
}

/** Batch INSERT INTO: the streaming sink's staged-files + adopt commit,
  * epoch-less — executors write `col=value`-laid-out parquet under a
  * per-write staging dir, the driver promotes exactly the files named
  * in the task commit messages and commits ONE append version.
  */
final class VersionedBatchWrite(path: String, schema: StructType,
                                partCol: String, statsKey: Option[String])
    extends Write with BatchWrite {
  private val writeId = java.util.UUID.randomUUID().toString.replace("-", "")
  private def stagingRoot = new Path(path, s"_sink_stage/batch_$writeId")
  // Fail unsupported types at plan time.
  VersionedSinkWriter.messageTypeOf(schema, partCol)

  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VersionedBatchWriterFactory(stagingRoot.toString, schema, partCol,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochDir = new Path(stagingRoot, "0")
    val files = messages.flatMap(_.asInstanceOf[VersionedSinkFiles].files)
    if (files.nonEmpty) {
      val dd = new Path(path,
        s"d_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      files.foreach { case (partDir, name) =>
        val to = new Path(dd, s"$partDir/$name")
        fsys.mkdirs(to.getParent)
        require(fsys.rename(new Path(epochDir, s"$partDir/$name"), to),
          s"failed to promote staged file $partDir/$name")
      }
      Versioned.adoptStaged(spark, path, dd.getName, fileStatsKey = statsKey)
    }
    fsys.delete(stagingRoot, true)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(stagingRoot, true)
  }
}

final class VersionedBatchWriterFactory(stagingRoot: String, schema: StructType,
                                        partCol: String,
                                        conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new VersionedSinkWriter(stagingRoot, schema, partCol, partitionId, taskId, 0L,
      conf.value)
}

/** The table a CTAS stages into: nothing on disk is a committed table
  * until the SELECT's write commits ONE CTAS manifest (declared headers +
  * the staged files, `Versioned.createAsSelect`); `commitStagedChanges`
  * has nothing left to do, and an abort deletes the owned directory.
  */
final class StagedVersionedTable(path: String, schema0: StructType,
                                 partCol: String, statsKey: Option[String],
                                 statsKey2: Option[String] = None,
                                 statsCols: Seq[String] = Seq.empty)
    extends StagedTable with SupportsWrite {
  override def name(): String = s"graft_staged($path)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new VersionedCtasWrite(path, info.schema(), partCol, statsKey,
          statsKey2, statsCols)
    }
  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = {
    val spark = SparkSession.active
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}

/** CTAS write: stage parquet on executors like any sink write, then
  * commit the table into existence as ONE CTAS manifest — the declared
  * partition/stats headers plus exactly the task-committed files.
  */
final class VersionedCtasWrite(path: String, schema: StructType,
                               partCol: String, statsKey: Option[String],
                               statsKey2: Option[String] = None,
                               statsCols: Seq[String] = Seq.empty)
    extends Write with BatchWrite {
  private val writeId = java.util.UUID.randomUUID().toString.replace("-", "")
  private def stagingRoot = new Path(path, s"_sink_stage/ctas_$writeId")
  VersionedSinkWriter.messageTypeOf(schema, partCol)
  Versioned.partColsOf(partCol).foreach { c =>
    require(schema.fieldNames.contains(c),
      s"CTAS partition column $c not in ${schema.fieldNames.mkString(",")}")
    // Refuse unsupported partition types at PLAN time, before the SELECT
    // runs — messageTypeOf excludes the partition columns, and
    // createAsSelect's own check only fires in commit(), after the whole
    // job executed.
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.BooleanType)
        .contains(schema(c).dataType),
      s"CTAS partition column $c: type ${schema(c).dataType} " +
        "renders format-dependent directory names; use int/long/string/boolean")
  }

  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VersionedBatchWriterFactory(stagingRoot.toString, schema, partCol,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochDir = new Path(stagingRoot, "0")
    val files = messages.flatMap(_.asInstanceOf[VersionedSinkFiles].files)
    // ONE manifest commit (op CTAS) adopting the promoted files with the
    // declared headers: a createEmpty-then-adoptStaged pair would leave a
    // committed, visible, EMPTY table if the JVM died between the two
    // commits — the CTAS contract is all-or-nothing.
    val dataDir = if (files.isEmpty) None else {
      val dd = new Path(path,
        s"d_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      files.foreach { case (partDir, name) =>
        val to = new Path(dd, s"$partDir/$name")
        fsys.mkdirs(to.getParent)
        require(fsys.rename(new Path(epochDir, s"$partDir/$name"), to),
          s"failed to promote staged file $partDir/$name")
      }
      Some(dd.getName)
    }
    Versioned.createAsSelect(spark, path, schema, dataDir,
      partCol = Some(partCol), statsKey = statsKey,
      statsKey2 = statsKey2, statsCols = statsCols)
    fsys.delete(stagingRoot, true)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(stagingRoot, true)
  }
}

/** One SQL row-level statement (MERGE INTO / UPDATE / rewriting DELETE):
  * the scan half records the planned entry set and the version it was
  * planned against; the write half replaces exactly that set.
  */
final class VersionedRowLevelOperation(
    path: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  import graft.tables.Versioned

  @volatile private[sources] var scannedVersion: Int = -1
  @volatile private[sources] var scanned: Set[(String, String, Option[String])] = Set.empty

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val v = Versioned.latestVersion(spark, path)
    scannedVersion = v
    new VersionedScanBuilder(path, v, VersionedSource.schemaFor(spark, path, v),
      Versioned.statsKeyOf(spark, path, v), Versioned.statsKey2Of(spark, path, v),
      planListener = Some(es =>
        scanned = es.map(e => (e.partDir, e.dataDir, e.file)).toSet))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val spark = SparkSession.active
    val partCol = Versioned.partColOf(spark, path, scannedVersion).getOrElse(
      throw new IllegalArgumentException(
        s"$path records no partition column — row-level SQL needs one"))
    new WriteBuilder {
      override def build(): Write = new VersionedReplaceDataWrite(
        path, info.schema(), partCol, VersionedRowLevelOperation.this)
    }
  }
}

/** The replacement write of a row-level statement: stage the rewritten
  * groups' rows like any sink write, then commit base-minus-scanned plus
  * the staged dir, CAS-pinned to the scanned version.
  */
final class VersionedReplaceDataWrite(path: String, schema: StructType,
                                      partCol: String,
                                      op: VersionedRowLevelOperation)
    extends Write with BatchWrite {
  private val writeId = java.util.UUID.randomUUID().toString.replace("-", "")
  private def stagingRoot = new Path(path, s"_sink_stage/rlo_$writeId")
  VersionedSinkWriter.messageTypeOf(schema, partCol)

  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new VersionedBatchWriterFactory(stagingRoot.toString, schema, partCol,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochDir = new Path(stagingRoot, "0")
    val files = messages.flatMap(_.asInstanceOf[VersionedSinkFiles].files)
    require(op.scannedVersion >= 1,
      "row-level write committed before its scan planned — unsupported plan shape")
    val dd = new Path(path,
      s"d_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    files.foreach { case (partDir, name) =>
      val to = new Path(dd, s"$partDir/$name")
      fsys.mkdirs(to.getParent)
      require(fsys.rename(new Path(epochDir, s"$partDir/$name"), to),
        s"failed to promote staged file $partDir/$name")
    }
    try graft.tables.Versioned.replaceEntries(spark, path, op.scannedVersion,
      op.scanned, dd.getName, op.command().toString)
    finally fsys.delete(stagingRoot, true)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fsys = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(stagingRoot, true)
  }
}
