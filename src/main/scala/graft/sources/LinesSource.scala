package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSourceV2 connector: line-oriented text shards →
  * (doc_id, fname, text) rows — the ingestion shape of the reference's
  * `InputVec` (the sample client hand-builds (id, line) pairs before the job,
  * `Sample Client/SampleClient.cpp:74-82`; here the engine reads shards
  * itself, which is the capability the reference lacks — SURVEY §2.2
  * "File formats... clients read files themselves").
  *
  * Deliberately implements the contracts that matter at 100 TB:
  *
  *  - `SupportsPushDownRequiredColumns`: a `select(text)` never materializes
  *    doc_id/fname — the reader emits exactly the pruned schema.
  *  - `SupportsPushDownFilters` on doc_id: range/equality predicates are
  *    accepted and evaluated INSIDE the reader, and because
  *    doc_id = fileIndex << 32 | lineNo, a pushed doc_id range prunes WHOLE
  *    FILES at planning time (`planInputPartitions`) — the custom-source
  *    equivalent of parquet row-group pruning. Unsupported predicates are
  *    returned as residuals for Spark to re-apply, per the v2 contract.
  *    Bounds are kept INCLUSIVE on both ends so no `v ± 1` can overflow at
  *    the Long domain edges (a pushed `doc_id <= Long.MaxValue` must keep
  *    every row, not wrap to an empty range).
  *  - One `InputPartition` per shard, sorted by name: deterministic ids and
  *    executor-parallel reads with no driver-side content handling.
  *  - `MICRO_BATCH_READ`: the same table is a Structured Streaming source.
  *    An offset is the count of shard files; each micro-batch reads exactly
  *    the newly-listed shards, so ingestion of an append-only landing
  *    directory is incremental and exactly-once (offsets are re-planned
  *    deterministically from the sorted listing on recovery). New files
  *    must sort AFTER already-ingested ones (monotone shard naming — the
  *    standard landing-zone convention) or their ids would reshuffle.
  *  - `BATCH_WRITE` + `TRUNCATE`: the connector is also a sink
  *    (append/overwrite) with the v2 two-phase commit: each task streams its
  *    partition's `text` lines to a DOT-PREFIXED temp file (invisible to
  *    `listShards`, so concurrent readers never observe a half-written
  *    batch), and the driver's `commit` renames the temps to
  *    `part-<batch>-<partition>` names — prefixed with as many `~` (the
  *    highest printable ASCII byte) as needed to sort AFTER the
  *    lexicographically-last existing shard, whatever its naming scheme —
  *    the monotone naming the streaming reader requires, so a LinesSource
  *    write feeds a LinesSource stream even into a directory of
  *    foreign-named shards. A failed/speculative task attempt leaves only
  *    an orphaned dot-file, which commit sweeps (scoped by a per-write id,
  *    so concurrent writes never delete each other's in-flight temps);
  *    `doc_id` and `fname` are derived-on-read (positional), so only
  *    `text` persists.
  *
  * Usage: `spark.read.format("graft.sources.LinesSource").load(dir)`,
  * `spark.readStream.format(...)`, or
  * `df.write.format(...).mode("append"|"overwrite").save(dir)`.
  */
class LinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LinesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new LinesTable(properties.get("path"))
}

object LinesSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("fname", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Data shards: visible plain files, sorted for deterministic ids.
    * `listFiles` returns null for a missing/unreadable directory — surface
    * that as a clear error instead of an NPE deep in planning.
    */
  def listShards(path: String): Seq[java.io.File] = {
    val d = new java.io.File(path)
    val fs =
      if (d.isDirectory) {
        val listed = d.listFiles()
        require(listed != null, s"graft_lines: cannot list directory $path")
        listed.toSeq
      } else if (d.isFile) Seq(d)
      else throw new IllegalArgumentException(s"graft_lines: path does not exist: $path")
    fs.filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
  }

  /** Highest doc_id shard `i` can hold — (i+1)<<32 − 1 spelled without the
    * `(i+1) << 32` intermediate, which overflows for the top shard index.
    */
  def shardMaxId(i: Int): Long = (i.toLong << 32) + 0xFFFFFFFFL

  /** Prefix making every `<prefix>part-<batch>-<partition>.txt` name sort
    * strictly after `last` (the lexicographically-greatest existing shard):
    * the smallest run of '~' (0x7E, above any sane ASCII shard name) that
    * wins, and — total-function fallback for names '~' cannot beat, e.g.
    * unicode above 0x7E — `last` itself plus '~' (a strict extension of
    * `last` sorts after it, and after everything below it). A prefix p with
    * p > last guarantees p+suffix > last: the first differing position
    * already favors p.
    */
  def monotonePrefix(last: String, batch: Int): String =
    Iterator.iterate("")("~" + _).take(8)
      .find(p => f"${p}part-$batch%06d-" > last)
      .getOrElse(last + "~")
}

final class LinesTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_lines($path)"
  override def schema(): StructType = LinesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LinesScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LinesWriteBuilder(path, info)
}

final class LinesScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = LinesSource.schema
  private var pushed: Array[Filter] = Array.empty
  // Conjunction of pushed doc_id bounds as an INCLUSIVE [lo, hi] range —
  // inclusive on both ends so no bound adjustment can overflow; `none`
  // marks a predicate satisfiable by no long at all (doc_id > MaxValue).
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var none: Boolean = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case IsNotNull("doc_id") => true // trivially true: doc_id is generated
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan(_, v: Long) =>
        if (v == Long.MaxValue) none = true else lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) =>
        if (v == Long.MinValue) none = true else hi = math.min(hi, v - 1)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new LinesScan(path, required, pushed, lo, hi, none || lo > hi)
}

final case class LinesInputPartition(file: String, idx: Int) extends InputPartition

final class LinesScan(path: String, required: StructType,
                      pushed: Array[Filter], lo: Long, hi: Long, none: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LinesMicroBatchStream(path, required, lo, hi, none)
  override def description(): String =
    s"GraftLines path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    if (none) Array.empty
    else LinesSource.listShards(path).zipWithIndex
      // File-level pruning from the pushed doc_id range: shard i only
      // holds ids in [i << 32, shardMaxId(i)].
      .filter { case (_, i) =>
        (i.toLong << 32) <= hi && LinesSource.shardMaxId(i) >= lo }
      .map { case (f, i) => LinesInputPartition(f.getPath, i): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LinesReaderFactory(required, lo, hi)
}

/** Offset = number of shard files already ingested (the sorted listing is
  * the log; its length is the high-water mark). JSON form is the bare int.
  */
final case class LinesOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

final class LinesMicroBatchStream(path: String, required: StructType,
                                  lo: Long, hi: Long, none: Boolean)
    extends MicroBatchStream {
  override def initialOffset(): Offset = LinesOffset(0)
  override def latestOffset(): Offset = LinesOffset(LinesSource.listShards(path).size)
  override def deserializeOffset(json: String): Offset = LinesOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[LinesOffset].n, end.asInstanceOf[LinesOffset].n)
    if (none) Array.empty
    else LinesSource.listShards(path).zipWithIndex
      .slice(s, e) // only the shards that appeared in (start, end]
      .filter { case (_, i) =>
        (i.toLong << 32) <= hi && LinesSource.shardMaxId(i) >= lo }
      .map { case (f, i) => LinesInputPartition(f.getPath, i): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LinesReaderFactory(required, lo, hi)
}

final class LinesReaderFactory(required: StructType, lo: Long, hi: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LinesInputPartition]
    new LinesPartitionReader(p.file, p.idx, required, lo, hi)
  }
}

final class LinesPartitionReader(file: String, idx: Int,
                                 required: StructType, lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {
  private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
    new java.io.FileInputStream(file), java.nio.charset.StandardCharsets.UTF_8))
  private val fname = new java.io.File(file).getName
  private var lineNo = -1L
  private var line: String = _

  // Column projection resolved ONCE per reader, not per row.
  private val fieldGetters: Array[(Long, String) => Any] =
    required.fieldNames.map {
      case "doc_id" => (id: Long, _: String) => id
      case "fname"  => (_: Long, _: String) => UTF8String.fromString(fname)
      case "text"   => (_: Long, t: String) => UTF8String.fromString(t)
    }

  override def next(): Boolean = {
    line = reader.readLine()
    lineNo += 1
    while (line != null && {
      val id = (idx.toLong << 32) | lineNo; id < lo || id > hi
    }) {
      line = reader.readLine()
      lineNo += 1
    }
    line != null
  }

  override def get(): InternalRow = {
    val id = (idx.toLong << 32) | lineNo
    new GenericInternalRow(fieldGetters.map(g => g(id, line)))
  }

  override def close(): Unit = reader.close()
}

final class LinesWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new LinesWrite(path, info.schema(), truncateFirst)
}

final class LinesWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"GraftLines write path=$path, truncate=$truncateFirst"

  /** Per-write id: scopes this job's temp files so commit/abort of one
    * write never sweeps a concurrent write's in-flight temps.
    */
  private val writeId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new java.io.File(path)
    require(dir.isDirectory || dir.mkdirs(), s"graft_lines: cannot create $path")
    new LinesWriterFactory(path, schema.fieldIndex("text"), writeId)
  }

  /** Driver-side publish: truncate if overwriting, then rename each task's
    * temp to its final monotone name, then sweep this write's orphaned
    * temps (failed or speculative attempts). Empty partitions produced no
    * temp and publish no shard.
    *
    * Monotone naming against ARBITRARY existing shards: positional doc_ids
    * require every new shard to sort lexicographically after every
    * already-published one. `part-…` alone only beats names below "part-",
    * so the name is prefixed with the smallest run of '~' (0x7E, the
    * highest printable ASCII byte — after any sane shard name) that sorts
    * the whole batch after the current last shard. Repeated appends into a
    * '~'-prefixed directory reuse the same prefix (the batch counter keeps
    * later batches ordered), so prefixes don't grow per append.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncateFirst) LinesSource.listShards(path).foreach(_.delete())
    val existing = LinesSource.listShards(path).map(_.getName)
    val batch = existing.size
    val last = if (existing.isEmpty) "" else existing.max
    // A string prefix p with p > last guarantees p+suffix > last (the first
    // differing position already favors p), so compare on the prefix once.
    val pfx = LinesSource.monotonePrefix(last, batch)
    messages.collect { case m: LinesCommitMessage if m.rows > 0 => m }
      .foreach { m =>
        val src = new java.io.File(path, m.tmpName)
        val dst = new java.io.File(path, f"${pfx}part-$batch%06d-${m.partitionId}%05d.txt")
        require(dst.getName > last,
          s"graft_lines: generated shard ${dst.getName} would not sort after $last")
        // Files.move WITHOUT REPLACE_EXISTING: two concurrent commits into
        // one directory can list the same shards, derive the same
        // batch/prefix, and collide on a final name — renameTo would
        // silently replace the first writer's shard (data loss); this
        // throws FileAlreadyExistsException instead, failing the later
        // write loudly. (Single-writer-per-directory remains the intended
        // contract; the collision is now detected, not absorbed.)
        java.nio.file.Files.move(src.toPath, dst.toPath)
      }
    sweepTemps()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepTemps()

  private def sweepTemps(): Unit = {
    val d = new java.io.File(path).listFiles()
    if (d != null)
      d.filter(f => f.isFile && f.getName.startsWith(s".graft-lines-tmp-$writeId-"))
        .foreach(_.delete())
  }
}

final case class LinesCommitMessage(partitionId: Int, tmpName: String, rows: Long)
    extends WriterCommitMessage

final class LinesWriterFactory(path: String, textIdx: Int, writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LinesDataWriter(path, partitionId, taskId, textIdx, writeId)
}

/** Streams one partition's text lines to a hidden temp file. The text
  * contract is line-oriented (values must not contain '\n' — same as any
  * text sink); ids are positional and regenerate on read.
  */
final class LinesDataWriter(path: String, partitionId: Int, taskId: Long, textIdx: Int,
                            writeId: String)
    extends DataWriter[InternalRow] {
  private val tmp = new java.io.File(path, s".graft-lines-tmp-$writeId-$partitionId-$taskId")
  private var out: java.io.BufferedWriter = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(tmp), java.nio.charset.StandardCharsets.UTF_8))
    out.write(row.getUTF8String(textIdx).toString)
    out.write('\n')
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    LinesCommitMessage(partitionId, tmp.getName, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    tmp.delete()
  }

  override def close(): Unit = ()
}
