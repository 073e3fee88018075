package graft.sources

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` FileSystem without the per-create chmod FORK.
  *
  * Without libhadoop (this environment has none), Hadoop's
  * RawLocalFileSystem applies permissions by FORKING A `chmod` PROCESS —
  * once per file create and once per mkdir (`Shell.execCommand` from
  * `setPermission`, observed as 6/10 driver stack samples during a lake
  * DML loop). A commit-heavy operator (merge, DV delete chain, streaming
  * epoch append) pays tens of process forks per invocation; task-side
  * parquet writes pay the same inside every write job.
  *
  * Both fork sites (`LocalFSFileOutputStream.<init>`,
  * `mkOneDirWithMode`) reach the shell through a virtual
  * `setPermission` call, so a subclass that makes explicit permission
  * application a no-op removes the forks while keeping everything else —
  * including CRC checksums (the Checksum wrapper is preserved) —
  * identical. Files then simply carry the JVM's umask-derived modes,
  * which is what a single-user local store wants anyway; HDFS/S3 paths
  * are untouched (this binds to the `file` scheme only).
  *
  * Wired via `spark.hadoop.fs.file.impl` in [[graft.SessionEnv]];
  * instantiated reflectively, hence the no-arg constructor.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class FastLocalFileSystem(raw: FileSystem) extends LocalFileSystem(raw) {
  def this() = this(new NoForkRawLocalFileSystem)
}
