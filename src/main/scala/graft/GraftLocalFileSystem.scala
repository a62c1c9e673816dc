package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem for LOCAL runs that skips per-file permission
  * syscalls — without the native hadoop library (`libhadoop.so`, absent
  * in this environment), `RawLocalFileSystem.setPermission` falls back to
  * FORKING a `chmod` process (`Shell.execCommand`) for EVERY created file
  * and directory (`LocalFSFileOutputStream.<init>`,
  * `mkOneDirWithMode`) — measured at 50-150 ms per fork under load.
  * A 32-task micro-batch parquet write paid ~3 forks/task (attempt dir
  * mkdir + part file + checksum file ≈ 10+ s of cumulative task time to
  * land <1 MB), which dominated every artifact-writing query in the
  * bench: profiled stacks showed `ProcessImpl.forkAndExec` as the single
  * hottest executor frame.
  *
  * POSIX permission bits on a single-user local scratch FS carry no
  * information — the JVM's umask already applies to every created file —
  * so `setPermission` is a no-op here (the behavior native `chmod` would
  * make cheap, minus the syscall). Skipping `ChecksumFileSystem` (this
  * extends RAW local) also halves file creates: local disks do their own
  * integrity checking; `.crc` siblings are an artifact of pre-checksummed
  * remote filesystems.
  *
  * Scale posture: this class only ever serves `file://` paths. At
  * production scale the data lives on HDFS/S3 where this code path does
  * not exist (permissions are metadata operations there, and parquet
  * commit goes through the store's committer); local-mode benches and
  * tests are exactly where the fork fallback bites. Wired via
  * `spark.hadoop.fs.file.impl` in the local entry points (Bench/Verify/
  * Run/QBench/...) — deployment configs override it like any other
  * Hadoop conf.
  */
class GraftLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
  // RawLocalFileSystem inherits FileSystem's throwing default (only the
  // Checksum wrapper declares the scheme); callers probe it for lease
  // naming, so declare what this class serves.
  override def getScheme: String = "file"
}

/** The `AbstractFileSystem` (FileContext) face of
  * [[GraftLocalFileSystem]] — structured streaming's checkpoint manager
  * prefers FileContext, whose default `file` binding wraps a plain
  * `RawLocalFileSystem` and pays the same fork-per-create. Wired via
  * `spark.hadoop.fs.AbstractFileSystem.file.impl`. */
class GraftLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new GraftLocalFileSystem(), conf, "file", false)
