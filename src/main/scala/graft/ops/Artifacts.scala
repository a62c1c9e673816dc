package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for partitioned parquet ARTIFACTS (the ann_index /
  * bm25_index at-rest layouts): every `mode: "append"` lands one more
  * file set into each touched partition directory, so a long-running
  * ingest fragments the artifact — hundreds of small files per
  * partition whose footer reads eventually dominate the pruned-scan
  * cost the layout exists to provide. Compaction rewrites each
  * partition to ONE file (the tar_compact posture applied to parquet):
  * a deliberate, explicit re-read of history — the amortized cost of
  * keeping every future search fast.
  */
object Artifacts {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Rewrite a `partitionBy(partCol)` parquet directory to one file per
    * partition value: `repartition(partCol)` puts each value wholly in
    * one task, so the partitioned write emits exactly one file per
    * directory; rows, values and partition layout are unchanged
    * (searches before and after are bit-identical — gated in tests).
    *
    * The swap is write-to-sibling then two renames (dest → dest.old,
    * tmp → dest, delete dest.old) — never an in-place overwrite of a
    * path being read. Not atomic: a crash between the renames leaves
    * `dest.old` (the intact pre-compact artifact) — move it back or
    * re-run the compaction; the tmp write itself is all-or-nothing
    * (Spark commits via _temporary). */
  def compactPartitionedDir(
      spark: SparkSession, dir: String, partCol: String): Unit = {
    val df =
      try spark.read.parquet(dir)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $dir — build it " +
          s"first: ${e.getMessage}") }
    require(df.columns.contains(partCol),
      s"compact: $dir is not partitioned by '$partCol' " +
        s"(columns: ${df.columns.mkString(", ")})")
    val tmp = s"$dir.compact"
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    swapDir(spark, tmp, dir)
  }

  /** Rewrite an UNPARTITIONED parquet directory (the bm25 `dl` table —
    * read by EVERY search for the doc-length attach) to size-targeted
    * files: after thousands of micro-appends the footer reads dominate
    * exactly like the postings case, so the compactor must cover it
    * too. File count targets ~128 MB of on-disk bytes per file (never
    * one giant file on a billion-doc corpus); same write-sibling +
    * rename swap, rows and values unchanged. */
  def compactFlatDir(spark: SparkSession, dir: String): Unit = {
    val df =
      try spark.read.parquet(dir)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $dir — build it " +
          s"first: ${e.getMessage}") }
    val p = new org.apache.hadoop.fs.Path(dir)
    val bytes = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
    val nFiles = math.max(1L, bytes / (128L << 20) + 1L).toInt
    val tmp = s"$dir.compact"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    swapDir(spark, tmp, dir)
  }

  /** True when the delta dir exists AND holds at least one DATA file:
    * an all-empty micro-batch write can leave a fileless `batch=` dir
    * (just _SUCCESS), and a bare parquet read of it dies on schema
    * inference — readers must treat such a delta as absent. */
  def incHasData(spark: SparkSession, inc: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(inc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && dirHasData(fs, p)
  }

  /** Read an artifact table as base ∪ streaming-ingest DELTA — the ONE
    * reader the bm25 and ann index artifacts share (a drifted copy of
    * this contract is how fileless-delta and schema-mismatch bugs creep
    * in). The delta's `batch` partition column is bookkeeping, never
    * data; a fileless delta reads as absent. */
  def readWithInc(spark: SparkSession, base: String, inc: String)
      : org.apache.spark.sql.DataFrame = {
    val b = spark.read.parquet(base)
    if (incHasData(spark, inc))
      b.unionByName(spark.read.parquet(inc).drop("batch"))
    else b
  }

  /** Latest batch id the Structured Streaming checkpoint at
    * `checkpointDir` has COMMITTED — the `commits/<id>` metadata-log
    * listing (plain numeric file names; temp/compacted entries are
    * skipped). None when the commits log is absent or empty (a
    * checkpoint that has not completed any batch). The checkpoint
    * DIRECTORY itself must exist — a typo'd path would silently mean
    * "fold nothing", so it rejects by name. */
  def lastCommittedBatch(
      spark: SparkSession, checkpointDir: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root),
      s"compact: checkpoint '$checkpointDir' does not exist — pass the " +
        "ingest stream's checkpointLocation (the directory holding its " +
        "commits/ log)")
    val commits = new org.apache.hadoop.fs.Path(root, "commits")
    if (!fs.exists(commits)) {
      // An existing dir WITHOUT a commits log is only "no batch
      // committed yet" when it actually looks like a Structured
      // Streaming checkpoint (offsets/ or metadata appear on the very
      // first batch attempt). Anything else — the index dir itself, a
      // typo'd sibling — would silently pin the fold ceiling at -1
      // forever (delta grows unbounded, no signal), so reject by name.
      require(fs.exists(new org.apache.hadoop.fs.Path(root, "offsets")) ||
          fs.exists(new org.apache.hadoop.fs.Path(root, "metadata")),
        s"compact: '$checkpointDir' exists but is not a Structured " +
          "Streaming checkpoint (no commits/, offsets/ or metadata) — " +
          "pass the ingest stream's checkpointLocation")
      None
    }
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .reduceOption(_ max _)
  }

  /** Fold ceiling from an optional ingest checkpoint: the last
    * committed batch id, or -1 (fold nothing) when the checkpoint has
    * committed no batch yet. None in → None out — fold everything,
    * the quiesced-stream posture. The one resolution both compact
    * dispatches (bm25/ann) share. */
  def committedFoldCeiling(
      spark: SparkSession, checkpoint: Option[String]): Option[Long] =
    checkpoint.map(cp => lastCommittedBatch(spark, cp).getOrElse(-1L))

  /** The plain `batch=<id>` child dirs of a RETRIEVAL delta area, with
    * parsed ids — [[areaDirs]] restricted to the plain dialect (the
    * *_inc writers emit nothing else, so a `batch=b7`/`batch=seed`
    * there is as foreign as a stray file). Strict/skip semantics as
    * documented on [[areaDirs]]. */
  private def batchDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      inc: org.apache.hadoop.fs.Path,
      strict: Boolean = true): Seq[(Long, org.apache.hadoop.fs.Path)] =
    areaDirs(fs, inc, strict, plainOnly = true)
      .flatMap(d => d.id.map(id => (id, d.path)))

  /** Does this dir (recursively) hold any real data file? Partitioned
    * delta batch dirs nest their files under partition subdirs
    * (batch=K/bucket=N/part-…); metadata files and in-flight
    * `_temporary` dirs don't count as data. ONE walk shared by
    * [[incHasData]] and the fold below — the reader's "is there a
    * delta" and the fold's "is this dir foldable" must never drift. */
  private def dirHasData(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean = {
    val st = fs.listStatus(p)
    st.exists(f => f.isFile && f.getLen > 0 &&
      !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith(".")) ||
    st.exists(f => f.isDirectory && !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith(".") && dirHasData(fs, f.getPath))
  }

  /** Per-base-path fold serialization: two folds (an operator-issued
    * `mode:"compact"` and a stream's `compact_every`) racing on the
    * same artifact would let [[recoverCrashedFold]] mistake the live
    * one for a crashed one and sabotage it (delete its partial
    * rewrite, move its staged sources back). All folds in THIS JVM —
    * the driver issues both kinds — serialize on a per-base monitor.
    * Cross-PROCESS exclusion is ENFORCED by the `$base.lease` file
    * ([[acquireLease]]): a second driver's fold or heal finds a fresh
    * foreign lease and rejects by name instead of sabotaging the live
    * fold; a crashed holder's lease goes stale after
    * [[leaseStalenessMs]] and is taken over. */
  private val foldLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def foldLock(base: String): Object =
    foldLocks.computeIfAbsent(base, _ => new Object)

  /** How long a `$base.lease` file stays authoritative WITHOUT renewal.
    * A LIVE holder's heartbeat refreshes the timestamp every
    * [[leaseHeartbeatMs]], so staleness only ever elapses on a DEAD
    * holder — a legitimately hours-long 100 TB fold keeps its lease
    * fresh for its whole duration (the naive write-once lease would be
    * "stale" mid-fold and stolen, the exact corruption it exists to
    * prevent). */
  private[graft] val leaseStalenessMs: Long = 60L * 60 * 1000
  /** Heartbeat period — test-overridable. */
  @volatile private[graft] var leaseHeartbeatMs: Long = leaseStalenessMs / 4

  /** First line of the lease file, None when absent/unreadable. */
  private def readLeaseLine(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(path), java.nio.charset.StandardCharsets.UTF_8))
      try Option(in.readLine()) finally in.close()
    } catch { case _: Exception => None }

  /** A held fold lease: the file plus its heartbeat. Release in a
    * finally — it stops the heartbeat and deletes the file (only while
    * still the owner). Lease content is "epoch-millis holder-uuid":
    * the uuid lets every rewrite verify ownership first, so a
    * legitimately-taken-over holder (paused past staleness — VM
    * migration, hour-long STW) can never stomp its successor's lease;
    * it aborts by name instead ([[lostTo]], checked by [[withLease]]).
    * Heartbeats replace the file via tmp + atomic rename — a concurrent
    * reader never observes the empty/truncated lease a create(path,
    * true) overwrite exposes (the r20 ADVICE race: empty parses as
    * ts=0 = stale and invites a takeover mid-fold). */
  private final class FoldLease(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path,
      val id: String) {
    @volatile var lostTo: Option[String] = None
    private def replaceOwned(): Unit = {
      // ownership check first: a successor's uuid in the file means the
      // lease was legitimately taken over while this holder was paused
      val owner = readLeaseLine(fs, path)
        .flatMap(_.trim.split("\\s+").lift(1))
      if (owner.exists(_ != id)) {
        lostTo = owner
        log.error(s"fold lease $path now held by ${owner.get} — this " +
          "holder was paused past staleness and taken over; aborting " +
          "rather than stomping the successor's lease")
      } else {
        val tmp = new org.apache.hadoop.fs.Path(s"$path.hb-$id")
        writeSmallFile(fs, tmp, leaseContent(id))
        if (fs.getScheme == "file") {
          // POSIX atomic replace — Hadoop's local-fs OVERWRITE rename is
          // delete-then-rename, which exposes a lease-absent window
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp.toUri.getPath),
            java.nio.file.Paths.get(path.toUri.getPath),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        } else {
          org.apache.hadoop.fs.FileContext
            .getFileContext(path.toUri, fs.getConf)
            .rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        }
      }
    }
    private val beat =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => {
          val t = new Thread(r, s"graft-fold-lease-${path.getName}")
          t.setDaemon(true); t
        })
    beat.scheduleAtFixedRate(
      () => try replaceOwned() catch { case scala.util.control.NonFatal(e) =>
        log.warn(s"fold lease heartbeat on $path failed: ${e.getMessage}") },
      leaseHeartbeatMs, leaseHeartbeatMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    def release(): Unit = {
      beat.shutdownNow()
      try {
        // delete only while still the owner — after a takeover the file
        // is the successor's to release
        val owner = readLeaseLine(fs, path)
          .flatMap(_.trim.split("\\s+").lift(1))
        if (!owner.exists(_ != id)) { fs.delete(path, false); () }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def leaseContent(id: String): String =
    s"${System.currentTimeMillis()} $id\n"

  /** Write a small lease/tmp file. On the local scheme this goes through
    * plain NIO — `fs.create` is the ChecksumFileSystem there and would
    * leave a `.{name}.crc` twin behind every tmp+rename cycle. */
  private def writeSmallFile(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, content: String): Unit = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (fs.getScheme == "file") {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path.toUri.getPath), bytes)
      ()
    } else {
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }
  }

  /** CROSS-PROCESS fold exclusion (the in-JVM [[foldLock]]'s missing
    * half): a create-exclusive `$base.lease` file whose CONTENT is the
    * holder's epoch-millis timestamp, heartbeat-refreshed while held. A
    * second driver running maintenance against the same artifact dir
    * finds a FRESH foreign lease and rejects by name — without this,
    * its heal pass would classify the first driver's live fold as
    * crashed and sabotage it (delete the partial rewrite, move staged
    * dirs back). A lease older than [[leaseStalenessMs]] is a crashed
    * holder's leftover: taken over ATOMICALLY — the contender RENAMES
    * the stale file aside (exactly one renamer wins; the loser rejects
    * by name rather than deleting what is now the winner's fresh lease
    * — the delete-then-create takeover is a TOCTOU that lets two
    * processes both acquire). Same-JVM folds never self-conflict — the
    * lease is acquired under the per-base monitor. */
  private def acquireLease(
      fs: org.apache.hadoop.fs.FileSystem, base: String): FoldLease = {
    val lease = new org.apache.hadoop.fs.Path(s"$base.lease")
    if (fs.exists(lease)) {
      val ts = try {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(lease), java.nio.charset.StandardCharsets.UTF_8))
        val line = try in.readLine() finally in.close()
        Option(line).map(_.trim.split("\\s+").head.toLong).getOrElse(0L)
      } catch { case _: Exception => 0L } // unreadable = stale
      val age = System.currentTimeMillis() - ts
      require(age >= leaseStalenessMs,
        s"compact: another process holds the fold lease on $base " +
          s"($base.lease, ${age / 1000}s old, staleness " +
          s"${leaseStalenessMs / 1000}s) — concurrent maintenance on one " +
          "artifact dir would corrupt it; wait for the holder to finish " +
          "or delete the lease if its process is known dead")
      val tomb = new org.apache.hadoop.fs.Path(
        s"$base.lease.stale${System.nanoTime()}")
      if (!fs.rename(lease, tomb))
        throw new IllegalArgumentException(
          s"compact: another process just took over the stale fold " +
            s"lease $base.lease — back off and retry later")
      fs.delete(tomb, false)
    }
    val id = java.util.UUID.randomUUID().toString
    // acquisition = write the full "ts uuid" content to a tmp file and
    // MOVE it onto the lease path WITHOUT overwrite: the lease is never
    // observable empty (the r20 ADVICE race — an empty lease parses as
    // ts=0 = stale and invites a takeover of a LIVE fold), and an
    // existing lease makes the move fail = foreign holder. Any residual
    // lost race (two movers on a store whose no-overwrite rename is
    // check-then-rename) is SAFE, not silent: the loser's first
    // heartbeat sees the winner's uuid and aborts the fold by name.
    val tmp = new org.apache.hadoop.fs.Path(s"$base.lease.acq-$id")
    writeSmallFile(fs, tmp, leaseContent(id))
    def foreign(detail: String): Nothing = {
      try { fs.delete(tmp, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
      throw new IllegalArgumentException(
        s"compact: cannot acquire the fold lease $base.lease — another " +
          s"process just took it$detail")
    }
    if (fs.getScheme == "file") {
      try java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(lease.toUri.getPath))
      catch {
        case _: java.nio.file.FileAlreadyExistsException => foreign("")
        case e: java.io.IOException => foreign(s": ${e.getMessage}")
      }
    } else if (!fs.rename(tmp, lease)) foreign("") // HDFS: atomic, no overwrite
    new FoldLease(fs, lease, id)
  }

  /** Run `body` holding the `$base.lease` — the one acquire/heartbeat/
    * release shape every fold and heal shares. Aborts BY NAME when the
    * lease was legitimately taken over mid-body (holder paused past
    * staleness): the successor may already be rewriting the same
    * artifact, so this holder's completed work must not be reported as
    * a clean fold. */
  private def withLease[A](
      fs: org.apache.hadoop.fs.FileSystem, base: String)(body: => A): A = {
    val lease = acquireLease(fs, base)
    val out = try body finally lease.release()
    lease.lostTo.foreach(succ => throw new IllegalStateException(
      s"compact: the fold lease on $base was taken over by $succ while " +
        "this holder was paused past staleness — its work may conflict " +
        "with the successor's; re-check the artifact and re-run"))
    out
  }

  /** Rows in a parquet dir, 0 when fileless/absent — the recovery
    * branch's cross-check scale (never on a hot path). */
  private def countRows(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(p) || !dirHasData(fs, p)) 0L
    else spark.read.parquet(p.toString).count()

  /** Heal a crashed fold (leftover `$inc.old`) for one base/inc pair —
    * exposed for the ingest sinks, which run it at DECLARATION so a
    * restart's first stats re-derive never reads through a half-staged
    * delta area (staged dirs are invisible to readers; deriving totals
    * from that state would undercount until the next fold healed it). */
  private[graft] def healCrashedFold(
      spark: SparkSession, base: String, inc: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(inc)
      .getFileSystem(spark.sessionState.newHadoopConf())
    foldLock(base).synchronized {
      // no crashed fold → no mutation → no lease needed (this runs on
      // every ingest declaration/cold path — keep the no-op path cheap,
      // and never reject a healthy stream start over a foreign fold)
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$inc.old")))
        withLease(fs, base) { recoverCrashedFold(spark, fs, base, inc) }
    }
  }

  /** Roll a crashed fold back or forward — every window of the staged
    * protocol below is mechanically distinguishable, so a leftover
    * `$inc.old` self-heals instead of rejecting by name (an unattended
    * `compact_every` stream must not wedge on a transient fold crash):
    *
    *   - `_folding` flag present → the rewrite never finished. Roll
    *     BACK: drop the (possibly partial) `$base.compact`, restore
    *     `$base` from `$base.old` if an unrelated swap died mid-rename,
    *     move the staged dirs back into `$inc` (a staged dir whose name
    *     re-appeared in `$inc` — a replay re-landed it — is dropped
    *     instead: the replay's copy is byte-identical by the overwrite
    *     contract), drop `$inc.old`.
    *   - flag absent, `$base.compact` present → the rewrite finished
    *     but the swap didn't. Roll FORWARD: finish the swap (restoring
    *     the mid-rename window if `$base` is missing), drop `$inc.old`.
    *   - flag absent, `$base.compact` absent → the swap finished. Roll
    *     FORWARD: drop `$inc.old`.
    *
    * Each branch is idempotent — a crash DURING recovery lands back in
    * the same branch. */
  private def recoverCrashedFold(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      base: String, inc: String): Unit = {
    val oldInc = new org.apache.hadoop.fs.Path(s"$inc.old")
    if (!fs.exists(oldInc)) return
    val flag = new org.apache.hadoop.fs.Path(oldInc, "_folding")
    val compactPath = new org.apache.hadoop.fs.Path(s"$base.compact")
    val basePath = new org.apache.hadoop.fs.Path(base)
    val baseOld = new org.apache.hadoop.fs.Path(s"$base.old")
    if (fs.exists(flag)) {
      // roll back
      if (fs.exists(compactPath)) fs.delete(compactPath, true)
      if (!fs.exists(basePath) && fs.exists(baseOld))
        require(fs.rename(baseOld, basePath),
          s"compact recovery: cannot restore $base from $base.old")
      fs.listStatus(oldInc).toSeq
        .filter(_.getPath.getName.startsWith("batch=")).foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(inc, st.getPath.getName)
          if (fs.exists(dest)) {
            // a replay re-landed this staged batch; its copy is
            // byte-identical by the overwrite contract (deterministic
            // batch content) — cross-check the row counts before
            // trusting it, so a FOREIGN writer's dir of the same name
            // rejects by name instead of silently winning
            val (sRows, dRows) =
              (countRows(spark, fs, st.getPath), countRows(spark, fs, dest))
            require(sRows == dRows,
              s"compact recovery: staged ${st.getPath} holds $sRows rows " +
                s"but the re-landed $dest holds $dRows — the delta area " +
                "was modified by something other than the ingest's replay; " +
                "resolve manually (keep one copy, delete the other)")
            fs.delete(st.getPath, true)
          }
          else require(fs.rename(st.getPath, dest),
            s"compact recovery: cannot move ${st.getPath} back into $inc")
        }
      fs.delete(oldInc, true)
    } else {
      // roll forward
      if (fs.exists(compactPath)) {
        if (!fs.exists(basePath) && fs.exists(baseOld)) {
          // the swap died between its two renames
          require(fs.rename(compactPath, basePath),
            s"compact recovery: cannot land $base.compact at $base")
          fs.delete(baseOld, true)
        } else swapDir(spark, s"$base.compact", base)
      }
      fs.delete(oldInc, true)
    }
    ()
  }

  /** Fold a streaming-ingest DELTA area (`$base` sibling written as
    * one `batch=<id>` child dir per micro-batch — the idempotent-replay
    * layout) into the base table, then drop the folded dirs: stage the
    * SNAPSHOT of batch dirs taken at entry aside, read
    * base ∪ staged (the inc side's `batch` partition column stripped),
    * rewrite compacted, swap, drop the staged dirs. With no delta
    * present this is plain compaction (skipped entirely when
    * `defragWhenEmpty` is false — the in-stream `compact_every` path
    * must not rewrite an O(corpus) base for nothing when one of the
    * sibling areas happens to have no foldable dirs).
    *
    * Live-stream coordination: only the snapshotted dirs are read,
    * staged aside, and deleted — a micro-batch landing a NEW
    * `batch=<id>` dir while the fold runs survives in the delta area
    * untouched (the r18 whole-area rename swept and deleted it: silent
    * data loss even though the stream checkpoint had committed the
    * batch). `maxBatchId` closes the OTHER window: pass the ingest
    * checkpoint's [[lastCommittedBatch]] and the fold skips any landed
    * dir the checkpoint has not committed — a crash-then-replay would
    * re-land that dir, and folding it first would duplicate its rows
    * (base ∪ re-landed delta). Uncommitted dirs stay in the delta area
    * for the replay to overwrite. Without `maxBatchId` every landed
    * dir folds (exact for a quiesced stream; the config surface's
    * `checkpoint` key supplies it for live ones).
    *
    * Crash discipline — SELF-HEALING (see [[recoverCrashedFold]]): the
    * snapshot stages aside under `$inc.old/` FIRST, with a `_folding`
    * flag held while the rewrite runs, so every crash window is
    * distinguishable: flag present → roll back; flag absent → the
    * rewrite finished, roll forward. Readers see base-only for the
    * staged batches between the stage-aside and the swap — a briefly
    * stale but NEVER-duplicated view. Two honest windows remain, as
    * for any rename-swapped layout without a coordinating catalog:
    * a read racing [[swapDir]]'s two renames can fail path-not-found
    * (retry-shaped, microseconds), and a SEARCH served mid-fold scores
    * against postings/dl missing the staged docs while the index's
    * separate stats row still counts them — concurrent readers get
    * momentarily conservative scores, never duplicates; deployments
    * that need bit-stable reads during maintenance should gate
    * searches off the compaction cadence. The r18 protocol (rewrite
    * first,
    * whole-area rename after) rejected by name on a leftover
    * `$inc.old`, and its documented recovery could DUPLICATE rows: the
    * snapshot boundary was recorded nowhere, so after a mid-stage
    * crash the un-staged dirs were indistinguishable from freshly
    * landed ones while `$base.compact` already contained their rows. */
  def foldIncInto(
      spark: SparkSession, base: String, inc: String,
      partCol: Option[String], maxBatchId: Option[Long] = None,
      defragWhenEmpty: Boolean = true,
      strict: Boolean = true): Int = foldLock(base).synchronized {
    val incPath = new org.apache.hadoop.fs.Path(inc)
    val oldInc = new org.apache.hadoop.fs.Path(s"$inc.old")
    val fs = oldInc.getFileSystem(spark.sessionState.newHadoopConf())
    withLease(fs, base) {
    recoverCrashedFold(spark, fs, base, inc)
    // SNAPSHOT the foldable dirs once: everything the fold reads,
    // stages aside, and deletes below is exactly this list.
    val snapshot = batchDirs(fs, incPath, strict)
      .filter { case (id, _) => maxBatchId.forall(id <= _) }
      .sortBy(_._1)
    val (withData, fileless) = snapshot.partition(d => dirHasData(fs, d._2))
    // fileless batch dirs (all-empty micro-batches) are junk — drop
    // them now so they cannot linger past the compaction that should
    // retire them (readers already treat them as absent). EXCEPT a dir
    // whose only content is an in-flight `_temporary` child: that is a
    // micro-batch mid-write (an unscoped compact racing a live stream),
    // not junk — deleting it would fail the in-flight batch. Leave it.
    fileless.foreach { case (_, p) =>
      if (fs.listStatus(p).exists(f =>
          f.isDirectory && f.getPath.getName == "_temporary"))
        log.warn(s"compact: leaving $p alone — it holds an in-flight " +
          "_temporary write (a live micro-batch); it will fold once landed")
      else fs.delete(p, true)
    }
    def retireIncIfEmpty(): Unit =
      // non-recursive delete fails harmlessly if a batch dir landed
      // concurrently — never race a live stream
      if (fs.exists(incPath) && fs.listStatus(incPath).isEmpty) {
        try { fs.delete(incPath, false); () } catch { case _: java.io.IOException => () }
      }
    if (withData.isEmpty) {
      retireIncIfEmpty()
      if (defragWhenEmpty) partCol match {
        case Some(pc) => compactPartitionedDir(spark, base, pc)
        case None     => compactFlatDir(spark, base)
      }
      0
    } else {
    val baseDf =
      try spark.read.parquet(base)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"compact: cannot read the artifact under $base — build it " +
          s"first: ${e.getMessage}") }
    partCol.foreach(pc => require(baseDf.columns.contains(pc),
      s"compact: $base is not partitioned by '$pc' " +
        s"(columns: ${baseDf.columns.mkString(", ")})"))
    // stage aside FIRST, under the in-progress flag — from here to the
    // flag delete, a crash rolls back; after it, forward
    require(fs.mkdirs(oldInc),
      s"compact: cannot create the stage-aside area $inc.old")
    val flag = new org.apache.hadoop.fs.Path(oldInc, "_folding")
    fs.create(flag, true).close()
    val staged = withData.map { case (id, p) =>
      val dest = new org.apache.hadoop.fs.Path(oldInc, p.getName)
      require(fs.rename(p, dest),
        s"compact: cannot stage the delta dir aside ($p -> $inc.old)")
      (id, dest)
    }
    val stagedBytes = staged.map(d => fs.getContentSummary(d._2).getLength).sum
    val incDf = spark.read.option("basePath", s"$inc.old")
      .parquet(staged.map(_._2.toString): _*).drop("batch")
    val df = baseDf.unionByName(incDf)
    val tmp = s"$base.compact"
    partCol match {
      case Some(pc) =>
        df.repartition(col(pc)).write.mode("overwrite").partitionBy(pc)
          .parquet(tmp)
      case None =>
        val bytes = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(base)).getLength + stagedBytes
        df.repartition(math.max(1L, bytes / (128L << 20) + 1L).toInt)
          .write.mode("overwrite").parquet(tmp)
    }
    fs.delete(flag, false) // rewrite complete: crashes now roll FORWARD
    swapDir(spark, tmp, base)
    fs.delete(oldInc, true)
    retireIncIfEmpty()
    withData.size // folded (= retired) delta dirs, the observability count
    }
    }
  }

  // ------------------------------------------------------------------
  // WHOLE-AREA batch-dir folding — for the ingest tables whose layout
  // is "one batch=<id> dir per micro-batch under ONE area" with no
  // separate base (the exact/near_dup/passage corpus+index areas and
  // the semantic classes area), unlike the retrieval artifacts' base +
  // *_inc split that [[foldIncInto]] serves. Folding many batch dirs
  // into ONE batch dir keeps every existing reader working unchanged:
  // readers do a plain partition-discovery parquet read of the area
  // (the `batch` column is bookkeeping), and the ingests' replay
  // exclusion (`batch =!= currentBatchId`) stays exact because only
  // COMMITTED ids ever fold — a committed batch is never replayed.
  //
  // LAYOUT CONTRACT (the one dialect table): retrieval delta areas and
  // the exact/near_dup/passage areas write plain `batch=<id>` (numeric
  // partition values); the semantic classes / sketch / tar areas write
  // `batch=b<id>` plus the semantic seed's `batch=seed` (string
  // values — the seed dir forces the string type). [[foldBatchArea]]
  // parses BOTH dialects (a non-numeric name like `seed` counts as
  // always-committed) and names the folded dir in the area's own
  // dialect, so the partition column's type never changes under a
  // fold. [[foldIncInto]] stays plain-dialect-only — its writers are.
  // ------------------------------------------------------------------

  private case class AreaDir(
      id: Option[Long], // None = non-numeric (e.g. batch=seed)
      bDialect: Boolean,
      path: org.apache.hadoop.fs.Path)

  /** Parse an area's `batch=` children — the ONE listing both fold
    * families share. `strict` (the operator-issued `mode:"compact"`
    * posture) rejects by name on anything the engine's writers never
    * emit; the in-stream fold path passes strict=false — there one
    * stray file (an OS artifact, a manual touch) must log-and-skip, not
    * throw inside foreachBatch and crash-loop the unattended stream the
    * cadence exists to serve. `plainOnly` (the retrieval *_inc delta
    * contract) additionally treats b-dialect/seed dirs as foreign. The
    * only legal non-numeric value is the semantic index's `batch=seed`:
    * anything else (a manual `batch=12.bak` copy) must NOT silently
    * fold as "always committed" — folding an operator's backup dir
    * would duplicate every row in it. */
  private def areaDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      area: org.apache.hadoop.fs.Path, strict: Boolean,
      plainOnly: Boolean = false): Seq[AreaDir] =
    if (!fs.exists(area)) Nil
    else fs.listStatus(area).toSeq.flatMap { st =>
      val n = st.getPath.getName
      def unexpected(): Option[AreaDir] = {
        require(!strict,
          s"compact: unexpected entry '$n' under $area — " +
            (if (plainOnly) "a delta area holds only batch=<id> dirs"
             else "an ingest area holds only batch=<id>, batch=b<id> " +
               "or batch=seed dirs") +
            " (is this a stray file or a manual copy?)")
        log.warn(s"compact: skipping unrecognized entry '$n' under " +
          s"$area (in-stream fold tolerates strays; an operator-issued " +
          "compact rejects them by name)")
        None
      }
      if (n.startsWith("_") || n.startsWith(".")) None // fold/Spark metadata
      else if (!st.isDirectory || !n.startsWith("batch=")) unexpected()
      else {
        val v = n.drop(6)
        // NON-CANONICAL numeric names (leading zeros: batch=007) reject/
        // skip like any other foreign dir: this engine's ingests always
        // write canonical ids, and a leading-zeros dir would otherwise
        // pass validation here yet break the fold's name-keyed commit
        // phase (foldedDirName normalizes 007 → 7, and no source dir by
        // that name exists — an opaque NoSuchElementException every
        // cadence instead of this named reject; r20 ADVICE).
        def canonical(num: String): Boolean =
          num.length <= 18 && num == num.toLong.toString // >18 digits would overflow Long
        if (v.nonEmpty && v.forall(_.isDigit) && canonical(v))
          Some(AreaDir(Some(v.toLong), bDialect = false, st.getPath))
        else if (!plainOnly && v.startsWith("b") && v.drop(1).nonEmpty &&
            v.drop(1).forall(_.isDigit) && canonical(v.drop(1)))
          Some(AreaDir(Some(v.drop(1).toLong), bDialect = true, st.getPath))
        else if (!plainOnly && v == "seed")
          Some(AreaDir(None, bDialect = false, st.getPath))
        else unexpected()
      }
    }

  private def areaManifest(area: String) =
    new org.apache.hadoop.fs.Path(s"$area/_fold_manifest")
  private def areaTmp(area: String) =
    new org.apache.hadoop.fs.Path(s"$area/_fold_tmp")
  private def areaOld(area: String) =
    new org.apache.hadoop.fs.Path(s"$area/_fold_old")

  /** Heal a crashed [[foldBatchArea]] — exposed for the ingest sinks
    * (run at declaration, like [[healCrashedFold]]). The manifest file
    * records the fold's exact snapshot, so every crash window is
    * mechanically distinguishable (see [[foldBatchArea]]'s protocol):
    *
    *   - `_fold_tmp` complete (has _SUCCESS) → the rewrite finished.
    *     Roll FORWARD: finish staging the manifest's dirs, land the
    *     tmp as the folded `batch=` dir, drop `_fold_old` + manifest.
    *   - `_fold_tmp` absent but `_fold_old` present → the folded dir
    *     already landed (staging only starts after the rewrite, and
    *     the landing rename removes the tmp). Roll FORWARD: drop
    *     `_fold_old` + manifest.
    *   - `_fold_tmp` absent/partial, `_fold_old` absent → the rewrite
    *     never finished (or never started). Roll BACK: drop the
    *     partial tmp + manifest; every source dir is still live.
    *
    * Each branch is idempotent — a crash during recovery lands back in
    * the same branch. */
  private[graft] def healCrashedAreaFold(
      spark: SparkSession, area: String): Unit = {
    val areaPath = new org.apache.hadoop.fs.Path(area)
    val fs = areaPath.getFileSystem(spark.sessionState.newHadoopConf())
    foldLock(area).synchronized {
      val manifestTmp = new org.apache.hadoop.fs.Path(s"$area/_fold_manifest.tmp")
      val leftovers = fs.exists(areaManifest(area)) || fs.exists(manifestTmp) ||
        fs.exists(areaTmp(area)) || fs.exists(areaOld(area))
      if (leftovers)
        withLease(fs, area) { recoverAreaFold(spark, fs, area) }
    }
  }

  /** The [[healCrashedAreaFold]] recovery body — callers hold the
    * per-area lock and lease. */
  private def recoverAreaFold(
      spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      area: String): Unit = {
    val areaPath = new org.apache.hadoop.fs.Path(area)
    val manifest = areaManifest(area)
    val manifestTmp = new org.apache.hadoop.fs.Path(s"$area/_fold_manifest.tmp")
    val tmp = areaTmp(area)
    val old = areaOld(area)
    if (fs.exists(manifestTmp)) fs.delete(manifestTmp, false)
        if (!fs.exists(manifest)) {
          // no manifest = no fold in flight; a leftover tmp is an
          // aborted rewrite (underscore-invisible to readers) — drop
          // it. A _fold_old without a manifest is unreachable through
          // this protocol — reject by name rather than guess.
          if (fs.exists(tmp)) fs.delete(tmp, true)
          require(!fs.exists(old),
            s"compact recovery: $area/_fold_old exists without a fold " +
              "manifest — not a state this engine's folds can leave; " +
              "resolve manually")
          return
        }
        val names = {
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            fs.open(manifest), java.nio.charset.StandardCharsets.UTF_8))
          try Iterator.continually(in.readLine()).takeWhile(_ != null)
            .map(_.trim).filter(_.nonEmpty).toList
          finally in.close()
        }
        val tmpComplete = fs.exists(
          new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
        val outName = foldedDirName(names)
        val outPath = new org.apache.hadoop.fs.Path(areaPath, outName)
        // retire manifest sources other than the max-id one: after the
        // folded dir lands, their rows live in it — they are duplicates
        def retireRest(): Unit = names.filter(_ != outName).foreach { n =>
          val live = new org.apache.hadoop.fs.Path(areaPath, n)
          if (fs.exists(live)) { fs.delete(live, true); () }
        }
        if (tmpComplete) {
          // roll FORWARD: the rewrite finished — the tmp holds the full
          // union, so landing it is correct regardless of which commit
          // steps ran. Stage the max-id source aside (its name is the
          // landing spot), land, retire the rest, clean up.
          if (!fs.exists(old)) require(fs.mkdirs(old),
            s"compact recovery: cannot create $area/_fold_old")
          if (fs.exists(outPath))
            require(fs.rename(outPath,
                new org.apache.hadoop.fs.Path(old, outName)),
              s"compact recovery: cannot stage $outPath aside")
          // the rename MUST be checked: proceeding to the deletes below
          // on a false return would destroy sources while the folded
          // rows sit in the underscore-invisible tmp — which the next
          // heal's no-manifest branch would then drop (data loss)
          require(fs.rename(tmp, outPath),
            s"compact recovery: cannot land $area/_fold_tmp as the " +
              s"folded dir $outName — sources kept; resolve and re-run")
          retireRest()
          fs.delete(old, true)
          fs.delete(manifest, false)
        } else if (!fs.exists(tmp) && fs.exists(old)) {
          // the folded dir already landed (staging precedes the land
          // and the land consumed the tmp) — finish retiring + cleanup
          require(fs.exists(outPath),
            s"compact recovery: the folded dir $outName is missing " +
              s"under $area while $area/_fold_old exists — a foreign " +
              "writer removed it; resolve manually")
          retireRest()
          fs.delete(old, true)
          fs.delete(manifest, false)
        } else {
          // roll BACK: the rewrite never completed (partial or absent
          // tmp, nothing staged yet); every source is still live
          if (fs.exists(tmp)) fs.delete(tmp, true)
          fs.delete(manifest, false)
        }
        ()
  }

  /** How many `batch=` dirs an ingest area currently holds (both
    * dialects; strays skipped) — the `ingest_compact` health readout. */
  def areaBatchDirCount(spark: SparkSession, area: String): Long = {
    val p = new org.apache.hadoop.fs.Path(area)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    areaDirs(fs, p, strict = false).size.toLong
  }

  /** The folded output dir's name for a manifest/snapshot of source dir
    * names: max numeric id, in the sources' own dialect. */
  private def foldedDirName(names: Seq[String]): String = {
    val parsed = names.flatMap { n =>
      val v = n.stripPrefix("batch=")
      if (v.startsWith("b") && v.drop(1).nonEmpty && v.drop(1).forall(_.isDigit))
        Some((v.drop(1).toLong, true))
      else if (v.nonEmpty && v.forall(_.isDigit)) Some((v.toLong, false))
      else None
    }
    require(parsed.nonEmpty,
      "compact: a fold needs at least one numeric batch=<id> dir to name " +
        "its output")
    val dialects = parsed.map(_._2).distinct
    require(dialects.size == 1,
      "compact: mixed batch=<id> and batch=b<id> dialects in one area — " +
        "not a layout this engine's ingests write; resolve manually")
    val k = parsed.map(_._1).max
    if (dialects.head) s"batch=b$k" else s"batch=$k"
  }

  /** Fold an ingest AREA's committed `batch=` dirs into ONE compacted,
    * size-targeted `batch=` dir named after the highest folded id — the
    * small-files defense for the ingest tables that grow one directory
    * per micro-batch forever (exact/near_dup/passage corpus + index,
    * semantic classes). Readers are unchanged: the area stays a plain
    * partition-discovery parquet read, rows just move from many batch
    * partitions into one whose id is committed (so the ingests' replay
    * exclusion never matches it).
    *
    * `maxBatchId` scopes the fold to COMMITTED batches (pass the ingest
    * checkpoint's [[lastCommittedBatch]], or `batchId - 1` from inside
    * foreachBatch); an uncommitted landed dir stays for the crash
    * replay to overwrite — folding it first would duplicate its rows
    * once the replay re-lands it. Non-numeric dirs (`batch=seed`) are
    * always committed and always fold. `minDirs` keeps the in-stream
    * cadence from rewriting a single already-folded dir every N
    * batches (pass 2 there; 1 = explicit defrag).
    *
    * Crash discipline — SELF-HEALING via a MANIFEST (the r18 lesson
    * inverted: rewrite-first is only safe when the snapshot boundary
    * is recorded somewhere): the fold writes `_fold_manifest` (the
    * exact source-dir list) first, then the compacted rewrite to
    * `_fold_tmp` (underscore = invisible to readers — the area serves
    * reads untouched for the WHOLE O(area) rewrite), and only then the
    * commit phase: stage sources into `_fold_old`, rename the tmp to
    * the folded dir, drop `_fold_old` + manifest. A crash anywhere is
    * rolled forward/back by [[healCrashedAreaFold]] — the tmp's
    * _SUCCESS marker says whether the rewrite finished, the manifest
    * says exactly which dirs were in the fold. Readers racing the
    * commit phase (metadata renames only, DUPLICATION-PREFERRING — see
    * the commit-phase comment below) can miss at most ONE batch for one
    * rename gap and otherwise briefly see duplicates, which is the
    * benign direction for dedup-probe readers — the opposite trade from
    * [[foldIncInto]]'s absence-preferring order. */
  def foldBatchArea(
      spark: SparkSession, area: String,
      maxBatchId: Option[Long] = None,
      strict: Boolean = true,
      minDirs: Int = 1): Int = foldLock(area).synchronized {
    val areaPath = new org.apache.hadoop.fs.Path(area)
    val fs = areaPath.getFileSystem(spark.sessionState.newHadoopConf())
    withLease(fs, area) {
      recoverAreaFold(spark, fs, area)
      val snapshot = areaDirs(fs, areaPath, strict)
        .filter(d => d.id.forall(id => maxBatchId.forall(id <= _)))
        .sortBy(_.id.getOrElse(-1L))
      val (withData, fileless) =
        snapshot.partition(d => dirHasData(fs, d.path))
      fileless.foreach { d =>
        if (fs.listStatus(d.path).exists(f =>
            f.isDirectory && f.getPath.getName == "_temporary"))
          log.warn(s"compact: leaving ${d.path} alone — in-flight " +
            "_temporary write")
        else fs.delete(d.path, true)
      }
      if (withData.size < math.max(minDirs, 1) ||
          !withData.exists(_.id.isDefined)) 0
      else {
      val names = withData.map(_.path.getName)
      val outName = foldedDirName(names) // validates dialect consistency
      // manifest FIRST (atomically, via rename): from here until the
      // manifest is deleted, recovery knows the fold's exact snapshot
      val manifestTmp =
        new org.apache.hadoop.fs.Path(s"$area/_fold_manifest.tmp")
      val out = fs.create(manifestTmp, true)
      try out.write(names.mkString("", "\n", "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(manifestTmp, areaManifest(area)),
        s"compact: cannot land the fold manifest under $area")
      // the O(area) rewrite — readers untouched (tmp is underscore-
      // invisible); no `batch` column in the files, the dir name IS it.
      // mergeSchema: a column added upstream mid-stream must survive
      // the fold (the default single-footer inference would silently
      // DROP columns absent from whichever file it sampled; merged,
      // older rows read the new column as null — exactly what the
      // area's partition-discovery readers already see)
      val bytes = withData
        .map(d => fs.getContentSummary(d.path).getLength).sum
      val nFiles = math.max(1L, bytes / (128L << 20) + 1L).toInt
      spark.read.option("mergeSchema", "true")
        .parquet(withData.map(_.path.toString): _*)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(areaTmp(area).toString)
      // COMMIT PHASE: metadata renames only, ordered so a concurrent
      // reader (a batch job probing the index while an operator-issued
      // ingest_compact runs beside the live stream) can at worst miss
      // ONE batch's rows for one rename gap — the max-id source stages
      // aside, the folded dir immediately lands under its name — and
      // then briefly sees the REMAINING sources duplicated (their rows
      // are in the folded dir too) until they retire. Duplication is
      // the benign direction for every dedup-probe reader: the probes
      // are existence-shaped (a key present twice dedups identically),
      // whereas missing committed history admits duplicates PERMANENTLY.
      // (foldIncInto deliberately keeps the opposite, absence-preferring
      // order: BM25 scores double-count under duplication but only turn
      // conservative under absence.)
      val old = areaOld(area)
      require(fs.mkdirs(old),
        s"compact: cannot create the stage-aside area $area/_fold_old")
      val outPath = new org.apache.hadoop.fs.Path(areaPath, outName)
      val kSrc = withData.find(_.path.getName == outName).get // max id — always present
      require(fs.rename(kSrc.path,
          new org.apache.hadoop.fs.Path(old, outName)),
        s"compact: cannot stage ${kSrc.path} aside")
      require(fs.rename(areaTmp(area), outPath),
        s"compact: cannot land the folded dir $outName under $area")
      // the folded dir now serves every reader; retire the duplicates
      withData.filter(_.path.getName != outName)
        .foreach(d => fs.delete(d.path, true))
      fs.delete(old, true)
      fs.delete(areaManifest(area), false)
      withData.size // folded source dirs, the observability count
      }
    }
  }

  /** One small JSON file per completed in-stream fold under
    * `$root/_fold_log/` — the `compact_every` cadence's production
    * signal (an operator can verify the cadence actually fires by
    * listing it; log lines alone vanish with the driver). One FILE per
    * fold, not an append (object stores don't append); pruned to the
    * newest 64 so the log itself can never become a small-files
    * problem. Underscore-prefixed = invisible to every data reader. */
  private[graft] def appendFoldLog(
      spark: SparkSession, root: String, batchId: Long,
      foldedThrough: Long, dirsRetired: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_fold_log")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val f = new org.apache.hadoop.fs.Path(dir, f"fold-$batchId%012d.json")
    val out = fs.create(f, true)
    try out.write(
      (s"""{"batch_id":$batchId,"folded_through":$foldedThrough,""" +
        s""""dirs_retired":$dirsRetired,""" +
        s""""ts_ms":${System.currentTimeMillis()}}""" + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val files = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("fold-")).sortBy(_.getName)
    files.dropRight(64).foreach(fs.delete(_, false))
    ()
  }

  /** dest → dest.old, tmp → dest, drop dest.old (see caveat above). */
  private def swapDir(spark: SparkSession, tmp: String, dest: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(conf)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(dest + ".old")
    if (fs.exists(oldPath)) fs.delete(oldPath, true)
    require(fs.rename(destPath, oldPath),
      s"compact: cannot stage $dest aside (rename to $oldPath failed)")
    require(fs.rename(tmpPath, destPath),
      s"compact: cannot land $tmp at $dest — the pre-compact artifact " +
        s"is intact at $oldPath")
    fs.delete(oldPath, true)
    ()
  }

  /** Recursive delete, no-op when absent — the rebuild paths' stale-
    * delta cleanup. */
  private[ops] def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private[ops] def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
