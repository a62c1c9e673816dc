package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query JOB-LEVEL profiler (dev tool, r21 optimization round): runs the
  * named queries exactly as Bench does (noop sink, cache hygiene after) under
  * a SparkListener that records every job's wall time, task time, shuffle
  * bytes and GC time — the guide §1 "where is the time going" instrument for
  * multi-action lifecycle queries, whose cost the SQL-plan view can't see.
  *
  *   sbt "runMain graft.ProfileJobs q275_bm25_ingest_lifecycle ..."
  */
object ProfileJobs {
  private case class JobRow(
      id: Int, desc: String, wallMs: Long,
      var taskMs: Long = 0L, var gcMs: Long = 0L,
      var shufR: Long = 0L, var shufW: Long = 0L,
      var inB: Long = 0L, var outB: Long = 0L, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = LocalConf(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // ad-hoc A/B overrides: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job bookkeeping (driver-side, single-threaded queries): ONE row per
    // jobId, task metrics folded into the same row
    val stageAgg =
      new scala.collection.mutable.LinkedHashMap[String, Array[Double]]
    val rowsById = new scala.collection.mutable.LinkedHashMap[Int, JobRow]
    val starts = new scala.collection.mutable.HashMap[Int, Long]
    val stageToJob = new scala.collection.mutable.HashMap[Int, Int]
    def rowFor(jid: Int): JobRow =
      rowsById.getOrElseUpdate(jid, JobRow(jid, "", 0))
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // stage name carries the call site ("parquet at Streaming.scala:641")
        // — the attribution that survives streaming's description noise
        val desc = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("")
        starts(j.jobId) = j.time
        val r = rowFor(j.jobId)
        rowsById(j.jobId) = r.copy(desc = desc)
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          val r = rowFor(j.jobId)
          rowsById(j.jobId) = r.copy(wallMs = j.time - t0)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) stageToJob.get(t.stageId).foreach { jid =>
          val row = rowFor(jid)
          row.taskMs += m.executorRunTime
          row.gcMs += m.jvmGCTime
          row.shufR += m.shuffleReadMetrics.totalBytesRead
          row.shufW += m.shuffleWriteMetrics.bytesWritten
          row.inB += m.inputMetrics.bytesRead
          row.outB += m.outputMetrics.bytesWritten
          row.tasks += 1
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val key = f"s${si.stageId}%04d(${si.numTasks}%d) " +
          si.name.takeWhile(_ != '\n')
        val ms = si.taskMetrics
        val cur = stageAgg.getOrElseUpdate(key, Array(0.0, 0.0, 0.0))
        cur(0) += 1
        if (ms != null) { cur(1) += ms.executorRunTime / 1e3 }
        cur(2) += si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Bench-identical warm-up (small): absorb codegen/JIT
    Tables.registerViews(spark, sfDir)
    spark.table("lineitem").groupBy("l_returnflag").count().count()

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q275_bm25_ingest_lifecycle")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { r =>
        rowsById.clear(); starts.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // give listener events a moment to drain
        Thread.sleep(300)
        val rows = rowsById.values.toSeq
        println(f"\n=== $name run$r wall=$wall%.2f s  jobs=${rows.size}  " +
          f"jobWallSum=${rows.map(_.wallMs).sum / 1e3}%.2f s")
        rows.sortBy(-_.wallMs).take(28).foreach { j =>
          println(f"  job${j.id}%-4d wall=${j.wallMs / 1e3}%6.2f s task=${j.taskMs / 1e3}%7.2f s " +
            f"gc=${j.gcMs / 1e3}%5.2f tasks=${j.tasks}%4d " +
            f"shufR=${j.shufR / 1e6}%7.1fMB shufW=${j.shufW / 1e6}%7.1fMB " +
            f"in=${j.inB / 1e6}%7.1fMB out=${j.outB / 1e6}%7.1fMB  ${j.desc.take(70)}")
        }
        println("  --- stages by cumulative task time ---")
        stageAgg.toSeq.sortBy(-_._2(1)).take(24).foreach { case (k, a) =>
          println(f"  n=${a(0).toInt}%3d task=${a(1)}%7.2f s wall=${a(2) / 1e3}%6.2f s  ${k.take(95)}")
        }
        stageAgg.clear()
        graft.compile.Compiler.releaseAllCaches()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
