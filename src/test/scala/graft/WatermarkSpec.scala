package graft

import graft.spec.AggSpec
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Watermark semantics: a row older than the watermark is DROPPED, not
  * aggregated — proven across two micro-batch runs sharing a checkpoint
  * (state and watermark persist across restarts). */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("late rows beyond the watermark are dropped in append mode") {
    val dir = Files.createTempDirectory("graft_wm").toString
    val srcDir = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    val outDir = s"$dir/out"
    new java.io.File(srcDir).mkdirs()

    def ts(h: Double) = new Timestamp((h * 3600 * 1000).toLong)
    def write(name: String, rows: Seq[(Timestamp, Long, Double)]): Unit =
      rows.toDF("ts", "user_id", "value").repartition(1)
        .write.mode("overwrite").parquet(s"$srcDir/$name")

    // batch 1: two rows in window [1h, 2h) plus one at 3h. After this
    // batch the watermark is 3.0h - 30min = 2.5h, so window [1,2) (end
    // 2.0h < 2.5h) can no longer accept rows — anything arriving for it
    // later is too late by definition.
    write("b1", Seq((ts(1.1), 1L, 1.0), (ts(1.2), 1L, 1.0), (ts(3.0), 1L, 1.0)))

    val schema = spark.read.parquet(s"$srcDir/b1").schema
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
      val agg = Streaming.windowedAgg(
        in, "ts", "1 hour", None, Seq("user_id"),
        Seq(AggSpec("*", "count", Some("n"))), watermark = Some("30 minutes"))
      // file sink: supports checkpoint recovery (memory sink does not)
      // and accumulates appended windows across both runs
      val q = agg.writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce() // watermark now 3.0h - 0.5h = 2.5h; nothing emitted yet

    // batch 2: one LATE row at 1.5h — its window [1,2) ended before the
    // 2.5h watermark, so it must be dropped — and one fresh row at 6h
    // that advances the watermark and flushes the closed windows.
    write("b2", Seq((ts(1.5), 1L, 100.0), (ts(6.0), 1L, 1.0)))
    runOnce()

    val out = spark.read.parquet(outDir)
      .select(col("win_start"), col("n")).collect()
      .map(r => r.getTimestamp(0).getTime / 3600000.0 -> r.getLong(1)).toMap
    // window [1,2) was finalized with ONLY the two on-time batch-1 rows —
    // the late batch-2 row at 1.5h was dropped, not merged
    assert(out.get(1.0).contains(2L),
      s"window[1h,2h) should hold exactly the 2 on-time rows, got $out")
    // the [3,4) window (row at 3.0h) also flushed by the 6h watermark
    assert(out.get(3.0).contains(1L))
    // the 6h row's own window is still open (watermark 5.5h) → not emitted
    assert(!out.contains(6.0))
  }
}
