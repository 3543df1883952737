package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spill / shuffle telemetry for selected queries (guide §5): runs each
  * query once per format with a stage listener and reports, per query, the
  * summed shuffle read/write bytes, memory/disk spill bytes, and the max
  * per-stage peak execution memory. The r19 verdict's #7 asked for exactly
  * this at the x10 staging for the biggest shuffles — the artifact lands in
  * tools/spill_audit_r20.json.
  *
  *   sbt "runMain graft.examples.SpillProbe d_dedup_simhash,... /root/testdata/sf0.1 10"
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val qs = (if (args.length > 0) args(0)
      else "d_dedup_simhash,d_dedup_minhash_lsh,d_dedup_semantic2,d_dedup_segments")
      .split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val out = if (args.length > 3) args(3) else "tools/spill_audit_r20.json"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (factor > 1) graft.Bench.stageAmplified(spark, sfDir, factor) else sfDir
    graft.Tables.all.foreach(t => graft.Tables.load(spark, dir, t))

    final class Acc {
      var shufRead = 0L; var shufWrite = 0L
      var memSpill = 0L; var diskSpill = 0L
      var peakExecMem = 0L; var stages = 0
    }
    @volatile var acc = new Acc
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val a = acc
          a.synchronized {
            a.shufRead += m.shuffleReadMetrics.totalBytesRead
            a.shufWrite += m.shuffleWriteMetrics.bytesWritten
            a.memSpill += m.memoryBytesSpilled
            a.diskSpill += m.diskBytesSpilled
            a.peakExecMem = math.max(a.peakExecMem, m.peakExecutionMemory)
            a.stages += 1
          }
        }
      }
    })

    val impl: Map[String, (SparkSession, String) => DataFrame] = Map(
      "d_dedup_minhash_lsh" -> ((s, d) => graft.queries.TrainingData.minhashLsh(s, d, portable = false)),
      "d_dedup_simhash" -> ((s, d) => graft.queries.TrainingData.simhashDedup(s, d, portable = false)))

    val sb = new StringBuilder("{\n")
    var first = true
    for (q <- qs; fmt <- Seq("graft", "parquet")) {
      spark.catalog.clearCache()
      sys.props("graft.tables.format") = fmt
      try {
        val df = impl.getOrElse(q, graft.SparkEntry.queries(q))(spark, dir)
        acc = new Acc
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(1500)
        val a = acc
        val line =
          f""""$q/$fmt":{"sec":$sec%.3f,"stages":${a.stages},"shuffle_read_mb":${a.shufRead / 1e6}%.1f,"shuffle_write_mb":${a.shufWrite / 1e6}%.1f,"mem_spill_mb":${a.memSpill / 1e6}%.1f,"disk_spill_mb":${a.diskSpill / 1e6}%.1f,"peak_exec_mem_mb":${a.peakExecMem / 1e6}%.1f}"""
        println(s"SPILLPROBE $line")
        if (!first) sb.append(",\n")
        sb.append("  ").append(line)
        first = false
      } finally sys.props.remove("graft.tables.format")
    }
    sb.append("\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}
