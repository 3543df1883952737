package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B of the async leaf prefetch pool
  * (graft.read.prefetch.threads default vs 0) on scan-heavy queries, one
  * JVM, alternating runs. Quantifies what the pool buys on THIS storage;
  * on local NVMe + warm page cache the win is bounded by decode overlap,
  * while on high-latency object stores the same mechanism collapses
  * latency×leaves to latency×1 (the design target). Writes
  * tools/prefetch_ab.json so the number ships with the round.
  *
  *   sbt "runMain graft.examples.PrefetchAB /root/testdata/sf0.1 5"
  */
object PrefetchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val queries = Seq("q1_pricing_summary", "q_sorted_scan", "t_token_stats")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t))

    def time(q: String, threads: String): Double = {
      spark.catalog.clearCache()
      // the reader looks up the UNPREFIXED key on the conf newHadoopConf()
      // builds per scan; runtime SQLConf entries copy into it verbatim
      // (no spark.hadoop.-prefix stripping at this layer), so the stripped
      // form is the one that actually reaches GraftColumnarReader — the
      // prefixed form only works when set on SparkConf at JVM startup
      spark.conf.set("graft.read.prefetch.threads", threads)
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = queries.map { q =>
      time(q, "1"); time(q, "0") // warm both paths
      val on = collection.mutable.ArrayBuffer[Double]()
      val off = collection.mutable.ArrayBuffer[Double]()
      (1 to runs).foreach { i =>
        if (i % 2 == 0) { on += time(q, "1"); off += time(q, "0") }
        else { off += time(q, "0"); on += time(q, "1") }
      }
      val before = graft.spark.GraftMetrics.leavesPrefetched.get()
      time(q, "1")
      val prefetched = graft.spark.GraftMetrics.leavesPrefetched.get() - before
      println(f"$q%-24s on ${on.min}%.3f s  off ${off.min}%.3f s  " +
        f"ratio ${on.min / off.min}%.2f  leaves_prefetched $prefetched")
      (q, on.min, off.min, prefetched)
    }
    val json = results.map { case (q, on, off, n) =>
      f""""$q":{"prefetch_on_sec":$on%.3f,"prefetch_off_sec":$off%.3f,"ratio":${on / off}%.3f,"leaves_prefetched":$n}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("tools/prefetch_ab.json"), json + "\n")
    spark.stop()
  }
}
