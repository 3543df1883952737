package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-throughput comparison: graft vs parquet on identical cached input
  * (mirrors the reference's write benches — BASELINE.md targets graft write
  * wall time ≤ 2× parquet). Usage:
  *   sbt "runMain graft.examples.WriteBench [sfDir]"
  */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      // Tables.parquet normalizes events.ts adaptively across testdata generations
      var df: DataFrame = graft.Tables.parquet(spark, sfDir, t).cache()
      df.count() // materialize input outside the timed region
      // warmup both writers once
      df.write.format("graft").mode("overwrite").save(s"/tmp/graft-wbench/$t-g")
      df.write.mode("overwrite").parquet(s"/tmp/graft-wbench/$t-p")
      val gSec = time(df.write.format("graft").mode("overwrite").save(s"/tmp/graft-wbench/$t-g"))
      val pSec = time(df.write.mode("overwrite").parquet(s"/tmp/graft-wbench/$t-p"))
      println(f"$t%-12s graft=$gSec%6.2fs parquet=$pSec%6.2fs ratio=${gSec / pSec}%5.2f")
      df.unpersist()
    }
    spark.stop()
  }
}
