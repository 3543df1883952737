package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: time one SparkEntry query N times over graft storage at a
  * given scale dir (warm-state convergence separates plan cost from JIT
  * noise — bench n=1 numbers include the first-run spread).
  *
  *   sbt "runMain graft.examples.QueryTimer q5_local_supplier /root/testdata/sf0.1 5"
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q5_local_supplier"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 5
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra session confs: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t))
    (1 to runs).foreach { i =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"RUN$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
