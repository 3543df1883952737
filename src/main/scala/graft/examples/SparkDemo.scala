package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end DSv2 smoke: parquet → graft write (options exercised) → read →
  * aggregate parity vs parquet, plus a pruned + filtered scan with the
  * zone-map skip counters printed. Usage:
  *   sbt "runMain graft.examples.SparkDemo [sfDir]"
  */
object SparkDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = "/tmp/graft-demo/orders"
    src.orderBy("o_orderkey")
      .write.format("graft")
      .option("compression", "lz4")
      .option("pagesize", "4096")
      .mode("overwrite").save(dir)

    val g = spark.read.format("graft").load(dir)
    println(s"rows: graft=${g.count()} parquet=${src.count()}")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(20,4)")).as("t"))
        .orderBy("o_orderstatus").collect().toSeq
    val ok = agg(g) == agg(src)
    println(s"aggregate parity vs parquet: $ok")
    require(ok, "graft aggregate diverged from parquet")

    graft.spark.GraftMetrics.pageGroupsSkipped.set(0)
    graft.spark.GraftMetrics.pageGroupsRead.set(0)
    val n = g.filter(col("o_orderkey") < 100).count()
    println(s"filtered count=$n, page groups skipped=" +
      s"${graft.spark.GraftMetrics.pageGroupsSkipped.get()} read=" +
      s"${graft.spark.GraftMetrics.pageGroupsRead.get()}")

    g.select("o_orderkey", "o_totalprice").filter(col("o_orderkey") < 100)
      .explain("formatted")
    spark.stop()
  }
}
