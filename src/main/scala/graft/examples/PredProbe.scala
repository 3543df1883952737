package graft.examples

import org.apache.spark.sql.SparkSession

/** Diagnostic: prints the V2 Predicates Spark pushes for assorted
  * time-shaped filters (month()/day()/date_trunc()/extract), so the
  * implication lane targets shapes that actually arrive.
  */
object PredProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.debug.predicates") = "1"
    val dir = "/tmp/graft-predprobe"
    spark.range(0, 100)
      .selectExpr("id", "timestamp'2026-01-01 00:00:00' + make_dt_interval(cast(id as int), 0, 0, 0) AS ts")
      .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    for ((label, cond) <- Seq(
      "month=" -> "month(ts) = 3",
      "day=" -> "day(ts) = 15",
      "extract_month" -> "extract(month from ts) = 3",
      "date_trunc_eq" -> "date_trunc('MONTH', ts) = timestamp'2026-03-01'",
      "to_date_eq" -> "to_date(ts) = date'2026-03-01'",
      "cast_date_eq" -> "cast(ts as date) = date'2026-03-01'",
      "hour_eq" -> "hour(ts) = 13",
      "extract_hour" -> "extract(hour from ts) = 13",
      "dayofmonth" -> "dayofmonth(ts) = 2",
      "year_and_month" -> "year(ts) = 2026 AND month(ts) = 3")) {
      System.err.println(s"---- $label: $cond")
      g.filter(cond).count()
    }
    spark.stop()
  }
}
