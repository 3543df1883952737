package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming coverage (SURVEY.md §2.9 — absent in the reference;
  * capability supplied by Spark). The events table is replayed as a file
  * stream, aggregated with a 1-hour event-time window, and drained into a
  * memory sink synchronously, so the result is deterministic and the DuckDB
  * batch oracle can check it exactly.
  */
object Streaming {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_hourly" -> { (s, dir) =>
      val name = "graft_stream_hourly"
      s.streams.active.filter(q => q.name == name).foreach(_.stop())
      // stream THROUGH the graft format: native readStream.format("graft")
      // (GraftMicroBatchStream), not a parquet staging path
      val gdir = graft.Tables.graftDir(s, dir, "events")
      val staticSchema = s.read.format("graft").load(gdir).schema
      val stream = s.readStream.format("graft").schema(staticSchema).load(gdir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
        .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name).orderBy(col("hour"), col("event_type"))
    })

  val oracles: Map[String, String] = Map(
    "s_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)
}
