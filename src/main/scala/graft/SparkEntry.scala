package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads the TPC-H-ish tables THROUGH the graft columnar format
  * (Tables.load converts parquet -> .graft once, then scans .graft), so the
  * correctness gate exercises storage + Catalyst end to end. Oracle SQL runs
  * in DuckDB against the original parquet.
  *
  * Numeric convention: double aggregates go through decimal(20,4) so Spark
  * and DuckDB sum EXACTLY the same values in exact arithmetic, then cast back
  * to double — this makes hash-compare deterministic regardless of
  * float summation order.
  */
object SparkEntry {

  /** sum of a double column, exact via decimal, returned as double */
  private def dsum(c: String) = sum(col(c).cast("decimal(20,4)")).cast("double")
  private def davg(c: String) =
    sum(col(c).cast("decimal(20,4)")).cast("double") / count(lit(1))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ graft.queries.Relational.queries ++
      graft.queries.RelationalExt.queries ++
      graft.queries.TrainingData.queries ++ graft.queries.Streaming.queries ++
      graft.queries.Functions.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1).cast("decimal(20,4)") - col("l_discount").cast("decimal(20,4)")))
            .cast("double").as("sum_disc_price"),
          davg("l_quantity").as("avg_qty"),
          davg("l_extendedprice").as("avg_price"),
          davg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q6_forecast_revenue" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
          col("l_discount").cast("decimal(20,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    baseOracles ++ graft.queries.Relational.oracles ++
      graft.queries.RelationalExt.oracles ++
      graft.queries.TrainingData.oracles ++ graft.queries.Streaming.oracles ++
      graft.queries.Functions.oracles

  private def baseOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
}
