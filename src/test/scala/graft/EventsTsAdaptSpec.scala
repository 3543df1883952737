package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver regenerates testdata between rounds and has already changed
  * events.ts's physical type once (int64 nanos → timestamp[us], which cost
  * round 8 its bench artifact and 11 queries). Tables.parquet must
  * normalize every generation it has seen to TimestampType with identical
  * instant values.
  */
class EventsTsAdaptSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // one known instant: 2026-01-02T03:04:05.123456Z
  private val micros = 1767323045123456L

  private def write(dir: String)(build: => org.apache.spark.sql.DataFrame): String = {
    val d = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    build.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedTs(dir: String): (DataType, Long) = {
    val df = Tables.parquet(spark, dir, "events")
    val t = df.schema("ts").dataType
    val v = df.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0)
    (t, v)
  }

  test("int64-nanos generation normalizes to the same timestamp") {
    import spark.implicits._
    val dir = write("/tmp/graft-test/events-gen-nanos") {
      Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    }
    assert(loadedTs(dir) == (TimestampType, micros))
  }

  test("timestamp[us] (NTZ inference) generation normalizes identically") {
    val dir = write("/tmp/graft-test/events-gen-ntz") {
      // session tz is UTC, so the NTZ cast preserves the instant; the
      // parquet annotation (isAdjustedToUTC=false) then matches what the
      // driver's generator writes
      spark.sql(s"SELECT 1L AS event_id, CAST(timestamp_micros($micros) AS timestamp_ntz) AS ts")
    }
    assert(loadedTs(dir) == (TimestampType, micros))
  }

  test("timestamp-with-tz generation passes through unchanged") {
    val dir = write("/tmp/graft-test/events-gen-tz") {
      spark.sql(s"SELECT 1L AS event_id, timestamp_micros($micros) AS ts")
    }
    assert(loadedTs(dir) == (TimestampType, micros))
  }
}
