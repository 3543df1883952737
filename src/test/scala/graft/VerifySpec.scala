package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The correctness-dump harness must never let a declared query vanish
  * silently: a failing query has to leave an errors.json entry and a
  * _FAILED marker (the round-8 events regression hid 11 broken queries
  * behind a smaller-but-green artifact).
  */
class VerifySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("failing queries land in errors.json and _FAILED, successes in parquet") {
    val out = "/tmp/graft-test/verify-failvis"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    // a bogus sfDir makes every selected query throw at read time; one
    // query against the real testdata proves the success path coexists
    val errs = Verify.run(spark, "/root/testdata/sf0.001", out,
      Some(Set("q1_pricing_summary")))
    assert(errs.isEmpty)
    assert(new java.io.File(s"$out/q1_pricing_summary").exists())

    val out2 = "/tmp/graft-test/verify-failvis2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    val errs2 = Verify.run(spark, "/tmp/graft-test/no-such-sfdir", out2,
      Some(Set("q1_pricing_summary", "q6_forecast_revenue")))
    assert(errs2.keySet == Set("q1_pricing_summary", "q6_forecast_revenue"),
      s"expected both queries to fail, got ${errs2.keySet}")
    assert(new java.io.File(s"$out2/_FAILED/q1_pricing_summary").exists())
    assert(new java.io.File(s"$out2/_FAILED/q6_forecast_revenue").exists())
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out2/errors.json"))
    assert(errJson.contains("q1_pricing_summary") && errJson.contains("q6_forecast_revenue"))
    // the artifact stays parseable for the driver
    assert(errJson.trim.startsWith("{") && errJson.trim.endsWith("}"))
  }
}
