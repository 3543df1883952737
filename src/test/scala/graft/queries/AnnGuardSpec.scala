package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** s_ann_bruteforce is a deliberately quadratic recall oracle; the
  * row-count guard must refuse to aim it at anything bigger than the
  * configured cap (and still run normally under it).
  */
class AnnGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("brute-force ANN refuses inputs above the configured cap") {
    spark.conf.set("graft.ann.bruteForceMaxRows", "5")
    try {
      val e = intercept[IllegalArgumentException](
        graft.SparkEntry.queries("s_ann_bruteforce")(spark, sf))
      assert(e.getMessage.contains("quadratic"), e.getMessage)
    } finally spark.conf.unset("graft.ann.bruteForceMaxRows")
  }

  test("brute-force ANN runs under the default cap") {
    assert(graft.SparkEntry.queries("s_ann_bruteforce")(spark, sf).count() == 50)
  }
}
