package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Async leaf-prefetch read path: a scan submits every projected leaf's
  * ranged read to the shared pool at reader construction, so fetches
  * overlap instead of serializing on first decode access. The spec pins
  * (a) correctness is unchanged with prefetch racing the decode thread,
  * (b) the pool actually runs (leavesPrefetched moves), and (c) the
  * `graft.read.prefetch.threads=0` kill switch disables it.
  */
class PrefetchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    val d = "/tmp/graft-test/prefetch-wide"
    // 8 leaves of mixed width so several ranged reads exist per file
    spark.range(50000).selectExpr(
      "id", "id * 3 AS a", "cast(id % 97 as double) AS b",
      "concat('row-', id) AS s", "cast(id % 2 = 0 as boolean) AS flag",
      "array(id, id + 1) AS arr", "cast(id as decimal(20,2)) AS dec",
      "id % 1000 AS bucket")
      .write.format("graft").mode("overwrite").save(d)
    d
  }

  test("prefetch pool fetches projected leaves and results are correct") {
    val before = GraftMetrics.leavesPrefetched.get()
    val rows = spark.read.format("graft").load(dir)
      .selectExpr("sum(a) AS sa", "sum(bucket) AS sb", "count(s) AS n")
      .collect()
    assert(rows.head.getLong(2) == 50000L)
    assert(rows.head.getLong(0) == (0L until 50000L).map(_ * 3).sum)
    assert(GraftMetrics.leavesPrefetched.get() > before,
      "prefetch pool never completed a leaf fetch")
  }

  test("graft.read.prefetch.threads=0 disables the pool") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("graft.read.prefetch.threads", 0)
    try {
      val before = GraftMetrics.leavesPrefetched.get()
      // sums force a real multi-leaf scan (COUNT alone would satisfy the
      // footer-only aggregate pushdown and never build a columnar reader)
      val r = spark.read.format("graft").load(dir)
        .selectExpr("sum(a) AS sa", "sum(b) AS sb", "count(s) AS n").collect()
      assert(r.head.getLong(2) == 50000L)
      assert(GraftMetrics.leavesPrefetched.get() == before,
        "prefetch ran despite threads=0")
    } finally hc.unset("graft.read.prefetch.threads")
  }

  test("single-leaf projection skips prefetch (no overlap to win)") {
    val before = GraftMetrics.leavesPrefetched.get()
    // one projected leaf => active.length < 2 => no submission
    val r = spark.read.format("graft").load(dir)
      .selectExpr("sum(a) AS sa").collect()
    assert(r.head.getLong(0) == (0L until 50000L).map(_ * 3).sum)
    assert(GraftMetrics.leavesPrefetched.get() == before)
  }
}
