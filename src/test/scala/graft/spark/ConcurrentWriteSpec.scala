package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer commit arbitration: every batch/streaming commit's
  * publish sequence (sort-marker decision, renames, manifest, retire
  * phase) runs under the table mutex, so simultaneous appends to one
  * directory linearize instead of interleaving on the shared table
  * metadata. The 1000-executor reality this pins: many ingest jobs
  * target one table; without arbitration the sort marker's
  * read-clear-republish window could certify a whole-table sort over a
  * concurrent unsorted append's files (silently wrong top-N answers).
  */
class ConcurrentWriteSpec extends AnyFunSuite {
  private val base = "/tmp/graft-test/concwrite"

  lazy val spark: SparkSession = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def conf = spark.sessionState.newHadoopConf()

  private def inParallel(n: Int)(f: Int => Unit): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (0 until n).map(i => pool.submit(new Runnable {
        override def run(): Unit = f(i)
      }))
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("8 simultaneous appends to one directory linearize: no lost commits") {
    val dir = s"$base/appends"
    inParallel(8) { i =>
      spark.range(i * 1000, (i + 1) * 1000)
        .selectExpr("id AS k", "id * 2 AS v")
        .write.format("graft").mode("append").save(dir)
    }
    val g = spark.read.format("graft").load(dir)
    assert(g.count() == 8000)
    assert(g.agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("k"))).head.getLong(0) == 8000,
      "every commit's rows visible exactly once")
    // one manifest per commit — none lost, none doubled
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val manifests = GraftManifest.list(fs, new org.apache.hadoop.fs.Path(dir))
    assert(manifests.size == 8, s"expected 8 commit manifests, got $manifests")
    // the commit lock released cleanly (no stale lock file pinning the table)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, GraftTableLock.LockName)))
  }

  test("racing sorted and unsorted appends can never strand a sort marker") {
    // the exact interleave arbitration exists for: an unsorted append
    // clears the whole-table sort marker; a concurrent sorted append that
    // read the marker BEFORE the clear must not republish it over the
    // unsorted files. Under the commit lock the marker decision and the
    // publish are one atomic section, so whatever order the commits land
    // in, the final state with any unsorted append present is NO marker.
    val dir = s"$base/marker"
    spark.range(0, 1000).selectExpr("id AS k", "id AS v")
      .write.format("graft").option("sortby", "k").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    assert(GraftSortMarker.read(fs, new org.apache.hadoop.fs.Path(dir)).nonEmpty)
    inParallel(6) { i =>
      if (i % 2 == 0)
        spark.range(1000 + i * 100, 1100 + i * 100)
          .selectExpr("id AS k", "id AS v")
          .write.format("graft").option("sortby", "k").mode("append").save(dir)
      else // hash-scrambled: genuinely unsorted on k
        spark.range(2000 + i * 100, 2100 + i * 100)
          .selectExpr("cast(hash(id) as bigint) AS k", "id AS v")
          .write.format("graft").mode("append").save(dir)
    }
    assert(GraftSortMarker.read(fs, new org.apache.hadoop.fs.Path(dir)).isEmpty,
      "unsorted appends landed — a surviving whole-table sort marker would " +
        "certify wrong top-N pushdowns")
    assert(spark.read.format("graft").load(dir).count() == 1600)
  }

  test("a concurrent append and a truncating overwrite both land whole") {
    val dir = s"$base/trunc"
    spark.range(0, 500).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    inParallel(2) { i =>
      if (i == 0)
        spark.range(10000, 10200).selectExpr("id AS k")
          .write.format("graft").mode("append").save(dir)
      else
        spark.range(0, 300).selectExpr("id AS k")
          .write.format("graft").mode("overwrite").save(dir)
    }
    // either serialization order is legal; both leave a consistent table:
    // overwrite-then-append = 500, append-then-overwrite = 300
    val n = spark.read.format("graft").load(dir).count()
    assert(n == 500 || n == 300, s"inconsistent post-race count $n")
  }
}
