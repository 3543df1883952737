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
      // if a lock-separation bug ever makes commits contend with the
      // maintenance mutex, fail in seconds, not the 10-minute default
      .config("spark.hadoop.graft.maint.lock.wait.ms", "8000")
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
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, GraftTableLock.CommitLockName)))
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

  test("a long-held maintenance lock does not block ingest commits") {
    // compaction holds the MAINTENANCE mutex for its whole (possibly
    // hour-long) run; commits take a SEPARATE commit mutex — drip ingest
    // into a table under maintenance must proceed, not queue or fail
    val dir = s"$base/mainthold"
    spark.range(0, 100).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val heldL = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      GraftTableLock.withLock(fs, p, conf, "fake-compact") {
        heldL.countDown(); release.await()
      })
    holder.start()
    assert(heldL.await(30, java.util.concurrent.TimeUnit.SECONDS))
    try {
      spark.range(100, 200).selectExpr("id AS k")
        .write.format("graft").mode("append").save(dir)
      assert(spark.read.format("graft").load(dir).count() == 200)
    } finally { release.countDown(); holder.join() }
  }

  test("dir values round-trip: escaped bytes AND legacy raw non-ASCII") {
    // new writers escape at the UTF-8 byte level; dirs written by OLDER
    // writers may hold raw non-ASCII chars — unescape must pass those
    // through as chars, never crush them through toByte into U+FFFD
    // (which would silently prune the dir on every equality probe)
    for (v <- Seq("plain", "a=b/c%d", "café", "😀x", "")) {
      val esc = GraftUtil.escapePathValue(v)
      assert(esc.forall(c => c < 0x7f), s"escaped '$v' must be ASCII: $esc")
      assert(GraftUtil.unescapePathValue(esc) == v, s"round-trip of '$v'")
    }
    assert(GraftUtil.unescapePathValue("café") == "café",
      "legacy raw non-ASCII dir value must pass through unchanged")
    assert(GraftUtil.unescapePathValue("😀") == "😀")
    assert(GraftUtil.unescapePathValue("%2F%2F") == "//")
    // a FOREIGN dir's raw '%' (not followed by valid hex) passes through
    // instead of crashing the listing with NumberFormatException
    assert(GraftUtil.unescapePathValue("95%off") == "95%off")
    assert(GraftUtil.unescapePathValue("end%") == "end%")
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
