package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The advisory maintenance lock: mutating ops on one table serialize,
  * crashed holders are expropriated after the lease, live holders are
  * heartbeat-protected, and contention past the wait bound fails loudly.
  */
class TableLockSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-test/lock-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def lockPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, GraftTableLock.LockName)

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("concurrent deletes serialize: both apply, nothing lost or duplicated") {
    val dir = fresh("serialize")
    spark.range(0, 1000).selectExpr("id AS k").repartition(4)
      .write.format("graft").mode("overwrite").save(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[GraftMaintenance.DeleteStats] {
        def call(): GraftMaintenance.DeleteStats =
          GraftMaintenance.deleteWhere(spark, dir, col("k") < 100)
      })
      val b = pool.submit(new java.util.concurrent.Callable[GraftMaintenance.DeleteStats] {
        def call(): GraftMaintenance.DeleteStats =
          GraftMaintenance.deleteWhere(spark, dir, col("k") >= 900)
      })
      val (sa, sb) = (a.get(), b.get())
      assert(sa.rowsBefore - sa.rowsAfter == 100 && sb.rowsBefore - sb.rowsAfter == 100,
        s"both serialized deletes must fully apply: $sa / $sb")
    } finally pool.shutdown()
    val ks = spark.read.format("graft").load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (100L until 900L),
      s"concurrent deletes corrupted the table: ${ks.size} rows")
    assert(!fsOf(dir).exists(lockPath(dir)), "lock must be released")
  }

  test("a live holder blocks; the waiter times out loudly") {
    val dir = fresh("timeout")
    spark.range(0, 50).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val fs = fsOf(dir)
    // a FRESH foreign lock (live holder elsewhere)
    val out = fs.create(lockPath(dir), false)
    try out.write("other:held".getBytes("UTF-8")) finally out.close()
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong("graft.maint.lock.wait.ms", 400L)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        GraftMaintenance.deleteWhere(spark, dir, col("k") < 5)
      }
      assert(e.getMessage.contains("locked by another maintenance"))
      assert(e.getMessage.contains("other:held"))
      // rows untouched — the op never started
      assert(spark.read.format("graft").load(dir).count() == 50)
    } finally {
      hconf.unset("graft.maint.lock.wait.ms")
      fs.delete(lockPath(dir), false)
    }
  }

  test("a crashed holder's stale lease is broken and the op proceeds") {
    val dir = fresh("stale")
    spark.range(0, 50).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val fs = fsOf(dir)
    val lp = lockPath(dir)
    val out = fs.create(lp, false)
    try out.write("crashed:gone".getBytes("UTF-8")) finally out.close()
    // age the lock past the lease: the holder never heartbeat again
    fs.setTimes(lp, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    val st = GraftMaintenance.deleteWhere(spark, dir, col("k") < 10)
    assert(st.rowsBefore - st.rowsAfter == 10, "stale lease must not block the op")
    assert(!fs.exists(lp), "the new holder must release its own claim")
  }

  test("the lock releases on op failure") {
    val dir = fresh("failure")
    spark.range(0, 20).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    intercept[Exception] {
      // unresolvable predicate column -> the op throws inside the lock
      GraftMaintenance.deleteWhere(spark, dir, col("no_such_column") === 1)
    }
    assert(!fsOf(dir).exists(lockPath(dir)),
      "a failed op must not leave the table locked")
    // and the table is still operable
    locally { val s2 = GraftMaintenance.deleteWhere(spark, dir, col("k") < 5)
      assert(s2.rowsBefore - s2.rowsAfter == 5) }
  }

  test("appends stay lock-free: a concurrent append during deleteWhere is never lost") {
    val dir = fresh("append-race")
    spark.range(0, 2000).selectExpr("id AS k").repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val del = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          GraftMaintenance.deleteWhere(spark, dir, col("k") % 4 === 0)
      })
      // land an append while the rewrite wave is (likely) in flight — the
      // tmp+rename commit protocol must keep it intact either way
      val app = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          spark.range(10000, 10100).selectExpr("id AS k")
            .write.format("graft").mode("append").save(dir)
      })
      del.get(); app.get()
    } finally pool.shutdown()
    val ks = spark.read.format("graft").load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    // the CONTRACT: the append survives intact per key. A multi-file
    // append commits file-by-file, so the delete's listing may see any
    // SUBSET of the appended files — per-key: a non-victim appended key
    // must always be present; a victim (% 4 == 0) appended key may be
    // present (delete didn't see its file) or absent (it did). Never
    // duplicated, and the base delete is exact.
    val appended = ks.filter(_ >= 10000L).toSet
    (10000L until 10100L).foreach { k =>
      if (k % 4 != 0)
        assert(appended.contains(k), s"appended non-victim $k lost in the race")
    }
    assert(appended.forall(k => k >= 10000L && k < 10100L))
    assert(ks.filter(_ < 2000L) == (0L until 2000L).filterNot(_ % 4 == 0),
      "base delete incomplete or over-applied")
    assert(ks.distinct == ks, "duplicated rows after the race")
  }

  test("a fresh CONTENT heartbeat protects a holder whose mtime went stale") {
    // object-store shape: setTimes rejected, so the holder renews by
    // rewriting the heartbeat millis into the lock content. A waiter must
    // take the freshest of (mtime, content heartbeat) — an old mtime with
    // a fresh content time is a LIVE holder, not a crashed one.
    val dir = fresh("content-hb")
    spark.range(0, 50).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val fs = fsOf(dir)
    val lp = lockPath(dir)
    val out = fs.create(lp, false)
    try out.write(s"other:live\n${System.currentTimeMillis() + 30000}"
      .getBytes("UTF-8")) finally out.close()
    // mtime says "crashed an hour ago"; content says "heartbeating now"
    fs.setTimes(lp, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong("graft.maint.lock.wait.ms", 400L)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        GraftMaintenance.deleteWhere(spark, dir, col("k") < 5)
      }
      assert(e.getMessage.contains("other:live"),
        "a content-fresh lock must be treated as live, not expropriated")
      assert(spark.read.format("graft").load(dir).count() == 50)
    } finally {
      hconf.unset("graft.maint.lock.wait.ms")
      fs.delete(lp, false)
    }
  }

  test("a stale lock is broken when BOTH mtime and content heartbeat are old") {
    val dir = fresh("both-stale")
    spark.range(0, 50).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    val fs = fsOf(dir)
    val lp = lockPath(dir)
    val old = System.currentTimeMillis() - 60 * 60 * 1000L
    val out = fs.create(lp, false)
    try out.write(s"crashed:gone\n$old".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lp, old, -1)
    val st = GraftMaintenance.deleteWhere(spark, dir, col("k") < 10)
    assert(st.rowsBefore - st.rowsAfter == 10,
      "a doubly-stale lease must not block the op")
    assert(!fs.exists(lp), "the new holder must release its own claim")
  }

  test("composed ops acquire once: zorder runs through compact under one lock") {
    val dir = fresh("reentrant")
    spark.range(0, 2000)
      .selectExpr("id AS a", "(id * 37) % 2000 AS b")
      .repartition(6).write.format("graft").mode("overwrite").save(dir)
    val st = GraftMaintenance.zorder(spark, dir, Seq("a", "b"), targetFiles = 2)
    assert(st.rows == 2000)
    assert(!fsOf(dir).exists(lockPath(dir)))
  }
}
