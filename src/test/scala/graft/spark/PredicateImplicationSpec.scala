package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Expression-shaped V2 predicates that the v1 vocabulary cannot carry
  * compile to SOUND implied base-column filters (GraftPredicateImplication)
  * — year(ts) ranges, substring prefixes, abs bounds — which then drive
  * zone-map page skips and partition-directory pruning while the original
  * predicate re-applies row-level. Pins both the pruning (metrics) and
  * exactness (counts vs a recompute).
  */
class PredicateImplicationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.pi", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.pi.warehouse", "/tmp/graft-test/predimpl-wh")
    .getOrCreate()

  test("year(ts) predicates skip page groups on a ts-sorted table") {
    val dir = "/tmp/graft-test/predimpl-year"
    // 3 years of hourly rows, sorted: tight ts zone maps per page
    spark.sql("SELECT timestamp'2022-01-01 00:00:00' + " +
      "make_dt_interval(0, CAST(id AS INT), 0, 0) AS ts, id FROM range(26280)")
      .orderBy("ts").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    GraftMetrics.pageGroupsSkipped.set(0)
    val n2023 = g.filter("year(ts) = 2023").count()
    assert(n2023 == 365 * 24, s"2023 hours: $n2023")
    assert(GraftMetrics.pageGroupsSkipped.get() >= 1,
      "year(ts)=Y must skip pages via the implied ts range")
    GraftMetrics.pageGroupsSkipped.set(0)
    assert(g.filter("year(ts) >= 2024").count() ==
      26280 - (365 + 365) * 24)
    assert(GraftMetrics.pageGroupsSkipped.get() >= 1)
  }

  test("year(ts) prunes days(ts) partition directories before footer IO") {
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-test/predimpl-wh"))
    spark.sql("CREATE TABLE pi.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    spark.sql("INSERT INTO pi.ev SELECT id, " +
      "timestamp'2022-06-15 00:00:00' + make_dt_interval(CAST(id % 3 AS INT) * 365, 0, 0, 0) " +
      "FROM range(30)") // 2022-06, 2023-06, 2024-06
    GraftMetrics.filesPruned.set(0)
    assert(spark.sql("SELECT count(*) FROM pi.ev WHERE year(ts) = 2023")
      .head.getLong(0) == 10)
    assert(GraftMetrics.filesPruned.get() > 0,
      "the implied ts range must prune derived month dirs")
  }

  test("substring prefix predicates imply startsWith and skip via blooms-free ranges") {
    val dir = "/tmp/graft-test/predimpl-substr"
    spark.range(0, 20000).selectExpr("concat(chr(97 + CAST(id % 26 AS INT)), id) AS s", "id")
      .orderBy("s").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    val expect = g.collect().count(_.getString(0).startsWith("m"))
    GraftMetrics.pageGroupsSkipped.set(0)
    assert(g.filter("substring(s, 1, 1) = 'm'").count() == expect)
    assert(GraftMetrics.pageGroupsSkipped.get() >= 1,
      "substring(s,1,n)='p' must skip via the implied prefix filter")
  }

  test("abs(k) bounds imply symmetric ranges") {
    val dir = "/tmp/graft-test/predimpl-abs"
    spark.range(0, 20000).selectExpr("CAST(id AS BIGINT) - 10000 AS k")
      .orderBy("k").coalesce(1)
      .write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    GraftMetrics.pageGroupsSkipped.set(0)
    assert(g.filter("abs(k) < 50").count() == 99)
    assert(GraftMetrics.pageGroupsSkipped.get() >= 1,
      "abs(k)<c must skip pages outside (-c, c)")
    // the disjunctive outer bound stays exact (Or-implied filter)
    assert(g.filter("abs(k) > 9990").count() ==
      g.collect().count(r => math.abs(r.getLong(0)) > 9990))
  }

  test("implications never fire for shapes they cannot soundly map") {
    val dir = "/tmp/graft-test/predimpl-neg"
    spark.range(0, 1000).selectExpr("id AS k", "concat('v', id) AS s")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)
    // substring '<' is NOT implied (the tail can exceed the prefix bound);
    // correctness must hold regardless
    assert(g.filter("substring(s, 1, 2) < 'v2'").count() ==
      g.collect().count(_.getString(1).take(2) < "v2"))
    // modulo predicates: no implication, exact result
    assert(g.filter("k % 10 = 3").count() == 100)
  }

  test("month(ts)/day(ts) prune time-transform dirs via the field lane") {
    // month(ts) = M is PERIODIC — no base-column range can carry it — yet
    // on a months(ts)/days(ts) layout the dir value pins the field: the
    // calendar-field lane (col#month marker filters) prunes directories a
    // year's worth apart. year(ts) AND month(ts) composes (two filters).
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-test/predimpl-wh2"))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.pi2", "graft.spark.GraftCatalog")
    s2.conf.set("spark.sql.catalog.pi2.warehouse", "/tmp/graft-test/predimpl-wh2")
    s2.sql("CREATE TABLE pi2.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    s2.sql("INSERT INTO pi2.ev SELECT id, " +
      "timestamp'2023-01-15 06:00:00' + make_dt_interval(CAST(id % 8 AS INT) * 61, 0, 0, 0) " +
      "FROM range(80)") // 8 dirs, two months apart: Jan/Mar/May/... 2023-24
    GraftMetrics.filesPruned.set(0)
    assert(s2.sql("SELECT count(*) FROM pi2.ev WHERE month(ts) = 3")
      .head.getLong(0) == 20) // 2023-03 and 2024-03 dirs
    assert(GraftMetrics.filesPruned.get() > 0,
      "month(ts)=M must prune non-adjacent month dirs")
    GraftMetrics.filesPruned.set(0)
    assert(s2.sql("SELECT count(*) FROM pi2.ev " +
      "WHERE year(ts) = 2023 AND month(ts) IN (1, 5)").head.getLong(0) == 20)
    assert(GraftMetrics.filesPruned.get() > 0)
    // day(ts) on a days layout
    s2.sql("CREATE TABLE pi2.evd (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    s2.sql("INSERT INTO pi2.evd SELECT id, " +
      "timestamp'2024-02-01 12:00:00' + make_dt_interval(CAST(id % 10 AS INT), 0, 0, 0) " +
      "FROM range(100)")
    GraftMetrics.filesPruned.set(0)
    assert(s2.sql("SELECT count(*) FROM pi2.evd WHERE day(ts) = 7")
      .head.getLong(0) == 10)
    assert(GraftMetrics.filesPruned.get() > 0,
      "day(ts)=D must prune other day dirs")
  }

  test("calendar-field candidates stay sound across session zones") {
    import org.apache.spark.sql.types._
    val pt = GraftPartTransform.parse("months(ts)")
    def withZone[T](z: String)(f: => T): T = {
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val old = conf.sessionLocalTimeZone
      conf.setConfString("spark.sql.session.timeZone", z)
      try f finally conf.setConfString("spark.sql.session.timeZone", old)
    }
    // UTC: the dir is exactly one session month
    assert(withZone("UTC") {
      GraftPartTransform.fieldCandidates(pt, TimestampType, "2026-03", "month")
    }.contains(Set(3)))
    // Asia/Kolkata (+5:30): the dir's instants spill into local April —
    // month=4 must KEEP the dir (rows near the end match), month=2 prunes
    assert(withZone("Asia/Kolkata") {
      GraftPartTransform.fieldCandidates(pt, TimestampType, "2026-03", "month")
    }.contains(Set(3, 4)))
    // NTZ is wall time: exact regardless of zone
    assert(withZone("Asia/Kolkata") {
      GraftPartTransform.fieldCandidates(pt, TimestampNTZType, "2026-03", "month")
    }.contains(Set(3)))
    // years dirs carry no month info: undecidable, caller keeps
    assert(GraftPartTransform.fieldCandidates(
      GraftPartTransform.parse("years(ts)"), TimestampType, "2026", "month").isEmpty)
  }

  test("hour(ts) prunes hours(ts) dirs, zone-shifted candidates included") {
    import org.apache.spark.sql.types._
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-test/predimpl-wh3"))
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.catalog.pi3", "graft.spark.GraftCatalog")
    s3.conf.set("spark.sql.catalog.pi3.warehouse", "/tmp/graft-test/predimpl-wh3")
    s3.sql("CREATE TABLE pi3.ev (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts))")
    s3.sql("INSERT INTO pi3.ev SELECT id, " +
      "timestamp'2026-08-01 00:30:00' + make_dt_interval(0, CAST(id % 6 AS INT) * 4, 0, 0) " +
      "FROM range(60)") // hours 00,04,08,12,16,20
    GraftMetrics.filesPruned.set(0)
    assert(s3.sql("SELECT count(*) FROM pi3.ev WHERE hour(ts) = 12")
      .head.getLong(0) == 10)
    assert(GraftMetrics.filesPruned.get() > 0,
      "hour(ts)=H must prune other hour dirs")
    // candidate unit checks: UTC dir is one session hour; +05:30 spills
    val pt = GraftPartTransform.parse("hours(ts)")
    def withZone[T](z: String)(f: => T): T = {
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val old = conf.sessionLocalTimeZone
      conf.setConfString("spark.sql.session.timeZone", z)
      try f finally conf.setConfString("spark.sql.session.timeZone", old)
    }
    assert(withZone("UTC") {
      GraftPartTransform.hourCandidates(pt, TimestampType, "2026-08-01-07")
    }.contains(Set(7)))
    assert(withZone("Asia/Kolkata") {
      GraftPartTransform.hourCandidates(pt, TimestampType, "2026-08-01-07")
    }.contains(Set(12, 13)), "half-hour zone spans two local hours")
    // coarser dirs span all 24 hours: undecidable
    assert(GraftPartTransform.hourCandidates(
      GraftPartTransform.parse("days(ts)"), TimestampType, "2026-08-01").isEmpty)
  }
}
