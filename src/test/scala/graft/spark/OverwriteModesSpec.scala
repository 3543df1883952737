package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The overwrite write modes beyond whole-table truncate:
  *
  *   - DYNAMIC partition overwrite (`overwritePartitions()` / INSERT
  *     OVERWRITE under partitionOverwriteMode=dynamic): replaces exactly
  *     the partitions present in the incoming data, leaving every other
  *     partition byte-identical — the idempotent daily re-ingest pattern.
  *   - PREDICATE overwrite (`overwrite(cond)` / static INSERT OVERWRITE
  *     PARTITION): commits the new data, then deletes rows matching the
  *     condition from the pre-commit snapshot through the deleteWhere
  *     rewrite scaffold.
  *
  * Both retire old data only AFTER the new files and their manifest are
  * visible (crash leaves old+new, never an empty slice), scope retirement
  * to the pre-commit snapshot (the new rows match the predicate by
  * construction and must survive), and reconcile manifests through the
  * shared heal pass so streams and since windows stay exact.
  */
class OverwriteModesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.owsp", "graft.spark.GraftCatalog")
    .config("spark.sql.catalog.owsp.warehouse", "/tmp/graft-test/owsp-wh")
    .getOrCreate()

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-test/ow-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def freshTable(name: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS owsp.db.$name")
    s"owsp.db.$name"
  }

  private def filesOf(dir: String): Map[String, (Long, Long)] =
    GraftUtil.listDataFiles(dir, spark.sessionState.newHadoopConf())
      .map(f => f.getPath.toString -> ((f.getLen, f.getModificationTime))).toMap

  test("dynamic overwrite replaces exactly the written partitions; others stay byte-identical") {
    val t = freshTable("dyn1")
    val dir = "/tmp/graft-test/owsp-wh/db/dyn1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT, day STRING) PARTITIONED BY (day)")
    // two generations of mixed-partition appends
    spark.range(0, 40).selectExpr("id AS k", "id AS v",
      "CASE WHEN id % 2 = 0 THEN 'd1' ELSE 'd2' END AS day")
      .writeTo(t).append()
    spark.range(40, 60).selectExpr("id AS k", "id AS v",
      "CASE WHEN id % 2 = 0 THEN 'd1' ELSE 'd3' END AS day")
      .writeTo(t).append()
    val before = filesOf(dir)
    assert(before.keys.exists(_.contains("day=d2")) &&
      before.keys.exists(_.contains("day=d3")), "staging needs 3 partitions")
    // re-ingest d1 only
    spark.range(1000, 1005).selectExpr("id AS k", "id AS v", "'d1' AS day")
      .writeTo(t).overwritePartitions()
    val after = filesOf(dir)
    // untouched partitions: identical file sets, lengths, mtimes
    val beforeOther = before.filter(e => !e._1.contains("day=d1"))
    val afterOther = after.filter(e => !e._1.contains("day=d1"))
    assert(afterOther == beforeOther,
      "partitions the incoming data does not touch must be byte-identical")
    // replaced partition holds ONLY the new rows
    val d1 = spark.table(t).filter(col("day") === "d1")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(d1 == (1000L to 1004L), s"d1 must hold only the re-ingest: $d1")
    // other partitions' rows intact
    assert(spark.table(t).filter(col("day") =!= "d1").count() == 30)
    // no stale manifest references a retired d1 file
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val liveNames = after.keySet
    GraftManifest.list(fs, p).foreach { m =>
      GraftManifest.read(fs, p, m).foreach { case (name, _) =>
        assert(liveNames.exists(_.endsWith("/" + name)) ||
          liveNames.exists(_.endsWith(name)),
          s"manifest $m references a retired file $name")
      }
    }
  }

  test("SQL INSERT OVERWRITE routes dynamically under partitionOverwriteMode=dynamic") {
    val t = freshTable("dyn2")
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, CASE WHEN id < 10 THEN 'a' ELSE 'b' END FROM range(20)")
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql(s"INSERT OVERWRITE $t SELECT id + 100, 'a' FROM range(3)")
    }
    val got = spark.table(t).select("k", "day")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == ((10L until 20L).map((_, "b")) ++ (100L to 102L).map((_, "a"))).sorted,
      s"dynamic INSERT OVERWRITE must replace only partition 'a': $got")
  }

  test("static INSERT OVERWRITE PARTITION replaces the named slice via the predicate path") {
    val t = freshTable("stat1")
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, CASE WHEN id < 10 THEN 'a' ELSE 'b' END FROM range(20)")
    spark.sql(s"INSERT OVERWRITE $t PARTITION (day = 'b') SELECT id + 500 FROM range(2)")
    val got = spark.table(t).select("k", "day")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == ((0L until 10L).map((_, "a")) ++ (500L to 501L).map((_, "b"))).sorted,
      s"static partition overwrite must replace only 'b': $got")
  }

  test("replaceWhere deletes the predicate slice row-level, keeping file survivors") {
    val t = freshTable("repl1")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.range(0, 100).selectExpr("id AS k", "id AS v").writeTo(t).append()
    // replace the band 20..29 with recomputed rows — the band cuts INSIDE
    // the files, so survivors must be rewritten, not whole-file dropped
    spark.range(20, 30).selectExpr("id AS k", "id * 1000 AS v")
      .writeTo(t).overwrite(col("k").between(20, 29))
    val got = spark.table(t).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = ((0L until 20L) ++ (30L until 100L)).map(k => (k, k)) ++
      (20L until 30L).map(k => (k, k * 1000))
    assert(got == want.sorted, s"replaceWhere slice wrong: ${got.take(8)}")
  }

  test("replaceWhere rejects rows that violate the overwrite predicate") {
    val t = freshTable("replcheck")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.range(0, 50).selectExpr("id AS k", "id AS v").writeTo(t).append()
    // rows 40..44 land OUTSIDE the replaced slice k<10 — a re-run's delete
    // phase would never remove them, so the write must fail loudly...
    val ex = intercept[Exception] {
      spark.range(40, 45).selectExpr("id AS k", "id AS v")
        .writeTo(t).overwrite(col("k") < 10)
    }
    def causes(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).toSeq
    assert(causes(ex).exists(_.contains("does not satisfy the replace predicate")),
      s"expected the replaceWhere validation error, got: ${causes(ex)}")
    // ...and a failed overwrite leaves the table intact
    assert(spark.table(t).count() == 50)
    // the escape hatch writes unchecked when the caller owns the contract
    spark.range(40, 45).selectExpr("id AS k", "id * 10 AS v")
      .writeTo(t).option("replacewherecheck", "false").overwrite(col("k") < 10)
    val ks = spark.table(t).select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == ((10L until 50L) ++ (40L until 45L)).sorted,
      s"unchecked overwrite shape wrong: $ks")
  }

  test("replaceWhere with an empty source deletes the slice (replace with nothing)") {
    val t = freshTable("repl2")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.range(0, 50).selectExpr("id AS k").writeTo(t).append()
    spark.range(0, 0).selectExpr("id AS k")
      .writeTo(t).overwrite(col("k") < 10)
    assert(spark.table(t).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (10L until 50L))
  }

  test("dynamic overwrite with an empty source is a no-op") {
    val t = freshTable("dyn3")
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, 'a' FROM range(10)")
    spark.range(0, 0).selectExpr("id AS k", "'a' AS day")
      .writeTo(t).overwritePartitions()
    assert(spark.table(t).count() == 10,
      "no incoming partitions -> nothing replaced")
  }

  test("INSERT INTO a PARTITIONED BY table lays out hive directories") {
    val t = freshTable("layout1")
    val dir = "/tmp/graft-test/owsp-wh/db/layout1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t SELECT id, id % 3 FROM range(30)")
    val files = filesOf(dir).keySet
    assert(files.nonEmpty && files.forall(_.matches(".*/p=[0-2]/[^/]+")),
      s"declared layout must partition every insert: ${files.take(3)}")
    // partition pruning works through the layout
    assert(spark.table(t).filter(col("p") === 1).count() == 10)
  }

  test("overwrite with changelog publishes the replaced rows as CDC deletes") {
    val t = freshTable("cdc1")
    val dir = "/tmp/graft-test/owsp-wh/db/cdc1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, CASE WHEN id < 5 THEN 'a' ELSE 'b' END FROM range(10)")
    Thread.sleep(3)
    val t1 = System.currentTimeMillis()
    Thread.sleep(3)
    spark.range(100, 103).selectExpr("id AS k", "'a' AS day")
      .writeTo(t).option("changelog", "true").overwritePartitions()
    Thread.sleep(3)
    val w = GraftCdc.changes(spark, dir, t1, System.currentTimeMillis())
      .select("k", GraftCdc.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(w == Seq((0L, "delete"), (1L, "delete"), (2L, "delete"),
      (3L, "delete"), (4L, "delete"),
      (100L, "insert"), (101L, "insert"), (102L, "insert")),
      s"the window must show the overwrite as delete+insert: $w")
  }

  test("a fresh stream of an overwritten table equals the batch view") {
    val t = freshTable("stream1")
    val dir = "/tmp/graft-test/owsp-wh/db/stream1"
    spark.sql(s"CREATE TABLE $t (k BIGINT, day STRING) PARTITIONED BY (day)")
    spark.sql(s"INSERT INTO $t SELECT id, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END FROM range(40)")
    spark.range(900, 905).selectExpr("id AS k", "'x' AS day")
      .writeTo(t).overwritePartitions()
    val schema = spark.read.format("graft").load(dir).schema
    val q = spark.readStream.format("graft").schema(schema).load(dir)
      .writeStream.format("memory").queryName("ow_stream1").start()
    try {
      q.processAllAvailable()
      val streamKs = spark.table("ow_stream1")
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      val batchKs = spark.table(t)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(streamKs == batchKs,
        s"fresh stream diverged after overwrite: ${streamKs.size} vs ${batchKs.size}")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ow_stream1")
    }
  }

  test("path writes: conflicting explicit partitionby against a declared layout is rejected") {
    val t = freshTable("conflict1")
    spark.sql(s"CREATE TABLE $t (k BIGINT, a STRING, b STRING) PARTITIONED BY (a)")
    val e = intercept[Exception] {
      spark.range(0, 5).selectExpr("id AS k", "'u' AS a", "'w' AS b")
        .writeTo(t).option("partitionby", "b").append()
    }
    assert(e.getMessage.contains("conflicts with the table's declared layout"))
  }

  test("writeTo(...).partitionedBy(...).create() declares the layout (CTAS)") {
    val t = freshTable("ctas1")
    val dir = "/tmp/graft-test/owsp-wh/db/ctas1"
    spark.range(0, 12).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS p")
      .writeTo(t).partitionedBy(col("p")).create()
    val files = filesOf(dir).keySet
    assert(files.nonEmpty && files.forall(f => f.contains("/p=0/") || f.contains("/p=1/")),
      s"CTAS partitioning must land as hive layout: ${files.take(2)}")
    // and the declaration persists: a later dynamic overwrite works
    spark.range(100, 103).selectExpr("id AS k", "'0' AS p")
      .writeTo(t).overwritePartitions()
    val got = spark.table(t).select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ((1L until 12L by 2) ++ (100L to 102L)).sorted, s"$got")
  }

  test("mode(overwrite) on a path table still truncates (no behavior drift)") {
    val dir = fresh("truncate1")
    spark.range(0, 20).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    spark.range(100, 105).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == (100L to 104L))
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
