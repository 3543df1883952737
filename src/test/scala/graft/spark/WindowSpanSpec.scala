package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental windows spanning a commit AND a row-level rewrite of that
  * commit: the rewrite's heal pass re-publishes the expired commit's
  * surviving coverage as a REPLACEMENT manifest at the original commit
  * time, so a `since` reader (or CDC consumer) that had not yet read the
  * window still receives the commit's surviving rows. Before replacement
  * manifests, those survivors fell to pre-manifest history and were
  * silently lost — a real data-loss window for any feed consumer whose
  * polling interval spanned an append followed by a takedown touching it.
  */
class WindowSpanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-test/winspan-$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestMax(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    GraftManifest.list(fsOf(dir), p).filterNot(GraftManifest.isCatchup)
      .map(GraftManifest.nameT).max
  }

  private def sinceKs(dir: String, t: Long): Seq[Long] =
    spark.read.format("graft").option("since", t.toString).load(dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("since window spanning append+delete delivers the append's survivors") {
    val dir = fresh("delete")
    spark.range(0, 100).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    val t1 = manifestMax(dir)
    Thread.sleep(5)
    spark.range(100, 110).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    GraftMaintenance.deleteWhere(spark, dir,
      col("k").between(100, 105), changelog = true)
    assert(sinceKs(dir, t1) == (106L to 109L),
      "surviving appended rows must stay in the window after the delete")
    // the window cut AFTER the append must stay empty (no redelivery)
    assert(spark.read.format("graft")
      .option("since", manifestMax(dir).toString).load(dir).count() == 0)
  }

  test("since window spanning append+update delivers the updated survivors") {
    val dir = fresh("update")
    spark.range(0, 50).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("append").save(dir)
    val t1 = manifestMax(dir)
    Thread.sleep(5)
    spark.range(50, 60).selectExpr("id AS k", "id AS v")
      .write.format("graft").mode("append").save(dir)
    GraftMaintenance.updateWhere(spark, dir,
      col("k") >= 55, Map("v" -> lit(-1L)))
    val got = spark.read.format("graft").option("since", t1.toString).load(dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == ((50L to 54L).map(k => (k, k)) ++ (55L to 59L).map((_, -1L))),
      s"window must deliver the appended rows at their POST-update values: $got")
  }

  test("replacement chains: two rewrites of the same appended commit stay window-exact") {
    val dir = fresh("chain")
    spark.range(0, 40).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    val t1 = manifestMax(dir)
    Thread.sleep(5)
    spark.range(100, 120).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    GraftMaintenance.deleteWhere(spark, dir, col("k").between(100, 104))
    GraftMaintenance.deleteWhere(spark, dir, col("k").between(110, 114))
    assert(sinceKs(dir, t1) == ((105L to 109L) ++ (115L to 119L)),
      "a second rewrite must replace the replacement, not drop coverage")
    val p = new org.apache.hadoop.fs.Path(dir)
    val repls = GraftManifest.list(fsOf(dir), p).filter(GraftManifest.isReplacement)
    assert(repls.size == 1,
      s"chained rewrites must collapse to ONE replacement per commit: $repls")
    // the chain normalizes to the ORIGINAL commit's suffix
    assert(!GraftManifest.isReplacement(
      f"${GraftManifest.nameT(repls.head)}%013d-" +
        GraftManifest.baseSuffix(repls.head)))
  }

  test("replacements mint no phantom versions and keep fresh streams batch-equal") {
    val dir = fresh("versions")
    spark.range(0, 30).selectExpr("id AS k")
      .write.format("graft").mode("overwrite").save(dir)
    spark.range(30, 60).selectExpr("id AS k")
      .write.format("graft").mode("append").save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    val commitsBefore = GraftVersionLog.commits(GraftVersionLog.sync(fs, p)).size
    GraftMaintenance.deleteWhere(spark, dir, col("k").between(30, 39))
    val commitsAfter = GraftVersionLog.commits(GraftVersionLog.sync(fs, p)).size
    assert(commitsAfter == commitsBefore,
      s"a rewrite's replacement manifest must not register as a new version " +
        s"($commitsBefore -> $commitsAfter)")
    // fresh stream drains to exactly the batch view
    val schema = spark.read.format("graft").load(dir).schema
    val q = spark.readStream.format("graft").schema(schema).load(dir)
      .writeStream.format("memory").queryName("winspan_fresh").start()
    try {
      q.processAllAvailable()
      val streamKs = spark.table("winspan_fresh")
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(streamKs == ((0L to 29L) ++ (40L to 59L)),
        s"fresh stream diverged from batch view: ${streamKs.size} rows")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS winspan_fresh")
    }
  }

  test("CDC consumer window spanning append+takedown keeps the derived table exact") {
    val src = fresh("cdc-src")
    val dst = fresh("cdc-dst")
    spark.range(0, 100).selectExpr("id AS k", "id * 3 AS v")
      .write.format("graft").mode("append").save(src)
    val derive = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("k") % 2 === 0).select(col("k"), col("v"))
    derive(spark.read.format("graft").load(src))
      .write.format("graft").mode("append").save(dst)
    val t1 = manifestMax(src)
    Thread.sleep(5)
    // the consumer sleeps through an append AND a takedown deleting part
    // of that same append plus part of the old corpus
    spark.range(100, 130).selectExpr("id AS k", "id * 3 AS v")
      .write.format("graft").mode("append").save(src)
    GraftMaintenance.deleteWhere(spark, src,
      col("k").between(90, 115), changelog = true)
    val (appended, deleted) = GraftCdc.applyChangesBetween(spark, src,
      t1, Long.MaxValue, dst, "k", derive)
    // appended = the append's SURVIVORS passing the derive filter
    // (116..129 even = 7); deleted keys = all feed rows (90..115 = 26)
    assert(appended == 7 && deleted == 26, s"($appended, $deleted)")
    val want = derive(spark.read.format("graft").load(src))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = spark.read.format("graft").load(dst)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want,
      "derived table diverged: the spanning window lost appended survivors")
    assert(got.map(_._1) ==
      ((0L until 90L) ++ (116L to 129L)).filter(_ % 2 == 0))
  }
}
