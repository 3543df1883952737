package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must preserve content exactly, actually shrink the file set,
  * and allow a layout (sortby / bloomfilter) to be imposed during the
  * rewrite — the natural maintenance moment at scale.
  */
class GraftMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compact shrinks the file set and preserves rows bit-exactly") {
    val dir = "/tmp/graft-test/maintenance-compact"
    // simulate drip ingest: 16 tiny files
    spark.range(16000).selectExpr("id AS k", "id * 3 AS v",
        "format_string('r%06d', id) AS s")
      .repartition(16)
      .write.format("graft").mode("overwrite").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    assert(GraftUtil.listDataFiles(dir, conf).size == 16)
    val expected = spark.read.format("graft").load(dir)
      .selectExpr("to_json(struct(*)) AS r").collect().map(_.getString(0)).sorted.toSeq

    val st = GraftMaintenance.compact(spark, dir, targetFiles = 2)
    assert(st.filesBefore == 16 && st.filesAfter == 2 && st.rows == 16000)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 16000)
    assert(back.selectExpr("to_json(struct(*)) AS r")
      .collect().map(_.getString(0)).sorted.toSeq == expected)
  }

  test("compact never deletes a file appended after its snapshot") {
    val dir = "/tmp/graft-test/maintenance-concurrent"
    spark.range(1000).selectExpr("id AS k", "id * 3 AS v")
      .repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    // a drip-ingest writer lands an append in compact's commit window
    // (after the rewrite, before the snapshot delete): its rows must
    // survive — the old commit-time listing deleted them silently
    val st = GraftMaintenance.compactImpl(spark, dir, 2, Map.empty, () =>
      spark.range(1000, 1250).selectExpr("id AS k", "id * 3 AS v")
        .coalesce(1)
        .write.format("graft").mode("append").save(dir))
    assert(st.rows == 1000)
    val back = spark.read.format("graft").load(dir)
    assert(back.count() == 1250, "concurrently appended rows were lost by compaction")
    assert(back.selectExpr("sum(k)").first().getLong(0) == (0L until 1250).sum)
  }

  test("compaction can impose a sorted layout that then prunes") {
    val dir = "/tmp/graft-test/maintenance-sort"
    // unsorted drip ingest
    spark.range(100000).selectExpr("cast(hash(id) as bigint) AS noise", "id AS k")
      .orderBy("noise").drop("noise").repartition(8)
      .write.format("graft").mode("overwrite").save(dir)
    val st = GraftMaintenance.compact(spark, dir, targetFiles = 1,
      extraWriteOptions = Map("sortby" -> "k"))
    assert(st.rows == 100000)
    val g = spark.read.format("graft").load(dir)
    GraftMetrics.pageGroupsSkipped.set(0)
    GraftMetrics.pageGroupsRead.set(0)
    assert(g.filter(col("k") >= 50000 && col("k") < 51000).count() == 1000)
    assert(GraftMetrics.pageGroupsSkipped.get() >= 10,
      s"post-compaction sorted layout should prune, skipped=${GraftMetrics.pageGroupsSkipped.get()}")
  }
}
