package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: a live manifest-mode stream's position must be MONOTONIC
  * across row-level rewrites. A merge (or deleteWhere/updateWhere) passes
  * through a window where every manifest is expired (the heal pass ran,
  * the op's own commit is not yet published); a micro-batch trigger firing
  * inside that window used to capture the Empty offset, the engine
  * committed it, and the next batch redelivered the ENTIRE table to a
  * checkpointed consumer (302 rows instead of 152 below). The
  * SupportsAdmissionControl latestOffset(start, limit) overload now
  * refuses to move the offset backwards. Found by the DML x streaming
  * differential fuzz (DmlDifferentialSpec), pinned here as a minimal case.
  */
class StreamOffsetMonotonicSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("live stream across a merge delivers only the inserts, never a replay") {
    val dir = "/tmp/graft-test/stream-monotonic"
    val ckpt = s"$dir-ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    spark.range(150).selectExpr("id AS k", "id AS v", "'s' AS s", "'p' AS p")
      .repartition(3).write.format("graft").mode("overwrite").save(dir)
    val schema = spark.read.format("graft").load(dir).schema
    val q = spark.readStream.format("graft").schema(schema)
      .option("manifest", "true").load(dir)
      .writeStream.format("memory").queryName("stream_monotonic")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("stream_monotonic").count() == 150L)
      // the merge rewrites every file (matched keys in all 3), expiring the
      // initial manifest — the empty-manifest window the guard covers
      val src = spark.range(30).selectExpr("id * 5 AS k", "id + 1000 AS v",
          "'m' AS s", "'p' AS p")
        .unionAll(spark.range(2).selectExpr("id + 10000 AS k", "id AS v",
          "'mi' AS s", "'p' AS p"))
      val pre = GraftMaintenance.SrcPrefix
      GraftMaintenance.mergeApply(spark, dir, src, Seq("k" -> "k"),
        matched = Seq(GraftMaintenance.MergeClause(None, Some(Map(
          "v" -> col(pre + "v"), "s" -> col(pre + "s"))))),
        notMatchedInsert = Seq(GraftMaintenance.MergeClause(None,
          Some(Map("k" -> col("k"), "v" -> col("v"),
            "s" -> col("s"), "p" -> col("p"))))))
      q.processAllAvailable()
      val n = spark.table("stream_monotonic").count()
      assert(n == 152L,
        s"live stream must append ONLY the 2 merge inserts (150 -> 152), got $n" +
          " — an offset regression replays the table")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS stream_monotonic") }
  }
}
