package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** graft.pipeline.materialize=table must produce bit-identical results to
  * the default cache mode, routing the reused signature/bucket frames
  * through graft scratch tables instead of the executors' storage pool.
  */
class PipelineMaterializeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] = {
    val df = graft.SparkEntry.queries(q)(spark, sf)
    df.selectExpr("to_json(struct(*)) AS r").collect().map(_.getString(0)).sorted.toSeq
  }

  test("table materialization matches cache mode and writes graft scratch tables") {
    val scratch = "/tmp/graft-test/pipeline-scratch"
    // stale artifacts from a previous run must not satisfy the assertions
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    val cached = Seq("d_dedup_minhash_lsh", "d_dedup_simhash", "s_ann_lsh").map(q => q -> rows(q))
    try {
      spark.conf.set("graft.pipeline.materialize", "table")
      spark.conf.set("graft.pipeline.scratch", scratch)
      cached.foreach { case (q, expected) =>
        assert(rows(q) == expected, s"$q: table mode diverged from cache mode")
      }
      // the scratch frames really went through the graft format, under THIS
      // application's subdir
      val appDir = new java.io.File(scratch, spark.sparkContext.applicationId)
      val names = Option(appDir.listFiles()).toSeq.flatten.map(_.getName)
      assert(names.contains("minhash_sigs_portable"), s"got ${names.mkString(",")}")
      assert(names.contains("ann_buckets"))
    } finally {
      spark.conf.set("graft.pipeline.materialize", "cache")
      spark.conf.unset("graft.pipeline.scratch")
    }
  }
}
