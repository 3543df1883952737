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

  test("s_kmeans_loop: table-mode checkpointed iterations match cache mode") {
    val scratch = "/tmp/graft-test/pipeline-scratch-kml"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    val cacheRows = rows("s_kmeans_loop")
    try {
      spark.conf.set("graft.pipeline.materialize", "table")
      spark.conf.set("graft.pipeline.scratch", scratch)
      assert(rows("s_kmeans_loop") == cacheRows,
        "k-means loop diverged under table-mode checkpointing")
      // superseded assignment checkpoints were retired: only the final
      // assignment (+ the long-form frame) may remain on disk
      val appDir = new java.io.File(scratch, spark.sparkContext.applicationId)
      val names = Option(appDir.listFiles()).toSeq.flatten.map(_.getName)
      assert(names.count(_.startsWith("kml_a")) <= 1,
        s"superseded kml assignment checkpoints not retired: ${names.mkString(",")}")
    } finally {
      spark.conf.set("graft.pipeline.materialize", "cache")
      spark.conf.unset("graft.pipeline.scratch")
    }
  }

  test("cc label propagation: table-mode checkpoints bound the plan depth") {
    val scratch = "/tmp/graft-test/pipeline-scratch-cc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    // the ANALYZED plan carries the true lineage (the optimizer substitutes
    // cached segments with an InMemoryRelation leaf, which hides exactly the
    // recompute chain this test is about)
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case p => p }.size
    // cache mode: lineage stacks one join round per iteration
    val cacheLabels = TrainingData.ccLabels(spark, sf)
    val cacheNodes = planNodes(cacheLabels)
    val cacheRows = cacheLabels.selectExpr("to_json(struct(*)) AS r")
      .collect().map(_.getString(0)).sorted.toSeq
    val clustersCache = rows("d_dedup_clusters")
    try {
      spark.conf.set("graft.pipeline.materialize", "table")
      spark.conf.set("graft.pipeline.scratch", scratch)
      spark.conf.set("graft.pipeline.ccCheckpointInterval", "2")
      val tableLabels = TrainingData.ccLabels(spark, sf)
      val tableNodes = planNodes(tableLabels)
      // every 2nd round restarts the plan from a storage scan: the final
      // frame carries at most one propagation round of lineage, regardless
      // of how many iterations ran
      assert(tableNodes <= 40, s"checkpointed label plan has $tableNodes nodes")
      assert(tableNodes < cacheNodes,
        s"expected checkpointing to shrink the plan ($tableNodes vs $cacheNodes)")
      val tableRows = tableLabels.selectExpr("to_json(struct(*)) AS r")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(tableRows == cacheRows, "checkpointed labels diverged")
      assert(rows("d_dedup_clusters") == clustersCache,
        "d_dedup_clusters diverged under table-mode checkpointing")
      // superseded checkpoints are retired: at most the live label dir (and
      // the edge checkpoint) remain
      val appDir = new java.io.File(scratch, spark.sparkContext.applicationId)
      val ccDirs = Option(appDir.listFiles()).toSeq.flatten.map(_.getName)
        .filter(_.startsWith("cc_labels_"))
      assert(ccDirs.size <= 1, s"superseded checkpoints not retired: $ccDirs")
    } finally {
      spark.conf.set("graft.pipeline.materialize", "cache")
      spark.conf.unset("graft.pipeline.scratch")
      spark.conf.unset("graft.pipeline.ccCheckpointInterval")
    }
  }

  test("naming a scratch root flips the materialize default to table") {
    try {
      spark.conf.unset("graft.pipeline.materialize")
      assert(TrainingData.materializeMode(spark) == "cache")
      spark.conf.set("graft.pipeline.scratch", "/tmp/graft-test/flip-scratch")
      assert(TrainingData.materializeMode(spark) == "table")
      // an explicit mode always wins over the flip
      spark.conf.set("graft.pipeline.materialize", "cache")
      assert(TrainingData.materializeMode(spark) == "cache")
    } finally {
      spark.conf.set("graft.pipeline.materialize", "cache")
      spark.conf.unset("graft.pipeline.scratch")
    }
  }
}
