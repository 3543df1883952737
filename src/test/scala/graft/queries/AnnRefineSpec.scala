package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF-PQ refine stage reranks a BOUNDED candidate set (R rows per
  * query) by exact dot product — the work is R-bounded by construction,
  * but before round 13 the scan feeding it was a second full pass over
  * the raw-vector column. This spec pins the fix: with the rerank source
  * loaded runtime-filter-enabled over a vec_id-sorted layout, the
  * broadcast tid IN-set merges into the zone maps and the refine reads
  * only the pages covering the candidate ids.
  */
class AnnRefineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("refine scan is page-bounded by the runtime tid IN-set on a sorted corpus") {
    import graft.spark.GraftMetrics
    val corpusDir = "/tmp/graft-test/ann-refine-corpus"
    val candDir = "/tmp/graft-test/ann-refine-cand"
    // 200k vectors, vec_id-sorted single file -> tight per-page zone maps
    spark.range(200000)
      .selectExpr("id AS vec_id",
        "array(id % 97, id % 89, id % 83, id % 79) AS v")
      .orderBy("vec_id").coalesce(1)
      .write.format("graft").mode("overwrite").save(corpusDir)
    // candidate set: 10 queries x 50 candidates, all ids inside one narrow
    // band of the corpus (the realistic case — coarse lists are locality
    // biased); written as a table with a SELECTIVE filter column, matching
    // the shape Spark's runtime-filter injection requires of a build side
    spark.range(2000)
      .selectExpr("id % 10 AS qid", "150000 + (id * 7) % 2000 AS tid",
        "CASE WHEN id < 500 THEN 'y' ELSE 'n' END AS sel")
      .coalesce(1).write.format("graft").mode("overwrite").save(candDir)

    val tv = spark.read.format("graft").option("runtimefilter", "true")
      .load(corpusDir)
      .select(col("vec_id").as("tid"), col("v").as("rtv"))
    val pre = spark.read.format("graft").load(candDir)
      .filter(col("sel") === "y").select(col("qid"), col("tid")).distinct()
    val qv = spark.range(10).selectExpr("id AS qid",
      "array(1L, 2L, 3L, 4L) AS rqv")

    GraftMetrics.pageGroupsSkipped.set(0)
    GraftMetrics.pageGroupsRead.set(0)
    val out = TrainingData.refineJoin(tv, pre, qv).collect()
    // correctness: top-5 per query, ranked by exact dot with id tie-break
    assert(out.length == 50, s"expected 10 queries x top-5, got ${out.length}")
    assert(out.map(_.getLong(0)).distinct.sorted.toSeq == (0L until 10L))
    val skipped = GraftMetrics.pageGroupsSkipped.get()
    val read = GraftMetrics.pageGroupsRead.get()
    // the candidate band covers ~2000 of 200k sorted rows: virtually every
    // corpus page must be SKIPPED via the runtime IN-set, not decoded
    assert(skipped >= 5,
      s"refine should prune corpus pages outside the candidate band: skipped=$skipped read=$read")
    assert(read <= skipped,
      s"refine read more page groups than it skipped (skipped=$skipped read=$read) — " +
        "the runtime tid IN-set is not reaching the zone maps")
  }
}
