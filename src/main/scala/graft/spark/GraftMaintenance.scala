package graft.spark

import org.apache.spark.sql.SparkSession

/** Table maintenance for graft directories — the OPTIMIZE-style passes a
  * long-lived 100 TB ingest table needs. (The reference is a file-format
  * library; file-set lifecycle is the caller's concern there, so this layer
  * is ours.)
  */
object GraftMaintenance {

  /** Result of a compaction: file counts and bytes before/after. */
  final case class CompactStats(filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long, rows: Long)

  /** Compact a graft table's small files into `targetFiles` files, in
    * place. Safety model: the writer stages `.tmp` files (invisible to
    * readers — the lister skips dotfiles), and job commit renames new
    * files in BEFORE deleting old ones, so concurrent readers planned on
    * the old file set keep reading files that still exist until the final
    * delete, and a crash mid-commit leaves old+new (duplicates,
    * recoverable) rather than data loss. Streaming note: like any
    * overwrite, a stream checkpointed over the old files should restart.
    *
    * `extraWriteOptions` pass through to the writer (e.g. a `sortby`
    * re-layout or `bloomfilter` columns can be (re)applied during the
    * rewrite — compaction is the natural moment to impose layout).
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      extraWriteOptions: Map[String, String] = Map.empty): CompactStats = {
    require(targetFiles >= 1, s"graft: targetFiles must be >= 1, got $targetFiles")
    val conf = spark.sessionState.newHadoopConf()
    val before = GraftUtil.listDataFiles(dir, conf)
    require(before.nonEmpty, s"graft: nothing to compact under $dir")
    // a hive-partitioned table must come OUT of compaction with the same
    // directory layout it went in with (partition values survive in the
    // data, so the keys are recoverable from any file's subdir path) —
    // silently flattening would strip directory-level pruning from every
    // later query. An explicit partitionby in extraWriteOptions wins.
    val existingLayout = GraftUtil
      .partitionSegments(new org.apache.hadoop.fs.Path(dir), before.head.getPath)
      .map(_._1)
    val opts =
      if (existingLayout.nonEmpty && !extraWriteOptions.contains("partitionby"))
        extraWriteOptions + ("partitionby" -> existingLayout.mkString(","))
      else extraWriteOptions
    val df = spark.read.format("graft").load(dir)
    val rows = df.count()
    val writer = df.repartition(targetFiles).write.format("graft").mode("overwrite")
    opts.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }
      .save(dir)
    val after = GraftUtil.listDataFiles(dir, conf)
    CompactStats(before.size, before.map(_.getLen).sum,
      after.size, after.map(_.getLen).sum, rows)
  }
}
