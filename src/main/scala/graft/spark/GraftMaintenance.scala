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
    * place. Safety model: the rewrite is an APPEND (tasks stage `.tmp`
    * files, invisible to readers; job commit renames them in atomically),
    * and afterwards compact deletes exactly the file-set SNAPSHOT it
    * captured before the rewrite — never a commit-time listing. A file
    * appended by another writer after the snapshot is therefore never
    * deleted: its rows survive compaction (if the rewrite's scan happened
    * to pick it up too, they appear twice — duplicates, recoverable by
    * re-compacting, never silent loss). Concurrent readers planned on the
    * old file set keep reading files that still exist until the final
    * delete; a crash mid-delete leaves old+new visible (duplicates,
    * recoverable) rather than data loss. Fully concurrent writers remain
    * otherwise unsupported (two simultaneous write jobs race on `.tmp`
    * staging sweeps — a visible job failure, not loss). Streaming note:
    * like any rewrite, a stream checkpointed over the old files should
    * restart; manifests present at the snapshot are retired with the
    * snapshot's data files.
    *
    * `extraWriteOptions` pass through to the writer (e.g. a `sortby`
    * re-layout or `bloomfilter` columns can be (re)applied during the
    * rewrite — compaction is the natural moment to impose layout).
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int,
      extraWriteOptions: Map[String, String] = Map.empty): CompactStats =
    compactImpl(spark, dir, targetFiles, extraWriteOptions, () => ())

  /** `afterRewrite` is a test seam: it runs after the rewrite commit and
    * before the snapshot delete — exactly the window a concurrent append
    * lands in, which the snapshot-scoped delete must leave untouched. */
  private[graft] def compactImpl(spark: SparkSession, dir: String, targetFiles: Int,
      extraWriteOptions: Map[String, String], afterRewrite: () => Unit): CompactStats = {
    require(targetFiles >= 1, s"graft: targetFiles must be >= 1, got $targetFiles")
    val conf = spark.sessionState.newHadoopConf()
    val tableDir = new org.apache.hadoop.fs.Path(dir)
    val fs = tableDir.getFileSystem(conf)
    val before = GraftUtil.listDataFiles(dir, conf)
    val beforeManifests = GraftManifest.list(fs, tableDir)
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
    val writer = df.repartition(targetFiles).write.format("graft").mode("append")
    opts.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }
      .save(dir)
    afterRewrite()
    // retire ONLY the pre-rewrite snapshot (manifests first, so a crash
    // window never leaves a manifest referencing a deleted file): files
    // appended by another writer since the snapshot are not ours to delete
    beforeManifests.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(GraftManifest.dir(tableDir), n), false))
    before.foreach(f => fs.delete(f.getPath, false))
    val after = GraftUtil.listDataFiles(dir, conf)
    CompactStats(before.size, before.map(_.getLen).sum,
      after.size, after.map(_.getLen).sum, rows)
  }
}
