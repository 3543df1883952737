package graft.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CALL-style SQL surface for the table-lifecycle ops: `graft_compact`,
  * `graft_zorder`, `graft_vacuum`, `graft_vacuum_staged`,
  * `graft_expire_manifests`, `graft_restore`, and the CDC consumer
  * `graft_apply_changes` as table functions (the Delta/Iceberg
  * OPTIMIZE/VACUUM/CALL audience — a pure-SQL user of [[GraftCatalog]]
  * could not run lifecycle ops at all before this). Each returns generic
  * `(op, metric, value)` stat rows mirroring the library stats case
  * classes.
  *
  * The side effect runs at EXECUTION time, not analysis: the function
  * expands to a [[GraftMaintenanceCall]] leaf plan that
  * [[GraftMaintenanceStrategy]] plans into an exec node whose doExecute
  * performs the op on the driver — so EXPLAIN shows the call without
  * compacting anything, and the op runs exactly when the query does.
  * A re-executed plan (two actions on one DataFrame) re-runs the op;
  * every op is converge-on-re-run by design (compacting a compacted
  * table, re-vacuuming, re-expiring are cheap no-ops), so this is the
  * same contract as running the SQL twice. Lock discipline is the
  * library's own ([[GraftTableLock]] inside each op).
  */
final case class GraftMaintenanceCall(op: String, path: String,
    strArgs: Seq[String], longArgs: Seq[Long],
    // output rides the constructor (the LocalRelation pattern) so tree
    // copies preserve the exprIds the analyzed plan bound against
    override val output: Seq[Attribute] = Seq(
      AttributeReference("op", StringType, nullable = false)(),
      AttributeReference("metric", StringType, nullable = false)(),
      AttributeReference("value", LongType, nullable = false)()))
    extends LeafNode {
  // a handful of stat rows; the optimizer only needs a finite size
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64)
}

object GraftMaintenanceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: GraftMaintenanceCall => GraftMaintenanceExec(c) :: Nil
    case _ => Nil
  }
}

final case class GraftMaintenanceExec(call: GraftMaintenanceCall)
    extends LeafExecNode {
  override def output: Seq[Attribute] = call.output

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val stats: Seq[(String, Long)] = call.op match {
      case "compact" =>
        val st = GraftMaintenance.compact(spark, call.path,
          call.longArgs.head.toInt)
        Seq("files_before" -> st.filesBefore.toLong,
          "bytes_before" -> st.bytesBefore,
          "files_after" -> st.filesAfter.toLong,
          "bytes_after" -> st.bytesAfter,
          "rows" -> st.rows)
      case "zorder" =>
        val st = GraftMaintenance.zorder(spark, call.path, call.strArgs,
          call.longArgs.head.toInt)
        Seq("files_before" -> st.filesBefore.toLong,
          "bytes_before" -> st.bytesBefore,
          "files_after" -> st.filesAfter.toLong,
          "bytes_after" -> st.bytesAfter,
          "rows" -> st.rows)
      case "vacuum" =>
        val st = GraftMaintenance.vacuum(spark, call.path, call.longArgs.head)
        Seq("staging_tmps" -> st.stagingTmps.toLong,
          "scratch_files" -> st.scratchFiles.toLong,
          "changelog_files" -> st.changelogFiles.toLong,
          "bytes_reclaimed" -> st.bytesReclaimed)
      case "expire_manifests" =>
        val n = GraftMaintenance.expireManifests(spark, call.path,
          call.longArgs.head)
        Seq("manifests_removed" -> n.toLong)
      case "compact_partition" =>
        val spec = call.strArgs.head.split(",").map(_.trim).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"graft: malformed partition spec entry '$kv' " +
            "(expected col=value[,col=value...])")
          kv.substring(0, i).trim -> kv.substring(i + 1).trim
        }.toMap
        val st = GraftMaintenance.compactPartition(spark, call.path, spec,
          call.longArgs.head.toInt)
        Seq("files_before" -> st.filesBefore.toLong,
          "bytes_before" -> st.bytesBefore,
          "files_after" -> st.filesAfter.toLong,
          "bytes_after" -> st.bytesAfter,
          "rows" -> st.rows)
      case "analyze" =>
        val st = GraftMaintenance.analyzeTable(spark, call.path)
        Seq("files" -> st.files.toLong,
          "files_missing_stats" -> st.missing.toLong,
          "files_rewritten" -> st.rewritten.toLong,
          "bloom_cols" -> st.bloomCols.toLong,
          "ndv_cols" -> st.ndvCols.toLong)
      case "vacuum_staged" =>
        val (dirs, bytes) = GraftMaintenance.vacuumStaged(spark, call.path,
          call.longArgs.head)
        Seq("staged_dirs_removed" -> dirs.toLong,
          "bytes_reclaimed" -> bytes)
      case "apply_changes" =>
        val (appended, deleteKeys) = GraftCdc.applyChangesBetween(spark,
          call.path, call.longArgs.head, call.longArgs(1),
          call.strArgs.head, call.strArgs(1))
        Seq("rows_appended" -> appended,
          "delete_keys_applied" -> deleteKeys)
      case "restore_ts" =>
        val st = GraftMaintenance.restoreAsOf(spark, call.path,
          call.longArgs.head)
        Seq("version" -> st.version,
          "files_removed" -> st.filesRemoved.toLong,
          "manifests_expired" -> st.manifestsExpired.toLong,
          "dv_generations_removed" -> st.dvGenerationsRemoved.toLong,
          "feed_files_removed" -> st.feedFilesRemoved.toLong,
          "rows_after" -> st.rowsAfter)
      case "restore" =>
        val st = GraftMaintenance.restore(spark, call.path,
          call.longArgs.head)
        Seq("version" -> st.version,
          "files_removed" -> st.filesRemoved.toLong,
          "manifests_expired" -> st.manifestsExpired.toLong,
          "dv_generations_removed" -> st.dvGenerationsRemoved.toLong,
          "feed_files_removed" -> st.feedFilesRemoved.toLong,
          "rows_after" -> st.rowsAfter)
      case other =>
        throw new IllegalArgumentException(s"graft: unknown maintenance op $other")
    }
    val opStr = UTF8String.fromString(call.op)
    // the exchange-free collect path requires UnsafeRows
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(output.map(_.dataType).toArray)
    val rows = stats.map { case (m, v) =>
      proj(InternalRow(opStr, UTF8String.fromString(m), v)).copy(): InternalRow
    }
    sparkContext.parallelize(rows, 1)
  }
}
