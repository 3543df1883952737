package graft.examples

import org.apache.spark.sql.SparkSession

/** Small-file compaction for a graft directory — the OPTIMIZE-style
  * maintenance pass a long-lived ingest table needs. Reads the table,
  * rewrites it as `targetFiles` files, and swaps atomically IN PLACE: the
  * writer stages `.tmp` files (invisible to readers), and at job commit
  * renames the new files in BEFORE deleting the old ones, so the read side
  * of this very job — which finishes before commit — never races the
  * delete, and a crash mid-commit leaves old+new (duplicates, recoverable)
  * rather than data loss. Truncation also resets the streaming manifest
  * history; a stream checkpointed over the old files should restart, as
  * with any overwrite.
  *
  *   sbt "runMain graft.examples.Compact /path/to/table 8"
  */
object Compact {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: Compact <dir> [targetFiles]"))
    val targetFiles = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val st = graft.spark.GraftMaintenance.compact(spark, dir, targetFiles)
    println(s"before: ${st.filesBefore} files, ${st.bytesBefore} bytes")
    println(s"after:  ${st.filesAfter} files, ${st.bytesAfter} bytes (${st.rows} rows)")
    spark.stop()
  }
}
