package graft.examples
import org.apache.spark.sql.SparkSession
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qs = Seq("s_ann_ivf", "s_ann_ivfpq", "s_knn_recall_ivfpq",
      "d_ngram_jaccard", "d_dedup_semantic", "d_dedup_semantic2",
      "q_schema_evolution", "q_sql_delete", "t_pipeline_e2e")
    qs.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      def c(tag: String) = plan.linesIterator.count(_.contains(tag))
      println(s"PLAN $name cartesian=${c("CartesianProduct")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"bcast=${c("BroadcastExchange")} shuffle=${c("Exchange hashpartitioning")} " +
        s"kernels=${c("graft_long_")} shj=${c("ShuffledHashJoin")} smj=${c("SortMergeJoin")}")
    }
    spark.stop()
  }
}
