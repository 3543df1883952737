package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: isolates raw string-lane decode throughput from query CPU —
  * times sum(length(text)) (pure decode + trivial agg) and the
  * regexp-heavy t_token_stats shape over the SAME staged corpus, graft vs
  * parquet, interleaved min-of-3. Args: [sfDir] [ampFactor].
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.graft.read.prefetch.threads",
        sys.env.getOrElse("GRAFT_PROBE_PREFETCH", "1"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (factor > 1) graft.Bench.stageAmplified(spark, sfDir, factor) else sfDir

    def load(fmt: String) = {
      sys.props("graft.tables.format") = fmt
      graft.Tables.load(spark, dir, "documents")
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    Seq("graft", "parquet").foreach(f => load(f).agg(sum(length(col("text")))).collect())
    def tokensQ(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("re_tokens",
          expr("size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))"))
        .groupBy(col("lang")).agg(sum(col("re_tokens")))
    // in-JVM A/B of the prefetch pool: same staged bytes, interleaved,
    // min-of-5 per arm (the prefetch conf is read at scan-plan time, so
    // flipping the session conf between reads flips the reader behavior)
    val arms = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until 5; pf <- Seq("1", "0"); fmt <- Seq("graft", "parquet")) {
      spark.conf.set("spark.hadoop.graft.read.prefetch.threads", pf)
      val sec = time(tokensQ(load(fmt)).collect())
      val k = s"$fmt-pf$pf"
      arms(k) = sec :: arms(k)
      if (r == 4) println(f"AB $k min=${arms(k).min}%.3f all=${arms(k).reverse.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
