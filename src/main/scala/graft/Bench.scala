package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times headline queries over graft storage at
  * SPARK_GRAFT_SF_DIR; prints ONE JSON line. parquet->graft conversion
  * happens before timing (storage format benchmarks measure scans, not
  * ingest).
  *
  * The bench is SELF-BASELINING: the same session also times the identical
  * query code over the original parquet and emits both totals plus the
  * ratio in the one JSON artifact, so a loaded machine shows up as both
  * numbers moving together instead of a phantom regression. Each query is
  * timed GRAFT_BENCH_RUNS times per format (default 2) and the per-query
  * minimum is reported — min is the standard noise floor estimator for
  * same-JVM reruns (JIT and page cache only ever make reruns faster).
  */
object Bench {

  /** Queries that scale linearly and represent each capability family.
    * Quadratic verify-only baselines (d_ngram_jaccard, d_dedup_embedding,
    * s_ann_bruteforce — a cartesian recall oracle) are intentionally
    * excluded: a 100 TB engine's headline numbers must be scale-shaped.
    */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q6_forecast_revenue", "q3_shipping_priority",
    "q5_local_supplier", "q10_returned_items", "q18_large_orders",
    "q13_order_count_distribution", "q_window_top_orders", "q_events_hourly",
    "q_asof_purchase_view", "q_topk_orders", "q_sorted_scan", "q_map_pruning",
    "d_dedup_exact", "d_dedup_minhash_lsh", "d_dedup_simhash", "d_dedup_segments",
    "d_decontamination",
    "s_ann_lsh", "s_ann_ivf", "t_token_stats", "t_fingerprint",
    "t_quality_score", "t_language_id", "m_multimodal_meta", "m_multimodal_decode",
    "m_multimodal_resize", "m_multimodal_framesample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // single-node bench tuning, applied identically to the graft and
      // parquet runs: with 32 local cores and no spill pressure, a shuffled
      // hash join beats sort-merge for the fact-fact joins (measured ~0.2s
      // on q5). A multi-executor deployment at real scale should keep
      // Spark's default (SMJ degrades gracefully under skew/spill; AQE
      // re-plans either way).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage all graft conversions outside the timed region
    Tables.all.foreach(tn => Tables.load(spark, sfDir, tn))

    // Bench times the xxhash64 fast path of minhash/simhash; the declared
    // queries run a portable md5-fold hash so DuckDB can oracle-check them.
    // Both share the identical plan shape — only the leaf hash expression
    // differs.
    val fastImpl: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "d_dedup_minhash_lsh" -> ((s, d) => queries.TrainingData.minhashLsh(s, d, portable = false)),
      "d_dedup_simhash" -> ((s, d) => queries.TrainingData.simhashDedup(s, d, portable = false)))

    def run(name: String): Double = {
      // drop cached intermediates from prior runs: queries that cache a
      // frame for multi-branch reuse (minhash/simhash signatures) would
      // otherwise serve rerun N>1 from memory and min-of-runs would time a
      // cache scan instead of the engine (within-run reuse still happens —
      // that is the query's intended shape)
      spark.catalog.clearCache()
      // the df is built inside the timed scope's format setting (Tables.load
      // is consulted at plan-build time)
      val df = fastImpl.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    def timed(format: String, name: String): Double = {
      sys.props("graft.tables.format") = format
      try run(name)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name ($format) failed: ${e.getMessage}")
        -1.0
      } finally sys.props.remove("graft.tables.format")
    }

    // warm up one scan+agg and one join query IN BOTH FORMATS, so Spark's
    // own join/agg/codegen infrastructure is JIT-warm before either format
    // is timed (suite-then-suite ordering hands the second format a
    // systematically warmer JVM — measured as a phantom 1.8x on q10)
    Seq("q1_pricing_summary", "q3_shipping_priority").foreach { q =>
      timed("graft", q); timed("parquet", q)
    }

    // interleave formats per query (graft, parquet, graft, parquet, ...):
    // machine-load spikes and residual JIT land on both formats equally
    val results: Seq[(String, Double, Double)] = headline.map { name =>
      val g = Array.fill(runs)(0.0)
      val p = Array.fill(runs)(0.0)
      var i = 0
      while (i < runs) {
        g(i) = timed("graft", name)
        p(i) = timed("parquet", name)
        i += 1
      }
      def best(xs: Array[Double]) = if (xs.exists(_ < 0)) -1.0 else xs.min
      val (bg, bp) = (best(g), best(p))
      // a query that failed in EITHER format is excluded from BOTH totals —
      // summing different query sets would make the headline ratio compare
      // unlike-for-unlike (the exact phantom the self-baselining bench
      // exists to prevent)
      if (bg < 0 || bp < 0) (name, -1.0, -1.0) else (name, bg, bp)
    }

    def fmt(rs: Seq[(String, Double)]): (String, Double) = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      (qs, rs.map(_._2).filter(_ >= 0).sum)
    }

    val graft = results.map(r => (r._1, r._2))
    val parquet = results.map(r => (r._1, r._3))
    val (gq, gTotal) = fmt(graft)
    val (pq, pTotal) = fmt(parquet)
    val ratio = if (pTotal > 0) gTotal / pTotal else -1.0
    println(f"""{"metric":"total","value":$gTotal%.3f,"unit":"sec","queries":$gq,"sf":"$sfDir","runs":$runs,"parquet_total":$pTotal%.3f,"ratio":$ratio%.3f,"parquet_queries":$pq}""")
    spark.stop()
  }
}
