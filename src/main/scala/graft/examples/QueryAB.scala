package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic: interleaved A/B timing of SparkEntry queries over graft vs
  * parquet in one JVM (alternating runs, so machine load lands on both
  * formats equally — the bench's suite-then-suite order cannot tell noise
  * from regression on a loaded box). Supports the bench's x10 amplified
  * staging and its fast-hash impl substitutions, so a QueryAB number is
  * directly comparable to the bench's scaled section.
  *
  *   sbt "runMain graft.examples.QueryAB q5_local_supplier /root/testdata/sf0.1 5"
  *   sbt "runMain graft.examples.QueryAB d_decontam_bloom,d_dedup_simhash /root/testdata/sf0.1 5 10"
  */
object QueryAB {
  def main(args: Array[String]): Unit = {
    val qs = (if (args.length > 0) args(0) else "q5_local_supplier").split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 5
    val factor = if (args.length > 3) args(3).toInt else 1
    // optional session confs ("k=v;k2=v2") — the A/B lever for conf-gated
    // query variants (e.g. graft.pipeline.keepFirstWindow)
    val confs: Seq[(String, String)] =
      if (args.length > 4) args(4).split(";").toSeq.flatMap { kv =>
        kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      } else Seq.empty
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val dir = if (factor > 1) graft.Bench.stageAmplified(spark, sfDir, factor) else sfDir
    graft.Tables.all.foreach(t => graft.Tables.load(spark, dir, t))

    // same substitutions the bench times (xxhash64 fast lanes; capped
    // scaled shapes for the two constant-heavy ops)
    val impl: Map[String, (SparkSession, String) => DataFrame] = Map(
      "d_dedup_minhash_lsh" -> ((s, d) => graft.queries.TrainingData.minhashLsh(s, d, portable = false)),
      "d_dedup_simhash" -> ((s, d) => graft.queries.TrainingData.simhashDedup(s, d, portable = false))) ++
      (if (factor > 1) Map[String, (SparkSession, String) => DataFrame](
        "s_embedding_pca" -> ((s, d) => graft.queries.TrainingData.pcaQuery(s, d, factor)),
        "m_multimodal_scenecut" -> ((s, d) => graft.queries.TrainingData.scenecutQuery(s, d, factor)))
       else Map.empty[String, (SparkSession, String) => DataFrame])

    def time(q: String, fmt: String): Double = {
      spark.catalog.clearCache()
      sys.props("graft.tables.format") = fmt
      try {
        val df = impl.getOrElse(q, graft.SparkEntry.queries(q))(spark, dir)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.tables.format")
    }

    for (q <- qs) {
      time(q, "graft"); time(q, "parquet") // warm
      val g = collection.mutable.ArrayBuffer[Double]()
      val p = collection.mutable.ArrayBuffer[Double]()
      (1 to runs).foreach { i =>
        if (i % 2 == 1) { g += time(q, "graft"); p += time(q, "parquet") }
        else { p += time(q, "parquet"); g += time(q, "graft") }
        println(f"RUN$i $q: graft ${g.last}%.3f s  parquet ${p.last}%.3f s")
      }
      println(f"MIN $q: graft ${g.min}%.3f s  parquet ${p.min}%.3f s  ratio ${g.min / p.min}%.2f")
    }
    spark.stop()
  }
}
