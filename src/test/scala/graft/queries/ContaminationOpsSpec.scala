package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan guards for the contamination/duplication-mass ops:
  *
  *  - d_decontamination_contain: containment in [0,1]; the injected
  *    eval-copy fixtures must be flagged contaminated (threshold branch
  *    non-vacuous); no pairwise/cartesian term in the plan.
  *  - d_dup_ngram_mass: fraction in [0,1]; a gram must cross DOCUMENTS to
  *    count (in-doc repetition is t_repetition's signal, not this one).
  */
class ContaminationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("d_decontamination_contain: fixtures flagged, bounds hold, no cartesian") {
    val df = TrainingData.queries("d_decontamination_contain")(spark, sf)
    assert(!df.queryExecution.explainString(FormattedMode).contains("CartesianProduct"),
      "containment join fell back to a shuffled Cartesian")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hits, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits <= n, s"doc ${r.getLong(0)}: eval_grams $hits > n_grams $n")
      assert(c >= 0.0 && c <= 1.0, s"containment out of bounds: $c")
      assert((r.getLong(4) == 1L) == (c >= 0.3), "threshold flag inconsistent")
    }
    // the injected eval-copies (id >= 10M) are fully contaminated
    val injected = rows.filter(_.getLong(0) >= 10000000L)
    assert(injected.nonEmpty, "no injected fixtures in output")
    injected.foreach { r =>
      assert(r.getDouble(3) == 1.0 && r.getLong(4) == 1L,
        s"injected eval copy ${r.getLong(0)} not fully contaminated: ${r.getDouble(3)}")
    }
    // some natural (non-fixture) docs must remain clean or the signal is trivial
    assert(rows.exists(r => r.getLong(0) < 10000000L && r.getLong(4) == 0L))
  }

  test("d_dup_ngram_mass: only cross-document grams count") {
    val rows = TrainingData.queries("d_dup_ngram_mass")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dup <= n && f >= 0.0 && f <= 1.0, s"doc ${r.getLong(0)}: $dup/$n = $f")
    }
    assert(rows.exists(_.getLong(2) > 0L), "no duplicated mass anywhere — vacuous")
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "every occurrence duplicated — degenerate corpus or broken flag")

    // semantic guard on a controlled corpus: a doc that repeats ITSELF but
    // shares nothing cross-doc must score zero duplicated mass
    import spark.implicits._
    val tmp = "/tmp/graft-test/dupmass-ctl"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta", "s", "en", 8L),
      (2L, "epsilon zeta eta theta iota kappa lambda mu", "s", "en", 8L),
      (3L, "epsilon zeta eta theta nu xi omicron pi", "s", "en", 8L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ctl = TrainingData.queries("d_dup_ngram_mass")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ctl(1L) == 0L, s"self-repetition counted as duplication: ${ctl(1L)}")
    assert(ctl(2L) > 0L && ctl(3L) > 0L, "cross-doc shared grams not counted")
  }
}
