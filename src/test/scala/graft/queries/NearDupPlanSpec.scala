package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guard for the near-dup pair generation shared by
  * d_ngram_jaccard and d_dedup_clusters (ccLabels): the candidate join must
  * equi-key on (source, n_chars band) — never on source alone, which makes
  * every per-source block all-pairs — and the token-intersection join must
  * be pair-scoped (composite (id, w) keys) — never keyed on the bare word,
  * which makes a corpus-frequent token produce |docs∋w|² rows. Both were
  * quadratic-at-scale shapes flagged in round 6; this spec pins the fix.
  */
class NearDupPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Equi-key attribute-name sets of every hash/merge join in the plan
    * (formatted-explain `Left keys` lines, `#id` suffixes stripped). */
  private def joinKeySets(df: DataFrame): Seq[Set[String]] = {
    val plan = df.queryExecution.explainString(FormattedMode)
    val re = """Left keys \[\d+\]: \[([^\]]*)\]""".r
    re.findAllMatchIn(plan)
      .map(_.group(1).split(",").map(_.trim.takeWhile(_ != '#')).toSet)
      .toSeq
  }

  test("near-dup candidate + intersection joins are banded and pair-scoped") {
    val df = TrainingData.nearDupPairs(spark, sf)
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "near-dup plan fell back to a non-equi join")
    val keys = joinKeySets(df)
    assert(keys.nonEmpty, "expected hash joins in the near-dup plan")
    keys.foreach { ks =>
      assert((ks -- Set("source", "sa", "sb")).nonEmpty,
        s"join keyed solely on source ($ks): per-source all-pairs")
      assert(ks != Set("w"),
        "token intersection keyed solely on the word: hot-token quadratic join")
    }
    assert(keys.exists(ks => ks.contains("source") && ks.contains("band")),
      s"candidate join lost its (source, band) equi-key: $keys")
    assert(keys.exists(ks => ks.contains("idb") && ks.contains("w")),
      s"intersection join lost its pair-scoped (idb, w) key: $keys")
  }

  test("banded candidate generation finds the same pairs as the exact filter") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val exact = d.select(col("doc_id").as("ida"), col("source").as("sa"), col("n_chars").as("ca"))
      .join(d.select(col("doc_id").as("idb"), col("source").as("sb"), col("n_chars").as("cb")),
        col("sa") === col("sb") && col("ida") < col("idb") &&
          abs(col("ca") - col("cb")) <= 2)
      .select(col("ida"), col("idb"))
    val banded = TrainingData.nearDupPairs(spark, sf)
      .select(col("ida"), col("idb"))
    // every confirmed pair must satisfy the exact candidate predicate, and
    // the banding must not multiply pairs
    val confirmed = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(confirmed.distinct.size == confirmed.size, "banding duplicated pairs")
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(confirmed.forall(exactSet.contains), "banding admitted a non-candidate pair")
  }
}
