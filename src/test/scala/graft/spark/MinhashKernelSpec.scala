package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native MinHash kernels must be bit-identical drop-ins for the SQL
  * HOF forms they replaced in d_dedup_minhash_lsh / d_dedup_incremental —
  * the oracle hash compare tolerates zero drift. Pins: the 64-lane
  * signature fold (negatives, null elements, empty arrays, null arrays)
  * and the lane-agreement count, interpreted vs whole-stage-codegen.
  */
class MinhashKernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val SigSql =
    """aggregate(hb,
         array_repeat(cast(9223372036854775807 as bigint), 64),
         (acc, v) -> zip_with(acc,
           transform(sequence(0, 63),
             h -> pmod((h*2+1) * pmod(v, 1000000007) + h*12345+1, 1000000007)),
           (a, b) -> least(a, b)))"""

  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 300).map { i =>
      val n = i % 11 // includes empty arrays
      val hb: Array[java.lang.Long] = Array.tabulate(n) { j =>
        if (i % 13 == 0 && j == 0) null // null element: lane keeps acc
        else java.lang.Long.valueOf(rnd.nextLong()) // full range incl. negatives
      }
      (i.toLong, hb)
    }
    rows.toDF("id", "hb")
  }

  test("signature fold matches the SQL aggregate/zip_with form exactly") {
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = fixture
        .withColumn("sig_sql", expr(SigSql))
        .withColumn("sig_native", VecOps.minhashSignature(col("hb")))
        .collect()
      assert(got.length == 300)
      got.foreach { r =>
        val s = r.getAs[scala.collection.Seq[Long]]("sig_sql")
        val n = r.getAs[scala.collection.Seq[Long]]("sig_native")
        assert(s == n, s"id=${r.getLong(0)} codegen=$codegen: $s vs $n")
      }
    }
  }

  test("null input array yields NULL, like the SQL aggregate") {
    import spark.implicits._
    val df = Seq((1L, null: Array[java.lang.Long])).toDF("id", "hb")
    val r = df.withColumn("sig_sql", expr(SigSql))
      .withColumn("sig_native", VecOps.minhashSignature(col("hb")))
      .head
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("lane agreement matches size(filter(zip_with)) exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (0 until 200).map { i =>
      val a = Array.fill(64)(rnd.nextInt(4).toLong)
      val b = if (i % 19 == 0) Array.fill(63)(rnd.nextInt(4).toLong) // mismatch
        else Array.fill(64)(rnd.nextInt(4).toLong)
      (i.toLong, a, b)
    }
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = rows.toDF("id", "a", "b")
        .withColumn("agree_sql", expr(
          "CASE WHEN size(a) = size(b) THEN size(filter(zip_with(a, b, (x, y) -> x = y), p -> p)) END"))
        .withColumn("agree_native", VecOps.signatureAgreement(col("a"), col("b")))
        .collect()
      got.foreach { r =>
        val s = if (r.isNullAt(3)) null else Integer.valueOf(r.getInt(3))
        val n = if (r.isNullAt(4)) null else Integer.valueOf(r.getInt(4))
        assert(s == n, s"id=${r.getLong(0)} codegen=$codegen: $s vs $n")
      }
    }
  }
}
