package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CHECK table constraints: persisted in the schema sidecar, reported
  * through Table.constraints(), ENFORCED by Spark's own constraint
  * machinery on every write through the connector. ADD CONSTRAINT
  * validates the existing rows first; PK/FK/UNIQUE are rejected loudly
  * (a file store cannot enforce them, and an unenforced key promise
  * would mislead the optimizer).
  */
class ConstraintSpec extends AnyFunSuite {
  private val wh = "/tmp/graft-test/constraint-wh"

  lazy val spark: SparkSession = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.ck", "graft.spark.GraftCatalog")
      .config("spark.sql.catalog.ck.warehouse", wh)
      .getOrCreate()
  }

  test("CREATE TABLE with CHECK rejects violating inserts, admits valid ones") {
    spark.sql("CREATE TABLE ck.t1 (id BIGINT, qty BIGINT, " +
      "CONSTRAINT qty_pos CHECK (qty > 0))")
    spark.sql("INSERT INTO ck.t1 VALUES (1, 5), (2, 7)")
    assert(spark.sql("SELECT count(*) FROM ck.t1").head.getLong(0) == 2)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ck.t1 VALUES (3, -1)")
    }
    assert(e.getMessage.toLowerCase.contains("qty") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM ck.t1").head.getLong(0) == 2,
      "a failed insert must land nothing")
  }

  test("ALTER TABLE ADD CONSTRAINT validates existing rows first") {
    spark.sql("CREATE TABLE ck.t2 (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO ck.t2 VALUES (1, 5), (2, -3)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ck.t2 ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    }
    assert(e.getMessage.contains("violate") || e.getMessage.contains("qty_pos"),
      e.getMessage)
    // after removing the offender, the ALTER lands and then enforces
    spark.sql("DELETE FROM ck.t2 WHERE qty < 0")
    spark.sql("ALTER TABLE ck.t2 ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO ck.t2 VALUES (3, 0)")
    }
    spark.sql("INSERT INTO ck.t2 VALUES (3, 1)")
    assert(spark.sql("SELECT count(*) FROM ck.t2").head.getLong(0) == 2)
  }

  test("DROP CONSTRAINT lifts enforcement; constraints persist across loads") {
    spark.sql("CREATE TABLE ck.t3 (id BIGINT, " +
      "CONSTRAINT id_small CHECK (id < 100))")
    // a FRESH catalog instance over the same warehouse reads the sidecar
    spark.conf.set("spark.sql.catalog.ck2", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ck2.warehouse", wh)
    intercept[Exception] {
      spark.sql("INSERT INTO ck2.t3 VALUES (500)")
    }
    spark.sql("ALTER TABLE ck2.t3 DROP CONSTRAINT id_small")
    spark.sql("INSERT INTO ck.t3 VALUES (500)")
    assert(spark.sql("SELECT count(*) FROM ck.t3").head.getLong(0) == 1)
  }

  test("PK/UNIQUE constraints are rejected with the reason") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE ck.t4 (id BIGINT, " +
        "CONSTRAINT pk PRIMARY KEY (id))")
    }
    assert(e.getMessage.contains("CHECK") || e.getMessage.contains("enforce"),
      e.getMessage)
  }

  test("NULL check results pass (SQL CHECK semantics), FALSE fails") {
    spark.sql("CREATE TABLE ck.t5 (id BIGINT, qty BIGINT, " +
      "CONSTRAINT q CHECK (qty > 0))")
    spark.sql("INSERT INTO ck.t5 VALUES (1, NULL)") // NULL check passes
    assert(spark.sql("SELECT count(*) FROM ck.t5").head.getLong(0) == 1)
  }

  test("UPDATE is constrained atomically (both CoW and dv modes)") {
    spark.sql("CREATE TABLE ck.t7 (id BIGINT, qty BIGINT, " +
      "CONSTRAINT q7 CHECK (qty > 0))")
    spark.sql("INSERT INTO ck.t7 VALUES (1, 5), (2, 7)")
    intercept[Exception] {
      spark.sql("UPDATE ck.t7 SET qty = qty - 10 WHERE id = 2")
    }
    assert(spark.sql("SELECT CAST(sum(qty) AS BIGINT) FROM ck.t7")
      .head.getLong(0) == 12, "a failed update must change nothing")
    spark.conf.set("graft.update.mode", "dv")
    try intercept[Exception] {
      spark.sql("UPDATE ck.t7 SET qty = 0 WHERE id = 1")
    } finally spark.conf.unset("graft.update.mode")
    spark.sql("UPDATE ck.t7 SET qty = qty + 1 WHERE id = 2")
    assert(spark.sql("SELECT CAST(sum(qty) AS BIGINT) FROM ck.t7")
      .head.getLong(0) == 13)
  }

  test("MERGE inserts and updates are constrained too") {
    // (CTAS cannot declare constraints — Spark's parser forbids it.)
    spark.sql("CREATE TABLE ck.t6 (id BIGINT, qty BIGINT, " +
      "CONSTRAINT pos CHECK (qty >= 0))")
    spark.sql("INSERT INTO ck.t6 VALUES (1, 5)")
    spark.range(0, 3).selectExpr("id", "id - 1 AS qty") // qty -1 for id 0
      .createOrReplaceTempView("ck_src")
    intercept[Exception] {
      spark.sql("MERGE INTO ck.t6 t USING ck_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET qty = s.qty " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    }
    assert(spark.sql("SELECT count(*) FROM ck.t6").head.getLong(0) == 1,
      "a failed merge must land nothing")
    // INT literals against BIGINT keys: the analyzer wraps the ON key in
    // a cast, which the rewrite's key matching strips (the re-resolved
    // join re-coerces identically) — this merge must route through the
    // graft pass, not fall back to Spark's stock unsupported error
    spark.sql("MERGE INTO ck.t6 t USING (SELECT 2 AS id, 9 AS qty) s " +
      "ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    assert(spark.sql("SELECT count(*) FROM ck.t6").head.getLong(0) == 2)
    // a USER-written cast on the ON key asks for different comparison
    // semantics (string '01' <> '1' where numeric coercion says 1 == 1) —
    // the rewrite must NOT strip it and silently re-coerce; it falls back
    // to Spark's stock unsupported-MERGE error instead of matching the
    // wrong rows
    val e = intercept[Exception] {
      spark.sql("MERGE INTO ck.t6 t USING (SELECT '3' AS code, 7 AS qty) s " +
        "ON CAST(t.id AS STRING) = s.code " +
        "WHEN MATCHED THEN UPDATE SET qty = s.qty")
    }
    assert(e.getMessage.toLowerCase.contains("merge"), e.getMessage)
  }
}
