package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Full type-matrix + nested round-trips (FIXTURES.md F1/F4 analogues):
  * struct, list, map, list_list, list_struct, list_map, struct_list,
  * decimal/date/timestamp logical types, deeply mixed shapes.
  */
class NestedTypesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rt(name: String, sql: String): Unit = {
    val dir = s"/tmp/graft-test/nested/$name"
    val src = spark.sql(sql)
    src.write.format("graft").option("pagesize", "256").mode("overwrite").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.schema == src.schema, s"$name schema: got ${back.schema} want ${src.schema}")
    val a = src.selectExpr("to_json(struct(*)) as r").collect().map(_.getString(0)).sorted
    val b = back.selectExpr("to_json(struct(*)) as r").collect().map(_.getString(0)).sorted
    assert(a.length == b.length, s"$name count")
    assert(a.sameElements(b), s"$name rows differ;\n first diff: ${
      a.zip(b).find(p => p._1 != p._2).getOrElse(("", ""))}")
  }

  test("struct sub-field pruning reads only the selected leaf's bytes") {
    val dir = "/tmp/graft-test/nested/prune"
    // s.small is a few bytes/row; s.big dominates the file — a pruned scan of
    // s.small must not fetch s.big's leaves
    spark.sql("""
      SELECT id, named_struct(
        'small', cast(id % 100 AS INT),
        'big', repeat(concat('x', cast(id AS STRING)), 50),
        'nested', named_struct('a', id * 2, 'b', repeat('y', 100))) AS s
      FROM range(20000)""")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)

    val g = spark.read.format("graft").load(dir)

    // baseline: an atomic-column scan pays the same fixed footer tail-read
    // (64 KiB) — compare data deltas above it, not absolutes
    GraftMetrics.bytesRead.set(0)
    g.selectExpr("sum(id)").head
    val idBytes = GraftMetrics.bytesRead.get()

    GraftMetrics.bytesRead.set(0)
    val full = g.selectExpr("sum(length(s.big))").head.getLong(0)
    val fullDelta = GraftMetrics.bytesRead.get() - idBytes
    assert(full > 0 && fullDelta > 0)

    GraftMetrics.bytesRead.set(0)
    val small = g.selectExpr("sum(s.small)").head.getLong(0)
    val smallDelta = GraftMetrics.bytesRead.get() - idBytes
    assert(small == (0 until 20000).map(_ % 100).sum)

    GraftMetrics.bytesRead.set(0)
    val nested = g.selectExpr("sum(s.nested.a)").head.getLong(0)
    val nestedDelta = GraftMetrics.bytesRead.get() - idBytes
    assert(nested == (0L until 20000L).map(_ * 2).sum)

    // the pruned scans must be dramatically cheaper than touching s.big
    assert(smallDelta * 8 < fullDelta,
      s"s.small scan read +$smallDelta B vs +$fullDelta B for s.big — sub-field pruning not effective")
    assert(nestedDelta * 8 < fullDelta,
      s"s.nested.a scan read +$nestedDelta B vs +$fullDelta B — recursive pruning not effective")

    // correctness of mixed projections: pruned + full struct in one query
    val r = g.selectExpr("s.small AS sm", "s.nested.b AS nb", "s.big AS bg")
      .filter("id < 3").selectExpr("sm", "length(nb)", "length(bg)").collect()
    assert(r.length == 3 && r.forall(_.getInt(1) == 100))
  }

  test("array-of-struct element pruning reads only the selected leaf's bytes") {
    val dir = "/tmp/graft-test/nested/prune-arr"
    spark.sql("""
      SELECT id, transform(sequence(0, 2), i -> named_struct(
        'a', id * 10 + i,
        'big', repeat(concat('z', cast(id AS STRING)), 40))) AS arr
      FROM range(20000)""")
      .coalesce(1).write.format("graft").mode("overwrite").save(dir)
    val g = spark.read.format("graft").load(dir)

    GraftMetrics.bytesRead.set(0)
    g.selectExpr("sum(id)").head
    val idBytes = GraftMetrics.bytesRead.get()

    GraftMetrics.bytesRead.set(0)
    val full = g.selectExpr("sum(aggregate(arr, 0L, (acc, x) -> acc + length(x.big)))")
      .head.getLong(0)
    val fullDelta = GraftMetrics.bytesRead.get() - idBytes
    assert(full > 0 && fullDelta > 0)

    GraftMetrics.bytesRead.set(0)
    val a = g.selectExpr("sum(aggregate(arr.a, 0L, (acc, x) -> acc + x))").head.getLong(0)
    val aDelta = GraftMetrics.bytesRead.get() - idBytes
    assert(a == (0L until 20000L).map(i => i * 30 + 3).sum)

    assert(aDelta * 8 < fullDelta,
      s"arr.a scan read +$aDelta B vs +$fullDelta B for arr.big — element pruning not effective")
  }

  test("struct of atomic + nulls") {
    rt("struct", """
      SELECT id,
        CASE WHEN id % 7 = 0 THEN NULL
             ELSE named_struct('name', concat('n', id), 'age', CASE WHEN id % 5 = 0 THEN NULL ELSE cast(id % 90 AS INT) END)
        END AS person
      FROM range(1000)""")
  }

  test("list of int with nulls") {
    rt("list", """
      SELECT id,
        CASE WHEN id % 11 = 0 THEN NULL
             ELSE transform(sequence(0, cast(id % 4 AS INT)), x -> CASE WHEN x = 2 THEN NULL ELSE cast(x * id AS INT) END)
        END AS xs
      FROM range(1000)""")
  }

  test("map int->string with nullable values") {
    rt("map", """
      SELECT id,
        CASE WHEN id % 13 = 0 THEN NULL
             ELSE map_from_arrays(
               sequence(0, cast(id % 3 AS INT)),
               transform(sequence(0, cast(id % 3 AS INT)), x -> CASE WHEN x = 1 THEN NULL ELSE concat('v', x) END))
        END AS m
      FROM range(1000)""")
  }

  test("list of list") {
    rt("list_list", """
      SELECT id, transform(sequence(0, cast(id % 3 AS INT)),
        i -> CASE WHEN i = 1 THEN NULL ELSE sequence(0, i) END) AS xss
      FROM range(500)""")
  }

  test("list of struct") {
    rt("list_struct", """
      SELECT id, transform(sequence(0, cast(id % 3 AS INT)),
        i -> named_struct('name', concat('x', i), 'age', cast(i AS INT))) AS people
      FROM range(500)""")
  }

  test("list of map") {
    rt("list_map", """
      SELECT id, transform(sequence(0, cast(id % 2 AS INT)),
        i -> map(cast(i AS INT), concat('m', i))) AS ms
      FROM range(500)""")
  }

  test("struct of list") {
    rt("struct_list", """
      SELECT id, named_struct('name', concat('n', id),
        'scores', sequence(0, cast(id % 4 AS INT))) AS rec
      FROM range(500)""")
  }

  test("decimals small and large, dates, timestamps") {
    rt("logical_types", """
      SELECT id,
        cast(id * 1.5 AS DECIMAL(10,2)) AS d10,
        cast(id AS DECIMAL(18,0)) * 1000000 AS d18,
        cast(concat('123456789012345678901234567890.', id % 100) AS DECIMAL(38,8)) AS d38,
        date_add(date'1995-01-01', cast(id % 1000 AS INT)) AS dt,
        timestamp_millis(946684800000 + id * 977777) AS ts,
        CASE WHEN id % 3 = 0 THEN NULL ELSE cast(id % 100 - 50 AS TINYINT) END AS i8,
        cast(id AS SMALLINT) AS i16,
        cast(id AS FLOAT) / 3.0 AS f32,
        encode(concat('bin', id), 'utf-8') AS bin
      FROM range(1000)""")
  }

  test("deep mix: array of struct of array of map") {
    rt("deep", """
      SELECT id, transform(sequence(0, cast(id % 2 AS INT)), i ->
        named_struct(
          'tags', transform(sequence(0, i), j -> map(concat('k', j), cast(j * id AS BIGINT))),
          'w', cast(i AS DOUBLE) / 7.0)) AS recs
      FROM range(300)""")
  }

  test("narrow decimal(25,4) rides the Wide codec delegation with nulls") {
    // unscaled values fit in 64 bits -> the i128 page delegates to the long
    // codec family (Codec.Wide); mix in nulls and a constant column
    rt("decimal128_narrow", """
      SELECT id,
        CASE WHEN id % 9 = 0 THEN NULL ELSE CAST(id AS DECIMAL(25,4)) * 1.5 END AS d25,
        CAST(42 AS DECIMAL(30,10)) AS d30_const,
        CAST(-1 * CAST(id AS DECIMAL(25,4)) AS DECIMAL(25,4)) AS d25_neg
      FROM range(3000)""")
  }

  test("non-nullable array/map children under a null struct (special codecs)") {
    // The array/map fields are non-nullable (sequence/map never null) so
    // their lengths leaves persist no validity bitmap; a null parent struct
    // still appends a slot there. Special codecs must encode that slot's
    // deterministic 0 — filling it with the previous length desynchronizes
    // the child leaf offsets on read. Constant lengths force OneValue/Rle.
    rt("nn_child_null_struct", """
      SELECT id,
        CASE WHEN id % 3 = 0 THEN NULL
             ELSE named_struct('xs', sequence(0, 3), 'm', map('a', id), 'w', id * 2)
        END AS rec
      FROM range(2000)""")
    // varied lengths -> Dict/Bitpack lanes take the same path
    rt("nn_child_null_struct_varied", """
      SELECT id,
        CASE WHEN id % 5 = 0 THEN NULL
             ELSE named_struct('xs', sequence(0, cast(id % 7 AS INT)))
        END AS rec
      FROM range(2000)""")
  }

  test("empty arrays and empty strings") {
    rt("empties", """
      SELECT id, array() AS empty_arr,
        CASE WHEN id % 2 = 0 THEN '' ELSE concat('s', id) END AS s,
        map() AS empty_map
      FROM range(100)""")
  }
}
