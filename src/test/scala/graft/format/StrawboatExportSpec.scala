package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Export round-trip: `StrawboatExport.encodeFile` bytes must decode
  * through `StrawboatImport.decodeFile` — two independently written codebases
  * meeting only at the reference byte layout (the importer is additionally
  * pinned against hand-built fixture bytes in StrawboatImportSpec, so an
  * export bug cannot hide behind a matching import bug).
  */
class StrawboatExportSpec extends AnyFunSuite {

  private final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
    def length: Long = bytes.length
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
    def close(): Unit = ()
  }

  private def roundTrip(schema: StructType, rows: Seq[Row], pageRows: Int = 8192,
      codec: Int = 0): (StructType, Seq[Array[Any]]) =
    StrawboatImport.decodeFile(
      new BytesInput(StrawboatExport.encodeFile(schema, rows, pageRows, codec)))

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Row, y: Row) =>
      x.length == y.length && (0 until x.length).forall(i => deepEq(x(i), y(i)))
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.size == y.size && x.zip(y).forall { case (u, v) => deepEq(u, v) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.size == y.size && x.asInstanceOf[scala.collection.Map[Any, Any]].forall {
        case (k, v) =>
          y.asInstanceOf[scala.collection.Map[Any, Any]].get(k).exists(deepEq(v, _))
      }
    case (x, y) => x == y
  }

  private def assertRows(got: Seq[Array[Any]], want: Seq[Row]): Unit = {
    assert(got.size == want.size, s"row count ${got.size} vs ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.length == w.length, s"row $i arity")
      (0 until w.length).foreach { c =>
        assert(deepEq(g(c), w(c)), s"row $i col $c: got ${g(c)} want ${w(c)}")
      }
    }
  }

  // ------------------------------------------------------------ flat types

  private val flatSchema = StructType(Seq(
    StructField("b", ByteType, nullable = false),
    StructField("s", ShortType, nullable = true),
    StructField("i", IntegerType, nullable = false),
    StructField("l", LongType, nullable = true),
    StructField("f", FloatType, nullable = false),
    StructField("d", DoubleType, nullable = true),
    StructField("bool", BooleanType, nullable = false),
    StructField("str", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = false),
    StructField("date", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("dec", DecimalType(12, 3), nullable = true)))

  private def flatRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(
      (i % 100).toByte,
      if (i % 7 == 3) null else (i * 3).toShort,
      i * 1000 - 50,
      if (i % 5 == 1) null else i.toLong * -987654321L,
      i.toFloat / 3f,
      if (i % 11 == 2) null else i / 7.0,
      i % 3 == 0,
      if (i % 4 == 2) null else s"row-$i-é中",
      Array.tabulate[Byte](i % 5)(k => (k * i).toByte),
      if (i % 6 == 4) null
      else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i * 37L - 100)),
      {
        val t = new java.sql.Timestamp((i * 123456789L) % 4102444800000L)
        t.setNanos((i % 1000) * 1000 * 1000 + (i % 997) * 1000)
        t
      },
      if (i % 9 == 5) null
      else new java.math.BigDecimal(java.math.BigInteger.valueOf(i * 1234567L - 890), 3))
  }

  test("flat round-trip: every primitive type, nulls, None codec") {
    val rows = flatRows(50)
    val (schema, got) = roundTrip(flatSchema, rows)
    assert(schema.fieldNames.toSeq == flatSchema.fieldNames.toSeq)
    assertRows(got, rows)
  }

  test("flat round-trip under lz4 / zstd / snappy block compression") {
    val rows = flatRows(64)
    Seq(1, 2, 3).foreach { codec =>
      val (_, got) = roundTrip(flatSchema, rows, codec = codec)
      assertRows(got, rows)
    }
  }

  test("multi-page round-trip keeps page boundaries straight") {
    val rows = flatRows(103)
    val (_, got) = roundTrip(flatSchema, rows, pageRows = 10)
    assertRows(got, rows)
  }

  test("empty table round-trips to zero rows") {
    val (schema, got) = roundTrip(flatSchema, Nil)
    assert(schema.fields.length == flatSchema.fields.length)
    assert(got.isEmpty)
  }

  test("validity runs longer than 63 groups (multi-byte ULEB header)") {
    val n = 1200 // 150 groups: exercises the 2-byte varint header path
    val schema = StructType(Seq(StructField("v", LongType, nullable = true)))
    val rows = (0 until n).map(i => Row(if (i % 3 == 0) null else i.toLong))
    val (_, got) = roundTrip(schema, rows)
    assertRows(got, rows)
  }

  // ---------------------------------------------------------- nested types

  test("nested round-trip: array / struct / map with every null shape") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("arr", ArrayType(IntegerType, containsNull = true), nullable = true),
      StructField("st", StructType(Seq(
        StructField("a", StringType, nullable = true),
        StructField("b", LongType, nullable = false))), nullable = true),
      StructField("m", MapType(StringType, LongType, valueContainsNull = true),
        nullable = true),
      StructField("deep", ArrayType(
        ArrayType(StringType, containsNull = true), containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(1L, Seq(1, null, 3), Row("x", 10L), Map("k1" -> 1L, "k2" -> null),
        Seq(Seq("a", null), null, Seq.empty[String])),
      Row(2L, null, null, null, null),
      Row(3L, Seq.empty[Int], Row(null, 0L), Map.empty[String, Long], Seq(Seq("z"))),
      Row(4L, Seq(42), Row("only", -7L), Map("just" -> 9L), Seq(null, Seq())))
    val (got1Schema, got) = roundTrip(schema, rows)
    assert(got1Schema("m").dataType.isInstanceOf[MapType])
    assertRows(got, rows)
  }

  test("nested round-trip across pages and codecs") {
    val schema = StructType(Seq(
      StructField("xs", ArrayType(LongType, containsNull = false), nullable = false)))
    val rows = (0 until 57).map(i => Row(Seq.tabulate(i % 6)(k => i * 100L + k)))
    Seq(0, 1, 2).foreach { codec =>
      val (_, got) = roundTrip(schema, rows, pageRows = 7, codec = codec)
      assertRows(got, rows)
    }
  }

  test("timestamp NTZ round-trips as wall-clock micros") {
    val schema = StructType(Seq(
      StructField("t", TimestampNTZType, nullable = true)))
    val rows = Seq(
      Row(java.time.LocalDateTime.of(1996, 3, 14, 7, 30, 15, 123456000)),
      Row(null),
      Row(java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000)))
    val (gotSchema, got) = roundTrip(schema, rows)
    assert(gotSchema("t").dataType == TimestampNTZType)
    assertRows(got, rows)
  }

  test("unsupported types are rejected up front") {
    val e = intercept[UnsupportedOperationException] {
      StrawboatExport.arrowSchema(StructType(Seq(
        StructField("bad", CalendarIntervalType, nullable = false))))
    }
    assert(e.getMessage.contains("bad"))
  }
}
