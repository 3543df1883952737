package graft.format

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property round-trip for the EXPORTER: random nested Spark schemas
  * (arrays/structs/maps over int/long/string/double, every nullable combo)
  * and random values go through `StrawboatExport.encodeFile` and must
  * reassemble identically through `StrawboatImport.decodeFile`. The
  * exporter's Dremel shredder and the importer's assembler were written
  * against the reference spec independently of each other (and the importer
  * is separately pinned by hand-built fixtures plus an independent
  * test-side shredder in NestedImportProperties), so this property fails
  * loudly if either side drifts from the level semantics.
  */
object ExportRoundTripProperties extends Properties("graft.format.exportRoundTrip") {

  // ------------------------------------------------------------- grammar

  private def genLeaf: Gen[DataType] =
    Gen.oneOf(IntegerType, LongType, StringType, DoubleType)

  private def genType(depth: Int): Gen[DataType] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> (for { nl <- Gen.oneOf(true, false); e <- genType(depth - 1) }
        yield ArrayType(e, containsNull = nl)),
      2 -> (for {
        n <- Gen.choose(1, 3)
        fs <- Gen.listOfN(n, for {
          t <- genType(depth - 1); nl <- Gen.oneOf(true, false)
        } yield (t, nl))
      } yield StructType(fs.zipWithIndex.map { case ((t, nl), i) =>
        StructField(s"f$i", t, nl)
      })),
      1 -> (for { v <- genType(depth - 1); nl <- Gen.oneOf(true, false) }
        yield MapType(StringType, v, valueContainsNull = nl)))

  private val genSchema: Gen[StructType] = for {
    n <- Gen.choose(1, 3)
    fs <- Gen.listOfN(n, for {
      t <- genType(2); nl <- Gen.oneOf(true, false)
    } yield (t, nl))
  } yield StructType(fs.zipWithIndex.map { case ((t, nl), i) =>
    StructField(s"c$i", t, nl)
  })

  private def genValue(dt: DataType, nullable: Boolean): Gen[Any] = {
    val v: Gen[Any] = dt match {
      case IntegerType => Gen.choose(-100000, 100000)
      case LongType => Gen.choose(-1000000L, 1000000L)
      case DoubleType => Gen.choose(-1e6, 1e6)
      case StringType => Gen.alphaNumStr.map(_.take(6))
      case a: ArrayType =>
        Gen.choose(0, 3).flatMap(n =>
          Gen.listOfN(n, genValue(a.elementType, a.containsNull)))
      case s: StructType =>
        Gen.sequence[Vector[Any], Any](
          s.fields.toSeq.map(f => genValue(f.dataType, f.nullable)))
          .map(Row.fromSeq(_))
      case m: MapType =>
        Gen.choose(0, 3).flatMap { n =>
          Gen.listOfN(n, for {
            k <- Gen.alphaNumStr.map(_.take(4))
            mv <- genValue(m.valueType, m.valueContainsNull)
          } yield (k, mv)).map(_.toMap)
        }
      case other => sys.error(s"genValue($other)")
    }
    if (nullable) Gen.frequency(3 -> v, 1 -> Gen.const(null)) else v
  }

  private def genRow(schema: StructType): Gen[Row] =
    Gen.sequence[Vector[Any], Any](
      schema.fields.toSeq.map(f => genValue(f.dataType, f.nullable)))
      .map(Row.fromSeq(_))

  // ------------------------------------------------------------ property

  private final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
    def length: Long = bytes.length
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
    def close(): Unit = ()
  }

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
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

  private val genCase = for {
    schema <- genSchema
    nRows <- Gen.choose(0, 12)
    rows <- Gen.listOfN(nRows, genRow(schema))
    pageRows <- Gen.choose(1, 13)
    codec <- Gen.oneOf(0, 1, 2, 3)
    // "onevalue" is excluded here (it requires constant pages — covered by
    // the dedicated property below); forced rle/dict are valid on any data
    special <- Gen.oneOf("adaptive", "none", "rle", "dict")
  } yield (schema, rows, pageRows, codec, special)

  property("encodeFile -> decodeFile is the identity on random nested rows") =
    Prop.forAll(genCase) { case (schema, rows, pageRows, codec, special) =>
      val bytes = StrawboatExport.encodeFile(schema, rows, pageRows, codec, special)
      val (_, got) = StrawboatImport.decodeFile(new BytesInput(bytes))
      val ok = got.size == rows.size && got.zip(rows).forall { case (g, w) =>
        g.length == w.length && (0 until w.length).forall(i => deepEq(g(i), w(i)))
      }
      if (!ok) println(s"MISMATCH schema=$schema pageRows=$pageRows codec=$codec " +
        s"special=$special\nwant=${rows}\ngot =${got.map(_.toSeq).toList}")
      ok
    }

  // special-codec coverage on shapes that TRIGGER each codec adaptively:
  // constant (OneValue), runny (RLE), low-cardinality (Dict) int64 lanes.
  // Round-trip identity AND a strict size win over the pure-Common file —
  // the reason the exporter emits them at all.
  property("integer special codecs round-trip and shrink codec-natural pages") = {
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val shapes: Gen[(String, IndexedSeq[Long])] = Gen.oneOf(
      Gen.choose(-5000L, 5000L).map(c => ("const", IndexedSeq.fill(512)(c))),
      Gen.choose(2, 6).map(runLen =>
        ("runs", (0 until 512).map(i => (i / (runLen * 13)).toLong))),
      Gen.choose(2, 8).map(card =>
        ("lowcard", (0 until 512).map(i => ((i * 7919) % card).toLong * 1000003L))),
      Gen.choose(10, 40).map(stride =>
        ("dominant", (0 until 512).map(i =>
          if (i % stride == 0) (i * 7919L) % 100000L else 42L))))
    Prop.forAll(shapes, Gen.oneOf("adaptive", "onevalue", "rle", "dict", "freq")) {
      case ((shape, vals), forced) =>
        val special = if (forced == "onevalue" && shape != "const") "adaptive" else forced
        val rows = vals.map(v => Row(v))
        val bytes = StrawboatExport.encodeFile(schema, rows, 128, 0, special)
        val plain = StrawboatExport.encodeFile(schema, rows, 128, 0, "none")
        val (_, got) = StrawboatImport.decodeFile(new BytesInput(bytes))
        val same = got.size == rows.size &&
          got.zip(rows).forall { case (g, w) => g(0) == w.getLong(0) }
        // size must win when the codec fits the shape (adaptive always
        // picks a fitting one); a forced MISMATCHED codec (rle on lowcard)
        // legitimately inflates and only owes round-trip identity
        val fits = special == "adaptive" ||
          (special == "onevalue" && shape == "const") ||
          (special == "rle" && (shape == "runs" || shape == "const")) ||
          (special == "dict" && (shape == "lowcard" || shape == "const")) ||
          (special == "freq" && (shape == "dominant" || shape == "const"))
        val shrunk = !fits || bytes.length < plain.length
        if (!(same && shrunk))
          println(s"special=$special shape=$shape same=$same " +
            s"bytes=${bytes.length} plain=${plain.length}")
        same && shrunk
    }
  }

  // SIMD-BP128 lanes: small-range u32 pages choose Bitpacking, sorted
  // pages DeltaBitpacking; both must round-trip through the importer's
  // unpack128 and strictly shrink on their natural shape
  property("bitpack/delta-bitpack round-trip and shrink on u32 lanes") = {
    val schema = StructType(Seq(StructField("v", IntegerType, nullable = false)))
    val shapes: Gen[(String, IndexedSeq[Int])] = Gen.oneOf(
      Gen.choose(2, 1000).map(hi =>
        ("smallrange", (0 until 512).map(i => (i * 37) % hi): IndexedSeq[Int])),
      Gen.choose(1, 50).map(step =>
        ("sorted", (0 until 512).map(i => i * step): IndexedSeq[Int])))
    Prop.forAllNoShrink(shapes, Gen.oneOf("adaptive", "bitpack", "deltabp")) {
      case ((shape, vals), special) =>
        val rows = vals.map(v => Row(v))
        val bytes = StrawboatExport.encodeFile(schema, rows, 128, 0, special)
        val plain = StrawboatExport.encodeFile(schema, rows, 128, 0, "none")
        val (_, got) = StrawboatImport.decodeFile(new BytesInput(bytes))
        val same = got.size == rows.size &&
          got.zip(rows).forall { case (g, w) => g(0) == w.getInt(0) }
        // delta-bp on unsorted data wraps negative deltas to 32-bit values
        // (legitimately bigger); it only owes round-trip identity there
        val fits = special != "deltabp" || shape == "sorted"
        val shrunk = !fits || bytes.length < plain.length
        if (!(same && shrunk))
          println(s"special=$special shape=$shape same=$same " +
            s"bytes=${bytes.length} plain=${plain.length}")
        same && shrunk
    }
  }

  // the non-integer lanes' special codecs: floats ride the integer codecs
  // over bit patterns, strings get OneValue/Dict, booleans OneValue/RLE.
  // Codec-natural shapes must round-trip AND strictly shrink adaptively.
  property("float/string/bool special codecs shrink codec-natural pages") = {
    val cases: Gen[(String, StructType, IndexedSeq[Row])] = Gen.oneOf(
      Gen.choose(-100, 100).map { c =>
        ("double-const", StructType(Seq(StructField("v", DoubleType, nullable = false))),
          IndexedSeq.fill(512)(Row(c.toDouble)))
      },
      Gen.choose(2, 6).map { card =>
        ("double-lowcard", StructType(Seq(StructField("v", DoubleType, nullable = false))),
          (0 until 512).map(i => Row(((i * 31) % card).toDouble * 1.5)): IndexedSeq[Row])
      },
      Gen.choose(20, 100).map { period =>
        // periodic doubles: the hash-indexed Patas reference finds the
        // equal value within its 128-slot window, so most entries store a
        // 2-byte packed header and zero XOR bytes (distinct values keep
        // Dict out when period > 128/4... either codec must shrink)
        ("double-periodic", StructType(Seq(StructField("v", DoubleType, nullable = false))),
          (0 until 512).map(i => Row((i % period).toDouble * 1.25 + 0.1)): IndexedSeq[Row])
      },
      Gen.choose(2, 6).map { card =>
        ("string-lowcard", StructType(Seq(StructField("v", StringType, nullable = false))),
          (0 until 512).map(i => Row(s"tag${(i * 31) % card}")): IndexedSeq[Row])
      },
      Gen.alphaNumStr.map(_.take(8)).map { c =>
        ("string-const", StructType(Seq(StructField("v", StringType, nullable = false))),
          IndexedSeq.fill(512)(Row("c" + c)))
      },
      Gen.choose(10, 40).map { stride =>
        // dominant string with sparse exceptions -> binary Freq
        ("string-dominant", StructType(Seq(StructField("v", StringType, nullable = false))),
          (0 until 512).map(i =>
            Row(if (i % stride == 0) s"rare-$i" else "the-dominant-value")): IndexedSeq[Row])
      },
      Gen.choose(8, 20).map { runLen =>
        ("bool-runs", StructType(Seq(StructField("v", BooleanType, nullable = false))),
          (0 until 512).map(i => Row((i / (runLen * 17)) % 2 == 0)): IndexedSeq[Row])
      })
    Prop.forAllNoShrink(cases) { case (label, schema, rows) =>
      val bytes = StrawboatExport.encodeFile(schema, rows, 128, 0, "adaptive")
      val plain = StrawboatExport.encodeFile(schema, rows, 128, 0, "none")
      val (_, got) = StrawboatImport.decodeFile(new BytesInput(bytes))
      val same = got.size == rows.size &&
        got.zip(rows).forall { case (g, w) => g(0) == w(0) }
      // forced Patas must round-trip on any f64 shape (coverage of the
      // XOR/ring encoder independent of what adaptive happens to pick)
      val patasOk = !label.startsWith("double") || {
        val pb = StrawboatExport.encodeFile(schema, rows, 128, 0, "patas")
        val (_, pg) = StrawboatImport.decodeFile(new BytesInput(pb))
        pg.size == rows.size && pg.zip(rows).forall { case (g, w) => g(0) == w(0) }
      }
      val ok = same && patasOk && bytes.length < plain.length
      if (!ok) println(s"$label same=$same patasOk=$patasOk " +
        s"bytes=${bytes.length} plain=${plain.length}")
      ok
    }
  }
}
