package graft.spark

import graft.format._
import org.apache.spark.sql.types._

/** Maps Spark logical types onto the format's physical lanes and defines the
  * canonical depth-first leaf layout shared by writer and reader.
  * (Reference analogue: the arrow→parquet-leaf shredding in
  * `/root/reference/src/write/common.rs:60-75`; ours is the offsets+validity
  * decomposition documented on [[graft.format.ColumnTree]].)
  */
object GraftSchema {

  def laneFor(dt: DataType): Int = dt match {
    case BooleanType => Lane.Bool
    case ByteType => Lane.I8
    case ShortType => Lane.I16
    case IntegerType | DateType => Lane.I32
    case LongType | TimestampType | TimestampNTZType => Lane.I64
    case FloatType => Lane.F32
    case DoubleType => Lane.F64
    case StringType | BinaryType => Lane.Bin
    case d: DecimalType => if (d.precision <= Decimal.MAX_LONG_DIGITS) Lane.I64 else Lane.I128
    case NullType => Lane.Bool
    case other => throw new UnsupportedOperationException(s"graft: unsupported type $other")
  }

  def isAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  /** Metadata-only TYPE WIDENING (ALTER COLUMN ... TYPE): true when a file
    * written as `from` decodes losslessly under a table schema declaring
    * `to`, with every stats surface staying sound:
    *
    *   - integral up-widening (byte -> short -> int -> long): all widths
    *     share the long zone-map/footer stats domain (statsKind 1), so
    *     page pruning and footer MIN/MAX read unchanged;
    *   - float -> double: shared double stats domain (statsKind 2/3);
    *   - decimal precision growth at the SAME scale within one storage
    *     lane (both <= 18 digits long-backed, or both 128-bit): unscaled
    *     values and stats are identical bytes. Cross-lane growth
    *     (18 -> 19 digits) changes the stats domain and is rejected —
    *     that migration rewrites files (CTAS).
    *
    * Date/timestamp and everything nested are not widenable.
    */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      a.scale == b.scale && b.precision > a.precision &&
        (a.precision <= Decimal.MAX_LONG_DIGITS) ==
          (b.precision <= Decimal.MAX_LONG_DIGITS)
    case _ => false
  }

  /** Number of on-disk leaves a field occupies (must mirror the writer's
    * ColumnTree flattening exactly).
    */
  def leafCount(dt: DataType, nullable: Boolean): Int = dt match {
    case ArrayType(et, cn) => 1 + leafCount(et, cn)
    case MapType(kt, vt, vcn) => 1 + leafCount(kt, nullable = false) + leafCount(vt, vcn)
    case s: StructType =>
      (if (nullable) 1 else 0) + s.fields.map(f => leafCount(f.dataType, f.nullable)).sum
    case _ => 1
  }

  /** Start leaf index of each top-level field, plus the total leaf count. */
  def fieldLeafOffsets(schema: StructType): (Array[Int], Int) = {
    val offs = new Array[Int](schema.fields.length)
    var acc = 0
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      offs(i) = acc
      acc += leafCount(f.dataType, f.nullable)
    }
    (offs, acc)
  }

  /** Is `proj` the file type itself, or a struct-pruned subset of it?
    * Struct nodes may drop children (names + nullability of kept children
    * must match, recursively); all other shapes must be identical — the leaf
    * layout math depends on it.
    */
  def isPrunedSubset(file: DataType, proj: DataType): Boolean = (file, proj) match {
    case (a, b) if a == b => true
    case (fs: StructType, ps: StructType) =>
      ps.fields.forall(pf => fs.fields.find(_.name == pf.name).exists(ff =>
        ff.nullable == pf.nullable && isPrunedSubset(ff.dataType, pf.dataType)))
    case (ArrayType(fe, fn), ArrayType(pe, pn)) =>
      fn == pn && isPrunedSubset(fe, pe)
    case (MapType(fk, fv, fn), MapType(pk, pv, pn)) =>
      fn == pn && fk == pk && isPrunedSubset(fv, pv)
    case _ => false
  }

  /** Intersect a requested (possibly nested-pruned) type with the table's:
    * struct children are filtered to the requested names (kept in FILE order,
    * recursively); any other shape keeps the full table type. The result is
    * always an isPrunedSubset of `file`.
    */
  def prunedType(file: DataType, req: DataType): DataType = (file, req) match {
    case (fs: StructType, rs: StructType) =>
      val keep = rs.fieldNames.toSet
      StructType(fs.fields.filter(f => keep.contains(f.name)).map { ff =>
        val rf = rs.fields(rs.fieldIndex(ff.name))
        ff.copy(dataType = prunedType(ff.dataType, rf.dataType))
      })
    case (ArrayType(fe, fn), ArrayType(re, _)) =>
      ArrayType(prunedType(fe, re), fn)
    case (MapType(fk, fv, fn), MapType(rk, rv, _)) if fk == rk =>
      MapType(fk, prunedType(fv, rv), fn)
    case _ => file
  }

  /** Leaf index a (possibly dotted struct-path) field name resolves to in a
    * file schema: a top-level column's first leaf, or the sub-field's leaf
    * reached by walking null markers + preceding siblings' leaf counts.
    * Struct sub-field leaves stay row-aligned with the page grid. The
    * reserved segment `element` steps into an array's element leaf: element
    * pages are NOT row-aligned (cardinality changes), but they share the
    * page GRID — page group p of the element leaf holds exactly the
    * elements of the rows in group p — which is what existence predicates
    * (array_contains) prune on. Map paths resolve to None.
    */
  def leafIndexOfPath(schema: StructType, name: String): Option[Int] = {
    val (offsets, _) = fieldLeafOffsets(schema)
    val fi = schema.fieldNames.indexOf(name)
    if (fi >= 0) return Some(offsets(fi))
    if (!name.contains('.')) return None
    val parts = name.split('.')
    val top = schema.fieldNames.indexOf(parts.head)
    if (top < 0) return None
    var base = offsets(top)
    var f = schema.fields(top)
    parts.tail.foreach { p =>
      f.dataType match {
        case st: StructType =>
          if (f.nullable) base += 1 // null marker leaf
          val ci = st.fieldNames.indexOf(p)
          if (ci < 0) return None
          var j = 0
          while (j < ci) {
            base += leafCount(st.fields(j).dataType, st.fields(j).nullable)
            j += 1
          }
          f = st.fields(ci)
        case at: ArrayType if p == "element" =>
          base += 1 // skip the lengths leaf
          f = StructField("element", at.elementType, at.containsNull)
        case mt: MapType if p == "key" =>
          base += 1 // skip the lengths leaf
          f = StructField("key", mt.keyType, nullable = false)
        case mt: MapType if p == "value" =>
          base += 1 + leafCount(mt.keyType, nullable = false) // lengths + key leaves
          f = StructField("value", mt.valueType, mt.valueContainsNull)
        case _ => return None
      }
    }
    if (isAtomic(f.dataType)) Some(base) else None
  }

  /** Metadata key holding an ADD COLUMN DEFAULT value in its INTERNAL
    * string rendering (see [[defaultRender]]) — the reader serves it for
    * files that predate the column. The standard Spark keys
    * (CURRENT_DEFAULT / EXISTS_DEFAULT, SQL text) ride beside it so
    * Spark's own INSERT-side default resolution works unchanged. */
  val DefaultKey = "graft.default"

  /** Types an ADD COLUMN DEFAULT may take: atomics whose internal value
    * has a lossless, session-independent string round-trip. */
  def defaultSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Internal rendering of a default's CATALYST value (dates as day
    * ordinals, timestamps as micros, strings raw). */
  def defaultRender(value: Any, dt: DataType): String = dt match {
    case StringType => value.toString
    case _: DecimalType => value.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString
    case _ => value.toString // primitives render losslessly
  }

  /** Inverse of [[defaultRender]]: the catalyst value the reader fills. */
  def defaultValueOf(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType | DateType => s.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case BooleanType => s.toBoolean
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case d: DecimalType => Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
    case other => throw new IllegalArgumentException(
      s"graft: no default-value codec for type $other")
  }

  /** Depth-first (lane, nullable) specs for every leaf of a field — the
    * reader uses this to decode pages without consulting value data.
    */
  def leafSpecs(dt: DataType, nullable: Boolean): Seq[(Int, Boolean)] = dt match {
    case ArrayType(et, cn) => (Lane.I32, nullable) +: leafSpecs(et, cn)
    case MapType(kt, vt, vcn) =>
      (Lane.I32, nullable) +: (leafSpecs(kt, nullable = false) ++ leafSpecs(vt, vcn))
    case s: StructType =>
      val marker = if (nullable) Seq((Lane.Bool, true)) else Seq.empty
      marker ++ s.fields.flatMap(f => leafSpecs(f.dataType, f.nullable))
    case _ => Seq((laneFor(dt), nullable))
  }
}
