package graft.spark

import graft.format._
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

/** Write-side row→columnar conversion: one appender per field, assembling
  * the [[graft.format.ColumnTree]] the file writer encodes.
  * (Reference analogue: the chunk encoding entry `encode_chunk`,
  * `/root/reference/src/write/common.rs:49-119` — ours buffers Spark
  * InternalRows instead of Arrow arrays.)
  */
abstract class FieldAppender {
  /** Append src[ordinal]; handles null. */
  def appendFrom(src: SpecializedGetters, ordinal: Int): Unit
  /** Append a null slot (used when an ancestor struct is null). */
  def appendNullSlot(): Unit
  def tree(): ColumnTree
  def clear(): Unit
}

object FieldAppender {
  def apply(dt: DataType, nullable: Boolean): FieldAppender = dt match {
    case ArrayType(et, cn) => new ArrayAppender(et, cn, nullable)
    case MapType(kt, vt, vcn) => new MapAppender(kt, vt, vcn, nullable)
    case s: StructType => new StructAppender(s, nullable)
    case _ => new AtomicAppender(dt, nullable)
  }
}

final class AtomicAppender(dt: DataType, nullable: Boolean) extends FieldAppender {
  private val lane = GraftSchema.laneFor(dt)
  private val b = VecBuilder.forLane(lane)

  private val put: (SpecializedGetters, Int) => Unit = dt match {
    case BooleanType =>
      val bb = b.asInstanceOf[BoolVecBuilder]; (s, o) => bb.append(s.getBoolean(o))
    case ByteType =>
      val ib = b.asInstanceOf[IntVecBuilder]; (s, o) => ib.append(s.getByte(o).toInt)
    case ShortType =>
      val ib = b.asInstanceOf[IntVecBuilder]; (s, o) => ib.append(s.getShort(o).toInt)
    case IntegerType | DateType =>
      val ib = b.asInstanceOf[IntVecBuilder]; (s, o) => ib.append(s.getInt(o))
    case LongType | TimestampType | TimestampNTZType =>
      val lb = b.asInstanceOf[LongVecBuilder]; (s, o) => lb.append(s.getLong(o))
    case FloatType =>
      val fb = b.asInstanceOf[FloatVecBuilder]; (s, o) => fb.append(s.getFloat(o))
    case DoubleType =>
      val db = b.asInstanceOf[DoubleVecBuilder]; (s, o) => db.append(s.getDouble(o))
    case StringType =>
      val sb = b.asInstanceOf[BinaryVecBuilder]; (s, o) => sb.append(s.getUTF8String(o).getBytes)
    case BinaryType =>
      val sb = b.asInstanceOf[BinaryVecBuilder]; (s, o) => sb.append(s.getBinary(o))
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      val lb = b.asInstanceOf[LongVecBuilder]
      (s, o) => lb.append(s.getDecimal(o, d.precision, d.scale).toUnscaledLong)
    case d: DecimalType =>
      val db = b.asInstanceOf[DecimalVecBuilder]
      (s, o) => {
        val bi = s.getDecimal(o, d.precision, d.scale).toJavaBigDecimal.unscaledValue
        db.append(Int128.hiOf(bi), Int128.loOf(bi))
      }
    case NullType => (_, _) => b.appendNull()
    case other => throw new UnsupportedOperationException(s"graft: unsupported type $other")
  }

  def appendFrom(src: SpecializedGetters, ordinal: Int): Unit =
    if (src.isNullAt(ordinal)) b.appendNull() else put(src, ordinal)
  def appendNullSlot(): Unit = b.appendNull()
  def tree(): ColumnTree = LeafCol(lane, nullable, b.result())
  def clear(): Unit = b.clear()
}

final class ArrayAppender(et: DataType, containsNull: Boolean, nullable: Boolean) extends FieldAppender {
  private val lengths = new IntVecBuilder()
  private val child = FieldAppender(et, containsNull)

  def appendFrom(src: SpecializedGetters, ordinal: Int): Unit =
    if (src.isNullAt(ordinal)) lengths.appendNull()
    else {
      val arr = src.getArray(ordinal)
      val n = arr.numElements()
      lengths.append(n)
      var i = 0
      while (i < n) { child.appendFrom(arr, i); i += 1 }
    }
  def appendNullSlot(): Unit = lengths.appendNull()
  def tree(): ColumnTree =
    ListCol(nullable, lengths.result().asInstanceOf[IntVec], child.tree())
  def clear(): Unit = { lengths.clear(); child.clear() }
}

final class MapAppender(kt: DataType, vt: DataType, valueContainsNull: Boolean,
    nullable: Boolean) extends FieldAppender {
  private val lengths = new IntVecBuilder()
  private val keys = FieldAppender(kt, nullable = false)
  private val values = FieldAppender(vt, valueContainsNull)

  def appendFrom(src: SpecializedGetters, ordinal: Int): Unit =
    if (src.isNullAt(ordinal)) lengths.appendNull()
    else {
      val m = src.getMap(ordinal)
      val n = m.numElements()
      lengths.append(n)
      val ka = m.keyArray()
      val va = m.valueArray()
      var i = 0
      while (i < n) { keys.appendFrom(ka, i); values.appendFrom(va, i); i += 1 }
    }
  def appendNullSlot(): Unit = lengths.appendNull()
  def tree(): ColumnTree =
    MapCol(nullable, lengths.result().asInstanceOf[IntVec], keys.tree(), values.tree())
  def clear(): Unit = { lengths.clear(); keys.clear(); values.clear() }
}

final class StructAppender(st: StructType, nullable: Boolean) extends FieldAppender {
  private val children: Array[FieldAppender] =
    st.fields.map(f => FieldAppender(f.dataType, f.nullable))
  private var n = 0
  private var nulls: Array[Boolean] = null
  private var hasNull = false

  private def markRow(isNull: Boolean): Unit = {
    if (nulls == null) nulls = new Array[Boolean](1024)
    else if (n >= nulls.length) nulls = java.util.Arrays.copyOf(nulls, nulls.length * 2)
    nulls(n) = isNull
    if (isNull) hasNull = true
    n += 1
  }

  def appendFrom(src: SpecializedGetters, ordinal: Int): Unit =
    if (src.isNullAt(ordinal)) appendNullSlot()
    else {
      markRow(isNull = false)
      val row = src.getStruct(ordinal, children.length)
      var i = 0
      while (i < children.length) { children(i).appendFrom(row, i); i += 1 }
    }
  def appendNullSlot(): Unit = {
    markRow(isNull = true)
    var i = 0
    while (i < children.length) { children(i).appendNullSlot(); i += 1 }
  }
  def tree(): ColumnTree = StructCol(nullable, n,
    if (hasNull) java.util.Arrays.copyOf(nulls, n) else null,
    children.map(_.tree()).toSeq)
  def clear(): Unit = { n = 0; hasNull = false; nulls = null; children.foreach(_.clear()) }
}
