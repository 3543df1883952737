package graft.spark

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.roaringbitmap.RoaringBitmap

/** COLUMNAR deletion-vector masking: keeps a DV'd table's scans on the
  * vectorized path when every projected column is atomic, by compacting
  * each overlapped batch into fresh vectors (per-type row copies over a
  * precomputed keep-index list). Batches with no masked rows pass through
  * untouched — a DV masks a handful of pages in practice, so most batches
  * pay one `rangeCardinality` call and nothing else. Nested projections
  * (array/map/struct) fall back to the row-based reader, which masks by
  * iterator skip ([[GraftReaderFactory.createReader]]).
  */
private[spark] object DvMask {
  /** Types the compaction loop can copy (everything atomic the format
    * stores). Nested types would need recursive child compaction with
    * offset rewriting — the row path handles them instead. */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType |
         FloatType | DoubleType | StringType | BinaryType | NullType => true
    case _: DecimalType => true
    case _ => false
  }
}

private[spark] final class DvMaskedColumnarReader(
    inner: GraftColumnarReader, dv: RoaringBitmap, schema: StructType)
    extends PartitionReader[ColumnarBatch] {

  private var current: ColumnarBatch = null
  private var keep: Array[Int] = new Array[Int](0)

  override def next(): Boolean = {
    while (inner.next()) {
      val b = inner.get()
      val rows = b.numRows()
      val base = inner.currentPageStartRow
      if (rows > 0 && base + rows <= Int.MaxValue.toLong + 1) {
        val masked = dv.rangeCardinality(base, base + rows)
        if (masked == 0L) { current = b; return true }
        val kept = rows - masked.toInt
        if (kept > 0) {
          if (keep.length < rows) keep = new Array[Int](rows)
          var i = 0
          var k = 0
          while (i < rows) {
            if (!dv.contains((base + i).toInt)) { keep(k) = i; k += 1 }
            i += 1
          }
          val out = OnHeapColumnVector.allocateColumns(kept, schema)
          var f = 0
          while (f < out.length) {
            compactColumn(b.column(f), out(f), schema.fields(f).dataType, keep, k)
            f += 1
          }
          val cb = new ColumnarBatch(out.map(_.asInstanceOf[ColumnVector]))
          cb.setNumRows(kept)
          current = cb
          return true
        }
        // whole batch masked: fall through to the next page group
      } else if (rows > 0) {
        // ordinal overflow can't happen for files our writer rolls, but a
        // foreign file could in principle exceed it — fail loudly rather
        // than mask the wrong rows
        throw new IllegalStateException(
          s"graft: page rows beyond deletion-vector ordinal range (base=$base)")
      }
    }
    false
  }

  /** One type dispatch per column, then a tight copy loop. Nulls copy as
    * nulls; values through the physical getter the type maps to. */
  private def compactColumn(src: ColumnVector, dst: OnHeapColumnVector,
      dt: DataType, keep: Array[Int], k: Int): Unit = {
    var o = 0
    dt match {
      case BooleanType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putBoolean(o, src.getBoolean(j)); o += 1 }
      case ByteType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putByte(o, src.getByte(j)); o += 1 }
      case ShortType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putShort(o, src.getShort(j)); o += 1 }
      case IntegerType | DateType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putInt(o, src.getInt(j)); o += 1 }
      case LongType | TimestampType | TimestampNTZType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putLong(o, src.getLong(j)); o += 1 }
      case FloatType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putFloat(o, src.getFloat(j)); o += 1 }
      case DoubleType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o) else dst.putDouble(o, src.getDouble(j)); o += 1 }
      case StringType | BinaryType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o)
          else { val b = src.getBinary(j); dst.putByteArray(o, b, 0, b.length) }
          o += 1 }
      case d: DecimalType =>
        while (o < k) { val j = keep(o)
          if (src.isNullAt(j)) dst.putNull(o)
          else dst.putDecimal(o, src.getDecimal(j, d.precision, d.scale), d.precision)
          o += 1 }
      case NullType =>
        while (o < k) { dst.putNull(o); o += 1 }
      case other => throw new UnsupportedOperationException(
        s"graft: unmaskable column type $other reached the columnar DV path")
    }
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = inner.close()
}
