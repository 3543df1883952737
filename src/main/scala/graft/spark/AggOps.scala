package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftCatalystBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native aggregate kernels for the embedding pipeline.
  *
  * [[TriangleSums]] is the covariance-cell accumulator behind
  * s_embedding_pca / s_embedding_power. It collapses the
  * explode-2080-structs-per-vector plan (per vector: a zip_with decimal
  * centering, d(d+1)/2 named_structs through flatten/transform, an explode,
  * and a 2080-group decimal hash aggregate) into ONE pass that mult-adds
  * each vector's upper-triangle products into a flat long buffer. The
  * algebra that makes the results bit-identical:
  *
  *   covn(i,j) = Σ_v (x_vi·n − sx_i)(x_vj·n − sx_j)
  *             = n²·Σ_v x_vi·x_vj − n·sx_i·sx_j        (exact integers)
  *
  * so the aggregate only needs n, the per-position sums sx, and the raw
  * upper-triangle product sums S_ij — all exact int64 (Math.addExact /
  * multiplyExact: overflow fails LOUDLY instead of wrapping; with
  * |x| ≤ ~10³ quantized units that bound is ~10¹² vectors — far past any
  * single-aggregate deployment, which would shard the triangle first).
  * The n²·S − n·sx·sx recombination runs in decimal(38,0) on the d(d+1)/2
  * RESULT cells only, preserving the replaced plan's covn type exactly.
  *
  * Documented divergence (same class as the VecOps kernels): input vectors
  * must be non-null and uniform-width — the zip_with null-padding semantics
  * for ragged/null inputs are not replicated; the aggregate throws instead
  * of answering differently (the gates pin the real corpus, which is
  * uniform d=64 non-null).
  *
  * Buffer layout: [d, n, sx(d), tri(d(d+1)/2)] as Array[Long]; d = -1
  * marks the untouched buffer (empty input ⇒ NULL result, matching the
  * empty-corpus crossJoin shape that produced zero cell rows).
  */
case class TriangleSums(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_triangle_sums"

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("tri", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(child.dataType))

  override def createAggregationBuffer(): Array[Long] = Array(-1L)

  private def allocate(d: Int): Array[Long] = {
    val buf = new Array[Long](2 + d + d * (d + 1) / 2)
    buf(0) = d.toLong
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null)
      throw new IllegalArgumentException(
        s"$prettyName: null input vector (ragged-input semantics are not replicated)")
    val q = v.asInstanceOf[ArrayData]
    val d = q.numElements()
    val buf = if (buffer(0) == -1L) allocate(d) else buffer
    if (buf(0) != d.toLong)
      throw new IllegalArgumentException(
        s"$prettyName: vector width $d != ${buf(0)} (inputs must be uniform-width)")
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (q.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null vector element (ragged-input semantics are not replicated)")
      x(i) = q.getLong(i)
      i += 1
    }
    buf(1) += 1L
    var t = 2 + d
    i = 0
    while (i < d) {
      val xi = x(i)
      buf(2 + i) = Math.addExact(buf(2 + i), xi)
      var j = i
      while (j < d) {
        buf(t) = Math.addExact(buf(t), Math.multiplyExact(xi, x(j)))
        j += 1
        t += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other(0) == -1L) return buffer
    if (buffer(0) == -1L) return other
    if (buffer(0) != other(0))
      throw new IllegalArgumentException(
        s"$prettyName: merging buffers of widths ${buffer(0)} and ${other(0)}")
    var i = 1
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    if (buffer(0) == -1L) return null
    val d = buffer(0).toInt
    val sx = java.util.Arrays.copyOfRange(buffer, 2, 2 + d)
    val tri = java.util.Arrays.copyOfRange(buffer, 2 + d, buffer.length)
    InternalRow(buffer(1), new GenericArrayData(sx), new GenericArrayData(tri))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TriangleSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TriangleSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TriangleSums =
    copy(child = newChildren.head)
}

object AggOps {
  /** `TriangleSums` over a Column, as an aggregate Column usable in agg(). */
  def triangleSums(q: Column): Column =
    GraftCatalystBridge.column(
      TriangleSums(GraftCatalystBridge.expression(q)).toAggregateExpression())
}
