package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftCatalystBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native integer vector kernels for the embedding pipeline (ANN, semantic
  * dedup, k-means). Semantically identical to the SQL they replace —
  *
  *   dot:     aggregate(zip_with(a, b, (x, y) -> x*y), 0L, (acc, x) -> acc + x)
  *   selfDot: aggregate(a, 0L, (acc, x) -> acc + x*x)
  *   l2:      aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +)
  *
  * including the null contract (length mismatch or any null element ⇒ NULL,
  * exactly what zip_with's null-padding produces) — so every DuckDB oracle
  * stays bit-identical. One documented divergence: on int64 overflow the
  * kernels wrap (Java semantics) where the ANSI-mode SQL form raises;
  * unreachable for the embedding pipeline, whose ×1000 quantization bounds
  * |element| ≤ ~10⁶ and a 64-dim dot ≤ ~10⁸. The point is the
  * constant factor: the higher-order-function form pays per-element lambda
  * dispatch and an intermediate array per pair; these are a single tight
  * primitive loop over the ArrayData, inlined into whole-stage codegen. At
  * 64 dims that is ~20-50× less per-pair cost, which is what makes the
  * within-cluster pairwise step of SemDeDup and the rerank step of the ANN
  * family cheap enough to keep up with their shuffle cost.
  */
object VecOps extends Serializable {

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def selfDot(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getLong(i)
      s += x * x
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def l2(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** l2 over 0-based sub-ranges [from, from+len) of both arrays — the PQ
    * subspace distance without materializing slice() copies. NULL if either
    * range runs past its array (slice semantics would shorten and
    * null-pad; the PQ callers never hit that shape).
    */
  def l2Range(a: ArrayData, b: ArrayData, from: Int, len: Int): java.lang.Long = {
    if (from < 0 || a.numElements() < from + len || b.numElements() < from + len) return null
    var s = 0L
    var i = from
    val end = from + len
    while (i < end) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** 64-permutation MinHash signature fold — semantically identical to
    * the SQL it replaces (the d_dedup_minhash_lsh / d_dedup_incremental
    * hot path, every shingle × 64 lanes):
    *
    *   aggregate(hb, array_repeat(9223372036854775807L, 64),
    *     (acc, v) -> zip_with(acc,
    *       transform(sequence(0, 63),
    *         h -> pmod((h*2+1) * pmod(v, 1000000007) + h*12345+1, 1000000007)),
    *       (a, b) -> least(a, b)))
    *
    * including the null contract: null input array ⇒ NULL; a null ELEMENT
    * contributes nothing (SQL `least` skips nulls, so the lane keeps its
    * accumulator). Empty array ⇒ the 64 Long.MaxValue sentinels, exactly
    * the aggregate's untouched init. The HOF form allocates two
    * intermediate 64-arrays and dispatches 128 lambdas per shingle; this
    * is one tight loop per shingle, inlined into whole-stage codegen —
    * the same ~20-50x constant-factor reduction the ANN kernels bought.
    * All lane arithmetic stays in [0, 2^37): no overflow, `%` == pmod.
    */
  def minhashSig(hb: ArrayData): ArrayData = {
    val P = 1000000007L
    val acc = Array.fill(64)(Long.MaxValue)
    val n = hb.numElements()
    var i = 0
    while (i < n) {
      if (!hb.isNullAt(i)) {
        val v = hb.getLong(i)
        val m = v % P
        val pm = if (m < 0) m + P else m
        var h = 0
        while (h < 64) {
          val lane = ((h * 2 + 1) * pm + h * 12345 + 1) % P
          if (lane < acc(h)) acc(h) = lane
          h += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  /** Count of equal lanes between two signatures — semantically
    *   size(filter(zip_with(a, b, (x, y) -> x = y), p -> p))
    * over equal-length non-null arrays; NULL on length mismatch, and a
    * null lane on either side compares as not-equal (zip_with's x = y is
    * null ⇒ filtered out), matching the SQL exactly. */
  def sigAgree(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }

  def minhashSignature(hb: Column): Column =
    GraftCatalystBridge.column(MinhashSig(GraftCatalystBridge.expression(hb)))

  def signatureAgreement(a: Column, b: Column): Column =
    GraftCatalystBridge.column(
      SigAgree(GraftCatalystBridge.expression(a), GraftCatalystBridge.expression(b)))

  def longDot(a: Column, b: Column): Column =
    GraftCatalystBridge.column(
      LongDot(GraftCatalystBridge.expression(a), GraftCatalystBridge.expression(b)))

  def longNormSq(a: Column): Column =
    GraftCatalystBridge.column(LongSelfDot(GraftCatalystBridge.expression(a)))

  def longL2(a: Column, b: Column): Column =
    GraftCatalystBridge.column(
      LongL2(GraftCatalystBridge.expression(a), GraftCatalystBridge.expression(b)))

  private[spark] val LongArray: DataType = ArrayType(LongType)

  private[spark] def checkLongArrays(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires ARRAY<BIGINT> inputs, got ${types.map(_.sql).mkString(", ")}")
}

case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(left.dataType, right.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Long $boxed = $mod.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDot = copy(left = newLeft, right = newRight)
}

case class LongSelfDot(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_norm_sq"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(child.dataType))

  override protected def nullSafeEval(a: Any): Any =
    VecOps.selfDot(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("nrm")
      s"""
         |java.lang.Long $boxed = $mod.selfDot($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LongSelfDot =
    copy(child = newChild)
}

case class LongL2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_l2"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(left.dataType, right.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("l2")
      s"""
         |java.lang.Long $boxed = $mod.l2($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongL2 = copy(left = newLeft, right = newRight)
}

case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(child.dataType))

  override protected def nullSafeEval(a: Any): Any =
    VecOps.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.minhashSig($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sig_agree"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(left.dataType, right.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("agree")
      s"""
         |java.lang.Integer $boxed = $mod.sigAgree($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigAgree = copy(left = newLeft, right = newRight)
}
