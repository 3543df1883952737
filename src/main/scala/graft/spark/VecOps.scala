package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftCatalystBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  /** SimHash majority fold — semantically identical to the SQL it replaces
    * (the d_dedup_simhash hot path):
    *
    *   aggregate(sequence(0, nbits-1), cast(0 as bigint),
    *     (acc, b) -> acc + CASE
    *       WHEN size(filter(hs, h -> ((h >> b) & 1) = 1)) * 2 >= size(hs)
    *       THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)
    *
    * including the exact corner semantics: a NULL input array folds to 0
    * (size(NULL) is NULL, the CASE falls to ELSE for every bit); an EMPTY
    * array sets every bit (0*2 >= 0); a null ELEMENT counts in size(hs)
    * but never in the filtered count (the filter predicate is NULL for it).
    * The HOF form allocates one filtered array per BIT (nbits array
    * materializations per document) and dispatches nbits*|hs| lambdas;
    * this is one pass over the words with nbits counters.
    */
  def simhashFold(hs: ArrayData, nbits: Int): Long = {
    if (hs == null) return 0L
    val n = hs.numElements()
    val counts = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val v = hs.getLong(i)
        var b = 0
        while (b < nbits) {
          counts(b) += ((v >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < nbits) {
      if (counts(b).toLong * 2 >= n) acc += 1L << b
      b += 1
    }
    acc
  }

  /** Cosine-argmax centroid assignment — semantically identical to the
    * crossJoin + window form it replaces (the IVF / SemDeDup / k-means
    * assignment shape):
    *
    *   e.crossJoin(broadcast(cents))
    *     .withColumn("cdot", longDot(q, cq))
    *     .withColumn("ccos", cdot.cast(double) / (sqrt(nn) * sqrt(cn)))
    *     .withColumn("crk", row_number().over(
    *       Window.partitionBy(vec_id).orderBy(ccos.desc, cid)))
    *     .filter(crk === 1)
    *
    * with nn = selfDot(q), including the ordering corners: a NULL ccos —
    * a length-mismatched cq, OR a zero-norm side (Spark's non-ANSI Divide
    * yields NULL on a 0 divisor; NaN is unreachable) — sorts LAST under
    * desc (NULLS LAST), so a null candidate only wins when every candidate
    * is null — then the smallest cid wins, exactly like the window's cid
    * tie-break. -0.0 is unreachable (a long-cast numerator over
    * non-negative sqrt denominators). One documented divergence: under
    * ANSI mode the SQL form THROWS on a zero-norm vector (DIVIDE_BY_ZERO)
    * where the kernel ranks it null-last — unreachable for the gated
    * corpus (no zero-norm vectors), and strictly more robust. Returns
    * NULL only for a null or empty codebook array — the shapes where the
    * crossJoin would have emitted no row for the vector (callers filter
    * the null out).
    *
    * cb is array<struct<cid bigint, cq array<bigint>, cn bigint>>.
    */
  def nearestCentroid(q: ArrayData, cb: ArrayData): java.lang.Long = {
    if (cb == null) return null
    val k = cb.numElements()
    if (k == 0) return null
    val nn: java.lang.Long = if (q == null) null else selfDot(q)
    val nnSqrt = if (nn == null) 0.0 else math.sqrt(nn.longValue().toDouble)
    var bestCid = 0L
    var bestCos = 0.0
    var bestNull = false
    var seen = false
    var i = 0
    while (i < k) {
      if (!cb.isNullAt(i)) {
        val ent = cb.getStruct(i, 3)
        val cid = ent.getLong(0)
        val cq = if (ent.isNullAt(1)) null else ent.getArray(1)
        val cdot: java.lang.Long =
          if (q == null || cq == null || nn == null) null else dot(q, cq)
        val denom =
          if (cdot == null || ent.isNullAt(2)) 0.0
          else nnSqrt * math.sqrt(ent.getLong(2).toDouble)
        // denom 0 ⇒ Spark's non-ANSI Divide yields NULL (never NaN)
        val isNull = cdot == null || ent.isNullAt(2) || denom == 0.0
        val ccos = if (isNull) 0.0 else cdot.longValue().toDouble / denom
        // desc NULLS LAST, tie asc cid: non-null beats null; among
        // non-null, larger ccos wins (NaN largest, Double.compare); among
        // equal (or both-null), smaller cid wins
        val wins =
          if (!seen) true
          else if (isNull != bestNull) bestNull
          else if (!isNull) {
            val c = java.lang.Double.compare(ccos, bestCos)
            c > 0 || (c == 0 && cid < bestCid)
          } else cid < bestCid
        if (wins) { bestCid = cid; bestCos = ccos; bestNull = isNull }
        seen = true
      }
      i += 1
    }
    if (!seen) null else java.lang.Long.valueOf(bestCid)
  }

  /** PQ subspace encoder — semantically identical to the crossJoin +
    * explode(m) + window form it replaces (the s_embedding_pq /
    * s_ann_ivfpq encode shape):
    *
    *   e.crossJoin(broadcast(cents))
    *     .withColumn("m", explode(sequence(0, M-1)))
    *     .withColumn("d2", longL2(slice(q, m*sub+1, sub), slice(cq, m*sub+1, sub)))
    *     .withColumn("rk", row_number().over(
    *       Window.partitionBy(vec_id, m).orderBy(d2, cid)))
    *     .filter(rk === 1)
    *
    * per subspace m: argmin d2 with asc NULLS FIRST (a NULL d2 — a slice
    * running past either array — beats every real distance), ties by
    * smaller cid. Returns the M winning cids as array<bigint>; NULL only
    * for a null/empty codebook (the no-rows crossJoin shapes).
    *
    * cb is array<struct<cid bigint, cq array<bigint>>>. One documented
    * divergence (same class as the VecOps overflow note): SQL slice()
    * SHORTENS a slice that runs past its array, so longL2 over two
    * equally-shortened slices would compute a real distance where l2Range
    * returns NULL. That shape needs q and cq to be short by exactly the
    * same amount — unreachable for the PQ callers, whose vectors are all
    * the same width (the gates pin the real corpus bit-for-bit).
    */
  def pqEncode(q: ArrayData, cb: ArrayData, m: Int, sub: Int): ArrayData = {
    if (cb == null) return null
    val k = cb.numElements()
    if (k == 0) return null
    // fail-loud on the documented divergence (r19 advice): SQL slice()
    // would SHORTEN a q narrower than m*sub and compute a real distance
    // where l2Range returns NULL — silently changing which centroid wins.
    // The PQ callers' vectors are all exactly m*sub wide; anything else is
    // a contract breach, not a shape to guess at (TriangleSums convention).
    if (q != null && q.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector width ${q.numElements()} != m*sub = ${m * sub}")
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var bestCid = 0L
      var bestD2 = 0L
      var bestNull = false
      var seen = false
      var i = 0
      while (i < k) {
        if (!cb.isNullAt(i)) {
          val ent = cb.getStruct(i, 2)
          val cid = ent.getLong(0)
          val cq = if (ent.isNullAt(1)) null else ent.getArray(1)
          val d2: java.lang.Long =
            if (q == null || cq == null) null
            else l2Range(q, cq, mi * sub, sub)
          val isNull = d2 == null
          val dv = if (isNull) 0L else d2.longValue()
          // asc NULLS FIRST, tie asc cid: null beats non-null; among
          // non-null smaller d2 wins; among equal (or both-null) smaller cid
          val wins =
            if (!seen) true
            else if (isNull != bestNull) isNull
            else if (!isNull) dv < bestD2 || (dv == bestD2 && cid < bestCid)
            else cid < bestCid
          if (wins) { bestCid = cid; bestD2 = dv; bestNull = isNull }
          seen = true
        }
        i += 1
      }
      if (!seen) return null
      out(mi) = bestCid
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def minhashSignature(hb: Column): Column =
    GraftCatalystBridge.column(MinhashSig(GraftCatalystBridge.expression(hb)))

  def simhashFolded(hs: Column, nbits: Int): Column =
    GraftCatalystBridge.column(
      SimhashFold(GraftCatalystBridge.expression(hs), nbits))

  def nearestCentroidCol(q: Column, cb: Column): Column =
    GraftCatalystBridge.column(
      NearestCentroid(GraftCatalystBridge.expression(q),
        GraftCatalystBridge.expression(cb)))

  def pqEncodeCol(q: Column, cb: Column, m: Int, sub: Int): Column =
    GraftCatalystBridge.column(
      PqEncode(GraftCatalystBridge.expression(q),
        GraftCatalystBridge.expression(cb), m, sub))

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

/** See [[VecOps.simhashFold]]. NOT null-intolerant: a NULL input array
  * folds to 0L exactly like the SQL aggregate it replaces, so eval/codegen
  * handle null explicitly instead of via the nullSafe scaffolding.
  */
case class SimhashFold(child: Expression, nbits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_fold"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkLongArrays(prettyName, Seq(child.dataType))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VecOps.simhashFold(
      if (v == null) null else v.asInstanceOf[ArrayData], nbits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        long ${ev.value} = $mod.simhashFold(${c.isNull} ? null : ${c.value}, $nbits);
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashFold =
    copy(child = newChild)
}

/** See [[VecOps.nearestCentroid]]. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(LongType, _) => right.dataType match {
        case ArrayType(StructType(Array(a, b, c)), _) =>
          a.dataType == LongType &&
            (b.dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
            c.dataType == LongType
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>, BIGINT>>), " +
        s"got ${Seq(left.dataType, right.dataType).map(_.sql).mkString(", ")}")
  }

  // the q side may be NULL (the window form still emits a row for it —
  // every candidate's ccos is null and the smallest cid wins), so only the
  // codebook side routes through null-intolerant scaffolding
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cb = right.eval(input)
    if (cb == null) return null
    val q = left.eval(input)
    VecOps.nearestCentroid(
      if (q == null) null else q.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("nc")
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${r.isNull}) {
          java.lang.Long $boxed = $mod.nearestCentroid(
            ${l.isNull} ? null : ${l.value}, ${r.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCentroid = copy(left = newLeft, right = newRight)
}

/** See [[VecOps.pqEncode]]. */
case class PqEncode(left: Expression, right: Expression, m: Int, sub: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(LongType, _) => right.dataType match {
        case ArrayType(StructType(Array(a, b)), _) =>
          a.dataType == LongType &&
            (b.dataType match { case ArrayType(LongType, _) => true; case _ => false })
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>>>), " +
        s"got ${Seq(left.dataType, right.dataType).map(_.sql).mkString(", ")}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cb = right.eval(input)
    if (cb == null) return null
    val q = left.eval(input)
    VecOps.pqEncode(
      if (q == null) null else q.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], m, sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("vecOps", VecOps, "graft.spark.VecOps$")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${r.isNull}) {
          ${ev.value} = $mod.pqEncode(
            ${l.isNull} ? null : ${l.value}, ${r.value}, $m, $sub);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode = copy(left = newLeft, right = newRight)
}
