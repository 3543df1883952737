package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftCatalystBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text/shingle kernels for the training-data pipeline. Semantically
  * identical to the SQL they replace — each kernel's scaladoc quotes the
  * exact expression and KernelParitySpec pins the equality, corner cases
  * included. The point is the constant factor: the HOF forms allocate a
  * slice array + a joined string (+ a 32-char hex digest later parsed back
  * by unhex) PER GRAM and dispatch a lambda per element; these run one
  * tight pass per document over the UTF8 bytes with a reused MessageDigest,
  * allocating only the output values.
  */
object TextOps extends Serializable {

  // @transient: the module object rides into codegen references (and thus
  // task closures); ThreadLocal is not serializable and re-initializes
  // lazily per JVM anyway (Scala modules readResolve to the singleton)
  @transient private lazy val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SPACE: Byte = ' '.toByte

  /** Binary md5 digests of the consecutive 4-word shingles of `w` —
    * semantically identical to
    *
    *   CASE WHEN size(w) >= 4
    *     THEN transform(sequence(0, size(w)-4),
    *            i -> unhex(md5(array_join(slice(w, i+1, 4), ' '))))
    *     ELSE array() END
    *
    * including array_join's null-element contract (null elements are
    * skipped, no separator emitted for them). Word bytes are fetched once
    * per word (not once per gram) and each digest is computed straight off
    * the UTF8 bytes — no slice array, no joined string, no hex round-trip.
    */
  def fourGramMd5(w: ArrayData): ArrayData = {
    val n = w.numElements()
    if (n < 4) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      words(i) = if (w.isNullAt(i)) null else w.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n - 3)
    i = 0
    while (i <= n - 4) {
      md.reset()
      var first = true
      var j = i
      while (j < i + 4) {
        val b = words(j)
        if (b != null) {
          if (!first) md.update(SPACE)
          md.update(b)
          first = false
        }
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The consecutive 4-word shingles of `w` as strings — semantically
    * identical to
    *
    *   CASE WHEN size(w) >= 4
    *     THEN transform(sequence(0, size(w)-4), i -> array_join(slice(w, i+1, 4), ' '))
    *     ELSE array() END
    *
    * (d_decontam_bloom keeps the raw gram string as its join key — its
    * declared distinct-counts are over the STRINGS, so only the
    * construction is kernelized, not the key).
    */
  def fourGrams(w: ArrayData): ArrayData = {
    val n = w.numElements()
    if (n < 4) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      words(i) = if (w.isNullAt(i)) null else w.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - 3)
    i = 0
    while (i <= n - 4) {
      // concatWs skips null inputs — array_join's exact null contract
      out(i) = UTF8String.concatWs(sep, words(i), words(i + 1), words(i + 2), words(i + 3))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Binary md5 digests of the consecutive non-overlapping 4-word segments
    * of `w` (last segment may be shorter) — semantically identical to
    *
    *   transform(sequence(0, cast(ceil(size(w)/4.0) as int) - 1),
    *     i -> unhex(md5(array_join(slice(w, i*4+1, 4), ' '))))
    *
    * including the size-0 corner: ceil(0/4.0)-1 = -1 makes sequence(0,-1)
    * step backwards, yielding TWO empty-slice digests (md5 of "") — an
    * unreachable shape for split()'s >= 1 element output, replicated
    * anyway so the kernel is a drop-in for the expression.
    */
  def segmentMd5(w: ArrayData): ArrayData = {
    val n = w.numElements()
    val md = md5Local.get()
    if (n == 0) {
      md.reset(); val d0 = md.digest()
      md.reset(); val d1 = md.digest()
      return new GenericArrayData(Array[Any](d0, d1))
    }
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      words(i) = if (w.isNullAt(i)) null else w.getUTF8String(i).getBytes
      i += 1
    }
    val nseg = (n + 3) / 4
    val out = new Array[Any](nseg)
    var k = 0
    while (k < nseg) {
      md.reset()
      var first = true
      var j = k * 4
      val end = math.min(j + 4, n)
      while (j < end) {
        val b = words(j)
        if (b != null) {
          if (!first) md.update(SPACE)
          md.update(b)
          first = false
        }
        j += 1
      }
      out(k) = md.digest()
      k += 1
    }
    new GenericArrayData(out)
  }

  /** The k=3 Bloom positions of gram `g` under prefix `prefix` and modulus
    * `m` — semantically identical to (with h = md5(concat(prefix, g))):
    *
    *   array(P(0), P(1), P(2)) where P(j) =
    *     pmod(aggregate(transform(sequence(1, 10),
    *            i -> cast(instr('0123456789abcdef',
    *                   substr(h, j*10 + i, 1)) - 1 as bigint)),
    *          cast(0 as bigint), (a, x) -> a * 16 + x), m)
    *
    * i.e. the 32-nibble digest split into 3 disjoint 10-nibble (40-bit)
    * big-endian windows, each reduced mod m. One digest, no hex string, no
    * per-nibble instr/substr calls.
    */
  def bloomPos3(g: UTF8String, prefix: Array[Byte], m: Int): ArrayData = {
    val md = md5Local.get()
    md.reset()
    md.update(prefix)
    md.update(g.getBytes)
    val d = md.digest()
    def nib(t: Int): Long = {
      val b = d(t >> 1)
      (if ((t & 1) == 0) (b >> 4) & 0xF else b & 0xF).toLong
    }
    val out = new Array[Long](3)
    var j = 0
    while (j < 3) {
      var v = 0L
      var i = j * 10
      val end = i + 10
      while (i < end) { v = v * 16 + nib(i); i += 1 }
      out(j) = v % m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass quality stats over `text` — a struct of
    *
    *   n_words   = size(split(text, ' '))                          (int)
    *   stop_hits = size(filter(split(text,' '), x -> x IN ('the','a'))) (int)
    *   punct     = length(text)
    *             - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '')) (int)
    *
    * computed in a single scan of the UTF8 bytes: split on the single
    * space byte keeps empty tokens (Java split semantics, limit -1), punct
    * counts CODE POINTS outside [a-zA-Z0-9 ] (a multi-byte character is
    * one code point — matching length()'s numChars), and no word array,
    * match array, or replaced string is ever materialized.
    */
  def qualityStats(t: UTF8String): InternalRow = {
    val nb = t.numBytes()
    var nWords = 1
    var stop = 0
    var punct = 0
    var tokStart = 0
    def closeToken(end: Int): Unit = {
      val len = end - tokStart
      if (len == 1) {
        if (t.getByte(tokStart) == 'a'.toByte) stop += 1
      } else if (len == 3) {
        if (t.getByte(tokStart) == 't'.toByte &&
            t.getByte(tokStart + 1) == 'h'.toByte &&
            t.getByte(tokStart + 2) == 'e'.toByte) stop += 1
      }
    }
    var i = 0
    while (i < nb) {
      val b = t.getByte(i)
      if (b == SPACE) {
        closeToken(i); nWords += 1; tokStart = i + 1; i += 1
      } else {
        val l = UTF8String.numBytesForFirstByte(b)
        if (l == 1) {
          val ok = (b >= 'a'.toByte && b <= 'z'.toByte) ||
            (b >= 'A'.toByte && b <= 'Z'.toByte) ||
            (b >= '0'.toByte && b <= '9'.toByte)
          if (!ok) punct += 1
          i += 1
        } else { punct += 1; i += l }
      }
    }
    closeToken(nb)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, stop, punct))
  }

  val qualityStatsSchema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false)))

  /** The 5 language-id stopword sets (t_language_id / the pipeline's
    * language gate) — pairwise disjoint, so one hash probe per word
    * replaces 5 `size(filter(w, x IN (...)))` passes.
    */
  @transient private lazy val langLookup: java.util.HashMap[UTF8String, Integer] = {
    val sets = Array(
      Array("the", "a", "fast", "slow"),
      Array("join", "hash", "merge", "batch"),
      Array("data", "table", "row", "scan"),
      Array("filter", "order", "column", "small"),
      Array("customer", "query", "value", "part"))
    val m = new java.util.HashMap[UTF8String, Integer]()
    var s = 0
    while (s < sets.length) {
      sets(s).foreach(w => m.put(UTF8String.fromString(w), Integer.valueOf(s)))
      s += 1
    }
    m
  }

  /** One-pass language-id scores over word array `w` — a struct of
    *
    *   s_en = size(filter(w, x -> x IN ('the','a','fast','slow')))
    *   s_de = size(filter(w, x -> x IN ('join','hash','merge','batch')))
    *   s_es = size(filter(w, x -> x IN ('data','table','row','scan')))
    *   s_fr = size(filter(w, x -> x IN ('filter','order','column','small')))
    *   s_zh = size(filter(w, x -> x IN ('customer','query','value','part')))
    *
    * (each int). A null ELEMENT matches no set (`x IN (...)` is NULL for
    * it — filtered out), exactly the HOF semantics. The sets are disjoint,
    * so one hash lookup per word is exhaustive.
    */
  def langScores(w: ArrayData): InternalRow = {
    val counts = new Array[Int](5)
    val n = w.numElements()
    var i = 0
    while (i < n) {
      if (!w.isNullAt(i)) {
        val idx = langLookup.get(w.getUTF8String(i))
        if (idx != null) counts(idx.intValue()) += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts(0), counts(1), counts(2), counts(3), counts(4)))
  }

  val langScoresSchema: StructType = StructType(
    Seq("s_en", "s_de", "s_es", "s_fr", "s_zh")
      .map(f => StructField(f, IntegerType, nullable = false)))

  def fourGramMd5Col(w: Column): Column =
    GraftCatalystBridge.column(FourGramMd5(GraftCatalystBridge.expression(w)))

  def fourGramsCol(w: Column): Column =
    GraftCatalystBridge.column(FourGrams(GraftCatalystBridge.expression(w)))

  def segmentMd5Col(w: Column): Column =
    GraftCatalystBridge.column(SegmentMd5(GraftCatalystBridge.expression(w)))

  def bloomPos3Col(g: Column, prefix: String, m: Int): Column =
    GraftCatalystBridge.column(
      BloomPos3(GraftCatalystBridge.expression(g), prefix, m))

  def qualityStatsCol(text: Column): Column =
    GraftCatalystBridge.column(QualityStats(GraftCatalystBridge.expression(text)))

  def langScoresCol(w: Column): Column =
    GraftCatalystBridge.column(LangScores(GraftCatalystBridge.expression(w)))

  private[spark] def checkStringArray(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<STRING> input, got ${other.sql}")
    }
}

/** See [[TextOps.fourGramMd5]]. */
case class FourGramMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_four_gram_md5"
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    TextOps.fourGramMd5(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.fourGramMd5($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): FourGramMd5 =
    copy(child = newChild)
}

/** See [[TextOps.fourGrams]]. */
case class FourGrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_four_grams"
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    TextOps.fourGrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.fourGrams($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): FourGrams =
    copy(child = newChild)
}

/** See [[TextOps.segmentMd5]]. */
case class SegmentMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_segment_md5"
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    TextOps.segmentMd5(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.segmentMd5($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SegmentMd5 =
    copy(child = newChild)
}

/** See [[TextOps.bloomPos3]]. */
case class BloomPos3(child: Expression, prefix: String, m: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_pos3"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(a: Any): Any =
    TextOps.bloomPos3(a.asInstanceOf[UTF8String], prefixBytes, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.bloomPos3($a, $pref, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomPos3 =
    copy(child = newChild)
}

/** See [[TextOps.langScores]]. */
case class LangScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextOps.langScoresSchema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_lang_scores"
  override def checkInputDataTypes(): TypeCheckResult =
    TextOps.checkStringArray(prettyName, child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    TextOps.langScores(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.langScores($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

/** See [[TextOps.qualityStats]]. */
case class QualityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextOps.qualityStatsSchema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_quality_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(a: Any): Any =
    TextOps.qualityStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textOps", TextOps, "graft.spark.TextOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mod.qualityStats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
}
