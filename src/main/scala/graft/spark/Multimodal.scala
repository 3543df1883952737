package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftCatalystBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Pure-JVM multimodal frame decode: parses a binary PPM (P6, RGB) or PGM
  * (P5, grayscale) image payload
  * — magic, whitespace/comment-tolerant ASCII header, raw pixel plane — and
  * returns its dimensions plus integer-exact pixel statistics. This is the
  * decode stage the multimodal pipeline slots in AFTER columnar metadata
  * pruning; it needs no codec library because P6 is an uncompressed
  * container (header + raw bytes), which is exactly why it is the honest
  * in-environment stand-in for a jpeg/png decoder: the Spark-side shape
  * (binary column in, struct of typed features out, whole-stage codegen, no
  * UDF) is identical.
  *
  * Malformed payloads decode to NULL rather than failing the task — at
  * 100 TB a corrupt frame must not kill the scan; callers filter or count
  * the nulls.
  */
case class PpmDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PpmDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_decode"
  // analysis-time type check: a non-binary child must be an
  // AnalysisException, not a per-row ClassCastException on executors
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    PpmDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("ppmDecode", PpmDecode, "graft.spark.PpmDecode$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $mod.decode($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmDecode =
    copy(child = newChild)
}

object PpmDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("maxval", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("pix_checksum", LongType, nullable = false),
    StructField("channel_means", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private val Mod = 1000000007L

  /** Column-level entry point: `ppmDecode(col("payload"))` yields a struct
    * column `(width, height, maxval, pix_sum, pix_checksum, channel_means)`,
    * NULL for malformed payloads.
    */
  def apply(payload: Column): Column =
    GraftCatalystBridge.column(PpmDecode(GraftCatalystBridge.expression(payload)))

  /** Parsed P5/P6 header: dims, maxval, channel count (P5 grayscale = 1,
    * P6 RGB = 3), and the pixel-plane offset. */
  final case class Header(width: Int, height: Int, maxval: Int, planeStart: Int,
      channels: Int)

  /** Parse a P6 header (magic, '#'-comment-tolerant whitespace, width,
    * height, maxval, single separator byte) and validate the pixel plane
    * length; null for anything malformed.
    */
  def parseHeader(bytes: Array[Byte]): Header = parseHeader(bytes, 0)

  /** Parse a P6 header starting at `from` (a multi-frame container holds
    * back-to-back frames); `planeStart` is absolute.
    */
  def parseHeader(bytes: Array[Byte], from: Int): Header = {
    if (bytes == null || bytes.length < from + 2 || bytes(from) != 'P') return null
    val channels = bytes(from + 1) match {
      case '5' => 1 // PGM grayscale
      case '6' => 3 // PPM RGB
      case _ => return null
    }
    var p = from + 2

    // PPM allows '#'-to-end-of-line comments anywhere whitespace may appear
    def skipSpace(): Boolean = {
      var sawSpace = false
      var go = true
      while (go && p < bytes.length) {
        val b = bytes(p)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r') { sawSpace = true; p += 1 }
        else if (b == '#') {
          sawSpace = true
          while (p < bytes.length && bytes(p) != '\n') p += 1
        } else go = false
      }
      sawSpace
    }

    def readInt(): Int = {
      if (p >= bytes.length || bytes(p) < '0' || bytes(p) > '9') return -1
      var v = 0L
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0')
        if (v > Int.MaxValue) return -1
        p += 1
      }
      v.toInt
    }

    if (!skipSpace()) return null
    val w = readInt()
    if (w <= 0 || !skipSpace()) return null
    val h = readInt()
    if (h <= 0 || !skipSpace()) return null
    val maxval = readInt()
    if (maxval <= 0 || maxval > 255) return null
    // exactly ONE whitespace byte separates the header from the pixel plane
    if (p >= bytes.length) return null
    val sep = bytes(p)
    if (sep != ' ' && sep != '\t' && sep != '\n' && sep != '\r') return null
    p += 1
    val n = w.toLong * h * channels
    if (n > Int.MaxValue || bytes.length - p < n) return null
    Header(w, h, maxval, p, channels)
  }

  /** Iterate a multi-frame container's back-to-back frames, calling `f`
    * with each parsed header and its frame index. ONE walk shared by the
    * frame-sampling and frame-hashing expressions (duplicated loops had
    * started to accumulate); returns the frame count, or -1 when any
    * frame is malformed or the container holds none — both void the row.
    */
  private[spark] def foreachFrame(bytes: Array[Byte])(f: (Header, Int) => Unit): Int = {
    if (bytes == null) return -1
    var pos = 0
    var frames = 0
    while (pos < bytes.length) {
      val hd = parseHeader(bytes, pos)
      if (hd == null) return -1
      f(hd, frames)
      frames += 1
      pos = hd.planeStart + hd.width * hd.height * hd.channels
    }
    if (frames == 0) -1 else frames
  }

  /** Decode a P6 PPM payload; null for anything malformed. Kept
    * allocation-light: one pass over the pixel bytes, no intermediate
    * buffers.
    */
  def decode(bytes: Array[Byte]): InternalRow = {
    val hd = parseHeader(bytes)
    if (hd == null) return null
    val w = hd.width
    val h = hd.height
    val maxval = hd.maxval
    val p = hd.planeStart
    val nc = hd.channels
    val n = w.toLong * h * nc
    var sum = 0L
    var acc = 0L
    val chan = new Array[Long](nc)
    var i = 0
    val ni = n.toInt
    while (i < ni) {
      val v = bytes(p + i) & 0xff
      sum += v
      acc = (acc * 31 + v) % Mod
      chan(i % nc) += v
      i += 1
    }
    val pixels = w.toLong * h
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      w, h, maxval, sum, acc,
      new GenericArrayData(chan.map(_.toDouble / pixels))))
  }
}

/** Perceptual difference-hash (dHash) of a netpbm payload: integer
  * luminance per pixel ((2r + 5g + b) div 8 for P6 RGB, the gray byte for
  * P5 — exact integer weights, no float), then one bit per horizontally
  * adjacent pair (left < right), folded row-major into a modular
  * accumulator (h*131 + bit mod 1e9+7) so ANY image size hashes to one
  * comparable long. Equal images hash equal; near-identical images (the
  * re-encode/brightness-shift duplicates an image-dedup pass hunts) keep
  * equal gradient SIGNS and so collide on purpose — that is the dHash
  * property. Null on malformed payloads, native codegen, no UDF.
  */
case class PpmDHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_dhash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    PpmDHash.dhash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("ppmDHash", PpmDHash, "graft.spark.PpmDHash$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = $mod.dhash($c);
         |${ev.isNull} = r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmDHash =
    copy(child = newChild)
}

object PpmDHash {
  private val Mod = 1000000007L

  def apply(payload: Column): Column =
    GraftCatalystBridge.column(PpmDHash(GraftCatalystBridge.expression(payload)))

  /** null for malformed payloads, else the boxed modular dHash. */
  def dhash(bytes: Array[Byte]): java.lang.Long = {
    val hd = PpmDecode.parseHeader(bytes)
    if (hd == null) return null
    java.lang.Long.valueOf(dhashFrame(bytes, hd))
  }

  /** dHash of ONE parsed frame (shared with the multi-frame walker). */
  private[spark] def dhashFrame(bytes: Array[Byte], hd: PpmDecode.Header): Long = {
    val w = hd.width; val h = hd.height
    val p = hd.planeStart; val nc = hd.channels
    def lum(x: Int, y: Int): Int = {
      val o = p + (y * w + x) * nc
      if (nc == 1) bytes(o) & 0xff
      else (2 * (bytes(o) & 0xff) + 5 * (bytes(o + 1) & 0xff) +
        (bytes(o + 2) & 0xff)) / 8
    }
    var acc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        val bit = if (lum(x, y) < lum(x + 1, y)) 1 else 0
        acc = (acc * 131 + bit) % Mod
        x += 1
      }
      y += 1
    }
    acc
  }
}

/** Per-frame dHash vector of a multi-frame netpbm container (the video
  * analogue of [[PpmDHash]]): one modular difference-hash per frame, in
  * frame order — the fingerprint sequence that video near-dup detection
  * joins on (two clips sharing k frame hashes share k near-identical
  * frames, whatever their offsets). Null if any frame is malformed.
  */
case class PpmFrameDHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_frame_dhashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    PpmFrameDHashes.hashes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("ppmFrameDHashes", PpmFrameDHashes,
      "graft.spark.PpmFrameDHashes$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $mod.hashes($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmFrameDHashes =
    copy(child = newChild)
}

object PpmFrameDHashes {
  def apply(payload: Column): Column =
    GraftCatalystBridge.column(PpmFrameDHashes(GraftCatalystBridge.expression(payload)))

  def hashes(bytes: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = PpmDecode.foreachFrame(bytes) { (hd, _) =>
      out += PpmDHash.dhashFrame(bytes, hd)
    }
    if (n < 0) null else new GenericArrayData(out.toArray)
  }
}

/** Nearest-neighbor downsample of a P6 PPM payload by an integer stride:
  * output pixel (x, y) takes source pixel (x*factor, y*factor), output dims
  * are ceil(w/factor) x ceil(h/factor). Emits the resampled image's
  * dimensions and integer-exact stats (sum + rolling checksum in row-major
  * sampled order) rather than re-encoded bytes — the feature-extraction
  * shape a pipeline wants (the resized plane itself would just be another
  * opaque payload). Same null-on-malformed contract as [[PpmDecode]].
  */
case class PpmResample(child: Expression, factor: Int) extends UnaryExpression {
  require(factor >= 1, s"graft_ppm_resample: factor must be >= 1, got $factor")
  override def dataType: DataType = PpmResample.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_resample"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  def resample(bytes: Array[Byte]): InternalRow = PpmResample.resample(bytes, factor)

  override protected def nullSafeEval(input: Any): Any =
    resample(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppmResample", this, "graft.spark.PpmResample")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.resample($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmResample =
    copy(child = newChild)
}

object PpmResample {
  val schema: StructType = StructType(Seq(
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("pix_checksum", LongType, nullable = false)))

  private val Mod = 1000000007L

  def apply(payload: Column, factor: Int): Column =
    GraftCatalystBridge.column(PpmResample(GraftCatalystBridge.expression(payload), factor))

  def resample(bytes: Array[Byte], factor: Int): InternalRow = {
    val hd = PpmDecode.parseHeader(bytes, 0)
    if (hd == null) return null
    val w = hd.width
    val h = hd.height
    val base = hd.planeStart
    val nc = hd.channels
    val wOut = (w + factor - 1) / factor
    val hOut = (h + factor - 1) / factor
    var sum = 0L
    var acc = 0L
    var y = 0
    while (y < hOut) {
      val rowOff = base + (y * factor).toLong.toInt * w * nc
      var x = 0
      while (x < wOut) {
        val px = rowOff + x * factor * nc
        var c = 0
        while (c < nc) {
          val v = bytes(px + c) & 0xff
          sum += v
          acc = (acc * 31 + v) % Mod
          c += 1
        }
        x += 1
      }
      y += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](wOut, hOut, sum, acc))
  }
}

/** Frame sampling over a multi-frame container (back-to-back P6 frames —
  * the uncompressed stand-in for a video): walk the frames, keep every
  * `stride`-th one, and emit frame counts plus integer-exact stats over the
  * SAMPLED frames only. The decode-every-k-th-frame shape a video pipeline
  * runs after metadata pruning; a malformed frame anywhere voids the row
  * (NULL) rather than failing the task.
  */
case class PpmFrameSample(child: Expression, stride: Int) extends UnaryExpression {
  require(stride >= 1, s"graft_ppm_frame_sample: stride must be >= 1, got $stride")
  override def dataType: DataType = PpmFrameSample.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_frame_sample"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  def sample(bytes: Array[Byte]): InternalRow = PpmFrameSample.sample(bytes, stride)

  override protected def nullSafeEval(input: Any): Any =
    sample(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppmFrameSample", this, "graft.spark.PpmFrameSample")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.sample($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmFrameSample =
    copy(child = newChild)
}

object PpmFrameSample {
  val schema: StructType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_sampled", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("pix_checksum", LongType, nullable = false)))

  private val Mod = 1000000007L

  def apply(payload: Column, stride: Int): Column =
    GraftCatalystBridge.column(PpmFrameSample(GraftCatalystBridge.expression(payload), stride))

  def sample(bytes: Array[Byte], stride: Int): InternalRow = {
    var sampled = 0
    var sum = 0L
    var acc = 0L
    val frames = PpmDecode.foreachFrame(bytes) { (hd, idx) =>
      if (idx % stride == 0) {
        sampled += 1
        var i = hd.planeStart
        val end = hd.planeStart + hd.width * hd.height * hd.channels
        while (i < end) {
          val v = bytes(i) & 0xff
          sum += v
          acc = (acc * 31 + v) % Mod
          i += 1
        }
      }
    }
    if (frames < 0) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](frames, sampled, sum, acc))
  }
}

/** Pure-JVM audio decode: parses a RIFF/WAVE payload (PCM, 8-bit unsigned
  * or 16-bit signed little-endian, any channel count) and returns its
  * format plus integer-exact sample statistics — the audio lane of the
  * multimodal pipeline. WAV/PCM is an uncompressed container (chunked
  * header + raw samples), so like the netpbm lane it is the honest
  * in-environment stand-in for mp3/flac whose codec libraries this
  * container lacks: the Spark-side shape (binary column in, typed feature
  * struct out, whole-stage codegen, no UDF) is identical.
  *
  * Chunk walk follows the RIFF spec: chunks are (id, LE u32 size, payload)
  * with word (2-byte) alignment padding; unknown chunks (LIST, fact, cue)
  * are skipped, `fmt ` must precede `data`. Same null-on-malformed
  * contract as [[PpmDecode]] — a corrupt clip must not kill a 100 TB scan.
  */
case class WavDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_decode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WavDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("wavDecode", WavDecode, "graft.spark.WavDecode$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $mod.decode($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
}

object WavDecode {
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("samp_sum", LongType, nullable = false),
    StructField("samp_checksum", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  private val Mod = 1000000007L

  def apply(payload: Column): Column =
    GraftCatalystBridge.column(WavDecode(GraftCatalystBridge.expression(payload)))

  private[spark] def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private[spark] def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private[spark] def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  /** Decode a RIFF/WAVE PCM payload; null for anything malformed. One pass
    * over the sample bytes, no intermediate buffers. `samp_sum`/`peak` use
    * SIGNED sample values (16-bit LE two's complement; 8-bit WAV is
    * unsigned-biased, value - 128); the rolling checksum folds the raw
    * unsigned width-sized words so it is independent of sign
    * interpretation.
    */
  /** Validated PCM payload: format fields plus the data plane bounds.
    * ONE chunk-walk shared by decode and fingerprint — two copies of the
    * RIFF loop had already drifted once (the fingerprint dropped the
    * channel validations), which is exactly the bug class a single
    * parser removes.
    */
  private[spark] final case class Pcm(channels: Int, rate: Int, bits: Int,
      body: Int, nSamples: Int)

  /** Walk the RIFF chunks; null unless a valid fmt chunk precedes a data
    * chunk (fmtCode 1, channels > 0, rate > 0, bits 8/16, sample count a
    * channel multiple). */
  private[spark] def locatePcm(bytes: Array[Byte]): Pcm = {
    if (bytes == null || bytes.length < 12) return null
    if (!tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return null
    var p = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var haveFmt = false
    while (p + 8 <= bytes.length) {
      val size = le32(bytes, p + 4)
      val body = p + 8
      if (size < 0 || size > bytes.length - body) return null
      if (tag(bytes, p, "fmt ")) {
        if (size < 16) return null
        val fmtCode = le16(bytes, body)
        channels = le16(bytes, body + 2)
        rate = le32(bytes, body + 4).toInt
        bits = le16(bytes, body + 14)
        if (fmtCode != 1 || channels <= 0 || rate <= 0 ||
          (bits != 8 && bits != 16)) return null
        haveFmt = true
      } else if (tag(bytes, p, "data")) {
        if (!haveFmt) return null
        val bytesPerSample = bits / 8
        val n = size / bytesPerSample
        if (n % channels != 0) return null
        return Pcm(channels, rate, bits, body, n.toInt)
      }
      // RIFF chunks are word-aligned: odd sizes carry one pad byte
      p = body + size.toInt + (size.toInt & 1)
    }
    null // no data chunk
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val pcm = locatePcm(bytes)
    if (pcm == null) return null
    val bits = pcm.bits
    val body = pcm.body
    var sum = 0L
    var acc = 0L
    var peak = 0
    var i = 0
    val ni = pcm.nSamples
    while (i < ni) {
      var raw = 0
      var v = 0
      if (bits == 8) {
        raw = bytes(body + i) & 0xff
        v = raw - 128
      } else {
        raw = le16(bytes, body + 2 * i)
        v = raw.toShort.toInt
      }
      sum += v
      if (v < 0) { if (-v > peak) peak = -v } else if (v > peak) peak = v
      acc = (acc * 31 + raw) % Mod
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](pcm.channels, pcm.rate, bits, ni.toLong / pcm.channels, sum, acc, peak))
  }
}

/** Acoustic fingerprint of a PCM payload — the audio analogue of
  * [[PpmDHash]]: one bit per adjacent SIGNED-sample pair (previous <
  * next), folded into a modular accumulator. A positive gain change
  * rescales every sample but preserves every delta sign, so re-levelled
  * copies of a clip collide — the property an audio-dedup pass wants —
  * while different waveforms diverge. Multichannel clips fold the
  * INTERLEAVED sample stream (channel layout is part of the identity: a
  * mono clip and its stereo duplication are different payloads and hash
  * differently, by design). Zero/one-sample clips fingerprint to 0.
  * Null on malformed payloads; native codegen, no UDF.
  */
case class WavFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_fingerprint"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY payload column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WavFingerprint.fingerprint(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("wavFp", WavFingerprint, "graft.spark.WavFingerprint$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = $mod.fingerprint($c);
         |${ev.isNull} = r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WavFingerprint =
    copy(child = newChild)
}

object WavFingerprint {
  private val Mod = 1000000007L

  def apply(payload: Column): Column =
    GraftCatalystBridge.column(WavFingerprint(GraftCatalystBridge.expression(payload)))

  def fingerprint(bytes: Array[Byte]): java.lang.Long = {
    // ONE parser (WavDecode.locatePcm) for both expressions — the same
    // payloads must be malformed to both, incl. the channel validations
    // an earlier hand-rolled copy of the chunk walk had dropped
    val pcm = WavDecode.locatePcm(bytes)
    if (pcm == null) return null
    val bits = pcm.bits
    val body = pcm.body
    val n = pcm.nSamples
    var acc = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val v =
        if (bits == 8) (bytes(body + i) & 0xff) - 128
        else WavDecode.le16(bytes, body + 2 * i).toShort.toInt
      if (i > 0) acc = (acc * 131 + (if (prev < v) 1 else 0)) % Mod
      prev = v
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
