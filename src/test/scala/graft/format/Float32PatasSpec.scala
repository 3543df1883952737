package graft.format

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** f32 Patas export: the reference writer competes Patas on BOTH float
  * widths (`/root/reference/src/compression/double/mod.rs` choose_compressor
  * is generic over DoubleType; `double/traits.rs:78-82` instantiates f32 and
  * f64), but its decode rule `sig==0 && tz<63 -> read 8 bytes`
  * (`double/patas.rs:156-161` unpack) exists for the f64
  * full-64-significant-bits packet (sigBytes=8 wraps to 0 in the 3-bit
  * field) and MISFIRES on the f32 equal-value packet (sig=0, tz=31): the
  * decoder consumes 8 payload bytes where the encoder wrote 0 —
  * `read_value_custom` even copies 8 bytes into a 4-byte buffer — so any
  * f32 Patas stream containing an equal-value pair is undecodable by the
  * reference's own reader. A reference-writer fixture cannot be built in
  * this environment (offline: no crate registry), so the layout is pinned
  * the other way: a hand-derived byte fixture for the safe case, plus the
  * encoder refusing the undecodable one.
  *
  * Export policy under test: f32 lanes emit Patas only when no equal-value
  * packet occurs (distinct-pattern streams round-trip bit-exactly, and the
  * emitted bytes match the reference encode algorithm byte for byte); a
  * duplicate-bearing f32 lane falls back to the other codecs in adaptive
  * mode and is rejected loudly when patas is forced. f64 equal pairs pack
  * tz=63 (not repaired at decode) and keep round-tripping.
  */
class Float32PatasSpec extends AnyFunSuite {

  private final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
    def length: Long = bytes.length
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
    def close(): Unit = ()
  }

  private val f32Schema = StructType(Seq(StructField("f", FloatType, nullable = false)))
  private val f64Schema = StructType(Seq(StructField("d", DoubleType, nullable = false)))

  private def decode(bytes: Array[Byte]): Seq[Array[Any]] =
    StrawboatImport.decodeFile(new BytesInput(bytes))._2

  test("f32 distinct-pattern lane round-trips under forced patas") {
    val vals = (0 until 300).map(i => 1.5f + i * 0.1373f)
    assert(vals.map(java.lang.Float.floatToRawIntBits).distinct.size == vals.size)
    val bytes = StrawboatExport.encodeFile(f32Schema, vals.map(Row(_)),
      codec = 0, special = "patas")
    val got = decode(bytes).map(_(0).asInstanceOf[Float])
    assert(got == vals)
  }

  test("f32 patas bytes match the reference encode algorithm (hand-derived fixture)") {
    // 1.0f=0x3F800000, 1.5f=0x3FC00000, 2.5f=0x40200000; per patas.rs:
    //  i=1: ref=prev(1.0f) xor=0x00400000 tz=22 lz=9 sig=1B
    //       packed=(1<<9)|(1<<6)|22=598
    //  i=2: 2.5f unseen -> indices unwrap_or(0) refs INDEX 0 (1.0f), diff=2
    //       xor=0x7FA00000 tz=21 lz=1 sig=2B packed=(2<<9)|(2<<6)|21=1173
    val payload = Array[Int](
      0x00, 0x00, 0x80, 0x3F,       // first value raw LE
      0x56, 0x02, 0x01,             // packed 598 LE + 1 sig byte (0x01)
      0x95, 0x04, 0xFD, 0x03        // packed 1173 LE + 2 sig bytes (0x3FD)
    ).map(_.toByte)
    // codec frame: id 16 | csize u32 | usize u32 | payload
    val frame = Array[Byte](16, 11, 0, 0, 0, 12, 0, 0, 0) ++ payload
    val bytes = StrawboatExport.encodeFile(f32Schema,
      Seq(1.0f, 1.5f, 2.5f).map(Row(_)), codec = 0, special = "patas")
    assert(bytes.containsSlice(frame),
      s"encoded file must embed the hand-derived patas frame: ${bytes.map(b => f"$b%02x").mkString(" ")}")
    assert(decode(bytes).map(_(0)) == Seq(1.0f, 1.5f, 2.5f))
  }

  test("f32 equal-value pair: forced patas rejected, adaptive falls back green") {
    val vals = Seq(1.0f, 2.0f, 2.0f, 3.0f, 1.0f)
    val e = intercept[IllegalArgumentException] {
      StrawboatExport.encodeFile(f32Schema, vals.map(Row(_)), codec = 0, special = "patas")
    }
    assert(e.getMessage.contains("equal-value pair"), e.getMessage)
    // adaptive must pick something decodable instead
    val bytes = StrawboatExport.encodeFile(f32Schema, vals.map(Row(_)), codec = 0)
    assert(decode(bytes).map(_(0)) == vals)
  }

  test("adaptive picks f32 patas on a compressible distinct stream") {
    // smooth ramp: small XORs, ~2-3 bytes/value vs 4 raw — patas wins
    val vals = (0 until 1024).map(i => java.lang.Float.intBitsToFloat(0x3F800000 + i))
    val bytes = StrawboatExport.encodeFile(f32Schema, vals.map(Row(_)), codec = 0)
    // patas frame id 16 with usize = 1024*4
    val usize = Array[Byte](0, 16, 0, 0) // 4096 LE
    val idx = (0 until bytes.length - 9).exists(p =>
      bytes(p) == 16 && bytes.slice(p + 5, p + 9).sameElements(usize))
    assert(idx, "adaptive should have emitted a patas frame for the f32 ramp")
    assert(decode(bytes).map(_(0)) == vals)
  }

  test("f64 equal pairs still round-trip through patas (tz=63, no repair)") {
    val vals = Seq(1.0, 2.5, 2.5, 2.5, 1.0, 1.0, 3.25)
    val bytes = StrawboatExport.encodeFile(f64Schema, vals.map(Row(_)),
      codec = 0, special = "patas")
    assert(decode(bytes).map(_(0)) == vals)
  }

  test("randomized float lanes round-trip raw bits under the adaptive chooser") {
    // duplicates, NaN payloads, signed zeros, infinities — compared on RAW
    // bits (== would treat NaN as unequal and -0.0 as 0.0)
    val rnd = new scala.util.Random(20260814L)
    val specials32 = Array(Float.NaN, java.lang.Float.intBitsToFloat(0x7FC00001),
      -0.0f, 0.0f, Float.PositiveInfinity, Float.NegativeInfinity, Float.MinPositiveValue)
    for (iter <- 0 until 40) {
      val n = 1 + rnd.nextInt(400)
      val vals = Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => specials32(rnd.nextInt(specials32.length))
          case 1 => (rnd.nextInt(8) - 4) * 0.25f // forced duplicates
          case _ => java.lang.Float.intBitsToFloat(rnd.nextInt())
        }
      }
      val bytes = StrawboatExport.encodeFile(f32Schema, vals.toSeq.map(Row(_)), codec = 0)
      val got = decode(bytes).map(_(0).asInstanceOf[Float])
      assert(got.map(java.lang.Float.floatToRawIntBits).toSeq ==
        vals.map(java.lang.Float.floatToRawIntBits).toSeq, s"iter $iter n=$n")
      val vals64 = vals.map(_.toDouble)
      val bytes64 = StrawboatExport.encodeFile(f64Schema, vals64.toSeq.map(Row(_)),
        codec = 0, special = "patas")
      val got64 = decode(bytes64).map(_(0).asInstanceOf[Double])
      assert(got64.map(java.lang.Double.doubleToRawLongBits).toSeq ==
        vals64.map(java.lang.Double.doubleToRawLongBits).toSeq, s"iter $iter f64")
    }
  }
}
