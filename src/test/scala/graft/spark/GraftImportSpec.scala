package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end import of a directory of reference-layout files: distributed
  * decode into a DataFrame, then one-shot migration to a native graft
  * table. The fixture bytes reuse the same layout the format-level spec
  * verifies (StrawboatImportSpec); here the point is the Spark surface —
  * file listing, schema pinning, executor-side decode, toGraft.
  */
class GraftImportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
  import scala.jdk.CollectionConverters._

  private def u32(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(v.toInt); b.array()
  }
  private def u64(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  /** Minimal reference-layout file: (k: i64, s: utf8) non-null, None codec. */
  private def fixture(ks: Seq[Long], strs: Seq[String]): Array[Byte] = {
    val n = ks.size
    def noneBlock(raw: Array[Byte]): Array[Byte] =
      cat(Array(0.toByte), u32(raw.length), u32(raw.length), raw)
    val kRaw = {
      val b = java.nio.ByteBuffer.allocate(8 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ks.foreach(b.putLong); b.array()
    }
    val kPage = noneBlock(kRaw)
    val offs = strs.scanLeft(0L)((a, s) => a + s.length)
    val offRaw = {
      val b = java.nio.ByteBuffer.allocate(4 * (n + 1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      offs.foreach(o => b.putInt(o.toInt)); b.array()
    }
    val sPage = cat(noneBlock(offRaw), noneBlock(strs.mkString.getBytes("UTF-8")))
    val schema = new Schema(Seq(
      new Field("k", FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("s", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null)).asJava)
    val schemaBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val ch = new org.apache.arrow.vector.ipc.WriteChannel(
        java.nio.channels.Channels.newChannel(baos))
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, schema)
      baos.toByteArray
    }
    val kOff = 8L
    val sOff = kOff + kPage.length
    val metaBytes = cat(u64(2),
      u64(kOff), u64(1), u64(kPage.length), u64(n),
      u64(sOff), u64(1), u64(sPage.length), u64(n))
    cat("ARROW2".getBytes("UTF-8"), Array[Byte](0, 0), kPage, sPage,
      schemaBytes, metaBytes, u32(schemaBytes.length), u32(metaBytes.length),
      Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
  }

  /** One-column nested fixture: xs = nullable List<nullable Int32>.
    * Levels hand-derived (maxDef=3, maxRep=1); rows:
    * [0,10] | [] | null | [7,null] | [42]
    */
  private def nestedFixture(): Array[Byte] = {
    def noneBlock(raw: Array[Byte]): Array[Byte] =
      cat(Array(0.toByte), u32(raw.length), u32(raw.length), raw)
    val reps = Seq(0, 1, 0, 0, 0, 1, 0)
    val defs = Seq(3, 3, 1, 0, 3, 2, 3)
    def bitpacked(vals: Seq[Int], width: Int): Array[Byte] = {
      val groups = (vals.size + 7) / 8
      val out = Array.newBuilder[Byte]
      out += (((groups << 1) | 1)).toByte
      (0 until groups).foreach { g =>
        var acc = 0L
        (0 until 8).foreach { k =>
          if (g * 8 + k < vals.size) acc |= vals(g * 8 + k).toLong << (k * width)
        }
        (0 until width).foreach(b => out += ((acc >>> (8 * b)) & 0xff).toByte)
      }
      out.result()
    }
    val repB = bitpacked(reps, 1)
    val defB = bitpacked(defs, 2)
    val slots = Seq(0L, 10L, 7L, 99L, 42L) // garbage at the masked slot
    val valRaw = {
      val b = java.nio.ByteBuffer.allocate(4 * slots.size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      slots.foreach(v => b.putInt(v.toInt)); b.array()
    }
    val page = cat(u32(5), u32(repB.length), u32(defB.length), repB, defB, noneBlock(valRaw))
    val item = new Field("item", FieldType.nullable(new ArrowType.Int(32, true)), null)
    val schema = new Schema(Seq(
      new Field("xs", FieldType.nullable(ArrowType.List.INSTANCE), Seq(item).asJava)).asJava)
    val schemaBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val ch = new org.apache.arrow.vector.ipc.WriteChannel(
        java.nio.channels.Channels.newChannel(baos))
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, schema)
      baos.toByteArray
    }
    val metaBytes = cat(u64(1), u64(8L), u64(1), u64(page.length), u64(reps.size))
    cat("ARROW2".getBytes("UTF-8"), Array[Byte](0, 0), page,
      schemaBytes, metaBytes, u32(schemaBytes.length), u32(metaBytes.length),
      Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
  }

  test("nested list column imports and migrates to graft") {
    val dir = "/tmp/graft-test/straw-import-nested"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/n.str"), nestedFixture())
    val df = GraftImport.read(spark, dir)
    val got = df.collect().map(r => Option(r.getSeq[Any](0)).map(_.toList).orNull).toSeq
    assert(got == Seq(List(0, 10), List(), null, List(7, null), List(42)))
    val dest = "/tmp/graft-test/straw-import-nested-graft"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dest))
    assert(GraftImport.toGraft(spark, dir, dest) == 5L)
    val g = spark.read.format("graft").load(dest)
    val got2 = g.collect().map(r => Option(r.getSeq[Any](0)).map(_.toList).orNull).toSeq
    assert(got2.toSet == got.toSet)
  }

  test("schema drift across a directory fails loudly, not as garbage rows") {
    val dir = "/tmp/graft-test/straw-import-drift"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.str"),
      fixture(Seq(1L, 2L), Seq("x", "y")))
    // same arity, different column names/types order: (s utf8, k i64)
    import graft.format.StrawboatExport
    import org.apache.spark.sql.types._
    val drifted = StrawboatExport.encodeFile(
      StructType(Seq(StructField("s", StringType, nullable = false),
        StructField("k", LongType, nullable = false))),
      Seq(org.apache.spark.sql.Row("z", 9L)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.str"), drifted)
    val e = intercept[Exception] { GraftImport.read(spark, dir).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("drifts")), s"got: ${messages(e)}")
  }

  test("directory import is distributed per file and migrates to graft") {
    val dir = "/tmp/graft-test/straw-import"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    // 3 reference files + 1 non-strawboat file that must be skipped
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.str"),
      fixture(0L until 10L, (0 until 10).map(i => s"a$i")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.str"),
      fixture(10L until 25L, (10 until 25).map(i => s"b$i")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.str"),
      fixture(25L until 30L, (25 until 30).map(i => s"c$i")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/readme.txt"),
      "this is not an ARROW2 file, just long enough to probe".getBytes)

    assert(GraftImport.listStrawboatFiles(spark, dir).size == 3)
    val df = GraftImport.read(spark, dir)
    assert(df.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(df.count() == 30)
    assert(df.agg(org.apache.spark.sql.functions.sum("k")).head().getLong(0) ==
      (0L until 30L).sum)

    val dest = "/tmp/graft-test/straw-import-graft"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dest))
    assert(GraftImport.toGraft(spark, dir, dest) == 30L)
    val g = spark.read.format("graft").load(dest)
    assert(g.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      (0 until 30).map(i => (i.toLong,
        (if (i < 10) "a" else if (i < 25) "b" else "c") + i)))
  }
}
