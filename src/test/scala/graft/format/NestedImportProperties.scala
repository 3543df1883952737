package graft.format

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import scala.jdk.CollectionConverters._

/** Property round-trip for the NESTED reference-layout importer: random
  * nested schemas (lists/structs over int/string, every nullable combo)
  * and random values are shredded into rep/def level streams by an
  * INDEPENDENT write-side Dremel implementation (the classic algorithm:
  * ancestors' def budget + per-list rep depth), encoded into
  * reference-layout page bytes, and must reassemble to the original
  * values through `StrawboatImport.decodeFile`. The encoder is the
  * inverse algorithm, not a mirror of the decoder's bookkeeping — a
  * misreading of the level semantics fails loudly here.
  */
object NestedImportProperties extends Properties("graft.format.nestedImport") {

  // ------------------------------------------------------------- grammar

  private sealed trait GNode { def nullable: Boolean }
  private final case class GPrim(nullable: Boolean, isString: Boolean) extends GNode
  private final case class GList(nullable: Boolean, child: GNode) extends GNode
  private final case class GStruct(nullable: Boolean, children: List[GNode]) extends GNode

  private def genNode(depth: Int): Gen[GNode] =
    if (depth <= 0) genPrim
    else Gen.frequency(
      2 -> genPrim,
      3 -> (for { nl <- Gen.oneOf(true, false); c <- genNode(depth - 1) } yield GList(nl, c)),
      2 -> (for {
        nl <- Gen.oneOf(true, false)
        n <- Gen.choose(1, 3)
        cs <- Gen.listOfN(n, genNode(depth - 1))
      } yield GStruct(nl, cs)))

  private def genPrim: Gen[GNode] =
    for { nl <- Gen.oneOf(true, false); s <- Gen.oneOf(true, false) } yield GPrim(nl, s)

  /** top field must be nested (flat columns take the non-level path) */
  private val genTop: Gen[GNode] = Gen.oneOf(
    for { nl <- Gen.oneOf(true, false); c <- genNode(2) } yield GList(nl, c),
    for {
      nl <- Gen.oneOf(true, false)
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, genNode(2))
    } yield GStruct(nl, cs))

  private def genValue(node: GNode): Gen[Any] = node match {
    case GPrim(nullable, isString) =>
      val v: Gen[Any] =
        if (isString) Gen.alphaStr.map(_.take(4)) else Gen.choose(-1000, 1000)
      if (nullable) Gen.frequency(3 -> v, 1 -> Gen.const(null)) else v
    case GList(nullable, child) =>
      val lst: Gen[Any] =
        Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genValue(child)))
      if (nullable) Gen.frequency(3 -> lst, 1 -> Gen.const(null)) else lst
    case GStruct(nullable, children) =>
      val st: Gen[Any] = Gen.sequence[Vector[Any], Any](children.map(genValue))
      if (nullable) Gen.frequency(3 -> st, 1 -> Gen.const(null)) else st
  }

  // --------------------------------------------------- write-side shredder

  private final class LeafBuf(val field: GPrim) {
    val reps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val defs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val slots = scala.collection.mutable.ArrayBuffer.empty[Any]
  }

  private def leavesOf(n: GNode): List[GPrim] = n match {
    case p: GPrim => List(p)
    case GList(_, c) => leavesOf(c)
    case GStruct(_, cs) => cs.flatMap(leavesOf)
  }

  /** classic Dremel shred: `r` is the rep level for this occurrence's
    * first entries, `d` the def budget consumed by defined ancestors,
    * `listDepth` the number of list ancestors (rep level of repeats).
    */
  private def shred(node: GNode, v: Any, bufs: List[LeafBuf], r: Int, d: Int,
      listDepth: Int): Unit = node match {
    case GPrim(nullable, isString) =>
      val b = bufs.head
      b.reps += r
      if (v == null) {
        require(nullable)
        b.defs += d
        b.slots += (if (isString) "GARBAGE" else Int.MaxValue) // masked
      } else {
        b.defs += d + (if (nullable) 1 else 0)
        b.slots += v
      }
    case GStruct(nullable, children) =>
      if (v == null) {
        require(nullable)
        bufs.foreach { b => b.reps += r; b.defs += d } // no slots below
      } else {
        val d2 = d + (if (nullable) 1 else 0)
        var off = bufs
        children.zip(v.asInstanceOf[Vector[Any]]).foreach { case (c, cv) =>
          val n = leavesOf(c).size
          shred(c, cv, off.take(n), r, d2, listDepth)
          off = off.drop(n)
        }
      }
    case GList(nullable, child) =>
      val dPresent = d + (if (nullable) 1 else 0)
      if (v == null) {
        require(nullable)
        bufs.foreach { b => b.reps += r; b.defs += d }
      } else {
        val elems = v.asInstanceOf[List[Any]]
        if (elems.isEmpty) bufs.foreach { b => b.reps += r; b.defs += dPresent }
        else elems.zipWithIndex.foreach { case (e, i) =>
          shred(child, e, bufs, if (i == 0) r else listDepth + 1, dPresent + 1,
            listDepth + 1)
        }
      }
  }

  // ------------------------------------------------------- byte assembly

  private def u32(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(v.toInt); b.array()
  }
  private def u64(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
  private def noneBlock(raw: Array[Byte]): Array[Byte] =
    cat(Array(0.toByte), u32(raw.length), u32(raw.length), raw)

  private def encodeLevels(vals: Seq[Int], maxLevel: Int, rle: Boolean): Array[Byte] = {
    if (maxLevel == 0) return Array.empty
    val width = 32 - Integer.numberOfLeadingZeros(maxLevel)
    val out = Array.newBuilder[Byte]
    if (rle) {
      var i = 0
      while (i < vals.size) {
        var j = i
        while (j < vals.size && vals(j) == vals(i) && j - i < 63) j += 1
        out += ((j - i) << 1).toByte
        out += vals(i).toByte
        i = j
      }
    } else {
      val groups = (vals.size + 7) / 8
      require(groups < 64)
      out += ((groups << 1) | 1).toByte
      (0 until groups).foreach { g =>
        var acc = 0L
        (0 until 8).foreach { k =>
          if (g * 8 + k < vals.size) acc |= vals(g * 8 + k).toLong << (k * width)
        }
        (0 until width).foreach(b => out += ((acc >>> (8 * b)) & 0xff).toByte)
      }
    }
    out.result()
  }

  private def leafBlock(p: GPrim, slots: Seq[Any]): Array[Byte] =
    if (p.isString) {
      val strs = slots.map(_.asInstanceOf[String])
      val offs = strs.scanLeft(0L)((a, s) => a + s.getBytes("UTF-8").length)
      val offRaw = {
        val b = java.nio.ByteBuffer.allocate(4 * offs.size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        offs.foreach(o => b.putInt(o.toInt)); b.array()
      }
      cat(noneBlock(offRaw), noneBlock(strs.mkString.getBytes("UTF-8")))
    } else {
      val b = java.nio.ByteBuffer.allocate(4 * slots.size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      slots.foreach(v => b.putInt(v.asInstanceOf[Int]))
      noneBlock(b.array())
    }

  private def arrowField(name: String, n: GNode): Field = n match {
    case GPrim(nl, s) =>
      val t: ArrowType = if (s) ArrowType.Utf8.INSTANCE else new ArrowType.Int(32, true)
      new Field(name, if (nl) FieldType.nullable(t) else FieldType.notNullable(t), null)
    case GList(nl, c) =>
      new Field(name,
        if (nl) FieldType.nullable(ArrowType.List.INSTANCE)
        else FieldType.notNullable(ArrowType.List.INSTANCE),
        Seq(arrowField("item", c)).asJava)
    case GStruct(nl, cs) =>
      new Field(name,
        if (nl) FieldType.nullable(ArrowType.Struct.INSTANCE)
        else FieldType.notNullable(ArrowType.Struct.INSTANCE),
        cs.zipWithIndex.map { case (c, i) => arrowField(s"c$i", c) }.asJava)
  }

  /** (def budget before leaf, list depth) per leaf, independent walk */
  private def budgets(n: GNode, d: Int, r: Int): List[(Int, Int)] = n match {
    case p: GPrim => List((d, r))
    case GList(nl, c) => budgets(c, d + (if (nl) 2 else 1), r + 1)
    case GStruct(nl, cs) =>
      val d2 = d + (if (nl) 1 else 0)
      cs.flatMap(budgets(_, d2, r))
  }

  private def expected(node: GNode, v: Any): Any = node match {
    case _: GPrim => v
    case GList(_, c) =>
      if (v == null) null else v.asInstanceOf[List[Any]].map(expected(c, _))
    case GStruct(_, cs) =>
      if (v == null) null
      else org.apache.spark.sql.Row.fromSeq(
        cs.zip(v.asInstanceOf[Vector[Any]]).map { case (c, cv) => expected(c, cv) })
  }

  private final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
    def length: Long = bytes.length
    def readFully(pos: Long, dst: Array[Byte], off: Int, len: Int): Unit =
      System.arraycopy(bytes, pos.toInt, dst, off, len)
    def close(): Unit = ()
  }

  // ------------------------------------------------------------ property

  private val genCase = for {
    top <- genTop
    nRows <- Gen.choose(1, 10)
    rows <- Gen.listOfN(nRows, genValue(top))
    pageSplit <- Gen.choose(1, nRows)
    rleReps <- Gen.oneOf(true, false)
    rleDefs <- Gen.oneOf(true, false)
  } yield (top, rows, pageSplit, rleReps, rleDefs)

  property("shred -> encode -> decodeFile reassembles the original rows") =
    Prop.forAll(genCase) { case (top, rows, pageSplit, rleReps, rleDefs) =>
      val leaves = leavesOf(top)
      val bgs = budgets(top, 0, 0)
      // shred page by page (pages split at row boundaries, like the writer)
      val pagesOfRows = rows.grouped(pageSplit).toList
      val perLeafPages: Seq[scala.collection.mutable.ArrayBuffer[(Array[Byte], Int)]] =
        leaves.map(_ => scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Int)])
      pagesOfRows.foreach { pageRows =>
        val bufs = leaves.map(new LeafBuf(_))
        pageRows.foreach(r => shred(top, r, bufs, 0, 0, 0))
        bufs.zipWithIndex.foreach { case (b, li) =>
          val (defBefore, maxRep) = bgs(li)
          val maxDef = defBefore + (if (b.field.nullable) 1 else 0)
          val page = cat(
            u32(pageRows.size),
            {
              val repB = encodeLevels(b.reps.toSeq, maxRep, rleReps)
              val defB = encodeLevels(b.defs.toSeq, maxDef, rleDefs)
              cat(u32(repB.length), u32(defB.length), repB, defB)
            },
            leafBlock(b.field, b.slots.toSeq))
          perLeafPages(li) += ((page, b.reps.size))
        }
      }
      // assemble the file
      val body = new java.io.ByteArrayOutputStream()
      val metas = perLeafPages.map { pages =>
        val off = 8L + body.size()
        pages.foreach(p => body.write(p._1))
        (off, pages.map { case (bytes, n) => (bytes.length.toLong, n.toLong) })
      }
      val schema = new Schema(Seq(arrowField("t", top)).asJava)
      val schemaBytes = {
        val baos = new java.io.ByteArrayOutputStream()
        val ch = new org.apache.arrow.vector.ipc.WriteChannel(
          java.nio.channels.Channels.newChannel(baos))
        org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, schema)
        baos.toByteArray
      }
      val metaBytes = {
        val mb = new java.io.ByteArrayOutputStream()
        mb.write(u64(metas.size))
        metas.foreach { case (off, pages) =>
          mb.write(u64(off)); mb.write(u64(pages.size))
          pages.foreach { case (len, n) => mb.write(u64(len)); mb.write(u64(n)) }
        }
        mb.toByteArray
      }
      val file = cat("ARROW2".getBytes("UTF-8"), Array[Byte](0, 0), body.toByteArray,
        schemaBytes, metaBytes, u32(schemaBytes.length), u32(metaBytes.length),
        Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))

      val (_, got) = StrawboatImport.decodeFile(new BytesInput(file))
      val want = rows.map(expected(top, _))
      val ok = got.size == want.size &&
        got.zip(want).forall { case (g, w) => g(0) == w }
      if (!ok) println(s"MISMATCH top=$top\nwant=$want\ngot =${got.map(_(0))}")
      ok
    }
}
