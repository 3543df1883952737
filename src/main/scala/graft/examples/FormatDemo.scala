package graft.examples

import graft.format._
import java.nio.file.{Files, Paths}

/** End-to-end demo of the format core through its public API
  * (analogue of the reference's `examples/strawboat_{write,read}.rs`):
  * writes a small columnar file, reads footer + columns back, prints
  * page-level stats, and exercises the error paths.
  */
object FormatDemo {
  def main(args: Array[String]): Unit = {
    val path = Files.createTempFile("graft-demo", ".graft")

    // --- write ---
    val n = 10
    val ids = LongVec(n, null, Array.tabulate(n)(_.toLong * 100))
    val prices = DoubleVec(n, Array.tabulate(n)(_ % 4 == 3), Array.tabulate(n)(i => i * 1.5))
    val names = {
      val b = new BinaryVecBuilder()
      (0 until n).foreach(i => b.append(s"row-$i".getBytes("UTF-8")))
      b.result()
    }
    val os = new java.io.BufferedOutputStream(Files.newOutputStream(path))
    val w = new GraftFileWriter(os, """{"cols":["id","price","name"]}""", WriteOptions(pageSize = 4))
    w.start()
    w.writeChunk(Seq(
      LeafCol(Lane.I64, nullable = false, ids),
      LeafCol(Lane.F64, nullable = true, prices),
      LeafCol(Lane.Bin, nullable = false, names)), n)
    w.finish()
    os.close()
    println(s"wrote ${Files.size(path)} bytes, ${w.metas.length} leaves")

    // --- read ---
    val in = new LocalFileInput(path)
    val footer = GraftFileReader.readFooter(in)
    println(s"schema: ${footer.schemaJson}")
    footer.leaves.zipWithIndex.foreach { case (cm, i) =>
      val pg = cm.pages.map(p => s"(len=${p.length} n=${p.numValues} stats=${p.statsKind}:${p.minLong}..${p.maxLong})").mkString(" ")
      println(s"leaf $i offset=${cm.offset} pages: $pg")
    }
    val idsBack = new LeafReader(in, footer.leaves(0), Lane.I64, nullable = false).readAll().asInstanceOf[LongVec]
    val pricesBack = new LeafReader(in, footer.leaves(1), Lane.F64, nullable = true).readAll().asInstanceOf[DoubleVec]
    val namesBack = new LeafReader(in, footer.leaves(2), Lane.Bin, nullable = false).readAll().asInstanceOf[BinaryVec]
    (0 until n).foreach { i =>
      val p = if (pricesBack.isNull(i)) "NULL" else pricesBack.values(i).toString
      println(s"row $i: id=${idsBack.values(i)} price=$p name=${new String(namesBack(i), "UTF-8")}")
    }
    in.close()

    // --- probe: not a graft file ---
    val bogus = Files.createTempFile("bogus", ".bin")
    Files.write(bogus, Array.fill[Byte](64)(7))
    try {
      GraftFileReader.readFooter(new LocalFileInput(bogus))
      println("probe bogus-file: NO ERROR (bad)")
    } catch {
      case e: Exception => println(s"probe bogus-file: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

    // --- probe: truncated file ---
    val trunc = Files.createTempFile("trunc", ".graft")
    val all = Files.readAllBytes(path)
    Files.write(trunc, java.util.Arrays.copyOf(all, all.length / 2))
    try {
      GraftFileReader.readFooter(new LocalFileInput(trunc))
      println("probe truncated-file: NO ERROR (bad)")
    } catch {
      case e: Exception => println(s"probe truncated-file: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

    Files.deleteIfExists(path)
    Files.deleteIfExists(bogus)
    Files.deleteIfExists(trunc)
  }
}
