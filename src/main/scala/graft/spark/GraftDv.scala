package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.roaringbitmap.RoaringBitmap

/** Merge-on-read DELETION VECTORS: an opt-in per-file bitmap of deleted row
  * ordinals, so a 1-row takedown in a 1 GB file masks one row instead of
  * rewriting a gigabyte ([[GraftMaintenance.deleteWhereDv]]). Sidecars live
  * under `<table>/_graft_dv/` as `<ident>.g<gen>-<uuid>.dv`:
  *
  *   - `ident` injectively names the data file (sanitized relative path +
  *     a 6-byte digest of the unsanitized one — two partition values that
  *     sanitize identically must never share a bitmap);
  *   - `gen` increments per publish; readers take the highest generation
  *     (a crash between publish and old-gen cleanup leaves both visible —
  *     the NEW one wins, and the next publish sweeps);
  *   - the bitmap is CUMULATIVE (each publish ORs into the previous), so
  *     one lookup serves a scan.
  *
  * Scan semantics: masking happens by file-physical ordinal — COLUMNAR
  * with per-type batch compaction for atomic projections ([[DvMask]]),
  * row-based iterator skip for nested ones (Spark forbids mixing columnar
  * and row partitions, and the decision is projection-uniform);
  * footer-only row counts subtract DV cardinalities;
  * footer-only COUNT(col)/MIN/MAX pushdowns decline (a masked row could
  * hold the min); COUNT(*) stays footer-exact by subtracting the mask
  * cardinality at plan time, and limit/top-N pushdowns survive by
  * inflating each file's page cover by its cardinality. Compaction and
  * the row-level rewrites fold DVs away: they read through the scan (mask
  * applied), and retiring a data file drops its sidecars.
  *
  * The existence probe is one `fs.exists` on the `_graft_dv` dir — a table
  * that never used DVs pays nothing else anywhere.
  *
  * Snapshot posture: scans apply the CURRENT deletion vectors regardless
  * of `asof`/VERSION AS OF pins — the same posture as the copy-on-write
  * deletes (whose rewrites retire the files older snapshots would need).
  * A delete is a takedown: the row must be gone from every future read,
  * including time-travel reads; reconstructing pre-delete snapshots is
  * explicitly not a goal of either delete path.
  */
object GraftDv {
  val DirName = "_graft_dv"

  /** Metadata column: the physical row ordinal within the data file —
    * what a DV masks on, exposed so the delete op (and any lineage user)
    * can name rows without content hashing. */
  val OrdinalCol = "_graft_ordinal"

  def dir(tableDir: Path): Path = new Path(tableDir, DirName)

  /** Injective per-data-file identity: sanitized partition segments + base
    * name, plus a digest of the raw relative path (sanitization is lossy). */
  def identOf(tableDir: Path, file: Path): String = {
    val segs = GraftUtil.partitionSegments(tableDir, file)
    val rel = (segs.map { case (k, v) => s"$k=$v" } :+ file.getName).mkString("/")
    val clean = rel.replace('/', '~').replaceAll("[^a-zA-Z0-9_.=~-]", "_")
    s"$clean-${GraftManifest.md5Hex(rel, 6)}"
  }

  /** The table root of a data file: parents above any k=v partition dirs. */
  def tableRootOf(file: Path): Path = {
    var d = file.getParent
    while (d.getParent != null && d.getName.contains('=')) d = d.getParent
    d
  }

  /** Table root for a SCAN path, which may be the table dir, a partition
    * subdir, or a single data file (the per-file rewrite reads load one
    * file directly — its deletion vectors still live at the table root). */
  def rootOfScanPath(fs: FileSystem, p: Path): Path = {
    val isFile = try fs.getFileStatus(p).isFile catch { case _: Exception => false }
    var root = if (isFile) p.getParent else p
    while (root.getParent != null && root.getName.contains('=')) root = root.getParent
    root
  }

  private val NamePat = raw"(.+)\.g(\d{5})-[0-9a-f]{8}\.dv".r

  /** Current sidecars: ident -> (gen, qualified sidecar path). One listing;
    * highest generation per ident wins (name-lexicographic tiebreak). */
  def list(fs: FileSystem, tableDir: Path): Map[String, (Int, String)] = {
    val d = dir(tableDir)
    if (!fs.exists(d)) return Map.empty
    fs.listStatus(d).toSeq.flatMap { f =>
      f.getPath.getName match {
        case NamePat(ident, gen) =>
          Some((ident, gen.toInt, fs.makeQualified(f.getPath).toString))
        case _ => None
      }
    }.groupBy(_._1).map { case (ident, vs) =>
      val best = vs.maxBy(v => (v._2, v._3))
      ident -> ((best._2, best._3))
    }
  }

  /** The ident a sidecar name encodes (None for non-sidecar entries). */
  def identOfSidecar(name: String): Option[String] = name match {
    case NamePat(ident, _) => Some(ident)
    case _ => None
  }

  def hasAny(fs: FileSystem, tableDir: Path): Boolean = {
    val d = dir(tableDir)
    fs.exists(d) && fs.listStatus(d).exists(_.getPath.getName.endsWith(".dv"))
  }

  // sidecar names embed a uuid and are never rewritten -> cache by path.
  // Bounded: DVs are transient (compaction folds them), 256 is generous.
  private val cache = new java.util.LinkedHashMap[String, RoaringBitmap](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, RoaringBitmap]): Boolean =
      size() > 256
  }

  private val Magic = 0x47445631 // "GDV1"

  def read(fs: FileSystem, path: String): RoaringBitmap = {
    cache.synchronized {
      val hit = cache.get(path)
      if (hit != null) return hit
    }
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(new Path(path)), 1 << 16))
    val rb = try {
      require(in.readInt() == Magic, s"graft: $path is not a deletion-vector sidecar")
      in.readLong() // cardinality (informational; bitmap is authoritative)
      val b = new RoaringBitmap()
      b.deserialize(in)
      b
    } finally in.close()
    cache.synchronized { cache.put(path, rb) }
    rb
  }

  def cardinality(fs: FileSystem, path: String): Long = read(fs, path).getLongCardinality

  /** Publish `bitmap` (already cumulative) as generation `gen`; sweeps
    * lower generations of the same ident AFTER the new one is visible. */
  def publish(fs: FileSystem, tableDir: Path, ident: String, gen: Int,
      bitmap: RoaringBitmap): Unit = {
    val d = dir(tableDir)
    fs.mkdirs(d)
    val name = f"$ident.g$gen%05d-${java.util.UUID.randomUUID().toString.take(8)}.dv"
    val tmp = new Path(d, s".$name.tmp")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16))
    try {
      out.writeInt(Magic)
      out.writeLong(bitmap.getLongCardinality)
      bitmap.runOptimize()
      bitmap.serialize(out)
    } finally out.close()
    if (!fs.rename(tmp, new Path(d, name)))
      throw new java.io.IOException(s"graft: failed to publish deletion vector $name")
    // retire superseded generations (best effort; readers take max gen)
    fs.listStatus(d).foreach { f =>
      f.getPath.getName match {
        case NamePat(i, g) if i == ident && g.toInt < gen =>
          fs.delete(f.getPath, false)
        case _ => ()
      }
    }
  }

  /** Drop every sidecar of a retired data file (rewrites/compaction). */
  def dropFor(fs: FileSystem, tableDir: Path, file: Path): Unit = {
    val d = dir(tableDir)
    if (!fs.exists(d)) return
    val ident = identOf(tableDir, file)
    fs.listStatus(d).foreach { f =>
      f.getPath.getName match {
        case NamePat(i, _) if i == ident => fs.delete(f.getPath, false)
        case _ => ()
      }
    }
  }

  /** Total masked rows across `files` — the correction [[GraftScan.rowCount]]
    * applies. Zero-cost when no table involved carries a `_graft_dv` dir. */
  def maskedRows(files: Seq[org.apache.hadoop.fs.FileStatus],
      conf: org.apache.hadoop.conf.Configuration): Long = {
    if (files.isEmpty) return 0L
    files.groupBy(f => tableRootOf(f.getPath)).map { case (root, fsOfRoot) =>
      val fsys = root.getFileSystem(conf)
      if (!fsys.exists(dir(root))) 0L
      else {
        val dvs = list(fsys, root)
        if (dvs.isEmpty) 0L
        else fsOfRoot.map { f =>
          dvs.get(identOf(root, f.getPath))
            .map(d => cardinality(fsys, d._2)).getOrElse(0L)
        }.sum
      }
    }.sum
  }
}
