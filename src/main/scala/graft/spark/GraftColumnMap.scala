package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.StructType

/** Metadata-only `ALTER TABLE DROP COLUMN` / `RENAME COLUMN` for immutable
  * data files — an Iceberg-style name-mapping layer, re-expressed for the
  * graft layout (reference scope note: the reference is a file-format
  * library with no ALTER surface at all; this is catalog-level machinery
  * the Spark integration owns).
  *
  * Data files never rewrite. A sidecar (`_graft_columns.json`, beside the
  * schema sidecar) records, per LOGICAL top-level column, the historical
  * PHYSICAL names its data may carry in file footers, plus the set of
  * dropped physical names:
  *
  *   - RENAME a -> b: every file written while the column was named `a`
  *     keeps `a` in its footer; the mapping records `a` as an alias of
  *     logical `b`. Files written after the rename carry `b` directly.
  *     Every reader resolves a requested logical column against a file by
  *     its logical name OR any alias — so mixed-generation directories
  *     read seamlessly, and rewrites (compaction, row-level DML) migrate
  *     files to the logical name as a side effect.
  *   - DROP a: `a` and all its aliases land in the dropped set; the
  *     column vanishes from the table schema, its bytes stay in old files
  *     but are never again resolvable (the scan never fetches unprojected
  *     leaves, so dropped data costs no read IO either).
  *
  * NAME REUSE IS BARRED: a dropped or aliased physical name can never be
  * re-introduced by ADD COLUMN or RENAME (case-insensitive). This is what
  * makes name-based per-file resolution sound without Iceberg's field-ids
  * — old bytes under a reused name could otherwise resurrect into a new
  * logical column. The rejection message points at CREATE TABLE AS SELECT
  * for the rare migration that truly needs the name back.
  *
  * The sidecar is read by the PATH reader too (`spark.read.format("graft")`
  * on the table dir — and, for the single-file reads the maintenance
  * rewrites use, discovered by walking up past `k=v` partition segments),
  * so catalog users and path users keep seeing the same table — the
  * catalog's standing invariant.
  *
  * Scale note: one tiny JSON read per scan PLAN (driver-side, cached by
  * the planning path's own structures), zero per-row or per-page cost —
  * the per-file rename of footer schemas touches only the name strings of
  * a parsed StructType.
  */
object GraftColumnMap {
  val Name = "_graft_columns.json"

  /** `aliases`: logical column name -> physical names its data may carry
    * in file footers (the logical name itself is implicit). `dropped`:
    * physical names (and former logical names) that no longer resolve.
    */
  final case class Mapping(aliases: Map[String, Seq[String]], dropped: Seq[String]) {
    /** physical(lower) -> logical, the direction per-file resolution needs */
    lazy val physToLogical: Map[String, String] = aliases.flatMap {
      case (logical, phys) => phys.map(p => p.toLowerCase -> logical)
    }
    lazy val droppedLower: Set[String] = dropped.map(_.toLowerCase).toSet
    /** every name (case-folded) that may still label bytes in some file —
      * current logical names are NOT included (callers check the schema) */
    def occupiedLower: Set[String] =
      droppedLower ++ aliases.valuesIterator.flatten.map(_.toLowerCase)
    def isEmpty: Boolean = aliases.isEmpty && dropped.isEmpty

    /** A FILE footer schema re-labeled to logical names: aliased fields
      * rename (leaf order untouched — every index into the footer stays
      * valid), dropped fields keep their physical name (they are never
      * requested; reuse is barred, so no requested name can collide).
      */
    def applyToFileSchema(fileSchema: StructType): StructType =
      renameSchema(fileSchema, physToLogical)

    /** The TABLE schema view of an inferred footer schema: aliased fields
      * rename, dropped fields disappear. */
    def applyToTableSchema(inferred: StructType): StructType =
      StructType(applyToFileSchema(inferred).fields
        .filterNot(f => droppedLower.contains(f.name.toLowerCase)))
  }

  val Empty: Mapping = Mapping(Map.empty, Seq.empty)

  /** Re-label a file footer schema's top-level fields to logical names —
    * the executor-side form (takes the plain serialized physical->logical
    * map; leaf order and count untouched). */
  def renameSchema(fileSchema: StructType,
      physToLogical: Map[String, String]): StructType =
    if (physToLogical.isEmpty) fileSchema
    else StructType(fileSchema.fields.map { f =>
      physToLogical.get(f.name.toLowerCase) match {
        case Some(logical) if logical != f.name => f.copy(name = logical)
        case _ => f
      }
    })

  // ---- sidecar IO (same tmp+rename pattern as the schema sidecar) ----

  private def sidecar(tableDir: Path): Path = new Path(tableDir, Name)

  /** Newest crash-window tmp of an interrupted publish, if any — the same
    * recoverability pattern as the schema sidecar: losing the mapping
    * silently resurrects dropped columns and reverts renames, and unlike
    * the schema it is NOT reconstructible from footers. */
  private def sidecarTmp(fs: FileSystem, tableDir: Path): Option[Path] =
    if (!fs.exists(tableDir)) None
    else fs.listStatus(tableDir)
      .filter(f => f.isFile && f.getPath.getName.startsWith(s".$Name.") &&
        f.getPath.getName.endsWith(".tmp"))
      .sortBy(-_.getModificationTime)
      .headOption.map(_.getPath)

  def read(fs: FileSystem, tableDir: Path): Mapping = {
    val main = sidecar(tableDir)
    val p =
      if (fs.exists(main)) main
      else sidecarTmp(fs, tableDir) match {
        case Some(tmp) =>
          // finish the interrupted delete->rename publish (best effort; a
          // concurrent reader may win the promotion — re-check)
          if (fs.rename(tmp, main) || fs.exists(main)) main else tmp
        case None => return Empty
      }
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    parse(json)
  }

  def write(fs: FileSystem, tableDir: Path, m: Mapping): Unit = {
    val tmp = new Path(tableDir,
      s".$Name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(render(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // delete->rename is not atomic; the crash window is covered by the tmp
    // promotion in read() (the tmp IS the mapping until the rename lands).
    // Stale tmps from long-dead publishes are cleared age-gated AFTER this
    // publish is durable, so sidecarTmp can never resurrect an older one.
    fs.delete(sidecar(tableDir), false)
    if (!fs.rename(tmp, sidecar(tableDir)) && !fs.exists(sidecar(tableDir)))
      throw new java.io.IOException(
        s"graft: failed to publish column mapping at ${sidecar(tableDir)}")
    val cutoff = System.currentTimeMillis() - 60 * 1000L
    fs.listStatus(tableDir)
      .filter(f => f.isFile && f.getPath.getName.startsWith(s".$Name.") &&
        f.getPath.getName.endsWith(".tmp") && f.getModificationTime < cutoff)
      .foreach(f => fs.delete(f.getPath, false))
  }

  /** Mapping governing a read of `loadPath` — the path itself when it is a
    * table directory, or (for the single-FILE reads the maintenance
    * rewrites use) the owning table dir found by walking up past `k=v`
    * hive partition segments. A directory that CARRIES a mapping wins
    * before any walk-up, so a table whose own dir name contains '='
    * (`/data/ds=v1` used directly as a table path) still reads its own
    * sidecar.
    */
  def forRead(fs: FileSystem, loadPath: Path): Mapping = {
    val start =
      if (loadPath.getName.endsWith(GraftUtil.Extension)) loadPath.getParent
      else loadPath
    var d = start
    while (d != null) {
      if (fs.exists(sidecar(d)) || sidecarTmp(fs, d).nonEmpty) return read(fs, d)
      if (!d.getName.contains("=")) return Empty
      d = d.getParent
    }
    Empty
  }

  // ---- minimal hand-rolled JSON (names JSON-escaped; no deps) ----

  private def esc(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private[spark] def render(m: Mapping): String = {
    val al = m.aliases.toSeq.sortBy(_._1).map { case (l, ps) =>
      s"${esc(l)}:[${ps.map(esc).mkString(",")}]"
    }.mkString(",")
    s"""{"aliases":{$al},"dropped":[${m.dropped.map(esc).mkString(",")}]}"""
  }

  /** Parser for exactly the shape `render` emits (and hand-edited
    * equivalents): string values with standard JSON escapes. Any
    * structural damage (truncation, unterminated strings) surfaces as the
    * malformed-file diagnostic naming the sidecar, never a raw index
    * exception. */
  private[spark] def parse(json: String): Mapping =
    try parseImpl(json)
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"graft: malformed $Name (${e.getClass.getSimpleName}) — fix or remove the sidecar", e)
    }

  private def parseImpl(json: String): Mapping = {
    // tokenize strings + structural chars; whitespace-insensitive
    val toks = scala.collection.mutable.ArrayBuffer[Either[Char, String]]()
    var i = 0
    while (i < json.length) {
      json.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (json.charAt(i) != '"') {
            if (json.charAt(i) == '\\') {
              json.charAt(i + 1) match {
                case 'u' =>
                  sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                  i += 6
                case e => sb.append(e match {
                  case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                  case other => other
                }); i += 2
              }
            } else { sb.append(json.charAt(i)); i += 1 }
          }
          i += 1
          toks += Right(sb.toString)
        case c => toks += Left(c); i += 1
      }
    }
    // walk: {"aliases":{L:[p,...],...},"dropped":[d,...]}
    var aliases = Map.empty[String, Seq[String]]
    var dropped = Seq.empty[String]
    var t = 0
    def isCh(c: Char) = t < toks.length && toks(t) == Left(c)
    def expect(c: Char): Unit = {
      require(isCh(c), s"graft: malformed $Name (expected '$c')"); t += 1 }
    def str(): String = toks(t) match {
      case Right(s) => t += 1; s
      case _ => throw new IllegalArgumentException(s"graft: malformed $Name")
    }
    expect('{')
    while (!isCh('}')) {
      val key = str(); expect(':')
      key match {
        case "aliases" =>
          expect('{')
          while (!isCh('}')) {
            val logical = str(); expect(':'); expect('[')
            val ps = scala.collection.mutable.ArrayBuffer[String]()
            while (!isCh(']')) { ps += str(); if (isCh(',')) t += 1 }
            expect(']')
            aliases += logical -> ps.toSeq
            if (isCh(',')) t += 1
          }
          expect('}')
        case "dropped" =>
          expect('[')
          val ds = scala.collection.mutable.ArrayBuffer[String]()
          while (!isCh(']')) { ds += str(); if (isCh(',')) t += 1 }
          expect(']')
          dropped = ds.toSeq
        case other =>
          throw new IllegalArgumentException(s"graft: malformed $Name (key '$other')")
      }
      if (isCh(',')) t += 1
    }
    Mapping(aliases, dropped)
  }
}
