package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}

/** Sink-side commit manifest: every successful batch write publishes one
  * manifest file under `<table>/_graft_manifest/` listing the data files
  * (name + byte length) that commit added, via the same tmp+rename pattern
  * the data files use. The streaming source diffs manifests instead of
  * data-file modification times, so a data file whose rename lands
  * arbitrarily late still enters exactly one batch — its manifest entry is
  * published only AFTER the rename completes, stamped with the commit time.
  * (This is the FileStreamSink metadata-log pattern re-expressed for the
  * graft layout; batch readers never see the manifest — GraftUtil
  * .listDataFiles keeps only top-level `*.graft` files.)
  *
  * Manifest names are `<zero-padded epoch millis>-<uuid8>`, so the commit
  * timestamp is embedded in the name itself: visibility skew between two
  * manifests is bounded by one tiny-file rename (milliseconds), not by task
  * duration — which is what makes a small watermark window sound here where
  * it wasn't for data-file modTimes.
  */
object GraftManifest {
  val DirName = "_graft_manifest"

  def dir(tableDir: Path): Path = new Path(tableDir, DirName)

  /** Commit timestamp embedded in a manifest name. */
  def nameT(name: String): Long = name.takeWhile(_ != '-').toLong

  /** Suffix tag marking a HISTORY-RELISTING manifest (deleteWhere's
    * catch-up publish): it re-lists surviving files so a fresh stream's
    * backfill bound cannot drop them, but it is NOT a new commit — `since`
    * incremental windows and the CDC reader must treat its files as
    * pre-manifest history, or every delete would redeliver the kept rows
    * of the files it touched to downstream incremental consumers.
    */
  val CatchupTag = "catchup"

  def isCatchup(name: String): Boolean = {
    val i = name.indexOf('-')
    i >= 0 && name.substring(i + 1).startsWith(CatchupTag)
  }

  /** Suffix tag marking a REPLACEMENT manifest: published by the row-level
    * rewrite heal pass at the SAME embedded time as a commit manifest it
    * expires, listing that commit's surviving coverage (untouched files +
    * the rewrite outputs of its retired files). Replacements ARE commits
    * for `since`/`asof`/CDC reads — they preserve the original commit
    * time, so an incremental window spanning an append AND a delete of
    * part of that append still delivers the append's survivors (without
    * them the survivors fell to pre-manifest history and were silently
    * lost to any consumer that had not yet read the window). They are NOT
    * new versions (excluded from the version log — the logical commit is
    * already registered) and NOT new stream deliveries for consumers that
    * processed the original ([[GraftStreamSource]] ties them to the
    * original by commit time + base suffix). The name layout is
    * `<millis>-repl<8hex>-<baseSuffix>`: the trailing base suffix keeps
    * `endsWith("-<tag>")` lookups (merge's ins-tag idempotency) working
    * across replacement, and chains normalize — a replacement of a
    * replacement re-uses the ORIGINAL commit's suffix.
    */
  val ReplTagPrefix = "repl"
  private val ReplPat = java.util.regex.Pattern.compile("^repl[0-9a-f]{8}-.")

  private def suffixOf(name: String): String =
    name.substring(name.indexOf('-') + 1)

  def isReplacement(name: String): Boolean = {
    val i = name.indexOf('-')
    i >= 0 && ReplPat.matcher(name.substring(i + 1)).find()
  }

  /** The replaced commit's own suffix (chains normalize to the original). */
  def baseSuffix(name: String): String = {
    val s = suffixOf(name)
    if (isReplacement(name)) s.substring(ReplTagPrefix.length + 8 + 1) else s
  }

  /** Commit time of every file a COMMIT manifest lists (qualified path ->
    * the listing manifest's embedded millis). Catch-up manifests are
    * coverage, not commits, and are excluded; replacement manifests ARE
    * commits at the replaced commit's time. ONE definition shared by the
    * windowed read (GraftScan) and the CDC consumer's metadata row count —
    * the two deciding "what is in this window" from different code would
    * eventually disagree, and the consumer's fast path would silently skip
    * windows the scan delivers rows for.
    */
  def committedTimes(fs: FileSystem, tableDir: Path): Map[String, Long] =
    list(fs, tableDir).filterNot(isCatchup).flatMap { m =>
      val mt = nameT(m)
      read(fs, tableDir, m).map { case (name, _) =>
        fs.makeQualified(new Path(tableDir, name)).toString -> mt
      }
    }.toMap

  /** Effective commit time of each LISTED data file: the listing COMMIT
    * manifest's embedded millis ([[committedTimes]]), or — for an
    * in-flight/crashed rewrite's survivor output whose original is gone —
    * the time inherited through the marker-strip ancestor chain (exactly
    * what the replacement manifest will record once the heal publishes
    * it). `listed` is the twin-deduped view ([[GraftUtil.dedupTwins]]):
    * during a swap's publish window exactly ONE of (original, output) is
    * listed — the original until the rename lands, the output after — so
    * exactly one of them serves the commit's rows (the `listedSet` guard
    * keeps an output from ALSO inheriting while its original is the
    * listed one). Files in no manifest with no manifested ancestor are
    * pre-manifest history: ABSENT from the map.
    *
    * ONE definition shared by the snapshot/window scan ([[GraftScan]])
    * and [[GraftMaintenance.restore]] — two readings of "when did this
    * file commit" would let restore delete a file a window read still
    * serves, or keep one it doesn't.
    */
  def effectiveTimes(fs: FileSystem, tableDir: Path,
      listed: Seq[org.apache.hadoop.fs.FileStatus]): Map[String, Long] = {
    val committedAt = committedTimes(fs, tableDir)
    val listedSet = listed.map(f => f.getPath.toString).toSet
    val markerStrip = GraftUtil.markerStripRegex
    def inheritedT(f: org.apache.hadoop.fs.FileStatus): Option[Long] = {
      var nm = f.getPath.getName
      var found: Option[Long] = None
      var continue = true
      while (continue) {
        val stripped = markerStrip.replaceAllIn(nm, GraftUtil.Extension)
        if (stripped == nm) continue = false
        else {
          val orig = fs.makeQualified(
            new Path(f.getPath.getParent, stripped)).toString
          if (listedSet.contains(orig)) { found = None; continue = false }
          else committedAt.get(orig) match {
            case some @ Some(_) => found = some; continue = false
            case None => nm = stripped // chain: try the next ancestor
          }
        }
      }
      found
    }
    listed.flatMap { f =>
      committedAt.get(f.getPath.toString).orElse(inheritedT(f))
        .map(f.getPath.toString -> _)
    }.toMap
  }

  /** Truncated-MD5 hex fingerprint — the one definition behind the
    * deterministic tag/marker names (merge ins tags, rewrite markers, CDC
    * window tags) so the digest shape can never drift between them. */
  def md5Hex(rendered: String, bytes: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(bytes).map(b => f"$b%02x").mkString

  /** Fresh replacement name for an expired commit manifest: same embedded
    * time, unique infix, original base suffix. */
  def replacementNameFor(expired: String): String =
    f"${nameT(expired)}%013d-$ReplTagPrefix" +
      s"${java.util.UUID.randomUUID().toString.take(8)}-${baseSuffix(expired)}"

  /** `tag` overrides the random name suffix; the streaming sink passes a
    * deterministic `q<queryId>e<epoch>` tag so an epoch's manifest doubles
    * as its idempotency marker (a replayed epoch commit finds it by suffix
    * and skips re-publishing).
    */
  def publish(fs: FileSystem, tableDir: Path, entries: Seq[(String, Long)],
      tag: Option[String] = None): Unit = {
    val suffix = tag.getOrElse(java.util.UUID.randomUUID().toString.take(8))
    publishNamed(fs, tableDir, entries,
      f"${System.currentTimeMillis()}%013d-$suffix")
  }

  /** [[publish]] under a fully explicit name — the heal pass uses this to
    * re-publish an expired commit's surviving coverage at the ORIGINAL
    * commit time ([[replacementNameFor]]). */
  def publishNamed(fs: FileSystem, tableDir: Path, entries: Seq[(String, Long)],
      name: String): Unit = {
    if (entries.isEmpty) return
    val d = dir(tableDir)
    fs.mkdirs(d)
    val tmp = new Path(d, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.map { case (n, l) => s"$n\t$l" }.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(d, name)))
      throw new java.io.IOException(s"graft: failed to publish manifest $name")
  }

  /** Publish a ZERO-ENTRY manifest under `tag` — a durable commit marker
    * for an op that added no files but whose replay must still be
    * recognized (the CDC consumer's zero-append window: replaying an OLD
    * zero-append window after later windows re-appended overlapping keys
    * would re-run its deletes and permanently remove rows whose restoring
    * windows are themselves replay-blocked by their own tags). The marker
    * is a real commit: it registers a version ordinal (a no-op version —
    * addressable, resolves to the table state at its commit time) and so
    * survives compaction's manifest retirement through the version log,
    * exactly like a row-carrying tagged append.
    */
  def publishMarker(fs: FileSystem, tableDir: Path, tag: String): Unit = {
    val name = f"${System.currentTimeMillis()}%013d-$tag"
    val d = dir(tableDir)
    fs.mkdirs(d)
    val tmp = new Path(d, s".$name.tmp")
    fs.create(tmp, true).close() // zero entries: an empty manifest body
    if (!fs.rename(tmp, new Path(d, name)))
      throw new java.io.IOException(s"graft: failed to publish marker manifest $name")
  }

  /** Sorted names of all published manifests (chronological — the embedded
    * millis prefix is zero-padded). Only `<millis>-<suffix>` names qualify:
    * a stray file in the manifest dir (_SUCCESS, an editor artifact) must
    * be ignored, not crash every consumer of `nameT` with a parse error.
    */
  def list(fs: FileSystem, tableDir: Path): Seq[String] = {
    val d = dir(tableDir)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.collect {
      case f if f.isFile && {
        val n = f.getPath.getName
        !n.startsWith(".") && n.takeWhile(_ != '-').nonEmpty &&
          n.takeWhile(_ != '-').forall(_.isDigit)
      } => f.getPath.getName
    }.sorted
  }

  /** (data file name, byte length) entries of one manifest. */
  def read(fs: FileSystem, tableDir: Path, name: String): Seq[(String, Long)] = {
    val in = fs.open(new Path(dir(tableDir), name))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        .filter(_.nonEmpty).map { line =>
          val i = line.lastIndexOf('\t')
          (line.substring(0, i), line.substring(i + 1).toLong)
        }
    } finally in.close()
  }
}

/** Append-only commit-ordinal register (`_graft_manifest/_versions`): one
  * manifest name per line; `VERSION AS OF n` resolves through line `n`
  * (1-based), NOT through an index into the currently-surviving manifest
  * list — so manifest expiry (deleteWhere/updateWhere healing, compaction,
  * retention) leaves HOLES in the addressable history instead of silently
  * renumbering every later version. `sync` lazily adopts any live
  * non-catch-up manifest the log hasn't seen (in chronological name order,
  * appended after all existing entries — ordinals once assigned never
  * move), and every expiry path syncs BEFORE deleting, so a version is
  * registered before it can ever disappear. A version whose manifest has
  * expired resolves to a dedicated "expired" error, distinct from
  * out-of-range.
  */
object GraftVersionLog {
  val Name = "_versions"

  /** Lines starting with this are SENTINELS, not manifest names — a
    * truncating overwrite appends one so later readers can scope lookups
    * to the current data generation (the merge-insert idempotency check
    * must not treat a pre-truncate insert commit as already-applied: the
    * truncate wiped those rows). Sentinels are excluded from VERSION AS OF
    * ordinal numbering, so truncation never shifts version numbers. */
  val SentinelPrefix = "~"

  private def path(tableDir: Path) = new Path(GraftManifest.dir(tableDir), Name)

  /** Newest crash-window tmp of an interrupted writeAll — losing the log
    * silently renumbers every expired version and forgets merge-insert
    * commits, so the delete->rename window must be recoverable. */
  private def logTmp(fs: FileSystem, tableDir: Path): Option[Path] = {
    val d = GraftManifest.dir(tableDir)
    if (!fs.exists(d)) None
    else fs.listStatus(d)
      .filter(f => f.isFile && f.getPath.getName.startsWith(s".$Name.") &&
        f.getPath.getName.endsWith(".tmp"))
      .sortBy(-_.getModificationTime)
      .headOption.map(_.getPath)
  }

  /** Commit entries only (ordinal i+1 = entry i) — sentinels excluded. */
  def commits(log: Seq[String]): Seq[String] =
    log.filterNot(_.startsWith(SentinelPrefix))

  /** Entries of the CURRENT data generation: everything after the last
    * truncate sentinel (the whole log when none). */
  def currentGeneration(log: Seq[String]): Seq[String] = {
    val i = log.lastIndexWhere(_.startsWith(SentinelPrefix))
    commits(if (i < 0) log else log.drop(i + 1))
  }

  /** Record a generation boundary (call AFTER sync has registered the
    * outgoing generation's commits). */
  def appendSentinel(fs: FileSystem, tableDir: Path, tag: String): Unit = {
    val all = sync(fs, tableDir) :+ (SentinelPrefix + tag)
    writeAll(fs, tableDir, all)
  }

  private def writeAll(fs: FileSystem, tableDir: Path, all: Seq[String]): Unit = {
    val p = path(tableDir)
    val tmp = new Path(p.getParent,
      s".$Name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    fs.mkdirs(p.getParent)
    val out = fs.create(tmp, true)
    try out.write(all.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // delete->rename crash window covered by the tmp promotion in sync();
    // stale tmps cleared age-gated only after this publish is durable
    fs.delete(p, false)
    if (!fs.rename(tmp, p) && !fs.exists(p))
      throw new java.io.IOException(s"graft: failed to publish version log $p")
    val cutoff = System.currentTimeMillis() - 60 * 1000L
    fs.listStatus(p.getParent)
      .filter(f => f.isFile && f.getPath.getName.startsWith(s".$Name.") &&
        f.getPath.getName.endsWith(".tmp") && f.getModificationTime < cutoff)
      .foreach(f => fs.delete(f.getPath, false))
  }

  /** Ordinal-ordered log entries (manifest names + sentinels), after
    * adopting any live commits the log hasn't registered yet. */
  def sync(fs: FileSystem, tableDir: Path): Seq[String] = {
    val p0 = path(tableDir)
    val p =
      if (fs.exists(p0)) p0
      else logTmp(fs, tableDir) match {
        case Some(tmp) => // finish an interrupted publish (best effort)
          if (fs.rename(tmp, p0) || fs.exists(p0)) p0 else tmp
        case None => p0
      }
    val known: Seq[String] =
      if (!fs.exists(p)) Seq.empty
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          .filter(_.nonEmpty)
        finally in.close()
      }
    val knownSet = known.toSet
    // catch-up re-lists are coverage, not commits; replacement manifests
    // carry an ALREADY-REGISTERED commit (same embedded time, new name) —
    // registering either would mint phantom version ordinals
    val fresh = GraftManifest.list(fs, tableDir)
      .filterNot(GraftManifest.isCatchup)
      .filterNot(GraftManifest.isReplacement)
      .filterNot(knownSet.contains)
    if (fresh.isEmpty) known
    else {
      val all = known ++ fresh
      writeAll(fs, tableDir, all)
      all
    }
  }
}

/** Table-level sort marker (`_graft_sort`): present iff EVERY data file in
  * the table is internally sorted on the listed columns (ascending, nulls
  * first — the ordering the write path enforces via requiredOrdering).
  * Published by a batch commit whose effective sort covers a fresh table or
  * extends an identically-marked one; CLEARED by any commit that cannot
  * guarantee it (unsorted append, streaming epochs, z-order's z-value
  * layout). The scan reports it through `SupportsReportOrdering`, so
  * downstream sorts on a sorted prefix (sort-merge joins, sort-based aggs,
  * windows) are planned away — at 100 TB a re-sort of an already-sorted
  * fact table is pure wasted shuffle-adjacent CPU, and this is the
  * mechanism that deletes it.
  */
object GraftSortMarker {
  val Name = "_graft_sort"

  def read(fs: FileSystem, tableDir: Path): Option[Seq[String]] = {
    val p = new Path(tableDir, Name)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val cols = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      if (cols.isEmpty) None else Some(cols.split(",").map(_.trim).toSeq)
    } finally in.close()
  }

  def publish(fs: FileSystem, tableDir: Path, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "graft: empty sort marker")
    val tmp = new Path(tableDir, s".$Name.${java.util.UUID.randomUUID().toString.take(8)}.mk.tmp")
    val out = fs.create(tmp, true)
    try out.write(cols.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(tableDir, Name)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"graft: failed to publish sort marker at $dst")
  }

  def clear(fs: FileSystem, tableDir: Path): Unit = {
    val p = new Path(tableDir, Name)
    if (fs.exists(p)) fs.delete(p, false)
  }
}
