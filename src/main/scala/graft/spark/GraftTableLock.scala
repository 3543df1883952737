package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory table-level mutex for the MUTATING maintenance ops
  * (deleteWhere / updateWhere / merge / compact / zorder / vacuum /
  * expireManifests). Two such ops racing on one table can both decide to
  * rewrite the same file from the same listing — one's output retires the
  * other's input mid-flight, and the per-op convergence markers (which
  * key on the op's OWN hash) cannot see the other op at all. Plain
  * appends and reads stay lock-free: the tmp+rename commit protocol
  * already makes them safe against anything, including a concurrent
  * rewrite (compact takes a snapshot-scoped delete for exactly that).
  *
  * Mechanics — the S3A/HDFS-portable shape, not a filesystem flock:
  *
  *   - acquisition atomically creates `<table>/_graft_maint_lock`
  *     (`create(overwrite = false)`; atomic on HDFS, check-then-create on
  *     the local FS — advisory, operationally sufficient);
  *   - the holder heartbeats the file's modification time every lease/3,
  *     so a LIVE holder is never expropriated no matter how long the op
  *     runs;
  *   - a waiter polls; a lock whose mtime is older than the lease
  *     (`graft.maint.lock.lease.ms`, default 10 min) belonged to a
  *     CRASHED holder and is broken and re-claimed;
  *   - waiting is bounded by `graft.maint.lock.wait.ms` (default 10 min),
  *     then the op fails loudly instead of queueing forever;
  *   - re-entrant within a thread (zorder runs through compact under one
  *     acquisition);
  *   - release deletes the file only while it still carries this
  *     acquisition's token — a broken-and-reclaimed lock is never
  *     deleted out from under its new holder.
  *
  * The crash contract stays what it was: every op is individually
  * crash-resumable (deterministic names, converged markers, heal pass),
  * so a broken lease's half-done op is healed by re-running it — the
  * lock only serializes LIVE mutators.
  */
private[spark] object GraftTableLock {
  val LockName = "_graft_maint_lock"

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty
  }

  /** Same-JVM contenders serialize HERE before touching the filesystem:
    * `create(overwrite = false)` is check-then-create on the local FS, so
    * two threads of one driver (the local[*] shape) could both win the
    * file claim. Cross-process claims still go through the file. */
  private val inProcess =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  def withLock[T](fs: FileSystem, tableDir: Path,
      conf: org.apache.hadoop.conf.Configuration, op: String)(f: => T): T = {
    val key = fs.makeQualified(tableDir).toString
    if (held.get.contains(key)) return f // nested op, same acquisition
    val lease = conf.getLong("graft.maint.lock.lease.ms", 10 * 60 * 1000L)
    val waitMs = conf.getLong("graft.maint.lock.wait.ms", 10 * 60 * 1000L)
    val pl = inProcess.computeIfAbsent(key,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (!pl.tryLock(waitMs, java.util.concurrent.TimeUnit.MILLISECONDS))
      throw new java.util.ConcurrentModificationException(
        s"graft: table $tableDir is locked by another maintenance operation " +
          s"in this process — waited ${waitMs}ms (graft.maint.lock.wait.ms)")
    try withFileLock(fs, tableDir, op, lease, waitMs, key)(f)
    finally pl.unlock()
  }

  private def withFileLock[T](fs: FileSystem, tableDir: Path, op: String,
      lease: Long, waitMs: Long, key: String)(f: => T): T = {
    val lockPath = new Path(tableDir, LockName)
    val token = s"$op:${java.util.UUID.randomUUID()}"
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try {
        fs.mkdirs(tableDir)
        val out = fs.create(lockPath, false)
        try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        acquired = true
      } catch {
        case e: java.io.IOException =>
          if (System.currentTimeMillis() > deadline &&
              !fs.exists(lockPath))
            throw new java.io.IOException(
              s"graft: cannot create maintenance lock at $lockPath", e)
          val st = try Some(fs.getFileStatus(lockPath)) catch {
            case _: java.io.FileNotFoundException => None // released: retry now
          }
          if (st.isEmpty) Thread.sleep(10)
          st.foreach { s =>
            if (System.currentTimeMillis() - s.getModificationTime > lease) {
              // crashed holder: break the stale lease by RENAMING the
              // specific stale incarnation to a tombstone — of two racing
              // breakers exactly one rename succeeds (the loser's source
              // is gone and it loops into the fresh winner's lock). A
              // plain delete here could land AFTER the winner re-created
              // the lock and destroy a live claim.
              val tomb = new Path(tableDir,
                s"$LockName.stale-${java.util.UUID.randomUUID().toString.take(8)}")
              if (fs.rename(lockPath, tomb)) fs.delete(tomb, false)
            } else if (System.currentTimeMillis() > deadline) {
              val holder = try {
                val in = fs.open(lockPath)
                try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
              } catch { case _: Exception => "<unreadable>" }
              throw new java.util.ConcurrentModificationException(
                s"graft: table $tableDir is locked by another maintenance " +
                  s"operation ($holder) — waited ${waitMs}ms " +
                  "(graft.maint.lock.wait.ms); if the holder crashed, the " +
                  s"lease expires ${lease}ms after its last heartbeat " +
                  "(graft.maint.lock.lease.ms)")
            } else Thread.sleep(math.min(200L, math.max(1L, waitMs / 10)))
          }
      }
    }
    val renewer = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, s"graft-lock-renew"); t.setDaemon(true); t })
    val heartbeatFailing = new java.util.concurrent.atomic.AtomicBoolean(false)
    renewer.scheduleAtFixedRate(() => {
      try {
        fs.setTimes(lockPath, System.currentTimeMillis(), -1)
        heartbeatFailing.set(false)
      } catch { case e: Exception =>
        // NOT silently ignorable: without heartbeats a LIVE op running
        // past the lease looks crashed and gets expropriated. Warn once
        // per failure streak so the operator can raise the lease on
        // filesystems that cannot touch mtimes (e.g. object stores).
        if (heartbeatFailing.compareAndSet(false, true))
          System.err.println(s"[graft] WARN: maintenance-lock heartbeat " +
            s"failed on $lockPath (${e.getMessage}); if heartbeats keep " +
            "failing and this operation outlives graft.maint.lock.lease.ms, " +
            "another process may expropriate a live lock — raise the lease " +
            "above the longest expected op on such filesystems")
      }
    }, math.max(1L, lease / 3), math.max(1L, lease / 3),
      java.util.concurrent.TimeUnit.MILLISECONDS)
    held.get += key
    try f
    finally {
      held.get -= key
      renewer.shutdownNow()
      try {
        val in = fs.open(lockPath)
        val owner = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        if (owner == token) fs.delete(lockPath, false)
      } catch { case _: Exception => () } // reclaimed or already gone
    }
  }
}
