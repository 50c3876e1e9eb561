package graft.operators

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

/** Per-table writer lock — the engine-side analog of the reference's
  * advisory-lock discipline around upserts (`base.rb:995-1044`:
  * `with_advisory_lock` keyed on the service integration, serializing a
  * streaming microbatch merge against a concurrent backfill merge on the
  * same table). Without it the optimistic manifest-version collision
  * (`PartitionedStore.publish`) is the only backstop, and the LATE writer
  * FAILS — correct but wasteful: the whole merge re-runs. With the lock,
  * concurrent writers serialize and both land.
  *
  * Two layers, both keyed by the normalized table directory:
  *
  *  1. an in-process `ReentrantLock` stripe — on a Spark driver all writes
  *     to a table are driver-coordinated jobs, so this is the layer that
  *     actually serializes a streaming query's microbatch thread against a
  *     backfill thread in the same application (the common deployment: one
  *     driver owns a table's writers, as one PG owns the reference's);
  *  2. a storage-level lease file (`_writer.lock`, atomic CREATE_NEW with an
  *     expiry) for mutual exclusion across DRIVERS sharing storage — the
  *     cross-process advisory lock. Expired leases (crashed writer) are
  *     stolen after their TTL, so a dead holder never wedges the table;
  *     an active holder's lease makes late arrivals wait-and-poll.
  *
  * The lease name starts with '_' so Spark's file readers ignore it.
  *
  * Storage contract: the lease layer is java.nio-based and depends on
  * atomic exclusive create (CREATE_NEW) — valid on POSIX filesystems,
  * NFSv4 (O_EXCL is atomic there), and HDFS-mounted paths; object stores
  * have no exclusive-create primitive, so cross-driver exclusion there
  * needs an external coordinator (the reference's Postgres advisory lock
  * is exactly that). The in-process stripe and PartitionedStore's
  * manifest-version collision remain the backstops either way — a lost
  * lease degrades to the optimistic path (late writer fails and retries),
  * never to silent corruption. See SCALE.md "Durable-commit primitives".
  */
object TableLock {

  private val LeaseName = "_writer.lock"
  private val jvmLocks = new ConcurrentHashMap[Path, ReentrantLock]()

  /** How long a waiter polls before giving up loudly (a wedged table must
    * fail the job, not hang it forever). */
  val DefaultAcquireTimeoutMs: Long = 10 * 60 * 1000L

  /** Lease TTL: a writer that holds past this is presumed crashed and its
    * lease is stolen. Generous relative to a microbatch merge; a genuinely
    * longer writer should renew (out of scope — the reference's advisory
    * locks are connection-scoped and share this assumption). */
  val DefaultTtlMs: Long = 5 * 60 * 1000L

  /** Run `f` while holding the table's writer lock. Reentrant within a
    * thread (the JVM layer is a ReentrantLock; the lease layer detects the
    * re-entry by depth). */
  def withLock[A](dir: String, ttlMs: Long = DefaultTtlMs,
                  acquireTimeoutMs: Long = DefaultAcquireTimeoutMs,
                  pollMs: Long = 25L)(f: => A): A = {
    val norm = Paths.get(dir).toAbsolutePath.normalize
    val lock = jvmLocks.computeIfAbsent(norm, _ => new ReentrantLock())
    lock.lock()
    try {
      if (lock.getHoldCount > 1) f // re-entrant: lease already ours
      else {
        val owner = acquireLease(norm, ttlMs, acquireTimeoutMs, pollMs)
        try f finally releaseLease(norm, owner, ttlMs)
      }
    } finally lock.unlock()
  }

  /** Hold the writer locks of SEVERAL tables at once (a dedup loop's
    * store + archive, a maintenance pass touching both): dirs are
    * normalized, deduplicated, and acquired in SORTED order, so any two
    * holders that overlap on any subset acquire in the same global order
    * and cannot deadlock. Reentrancy carries through (each layer is the
    * single-dir lock). */
  def withLocks[A](dirs: Seq[String], ttlMs: Long = DefaultTtlMs,
                   acquireTimeoutMs: Long = DefaultAcquireTimeoutMs,
                   pollMs: Long = 25L)(f: => A): A = {
    val sorted = dirs.map(d => Paths.get(d).toAbsolutePath.normalize.toString)
      .distinct.sorted.toList
    def go(rest: List[String]): A = rest match {
      case Nil => f
      case h :: t => withLock(h, ttlMs, acquireTimeoutMs, pollMs)(go(t))
    }
    go(sorted)
  }

  /** Non-blocking probe — the `avoid_writes?` analog (`base.rb:1304-1330`:
    * the reference asks pg_locks whether the table is locked/vacuuming and
    * RESCHEDULES lower-priority work instead of queueing). True when a
    * writer in this process holds the JVM stripe, or a live (unexpired)
    * lease file exists on storage. A scheduler uses this to defer a
    * low-priority merge rather than block a worker slot behind a long
    * compaction. */
  def isHeld(dir: String): Boolean = {
    val norm = Paths.get(dir).toAbsolutePath.normalize
    val jvmHeld = Option(jvmLocks.get(norm)).exists(_.isLocked)
    jvmHeld || {
      val p = leasePath(norm)
      Files.exists(p) && {
        val expiry =
          try new String(Files.readAllBytes(p), "UTF-8")
            .split(" ").lift(1).flatMap(_.toLongOption).getOrElse(0L)
          catch { case _: java.io.IOException => 0L }
        System.currentTimeMillis() <= expiry
      }
    }
  }

  private def leasePath(dir: Path): Path = dir.resolve(LeaseName)
  private def tombPath(dir: Path, owner: String): Path =
    dir.resolve(s"$LeaseName.tomb.$owner")

  /** A tomb left behind by an arbiter that crashed mid-delete is itself a
    * corpse after this grace (tombs normally live milliseconds). The
    * effective grace is max(this, lease TTL): a reclaim threshold shorter
    * than the TTL would assume arbiters never stall longer than writers —
    * the race the tomb exists to close. */
  private val TombGraceMs = 30 * 1000L

  /** Read the lease as (owner, expiry); a missing/malformed file reads as
    * ("", 0) — i.e. an ownerless, expired corpse. */
  private def readLease(dir: Path): (String, Long) =
    try {
      val parts = new String(Files.readAllBytes(leasePath(dir)), "UTF-8").split(" ")
      (parts.headOption.getOrElse(""),
        parts.lift(1).flatMap(_.toLongOption).getOrElse(0L))
    } catch { case _: java.io.IOException => ("", 0L) }

  /** Delete lease incarnation `owner` — guarded by a per-incarnation tomb
    * file (atomic CREATE_NEW) so that for any given incarnation exactly ONE
    * process performs the delete, and only after re-checking that the path
    * still holds THAT incarnation. This closes the delete-then-create steal
    * race (two stealers both deleting, the second killing the first's fresh
    * ACTIVE lease) and the read-then-delete release race (an overrunning
    * writer deleting its thief's active lease): every deletion is keyed to
    * the specific lease uuid it intends to remove, and a replaced lease
    * (new uuid) is never touched. Returns true if this process performed
    * the arbitration, false if another arbiter holds the tomb.
    *
    * The tomb carries its arbiter's uuid, and the winner RE-READS it as the
    * last act before the lease delete: if a reclaim (below) handed the tomb
    * to a newer arbiter while this one was stalled, the re-read sees the
    * other uuid and the stalled arbiter aborts instead of double-deleting.
    * Reclaim itself waits max(TombGraceMs, ttl) — an arbiter is allowed to
    * stall at least as long as a writer before being presumed dead.
    *
    * Residual window (documented, not closable with plain filesystem
    * primitives): the tomb re-read and the delete are still two syscalls,
    * so an arbiter that stalls LONGER THAN THE LEASE TTL in between can
    * delete a successor's lease — the same assumption the TTL steal already
    * makes about writers, now applied uniformly to arbiters. */
  private def deleteIncarnation(dir: Path, owner: String, ttlMs: Long): Boolean = {
    val tomb = tombPath(dir, if (owner.isEmpty) "corrupt" else owner)
    val arbiter = java.util.UUID.randomUUID().toString
    try {
      if (Files.exists(tomb) && System.currentTimeMillis() -
          Files.getLastModifiedTime(tomb).toMillis > math.max(TombGraceMs, ttlMs))
        Files.deleteIfExists(tomb)
      ()
    } catch { case _: java.io.IOException => () }
    val claimed =
      try {
        Files.write(tomb, arbiter.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch { case _: java.io.IOException => false }
    if (claimed) {
      try {
        val stillOurs =
          try readLease(dir)._1 == owner &&
            new String(Files.readAllBytes(tomb), "UTF-8") == arbiter
          catch { case _: java.io.IOException => false }
        if (stillOurs) Files.deleteIfExists(leasePath(dir))
        ()
      } catch { case _: java.io.IOException => () }
      finally {
        // clear only OUR tomb: if a reclaim handed the name to a newer
        // arbiter during a stall, deleting theirs would cascade the race
        try {
          if (new String(Files.readAllBytes(tomb), "UTF-8") == arbiter)
            Files.deleteIfExists(tomb)
          ()
        } catch { case _: java.io.IOException => () }
        ()
      }
    }
    claimed
  }

  /** Returns the owner id written into the lease (checked on release). */
  private def acquireLease(dir: Path, ttlMs: Long, timeoutMs: Long,
                           pollMs: Long): String = {
    Files.createDirectories(dir)
    val deadline = System.currentTimeMillis() + timeoutMs
    val owner = java.util.UUID.randomUUID().toString
    while (true) {
      try {
        // expiry stamped at THIS attempt, not at loop entry: a waiter that
        // polled for minutes must still write a full-TTL lease, or it hands
        // later arrivals an instantly-stealable corpse while it writes
        val content = s"$owner ${System.currentTimeMillis() + ttlMs}"
        Files.write(leasePath(dir), content.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        return owner
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // holder alive? read its expiry; a malformed/vanished file counts
          // as expired (the holder died mid-write)
          val (corpseOwner, expiry) = readLease(dir)
          if (System.currentTimeMillis() > expiry) {
            // steal THIS incarnation via its tomb; losers of the tomb race
            // loop back to polling while the winner deletes, then everyone
            // re-races the atomic CREATE_NEW above
            deleteIncarnation(dir, corpseOwner, ttlMs)
            ()
          } else if (System.currentTimeMillis() > deadline) {
            sys.error(s"writer lock on $dir held past acquire timeout " +
              s"(${timeoutMs}ms) — holder lease not expired; raise the TTL " +
              "or investigate the stuck writer")
          } else Thread.sleep(pollMs)
      }
    }
    sys.error("unreachable")
  }

  /** Delete the lease ONLY if we still own it: a writer that overran its
    * TTL may find its lease already stolen — deleting the thief's ACTIVE
    * lease would let a third writer in concurrently. The tomb-guarded
    * delete keys the removal to OUR incarnation uuid, so a stolen-and-
    * replaced lease is never touched (and if a thief is mid-arbitration on
    * our corpse, we simply leave it to them). */
  private[operators] def releaseLease(dir: Path, owner: String,
                                      ttlMs: Long = DefaultTtlMs): Unit = {
    deleteIncarnation(dir, owner, ttlMs)
    ()
  }
}
