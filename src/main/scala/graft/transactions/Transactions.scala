package graft.transactions

import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

import graft.store._

/** ACID-lite transactions over collection items
  * (reference: pystore/transactions.py:41-286 / T1-T2).
  *
  * Queue write/append/delete operations; on commit, PIN every affected
  * item's pre-txn state in an internal manifest snapshot (generation
  * pins — O(items) metadata, zero bytes; Snapshots.scala), execute the
  * ops serially, and on failure restore each item from its pins. The
  * reference copies whole item directories (transactions.py:79-90);
  * here the commit paths' copy-on-write renames pinned generations
  * aside as ops replace them, so BOTH the backup and the rollback are
  * O(1)-per-dir renames on every backend — a 100 TB item enters a
  * transaction without a byte moving, object stores included.
  * Single-writer, driver-coordinated — the data jobs themselves still
  * run distributed.
  *
  * With `exclusive = true` (meaningful in multiprocess mode) the commit
  * additionally holds every affected item's cross-process lock for its
  * whole body, making the transaction one atomic unit against writers
  * and snapshot cuts in OTHER processes — at the price of those items
  * being write-blocked for the transaction's duration (concurrent
  * writers poll up to their lock timeout instead of interleaving).
  */
final class Transaction(collection: Collection,
                        val exclusive: Boolean = false) {

  sealed private trait Op { def item: String }
  private case class WriteOp(item: String, df: DataFrame, indexCols: Seq[String],
                             metadata: Map[String, Any], overwrite: Boolean) extends Op
  private case class AppendOp(item: String, df: DataFrame,
                              handling: DuplicateHandling) extends Op
  private case class DeleteOp(item: String) extends Op

  private val ops = mutable.ArrayBuffer.empty[Op]
  private var completed = false

  def write(item: String, df: DataFrame,
            indexCols: Seq[String] = Seq(Collection.DefaultIndex),
            metadata: Map[String, Any] = Map.empty,
            overwrite: Boolean = false): this.type = {
    ops += WriteOp(item, df, indexCols, metadata, overwrite); this
  }

  def append(item: String, df: DataFrame,
             handling: DuplicateHandling = DuplicateHandling.KeepLast): this.type = {
    ops += AppendOp(item, df, handling); this
  }

  def delete(item: String): this.type = { ops += DeleteOp(item); this }

  def commit(): Unit = {
    if (completed) throw new TransactionError("transaction already completed")
    completed = true
    val affected = ops.map(_.item).distinct.toSeq
    // Pin the pre-txn state: an internal manifest snapshot over the
    // affected items only. Every commit/delete inside the txn then
    // retains the pinned data by rename (the snapshots' copy-on-write),
    // so no op destroys what rollback needs — and success just drops
    // the pins (deleteManifest GCs retained dirs nothing else pins).
    val snap = s"__txn_${System.nanoTime()}"
    // Foreign-commit detection for the ROLLBACK: restoring an item to
    // its pre-txn pin erases EVERYTHING since — including a commit some
    // OTHER writer (thread or process) interleaved between this txn's
    // ops. The ops themselves are safe (each publish is fenced and an
    // append folds the foreign rows forward), but the restore is a
    // blind rewind. Track the generation this txn last OBSERVED or
    // PRODUCED per item (two tiny sidecar reads per op); an item whose
    // generation moved outside that chain carries a foreign commit and
    // its restore is REFUSED — the pin is kept for manual resolution
    // instead of silently destroying another writer's data. The
    // generation an op PRODUCES is recorded at its PUBLISH POINT (the
    // publishObserver below, fired inside the commit's sidecar write),
    // not only after the op returns: an op that commits and then
    // throws post-commit (a stats-refresh read-back failure) must read
    // as OUR generation move, or rollback would refuse to restore a
    // single-writer partial commit while blaming a writer that never
    // existed.
    def genOf(it: String): Long =
      Snapshots.generationOf(Meta.read(collection.path.resolve(it)))
    val lastSeen = mutable.Map.empty[String, Long]
    val foreignSeen = mutable.Set.empty[String]
    // EXCLUSIVE mode (meaningful only with multiprocess mode on): hold
    // every affected item's cross-process lock for the WHOLE commit
    // body — pin capture, ops, and a failing txn's rollback become one
    // atomic unit against OTHER PROCESSES: no foreign writer can
    // interleave between ops (so the rollback's foreign refusal can
    // never fire) and no foreign snapshot cut can pin a partial
    // transaction (the cut acquires the same locks and serializes to
    // before-or-after). The item set is known up front (ops are
    // queued), and the one global sorted acquisition order rules out
    // cross-process deadlock even against other exclusive txns. THE
    // PRICE: this txn's data jobs run under the locks — a deliberate
    // exception to the "metadata-scale held section" contract, which
    // is why it is opt-in: a concurrent writer to the same items polls
    // up to its lock timeout instead of interleaving. Non-exclusive
    // txns keep the round-13 semantics (foreign commits interleave
    // legally, fold forward, and refuse the rewind on rollback).
    // Iterative acquisition via the Collection helper every multi-lock
    // verb shares (sorted order, reverse release) — a closure-nested
    // spelling would grow the stack by one frame per item and a
    // 10k-item exclusive batch (routine at 100 TB) would overflow it
    // mid-acquire, exactly the failure withItemProcessLockAll's own
    // comment rules out for the admin verbs.
    def withAllItemLocks[A](body: => A): A =
      if (!exclusive) body
      else collection.withItemProcessLockAll(affected)(body)
    // hold the commit-coordination READ side across ALL ops (reentrant
    // under each op's own commit): a concurrent snapshot's write-side
    // capture therefore sees the whole transaction or none of it,
    // never a mixed-generation cut
    try { collection.withCommitLock { withAllItemLocks {
    // Pin INSIDE the locks: the pinned pre-txn cut is the locked-in
    // state itself (exclusive mode), not a moment arbitrarily earlier.
    Snapshots.createManifest(collection.path, snap,
      affected.filter(it => collection.path.resolve(it).isDir))
    affected.foreach(it => lastSeen(it) = genOf(it))
    Collection.publishObserver.set((coll, it, g) =>
      if ((coll eq collection) && lastSeen.contains(it)) lastSeen(it) = g)
    Collection.commitSeamHook(s"txn_ops_begin:${affected.sorted.mkString(",")}")
    try {
      ops.foreach { op =>
        if (genOf(op.item) != lastSeen(op.item)) foreignSeen += op.item
        val beforeOp = lastSeen(op.item)
        // A foreign commit can also land DURING the op, between its
        // staging read and its publish: the fence refuses the publish,
        // retryOnConflict re-reads and FOLDS the foreign rows into the
        // op's second (successful) publish — so the generation chain
        // then reads as purely ours (the observer records our final
        // gen) and neither the pre-op check above nor the rollback
        // re-check can ever see the interleave. The per-thread
        // interleave counter is its only trace (ops run on this
        // thread; retryOnConflict bumps it on every fence refusal and
        // moved-generation torn read): if it advanced across the op,
        // the item carries a foreign commit and its rollback rewind
        // must be refused, same as an interleave BETWEEN ops.
        val interleavesBefore = Collection.foreignInterleaves.get().n
        // finally, not post-return: an op that folds a foreign commit,
        // publishes, and THEN throws (the post-commit stats read-back
        // failure the observer note below covers) is exactly a failing
        // txn headed for rollback — skipping the sample there would
        // rewind the foreign writer's rows after all
        try op match {
          case WriteOp(it, df, idx, meta, ow) =>
            collection.write(it, df, idx, meta, overwrite = ow)
          case AppendOp(it, df, h) => collection.append(it, df, h)
          case DeleteOp(it)        => collection.deleteItem(it)
        } finally {
          if (Collection.foreignInterleaves.get().n != interleavesBefore)
            foreignSeen += op.item
        }
        Collection.commitSeamHook(s"txn_op_done:${op.item}")
        // The observer already recorded the generation our op PRODUCED
        // at its publish point. Re-read only when it did not fire
        // (deleteItem has no publish): a blind post-op re-read would
        // silently ADOPT a foreign commit that landed between our
        // publish and this line (e.g. during a post-commit stats
        // refresh), and rollback would then rewind that foreign
        // writer's rows without the refusal this machinery exists for.
        if (lastSeen(op.item) == beforeOp) lastSeen(op.item) = genOf(op.item)
      }
      cleanupTxnSnapshot(snap)
    } catch {
      case NonFatal(e) =>
        // rollback: rename every affected item's pinned state back.
        // A per-item restore failure (e.g. a raced-away pin) must not
        // abandon the REMAINING items' restores nor mask the original
        // failure — and the pin is kept when anything failed, so the
        // un-restored state stays recoverable. Items carrying a
        // detected foreign commit are refused (see above), keeping the
        // folded foreign rows live.
        val foreignAll = mutable.SortedSet.empty[String] ++ foreignSeen
        val restoreFailed = affected.filterNot(foreignAll.contains).flatMap { it =>
          try {
            // the item's cross-process lock (no-op outside multiprocess
            // mode) makes the foreign re-check and the rewind ONE
            // atomic step: a writer in another process cannot publish
            // between this generation read and the restore renames —
            // it blocks on the lock, and its fenced publish then sees
            // the restored generation and retries over the restored
            // state instead of resurrecting the rolled-back one
            collection.withItemProcessLock(it) {
              if (genOf(it) != lastSeen(it)) { foreignAll += it; None }
              else { Snapshots.restoreFromManifest(collection.path, snap, it); None }
            }
          } catch { case NonFatal(re) => Some(s"$it (${re.getMessage})") }
        }
        val foreign = foreignAll.toSeq
        if (restoreFailed.isEmpty && foreign.isEmpty) cleanupTxnSnapshot(snap)
        collection.clearMetadataCache()
        collection.listItems() // refresh the item-set cache post-restore
        throw new TransactionError(
          s"transaction rolled back: ${e.getMessage}" +
            (if (foreign.nonEmpty)
               s"; restore REFUSED for ${foreign.mkString(", ")} (a foreign " +
                 "commit interleaved — rewinding would destroy another " +
                 s"writer's data); pin '$snap' retained for manual recovery"
             else "") +
            (if (restoreFailed.nonEmpty)
               s"; restore FAILED for ${restoreFailed.mkString("; ")} — " +
                 s"pin '$snap' retained for manual recovery"
             else ""))
    }
    } } } finally Collection.publishObserver.remove()
  }

  /** Drop the internal pin manifest AND any legacy copied-item dir the
    * manifest creation fell back to (time items without period gens). */
  private def cleanupTxnSnapshot(snap: String): Unit =
    Snapshots.releasePin(collection.path, snap)

  def rollback(): Unit = { completed = true; ops.clear() }
}

object Transaction {
  /** Context-manager-style execution: auto-commit on success, nothing
    * applied on thrown body (ops are only executed at commit). */
  def withTransaction[A](collection: Collection, exclusive: Boolean = false)
                        (body: Transaction => A): A = {
    val txn = new Transaction(collection, exclusive)
    val result = body(txn)
    txn.commit()
    result
  }
}

/** Batch transaction: coalesces multiple appends to the same item into
  * one union before executing (reference transactions.py:184-246 / T2 +
  * U2). */
final class BatchTransaction(collection: Collection,
                             exclusive: Boolean = false) {
  private val appends = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[DataFrame]]

  def append(item: String, df: DataFrame): this.type = {
    appends.getOrElseUpdate(item, mutable.ArrayBuffer.empty) += df; this
  }

  def commit(): Unit = {
    val txn = new Transaction(collection, exclusive)
    appends.foreach { case (item, dfs) =>
      txn.append(item, dfs.reduce(_ unionByName _))
    }
    txn.commit()
  }
}

/** Advisory collection lock via the backend's atomic first-caller-wins
  * primitive (reference transactions.py:289-362 / T3): atomic dir
  * creation on POSIX, exclusive owner-file creation through the Hadoop
  * API. */
object CollectionLock {
  private val LockDir = "__lock"

  def acquire(collection: Collection, ownerId: String,
              timeoutMs: Long = 10000, pollMs: Long = 100): Unit = {
    val lock = collection.path.resolve(LockDir)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      if (lock.fs.tryLock(lock.raw, ownerId)) return
      if (System.currentTimeMillis() > deadline)
        throw new LockTimeoutError(
          s"could not acquire lock on ${collection.name} within ${timeoutMs}ms " +
          s"(held by ${currentOwner(collection).getOrElse("unknown")})")
      Thread.sleep(pollMs)
    }
  }

  def release(collection: Collection): Unit =
    collection.path.resolve(LockDir).deleteRecursively()

  def currentOwner(collection: Collection): Option[String] = {
    val f = collection.path.resolve(LockDir).resolve("owner")
    if (f.exists)
      Some(new String(f.fs.readBytes(f.raw), StandardCharsets.UTF_8))
    else None
  }

  def withLock[A](collection: Collection, ownerId: String,
                  timeoutMs: Long = 10000)(body: => A): A = {
    acquire(collection, ownerId, timeoutMs)
    try body finally release(collection)
  }
}
