package graft.transactions

import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

import graft.store._

/** ACID-lite transactions over collection items
  * (reference: pystore/transactions.py:41-286 / T1-T2).
  *
  * Design (same as the reference): queue write/append/delete operations;
  * on commit, back up every affected item directory, execute the ops
  * serially, and restore the backups if anything fails. Single-writer,
  * driver-coordinated — the data jobs themselves still run distributed.
  * Scale note: backups copy item directories; at 100 TB the backup
  * becomes a manifest/rename of immutable part-files (same protocol
  * shape as snapshots, SURVEY §7.4.4).
  */
final class Transaction(collection: Collection) {

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
    val fs = collection.path.fs
    val backups = affected.flatMap { it =>
      val src = collection.path.resolve(it)
      if (src.isDir) {
        val b = collection.path.resolve(s"__txn_backup_$it")
        b.deleteRecursively()
        fs.snapshotRecursively(src.raw, b.raw)
        Some(it -> b)
      } else None
    }.toMap
    try {
      ops.foreach {
        case WriteOp(it, df, idx, meta, ow) =>
          collection.write(it, df, idx, meta, overwrite = ow)
        case AppendOp(it, df, h) => collection.append(it, df, h)
        case DeleteOp(it)        => collection.deleteItem(it)
      }
      backups.values.foreach(_.deleteRecursively())
    } catch {
      case NonFatal(e) =>
        // rollback: restore every affected item to its pre-txn state
        affected.foreach { it =>
          val target = collection.path.resolve(it)
          target.deleteRecursively()
          backups.get(it).foreach { b =>
            // the backup dir itself becomes the restored item — O(1)
            fs.rename(b.raw, target.raw)
          }
        }
        collection.clearMetadataCache()
        throw new TransactionError(s"transaction rolled back: ${e.getMessage}")
    }
  }

  def rollback(): Unit = { completed = true; ops.clear() }
}

object Transaction {
  /** Context-manager-style execution: auto-commit on success, nothing
    * applied on thrown body (ops are only executed at commit). */
  def withTransaction[A](collection: Collection)(body: Transaction => A): A = {
    val txn = new Transaction(collection)
    val result = body(txn)
    txn.commit()
    result
  }
}

/** Batch transaction: coalesces multiple appends to the same item into
  * one union before executing (reference transactions.py:184-246 / T2 +
  * U2). */
final class BatchTransaction(collection: Collection) {
  private val appends = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[DataFrame]]

  def append(item: String, df: DataFrame): this.type = {
    appends.getOrElseUpdate(item, mutable.ArrayBuffer.empty) += df; this
  }

  def commit(): Unit = {
    val txn = new Transaction(collection)
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
