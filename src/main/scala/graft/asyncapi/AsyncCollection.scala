package graft.asyncapi

import java.util.concurrent.Executors

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.DataFrame

import graft.store.{Collection, DuplicateHandling, Filters}

/** Future-based async wrappers over the synchronous collection ops
  * (reference: pystore/async_operations.py:38-209 / Y1-Y2).
  *
  * Spark jobs submitted from different driver threads run concurrently
  * (FIFO scheduler interleaves their stages across executor slots), so
  * wrapping the blocking calls in Futures gives the same fan-out the
  * reference gets from its thread-pool executor.
  */
final class AsyncCollection(val sync: Collection,
                            threads: Int = Runtime.getRuntime.availableProcessors()) {

  private val executor = Executors.newFixedThreadPool(threads)
  implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(executor)

  def write(item: String, df: DataFrame,
            indexCols: Seq[String] = Seq(Collection.DefaultIndex),
            metadata: Map[String, Any] = Map.empty,
            overwrite: Boolean = false): Future[Unit] =
    Future(sync.write(item, df, indexCols, metadata, overwrite = overwrite))

  def read(item: String,
           columns: Seq[String] = Nil,
           filters: Seq[Filters.Pred] = Nil): Future[DataFrame] =
    Future(sync.item(item, filters = filters, columns = columns).data)

  def append(item: String, df: DataFrame,
             handling: DuplicateHandling = DuplicateHandling.KeepLast): Future[Unit] =
    Future(sync.append(item, df, handling))

  def delete(item: String): Future[Boolean] = Future(sync.deleteItem(item))

  def listItems(where: Map[String, Any] = Map.empty): Future[Set[String]] =
    Future(sync.listItems(where))

  /** Batch read; per-item failures → None (reference Y1 semantics). */
  def readBatch(items: Seq[String]): Future[Map[String, Option[DataFrame]]] =
    Future.traverse(items) { it =>
      Future(it -> Option(sync.item(it).data)).recover { case _ => it -> None }
    }.map(_.toMap)

  def writeBatch(items: Seq[(String, DataFrame)],
                 indexCols: Seq[String] = Seq(Collection.DefaultIndex)): Future[Seq[Unit]] =
    Future.traverse(items) { case (n, d) => write(n, d, indexCols) }

  def close(): Unit = executor.shutdown()
}

object AsyncCollection {
  /** Loan pattern replacing the reference's async context manager. */
  def withAsync[A](sync: Collection)(body: AsyncCollection => A): A = {
    val ac = new AsyncCollection(sync)
    try body(ac) finally ac.close()
  }
}
