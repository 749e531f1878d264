package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.GraftParquetIO
import org.apache.spark.sql.types.StructType

import graft.store.{Collection, Meta, SPath}

/** Native structured-streaming sink: `stream.writeStream
  * .format("graft").option("path", store/coll/item).start()` — the
  * streaming twin of `INSERT INTO`, so a micro-batch ingest needs no
  * foreachBatch helper and flows through the SAME typed append
  * pipeline (validation, duplicate handling, periodic pruned rewrite,
  * atomic commit) as every other writer.
  *
  * A brand-new item composes with SQL DDL: `CREATE TABLE` births the
  * typed EMPTY item (declared schema, index, layout), and the sink's
  * appends honor that declared layout from the first batch — no seed
  * write needed (GraftStreamingSinkSpec "bare-created EMPTY item").
  *
  * Per epoch: executors stage the micro-batch as parquet under
  * `__cow_stream_<item>_<query>/epoch=<id>/` (Spark's own
  * InternalRow→parquet writer, one file per task), and `commit(epoch)`
  * reads the staged batch back and hands it to
  * [[graft.store.Collection.append]]. Staging + append means the batch
  * is written twice — micro-batches are small by construction, and in
  * exchange the append path's semantics apply unmodified.
  *
  * Exactly-once: the last applied epoch per STREAMING QUERY rides the
  * item sidecar (`_stream_epoch_<queryId>`; queryId is stable across
  * restarts of a checkpointed query) and replayed epochs skip. The mark
  * is threaded into [[graft.store.Collection.append]]'s OWN atomic
  * sidecar commit (`extraMeta`) — the data swap and the mark are one
  * write under the commit lock, so there is NO crash point where the
  * batch landed but the mark didn't: a restarted query either replays
  * an unapplied epoch (data absent too) or skips an applied one. That
  * makes the sink exactly-once for EVERY duplicate strategy including
  * `keep_all`, and removes the unguarded sidecar read-modify-write the
  * old trailing `Meta.write` could race against a concurrent writer. */
final class GraftStreamingWrite(
    spark: SparkSession,
    itemPath: SPath,
    tableSchema: StructType,
    info: LogicalWriteInfo) extends StreamingWrite {

  private val staging: SPath = itemPath.parent.resolve(
    s"__cow_stream_${itemPath.name}_${info.queryId().take(8)}")
  private val epochKey = s"_stream_epoch_${info.queryId()}"

  override def createStreamingWriterFactory(
      pInfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val conf = spark.sessionState.newHadoopConf()
    GraftParquetIO.configure(tableSchema, conf)
    val props = {
      val it = conf.iterator()
      val b = mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.toArray
    }
    new GraftStreamEpochWriterFactory(staging.raw, tableSchema.json, props)
  }

  private def lastApplied(coll: Collection): Long =
    coll.metadata(itemPath.name).get(epochKey) match {
      case Some(org.json4s.JInt(i)) => i.toLong
      case _ => -1L
    }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val epochDir = staging.resolve(s"epoch=$epochId")
    try {
      val coll = Collection.at(spark, itemPath.parent)
      val item = itemPath.name
      if (epochId > lastApplied(coll) && epochDir.isDir) {
        val batch = spark.read.schema(tableSchema).parquet(epochDir.toString)
        // the epoch mark rides the append's atomic commit: no seam
        // between data and mark (see class doc)
        coll.append(item, batch,
          duplicateHandling = GraftWrites.duplicatesOf(info.options()),
          extraMeta = Map(epochKey -> Meta.jv(epochId)))
        coll.clearMetadataCache(Some(item))
      }
    } finally {
      epochDir.deleteRecursively()
      if (staging.isDir && staging.listDirs.isEmpty) staging.deleteRecursively()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    staging.resolve(s"epoch=$epochId").deleteRecursively()
}

/** Serialized to executors; stages each epoch's rows flat (the append
  * pipeline does its own layout routing on the driver side). */
final class GraftStreamEpochWriterFactory(
    stagingPath: String,
    schemaJson: String,
    hadoopProps: Array[(String, String)]) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => conf.set(k, v) }
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    new GraftCowDataWriter(s"$stagingPath/epoch=$epochId", schema,
      layout = None, indexOrdinal = 0, indexKind = GraftCowWriterFactory.KindFlat,
      tz = java.time.ZoneOffset.UTC, conf, partitionId, taskId)
  }
}
