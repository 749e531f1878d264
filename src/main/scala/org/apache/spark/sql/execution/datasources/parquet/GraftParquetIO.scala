package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.TaskAttemptContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Documented seam into Spark's `private[sql]` parquet writer (same
  * pattern as [[org.apache.spark.sql.GraftColumnBridge]]): graft's
  * copy-on-write row-level operations stage replacement rows as
  * parquet ON THE EXECUTORS, and the InternalRow→parquet conversion
  * should be Spark's own ([[ParquetWriteSupport]] — full type support,
  * identical physical encodings to `df.write.parquet`) rather than a
  * reimplementation. Nothing here forks behavior: the configuration
  * the writers see is the session's Hadoop conf, so timestamp
  * encodings, rebase modes, and legacy-format switches match what the
  * store's DataFrame commit paths produce. */
object GraftParquetIO {

  /** Prepare `conf` for [[newWriter]] calls writing `schema` — the same
    * seeding `ParquetFileFormat.prepareWrite` does for DataFrame
    * writes, driven by the ACTIVE session's SQLConf so physical
    * encodings (timestamp type, legacy format, rebase modes) match the
    * store's own commits. Must be called on the driver. */
  def configure(schema: StructType, conf: Configuration): Unit = {
    val sqlConf = org.apache.spark.sql.internal.SQLConf.get
    conf.set(org.apache.parquet.hadoop.ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(org.apache.parquet.hadoop.ParquetOutputFormat.COMPRESSION, "SNAPPY")
    import org.apache.spark.sql.internal.SQLConf._
    conf.set(PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
  }

  /** One parquet part-file writer at `path` (created with parents). */
  def newWriter(path: String, context: TaskAttemptContext): GraftParquetFileWriter =
    new GraftParquetFileWriter(new ParquetOutputWriter(path, context))
}

/** Thin public face so graft code never touches the private types. */
final class GraftParquetFileWriter private[parquet] (w: ParquetOutputWriter) {
  def write(row: InternalRow): Unit = w.write(row)
  def close(): Unit = w.close()
}
