package graft.store

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Extra sources / read modes beyond the Parquet spine. */
object Sources {

  /** CSV source with index-column designation
    * (reference: pystore.read_csv, utils.py:36-62 / S3). */
  def readCsv(spark: SparkSession, path: String,
              indexCol: Option[String] = None,
              header: Boolean = true,
              inferSchema: Boolean = true): DataFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)
    indexCol match {
      case Some(c) if c != Collection.DefaultIndex =>
        df.withColumnRenamed(c, Collection.DefaultIndex)
      case _ => df
    }
  }

  /** Chunked read (reference: memory.read_in_chunks, memory.py:91-137 /
    * S7): an iterator of row batches. Spark already streams
    * partition-by-partition; `toLocalIterator` fetches ONE partition at
    * a time to the driver, so driver memory is bounded by the largest
    * partition, not the dataset. Mostly an API-parity shim — prefer
    * keeping computation distributed. */
  def readInChunks(df: DataFrame, chunkSize: Int): Iterator[Seq[Row]] =
    df.toLocalIterator().asScala.grouped(chunkSize)

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
