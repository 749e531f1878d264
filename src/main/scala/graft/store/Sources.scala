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

  /** JSONL source — the interchange format training-data tooling
    * actually exchanges (one JSON object per line). Schema inference
    * by default; pass an explicit DDL schema to skip the inference
    * scan at scale. */
  def readJsonl(spark: SparkSession, path: String,
                schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDdl.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSONL sink: `nShards` line-delimited JSON files (the layout a
    * downstream tokenizer fleet consumes — one file per worker).
    * Deterministic shard membership (hash of `shardBy` when given, so
    * re-exports land identically); plain repartition otherwise. */
  def writeJsonl(df: DataFrame, path: String, nShards: Int,
                 shardBy: Option[String] = None,
                 overwrite: Boolean = true): Unit = {
    require(nShards > 0)
    val sharded = shardBy match {
      case Some(c) => df.repartition(nShards, org.apache.spark.sql.functions.col(c))
      case None    => df.repartition(nShards)
    }
    sharded.write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .json(path)
  }

  /** ORC source (Spark-native reader) with the same index-column
    * designation as [[readCsv]] — ingest from the Hive/Trino world's
    * columnar interchange format. Beyond the reference (pystore reads
    * CSV only, utils.py:36-62); same predicate-pushdown and
    * column-pruning class as the parquet spine on the read. */
  def readOrc(spark: SparkSession, path: String,
              indexCol: Option[String] = None): DataFrame = {
    val df = spark.read.orc(path)
    indexCol match {
      case Some(c) if c != Collection.DefaultIndex =>
        df.withColumnRenamed(c, Collection.DefaultIndex)
      case _ => df
    }
  }

  /** ORC sink — export an item (or any frame) for an ORC-consuming
    * engine. Snappy by default, like the parquet spine. */
  def writeOrc(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write.mode(if (overwrite) "overwrite" else "errorifexists")
      .option("compression", "snappy").orc(path)

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
