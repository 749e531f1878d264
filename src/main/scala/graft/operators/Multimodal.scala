package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing
  * (BASELINE.json north star).
  *
  * Model: media is an opaque `BinaryType` payload column + a typed
  * metadata struct (mime, width/height/duration, source uri). All the
  * Spark-side machinery — schema, partition-sized batch processing,
  * column pruning (metadata-only queries never deserialize payloads) —
  * is real; only the codec kernel is stubbed, because no image/audio
  * libraries ship in this container.
  *
  * DECODE STUB: `decodeFeatures` marks the seam where a real
  * decoder (JNI to libjpeg/ffmpeg, or a model server call) would run.
  * It computes a deterministic fake feature vector from the bytes so
  * the pipeline shape (binary in → fixed-dim float vector out, batch
  * iteration per partition) is fully testable.
  *
  * Scale notes: payloads ride in Parquet binary columns — Parquet
  * keeps them out of dictionary encoding and the vectorized reader
  * streams them; `mapPartitions` processes a partition's rows as one
  * iterator (the JVM analogue of a pandas-batched UDF) so a real codec
  * could amortize per-batch model/codec setup. Partition sizing for
  * ~MB payloads comes from `maxRecordsPerFile`/`maxPartitionBytes`,
  * not row counts.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("uri", StringType)))

  /** Wrap a text table into the multimodal shape with a deterministic
    * fake payload (UTF-8 bytes of the text) — the test harness's stand-in
    * for real image bytes. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        concat(lit("mem://doc/"), col("doc_id")).as("uri")).as("meta"))

  /** Metadata-only projection: never touches payload bytes (column
    * pruning — the binary column's pages are not read). */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.mime").as("mime"),
      octet_length(col("payload")).as("byte_len"))

  private val featureDim = 8

  /** Batch "decode + feature extract" over payload bytes via
    * mapPartitions. A real implementation swaps `fakeDecode` for a
    * codec; everything else (encoder schema, batch shape, partition
    * iteration) stays. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(DoubleType, containsNull = false))))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      // Per-partition setup would init the codec / model session here.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(bytes))
      }
    }(enc)
  }

  /** Deterministic fake decoder: 8 byte-histogram moments. Replace with
    * a real codec behind the same (bytes → fixed-dim vector) contract. */
  private def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](featureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < featureDim) { out(j) = out(j) / bytes.length; j += 1 }
    }
    out
  }

  /** "Resize / frame-sample" analogue: keep every `stride`-th payload
    * byte — the structural twin of frame-sampling a video or
    * downscaling an image. Same mapPartitions batch kernel shape as
    * decodeFeatures (binary in → smaller binary out). */
  def samplePayload(media: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload_sampled", BinaryType),
      StructField("orig_len", IntegerType),
      StructField("sampled_len", IntegerType)))
    val input = media.select(col("media_id").cast(LongType), col("payload"))
    val enc = RowEncoder.encoderFor(outSchema)
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val sampled = Array.range(0, bytes.length, stride).map(bytes(_))
        Row(id, sampled, bytes.length, sampled.length)
      }
    }(enc)
  }
}
