package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by executor-side
  * batch functions (`mapPartitions`) so decode libraries amortize per
  * partition, not per row.
  *
  * The decode internals are STUBBED (`decodeStub`) — this container has no
  * image/audio codecs — but everything Spark-level is real and tested:
  * the media schema, the binary payload path, partition-wise batching,
  * deterministic feature extraction over raw bytes, and the frame-sampling
  * iterator shape.
  */
object Multimodal {

  /** Canonical media column schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      md5_hex: String,
      /** 16-bin byte histogram — the deterministic stand-in for a real
        * decoded-content embedding. */
      byte_histogram: Seq[Long])

  /** Wrap a text/binary source column into the media struct (plumbing used
    * by tests and by sources that land raw payloads). */
  def asMedia(df: DataFrame, payloadCol: String, mime: String): DataFrame =
    df.withColumn("media", struct(
      col(payloadCol).cast(BinaryType).as("bytes"),
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")))

  /** REAL executor-side feature extraction over the raw bytes: size, md5,
    * 16-bin histogram. One MessageDigest per partition (the mapPartitions
    * batching contract a real decoder would rely on). */
  def extractFeatures(media: DataFrame, idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(idIdx)
        val m = r.getStruct(mediaIdx)
        val bytes = m.getAs[Array[Byte]]("bytes")
        digest.reset()
        val md5 = digest.digest(bytes).map("%02x".format(_)).mkString
        val hist = Array.fill(16)(0L)
        bytes.foreach(b => hist((b & 0xFF) / 16) += 1)
        MediaFeatures(id, bytes.length.toLong, md5, hist.toSeq)
      }
    }
  }

  /** STUB — a real implementation decodes the image and returns pixels.
    * Deterministic fake: "decodes" to a (width x height) described by the
    * byte length so downstream plumbing (resize, batch shapes) is testable.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length.max(1)
    (n % 640 + 1, n % 480 + 1)
  }

  /** Fill width/height metadata via the (stubbed) decoder — partition-wise. */
  def withDecodedDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(media.schema.fields.map {
      case f if f.name == "media" => f.copy(dataType = mediaSchema)
      case f => f
    })
    val mediaIdx = media.schema.fieldIndex("media")
    val encoded = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val m = r.getStruct(mediaIdx)
        val bytes = m.getAs[Array[Byte]]("bytes")
        val (w, h) = decodeStub(bytes)
        val newMedia = Row(bytes, m.getAs[String]("mime"),
          w, h, m.getAs[java.lang.Long]("duration_ms"))
        Row.fromSeq(r.toSeq.updated(mediaIdx, newMedia))
      }
    }
    spark.createDataFrame(encoded, schema)
  }

  /** STUB frame sampling for video payloads: yields every `stride`-th chunk
    * of the payload as a "frame" — the real implementation would demux; the
    * iterator/batch shape is what downstream consumes. */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Iterator[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 => chunk }
}
