package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "payload"),
    "payload", "text/plain")

  test("media struct schema + binary payload round-trip") {
    val m = mediaDf.select(col("media.*"))
    assert(m.columns.toSeq == Seq("bytes", "mime", "width", "height", "duration_ms"))
    val bytes = mediaDf.select(col("media.bytes")).collect()(0).getAs[Array[Byte]](0)
    assert(new String(bytes, "UTF-8") == "hello world")
  }

  test("partition-wise feature extraction: size, md5, histogram") {
    val f = Multimodal.extractFeatures(mediaDf).collect().sortBy(_.doc_id)
    assert(f(0).n_bytes == 11)
    assert(f(0).md5_hex == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(f(0).byte_histogram.sum == 11)
    assert(f(0).byte_histogram.size == 16)
    assert(f(1).n_bytes == 0)
  }

  test("stubbed decode fills metadata dims; frame sampler batches") {
    val d = Multimodal.withDecodedDims(mediaDf).select(col("media.width"), col("media.height"))
      .collect()(0)
    assert(d.getInt(0) == 12 && d.getInt(1) == 12) // 11 bytes -> stub dims
    val frames = Multimodal.sampleFrames("abcdefghij".getBytes, frameSize = 2, stride = 2).toSeq
    assert(frames.map(new String(_)) == Seq("ab", "ef", "ij"))
  }
}
