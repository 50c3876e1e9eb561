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

  test("undecodable payloads fall back to byte-length dims; frame sampler batches") {
    val d = Multimodal.withDecodedDims(mediaDf).select(col("media.width"), col("media.height"))
      .collect()(0)
    assert(d.getInt(0) == 12 && d.getInt(1) == 12) // 11 bytes -> fallback dims
    val frames = Multimodal.sampleFrames("abcdefghij".getBytes, frameSize = 2, stride = 2).toSeq
    assert(frames.map(new String(_)) == Seq("ab", "ef", "ij"))
  }

  test("PNG encode -> ImageIO decode round-trips pixels exactly") {
    val png = Multimodal.encodePng(5, 3, (x, y) => (x * 40 << 16) | (y * 80 << 8) | (x + y))
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((x * 40 << 16) | (y * 80 << 8) | (x + y)))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("real decode fills metadata dims for PNG payloads") {
    val png = Multimodal.encodePng(7, 9, (_, _) => 0x123456)
    val df = Multimodal.asMedia(
      Seq((1L, png)).toDF("doc_id", "payload"), "payload", "image/png")
    val d = Multimodal.withDecodedDims(df).select(col("media.width"), col("media.height"))
      .collect()(0)
    assert(d.getInt(0) == 7 && d.getInt(1) == 9)
  }

  test("nearest-neighbor resize samples with floor division") {
    // 4x2 source, pixel value encodes its coordinates
    val png = Multimodal.encodePng(4, 2, (x, y) => x * 16 + y)
    val img = Multimodal.decodeImage(png).get
    val thumb = Multimodal.resizeNearest(img, 2, 2)
    // target (x,y) samples source (x*4/2, y*2/2) = (2x, y)
    assert(thumb(0)(0) == 0 && thumb(0)(1) == 32)
    assert(thumb(1)(0) == 1 && thumb(1)(1) == 33)
  }

  test("image feature extraction matches a hand computation") {
    val png = Multimodal.encodePng(2, 2, (x, y) => (x << 16) | (y << 8) | 5)
    val df = Multimodal.asMedia(
      Seq((7L, png)).toDF("doc_id", "payload"), "payload", "image/png")
    val f = Multimodal.decodeImageFeatures(df, thumbW = 1, thumbH = 1).collect()(0)
    assert(f.width == 2 && f.height == 2)
    // px values: (0,0)=5, (1,0)=1+5, (0,1)=1+5, (1,1)=1+1+5
    assert(f.px_sum == 5 + 6 + 6 + 7)
    assert(f.thumb_sum == 5) // 1x1 thumb samples (0,0)
  }

  test("WAV encode -> AudioSystem decode round-trips samples exactly") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 42)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    val (rate, decoded) = Multimodal.decodeWavPcm16(wav).get
    assert(rate == 8000)
    assert(decoded.toSeq == samples.toSeq)
    assert(Multimodal.decodeWavPcm16("not audio at all".getBytes).isEmpty)
  }

  test("audio feature extraction: rate, frames, duration, checksum") {
    val samples = Array.tabulate(4000)(i => (i % 200 - 100).toShort)
    val wav = Multimodal.encodeWavPcm16(16000, samples)
    val df = Multimodal.asMedia(
      Seq((3L, wav)).toDF("doc_id", "payload"), "payload", "audio/wav")
    val f = Multimodal.decodeWavFeatures(df).collect()(0)
    assert(f.sample_rate == 16000 && f.n_samples == 4000)
    assert(f.duration_ms == 250)
    assert(f.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("frame container round-trips and rejects malformed payloads") {
    val frames = (0 until 4).map(i =>
      Multimodal.encodePng(3, 2, (x, y) => (i * 50 + x * 10 + y) & 0xFFFFFF))
    val packed = Multimodal.encodeFrameContainer(frames)
    val back = Multimodal.decodeFrameContainer(packed)
    assert(back.isDefined && back.get.size == 4)
    back.get.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(Multimodal.decodeFrameContainer("not a container".getBytes).isEmpty)
    assert(Multimodal.decodeFrameContainer(packed.dropRight(5)).isEmpty) // truncated
    assert(Multimodal.decodeFrameContainer(Array[Byte]('G', 'V', 'I', 'D')).isEmpty)
  }

  test("mp3 encode -> frame walk round-trips frames exactly, ID3v2 skipped") {
    val specs = Seq(
      Multimodal.Mp3FrameSpec(1, 0, 0, j => (j % 100).toByte),   // 32kbps@44100
      Multimodal.Mp3FrameSpec(14, 0, 1, j => (j % 50).toByte),   // 320kbps@44100
      Multimodal.Mp3FrameSpec(9, 0, 0, j => 7.toByte))           // 128kbps@44100
    val bare = Multimodal.encodeMp3(specs)
    val tagged = Multimodal.encodeMp3(specs, Some(Array.fill(33)(0x41.toByte)))
    for (bytes <- Seq(bare, tagged)) {
      val frames = Multimodal.decodeMp3Frames(bytes).get
      assert(frames.map(_.bitrateKbps) == Seq(32, 320, 128))
      assert(frames.map(_.sampleRate) == Seq(44100, 44100, 44100))
      // payload lengths follow the Layer III size formula (minus header)
      assert(frames.map(_.payload.length) == Seq(
        144000 * 32 / 44100 - 4, 144000 * 320 / 44100 + 1 - 4, 144000 * 128 / 44100 - 4))
      // boundary-exact: first and last payload bytes of the middle frame
      assert(frames(1).payload.head == 0)
      assert((frames(1).payload.last & 0xFF) == (frames(1).payload.length - 1) % 50)
    }
    // a mid-stream sample-rate switch is rejected: decodeMp3Features'
    // duration formula (n_samples * 1000 / first rate) is only exact when
    // the rate is constant across the file
    val mixed = Multimodal.encodeMp3(Seq(
      Multimodal.Mp3FrameSpec(9, 0, 0, _ => 1.toByte),
      Multimodal.Mp3FrameSpec(9, 1, 0, _ => 1.toByte)))
    assert(Multimodal.decodeMp3Frames(mixed).isEmpty)
  }

  test("mp3 demux skips an ID3v2.4 tag WITH footer (flag 0x10)") {
    val specs = Seq(Multimodal.Mp3FrameSpec(9, 0, 0, j => (j % 7).toByte))
    val frames = Multimodal.encodeMp3(specs)
    val tagBody = Array.fill(20)(0x41.toByte)
    // hand-build a v2.4 tag with the footer flag: header(flags=0x10) +
    // body + 10-byte '3DI' footer not counted in the syncsafe size
    val tag = Multimodal.encodeId3v2(tagBody)
    tag(5) = 0x10.toByte
    val footer = Array[Byte]('3', 'D', 'I', 4, 0, 0x10.toByte) ++ tag.slice(6, 10)
    val withFooter = tag ++ footer ++ frames
    val out = Multimodal.decodeMp3Frames(withFooter)
    assert(out.isDefined, "a footered tag must not lose sync")
    assert(out.get.map(_.bitrateKbps) == Seq(128))
  }

  test("mkv demux keeps the FIRST SimpleBlock, per the MkvInfo contract") {
    // hand-roll a segment with TWO clusters: the features must describe the
    // first block, not the last
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id ++ Array((0x80 | body.length).toByte) ++ body
    }
    val base = Multimodal.encodeMkv(1000000L, 100.0,
      Seq(Multimodal.MkvTrack(1, 1, 8, 8)), Array[Byte](1, 2, 3))
    val cluster2 = el(Array(0x1F.toByte, 0x43.toByte, 0xB6.toByte, 0x75.toByte),
      el(Array(0xE7.toByte), Array[Byte](0)) ++
        el(Array(0xA3.toByte), Array[Byte](9, 9, 9, 9)))
    // splice the second cluster INSIDE the segment: rebuild segment size
    val segIdLen = 4
    val headerLen = base.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    val segHeader = base.slice(headerLen, headerLen + segIdLen)
    // original segment size varint starts right after the id
    var szLen = 1
    while ((base(headerLen + segIdLen) & (0x80 >> (szLen - 1))) == 0) szLen += 1
    val oldSize = (0 until szLen).map(i => (base(headerLen + segIdLen + i) & 0xFFL))
      .foldLeft(0L)((a, b) => (a << 8) | b) - (1L << (7 * szLen))
    val segBody = base.takeRight(oldSize.toInt) ++ cluster2
    // re-encode size in 2 bytes (enough for test payloads)
    val newSize = segBody.length
    val sizeBytes = Array(((newSize >> 8) | 0x40).toByte, (newSize & 0xFF).toByte)
    val spliced = base.take(headerLen) ++ segHeader ++ sizeBytes ++ segBody
    val info = Multimodal.decodeMkv(spliced).get
    assert(info.clusterPayload.toSeq == Seq[Byte](1, 2, 3),
      "first cluster's block must win")
  }

  test("mp3 demux rejects garbage, truncation, and reserved header values") {
    val good = Multimodal.encodeMp3(Seq(Multimodal.Mp3FrameSpec(5, 2, 0, _ => 1.toByte)))
    assert(Multimodal.decodeMp3Frames(good).isDefined)
    // garbage
    assert(Multimodal.decodeMp3Frames("not an mp3".getBytes).isEmpty)
    assert(Multimodal.decodeMp3Frames(Array.empty[Byte]).isEmpty)
    // truncated final frame
    assert(Multimodal.decodeMp3Frames(good.dropRight(1)).isEmpty)
    // trailing garbage after a valid frame
    assert(Multimodal.decodeMp3Frames(good ++ Array[Byte](1, 2, 3)).isEmpty)
    // reserved bitrate index (15) and sample-rate index (3)
    val badBitrate = good.clone(); badBitrate(2) = (0xF << 4).toByte
    assert(Multimodal.decodeMp3Frames(badBitrate).isEmpty)
    val badRate = good.clone(); badRate(2) = ((5 << 4) | (3 << 2)).toByte
    assert(Multimodal.decodeMp3Frames(badRate).isEmpty)
    // ID3 tag claiming more bytes than the payload holds
    val lyingTag = Multimodal.encodeId3v2(Array.fill(10)(1.toByte)).take(10)
    assert(Multimodal.decodeMp3Frames(lyingTag).isEmpty)
  }

  test("mp3 features: rates, counts, duration, boundary checksums") {
    val bytes = Multimodal.encodeMp3(Seq(
      Multimodal.Mp3FrameSpec(9, 0, 0, j => (j % 251).toByte),
      Multimodal.Mp3FrameSpec(9, 0, 1, j => (j % 251).toByte)))
    import spark.implicits._
    val media = Multimodal.asMedia(
      Seq((1L, bytes)).toDF("doc_id", "payload"), "payload", "audio/mpeg")
    val f = Multimodal.decodeMp3Features(media).collect().head
    val size0 = 144000 * 128 / 44100
    assert(f.sample_rate == 44100L)
    assert(f.n_frames == 2L)
    assert(f.n_samples == 2L * 1152L)
    assert(f.duration_ms == 2L * 1152L * 1000L / 44100L)
    assert(f.total_bytes == size0.toLong * 2 + 1)
    assert(f.head_sum == 2L * (0 until 16).map(j => (j * 1) % 251).sum) // payload j%251
    assert(f.tail_sum == ((size0 - 5) % 251).toLong + ((size0 + 1 - 5) % 251).toLong)
  }

  test("mp4 encode -> box walk round-trips the movie structure exactly") {
    val tracks = Seq(Multimodal.Mp4Track(1, 640, 480), Multimodal.Mp4Track(2, 320, 240))
    val mdat = Array.tabulate(100)(i => (i % 251).toByte)
    val bytes = Multimodal.encodeMp4("isom", 600, 3000, tracks, mdat)
    val info = Multimodal.decodeMp4(bytes).get
    assert(info.brand == "isom")
    assert(info.timescale == 600L && info.duration == 3000L)
    assert(info.durationMs == 5000L)
    assert(info.tracks == tracks)
    assert(info.mdat.toSeq == mdat.toSeq)
    // unknown boxes between the known ones are skipped by size
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val free = box("free", Array.fill(37)(0x55.toByte))
    val ftypLen = 8 + 12 // size+type header, then brand/minor/compatible
    val withFree = bytes.take(ftypLen) ++ free ++ bytes.drop(ftypLen) // after ftyp
    assert(Multimodal.decodeMp4(withFree).get.tracks == tracks)
  }

  test("mp4 demux rejects garbage, truncation, and bad box sizes") {
    assert(Multimodal.decodeMp4("not an mp4 file!".getBytes).isEmpty)
    assert(Multimodal.decodeMp4(Array.empty[Byte]).isEmpty)
    val good = Multimodal.encodeMp4("isom", 600, 1200,
      Seq(Multimodal.Mp4Track(1, 64, 48)), Array.fill(10)(1.toByte))
    assert(Multimodal.decodeMp4(good).isDefined)
    // truncated mid-box
    assert(Multimodal.decodeMp4(good.dropRight(5)).isEmpty)
    // box size larger than the file
    val badSize = good.clone()
    badSize(0) = 0x7F.toByte
    assert(Multimodal.decodeMp4(badSize).isEmpty)
    // a WAV is not an MP4 even though it parses as RIFF
    val wav = Multimodal.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    assert(Multimodal.decodeMp4(wav).isEmpty)
  }

  test("mkv encode -> ebml walk round-trips the segment structure exactly") {
    val tracks = Seq(
      Multimodal.MkvTrack(1, 1, 1920, 1080),
      Multimodal.MkvTrack(2, 2, 0, 0))
    val cluster = Array.tabulate(50)(i => (i * 3 % 251).toByte)
    val bytes = Multimodal.encodeMkv(1000000L, 4321.0, tracks, cluster)
    val info = Multimodal.decodeMkv(bytes).get
    assert(info.docType == "matroska")
    assert(info.timestampScale == 1000000L)
    assert(info.durationMs == 4321L)
    assert(info.tracks == tracks)
    assert(info.clusterPayload.toSeq == cluster.toSeq)
    // multi-byte size varints parse (a large cluster forces a 2+ byte size)
    val big = Multimodal.encodeMkv(1000000L, 10.0, tracks, Array.fill(300)(9.toByte))
    assert(Multimodal.decodeMkv(big).get.clusterPayload.length == 300)
    // splicing bytes in WITHOUT fixing the enclosing sizes must fail
    // cleanly (None), never crash — the truncated-element guard
    val void = Array[Byte](0xEC.toByte, 0x84.toByte, 1, 2, 3, 4)
    val infoIdx = {
      val pat = Array[Byte](0x15, 0x49.toByte, 0xA9.toByte, 0x66.toByte)
      bytes.indices.find(i => i + 4 <= bytes.length &&
        bytes.slice(i, i + 4).sameElements(pat)).get
    }
    val spliced = bytes.take(infoIdx) ++ void ++ bytes.drop(infoIdx)
    assert(Multimodal.decodeMkv(spliced).isEmpty)
  }

  test("mkv demux rejects garbage and truncation") {
    assert(Multimodal.decodeMkv("definitely not ebml".getBytes).isEmpty)
    assert(Multimodal.decodeMkv(Array.empty[Byte]).isEmpty)
    val good = Multimodal.encodeMkv(1000000L, 10.0,
      Seq(Multimodal.MkvTrack(1, 1, 64, 48)), Array.fill(10)(1.toByte))
    assert(Multimodal.decodeMkv(good).isDefined)
    assert(Multimodal.decodeMkv(good.dropRight(3)).isEmpty)
    // an MP4 is not an MKV
    val mp4 = Multimodal.encodeMp4("isom", 600, 1200,
      Seq(Multimodal.Mp4Track(1, 64, 48)), Array.fill(10)(1.toByte))
    assert(Multimodal.decodeMkv(mp4).isEmpty)
  }

  test("frame sampling decodes every stride-th frame with real codecs") {
    import spark.implicits._
    val frames = (0 until 6).map(i =>
      Multimodal.encodePng(2, 2, (x, y) => ((i + 1) << 16) | (x << 8) | y))
    val df = Multimodal.asMedia(
      Seq((9L, Multimodal.encodeFrameContainer(frames))).toDF("doc_id", "payload"),
      "payload", "video/x-graft-frames")
    val got = Multimodal.videoFrameFeatures(df, stride = 3).collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 3L))
    // px_sum: 4 pixels, r=(i+1) g=x b=y -> sum = 4(i+1) + 2*1 + 2*1
    assert(got.map(_.px_sum).toSeq == Seq(4L * 1 + 2 + 2, 4L * 4 + 2 + 2))
  }

  test("frame content signatures are position-weighted, not just pixel sums") {
    import spark.implicits._
    // frame B is frame A with its two rows swapped: same pixel multiset,
    // different layout. px_sum-style checksums collide; the positional
    // signature must not. Identical frames (A == C) must collide exactly.
    val a = Multimodal.encodePng(2, 2, (x, y) => (y << 16) | (x << 8) | 7)
    val b = Multimodal.encodePng(2, 2, (x, y) => ((1 - y) << 16) | (x << 8) | 7)
    val df = Multimodal.asMedia(
      Seq((1L, Multimodal.encodeFrameContainer(Seq(a, b, a))))
        .toDF("doc_id", "payload"),
      "payload", "video/x-graft-frames")
    val got = Multimodal.videoFrameSignatures(df).collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 1L, 2L))
    assert(got(0).sig == got(2).sig)    // identical content -> identical sig
    assert(got(0).sig != got(1).sig)    // permuted pixels -> different sig
    // hand computation: pixel (x,y) = y*65536 + x*256 + 7, weight y*2+x+1
    val expected = (for (y <- 0 until 2; x <- 0 until 2)
      yield (y.toLong * 65536 + x * 256 + 7) * (y * 2 + x + 1)).sum
    assert(got(0).sig == expected)
    assert(got.forall(s => s.width == 2 && s.height == 2))
  }
}
