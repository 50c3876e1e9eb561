package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by executor-side
  * batch functions (`mapPartitions`) so decode libraries amortize per
  * partition, not per row.
  *
  * Decode is REAL for everything the JDK ships a codec for: PNG/JPEG/GIF/BMP
  * via `javax.imageio.ImageIO` ([[decodeImage]]) and PCM WAV via
  * `javax.sound.sampled.AudioSystem` ([[decodeWavPcm16]]), plus a
  * deterministic nearest-neighbor resize ([[resizeNearest]]). Video frame
  * sampling is real too, over the engine's own MJPEG-style length-prefixed
  * container ([[decodeFrameContainer]]/[[videoFrameFeatures]] — the JDK has
  * image codecs but no demuxer; standard containers plug in behind the same
  * seam). MP3 is demuxed natively ([[decodeMp3Frames]]): ID3v2 skip + the
  * MPEG-1 Layer III frame walk, pure JVM — only the psychoacoustic audio
  * decode (Huffman/IMDCT) stays behind the codec seam. MP4/ISO BMFF is
  * demuxed natively too ([[decodeMp4]]): the box-tree walk with
  * skip-by-size, movie/track headers, and mdat extraction — per-sample
  * codec decode (H.264 etc.) stays behind the seam. So is Matroska
  * ([[decodeMkv]]): the RFC 8794 EBML varint walk. All six decode paths
  * are oracle-gated end to end (q51/q52/q94/q97/q98/q99): deterministic
  * payloads are encoded on executors, round-tripped through the codec, and
  * the extracted features hash-compared against DuckDB arithmetic. The
  * fixed-size chunker [[sampleFrames]] remains the container-less fallback.
  */
object Multimodal {

  // ImageIO's default useCache=true backs every read/write stream with a
  // TEMP FILE — tens of thousands of file creations per partition of codec
  // work. All payloads here are in-memory byte arrays; cache in memory.
  // (Object init runs once per JVM, driver and executors alike.)
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---------------------------------------------------------------- images

  // Every `ImageIO.read`/`write` call does an SPI registry lookup and
  // allocates a fresh reader/writer — per-frame, under local[32], that
  // lookup contends and dominated q94's profile. Cache ONE reader per
  // (thread, format) and one PNG writer per thread (the same thread-local
  // pattern as Str2IntHash's MessageDigest); the format is sniffed from the
  // payload magic so the hot path never touches the registry. Readers and
  // writers are reusable by contract via setInput/setOutput.
  private val readerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageReader]](
      () => new java.util.HashMap())
  private val pngWriterCache =
    ThreadLocal.withInitial[javax.imageio.ImageWriter] { () =>
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "JDK PNG writer missing")
      it.next()
    }

  /** Payload-magic sniff for the formats the JDK ships readers for; null
    * for anything else (falls back to the full SPI scan). */
  private def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "gif"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else null

  /** REAL image decode: `javax.imageio` reads PNG/JPEG/GIF/BMP with zero
    * external dependencies, through the per-thread cached reader for sniffed
    * formats. Returns None for payloads no installed reader understands
    * (text, truncated files) — the tolerate-and-null posture enrichment uses
    * for missing upstream data. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val fmt = sniffFormat(bytes)
      if (fmt == null)
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      else {
        val cache = readerCache.get()
        var reader = cache.get(fmt)
        if (reader == null) {
          val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
          if (!it.hasNext)
            return Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          reader = it.next()
          cache.put(fmt, reader)
        }
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true)
          Some(reader.read(0))
        } finally {
          reader.setInput(null) // reset so a failed read can't poison the next
          iis.close()
        }
      }
    } catch {
      // NonFatal, not just IOException: ImageIO's readers throw
      // IllegalArgumentException / IndexOutOfBounds / NegativeArraySize on
      // malformed (or hostile) payloads — a crawled corpus WILL contain
      // them, and one such row must null out, not kill the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** Deterministic PNG encode (the landing path for synthetic fixtures and
    * the q51 oracle): pixel (x,y) gets the packed 0xRRGGBB from `rgb`. PNG
    * is lossless, so decode returns these exact values. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = pngWriterCache.get()
    try {
      w.setOutput(ios)
      w.write(img)
      ios.flush()
    } finally {
      w.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }

  private val bmpWriterCache =
    ThreadLocal.withInitial[javax.imageio.ImageWriter] { () =>
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("bmp")
      require(it.hasNext, "JDK BMP writer missing")
      it.next()
    }

  /** Deterministic 24-bit BMP encode of the same pixel function — a SECOND
    * lossless container for identical content, so content-addressed image
    * dedup (q121) can prove format invariance: the PNG and BMP encodings of
    * one pixel formula differ byte-for-byte but decode to the same pixels
    * and hash identically. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = bmpWriterCache.get()
    try {
      w.setOutput(ios)
      w.write(img)
      ios.flush()
    } finally {
      w.setOutput(null)
      ios.close()
    }
    bos.toByteArray
  }

  final case class ImageHash(doc_id: Long, hash_hi: Long, hash_lo: Long)

  /** Executor-side perceptual average-hash over the DECODED pixels: 8x8
    * nearest-neighbor sample (the q51 thumbnail idiom: source pixel
    * (i*w/8, j*h/8)), integer luma (r*299 + g*587 + b*114)/1000, threshold
    * at the floor-mean, bits packed into two 32-bit halves (two BIGINTs so
    * neither engine touches the sign bit). Works for any decodable format
    * and any dimensions — the content-addressable identity byte-hashing
    * cannot provide. All arithmetic is integer floor ops so the DuckDB
    * oracle reproduces every hash from the generating formula alone. */
  def decodeImageAHash(media: DataFrame, idCol: String = "doc_id"): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeImage(bytes).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val gray = new Array[Long](64)
          var sum = 0L
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              val rgb = img.getRGB(i * w / 8, j * h / 8)
              val g = (((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
                (rgb & 0xFF) * 114L) / 1000L
              gray(j * 8 + i) = g
              sum += g
              i += 1
            }
            j += 1
          }
          val mean = sum / 64L
          var hi = 0L
          var lo = 0L
          var k = 0
          while (k < 64) {
            if (gray(k) >= mean) {
              if (k < 32) hi |= 1L << k else lo |= 1L << (k - 32)
            }
            k += 1
          }
          ImageHash(id, hi, lo)
        }
      }
    }
  }

  /** Deterministic nearest-neighbor resize: target pixel (x,y) samples
    * source (x*w/tw, y*h/th) — integer floor division, so the result is
    * bit-identical across JVMs (unlike Graphics2D interpolation, which is
    * implementation-defined). Returns packed 0xRRGGBB rows. */
  def resizeNearest(img: java.awt.image.BufferedImage, tw: Int, th: Int): Array[Array[Int]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(th, tw)((y, x) =>
      img.getRGB(x * w / tw, y * h / th) & 0xFFFFFF)
  }

  /** Fallback dims for undecodable payloads: a (width x height) derived from
    * byte length, so downstream plumbing still sees well-formed metadata. */
  def fallbackDims(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length.max(1)
    (n % 640 + 1, n % 480 + 1)
  }

  /** Fill width/height metadata partition-wise: REAL `ImageIO` decode when a
    * codec claims the payload, byte-length fallback otherwise. */
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
        val (w, h) = decodeImage(bytes)
          .map(img => (img.getWidth, img.getHeight))
          .getOrElse(fallbackDims(bytes))
        val newMedia = Row(bytes, m.getAs[String]("mime"),
          w, h, m.getAs[java.lang.Long]("duration_ms"))
        Row.fromSeq(r.toSeq.updated(mediaIdx, newMedia))
      }
    }
    spark.createDataFrame(encoded, schema)
  }

  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      /** Sum of r+g+b over all pixels — the decode-correctness checksum. */
      px_sum: Long,
      /** Same sum over a nearest-neighbor thumbnail — resize checksum. */
      thumb_sum: Long)

  /** Executor-side image decode + feature extraction: one codec pass per
    * row, batched per partition. Undecodable payloads are dropped (the
    * media-pipeline convention: quarantine, don't poison the batch). */
  def decodeImageFeatures(media: DataFrame, idCol: String = "doc_id",
                          thumbW: Int = 4, thumbH: Int = 3): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeImage(bytes).map { img =>
          var px = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              px += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          val thumb = resizeNearest(img, thumbW, thumbH)
          val tSum = thumb.map(_.map(p =>
            (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)).toLong).sum).sum
          ImageFeatures(id, img.getWidth, img.getHeight, px, tSum)
        }
      }
    }
  }

  // ----------------------------------------------------------------- audio

  /** Deterministic 16-bit mono PCM WAV encode: canonical 44-byte RIFF header
    * + little-endian samples. Byte-exact, so the q52 oracle can recompute
    * every feature from the sample formula. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Same PCM content in a byte-DIFFERENT container: a LIST/INFO metadata
    * chunk is inserted between fmt and data. The JDK RIFF parser skips
    * unknown chunks, so decode returns identical samples — the audio
    * analog of q121's PNG-vs-BMP pair, letting content-addressed audio
    * dedup (q128) prove it hashes the SIGNAL, not the bytes. */
  def encodeWavPcm16Tagged(sampleRate: Int, samples: Array[Short],
                           tag: String): Array[Byte] = {
    val info = tag.getBytes("US-ASCII")
    val padded = if (info.length % 2 == 0) info else info :+ 0.toByte
    val listLen = 4 + 8 + padded.length // "INFO" + "ICMT" subchunk header + payload
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + 8 + listLen + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8 + listLen + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(listLen)
      .put("INFO".getBytes("US-ASCII"))
      .put("ICMT".getBytes("US-ASCII")).putInt(padded.length).put(padded)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class AudioFp(doc_id: Long, n_samples: Long, fp: Long)
  final case class AudioFpW(doc_id: Long, n_samples: Long, fp: Long, te: Long,
                            wins: Array[Long])

  /** The shared 16-frame energy-envelope kernel:
    * (fp, total energy, per-frame energies). */
  private def audioFpKernel(samples: Array[Short]): (Long, Long, Array[Long]) = {
    val n = samples.length
    val e = new Array[Long](16)
    var total = 0L
    var f = 0
    while (f < 16) {
      var i = f * n / 16
      val end = (f + 1) * n / 16
      var acc = 0L
      while (i < end) {
        val s = samples(i).toLong
        acc += s * s
        i += 1
      }
      e(f) = acc
      total += acc
      f += 1
    }
    var fp = 0L
    f = 0
    while (f < 16) {
      if (e(f) * 16 >= total) fp |= 1L << f
      f += 1
    }
    (fp, total, e)
  }

  /** Executor-side audio content fingerprint over the DECODED samples:
    * 16 frames by nearest boundaries (f*n/16), integer frame energy
    * (sum of squares), bit f set iff energy_f * 16 >= total energy —
    * a format-invariant 16-bit signature of the signal's energy envelope,
    * all integer ops so the oracle reproduces it from the generating
    * formula alone. Requires n >= 16 (every frame non-empty). */
  def decodeAudioFingerprint(media: DataFrame, idCol: String = "doc_id"): Dataset[AudioFp] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeWavPcm16(bytes).collect { case (_, samples) if samples.length >= 16 =>
          val (fp, _, _) = audioFpKernel(samples)
          AudioFp(id, samples.length.toLong, fp)
        }
      }
    }
  }

  /** [[decodeAudioFingerprint]] plus total energy and the 16 per-frame
    * energies themselves — the POSITIONAL content signature the
    * scale-safe near-dup (q176) bands on: exact integer frame energies
    * key candidate buckets by actual signal content (q168's
    * per-frame-signature discipline), where nibble bands of the 16-bit
    * envelope gave a 16-value alphabet that collides quadratically in
    * same-length clips. */
  def decodeAudioEnergyWindows(media: DataFrame, idCol: String = "doc_id"): Dataset[AudioFpW] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeWavPcm16(bytes).collect { case (_, samples) if samples.length >= 16 =>
          val (fp, te, wins) = audioFpKernel(samples)
          AudioFpW(id, samples.length.toLong, fp, te, wins)
        }
      }
    }
  }

  /** REAL WAV decode via `javax.sound.sampled.AudioSystem` — the JDK audio
    * codec parses the RIFF container and hands back the PCM frames. Returns
    * (sampleRate, samples) or None for non-WAV payloads. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
        val raw = in.readAllBytes()
        val sb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
        val out = new Array[Short](sb.remaining())
        sb.get(out)
        Some((fmt.getSampleRate.toInt, out))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }

  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      duration_ms: Long,
      /** Sum of |sample| — the decode-correctness checksum. */
      sum_abs: Long)

  /** Executor-side WAV decode + feature extraction, mirroring
    * [[decodeImageFeatures]]: codec per row, batch per partition, drop
    * undecodable payloads. */
  def decodeWavFeatures(media: DataFrame, idCol: String = "doc_id"): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeWavPcm16(bytes).map { case (rate, samples) =>
          var sumAbs = 0L
          samples.foreach(s => sumAbs += math.abs(s.toLong))
          AudioFeatures(id, rate, samples.length.toLong,
            samples.length.toLong * 1000L / rate, sumAbs)
        }
      }
    }
  }

  // ------------------------------------------------------------- mp3 demux

  /** MPEG-1 Layer III bitrate table (kbps), indexed by the header's 4-bit
    * bitrate field (index 0 = "free" and 15 = invalid are rejected). Public
    * format: ISO/IEC 11172-3. */
  val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by the header's 2-bit field (index 3 invalid). */
  val Mp3Rates: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val Mp3SamplesPerFrame = 1152

  /** Whole-frame byte length (header included): `144 * bitrate / rate +
    * padding` — the standard Layer III size formula. */
  def mp3FrameSize(bitrateIdx: Int, rateIdx: Int, padding: Int): Int =
    144000 * Mp3Bitrates(bitrateIdx) / Mp3Rates(rateIdx) + padding

  final case class Mp3Frame(bitrateKbps: Int, sampleRate: Int,
                            payload: Array[Byte])

  /** One frame of a deterministic synthetic MP3 (fixture generator — the
    * encode seam; a real encoder would sit here). */
  final case class Mp3FrameSpec(bitrateIdx: Int, rateIdx: Int, padding: Int,
                                payloadByte: Int => Byte) {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(rateIdx >= 0 && rateIdx <= 2, s"bad rate index $rateIdx")
    require(padding == 0 || padding == 1, s"bad padding $padding")
  }

  /** Syncsafe-sized ID3v2.3 tag (the metadata block real MP3s lead with;
    * the demuxer must skip it to find the first sync word). */
  def encodeId3v2(tagPayload: Array[Byte]): Array[Byte] = {
    require(tagPayload.length < (1 << 28), "id3 tag too large")
    val out = new Array[Byte](10 + tagPayload.length)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3; out(4) = 0; out(5) = 0
    out(6) = ((tagPayload.length >> 21) & 0x7F).toByte
    out(7) = ((tagPayload.length >> 14) & 0x7F).toByte
    out(8) = ((tagPayload.length >> 7) & 0x7F).toByte
    out(9) = (tagPayload.length & 0x7F).toByte
    System.arraycopy(tagPayload, 0, out, 10, tagPayload.length)
    out
  }

  /** Encode a VBR sequence of MPEG-1 Layer III frames (valid sync + header
    * bits, mono, no CRC), optionally led by an ID3v2 tag. Byte-exact, so an
    * oracle can recompute every demuxed feature from the spec formulas. */
  def encodeMp3(frames: Seq[Mp3FrameSpec],
                id3: Option[Array[Byte]] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    id3.foreach(tag => out.write(encodeId3v2(tag)))
    frames.foreach { f =>
      val size = mp3FrameSize(f.bitrateIdx, f.rateIdx, f.padding)
      out.write(0xFF)
      out.write(0xFB) // sync + MPEG-1 + Layer III + no CRC
      out.write((f.bitrateIdx << 4) | (f.rateIdx << 2) | (f.padding << 1))
      out.write(0xC0) // mono
      var j = 0
      while (j < size - 4) { out.write(f.payloadByte(j)); j += 1 }
    }
    out.toByteArray
  }

  /** REAL MP3 demux (pure JVM): skip a leading ID3v2 tag, then walk the
    * frame sequence by parsing each 4-byte header — sync word, version,
    * layer, bitrate index, sample-rate index, padding — and slicing the
    * payload with the Layer III size formula. Full audio decode (Huffman +
    * IMDCT) stays behind the codec seam; the demux level (frame boundaries,
    * rates, durations — what a data pipeline filters and samples on) is
    * real. None for garbage, truncated frames, or reserved header values —
    * tolerate-and-null like the other codecs. */
  def decodeMp3Frames(bytes: Array[Byte]): Option[Seq[Mp3Frame]] = {
    var pos = 0
    // ID3v2: "ID3" + version(2) + flags + syncsafe size of the tag body.
    // The v2.4 footer flag (0x10) adds a 10-byte trailer NOT counted in the
    // syncsafe size — skipping only the body would land on '3DI', lose
    // sync, and drop a perfectly valid file.
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
      pos = 10 + size + footer
      if (pos > bytes.length) return None
    }
    val frames = Vector.newBuilder[Mp3Frame]
    var n = 0
    var firstRateIdx = -1
    while (pos < bytes.length) {
      if (bytes.length - pos < 4) return None // trailing garbage, not a header
      if ((bytes(pos) & 0xFF) != 0xFF || (bytes(pos + 1) & 0xFF) != 0xFB)
        return None // lost sync / unsupported version-layer
      val b2 = bytes(pos + 2) & 0xFF
      val bitrateIdx = (b2 >> 4) & 0xF
      val rateIdx = (b2 >> 2) & 0x3
      val padding = (b2 >> 1) & 0x1
      if (bitrateIdx < 1 || bitrateIdx > 14 || rateIdx > 2) return None
      // Mixed sample rates within one file are rejected HERE, which is what
      // lets decodeMp3Features compute duration from the first frame's rate:
      // n_samples * 1000 / rate is only exact when the rate is constant.
      if (firstRateIdx < 0) firstRateIdx = rateIdx
      else if (rateIdx != firstRateIdx) return None
      val size = mp3FrameSize(bitrateIdx, rateIdx, padding)
      if (pos + size > bytes.length) return None // truncated frame
      frames += Mp3Frame(Mp3Bitrates(bitrateIdx), Mp3Rates(rateIdx),
        java.util.Arrays.copyOfRange(bytes, pos + 4, pos + size))
      pos += size
      n += 1
      if (n > (1 << 22)) return None // runaway guard
    }
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  final case class Mp3Features(
      doc_id: Long,
      sample_rate: Long,
      n_frames: Long,
      n_samples: Long,
      duration_ms: Long,
      /** Total container bytes across frames (headers included) — verifies
        * the size formula drove every boundary. */
      total_bytes: Long,
      /** Sum of the first 16 payload bytes of every frame — verifies each
        * payload STARTS at the right offset. */
      head_sum: Long,
      /** Sum of the last payload byte of every frame — verifies each payload
        * ENDS at the right offset (off-by-one in the walk shifts this). */
      tail_sum: Long)

  /** Executor-side MP3 demux + feature extraction, same shape as the other
    * decode paths: per-row demux, per-partition batch, drop undecodable
    * payloads. Mixed sample rates within one file are rejected by
    * [[decodeMp3Frames]] (it returns None on a mid-stream rate switch), so
    * the first frame's rate is THE file rate and the duration formula below
    * is exact. */
  def decodeMp3Features(media: DataFrame, idCol: String = "doc_id"): Dataset[Mp3Features] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeMp3Frames(bytes).map { frames =>
          val rate = frames.head.sampleRate.toLong
          val nSamples = frames.size.toLong * Mp3SamplesPerFrame
          val totalBytes = frames.map(_.payload.length.toLong + 4L).sum
          val headSum = frames.map(_.payload.take(16).map(_ & 0xFF).sum.toLong).sum
          val tailSum = frames.map(f => (f.payload.last & 0xFF).toLong).sum
          Mp3Features(id, rate, frames.size.toLong, nSamples,
            nSamples * 1000L / rate, totalBytes, headSum, tailSum)
        }
      }
    }
  }

  // ------------------------------------------------------------- mp4 demux

  /** Parsed ISO BMFF (MP4) structure: the movie header, per-track headers,
    * and the media payload — what a pipeline filters/samples on. */
  final case class Mp4Track(trackId: Long, width: Int, height: Int)
  final case class Mp4Info(brand: String, timescale: Long, duration: Long,
                           tracks: Seq[Mp4Track], mdat: Array[Byte]) {
    def durationMs: Long = if (timescale == 0) 0L else duration * 1000L / timescale
  }

  private def beInt(b: java.nio.ByteBuffer): Long = b.getInt.toLong & 0xFFFFFFFFL

  /** REAL MP4 demux (pure JVM): walk the ISO/IEC 14496-12 box tree —
    * `[size][type][payload]`, 64-bit largesize and to-end-of-file sizes
    * included — descending into `moov`/`trak` containers, parsing `ftyp`,
    * `mvhd` (v0/v1), `tkhd` (v0/v1, 16.16 fixed-point dims), and `mdat`.
    * Unknown boxes are skipped by size, which is the property that makes a
    * box demuxer robust to real-world files. Frame-level codec decode
    * (H.264 etc.) stays behind the codec seam. None for non-BMFF payloads,
    * truncated boxes, or malformed sizes. */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Info] =
    try {
      var brand = ""
      var timescale = 0L
      var duration = 0L
      val tracks = Vector.newBuilder[Mp4Track]
      var mdat: Array[Byte] = Array.empty

      def walk(start: Int, end: Int, depth: Int): Unit = {
        var pos = start
        while (pos < end) {
          if (end - pos < 8) throw new java.io.IOException("truncated box header")
          val bb = java.nio.ByteBuffer.wrap(bytes, pos, end - pos)
          var size = beInt(bb)
          val tpe = {
            val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
          }
          var headerLen = 8
          if (size == 1L) { size = bb.getLong; headerLen = 16 }
          else if (size == 0L) size = (end - pos).toLong // to end of enclosing
          if (size < headerLen || pos + size > end)
            throw new java.io.IOException(s"bad box size $size for $tpe")
          val bodyStart = pos + headerLen
          val bodyEnd = pos + size.toInt
          tpe match {
            case "ftyp" =>
              if (bodyEnd - bodyStart < 4) throw new java.io.IOException("short ftyp")
              brand = new String(bytes, bodyStart, 4, "US-ASCII")
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              if (depth > 8) throw new java.io.IOException("box nesting runaway")
              walk(bodyStart, bodyEnd, depth + 1)
            case "mvhd" =>
              val b = java.nio.ByteBuffer.wrap(bytes, bodyStart, bodyEnd - bodyStart)
              val version = b.get() & 0xFF
              b.position(b.position() + 3) // flags
              if (version == 1) {
                b.position(b.position() + 16) // 64-bit ctime+mtime
                timescale = beInt(b)
                duration = b.getLong
              } else {
                b.position(b.position() + 8) // 32-bit ctime+mtime
                timescale = beInt(b)
                duration = beInt(b)
              }
            case "tkhd" =>
              val b = java.nio.ByteBuffer.wrap(bytes, bodyStart, bodyEnd - bodyStart)
              val version = b.get() & 0xFF
              b.position(b.position() + 3)
              val trackId =
                if (version == 1) { b.position(b.position() + 16); beInt(b) }
                else { b.position(b.position() + 8); beInt(b) }
              // reserved + duration + reserved(8) + layer/altgroup/volume/
              // reserved(2) + matrix(36), then width/height as 16.16 fixed
              b.position(b.position() + 4 + (if (version == 1) 8 else 4) + 8 + 8 + 36)
              val width = (beInt(b) >> 16).toInt
              val height = (beInt(b) >> 16).toInt
              tracks += Mp4Track(trackId, width, height)
            case "mdat" =>
              mdat = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)
            case _ => () // skip-by-size: the demuxer contract
          }
          pos = bodyEnd
        }
      }
      walk(0, bytes.length, 0)
      if (brand.isEmpty || timescale == 0L) None
      else Some(Mp4Info(brand, timescale, duration, tracks.result(), mdat))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic ISO BMFF encode (fixture generator — the encode seam):
    * ftyp + moov(mvhd + per-track trak(tkhd)) + mdat, all v0 boxes,
    * byte-exact per the spec layouts [[decodeMp4]] parses. */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
                tracks: Seq[Mp4Track], mdat: Array[Byte]): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 ascii chars")
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val ftyp = box("ftyp", (brand + "\u0000\u0000\u0000\u0000" + brand).getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)                   // version 0 + flags
      b.putInt(0).putInt(0)         // ctime, mtime
      b.putInt(timescale.toInt).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      b.put(new Array[Byte](10))    // reserved
      b.putInt(0x00010000).putInt(0).putInt(0)      // unity matrix rows
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.put(new Array[Byte](24))    // pre_defined
      b.putInt(tracks.size + 1)     // next_track_ID
      box("mvhd", b.array())
    }
    val traks = tracks.map { t =>
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7)                   // version 0 + flags (enabled|in-movie|in-preview)
      b.putInt(0).putInt(0)         // ctime, mtime
      b.putInt(t.trackId.toInt)
      b.putInt(0)                   // reserved
      b.putInt(duration.toInt)
      b.put(new Array[Byte](8))     // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/altgroup/volume/reserved
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(t.width << 16).putInt(t.height << 16)
      box("trak", box("tkhd", b.array()))
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    ftyp ++ moov ++ box("mdat", mdat)
  }

  final case class Mp4Features(
      doc_id: Long,
      brand: String,
      duration_ms: Long,
      n_tracks: Long,
      width_sum: Long,
      height_sum: Long,
      mdat_bytes: Long,
      /** First-16 + last mdat byte sums — verify the payload boundaries. */
      mdat_head_sum: Long,
      mdat_tail_byte: Long)

  /** Executor-side MP4 demux + feature extraction, same shape as the other
    * decode paths: per-row demux, per-partition batch, drop undecodable. */
  def decodeMp4Features(media: DataFrame, idCol: String = "doc_id"): Dataset[Mp4Features] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeMp4(bytes).map { info =>
          Mp4Features(id, info.brand, info.durationMs,
            info.tracks.size.toLong,
            info.tracks.map(_.width.toLong).sum,
            info.tracks.map(_.height.toLong).sum,
            info.mdat.length.toLong,
            info.mdat.take(16).map(_ & 0xFF).sum.toLong,
            if (info.mdat.isEmpty) -1L else (info.mdat.last & 0xFF).toLong)
        }
      }
    }
  }

  // ------------------------------------------------------------- mkv demux

  /** Parsed Matroska/EBML structure (public spec: RFC 8794 EBML + the
    * Matroska element registry): segment info, per-track video dims, and
    * the first cluster's block payload. */
  final case class MkvTrack(trackNumber: Long, trackType: Long, width: Int, height: Int)
  final case class MkvInfo(docType: String, timestampScale: Long, duration: Double,
                           tracks: Seq[MkvTrack], clusterPayload: Array[Byte]) {
    /** Duration is stored in timestampScale (ns) units. */
    def durationMs: Long = (duration * timestampScale / 1e6).toLong
  }

  private object Ebml {
    // element IDs, stored with their length-marker bytes as the spec writes them
    val Header = 0x1A45DFA3L; val DocType = 0x4282L
    val Segment = 0x18538067L
    val Info = 0x1549A966L; val TimestampScale = 0x2AD7B1L; val Duration = 0x4489L
    val Tracks = 0x1654AE6BL; val TrackEntry = 0xAEL
    val TrackNumber = 0xD7L; val TrackType = 0x83L
    val Video = 0xE0L; val PixelWidth = 0xB0L; val PixelHeight = 0xBAL
    val Cluster = 0x1F43B675L; val Timestamp = 0xE7L; val SimpleBlock = 0xA3L

    def idLength(firstByte: Int): Int =
      if ((firstByte & 0x80) != 0) 1
      else if ((firstByte & 0x40) != 0) 2
      else if ((firstByte & 0x20) != 0) 3
      else if ((firstByte & 0x10) != 0) 4
      else -1

    /** Encode an element ID: its registry value already includes the
      * length-marker bit, so it serializes as plain big-endian bytes. */
    def idBytes(id: Long): Array[Byte] = {
      val n = if (id <= 0xFFL) 1 else if (id <= 0xFFFFL) 2
        else if (id <= 0xFFFFFFL) 3 else 4
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }

    /** Size varint: marker bit in the first byte, value with marker STRIPPED
      * (unlike IDs). Shortest form. */
    def sizeBytes(v: Long): Array[Byte] = {
      require(v >= 0, "negative ebml size")
      var n = 1
      while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1 // reserve all-ones (unknown size)
      val out = new Array[Byte](n)
      var rest = v | (1L << (7 * n)) // set the marker bit
      var i = n - 1
      while (i >= 0) { out(i) = (rest & 0xFF).toByte; rest >>= 8; i -= 1 }
      out
    }
  }

  /** Deterministic Matroska encode (fixture generator — the encode seam):
    * EBML header (DocType) + Segment(Info(TimestampScale, Duration),
    * Tracks(TrackEntry(Number, Type, Video(PixelWidth, PixelHeight))...),
    * Cluster(Timestamp, SimpleBlock payload)). */
  def encodeMkv(timestampScale: Long, duration: Double, tracks: Seq[MkvTrack],
                clusterPayload: Array[Byte]): Array[Byte] = {
    import Ebml._
    def el(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeBytes(body.length.toLong) ++ body
    def uint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && v >= (1L << (8 * n))) n += 1
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def float8(v: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putDouble(v).array()
    val header = el(Header, el(DocType, "matroska".getBytes("US-ASCII")))
    val info = el(Info,
      el(TimestampScale, uint(timestampScale)) ++ el(Duration, float8(duration)))
    val trackEls = tracks.map { t =>
      el(TrackEntry,
        el(TrackNumber, uint(t.trackNumber)) ++
          el(TrackType, uint(t.trackType)) ++
          el(Video, el(PixelWidth, uint(t.width.toLong)) ++
            el(PixelHeight, uint(t.height.toLong))))
    }
    val cluster = el(Cluster,
      el(Timestamp, uint(0L)) ++ el(SimpleBlock, clusterPayload))
    header ++ el(Segment,
      info ++ el(Tracks, trackEls.foldLeft(Array.empty[Byte])(_ ++ _)) ++ cluster)
  }

  /** REAL Matroska demux (pure JVM): the RFC 8794 EBML walk — varint
    * element IDs (marker kept) and sizes (marker stripped), descent into
    * the known containers, skip-by-size for everything else. Per-sample
    * codec decode stays behind the codec seam. None for non-EBML payloads,
    * truncated elements, or malformed varints. */
  def decodeMkv(bytes: Array[Byte]): Option[MkvInfo] =
    try {
      import Ebml._
      var docType = ""
      var tsScale = 1000000L // spec default: 1 ms
      var duration = 0.0
      var sawDuration = false
      val tracks = Vector.newBuilder[MkvTrack]
      var cluster: Array[Byte] = Array.empty
      // per-TrackEntry accumulation
      var tNum = 0L; var tType = 0L; var tW = 0; var tH = 0

      def readUint(start: Int, end: Int): Long = {
        var v = 0L
        var i = start
        while (i < end) { v = (v << 8) | (bytes(i) & 0xFF); i += 1 }
        v
      }

      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 8) throw new java.io.IOException("ebml nesting runaway")
        var pos = start
        while (pos < end) {
          val idLen = idLength(bytes(pos) & 0xFF)
          if (idLen < 0 || pos + idLen > end) throw new java.io.IOException("bad id")
          val id = readUint(pos, pos + idLen)
          pos += idLen
          if (pos >= end) throw new java.io.IOException("missing size")
          val first = bytes(pos) & 0xFF
          var sizeLen = 1
          while (sizeLen <= 8 && (first & (0x80 >> (sizeLen - 1))) == 0) sizeLen += 1
          if (sizeLen > 8 || pos + sizeLen > end) throw new java.io.IOException("bad size varint")
          val size = readUint(pos, pos + sizeLen) - (1L << (7 * sizeLen))
          pos += sizeLen
          if (size < 0 || pos + size > end) throw new java.io.IOException("truncated element")
          val bodyEnd = pos + size.toInt
          id match {
            case Header | Info | Tracks | Video => walk(pos, bodyEnd, depth + 1)
            case Segment => walk(pos, bodyEnd, depth + 1)
            case Cluster => walk(pos, bodyEnd, depth + 1)
            case TrackEntry =>
              tNum = 0L; tType = 0L; tW = 0; tH = 0
              walk(pos, bodyEnd, depth + 1)
              tracks += MkvTrack(tNum, tType, tW, tH)
            case DocType => docType = new String(bytes, pos, size.toInt, "US-ASCII")
            case TimestampScale => tsScale = readUint(pos, bodyEnd)
            case Duration =>
              sawDuration = true
              duration =
                if (size == 8L) java.nio.ByteBuffer.wrap(bytes, pos, 8).getDouble
                else if (size == 4L) java.nio.ByteBuffer.wrap(bytes, pos, 4).getFloat.toDouble
                else throw new java.io.IOException("bad float width")
            case TrackNumber => tNum = readUint(pos, bodyEnd)
            case TrackType => tType = readUint(pos, bodyEnd)
            case PixelWidth => tW = readUint(pos, bodyEnd).toInt
            case PixelHeight => tH = readUint(pos, bodyEnd).toInt
            case SimpleBlock =>
              // FIRST block wins, per the MkvInfo contract ("the first
              // cluster's block payload") — real files carry many blocks,
              // and last-wins would describe the final block instead
              if (cluster.isEmpty)
                cluster = java.util.Arrays.copyOfRange(bytes, pos, bodyEnd)
            case _ => () // skip-by-size: the demuxer contract
          }
          pos = bodyEnd
        }
      }
      walk(0, bytes.length, 0)
      if (docType != "matroska" || !sawDuration) None
      else Some(MkvInfo(docType, tsScale, duration, tracks.result(), cluster))
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class MkvFeatures(
      doc_id: Long,
      duration_ms: Long,
      n_tracks: Long,
      n_video_tracks: Long,
      width_sum: Long,
      height_sum: Long,
      cluster_bytes: Long,
      cluster_head_sum: Long,
      cluster_tail_byte: Long)

  /** Executor-side MKV demux + feature extraction, same shape as the other
    * decode paths. */
  def decodeMkvFeatures(media: DataFrame, idCol: String = "doc_id"): Dataset[MkvFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getStruct(mediaIdx).getAs[Array[Byte]]("bytes")
        decodeMkv(bytes).map { info =>
          MkvFeatures(id, info.durationMs,
            info.tracks.size.toLong,
            info.tracks.count(_.trackType == 1L).toLong,
            info.tracks.map(_.width.toLong).sum,
            info.tracks.map(_.height.toLong).sum,
            info.clusterPayload.length.toLong,
            info.clusterPayload.take(16).map(_ & 0xFF).sum.toLong,
            if (info.clusterPayload.isEmpty) -1L
            else (info.clusterPayload.last & 0xFF).toLong)
        }
      }
    }
  }

  /** STUB frame sampling for video payloads: yields every `stride`-th chunk
    * of the payload as a "frame" — the real implementation would demux; the
    * iterator/batch shape is what downstream consumes. */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Iterator[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 => chunk }

  // ------------------------------------------------------- frame container

  /** A REAL (if minimal) video container: magic + frame count + length-
    * prefixed encoded frames. The JDK has image codecs but no video demuxer,
    * so the engine ships its own deterministic container for the frame-
    * sampling path — parsing, striding, and per-frame decode are all real;
    * only the container format is engine-defined (an MJPEG-style
    * concatenation, which is exactly what early video pipelines used). */
  private val ContainerMagic = Array[Byte]('G', 'V', 'I', 'D')

  def encodeFrameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.write(ContainerMagic)
    dos.writeInt(frames.size)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    out.toByteArray
  }

  /** None for payloads that are not a well-formed container (wrong magic,
    * truncated frame, negative length) — tolerate-and-null like the codecs. */
  def decodeFrameContainer(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!magic.sameElements(ContainerMagic)) return None
      val n = in.readInt()
      if (n < 0 || n > (1 << 20)) return None
      Some((0 until n).map { _ =>
        val len = in.readInt()
        if (len < 0 || len > bytes.length) throw new java.io.IOException("bad frame length")
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class FrameFeatures(doc_id: Long, frame_idx: Long, width: Long,
                                 height: Long, px_sum: Long)

  /** Frame-sample + decode: parse the container, keep every `stride`-th
    * frame, decode each through the real image codec, emit per-frame
    * features. mapPartitions (codec per row, batch per partition) — the
    * same executor-side shape as the image/audio paths; malformed
    * containers and undecodable frames drop to no rows. */
  def videoFrameFeatures(media: DataFrame, stride: Int,
                         idCol: String = "doc_id"): Dataset[FrameFeatures] = {
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeFrameContainer(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex
            .collect { case (f, i) if i % stride == 0 => (f, i) }
            .flatMap { case (f, i) =>
              decodeImage(f).map { img =>
                var sum = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val p = img.getRGB(x, y)
                    sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                    x += 1
                  }
                  y += 1
                }
                FrameFeatures(id, i.toLong, img.getWidth.toLong,
                  img.getHeight.toLong, sum)
              }
            }
        }
      })
  }

  final case class FrameSignature(doc_id: Long, frame_idx: Long, width: Long,
                                  height: Long, sig: Long)

  /** Per-frame CONTENT signature for cross-video frame matching: a
    * position-weighted checksum of the decoded pixels —
    * sum of (r*65536 + g*256 + b) * (y*width + x + 1) over the frame.
    * Unlike px_sum (a decode checksum, permutation-invariant), the
    * positional weight makes distinct frames collide only by genuine
    * content equality for formula-generated fixtures, so a keyed equi-join
    * on (sig, width, height) is the video analogue of q144's image-hash
    * banding: frame pairs form strictly inside signature buckets, never
    * video x video. Exact integer arithmetic — an external SQL oracle
    * reproduces it bit-for-bit from the generator formulas. */
  def videoFrameSignatures(media: DataFrame,
                           idCol: String = "doc_id"): Dataset[FrameSignature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col("media.bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeFrameContainer(bytes).toSeq.flatMap { frames =>
          frames.zipWithIndex.flatMap { case (f, i) =>
            decodeImage(f).map { img =>
              val w = img.getWidth
              var sig = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y) & 0xFFFFFF
                  sig += p.toLong * (y.toLong * w + x + 1)
                  x += 1
                }
                y += 1
              }
              FrameSignature(id, i.toLong, w.toLong, img.getHeight.toLong, sig)
            }
          }
        }
      })
  }
}
