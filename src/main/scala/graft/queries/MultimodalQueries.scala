package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gates for the REAL multimodal decode paths.
  *
  * Both queries land a deterministic payload per document on the executors
  * (PNG via `ImageIO`, WAV via a canonical RIFF writer), round-trip it
  * through the actual JDK codec, and emit features the DuckDB oracle
  * recomputes from the generating formula alone. The Spark side only matches
  * if the codec encode -> bytes -> decode -> pixel/sample extraction chain is
  * byte-exact — a stub or a lossy path cannot pass the hash compare.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic image per doc: dims and per-channel pixel values are pure
    * functions of (doc_id, x, y), all mod-256 so PNG RGB holds them exactly. */
  private[queries] def pngFor(id: Long): Array[Byte] = {
    val w = (id % 13 + 4).toInt
    val h = (id % 11 + 4).toInt
    Multimodal.encodePng(w, h, (x, y) => {
      val r = ((id * 31 + x * 7 + y * 3) % 256).toInt
      val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
      val b = ((id * 23 + x * 13 + y) % 256).toInt
      (r << 16) | (g << 8) | b
    })
  }

  /** Deterministic PCM track per doc: (doc_id % 50) + 20 samples at 8 kHz,
    * sample i = ((doc_id*7 + i*13) % 2001) - 1000. */
  private[queries] def wavFor(id: Long): Array[Byte] = {
    val n = (id % 50 + 20).toInt
    val samples = Array.tabulate(n)(i => (((id * 7 + i * 13) % 2001) - 1000).toShort)
    Multimodal.encodeWavPcm16(8000, samples)
  }

  /** q51 — image decode under oracle: synth PNG -> `ImageIO.read` -> dims +
    * full-image checksum + nearest-neighbor 4x3 thumbnail checksum. */
  def q51(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, pngFor(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "image/png")
    Multimodal.decodeImageFeatures(media, thumbW = 4, thumbH = 3).toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("px_sum"), col("thumb_sum"))
      .orderBy(col("doc_id"))
  }

  /** The oracle recomputes every pixel from the formula — including the
    * thumbnail's floor-division source sampling — without touching a codec. */
  val q51Sql: String = """
    WITH dims AS (
      SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 11) + 4 AS h FROM documents
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      CAST(list_sum(flatten(list_transform(range(0, h), y ->
        list_transform(range(0, w), x ->
          ((doc_id*31 + x*7 + y*3) % 256)
          + ((doc_id*17 + x*5 + y*11) % 256)
          + ((doc_id*23 + x*13 + y) % 256))))) AS BIGINT) AS px_sum,
      CAST(list_sum(flatten(list_transform(range(0, 3), ty ->
        list_transform(range(0, 4), tx ->
          ((doc_id*31 + ((tx*w)//4)*7 + ((ty*h)//3)*3) % 256)
          + ((doc_id*17 + ((tx*w)//4)*5 + ((ty*h)//3)*11) % 256)
          + ((doc_id*23 + ((tx*w)//4)*13 + ((ty*h)//3)) % 256))))) AS BIGINT) AS thumb_sum
    FROM dims ORDER BY doc_id"""

  /** q52 — audio decode under oracle: synth WAV -> `AudioSystem` -> sample
    * rate, frame count, duration, |sample| checksum. */
  def q52(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, wavFor(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "audio/wav")
    Multimodal.decodeWavFeatures(media).toDF()
      .select(col("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"), col("duration_ms"), col("sum_abs"))
      .orderBy(col("doc_id"))
  }

  val q52Sql: String = """
    SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
      CAST(n AS BIGINT) AS n_samples,
      CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
      CAST(list_sum(list_transform(range(0, n), i ->
        abs(((doc_id*7 + i*13) % 2001) - 1000))) AS BIGINT) AS sum_abs
    FROM (SELECT doc_id, (doc_id % 50) + 20 AS n FROM documents)
    ORDER BY doc_id"""

  /** Deterministic 6-frame container per doc: frame f is a PNG whose dims
    * depend on the doc and whose pixels depend on (doc, frame, x, y). */
  private[queries] def videoFor(id: Long): Array[Byte] = {
    val w = (id % 7 + 3).toInt
    val h = (id % 5 + 3).toInt
    val frames = (0 until 6).map { f =>
      Multimodal.encodePng(w, h, (x, y) => {
        val r = ((id * 31 + f * 19 + x * 7 + y * 3) % 256).toInt
        val g = ((id * 17 + f * 29 + x * 5 + y * 11) % 256).toInt
        val b = ((id * 23 + f * 37 + x * 13 + y) % 256).toInt
        (r << 16) | (g << 8) | b
      })
    }
    Multimodal.encodeFrameContainer(frames)
  }

  /** q94 — video frame sampling under oracle: container demux (engine's
    * own MJPEG-style format — the JDK ships no video demuxer) -> every 2nd
    * frame -> real PNG decode -> per-frame checksum. */
  def q94(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, videoFor(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "video/x-graft-frames")
    Multimodal.videoFrameFeatures(media, stride = 2).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("px_sum"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val q94Sql: String = """
    WITH dims AS (
      SELECT doc_id, (doc_id % 7) + 3 AS w, (doc_id % 5) + 3 AS h FROM documents
    ), frames AS (
      SELECT doc_id, w, h, unnest([0, 2, 4]) AS f FROM dims
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      CAST(list_sum(flatten(list_transform(range(0, h), y ->
        list_transform(range(0, w), x ->
          ((doc_id*31 + f*19 + x*7 + y*3) % 256)
          + ((doc_id*17 + f*29 + x*5 + y*11) % 256)
          + ((doc_id*23 + f*37 + x*13 + y) % 256))))) AS BIGINT) AS px_sum
    FROM frames ORDER BY doc_id, frame_idx"""

  /** Deterministic VBR MP3 per doc: (doc_id % 8) + 5 frames, sample rate by
    * doc_id % 3, per-frame bitrate/padding by (doc_id + f), payload byte j =
    * (doc_id*7 + f*31 + j*13) % 251 — every demuxed feature recomputable
    * from these formulas. Half the docs lead with an ID3v2 tag the demuxer
    * must skip; features are identical either way. */
  private[queries] def mp3For(id: Long): Array[Byte] = {
    val n = (id % 8 + 5).toInt
    val rateIdx = (id % 3).toInt
    val frames = (0 until n).map { f =>
      Multimodal.Mp3FrameSpec(
        bitrateIdx = ((id + f) % 14 + 1).toInt,
        rateIdx = rateIdx,
        padding = ((id + f) % 2).toInt,
        payloadByte = j => ((id * 7 + f * 31 + j * 13) % 251).toByte)
    }
    val id3 = if (id % 2 == 0)
      Some(Array.tabulate((id % 40 + 10).toInt)(i => ((id + i) % 127).toByte))
    else None
    Multimodal.encodeMp3(frames, id3)
  }

  /** q97 — MP3 demux under oracle: synth VBR MPEG-1 Layer III (ID3v2-tagged
    * on half the docs) -> pure-JVM frame walk -> rates, frame/sample counts,
    * duration, and boundary checksums. The non-JDK format next to q51
    * (PNG/ImageIO) and q52 (WAV/AudioSystem). */
  def q97(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, mp3For(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "audio/mpeg")
    Multimodal.decodeMp3Features(media).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_frames"),
        col("n_samples"), col("duration_ms"), col("total_bytes"),
        col("head_sum"), col("tail_sum"))
      .orderBy(col("doc_id"))
  }

  /** The oracle re-derives frame sizes from the Layer III formula and the
    * payload checksums from the generating arithmetic — no codec, no demux:
    * only a byte-exact frame walk on the Spark side can match. */
  val q97Sql: String = """
    WITH base AS (
      SELECT doc_id, (doc_id % 8) + 5 AS n,
        list_extract([44100, 48000, 32000], CAST(doc_id % 3 AS INTEGER) + 1) AS rate
      FROM documents
    ), frames AS (
      SELECT doc_id, n, rate, unnest(range(0, n)) AS f FROM base
    ), sized AS (
      SELECT doc_id, n, rate, f,
        (144000 * list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
           CAST((doc_id + f) % 14 AS INTEGER) + 1)) // rate + ((doc_id + f) % 2) AS fsize
      FROM frames
    )
    SELECT doc_id,
      CAST(rate AS BIGINT) AS sample_rate,
      CAST(n AS BIGINT) AS n_frames,
      CAST(n * 1152 AS BIGINT) AS n_samples,
      CAST((n * 1152 * 1000) // rate AS BIGINT) AS duration_ms,
      CAST(sum(fsize) AS BIGINT) AS total_bytes,
      CAST(sum(list_sum(list_transform(range(0, 16), j ->
        (doc_id*7 + f*31 + j*13) % 251))) AS BIGINT) AS head_sum,
      CAST(sum((doc_id*7 + f*31 + (fsize - 5)*13) % 251) AS BIGINT) AS tail_sum
    FROM sized
    GROUP BY doc_id, n, rate
    ORDER BY doc_id"""

  /** Deterministic MP4 per doc: movie timescale/duration, (doc_id % 3) + 1
    * tracks with formula dims, and an mdat payload byte j =
    * (doc_id*11 + j*17) % 251. Every demuxed feature recomputable. */
  private[queries] def mp4For(id: Long): Array[Byte] = {
    val timescale = 600L * (id % 4 + 1)
    val duration = id % 5000 + 1000
    val tracks = (0 until (id % 3 + 1).toInt).map { t =>
      Multimodal.Mp4Track(t + 1L,
        (id % 640 + 16 + t).toInt, (id % 480 + 16 + 2 * t).toInt)
    }
    val mdat = Array.tabulate((id % 257 + 32).toInt)(j => ((id * 11 + j * 17) % 251).toByte)
    Multimodal.encodeMp4("isom", timescale, duration, tracks, mdat)
  }

  /** q98 — MP4 (ISO BMFF) demux under oracle: synth box tree -> pure-JVM
    * box walk (ftyp/moov/mvhd/trak/tkhd/mdat, skip-by-size for the rest) ->
    * brand, duration, track dims, mdat boundary checksums. */
  def q98(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, mp4For(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "video/mp4")
    Multimodal.decodeMp4Features(media).toDF()
      .select(col("doc_id"), col("brand"), col("duration_ms"), col("n_tracks"),
        col("width_sum"), col("height_sum"), col("mdat_bytes"),
        col("mdat_head_sum"), col("mdat_tail_byte"))
      .orderBy(col("doc_id"))
  }

  val q98Sql: String = """
    WITH base AS (
      SELECT doc_id,
        600 * (doc_id % 4 + 1) AS ts,
        doc_id % 5000 + 1000 AS dur,
        (doc_id % 3) + 1 AS nt,
        doc_id % 257 + 32 AS mlen
      FROM documents
    )
    SELECT doc_id, 'isom' AS brand,
      CAST((dur * 1000) // ts AS BIGINT) AS duration_ms,
      CAST(nt AS BIGINT) AS n_tracks,
      CAST(list_sum(list_transform(range(0, nt), t ->
        doc_id % 640 + 16 + t)) AS BIGINT) AS width_sum,
      CAST(list_sum(list_transform(range(0, nt), t ->
        doc_id % 480 + 16 + 2*t)) AS BIGINT) AS height_sum,
      CAST(mlen AS BIGINT) AS mdat_bytes,
      CAST(list_sum(list_transform(range(0, 16), j ->
        (doc_id*11 + j*17) % 251)) AS BIGINT) AS mdat_head_sum,
      CAST((doc_id*11 + (mlen - 1)*17) % 251 AS BIGINT) AS mdat_tail_byte
    FROM base ORDER BY doc_id"""

  /** Deterministic MKV per doc: 1 ms timestamp scale, formula duration,
    * (doc_id % 3) + 1 tracks alternating video/audio, cluster payload byte
    * j = (doc_id*13 + j*19) % 251. */
  private[queries] def mkvFor(id: Long): Array[Byte] = {
    val tracks = (0 until (id % 3 + 1).toInt).map { t =>
      Multimodal.MkvTrack(t + 1L, if (t % 2 == 0) 1L else 2L,
        (id % 512 + 32 + 3 * t).toInt, (id % 384 + 24 + 5 * t).toInt)
    }
    val cluster = Array.tabulate((id % 199 + 24).toInt)(j => ((id * 13 + j * 19) % 251).toByte)
    Multimodal.encodeMkv(1000000L, (id % 5000 + 1000).toDouble, tracks, cluster)
  }

  /** q99 — Matroska/EBML demux under oracle: synth element tree -> pure-JVM
    * varint walk (RFC 8794) -> duration, track dims, cluster boundary
    * checksums. Completes the container trio next to q97 (MP3) and q98
    * (ISO BMFF). */
  def q99(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, mkvFor(id))))
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "video/x-matroska")
    Multimodal.decodeMkvFeatures(media).toDF()
      .select(col("doc_id"), col("duration_ms"), col("n_tracks"),
        col("n_video_tracks"), col("width_sum"), col("height_sum"),
        col("cluster_bytes"), col("cluster_head_sum"), col("cluster_tail_byte"))
      .orderBy(col("doc_id"))
  }

  val q99Sql: String = """
    WITH base AS (
      SELECT doc_id,
        doc_id % 5000 + 1000 AS dur_ms,
        (doc_id % 3) + 1 AS nt,
        doc_id % 199 + 24 AS clen
      FROM documents
    )
    SELECT doc_id,
      CAST(dur_ms AS BIGINT) AS duration_ms,
      CAST(nt AS BIGINT) AS n_tracks,
      CAST((nt + 1) // 2 AS BIGINT) AS n_video_tracks,
      CAST(list_sum(list_transform(range(0, nt), t ->
        doc_id % 512 + 32 + 3*t)) AS BIGINT) AS width_sum,
      CAST(list_sum(list_transform(range(0, nt), t ->
        doc_id % 384 + 24 + 5*t)) AS BIGINT) AS height_sum,
      CAST(clen AS BIGINT) AS cluster_bytes,
      CAST(list_sum(list_transform(range(0, 16), j ->
        (doc_id*13 + j*19) % 251)) AS BIGINT) AS cluster_head_sum,
      CAST((doc_id*13 + (clen - 1)*19) % 251 AS BIGINT) AS cluster_tail_byte
    FROM base ORDER BY doc_id"""

  /** q121 — cross-format image dedup by perceptual hash: every cluster of
    * 5 documents shares ONE pixel formula, but even docs carry it as PNG
    * and odd docs as BMP — byte-level hashes see 500 distinct blobs,
    * while the aHash over DECODED pixels (8x8 nearest sample, integer
    * luma, floor-mean threshold — `Multimodal.decodeImageAHash`)
    * reassembles the 100 content clusters across container formats. The
    * dedup group-by runs on the two 32-bit hash halves; survivor = min
    * doc_id (the dedup family's convention). The oracle recomputes every
    * hash from the generating formula alone — the Spark side can only
    * match if BOTH codec paths (PNG and BMP encode -> decode) are
    * pixel-lossless.
    *
    * Scale shape: decode + hash is one mapPartitions pass (per-thread
    * cached readers); what shuffles is (doc_id, 2 longs) — ~10^-4 of
    * image corpus bytes — and the group-by is the exact-dedup shape. */
  def q121(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val c = id / 5
        val w = (c % 13 + 4).toInt
        val h = (c % 11 + 4).toInt
        val rgb = (x: Int, y: Int) => {
          val r = ((c * 31 + x * 7 + y * 3) % 256).toInt
          val g = ((c * 17 + x * 5 + y * 11) % 256).toInt
          val b = ((c * 23 + x * 13 + y) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        val bytes =
          if (id % 2 == 0) Multimodal.encodePng(w, h, rgb)
          else Multimodal.encodeBmp(w, h, rgb)
        (id, bytes)
      })
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "application/octet-stream")
    val hashes = Multimodal.decodeImageAHash(media).toDF()
      .withColumn("fmt", when(col("doc_id") % 2 === 0, lit("png")).otherwise(lit("bmp")))
    val groups = hashes.groupBy(col("hash_hi"), col("hash_lo"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("canonical"))
    hashes.join(broadcast(groups), Seq("hash_hi", "hash_lo"))
      .select(col("doc_id"), col("fmt"), col("hash_hi"), col("hash_lo"),
        col("cluster_size"), col("canonical"))
      .orderBy(col("doc_id"))
  }

  val q121Sql: String = """
    WITH dims AS (
      SELECT doc_id, doc_id // 5 AS c,
        CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
        ((doc_id // 5) % 13) + 4 AS w, ((doc_id // 5) % 11) + 4 AS h
      FROM documents),
    g AS (
      SELECT d.doc_id, d.fmt, gi.i, gj.j,
        ( ((d.c*31 + ((gi.i*d.w)//8)*7  + ((gj.j*d.h)//8)*3)  % 256) * 299
        + ((d.c*17 + ((gi.i*d.w)//8)*5  + ((gj.j*d.h)//8)*11) % 256) * 587
        + ((d.c*23 + ((gi.i*d.w)//8)*13 + ((gj.j*d.h)//8))    % 256) * 114) // 1000 AS gray
      FROM dims d, (SELECT unnest(range(0, 8)) AS i) gi,
                   (SELECT unnest(range(0, 8)) AS j) gj),
    m AS (SELECT doc_id, CAST(sum(gray) // 64 AS BIGINT) AS mean FROM g GROUP BY doc_id),
    bits AS (
      SELECT g.doc_id, g.fmt, g.i, g.j,
        CASE WHEN g.gray >= m.mean THEN 1 ELSE 0 END AS b
      FROM g JOIN m USING (doc_id)),
    hashes AS (
      SELECT doc_id, fmt,
        CAST(sum(CASE WHEN j*8 + i < 32 THEN b * CAST(2 ** (j*8 + i) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_hi,
        CAST(sum(CASE WHEN j*8 + i >= 32 THEN b * CAST(2 ** (j*8 + i - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id, fmt),
    grp AS (
      SELECT hash_hi, hash_lo, CAST(count(*) AS BIGINT) AS cluster_size,
        min(doc_id) AS canonical
      FROM hashes GROUP BY hash_hi, hash_lo)
    SELECT h.doc_id, h.fmt, h.hash_hi, h.hash_lo, g2.cluster_size, g2.canonical
    FROM hashes h JOIN grp g2 USING (hash_hi, hash_lo)
    ORDER BY h.doc_id"""

  /** q128 — audio content dedup: clusters of 5 docs share one PCM
    * formula; even docs carry it as a canonical WAV, odd docs as a
    * byte-different tagged WAV (LIST/INFO chunk the JDK parser skips).
    * The 16-frame energy-envelope fingerprint over DECODED samples
    * (`Multimodal.decodeAudioFingerprint`) reassembles content clusters
    * across containers — the audio analog of q121, proving the dedup key
    * is the signal, not the bytes. Oracle recomputes every fingerprint
    * from the sample formula; scale shape identical to q121 (one decode
    * pass, (doc_id, n, fp) is all that shuffles). */
  def q128(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val c = id / 5
        val n = (c % 50 + 20).toInt
        val samples = Array.tabulate(n)(i => (((c * 7 + i * 13) % 2001) - 1000).toShort)
        val bytes =
          if (id % 2 == 0) Multimodal.encodeWavPcm16(8000, samples)
          else Multimodal.encodeWavPcm16Tagged(8000, samples, s"cluster $c")
        (id, bytes)
      })
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "audio/wav")
    val fps = Multimodal.decodeAudioFingerprint(media).toDF()
      .withColumn("container",
        when(col("doc_id") % 2 === 0, lit("plain")).otherwise(lit("tagged")))
    val groups = fps.groupBy(col("n_samples"), col("fp"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("canonical"))
    fps.join(broadcast(groups), Seq("n_samples", "fp"))
      .select(col("doc_id"), col("container"), col("n_samples"), col("fp"),
        col("cluster_size"), col("canonical"))
      .orderBy(col("doc_id"))
  }

  val q128Sql: String = """
    WITH dims AS (
      SELECT doc_id, doc_id // 5 AS c,
        CASE WHEN doc_id % 2 = 0 THEN 'plain' ELSE 'tagged' END AS container,
        (doc_id // 5) % 50 + 20 AS n
      FROM documents),
    fr AS (
      SELECT d.doc_id, d.container, d.n, fs.f,
        CAST(list_sum(list_transform(range(fs.f * d.n // 16, (fs.f + 1) * d.n // 16),
          i -> (((d.c*7 + i*13) % 2001) - 1000) * (((d.c*7 + i*13) % 2001) - 1000)))
          AS BIGINT) AS e
      FROM dims d, (SELECT unnest(range(0, 16)) AS f) fs),
    tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS te FROM fr GROUP BY doc_id),
    fps AS (
      SELECT fr.doc_id, fr.container, CAST(max(fr.n) AS BIGINT) AS n_samples,
        CAST(sum(CASE WHEN fr.e * 16 >= t.te
          THEN CAST(2 ** fr.f AS BIGINT) ELSE 0 END) AS BIGINT) AS fp
      FROM fr JOIN tot t USING (doc_id)
      GROUP BY fr.doc_id, fr.container),
    grp AS (
      SELECT n_samples, fp, CAST(count(*) AS BIGINT) AS cluster_size,
        min(doc_id) AS canonical
      FROM fps GROUP BY n_samples, fp)
    SELECT f.doc_id, f.container, f.n_samples, f.fp, g.cluster_size, g.canonical
    FROM fps f JOIN grp g USING (n_samples, fp)
    ORDER BY f.doc_id"""

  /** q144 — image NEAR-dup by Hamming-banded perceptual hash: q121 finds
    * exact aHash clusters; this finds images whose hashes differ in a few
    * bits — the re-encoded / slightly-edited duplicates a crawl is full
    * of. Every cluster of 5 docs shares one pixel formula, but each
    * variant v = doc_id % 5 INVERTS the pixel column x = (v*w)/8 at
    * y = 0 (a deterministic "edit"), so in-cluster hashes differ by the
    * few sampled-grid bits that edit touches (plus mean-threshold
    * ripple) while cross-cluster hashes are ~32 bits apart. Candidates
    * come from SimHash-style banding — the 64-bit hash splits into four
    * 16-bit bands, a pair is a candidate iff SOME band matches exactly —
    * then the Hamming verify keeps pairs within `HamT` bits. The oracle
    * replays generator + decode + banding + popcount from the formula
    * alone, so both codec paths must stay pixel-lossless under edits.
    *
    * Scale shape: decode+hash is one mapPartitions pass; what shuffles is
    * four (band, 16-bit value) rows per image — the q22/q25 banding
    * discipline applied to a binary modality. In-bucket pairing is
    * bounded by bucket size (16-bit bands over ~uniform hashes); the
    * verify is popcount on two longs. No image ever compares against the
    * whole corpus. */
  val HamT = 12

  def q144(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val c = id / 5
        val v = (id % 5).toInt
        val w = (c % 13 + 4).toInt
        val h = (c % 11 + 4).toInt
        val px = v * w / 8
        // c*x / c*y cross terms: without them the luma surface is linear
        // in (x, y) with cluster-independent slopes, and 8x8-sampled
        // hashes of DIFFERENT content collide within a few bits
        val rgb = (x: Int, y: Int) => {
          val r = ((c * 31 + x * 7 + y * 3 + c * x * 5 + c * y * 2) % 256).toInt
          val g = ((c * 17 + x * 5 + y * 11 + c * x * 3 + c * y * 7) % 256).toInt
          val b = ((c * 23 + x * 13 + y + c * x * 11 + c * y * 5) % 256).toInt
          if (x == px && y == 0) ((255 - r) << 16) | ((255 - g) << 8) | (255 - b)
          else (r << 16) | (g << 8) | b
        }
        val bytes =
          if (id % 2 == 0) Multimodal.encodePng(w, h, rgb)
          else Multimodal.encodeBmp(w, h, rgb)
        (id, bytes)
      })
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "application/octet-stream")
    val hashes = Multimodal.decodeImageAHash(media).toDF()
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"))
      .localCheckpoint(true) // one decode pass feeds bands + both join legs
    val bands = hashes.select(col("doc_id"), posexplode(array(
      expr("hash_hi % 65536"), expr("hash_hi DIV 65536"),
      expr("hash_lo % 65536"), expr("hash_lo DIV 65536")))
      .as(Seq("bidx", "bval")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(hashes.select(col("doc_id").as("doc_a"),
        col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a")), Seq("doc_a"))
      .join(hashes.select(col("doc_id").as("doc_b"),
        col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b")), Seq("doc_b"))
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").cast("long"))
      .filter(col("hamming") <= HamT)
      .withColumn("same_content", expr("doc_a DIV 5 = doc_b DIV 5"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("same_content"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q144Sql: String = s"""
    WITH dims AS (
      SELECT doc_id, doc_id // 5 AS c, CAST(doc_id % 5 AS BIGINT) AS v,
        ((doc_id // 5) % 13) + 4 AS w, ((doc_id // 5) % 11) + 4 AS h
      FROM documents),
    g0 AS (
      SELECT d.doc_id, gi.i, gj.j,
        ((d.c*31 + ((gi.i*d.w)//8)*7  + ((gj.j*d.h)//8)*3 + d.c*((gi.i*d.w)//8)*5  + d.c*((gj.j*d.h)//8)*2) % 256) AS r,
        ((d.c*17 + ((gi.i*d.w)//8)*5  + ((gj.j*d.h)//8)*11 + d.c*((gi.i*d.w)//8)*3  + d.c*((gj.j*d.h)//8)*7) % 256) AS gg,
        ((d.c*23 + ((gi.i*d.w)//8)*13 + ((gj.j*d.h)//8) + d.c*((gi.i*d.w)//8)*11 + d.c*((gj.j*d.h)//8)*5) % 256) AS bb,
        ((gi.i*d.w)//8 = (d.v*d.w)//8 AND (gj.j*d.h)//8 = 0) AS edited
      FROM dims d, (SELECT unnest(range(0, 8)) AS i) gi,
                   (SELECT unnest(range(0, 8)) AS j) gj),
    g AS (
      SELECT doc_id, i, j,
        CASE WHEN edited
             THEN (255000 - (r*299 + gg*587 + bb*114)) // 1000
             ELSE (r*299 + gg*587 + bb*114) // 1000 END AS gray
      FROM g0),
    m AS (SELECT doc_id, CAST(sum(gray) // 64 AS BIGINT) AS mean FROM g GROUP BY doc_id),
    bits AS (
      SELECT g.doc_id, g.i, g.j,
        CASE WHEN g.gray >= m.mean THEN 1 ELSE 0 END AS b
      FROM g JOIN m USING (doc_id)),
    hashes AS (
      SELECT doc_id,
        CAST(sum(CASE WHEN j*8 + i < 32 THEN b * CAST(2 ** (j*8 + i) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_hi,
        CAST(sum(CASE WHEN j*8 + i >= 32 THEN b * CAST(2 ** (j*8 + i - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, u.bidx,
        CASE u.bidx WHEN 0 THEN hash_hi % 65536 WHEN 1 THEN hash_hi // 65536
                    WHEN 2 THEN hash_lo % 65536 ELSE hash_lo // 65536 END AS bval
      FROM hashes, (SELECT unnest(range(0, 4)) AS bidx) u),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b,
      CAST(bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) AS BIGINT) AS hamming,
      (doc_a // 5 = doc_b // 5) AS same_content
    FROM cand
    JOIN hashes a ON a.doc_id = doc_a
    JOIN hashes b ON b.doc_id = doc_b
    WHERE bit_count(xor(a.hash_hi, b.hash_hi)) + bit_count(xor(a.hash_lo, b.hash_lo)) <= $HamT
    ORDER BY doc_a, doc_b"""

  /** q168 — cross-VIDEO near-dup by shared frames: the q144 discipline on
    * the video modality. Every group of 4 videos shows the same scene
    * sequence shifted by its variant (variant v's frame f is scene v+f),
    * so within a group, videos v_a and v_b genuinely share 6-|v_a-v_b|
    * frames — re-cut/re-intro'd copies of one broadcast, the real shape of
    * video dup in a crawl. The engine path is REAL end-to-end: PNG-encoded
    * frames in the engine's container, demuxed and codec-decoded
    * executor-side, per-frame position-weighted content signatures
    * ([[Multimodal.videoFrameSignatures]]), then an equi-join on
    * (signature, dims) — frame pairs form strictly inside signature
    * buckets, video x video is never materialized. Pairs sharing >= 3
    * frames are reported with their overlap permille.
    *
    * Scale shape: signatures are ~6 rows x 4 longs per video (~10^-5 of
    * media bytes); the one shuffle keys by signature value; the pair
    * rollup is map-side combinable; decode cost is one codec pass per
    * video, embarrassingly parallel. The oracle replays the signature
    * arithmetic bit-for-bit from the generator formulas. */
  def q168(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 4
        val v = (id % 4).toInt
        val w = (g % 7 + 3).toInt
        val h = (g % 5 + 3).toInt
        val frames = (0 until 6).map { f =>
          val s = v + f
          Multimodal.encodePng(w, h, (x, y) => {
            val r = ((g * 31 + s * 19 + x * 7 + y * 3 + g * x * 5 + g * y * 2) % 256).toInt
            val gg = ((g * 17 + s * 29 + x * 5 + y * 11 + g * x * 3 + g * y * 7) % 256).toInt
            val b = ((g * 23 + s * 37 + x * 13 + y + g * x * 11 + g * y * 5) % 256).toInt
            (r << 16) | (gg << 8) | b
          })
        }
        (id, Multimodal.encodeFrameContainer(frames))
      })
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "video/x-graft-frames")
    val sigs = Multimodal.videoFrameSignatures(media).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("sig"))
      .localCheckpoint(true) // one demux+decode pass feeds both join legs
    sigs.as("x").join(sigs.as("y"),
        col("x.sig") === col("y.sig") && col("x.width") === col("y.width") &&
          col("x.height") === col("y.height") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 3)
      .withColumn("overlap_pm", expr("(n_shared * 1000) DIV 6"))
      .withColumn("same_group", expr("doc_a DIV 4 = doc_b DIV 4"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q168Sql: String = """
    WITH base AS (
      SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS v,
        ((doc_id // 4) % 7) + 3 AS w, ((doc_id // 4) % 5) + 3 AS h
      FROM documents),
    fr AS (SELECT doc_id, g, v, w, h, unnest(range(0, 6)) AS f FROM base),
    px AS (
      SELECT doc_id, g, w, h, f, v + f AS s, gx.x, gy.y
      FROM fr, (SELECT unnest(range(0, 9)) AS x) gx,
               (SELECT unnest(range(0, 7)) AS y) gy
      WHERE gx.x < w AND gy.y < h),
    sigs AS (
      SELECT doc_id, w, h, f,
        CAST(sum((((g*31 + s*19 + x*7 + y*3 + g*x*5 + g*y*2) % 256) * 65536
                + ((g*17 + s*29 + x*5 + y*11 + g*x*3 + g*y*7) % 256) * 256
                + ((g*23 + s*37 + x*13 + y + g*x*11 + g*y*5) % 256))
              * (y*w + x + 1)) AS BIGINT) AS sig
      FROM px GROUP BY doc_id, w, h, f)
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      CAST(count(*) AS BIGINT) AS n_shared,
      (CAST(count(*) AS BIGINT) * 1000) // 6 AS overlap_pm,
      (x.doc_id // 4 = y.doc_id // 4) AS same_group
    FROM sigs x JOIN sigs y
      ON x.sig = y.sig AND x.w = y.w AND x.h = y.h AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
    HAVING count(*) >= 3
    ORDER BY doc_a, doc_b"""

  private val AudioDiffT = 2

  /** q176 — audio NEAR-dup, completing the near-dup matrix (image q144 /
    * video q168 / audio here; q128 is audio EXACT dedup). Groups of 3
    * clips share one base signal; variants v=1,2 perturb ONE energy
    * window (+v*40 on the v-th sixteenth) — the re-mastered /
    * slightly-edited copies a crawl carries. Real WAV bytes round-trip
    * the JDK codec (alternating plain/tagged containers, so matching is
    * signal-level). A near-dup pair = same length, at most
    * [[AudioDiffT]] of the 16 exact integer window energies differ, and
    * total energies within 10%.
    *
    * Candidate generation is q168's POSITIONAL-signature discipline:
    * band keys are the exact energies of each quarter of the envelope
    * (4 windows hashed per band), so buckets key actual signal CONTENT
    * and unrelated same-length clips never collide. The prior design
    * banded 4-bit nibbles of the 16-bit binary envelope — a 16-value
    * alphabet whose (n_samples, nibble) buckets collide quadratically
    * (98k candidate pairs at sf0.1; candidates ~ B^2/16 per bucket at
    * 100x) and only an energy verify rescued precision to ~59%. With
    * content bands, candidates track the true duplicate structure
    * (BENCH_sf1_audio_100x.json) and verify-leg precision is exact.
    * Exactness by pigeonhole: <=2 differing windows touch <=2 of the 4
    * disjoint quarter bands, so every qualifying pair shares an intact
    * band. */
  def q176(spark: SparkSession, d: String): DataFrame =
    q176Verified(q176Candidates(spark, d))

  /** The decoded signature frame + banded candidate pairs, exposed so the
    * scale sidecar can record candidate counts next to verified counts. */
  private[graft] def q176Candidates(spark: SparkSession, d: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val payloads = Tables.parallel(Tables.documents(spark, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val c = id / 3
        val v = (id % 3).toInt
        val n = (c % 40 + 24).toInt
        val samples = Array.tabulate(n) { i =>
          val base = ((c * 7 + i * 13) % 2001) - 1000
          val pert =
            if (v > 0 && i >= v * n / 16 && i < (v + 1) * n / 16) v * 40 else 0
          (base + pert).toShort
        }
        val bytes =
          if (id % 2 == 0) Multimodal.encodeWavPcm16(8000, samples)
          else Multimodal.encodeWavPcm16Tagged(8000, samples, s"cluster $c")
        (id, bytes)
      })
      .toDF("doc_id", "payload")
    val media = Multimodal.asMedia(payloads, "payload", "audio/wav")
    val fps = Multimodal.decodeAudioEnergyWindows(media).toDF()
      .localCheckpoint(true) // one decode pass feeds bands + both join legs
    // band value = hash of the quarter's four EXACT window energies (hash
    // equality is implied by tuple equality, so hashing keeps the
    // candidate set a superset; spurious hash collisions only add
    // candidates the verify leg drops)
    val bands = fps.select(col("doc_id"), col("n_samples"), posexplode(array(
      (0 until 4).map(k => xxhash64(slice(col("wins"), 1 + 4 * k, 4))): _*))
      .as(Seq("bidx", "bval")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.n_samples") === col("y.n_samples") &&
          col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (fps, cand)
  }

  /** The verify leg: exact differing-window count + total-energy band. */
  private[graft] def q176Verified(fc: (DataFrame, DataFrame)): DataFrame = {
    val (fps, cand) = fc
    cand
      .join(fps.select(col("doc_id").as("doc_a"), col("wins").as("wins_a"),
        col("te").as("te_a")), Seq("doc_a"))
      .join(fps.select(col("doc_id").as("doc_b"), col("wins").as("wins_b"),
        col("te").as("te_b")), Seq("doc_b"))
      .withColumn("n_diff_win",
        expr("size(filter(zip_with(wins_a, wins_b, (x, y) -> x != y), b -> b))")
          .cast("long"))
      .filter(col("n_diff_win") <= AudioDiffT &&
        abs(col("te_a") - col("te_b")) * 10 <= least(col("te_a"), col("te_b")))
      .withColumn("same_content", expr("doc_a DIV 3 = doc_b DIV 3"))
      .select(col("doc_a"), col("doc_b"), col("n_diff_win"), col("same_content"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q176Sql: String = s"""
    WITH dims AS (
      SELECT doc_id, doc_id // 3 AS c, CAST(doc_id % 3 AS BIGINT) AS v,
        ((doc_id // 3) % 40) + 24 AS n
      FROM documents),
    fr AS (
      SELECT d.doc_id, d.n, fs.f,
        CAST(list_sum(list_transform(range(fs.f * d.n // 16, (fs.f + 1) * d.n // 16),
          i -> (((d.c*7 + i*13) % 2001) - 1000
                + (CASE WHEN d.v > 0 AND i >= d.v * d.n // 16
                        AND i < (d.v + 1) * d.n // 16 THEN d.v * 40 ELSE 0 END))
             * (((d.c*7 + i*13) % 2001) - 1000
                + (CASE WHEN d.v > 0 AND i >= d.v * d.n // 16
                        AND i < (d.v + 1) * d.n // 16 THEN d.v * 40 ELSE 0 END))))
          AS BIGINT) AS e
      FROM dims d, (SELECT unnest(range(0, 16)) AS f) fs),
    fps AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
        CAST(sum(e) AS BIGINT) AS te,
        list(e ORDER BY f) AS es
      FROM fr GROUP BY doc_id)
    SELECT doc_a, doc_b, n_diff_win, same_content FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(list_sum(list_transform(range(1, 17),
          i -> CASE WHEN a.es[i] = b.es[i] THEN 0 ELSE 1 END)) AS BIGINT)
          AS n_diff_win,
        (a.doc_id // 3 = b.doc_id // 3) AS same_content
      FROM fps a JOIN fps b
        ON a.n_samples = b.n_samples AND a.doc_id < b.doc_id
        AND abs(a.te - b.te) * 10 <= least(a.te, b.te))
    WHERE n_diff_win <= $AudioDiffT
    ORDER BY doc_a, doc_b"""

  val defs: Map[String, Q] = Map(
    "q176_audio_neardup" -> (q176 _),
    "q168_video_neardup" -> (q168 _),
    "q144_image_neardup" -> (q144 _),
    "q128_audio_dedup" -> (q128 _),
    "q121_image_dedup" -> (q121 _),
    "q51_image_decode" -> (q51 _),
    "q52_audio_decode" -> (q52 _),
    "q94_video_frames" -> (q94 _),
    "q97_mp3_demux" -> (q97 _),
    "q98_mp4_demux" -> (q98 _),
    "q99_mkv_demux" -> (q99 _))

  val oracles: Map[String, String] = Map(
    "q176_audio_neardup" -> q176Sql,
    "q168_video_neardup" -> q168Sql,
    "q144_image_neardup" -> q144Sql,
    "q128_audio_dedup" -> q128Sql,
    "q121_image_dedup" -> q121Sql,
    "q51_image_decode" -> q51Sql,
    "q52_audio_decode" -> q52Sql,
    "q94_video_frames" -> q94Sql,
    "q97_mp3_demux" -> q97Sql,
    "q98_mp4_demux" -> q98Sql,
    "q99_mkv_demux" -> q99Sql)
}
