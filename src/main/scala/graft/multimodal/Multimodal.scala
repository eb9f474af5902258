package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the Spark-side plumbing (schema,
  * partitioning, batch shape) for decode / feature-extract stages.
  *
  * IMAGE decode is REAL: [[imageStats]] /
  * [[graft.expressions.ImageDecodeStats]] decodes PNG/JPEG/GIF/BMP with
  * the JDK's ImageIO and extracts width/height/channels/per-channel
  * means (deterministic capped pixel sample). AUDIO decode is REAL for
  * the JDK-native containers: [[audioStats]] /
  * [[graft.expressions.AudioDecodeStats]] parses WAV/AIFF/AU with
  * `javax.sound.sampled` — sample rate, channels, bit depth, frames,
  * duration, bounded-prefix RMS. VIDEO splits in three: container
  * METADATA is REAL ([[videoStats]] / [[graft.expressions.VideoContainerMeta]]
  * parses MP4 box and AVI RIFF headers — published byte layouts, no
  * codec needed — for brand/duration/tracks/dimensions); the FRAME
  * INDEX is REAL ([[keyframeRanges]] / [[graft.expressions.Mp4FrameIndex]]
  * expands the MP4 sample tables into per-frame byte offsets, sizes,
  * timestamps and keyframe flags — the byte ranges a fetch layer reads
  * instead of whole files); only PIXEL decode remains STUBBED — this
  * container ships no video codec —
  * behind `decodeFeaturesStub`, a
  * deterministic fake (hash-derived pseudo-features) with the same
  * schema, batching and partitioning behavior a real decoder (JNI codec
  * or mapInPandas-style vectorized UDF in the Python surface) would
  * have. Swap `decodeExpr` for the real kernel; nothing else changes.
  */
object Multimodal {

  /** Canonical media-asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Wrap any (id, bytes) frame into the canonical asset shape. */
  def toAssets(df: DataFrame, idCol: String, bytesCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(bytesCol).cast("binary").as("payload"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("string").as("codec")).as("meta"))

  /** Payload size + content hash — real (no decode needed). */
  def payloadStats(df: DataFrame): DataFrame =
    df.withColumn("payload_bytes", length(col("payload")))
      .withColumn("payload_hash", xxhash64(col("payload")))

  /** REAL image decode: (width, height, channels, mean_r, mean_g, mean_b)
    * from the payload bytes via the JDK ImageIO decoder; null for
    * non-image / corrupt payloads. Pure per-row projection — decode runs
    * where the payload already lives, no shuffle. */
  def decodeImageStats(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.ImageDecodeStats(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary"))))

  /** Decode every image asset: adds an `img` struct
    * (width/height/channels/channel means; null for rows whose payload
    * doesn't decode) and a `decoded` flag. Non-image media types keep a
    * null `img` without paying a decode attempt. */
  def imageStats(df: DataFrame): DataFrame =
    df.withColumn(
        "img",
        when(col("media_type") === "image", decodeImageStats(col("payload"))))
      .withColumn("decoded", col("img").isNotNull)

  /** REAL audio decode: (sample_rate, channels, bits, n_frames,
    * duration_ms, rms) from the payload bytes via javax.sound.sampled
    * (WAV/AIFF/AU); null for non-audio / corrupt payloads. Pure per-row
    * projection like [[decodeImageStats]]. */
  def decodeAudioStats(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.AudioDecodeStats(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary"))))

  /** Decode every audio asset: adds an `audio` struct (null for rows
    * whose payload doesn't parse) and an `audio_decoded` flag. Non-audio
    * media types keep a null struct without paying a decode attempt. */
  def audioStats(df: DataFrame): DataFrame =
    df.withColumn(
        "audio",
        when(col("media_type") === "audio", decodeAudioStats(col("payload"))))
      .withColumn("audio_decoded", col("audio").isNotNull)

  /** REAL video CONTAINER parse: (container, brand, duration_ms,
    * n_tracks, width, height) from the payload's MP4 box / AVI RIFF
    * headers — published byte formats, pure arithmetic, no codec; null
    * for non-video / corrupt payloads. FRAME decode stays stubbed
    * ([[decodeFeaturesStub]]); the container metadata is what a curation
    * pipeline filters and shards on (duration caps, resolution gates)
    * before any codec runs. */
  def decodeVideoMeta(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VideoContainerMeta(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary"))))

  /** Parse every video asset's container header: adds a `video` struct
    * (null for rows that don't parse) and a `video_parsed` flag. Non-video
    * media types keep a null struct without paying a parse attempt. */
  def videoStats(df: DataFrame): DataFrame =
    df.withColumn(
        "video",
        when(col("media_type") === "video", decodeVideoMeta(col("payload"))))
      .withColumn("video_parsed", col("video").isNotNull)

  /** STUB decode kernel: deterministic pseudo-feature vector derived from
    * the payload hash. A real implementation decodes the media and runs a
    * feature extractor; the schema (array<float> of `dim`) and the pure
    * per-row shape (no shuffle, codegen-projected) are what production
    * swaps in against. */
  def decodeFeaturesStub(payload: Column, dim: Int = 8): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i =>
        (pmod(xxhash64(payload, i), lit(1000000L)).cast("double") / 500000.0 - 1.0)
          .cast("float"))

  /** STUB resize kernel: a real implementation decodes, resamples to
    * (targetW, targetH) and re-encodes; here the payload passes through
    * untouched while the metadata is updated to the target dimensions —
    * the schema contract (same asset shape in and out, meta reflecting the
    * transform) and the pure per-row plumbing are what production swaps
    * its codec into. Only visual assets (image/video) with non-null meta
    * are touched; audio rows and null-meta rows pass through unchanged. */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn(
      "meta",
      when(
        col("media_type").isin("image", "video") && col("meta").isNotNull,
        struct(
          lit(targetW).as("width"),
          lit(targetH).as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.codec").as("codec")))
        .otherwise(col("meta")))

  /** Frame-sampling plumbing for video payloads: emit (asset_id, frame_idx)
    * rows every `everyMs` over the declared duration — the real decoder
    * fills the frame payload; the row-multiplication plumbing is real. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("media_type") === "video" && col("meta.duration_ms").isNotNull)
      .select(
        col("asset_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("frame_ms"))

  /** REAL MP4 frame index from the sample tables (stsc/stco/stsz/stts/
    * stss — pure ISO BMFF arithmetic, no codec): per sample, its absolute
    * byte offset, size, decode timestamp, and keyframe flag. Null for
    * non-MP4 payloads or missing tables. `maxSamples` bounds the array
    * per row. */
  def decodeFrameIndex(payload: Column, maxSamples: Int = 100000): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.Mp4FrameIndex(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary")),
        maxSamples))

  /** Keyframe byte-range table: one row per SYNC sample of each MP4
    * video asset — (asset_id, idx, offset, size, pts_ms). This is what a
    * fetch layer reads to pull exactly the keyframe bytes (decode stays
    * out of scope): at 100 TB of video, scanning the sampled kilobytes
    * instead of whole files is the entire game. `everyNth` keeps every
    * nth keyframe (1 = all). */
  def keyframeRanges(df: DataFrame, everyNth: Int = 1, maxSamples: Int = 100000): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    df.filter(col("media_type") === "video")
      .select(col("asset_id"),
        explode(decodeFrameIndex(col("payload"), maxSamples)).as("f"))
      .filter(col("f.sync"))
      .withColumn("__k",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("asset_id")).orderBy(col("f.idx"))))
      .filter((col("__k") - 1) % everyNth === 0)
      .select(col("asset_id"), col("f.idx").as("idx"), col("f.offset").as("offset"),
        col("f.size").as("size"), col("f.pts_ms").as("pts_ms"))
  }

  /** REAL video frame decode for the one codec the JDK can handle:
    * MJPEG-in-AVI, where every frame chunk is a standalone JPEG decoded
    * by the same ImageIO kernel as [[decodeImageStats]]. Per frame: its
    * byte range in the container plus decoded width/height and
    * per-channel pixel means. Null for non-AVI payloads or AVIs without
    * an MJPG video stream — those stay on the container-metadata +
    * byte-range-index surface. */
  def decodeAviMjpegFrames(payload: Column, maxFrames: Int = 10000): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.AviMjpegFrames(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary")),
        maxFrames))

  /** Decoded MJPEG frame table: one row per decoded frame of each AVI
    * video asset — (asset_id, idx, offset, size, width, height, mean_r,
    * mean_g, mean_b). The pixel-decode twin of [[keyframeRanges]]:
    * byte ranges locate the frame, the means prove the pixels were
    * actually decoded. Pure per-row projection + explode, no shuffle. */
  def mjpegFrameStats(df: DataFrame, maxFrames: Int = 10000): DataFrame =
    df.filter(col("media_type") === "video")
      .select(col("asset_id"),
        explode(decodeAviMjpegFrames(col("payload"), maxFrames)).as("f"))
      .select(col("asset_id"), col("f.idx").as("idx"), col("f.offset").as("offset"),
        col("f.size").as("size"), col("f.width").as("width"), col("f.height").as("height"),
        col("f.mean_r").as("mean_r"), col("f.mean_g").as("mean_g"), col("f.mean_b").as("mean_b"))

  /** Feature-extraction pass: stats + stub features, repartitioned so
    * downstream ANN/dedup stages see size-balanced partitions (payloads
    * skew; hash-repartition on asset_id). */
  def extractFeatures(df: DataFrame, dim: Int = 8, partitions: Int = 0): DataFrame = {
    val base = if (partitions > 0) df.repartition(partitions, col("asset_id")) else df
    payloadStats(base)
      .withColumn("features", decodeFeaturesStub(col("payload"), dim))
      .drop("payload")
  }

  /** Deterministic gray block-pattern PNG — the planted-twin generator
    * for perceptual-hash validation (and a general pipeline test
    * pattern): `size`² px in `block`² cells, each cell's luminance an
    * integer mix of (seed, cell coords). The same seed at a different
    * size/block ratio yields the SAME pattern at a different resolution —
    * a resized twin without any interpolation nondeterminism. */
  def testPatternPng(seed: Long, size: Int = 64, block: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        var m = seed * 0x9e3779b97f4a7c15L + (x / block) * 0xc2b2ae3d27d4eb4fL +
          (y / block) * 0x165667b19e3779f9L
        m ^= m >>> 29; m *= 0xbf58476d1ce4e5b9L; m ^= m >>> 32
        val v = (m & 0xff).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Re-encode any decodable image as JPEG at `quality` (0..1) — the
    * recompressed-twin generator (real lossy ImageIO encode). Null when
    * the input doesn't decode. */
  def jpegReencode(payload: Array[Byte], quality: Float): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) return null
    // JPEG writer rejects ARGB; normalize to RGB
    val rgb = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = rgb.createGraphics()
    g.drawImage(img, 0, 0, null); g.dispose()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(rgb, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Deterministic frequency-hopping test tone — the planted-twin
    * generator for audio fingerprints: the clip is split into 9 time
    * segments (the fingerprint's segmentation) and segment s plays a
    * pure sine at one of the 8 analysis band centers, chosen by an
    * integer mix of (seed, s). Same seed at another sample rate or
    * amplitude is the same material — a twin by construction. */
  def testToneWav(
      seed: Long,
      sampleRate: Int = 44100,
      seconds: Double = 2.0,
      amplitude: Double = 0.6): Array[Byte] = {
    val bands = graft.expressions.AudioFingerprint.BandsHz
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = (i.toLong * 9 / n).toInt
      var m = seed * 0x9e3779b97f4a7c15L + s * 0xc2b2ae3d27d4eb4fL
      m ^= m >>> 29; m *= 0xbf58476d1ce4e5b9L; m ^= m >>> 32
      // two tones per segment (primary + quieter secondary from the
      // upper bits) so fingerprint bit patterns are dense enough that
      // unrelated seeds sit far apart
      val f1 = bands(((m & 0x7fffffff) % bands.length).toInt)
      val f2 = bands((((m >>> 33) & 0x7fffffff) % bands.length).toInt)
      val t = 2.0 * math.Pi * i / sampleRate
      val v = ((math.sin(f1 * t) + 0.5 * math.sin(f2 * t)) *
        amplitude * 0.66 * 32767.0).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL 64-bit perceptual audio fingerprint
    * (expressions/AudioFingerprint.scala — Haitsma–Kalker band-energy
    * transitions); null for non-audio / corrupt payloads. Pure per-row
    * projection like [[decodeImageHashes]]. */
  def decodeAudioFingerprint(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.AudioFingerprint(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary"))))

  /** Per-clip fingerprint table: (idCol, afp); undecodable rows drop. */
  def audioFingerprints(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.withColumn("afp", decodeAudioFingerprint(col(payloadCol)))
      .filter(col("afp").isNotNull)
      .select(col(idCol), col("afp"))

  /** Audio near-duplicate pairs WITHOUT embeddings: fingerprint the
    * corpus, Hamming-bucket with the SimHash pigeonhole engine — the
    * audio twin of [[imageNearDupPairs]]. Output: (id_a, id_b, hamming). */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 10,
      maxBucket: Int = 1000): DataFrame =
    graft.dedup.Dedup.hammingNearDupPairs(
      audioFingerprints(df, idCol, payloadCol), idCol, "afp", maxHamming, maxBucket)

  /** REAL perceptual hashes: (dhash, phash) 64-bit struct from the
    * payload bytes (expressions/ImagePHash.scala — public dHash / DCT
    * pHash arithmetic); null for non-image / corrupt payloads. Pure
    * per-row projection like [[decodeImageStats]]. */
  def decodeImageHashes(payload: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.ImagePHash(
        org.apache.spark.sql.graft.Bridge.expression(payload.cast("binary"))))

  /** Per-image perceptual hash table: (idCol, dhash, phash); rows whose
    * payload doesn't decode are dropped (they can't near-dup). The scan
    * is the one decode pass; everything downstream works on 16 bytes per
    * image. */
  def imageHashes(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.withColumn("__h", decodeImageHashes(col(payloadCol)))
      .filter(col("__h").isNotNull)
      .select(col(idCol), col("__h.dhash").as("dhash"), col("__h.phash").as("phash"))

  /** Image near-duplicate pairs WITHOUT embeddings: perceptual-hash the
    * corpus, then Hamming-bucket with the SimHash pigeonhole engine
    * ([[graft.dedup.Dedup.hammingNearDupPairs]] — full recall up to
    * `maxHamming`, candidates only inside signature-chunk buckets, never
    * all-pairs). `hash` picks the signature: "phash" (default — DCT,
    * robust to recompression/resize) or "dhash" (gradients, cheaper,
    * sharper). Output: (id_a, id_b, hamming). */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 10,
      hash: String = "phash",
      maxBucket: Int = 1000): DataFrame = {
    require(hash == "phash" || hash == "dhash",
      s"hash must be 'phash' or 'dhash', got '$hash'")
    graft.dedup.Dedup.hammingNearDupPairs(
      imageHashes(df, idCol, payloadCol), idCol, hash, maxHamming, maxBucket)
  }
}
