package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.normText

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * Decoding is pluggable behind [[MultiModal.Decoder]]: [[ImageIoDecoder]]
  * is a REAL header-only image decode via the JVM's `javax.imageio`
  * (PNG/JPEG/GIF/BMP — the formats the stdlib ships codecs for);
  * [[FakeDecoder]] is a clearly-marked deterministic STUB (a function of
  * the bytes' content hash) standing in for the codecs this container
  * lacks (video/audio), and is what the oracle-checked query uses so the
  * end-to-end plumbing stays hash-verifiable. Everything Spark-side is
  * real and tested: the binary schema, the typed `Dataset` pipeline,
  * per-partition batched decoding (`mapPartitions` — the Scala analog of
  * `mapInPandas` batches), and the downstream relational features.
  *
  * Scale posture: decode is a narrow per-partition pass (no shuffle); the
  * binary payloads never move except the initial scan. Partition sizing is
  * the scan's `maxPartitionBytes` concern, not the operator's.
  */
object MultiModal {

  /** A media row: opaque payload + source metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata a real image/audio decoder would produce. */
  case class MediaFeatures(media_id: Long, kind: String, bytes: Long,
                           width: Int, height: Int, n_frames: Int)

  /** Decoder contract: payload bytes → (width, height, frames).
    * [[ImageIoDecoder]] covers the formats the JVM ships codecs for
    * (PNG/JPEG/GIF/BMP); a real deployment plugs ffmpeg-style codecs here
    * for video/audio. */
  type Decoder = Array[Byte] => (Int, Int, Int)

  /** REAL image decode via `javax.imageio` (JVM stdlib — no new
    * dependencies): reads width/height from the image HEADER only
    * (`ImageReader.getWidth/getHeight`, not a full pixel decode — at 100 TB
    * the metadata pass must not pay the raster cost), `n_frames` = the
    * reader's image count (GIF animations report their frame count; still
    * formats report 1). Serializable by construction (a static-method
    * closure), so it rides the same `mapPartitions` batch as [[FakeDecoder]].
    * Undecodable bytes fail loudly — silently fabricated dimensions would
    * poison every downstream feature. */
  val ImageIoDecoder: Decoder = { bytes =>
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext)
        throw new IllegalArgumentException(
          s"no ImageIO codec for payload (${bytes.length} bytes)")
      val r = readers.next()
      try {
        r.setInput(in)
        // allowSearch=true: multi-frame formats (GIF) only know their
        // image count after walking the block structure, and with `false`
        // they return -1 — which would silently report every animation as
        // 1 frame. The walk parses headers of an ALREADY in-memory byte
        // array; no raster is decoded, so the metadata pass still never
        // pays the pixel cost.
        val n = r.getNumImages(true)
        (r.getWidth(0), r.getHeight(0), if (n > 0) n else 1)
      } finally r.dispose()
    } finally in.close()
  }

  /** STUB decode — deterministic fake derived from a 32-bit content hash
    * (matches the SQL feature derivation below so the plumbing is
    * oracle-checkable end-to-end). */
  val FakeDecoder: Decoder = { bytes =>
    // md5_32 = the ONE definition of "first 4 md5 bytes as unsigned int"
    // (shared with the dedup hashing and its SQL twin — and it reuses a
    // ThreadLocal digest instead of allocating one per record)
    val h = graft.functions.TextHashes.md5_32(bytes)
    (64 + (h % 16).toInt * 16, 64 + ((h >> 4) % 16).toInt * 16,
      1 + ((h >> 8) % 30).toInt)
  }

  /** Typed decode pipeline: per-partition batches through the decoder.
    * `mapPartitions` so a real decoder can amortize init (model load,
    * codec context) across a partition — the mapInPandas batch shape. */
  def decodeFeatures(media: Dataset[MediaRecord],
                     decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = decoder(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, f)
      }
    }
  }

  /** Audio metadata a real decoder produces. `n_samples` = sample FRAMES
    * (one per channel set); `duration_ms` derived from frames/rate. */
  case class AudioFeatures(media_id: Long, kind: String, bytes: Long,
                           sample_rate: Int, channels: Int, n_samples: Long,
                           duration_ms: Long)

  /** Audio decoder contract: payload bytes →
    * (sample_rate, channels, sample_frames). */
  type AudioDecoder = Array[Byte] => (Int, Int, Long)

  /** REAL audio header decode via `javax.sound.sampled` (JVM stdlib, no
    * new dependencies — the audio twin of [[ImageIoDecoder]]):
    * `AudioSystem.getAudioFileFormat` parses the container header ONLY
    * (WAV/AIFF/AU ship with the JDK), no PCM is decoded. Undecodable
    * bytes fail loudly, same contract as the image path. The
    * deterministic stub now stands in only for compressed codecs the JVM
    * lacks (MP3/AAC/video containers). */
  val WavDecoder: AudioDecoder = { bytes =>
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    val af = fmt.getFormat
    // AudioSystem reports NOT_SPECIFIED (-1) for streaming-style headers
    // (e.g. AU with data size 0xffffffff); propagating it would emit
    // fabricated negative counts — fail loudly like an unparseable header
    if (fmt.getFrameLength < 0 || af.getSampleRate <= 0 || af.getChannels <= 0)
      throw new IllegalArgumentException(
        s"audio header lacks declared length/rate/channels " +
          s"(frames=${fmt.getFrameLength}, rate=${af.getSampleRate}, " +
          s"channels=${af.getChannels})")
    (af.getSampleRate.toInt, af.getChannels, fmt.getFrameLength.toLong)
  }

  /** STUB audio decode — deterministic fake from the content hash, same
    * scheme as [[FakeDecoder]] (rate from a fixed public set, 1-2
    * channels, length from the hash) for codecs the JVM can't parse. */
  val FakeAudioDecoder: AudioDecoder = { bytes =>
    val h = graft.functions.TextHashes.md5_32(bytes)
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    (rates((h % rates.length).toInt), (h / 7 % 2).toInt + 1,
      1000L + h % 100000L)
  }

  /** Audio metadata pass: narrow per-partition decode, payloads never
    * shuffle — identical scale shape to [[decodeFeatures]]. */
  def decodeAudioFeatures(media: Dataset[MediaRecord],
                          decoder: AudioDecoder = FakeAudioDecoder)
      : Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (rate, ch, n) = decoder(r.payload)
        AudioFeatures(r.media_id, r.kind, r.payload.length.toLong, rate, ch,
          n, if (rate > 0) n * 1000L / rate else 0L)
      }
    }
  }

  /** A sampled frame reference (video path): which frames a downstream
    * extractor should decode. */
  case class FrameRef(media_id: Long, frame_idx: Int, ts_ms: Long)

  /** Deterministic frame sampling: every `stride`-th frame of each medium
    * (narrow flatMap — no shuffle; the real decoder would extract exactly
    * these frames in the same per-partition pass). Frame timestamps assume
    * 25 fps (40 ms per frame). */
  def sampleFrames(features: Dataset[MediaFeatures],
                   stride: Int): Dataset[FrameRef] = {
    require(stride > 0, s"stride must be positive, got $stride")
    import features.sparkSession.implicits._
    features.flatMap { f =>
      (0 until f.n_frames by stride).map(i =>
        FrameRef(f.media_id, i, i * 40L))
    }
  }

  case class ResizedMeta(media_id: Long, width: Int, height: Int,
                         scale: Double)

  /** Resize planning: fit within `maxDim` preserving aspect ratio, never
    * upscaling (the pixel transform itself would ride the same
    * mapPartitions batch as the decode). */
  def resizeMeta(features: Dataset[MediaFeatures],
                 maxDim: Int): Dataset[ResizedMeta] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val s = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      ResizedMeta(f.media_id, math.round(f.width * s).toInt,
        math.round(f.height * s).toInt, s)
    }
  }

  /** Oracle-checkable feature query: documents' normalized text re-encoded
    * as a binary media payload, features derived from the same 32-bit
    * content hash `FakeDecoder` uses. Expression-for-expression twin in
    * OracleSql (bit arithmetic on the md5-derived hash). */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), normText(col("text")).as("ntext"))
      .withColumn("media", col("ntext").cast("binary"))
      .withColumn("h", Dedup.hash32(col("ntext")))
      .select(col("doc_id"),
        octet_length(col("media")).cast("long").as("media_bytes"),
        (lit(64) + (col("h") % 16) * 16).cast("long").as("fake_width"),
        (lit(64) + (shiftright(col("h"), 4) % 16) * 16).cast("long").as("fake_height"),
        (lit(1) + shiftright(col("h"), 8) % 30).cast("long").as("est_frames"))
      .withColumn("aspect_ratio",
        round(col("fake_width").cast("double") / col("fake_height"), 6))
}
