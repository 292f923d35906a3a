package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.normText

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * Decoding is pluggable behind [[MultiModal.Decoder]]: [[ImageIoDecoder]]
  * is a REAL header-only image decode via the JVM's `javax.imageio`
  * (PNG/JPEG/GIF/BMP), [[WavDecoder]] parses WAV/AIFF/AU audio headers
  * via `javax.sound.sampled`, and the compressed formats the JVM ships
  * no codec for are covered by REAL public-spec HEADER WALKS —
  * [[Mp3Decoder]] (MPEG audio frames), [[AdtsAacDecoder]] (ADTS
  * transport frames), [[Mp4Decoder]] (ISO-BMFF boxes) — which read
  * every metadata field without touching a compressed bitstream byte.
  * [[FakeDecoder]] is a clearly-marked deterministic STUB (a function of
  * the bytes' content hash): it stands in only for the PIXEL/PCM payload
  * transform itself, and is what the oracle-checked query uses so the
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
    * bytes fail loudly, same contract as the image path. Compressed
    * formats go through [[Mp3Decoder]]/[[AdtsAacDecoder]] instead. */
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

  /** REAL MP3 metadata via an MPEG audio FRAME-HEADER WALK (no PCM
    * decode — the JVM ships no MP3 codec, but the frame headers are
    * plain public-spec bit fields, ISO/IEC 11172-3): skip an ID3v2 tag
    * if present, then walk Layer III frames — 11-bit sync, version,
    * bitrate/sample-rate indices, padding — summing sample frames
    * (1152 per frame MPEG1, 576 MPEG2/2.5). Rate and channel mode come
    * from the first frame. Undecodable or mid-stream-corrupt bytes fail
    * loudly, same contract as [[WavDecoder]]; an ID3v1 "TAG" trailer is
    * the one tolerated non-frame suffix. */
  // MPEG audio constants (ISO/IEC 11172-3) — hoisted: a per-record
  // decoder lambda must not rebuild its lookup tables per row
  private val Mp3SrTab = Map(3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000),                          // MPEG2
    0 -> Array(11025, 12000, 8000))                           // MPEG2.5
  private val Mp3BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val Mp3BrV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160)

  val Mp3Decoder: AudioDecoder = { bytes =>
    def fail(msg: String) =
      throw new IllegalArgumentException(s"mp3: $msg (${bytes.length} bytes)")
    var i = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4); the v2.4
    // footer flag (0x10) appends a 10-byte footer NOT counted in size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = 10 + sz + (if ((bytes(5) & 0x10) != 0) 10 else 0)
    }
    var rate = 0; var channels = 0; var sampleFrames = 0L
    while (i < bytes.length) {
      if (i + 4 > bytes.length ||
          (bytes(i) & 0xff) != 0xff || (bytes(i + 1) & 0xe0) != 0xe0) {
        // tolerated trailer: ID3v1 (128-byte "TAG" block) at stream end
        if (i + 3 <= bytes.length && bytes(i) == 'T' && bytes(i + 1) == 'A' &&
            bytes(i + 2) == 'G' && bytes.length - i == 128) i = bytes.length
        else fail(s"lost frame sync at offset $i")
      } else {
        val ver = (bytes(i + 1) >> 3) & 3
        val layer = (bytes(i + 1) >> 1) & 3
        if (ver == 1 || layer != 1) fail(s"not a Layer III frame at $i")
        val brIdx = (bytes(i + 2) >> 4) & 0xf
        val srIdx = (bytes(i + 2) >> 2) & 3
        if (brIdx == 0 || brIdx == 15 || srIdx == 3)
          fail(s"free/invalid bitrate or sample-rate index at $i")
        val sr = Mp3SrTab(ver)(srIdx)
        val br = (if (ver == 3) Mp3BrV1L3 else Mp3BrV2L3)(brIdx) * 1000
        val pad = (bytes(i + 2) >> 1) & 1
        val spf = if (ver == 3) 1152 else 576
        val frameLen = spf / 8 * br / sr + pad
        if (frameLen <= 4) fail(s"degenerate frame length $frameLen at $i")
        // a frame whose declared length runs past the buffer is a
        // TRUNCATED stream — counting it would report a full-looking
        // duration for a partial download (fail-loudly contract)
        if (i + frameLen > bytes.length)
          fail(s"truncated final frame at $i ($frameLen declared, " +
            s"${bytes.length - i} present)")
        if (rate == 0) {
          rate = sr
          channels = if (((bytes(i + 3) >> 6) & 3) == 3) 1 else 2
        }
        sampleFrames += spf
        i += frameLen
      }
    }
    if (sampleFrames == 0) fail("no MPEG audio frames found")
    (rate, channels, sampleFrames)
  }

  /** REAL AAC metadata via an ADTS FRAME-HEADER WALK (ISO/IEC 14496-3
    * transport headers — public-spec bit fields, no codec needed):
    * 12-bit sync, sampling-frequency index, channel configuration, the
    * 13-bit frame length that chains frame to frame, and the
    * raw-data-block count (1024 samples per block). Fail-loudly
    * contract as [[Mp3Decoder]]. */
  private val AdtsSrTab = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  val AdtsAacDecoder: AudioDecoder = { bytes =>
    def fail(msg: String) =
      throw new IllegalArgumentException(s"adts: $msg (${bytes.length} bytes)")
    var i = 0; var rate = 0; var channels = 0; var samples = 0L
    while (i < bytes.length) {
      if (i + 7 > bytes.length ||
          (bytes(i) & 0xff) != 0xff || (bytes(i + 1) & 0xf0) != 0xf0)
        fail(s"lost ADTS sync at offset $i")
      if (((bytes(i + 1) >> 1) & 3) != 0) fail(s"nonzero layer at $i")
      val srIdx = (bytes(i + 2) >> 2) & 0xf
      if (srIdx >= AdtsSrTab.length)
        fail(s"reserved sampling index $srIdx at $i")
      val chCfg = ((bytes(i + 2) & 1) << 2) | ((bytes(i + 3) >> 6) & 3)
      val frameLen = ((bytes(i + 3) & 3) << 11) |
        ((bytes(i + 4) & 0xff) << 3) | ((bytes(i + 5) >> 5) & 7)
      val blocks = (bytes(i + 6) & 3) + 1
      if (frameLen < 7) fail(s"degenerate ADTS frame length $frameLen at $i")
      // truncated final frame: same fail-loudly rule as Mp3Decoder
      if (i + frameLen > bytes.length)
        fail(s"truncated final frame at $i ($frameLen declared, " +
          s"${bytes.length - i} present)")
      if (rate == 0) { rate = AdtsSrTab(srIdx); channels = chCfg }
      samples += 1024L * blocks
      i += frameLen
    }
    if (samples == 0) fail("no ADTS frames found")
    (rate, channels, samples)
  }

  /** REAL MP4/ISO-BMFF video metadata via a BOX WALK (ISO/IEC 14496-12
    * container structure — public spec, no codec): recurse through
    * moov → trak, read each track's handler type (hdlr), its tkhd
    * 16.16-fixed width/height, and its stts total sample count; return
    * (width, height, n_frames) of the first VIDEO track. No mdat byte
    * is touched — the metadata pass never pays the bitstream cost, the
    * same posture as the image header path. Fail-loudly contract. */
  val Mp4Decoder: Decoder = { bytes =>
    def fail(msg: String) =
      throw new IllegalArgumentException(s"mp4: $msg (${bytes.length} bytes)")
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, "US-ASCII")
    // walk children of [lo, hi); call f((type, bodyLo, bodyHi))
    def walk(lo: Int, hi: Int)(f: ((String, Int, Int)) => Unit): Unit = {
      var o = lo
      while (o + 8 <= hi) {
        val sz0 = u32(o)
        val typ = fourcc(o + 4)
        val (body, end) =
          if (sz0 == 1L) { // 64-bit largesize
            // the 64-bit size field itself must fit before it is read — a
            // stream ending 8-15 bytes after the header would otherwise
            // throw a raw ArrayIndexOutOfBounds instead of the contract's
            // malformed-box failure
            if (o + 16 > hi) fail(s"malformed box $typ at $o")
            val sz = (u32(o + 8) << 32) | u32(o + 12)
            (o + 16, o + sz)
          } else if (sz0 == 0L) (o + 8, hi.toLong) // box runs to end
          else (o + 8, o + sz0)
        if (end > hi || end <= body) fail(s"malformed box $typ at $o")
        f((typ, body, end.toInt))
        o = end.toInt
      }
    }
    var found: Option[(Int, Int, Int)] = None
    var sawFtyp = false; var sawMoov = false
    walk(0, bytes.length) {
      case ("ftyp", _, _) => sawFtyp = true
      case ("moov", mLo, mHi) =>
        sawMoov = true
        walk(mLo, mHi) {
          case ("trak", tLo, tHi) =>
            var isVideo = false
            var wh: Option[(Int, Int)] = None
            var frames = 0L
            def scan(lo: Int, hi: Int): Unit = walk(lo, hi) {
              case ("tkhd", b, e) =>
                val v = bytes(b) & 0xff
                // v0: 4(vflags)+4+4+4+4+4+8+2+2+2+2+36 → width at b+76
                // v1: creation/modification/duration are 64-bit → b+88
                val wOff = if (v == 1) b + 88 else b + 76
                // the width/height fields must sit inside the box body —
                // a truncated/hostile tkhd would otherwise silently read
                // sibling-box bytes as dimensions (same class of input
                // the stts entry-count check rejects)
                if (wOff + 8 > e)
                  fail(s"tkhd v$v body holds ${e - b} bytes, needs ${wOff + 8 - b}")
                wh = Some(((u32(wOff) >> 16).toInt,
                  (u32(wOff + 4) >> 16).toInt))
              case ("hdlr", b, e) =>
                // handler type lives at body+8..body+12
                if (b + 12 > e) fail(s"hdlr body holds ${e - b} bytes, needs 12")
                if (fourcc(b + 8) == "vide") isVideo = true
              case ("stts", b, e) =>
                val n = u32(b + 4).toInt
                // the declared entry count must fit the box body, or a
                // hostile stts would read sample counts from sibling
                // boxes (silently wrong frames) or run off the buffer
                if (n < 0 || b + 8 + n.toLong * 8 > e)
                  fail(s"stts declares $n entries but box holds ${e - b - 8} bytes")
                var j = 0
                while (j < n) { frames += u32(b + 8 + j * 8); j += 1 }
              case (t, b, e) if Set("mdia", "minf", "stbl")(t) => scan(b, e)
              case _ => ()
            }
            scan(tLo, tHi)
            if (isVideo && found.isEmpty) wh.foreach { case (w, h) =>
              found = Some((w, h, if (frames > 0) frames.toInt else 1))
            }
          case _ => ()
        }
      case _ => ()
    }
    if (!sawFtyp || !sawMoov) fail("not an ISO-BMFF stream (no ftyp/moov)")
    found.getOrElse(fail("no video track"))
  }

  /** STUB audio decode — deterministic fake from the content hash, same
    * scheme as [[FakeDecoder]] (rate from a fixed public set, 1-2
    * channels, length from the hash). With [[Mp3Decoder]] and
    * [[AdtsAacDecoder]] covering the compressed-header formats, this
    * stands in only for payloads that are not media at all (the
    * oracle-checkable text-as-binary query). */
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
