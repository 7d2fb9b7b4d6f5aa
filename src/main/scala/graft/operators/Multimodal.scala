package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` + typed
  * metadata, with decode/feature-extraction as a typed
  * `mapPartitions` stage (the Scala analogue of `mapInPandas`:
  * partition-at-a-time batches, stable schema in and out, no shuffle).
  *
  * Image decode is REAL (JDK javax.imageio: PNG/JPEG/GIF/BMP decode,
  * bounded resize, pixel checksum). Audio decode is REAL for the
  * JDK-supported container formats (javax.sound.sampled: WAV/AIFF/AU,
  * including the µ-law/a-law encodings AU carries): sample rate,
  * channels, PCM frame count, duration, PCM checksum. Video codecs and
  * compressed audio (MP3/AAC/OGG) are NOT in the JDK, so those paths
  * use a clearly marked STUB — a deterministic fake that consumes the
  * real bytes. Everything around the codecs — schema, encoders,
  * partition batching, per-kind dispatch, downstream aggregation — is
  * the real pipeline and is tested (including a real in-spec PNG and a
  * real in-spec WAV/AIFF/AU triple).
  */
object Multimodal {

  /** Opaque media row: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long, format: String)

  /** Extracted features (what a decoder would emit). */
  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Int, checksum: Long,
      out_width: Int, out_height: Int, n_frames: Int)

  /** Deterministic synthetic media derived from the documents table
    * (text bytes as payload) — stands in for a real binary source so
    * the plumbing is exercised end to end.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      (col("doc_id") * 40 % 60000).as("duration_ms"),
      lit("raw").as("format"))

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/GIF/BMP):
    * decode → bounded resize (never upscale) → pixel checksum. Returns
    * None when the payload isn't a readable image (or isn't an image
    * at all), falling back to the stub — so synthetic "raw" payloads
    * keep their deterministic fake features while a real PNG gets a
    * real decode. Runs inside mapPartitions: narrow, no shuffle.
    */
  private def imageCore(kind: String, bytes: Array[Byte],
      targetW: Int, targetH: Int): Option[(Int, Long, Int, Int, Int)] = {
    if (kind != "image") return None
    try {
      // an explicit memory-cached stream keeps the decode off ImageIO's
      // default disk-backed cache (pure contention at 32+ executor
      // threads) WITHOUT flipping the global ImageIO.setUseCache flag
      // for every other library in the JVM
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      if (img == null) None
      else {
        val outW = math.min(img.getWidth, targetW)
        val outH = math.min(img.getHeight, targetH)
        val scaled = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try g.drawImage(img, 0, 0, outW, outH, null) finally g.dispose()
        var sum = 1125899906842597L
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) { sum = sum * 31 + scaled.getRGB(x, y); x += 1 }
          y += 1
        }
        Some((bytes.length, sum, outW, outH, 1))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded audio: the typed feature row a real audio pipeline wants.
    * Separate from [[MediaFeatures]] (whose schema is shared with
    * image/video) so sample rate / channels / duration are first-class
    * columns, not squeezed into width/height fields.
    */
  final case class AudioFeatures(
      media_id: Long, sample_rate: Int, channels: Int,
      pcm_frames: Long, duration_ms: Long, pcm_checksum: Long)

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV, AIFF,
    * AU containers; PCM plus the µ-law/a-law encodings AU carries are
    * transcoded to signed PCM first). The checksum folds endian-
    * normalized, sign-extended SAMPLE VALUES — not container bytes —
    * so identical content in WAV (little-endian) and AIFF (big-endian)
    * yields the identical checksum: the decode is content-defined.
    * Returns None for non-audio kinds and for payloads the JDK can't
    * parse (MP3/AAC/OGG, synthetic bytes), falling back to the stub.
    * Streams through a bounded buffer — never materializes the full
    * PCM — so arbitrarily long clips decode in constant memory inside
    * mapPartitions.
    */
  private def javaSoundDecode(m: MediaRecord): Option[AudioFeatures] =
    audioPcmCore(m.kind, m.bytes).map { case (rate, ch, frames, dur, sum) =>
      AudioFeatures(m.media_id, rate, ch, frames, dur, sum)
    }

  /** (sample_rate, channels, pcm_frames, duration_ms, pcm_checksum)
    * of a decodable audio payload — the per-row core shared by the
    * typed [[decodeAudio]] stage and the [[graft.functions
    * .MediaFeaturesExpr]] expression.
    */
  private[graft] def audioPcmCore(kind: String, bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] = {
    if (kind != "audio") return None
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val pcmIn =
          if (in.getFormat.getEncoding == AudioFormat.Encoding.PCM_SIGNED) in
          else AudioSystem.getAudioInputStream(
            AudioFormat.Encoding.PCM_SIGNED, in)
        val fmt = pcmIn.getFormat
        val bps = math.max(fmt.getSampleSizeInBits / 8, 1)
        val big = fmt.isBigEndian
        // AudioInputStream.read returns whole frames and a frame is
        // channels × bps bytes, so a frame-aligned buffer never splits
        // a sample across reads; the outer max keeps the buffer at
        // least one frame even for absurd channel counts (a zero-length
        // buffer would end the loop after reading nothing)
        val frameBytes = bps * math.max(fmt.getChannels, 1)
        val buf = new Array[Byte](
          math.max(frameBytes, 8192 - 8192 % frameBytes))
        var sum = 1125899906842597L
        var total = 0L
        var n = pcmIn.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            var v = 0
            var b = 0
            while (b < bps) {
              v = (v << 8) | (buf(i + (if (big) b else bps - 1 - b)) & 0xff)
              b += 1
            }
            val shift = 32 - 8 * bps
            sum = sum * 31 + ((v << shift) >> shift)
            i += bps
          }
          total += n
          n = pcmIn.read(buf)
        }
        val frames = total / math.max(fmt.getFrameSize, 1)
        val rate = math.round(fmt.getSampleRate)
        val durationMs = if (rate > 0) frames * 1000L / rate else 0L
        Some((rate, fmt.getChannels, frames, durationMs, sum))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Typed audio-decode stage: WAV/AIFF/AU payloads decode for real;
    * everything else is dropped (use [[decodeFeatures]] for the
    * stub-backed all-kinds path). Narrow, no shuffle.
    */
  def decodeAudio(media: DataFrame)
                 (implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap(javaSoundDecode))
  }

  // ──────────────────────────── STUB ────────────────────────────
  // Fallback for video and compressed audio (no MP3/AAC/OGG or video
  // codec in the JDK) and for payloads that aren't decodable
  // images/audio. Deterministic in the payload so tests are stable,
  // and it touches every byte — same memory-access shape as a real
  // decode.
  private def stubCore(kind: String, bytes: Array[Byte], width: Int,
      height: Int, durationMs: Long, targetW: Int,
      targetH: Int): (Int, Long, Int, Int, Int) = {
    var sum = 1125899906842597L
    var i = 0
    while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    val frames = kind match {
      case "image" => 1
      case "audio" => 0
      case "video" => math.max(1, (durationMs / 1000).toInt) // 1 fps sample
    }
    (bytes.length, sum,
      math.min(width, targetW), math.min(height, targetH), frames)
  }
  // ──────────────────────────── /STUB ───────────────────────────

  /** The per-row decode core behind [[decodeFeatures]] and the
    * `media_features` expression: real image decode, else real audio
    * decode (checksum = DECODED-PCM checksum, n_frames = PCM frame
    * count clamped to Int; width/height stay the metadata
    * passthrough), else the deterministic stub. Returns
    * (byte_len, checksum, out_width, out_height, n_frames).
    */
  private[graft] def featureCore(kind: String, bytes: Array[Byte],
      width: Int, height: Int, durationMs: Long, targetW: Int,
      targetH: Int): (Int, Long, Int, Int, Int) =
    imageCore(kind, bytes, targetW, targetH)
      .orElse(audioPcmCore(kind, bytes).map { case (_, _, frames, _, sum) =>
        (bytes.length, sum,
          math.min(width, targetW), math.min(height, targetH),
          math.min(frames, Int.MaxValue.toLong).toInt)
      })
      .getOrElse(stubCore(kind, bytes, width, height, durationMs,
        targetW, targetH))

  /** Decode + resize + frame-sample. Since round 8 session 2 the
    * per-row decode rides the codegen'd `media_features` expression
    * (formerly a typed mapPartitions stage) — same narrow,
    * embarrassingly-parallel shape, but the plan is fully declarative
    * (m01 round-trips through SqlGen) and rows never pay the
    * MediaRecord encoder round-trip. Only the downstream per-kind
    * aggregate shuffles.
    */
  def decodeFeatures(media: DataFrame, targetW: Int = 256, targetH: Int = 256)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"),
        graft.functions.MediaKernelOps.mediaFeatures(
          col("kind"), col("bytes"), col("width"), col("height"),
          col("duration_ms"), targetW, targetH).as("f"))
      .select(col("media_id"), col("kind"),
        col("f.byte_len").as("byte_len"),
        col("f.checksum").as("checksum"),
        col("f.out_width").as("out_width"),
        col("f.out_height").as("out_height"),
        col("f.n_frames").as("n_frames"))
      .as[MediaFeatures]
  }

  // dHash grid geometry: 9 columns × 8 rows of grayscale, 8 horizontal
  // comparisons per row → 64 bits.
  private val DHashW = 9
  private val DHashH = 8

  /** 9×8 grayscale grid of a decoded image (row-major), integer
    * BT.601 luma — every step is integer arithmetic on the resized
    * RGB, so the grid (and hence the hash) is deterministic.
    */
  private def grayGrid(img: java.awt.image.BufferedImage): Array[Int] = {
    val scaled = new java.awt.image.BufferedImage(
      DHashW, DHashH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    try g.drawImage(img, 0, 0, DHashW, DHashH, null) finally g.dispose()
    val out = new Array[Int](DHashW * DHashH)
    var y = 0
    while (y < DHashH) {
      var x = 0
      while (x < DHashW) {
        val rgb = scaled.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * DHashW + x) = (299 * r + 587 * gg + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** Difference-hash bits from a 9×8 grid: bit y·8+x set iff the cell
    * is brighter than its right neighbor. Gradient direction — not
    * absolute brightness — so the hash survives resize, recompression,
    * and global brightness shifts (the aHash failure mode).
    */
  private[graft] def dHashBits(g: Array[Int]): Long = {
    require(g.length == DHashW * DHashH, s"grid must be ${DHashW}x$DHashH")
    var bits = 0L
    var y = 0
    while (y < DHashH) {
      var x = 0
      while (x < DHashW - 1) {
        if (g(y * DHashW + x) > g(y * DHashW + x + 1))
          bits |= 1L << (y * (DHashW - 1) + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Deterministic stub grid for payloads the JDK cannot decode as an
    * image (the m01 stance: the codec is faked, the pipeline around it
    * is real): resample the payload's UTF-8 CODEPOINTS onto the
    * 72-cell grid (cell i ← codepoint ⌊i·n/72⌋). Codepoints, not
    * bytes, because the DuckDB oracle replays this with unicode() over
    * a per-character split — both engines walk the identical integer
    * sequence for any valid UTF-8 payload. Empty payloads → all-zero
    * grid.
    */
  private[graft] def stubGrid(bytes: Array[Byte]): Array[Int] = {
    val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    Array.tabulate(DHashW * DHashH) { i =>
      if (cps.isEmpty) 0
      else cps((i.toLong * cps.length / (DHashW * DHashH)).toInt)
    }
  }

  /** Per-row dHash core: REAL decode (same javax.imageio path as
    * [[decodeFeatures]]) → 9×8 grayscale → [[dHashBits]];
    * undecodable payloads fall back to [[stubGrid]]'s deterministic
    * fake pixels so the hash-join plumbing downstream is exercised
    * (and oracle-replayable) on synthetic corpora.
    */
  private[graft] def dHashOf(bytes: Array[Byte]): Long = {
    val grid =
      try {
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes)))
        if (img == null) stubGrid(bytes) else grayGrid(img)
      } catch { case scala.util.control.NonFatal(_) => stubGrid(bytes) }
    dHashBits(grid)
  }

  /** Per-image 64-bit perceptual difference hash ([[dHashOf]] as the
    * codegen'd `image_dhash` expression since round 8 session 2 —
    * same narrow, embarrassingly-parallel shape, declarative plan;
    * only the downstream pair join shuffles).
    */
  def imageDHash(media: DataFrame)(implicit spark: SparkSession): DataFrame =
    media.select(col("media_id"),
      graft.functions.MediaKernelOps.imageDHash(col("bytes")).as("phash"))

  /** Image near-dup pairs within a hamming radius — the d02-equivalent
    * for the image side of a multimodal corpus: perceptual hashes via
    * [[imageDHash]], pairs via the same pigeonhole chunk join SimHash
    * uses (Dedup.hammingPairs) — linear shuffle on (chunk, value)
    * keys, never an all-pairs scan. Output: (id_a, id_b, hamming).
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 3)
                  (implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairs(imageDHash(media), "media_id", "phash", maxHamming)

  // Audio fingerprint geometry: 65 energy windows → 64 delta-sign
  // bits (the dHash idea on the time axis).
  private val ASigWindows = 65

  /** 64-bit audio energy signature from REAL decoded PCM: mean
    * absolute sample value over [[ASigWindows]] equal time windows,
    * bit i set iff window i is louder than window i+1. Gradient
    * direction, not absolute level — so the signature survives gain
    * changes (any positive scale preserves every comparison) and
    * container re-encodes, the audio analogues of dHash's brightness/
    * recompression invariance. Window sums are exact longs over the
    * endian-normalized sample values (the [[javaSoundDecode]]
    * normalization), so the signature is deterministic. None for
    * non-audio kinds, undecodable payloads, and streams that don't
    * report a frame length (the window map needs the total).
    */
  private def energySigFromAudio(kind: String,
      bytes: Array[Byte]): Option[Long] = {
    if (kind != "audio") return None
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val pcmIn =
          if (in.getFormat.getEncoding == AudioFormat.Encoding.PCM_SIGNED) in
          else AudioSystem.getAudioInputStream(
            AudioFormat.Encoding.PCM_SIGNED, in)
        val fmt = pcmIn.getFormat
        val totalFrames = pcmIn.getFrameLength
        if (totalFrames <= 0) return None
        val bps = math.max(fmt.getSampleSizeInBits / 8, 1)
        val big = fmt.isBigEndian
        val channels = math.max(fmt.getChannels, 1)
        val frameBytes = bps * channels
        val buf = new Array[Byte](
          math.max(frameBytes, 8192 - 8192 % frameBytes))
        val sums = new Array[Long](ASigWindows)
        val counts = new Array[Long](ASigWindows)
        var frame = 0L
        var n = pcmIn.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            val w = (frame * ASigWindows / totalFrames).toInt
            if (w < ASigWindows) {
              var ch = 0
              while (ch < channels) {
                var v = 0
                var b = 0
                while (b < bps) {
                  v = (v << 8) |
                    (buf(i + ch * bps + (if (big) b else bps - 1 - b)) & 0xff)
                  b += 1
                }
                val shift = 32 - 8 * bps
                sums(w) += math.abs(((v << shift) >> shift).toLong)
                counts(w) += 1
                ch += 1
              }
            }
            frame += 1
            i += frameBytes
          }
          n = pcmIn.read(buf)
        }
        val means = Array.tabulate(ASigWindows) { w =>
          if (counts(w) == 0) 0d else sums(w).toDouble / counts(w)
        }
        var bits = 0L
        var i = 0
        while (i < ASigWindows - 1) {
          if (means(i) > means(i + 1)) bits |= 1L << i
          i += 1
        }
        Some(bits)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic stub signature for payloads the JDK cannot decode
    * as audio (the [[stubGrid]] stance): resample the payload's UTF-8
    * codepoints onto [[ASigWindows]] cells (cell i ← codepoint
    * ⌊i·n/65⌋) and take the 64 delta-sign bits — oracle-replayable
    * with unicode() over a per-character split. Empty payloads → 0.
    */
  private[graft] def stubAudioSig(bytes: Array[Byte]): Long = {
    val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    val cells = Array.tabulate(ASigWindows) { i =>
      if (cps.isEmpty) 0
      else cps((i.toLong * cps.length / ASigWindows).toInt)
    }
    var bits = 0L
    var i = 0
    while (i < ASigWindows - 1) {
      if (cells(i) > cells(i + 1)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-row fingerprint core: real decode where the JDK has a codec,
    * [[stubAudioSig]]'s deterministic fake otherwise.
    */
  private[graft] def audioSigOf(kind: String, bytes: Array[Byte]): Long =
    energySigFromAudio(kind, bytes).getOrElse(stubAudioSig(bytes))

  /** Per-clip 64-bit audio fingerprint ([[audioSigOf]] as the
    * codegen'd `audio_energy_sig` expression since round 8 session
    * 2 — same narrow, embarrassingly-parallel shape, declarative
    * plan; only the downstream pair join shuffles).
    */
  def audioEnergySig(media: DataFrame)
                    (implicit spark: SparkSession): DataFrame =
    media.select(col("media_id"),
      graft.functions.MediaKernelOps.audioEnergySig(
        col("kind"), col("bytes")).as("asig"))

  /** Audio near-dup pairs within a hamming radius — the d02-
    * equivalent for the audio side of a multimodal corpus, reusing
    * the same pigeonhole chunk join as SimHash/imageNearDup (linear
    * shuffle on (chunk, value) keys, never all-pairs).
    */
  def audioNearDup(media: DataFrame, maxHamming: Int = 3)
                  (implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairs(audioEnergySig(media), "media_id", "asig",
      maxHamming)

  /** Any-modality near-duplicate report per document pair (round 14):
    * compose the text MinHash verdict with the image dHash and audio
    * energy-signature verdicts into ONE row per flagged pair —
    * (id_a, id_b, text_dup, image_dup, audio_dup, n_modalities) —
    * the multimodal-corpus curation question "are these two documents
    * duplicates in ANY modality, and which?".
    *
    * Each leg is the existing bucketed operator unchanged —
    * [[graft.operators.Dedup.minhashDuplicates]] (band-bucket join)
    * over every document's text, [[imageNearDup]] / [[audioNearDup]]
    * (pigeonhole hamming chunk joins) over the matching kind slices
    * of [[fromDocuments]] — so the composition inherits their scale
    * shape: every pair-producing join is keyed, never all-pairs, and
    * the final rollup is one (id_a, id_b) aggregation over the
    * already-sparse verdict union. Video carries no JDK codec and no
    * fingerprint (the documented d12/d14 stub boundary), so video-kind
    * payloads contribute only their text verdict.
    */
  def multimodalNearDup(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.5, maxHamming: Int = 3,
      maxBucketSize: Int = Int.MaxValue)
      (implicit spark: SparkSession): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"))
    val text = Dedup.minhashDuplicates(base, "doc_id", "text",
        shingleK = shingleK, numHashes = numHashes, bands = bands,
        threshold = threshold, maxBucketSize = maxBucketSize)
      .select(col("id_a"), col("id_b"), lit("text").as("modality"))
    val media = fromDocuments(base)
    val img = imageNearDup(media.where(col("kind") === "image"),
        maxHamming)
      .select(col("id_a"), col("id_b"), lit("image").as("modality"))
    val aud = audioNearDup(media.where(col("kind") === "audio"),
        maxHamming)
      .select(col("id_a"), col("id_b"), lit("audio").as("modality"))
    text.unionByName(img).unionByName(aud)
      .groupBy("id_a", "id_b")
      .agg(
        max(when(col("modality") === "text", 1).otherwise(0))
          .as("text_dup"),
        max(when(col("modality") === "image", 1).otherwise(0))
          .as("image_dup"),
        max(when(col("modality") === "audio", 1).otherwise(0))
          .as("audio_dup"))
      .withColumn("n_modalities",
        col("text_dup") + col("image_dup") + col("audio_dup"))
  }

  /** Streaming any-modality duplicate flag — [[multimodalNearDup]]'s
    * ingest-time twin: flag ARRIVING documents that duplicate a
    * STATIC reference corpus in any modality, with the modality
    * named. Composed from stateless stream-static legs only, so it
    * runs inside ingest at any scale with zero watermark state:
    *
    *  - text: [[graft.operators.Dedup.streamingDecontaminate]]
    *    (banded MinHash match + row-local Jaccard verify against the
    *    corpus's persisted banding);
    *  - image / audio: [[graft.operators.Dedup.hammingFlagStream]]
    *    over [[imageDHash]] / [[audioEnergySig]] of the matching kind
    *    slices (pigeonhole chunk equi-joins; the static fingerprints
    *    persist once in the streaming scope).
    *
    * Output: (id_left, id_right, modality) — id_left the arriving
    * doc, id_right the corpus doc. The hamming legs emit exactly
    * once per flagged pair (stateless first-agreeing-chunk filter);
    * the text leg keeps streamingDecontaminate's documented
    * per-colliding-band multiplicity, so exactly-once flags follow
    * the same consumption pattern StreamingSpec pins for it:
    * foreachBatch + per-batch dropDuplicates — a within-stream
    * distinct would itself be a stateful aggregate.
    */
  def multimodalFlagStream(
      stream: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3, numHashes: Int = 128,
      bands: Int = 16, threshold: Double = 0.5, maxHamming: Int = 3,
      maxStaticBucketSize: Int = Int.MaxValue,
      scope: Dedup.CacheScope = Dedup.streamingScope)
      (implicit spark: SparkSession): DataFrame = {
    val sBase = stream.select(col(idCol).as("doc_id"),
      col(textCol).as("text"))
    val cBase = corpus.select(col(idCol).as("doc_id"),
      col(textCol).as("text"))
    val text = Dedup.streamingDecontaminate(sBase, cBase, "doc_id",
        "text", shingleK, numHashes, bands, threshold,
        maxStaticBucketSize, scope)
      .select(col("id_left"), col("id_right"),
        lit("text").as("modality"))
    val sMedia = fromDocuments(sBase)
    val cMedia = fromDocuments(cBase)
    val img = Dedup.hammingFlagStream(
        imageDHash(sMedia.where(col("kind") === "image")),
        imageDHash(cMedia.where(col("kind") === "image")),
        "media_id", "phash", maxHamming, scope)
      .select(col("id_left"), col("id_right"),
        lit("image").as("modality"))
    val aud = Dedup.hammingFlagStream(
        audioEnergySig(sMedia.where(col("kind") === "audio")),
        audioEnergySig(cMedia.where(col("kind") === "audio")),
        "media_id", "asig", maxHamming, scope)
      .select(col("id_left"), col("id_right"),
        lit("audio").as("modality"))
    text.unionByName(img).unionByName(aud)
  }

  /** Per-kind rollup of extracted features. */
  def featureSummary(features: Dataset[MediaFeatures]): DataFrame =
    features.groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
           sum(col("byte_len")).cast("long").as("total_bytes"),
           sum(col("n_frames")).cast("long").as("total_frames"),
           max(col("out_width")).as("max_w"),
           max(col("out_height")).as("max_h"))
      .orderBy("kind")
}
