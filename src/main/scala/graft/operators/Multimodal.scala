package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` + typed
  * metadata, with decode/feature-extraction as a typed
  * `mapPartitions` stage (the Scala analogue of `mapInPandas`:
  * partition-at-a-time batches, stable schema in and out, no shuffle).
  *
  * Image decode is REAL (JDK javax.imageio: PNG/JPEG/GIF/BMP decode,
  * bounded resize, pixel checksum). Audio/video codecs are NOT in this
  * container, so those paths use a clearly marked STUB — a
  * deterministic fake that consumes the real bytes. Everything around
  * the codec — schema, encoders, partition batching, per-kind
  * dispatch, downstream aggregation — is the real pipeline and is
  * tested (including a real in-spec PNG).
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
  private def imageIoDecode(
      m: MediaRecord, targetW: Int, targetH: Int): Option[MediaFeatures] = {
    if (m.kind != "image") return None
    try {
      // an explicit memory-cached stream keeps the decode off ImageIO's
      // default disk-backed cache (pure contention at 32+ executor
      // threads) WITHOUT flipping the global ImageIO.setUseCache flag
      // for every other library in the JVM
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(m.bytes)))
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
        Some(MediaFeatures(m.media_id, m.kind, m.bytes.length, sum,
          outW, outH, 1))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ──────────────────────────── STUB ────────────────────────────
  // Fallback for audio/video (no codec libs in the JDK) and for
  // payloads that aren't decodable images. Deterministic in the
  // payload so tests are stable, and it touches every byte — same
  // memory-access shape as a real decode.
  private def stubDecode(m: MediaRecord, targetW: Int, targetH: Int): MediaFeatures = {
    var sum = 1125899906842597L
    var i = 0
    while (i < m.bytes.length) { sum = sum * 31 + (m.bytes(i) & 0xff); i += 1 }
    val frames = m.kind match {
      case "image" => 1
      case "audio" => 0
      case "video" => math.max(1, (m.duration_ms / 1000).toInt) // 1 fps sample
    }
    MediaFeatures(m.media_id, m.kind, m.bytes.length, sum,
      math.min(m.width, targetW), math.min(m.height, targetH), frames)
  }
  // ──────────────────────────── /STUB ───────────────────────────

  /** Decode + resize + frame-sample over partition-sized batches.
    * Narrow transformation: inherits upstream partitioning, so at
    * 100 TB this scales embarrassingly parallel; only the downstream
    * per-kind aggregate shuffles.
    */
  def decodeFeatures(media: DataFrame, targetW: Int = 256, targetH: Int = 256)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(m =>
      imageIoDecode(m, targetW, targetH)
        .getOrElse(stubDecode(m, targetW, targetH))))
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
