package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batched
  * decode / feature-extraction / frame-sampling plumbing.
  *
  * Two decode paths share one batch boundary:
  *  - [[decodeImages]] is a REAL image codec (`javax.imageio`,
  *    JDK-bundled) — decode to raster, luma features out;
  *  - [[decodeStub]] produces deterministic byte-level features and
  *    remains the oracle-gate path (and the stand-in for the audio/
  *    video codecs this container doesn't ship).
  * Everything around them — the schema contract, the binary column
  * handling, the per-partition batch shape (codec init amortized per
  * batch, exactly like a vectorized pandas-UDF boundary), and the
  * partition sizing — is identical, so swapping a stub for a JNI or
  * process-pool codec changes one function body.
  */
object Multimodal {

  /** Metadata struct carried beside every media payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("source_id", LongType)))

  /** Attach a binary payload column + metadata struct. In production the
    * bytes come from an object store via a binary-file reader
    * (`spark.read.format("binaryFile")`); here the documents table's
    * UTF-8 text stands in as the payload.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String,
                    mime: String = "application/octet-stream"): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(mime).as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        col(idCol).as("source_id")).as("meta"))

  /** Decoded-feature row. */
  final case class MediaFeature(media_id: Long, n_bytes: Long, first_byte: Long,
                                byte_sum: Long, feature: Seq[Float])

  /** ---- STUB ---- the decode/feature-extract kernel. Deterministic
    * fake: byte statistics + an 8-dim "embedding" derived from byte
    * histograms. A real implementation decodes the payload (JPEG/WAV/…)
    * and runs a feature extractor over the decoded tensor; the signature
    * (batch of payloads in, batch of fixed-shape features out) is what a
    * production codec boundary looks like.
    */
  def decodeStub(mediaId: Long, payload: Array[Byte]): MediaFeature = {
    var sum = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      sum += b
      hist(b % 8) += 1
      i += 1
    }
    val feature = hist.map(h =>
      if (payload.length == 0) 0.0f else h.toFloat / payload.length.toFloat)
    MediaFeature(mediaId, payload.length.toLong,
      if (payload.length == 0) -1L else (payload(0) & 0xFF).toLong,
      sum, feature.toSeq)
  }

  /** Batched decode over the payload column: `mapPartitions` so codec
    * initialization happens once per partition (the Scala analog of a
    * `mapInPandas` iterator-of-batches UDF). Partition sizing is the
    * caller's lever: repartition so each partition's payload bytes fit
    * executor memory.
    */
  def decodeFeatures(df: DataFrame): Dataset[MediaFeature] = {
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      // per-partition init would open the codec here (once, not per row)
      it.map { case (id, bytes) => decodeStub(id, bytes) }
    }(Encoders.product[MediaFeature])
  }

  /** Resized-media row (`resized_sum` = checksum of the resampled
    * bytes — the cheap cross-engine witness that the right source
    * positions were picked).
    */
  final case class ResizedMedia(media_id: Long, n_bytes: Long,
                                resized_sum: Long)

  /** ---- STUB ---- nearest-neighbor resize kernel: position `i` of the
    * `target`-length output takes source byte `⌊i·n/target⌋`. A real
    * implementation resamples the DECODED raster/waveform; the byte
    * stream stands in for the tensor, and the index arithmetic is
    * exactly nearest-neighbor interpolation, so the plumbing (batch
    * shape, bounds handling, up/downsample in one formula) is real.
    */
  def resizeStub(payload: Array[Byte], target: Int): Array[Byte] =
    if (payload.length == 0) Array.emptyByteArray
    else Array.tabulate(target)(i =>
      payload(((i.toLong * payload.length) / target).toInt))

  /** Batched resize over the payload column — same per-partition batch
    * boundary as [[decodeFeatures]].
    */
  def resizeFeatures(df: DataFrame, target: Int): Dataset[ResizedMedia] = {
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ResizedMedia(id, bytes.length.toLong,
          resizeStub(bytes, target).map(b => (b & 0xFF).toLong).sum)
      }
    }(Encoders.product[ResizedMedia])
  }

  /** Decoded-image feature row from the REAL codec path. `width = -1`
    * marks an undecodable payload (wrong format, truncated bytes) —
    * decode failures are data, not exceptions, so one bad file never
    * kills a 100 TB scan.
    */
  final case class ImageFeature(media_id: Long, width: Int, height: Int,
                                n_pixels: Long, mean_luma: Double,
                                feature: Seq[Float])

  /** REAL image decode via `javax.imageio` (JDK-bundled — public
    * knowledge, zero extra dependencies) behind the exact same batched
    * `mapPartitions` boundary as [[decodeFeatures]]: the ImageIO reader
    * lookup happens once per partition, each row decodes its payload to
    * a raster and emits fixed-shape features (dimensions, mean luma,
    * 8-bin luma histogram). [[decodeStub]] remains the deterministic
    * byte-level gate path (`x13`/`x43`); this is the production-shaped
    * codec the stub stands in for, spec-tested against generated PNGs.
    */
  def decodeImages(df: DataFrame): Dataset[ImageFeature] = {
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      // per-partition codec init: ImageIO's plugin registry scan is paid
      // once here, not per row
      javax.imageio.ImageIO.setUseCache(false)
      it.map { case (id, bytes) => decodeImage(id, bytes) }
    }(Encoders.product[ImageFeature])
  }

  private[ext] def decodeImage(id: Long, bytes: Array[Byte]): ImageFeature =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) ImageFeature(id, -1, -1, 0L, 0.0, Nil)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Long](8)
        var lumaSum = 0.0d
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299d * ((rgb >> 16) & 0xFF) +
              0.587d * ((rgb >> 8) & 0xFF) + 0.114d * (rgb & 0xFF)
            lumaSum += luma
            hist((luma / 32.0d).toInt.min(7)) += 1L
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h.toLong
        ImageFeature(id, w, h, n, lumaSum / n,
          hist.map(_.toFloat / n.toFloat).toSeq)
      }
    } catch {
      case _: Exception => ImageFeature(id, -1, -1, 0L, 0.0, Nil)
    }

  /** Decoded-audio feature row from the REAL codec path. `sample_rate
    * = -1` marks an undecodable payload — like [[ImageFeature]], decode
    * failures are data, not exceptions.
    */
  final case class AudioFeature(media_id: Long, sample_rate: Int,
                                channels: Int, n_frames: Long,
                                duration_ms: Double, rms: Double,
                                peak: Double)

  /** REAL audio decode via `javax.sound.sampled` (JDK-bundled, public
    * knowledge): WAV/AIFF/AU header + PCM frames → sample rate,
    * channel count, frame count, duration, RMS and peak amplitude
    * (normalized to [0, 1]). Same batched `mapPartitions` shape as
    * [[decodeImages]] — the audio twin of the ImageIO path, replacing
    * the byte-level stub for payloads the JDK can actually parse.
    * Supports 8-bit unsigned and 16-bit signed PCM (the formats
    * `AudioSystem` emits without transcoding).
    */
  def decodeAudio(df: DataFrame): Dataset[AudioFeature] = {
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) => decodeWav(id, bytes) }
    }(Encoders.product[AudioFeature])
  }

  private[ext] def decodeWav(id: Long, bytes: Array[Byte]): AudioFeature =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (bits != 8 && bits != 16)
          AudioFeature(id, -1, 0, 0L, 0.0, 0.0, 0.0)
        else {
          val data = in.readAllBytes()
          val bytesPerSample = bits / 8
          val nSamples = data.length / bytesPerSample
          var sumSq = 0.0d
          var peak = 0.0d
          var i = 0
          while (i < nSamples) {
            val v =
              if (bits == 8) {
                val raw = if (signed) data(i).toDouble
                          else ((data(i) & 0xFF) - 128).toDouble
                raw / 128.0d
              } else {
                val lo = data(i * 2) & 0xFF
                val hi = data(i * 2 + 1)
                val s = if (fmt.isBigEndian) ((data(i * 2).toInt << 8) |
                  (data(i * 2 + 1) & 0xFF)).toShort
                else ((hi.toInt << 8) | lo).toShort
                s.toDouble / 32768.0d
              }
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          val frames = nSamples.toLong / math.max(1, fmt.getChannels)
          val rate = fmt.getSampleRate.toInt
          AudioFeature(id, rate, fmt.getChannels, frames,
            frames.toDouble * 1000.0d / rate,
            if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples), peak)
        }
      } finally in.close()
    } catch {
      case _: Exception => AudioFeature(id, -1, 0, 0L, 0.0, 0.0, 0.0)
    }

  /** Frame sampling for video-ish payloads: every `stride`-th offset
    * becomes a frame row (id, frame_idx, frame_offset). Pure expression
    * explode — the real version would emit decoded frame tensors from
    * the same shape of plan.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.select(col("media_id"),
        posexplode(sequence(lit(0L),
          floor((col("meta.n_bytes") - lit(1L)) / lit(stride)).cast("long"))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_no"))
      .withColumn("frame_offset", col("frame_no") * stride)
      .select(col("media_id"), col("frame_idx").cast("long"),
        col("frame_offset").cast("long"))
}
