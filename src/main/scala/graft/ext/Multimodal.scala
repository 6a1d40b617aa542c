package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batched
  * decode / feature-extraction / frame-sampling plumbing.
  *
  * The decode step is STUBBED (this container ships no codec
  * libraries): `decodeStub` produces deterministic fake features from
  * the raw bytes. Everything around it — the schema contract, the
  * binary column handling, the per-partition batch shape (decode
  * libraries amortize model/codec init per batch, exactly like a
  * vectorized pandas-UDF boundary), and the partition sizing — is real
  * and tested; a production build swaps `decodeStub`'s body for a JNI
  * or process-pool codec call.
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
