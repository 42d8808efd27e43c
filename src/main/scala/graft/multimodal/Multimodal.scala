package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): [[decodeImageStub]] produces deterministic fake dimensions/
  * features from the bytes. The Spark-side contract — schema, partitioning,
  * batch iteration shape — is real: swap `stubDecode` for a JNI/pandas-style
  * decoder and nothing else changes. At 100 TB the media table is
  * partitioned by content hash prefix so decode work spreads evenly.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class DecodedImage(
      doc_id: Long, byte_len: Long, width: Int, height: Int, features: Array[Float])

  /** Attach a binary media column + typed metadata (hash, length). Here the
    * bytes come from the text column — the testdata stand-in for real blobs.
    */
  def withMedia(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("media", col(textCol).cast("binary"))
      .withColumn("media_len", octet_length(col("media")).cast("long"))
      .withColumn("media_sha256", sha2(col("media"), 256))

  /** STUB image decode — deterministic fake: dimensions and a tiny feature
    * vector derived from the byte content. Real implementation would decode
    * pixels here; `???` marks the swap point.
    */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? real decoder goes here (e.g. ImageIO/libjpeg via JNI)
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 512)
    val height = 64 + math.floorMod(h / 512, 512)
    val features = Array.tabulate(8)(i => math.floorMod(h / (i + 1), 1000) / 1000.0f)
    (width, height, features)
  }

  /** Batch decode over partitions: the mapPartitions shape a vectorized
    * (Arrow/pandas-style) UDF would use — one iterator per partition, no
    * per-row driver involvement, output schema fixed by the Encoder.
    */
  def decodeImageStub(spark: SparkSession, media: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, feats) = stubDecode(r.media)
          DecodedImage(r.doc_id, r.media.length.toLong, w, h, feats)
        }
      }
  }

  /** Deterministic frame sampling plan for a (stub) video column: every k-th
    * frame index up to nFrames — pure expression, no decode needed to plan.
    */
  def frameSampleIndices(nFrames: org.apache.spark.sql.Column, everyK: Int): org.apache.spark.sql.Column =
    when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(everyK)))
      .otherwise(array().cast("array<bigint>"))

  /** Perceptual hash over a decoded feature vector — the aHash recipe
    * (bit i set iff feature i exceeds the vector's mean), packed into a
    * long. Identical media always collide; near-identical media (one
    * perturbed feature) differ in few bits, so the hash feeds either an
    * exact groupBy (image exact-dedup) or the hamming-blocked near-dup
    * join the text side already runs on SimHashes. Pure codegen'd
    * column arithmetic: the mean is a fixed left-associated double sum
    * (deterministic — mirrored bit-for-bit by the golden generator), the
    * bits a when/shift chain — no UDF, no extra pass over the media.
    */
  def perceptualHash(features: org.apache.spark.sql.Column, dims: Int = 8): org.apache.spark.sql.Column = {
    require(dims > 0 && dims <= 63, s"dims must be in 1..63, got $dims")
    val fs = (0 until dims).map(i => get(features, lit(i)).cast("double"))
    val mean = fs.reduce(_ + _) / dims
    (0 until dims)
      .map(i => when(fs(i) > mean, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
  }

  final case class ResizedImage(
      doc_id: Long, width: Int, height: Int, out_width: Int, out_height: Int)

  /** STUB resize over decoded images: aspect-preserving fit into a bounding
    * box — the dimension arithmetic is real (it is what a pipeline plans
    * partition sizes and output schemas from); only the pixel resample is
    * the `???` swap point. Same mapPartitions batch shape as the decoder.
    */
  def resizeStub(
      spark: SparkSession, decoded: Dataset[DecodedImage],
      maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    decoded.mapPartitions { rows =>
      rows.map { d =>
        val scale = math.min(1.0, math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
        // ??? real pixel resample goes here; the stub carries dimensions only
        ResizedImage(
          d.doc_id, d.width, d.height,
          math.max(1, math.round(d.width * scale).toInt),
          math.max(1, math.round(d.height * scale).toInt))
      }
    }
  }
}
