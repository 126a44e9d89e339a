package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * stages as batched per-partition functions.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[DecodeStub.decodeBatch]] is a deterministic fake that
  * derives a fixed-shape feature vector from the payload bytes. Everything
  * around it — the schema, the Dataset[MediaRecord] encoder, the
  * mapPartitions batching shape (the exact seam where a real decoder or an
  * ONNX session would sit, loaded once per partition, called once per
  * batch), and the partitioning story — is real and tested.
  *
  * Scale notes: payloads never pass through a shuffle here (metadata is
  * derived map-side; feature extraction is mapPartitions). A real lake
  * would store payloads in their own column chunk so metadata-only queries
  * never read the bytes (Parquet column pruning does this for free).
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata, the schema a
    * multimodal lake table carries alongside the scalar columns. */
  final case class MediaRecord(doc_id: Long, source: String, payload: Array[Byte])

  /** Fixed-shape output of the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      source: String,
      n_bytes: Int,
      checksum: String,
      features: Array[Float])

  val FeatureDim  = 4
  val DecodeBatch = 64

  /** The `documents` table viewed as a media table: text bytes stand in
    * for an encoded payload (the container ships no codecs or media
    * fixtures; the plumbing does not care what the bytes mean). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source"),
      col("text").cast("binary").as("payload"))

  /** Map-side typed metadata: byte length + content checksum — computable
    * without decoding, which is what metadata-only scans should touch. */
  def withMeta(media: DataFrame): DataFrame =
    media.withColumn("meta",
      struct(
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  object DecodeStub {
    /** Deterministic fake decoder: 4 "features" from a rolling byte sum —
      * stands in for image-resize / audio-frame / video-frame-sample
      * output. Replace with a real codec at the marked seam; the batch
      * signature (Seq in → Seq out, same order) is the contract. */
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val feats = new Array[Float](FeatureDim)
        var i = 0
        while (i < r.payload.length) {
          feats(i % FeatureDim) += (r.payload(i) & 0xff).toFloat / 255f
          i += 1
        }
        val digest = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
        MediaFeatures(r.doc_id, r.source, r.payload.length,
          String.format("%032x", new java.math.BigInteger(1, digest)), feats)
      }
  }

  /** The decode pipeline: Dataset[MediaRecord] → grouped into
    * DecodeBatch-sized batches per partition → stub decoder → typed
    * features. This is the Scala-Spark equivalent of a pandas-UDF
    * `mapInPandas` stage: per-partition setup happens once, the model/codec
    * sees fixed-size batches, rows never leave the executor. */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "source", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder setup would happen here (load model once)
        it.grouped(DecodeBatch).flatMap(b => DecodeStub.decodeBatch(b.toSeq))
      }
  }
}
