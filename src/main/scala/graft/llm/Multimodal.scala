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

  // ── Frame sampling (1→N) ────────────────────────────────────────────

  /** One sampled frame of a payload; `frame_idx` is the frame's index in
    * the ORIGINAL frame sequence (0, every, 2·every, …), so downstream
    * reassembly can order frames without carrying offsets. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: split each payload into `frameBytes`-sized frames
    * (last one may be short) and keep every `every`-th — the video
    * keyframe / audio-window sampling shape. This is the 1→N flavor of
    * the decode seam: each record explodes into frame rows that never
    * shuffle (mapPartitions; a real codec would decode frame boundaries
    * here instead of fixed-size chunks). Oracle-backed by q67, which
    * reassembles the sample and checksums it against an independent
    * recomputation. */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int)
                 (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && every > 0)
    media.select("doc_id", "source", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { r =>
          val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames).filter(_ % every == 0).map { k =>
            val from = k * frameBytes
            val until = math.min(from + frameBytes, r.payload.length)
            MediaFrame(r.doc_id, k, java.util.Arrays.copyOfRange(r.payload, from, until))
          }
        }
      }
  }

  // ── Resize (1→1, bytes→smaller bytes) ───────────────────────────────

  /** Deterministic resize stub: stride-sample the payload down to at most
    * `targetBytes` (stands in for an image resize — same 1→1
    * bytes→smaller-bytes contract, map-side, payload never shuffles).
    * Replace the byte stride with a real scaler at this seam. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    require(targetBytes > 0)
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = payload(((i.toLong * payload.length) / targetBytes).toInt)
        i += 1
      }
      out
    }
  }

  /** Resize stage over a media frame: payload column replaced by its
    * resized version, metadata preserved — chainable before
    * [[decodeFeatures]] exactly like a real image pipeline. */
  def resized(media: DataFrame, targetBytes: Int)
             (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select("doc_id", "source", "payload").as[MediaRecord]
      .mapPartitions(_.map(r => r.copy(payload = resizeStub(r.payload, targetBytes))))
  }

  // ── Perceptual-hash near-dup (dedup × multimodal) ───────────────────

  /** Difference-hash (dHash) parameters: a 33-sample stride grid gives a
    * 32-bit signature — the public perceptual-hash recipe (resize to a
    * tiny grid, hash the adjacent-sample gradient signs), over the same
    * stride "resize" contract as [[resizeStub]]. */
  val DhashGrid = 33
  /** 4 × 8-bit pigeonhole bands: a pair at Hamming ≤ 3 differs in at most
    * 3 bands, so it collides in ≥ 1 — recall 1 to Hamming DhashBands−1,
    * the SimHash (q37) banding argument verbatim. */
  val DhashBands = 4

  final case class MediaHash(doc_id: Long, dhash: Long)

  /** 32-bit dHash of a payload: stride-sample down to [[DhashGrid]] bytes
    * (identity when the payload is shorter — [[resizeStub]]'s contract),
    * bit i set iff sample i < sample i+1. Deterministic pure-byte math, so
    * the DuckDB oracle recomputes it from the text payload (ASCII in this
    * corpus — q67's byte/char equivalence); a real image pipeline swaps
    * the stride sample for a grayscale resize at this seam and keeps the
    * gradient-sign hash unchanged. */
  def dHash(payload: Array[Byte], grid: Int = DhashGrid): Long = {
    val len = payload.length
    val g = math.min(len, grid)
    @inline def at(i: Int): Int =
      if (len > grid) payload(((i.toLong * len) / grid).toInt) & 0xff
      else payload(i) & 0xff
    var h = 0L
    var i = 0
    while (i < g - 1) {
      if (at(i) < at(i + 1)) h |= (1L << i)
      i += 1
    }
    h
  }

  /** (doc_id, dhash) signatures via the decode seam — map-side, payloads
    * never shuffle; only the 12-byte hash row leaves the executor. */
  def dhashes(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    media.select("doc_id", "source", "payload").as[MediaRecord]
      .mapPartitions(_.map(r => MediaHash(r.doc_id, dHash(r.payload))))
  }

  /** Perceptual near-dup pairs at Hamming ≤ maxHamming: banded candidate
    * join (never all-pairs) + exact bit_count(xor) verify — the media twin
    * of [[Dedup.simhashPairs]], completing the dedup × multimodal cell. */
  def dhashPairs(media: DataFrame, maxHamming: Int)
                (implicit spark: SparkSession): DataFrame = {
    require(maxHamming <= DhashBands - 1,
      s"bands guarantee recall only to hamming ${DhashBands - 1}")
    val sigs = dhashes(media).toDF()
    val bandBits = 32 / DhashBands
    val bands = sigs.select(
        col("doc_id"), col("dhash"),
        posexplode(array((0 until DhashBands).map(b =>
          shiftright(col("dhash"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .toDF("doc_id", "dhash", "band", "key")
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ── Waveform analysis (audio twin of the frame sampler) ─────────────

  /** Per-frame waveform statistics: payload bytes read as unsigned 8-bit
    * samples (a PCM-u8 stand-in), cut into `frameBytes`-sample frames,
    * each reduced map-side to integer energy (sum of amplitudes) and peak
    * (max amplitude). This is the audio feature-extraction seam — swap
    * the amplitude loop for a real decoder + spectral kernel and the
    * shape is unchanged: payloads never shuffle, one frame-stat row per
    * frame leaves the executor, downstream aggregation sees only the
    * tiny numeric relation. Integer outputs keep the stage bit-exactly
    * replayable (q127's DuckDB twin recomputes them from the same
    * bytes). */
  final case class WaveFrame(doc_id: Long, frame_idx: Int, energy: Long, peak: Int)

  def waveform(media: DataFrame, frameBytes: Int)
              (implicit spark: SparkSession): Dataset[WaveFrame] = {
    import spark.implicits._
    require(frameBytes > 0)
    media.select("doc_id", "source", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { r =>
          val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
          Iterator.range(0, nFrames).map { k =>
            val from = k * frameBytes
            val until = math.min(from + frameBytes, r.payload.length)
            var e = 0L
            var p = 0
            var i = from
            while (i < until) {
              val v = r.payload(i) & 0xff
              e += v
              if (v > p) p = v
              i += 1
            }
            WaveFrame(r.doc_id, k, e, p)
          }
        }
      }
  }
}
