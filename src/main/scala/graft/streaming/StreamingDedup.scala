package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

import graft.llm.Dedup

/** Streaming NEAR-duplicate dedup — MinHash-LSH applied to an *arriving
  * document stream*, the always-on ingest form of the batch dedup family
  * (exact streaming dedup: [[StreamingJobs.dedupStream]]; incremental
  * batch-vs-corpus near-dup: q161). This was the one empty cell left in
  * the dedup × streaming matrix (VERDICT r10 item 1).
  *
  * Shape: q161's incremental idiom made CONTINUOUS via `foreachBatch`.
  * Each micro-batch of arriving documents is
  *   1. indexed — MinHash signatures (one [[graft.functions.MinHashAgg]]
  *      sketch aggregate, map-side partial, one shuffle on doc_id) and
  *      hashed shingle sets, both written to the corpus state BEFORE any
  *      dedup decision (the policy needs dropped docs as dominators too,
  *      see below);
  *   2. deduped — banded candidates within the batch (LSH self-join) and
  *      against the accumulated corpus band index (cross join on the
  *      PRE-EXPLODED (band, slice) relation — the corpus is never
  *      re-scanned for band derivation, and never self-joins), every
  *      candidate verified with exact hashed-shingle Jaccard;
  *   3. emitted — survivors land in a per-batch output directory.
  *
  * Policy and batch-boundary independence: a document is dropped iff it
  * verifies at ≥ threshold against ANY previously-arrived document —
  * whether or not that document itself survived (the same contract as the
  * batch keep-lowest-id policy, which drops every doc_b of the pair
  * relation regardless of doc_a's own fate). Because the decision for doc
  * d depends only on the SET of documents seen before d, the drained
  * output is identical however the source files split into micro-batches
  * — proven in StreamingSpec by draining the same corpus one-file-per-
  * trigger vs all-at-once. When arrival order follows the ingest id (the
  * monotone doc_id a production ingest assigns), "first arrival wins"
  * coincides exactly with batch q36's keep-lowest-id policy, which is what
  * lets the DuckDB all-pairs oracle replay the stream's final state.
  *
  * Exactly-once: all three writes are keyed by `batchId` and
  * mode-overwrite, so a crash-replayed micro-batch (same offsets, same
  * batchId — Spark's checkpoint contract) rewrites byte-identical state
  * instead of double-appending; the within-batch candidate join reads the
  * batch's own just-written index, so a replay sees exactly what the
  * first attempt saw (prior state is filtered to batch < batchId).
  *
  * Scale: per micro-batch the work is O(batch) map-side hashing + one
  * batch-sized sketch-agg shuffle + a join of batch bands against the
  * corpus band index. At 100 TB the state directories are a bucketed lake
  * relation — bucket both sides on (band, slice) and the per-batch cross
  * join shuffles ONLY the batch side; state grows by exactly the batch's
  * band/set rows per trigger (append-only, compacted out-of-band like any
  * lake table). The oracle-scale stand-in keeps one parquet dir per batch
  * and unions them on read — same relation, minus the bucketing DDL.
  */
object StreamingDedup {

  /** Explicit schema for streaming document sources (readStream requires
    * one; matches the corpus parquet layout). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of document parquet files,
    * `maxFilesPerTrigger = 1` so every staged file becomes its own
    * micro-batch (the arrival granularity the dedup must be independent
    * of). */
  def documentsStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  private def batchDir(root: String, kind: String, batchId: Long): String =
    s"$root/$kind/b=$batchId"

  /** Union of all state relations of `kind` committed by batches strictly
    * before `batchId` (a crash-replayed batch must not see its own or any
    * later attempt's state). None when no prior batch exists. */
  private def priorState(spark: SparkSession, root: String, kind: String,
                         batchId: Long): Option[DataFrame] = {
    val base = Paths.get(root, kind)
    if (!Files.isDirectory(base)) return None
    val dirs = {
      val s = Files.list(base)
      try
        s.map[String](_.getFileName.toString).toArray.toSeq
          .collect { case n: String if n.startsWith("b=") &&
            n.stripPrefix("b=").toLong < batchId => base.resolve(n).toString }
      finally s.close()
    }
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*))
  }

  /** One micro-batch of the continuous near-dedup: index, dedup against
    * (corpus-so-far ∪ earlier-in-batch), emit survivors to the per-batch
    * output directory. Pure batch logic — callable directly from tests,
    * wired into the stream by [[nearDedupTo]]. */
  def processBatch(batch: DataFrame, stateRoot: String, batchId: Long,
                   threshold: Double): Unit =
    dedupBatch(batch, stateRoot, batchId, threshold)
      .write.mode("overwrite").parquet(batchDir(stateRoot, "out", batchId))

  /** Steps 1-2 of the per-batch dedup (index commit + decision), returning
    * this batch's survivors without committing them — the seam the two
    * output protocols ([[processBatch]]'s per-batch directories,
    * [[processBatchToLake]]'s snapshot-lake commits) share. */
  private def dedupBatch(batch: DataFrame, stateRoot: String, batchId: Long,
                         threshold: Double): DataFrame = {
    val spark = batch.sparkSession

    // ── 1. index the batch and COMMIT the index before deduping: the
    //      policy needs every seen doc as a potential dominator, dropped
    //      or not, and overwrite-by-batchId makes a replay idempotent.
    Dedup.bandsOf(Dedup.minhashSignatures(batch))
      .write.mode("overwrite").parquet(batchDir(stateRoot, "bands", batchId))
    Dedup.shingleSets(batch)
      .write.mode("overwrite").parquet(batchDir(stateRoot, "sets", batchId))

    // Re-read the committed index (materialized — no recompute of the
    // sketch aggregate for the joins below).
    val bB = spark.read.parquet(batchDir(stateRoot, "bands", batchId))
    val sB = spark.read.parquet(batchDir(stateRoot, "sets", batchId))

    // ── 2. candidates: within-batch LSH self-join (a < b) plus batch ⋈
    //      corpus band index. Both verified with exact hashed-shingle
    //      Jaccard; sets come from this batch ∪ prior state.
    val within = bB.alias("a")
      .join(bB.alias("b"),
        col("a.band") === col("b.band") && col("a.slice") === col("b.slice") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val cross = priorState(spark, stateRoot, "bands", batchId).map { pb =>
      bB.alias("a")
        .join(pb.alias("b"),
          col("a.band") === col("b.band") && col("a.slice") === col("b.slice"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    val allSets = priorState(spark, stateRoot, "sets", batchId)
      .map(sB.unionByName(_)).getOrElse(sB)

    // dominated = the later side of a verified within-batch pair, or the
    // arriving side of a verified cross pair (the corpus doc arrived
    // first by construction).
    val dominated = {
      val w = Dedup.verifiedJaccard(within, allSets)
        .filter(col("jaccard") >= threshold)
        .select(col("doc_b").as("doc_id"))
      cross.map(c =>
          w.unionByName(Dedup.verifiedJaccard(c, allSets)
            .filter(col("jaccard") >= threshold)
            .select(col("doc_a").as("doc_id"))))
        .getOrElse(w)
        .distinct()
    }

    // ── 3. survivors of this batch; the caller owns the output commit.
    batch.join(dominated, Seq("doc_id"), "left_anti")
  }

  /** The multi-writer composition (VERDICT r10 item 7): this batch's
    * survivors committed to a [[graft.etl.SnapshotLake]] through the
    * tag-idempotent `appendOnce` — exactly-once ACROSS both mechanisms
    * (streaming checkpoint replay on the input side, manifest CAS on the
    * output side). A crash anywhere replays the batch: the index rewrite
    * is overwrite-idempotent, and the lake commit is a no-op if the
    * batch's tag already landed — so the deduped lake gains each
    * micro-batch exactly once however the drain dies, while concurrent
    * compactions/readers ride the manifest protocol untouched. */
  def processBatchToLake(batch: DataFrame, stateRoot: String, lakeRoot: String,
                         batchId: Long, threshold: Double,
                         index: graft.etl.SnapshotLake.IndexSpec =
                           graft.etl.SnapshotLake.IndexSpec.none): Unit = {
    graft.etl.SnapshotLake.appendOnce(
      dedupBatch(batch, stateRoot, batchId, threshold),
      lakeRoot, s"dedup-b$batchId", index)
    ()
  }

  /** [[nearDedupTo]]'s snapshot-lake twin: the continuous dedup writing
    * through the manifest commit protocol. */
  def nearDedupToSnapshotLake(docs: DataFrame, stateRoot: String,
                              lakeRoot: String, checkpointDir: String,
                              threshold: Double,
                              index: graft.etl.SnapshotLake.IndexSpec =
                                graft.etl.SnapshotLake.IndexSpec.none): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchToLake(batch, stateRoot, lakeRoot, batchId, threshold, index)
      }

  /** The continuous query: arriving documents → per-batch near-dedup →
    * per-batch survivor directories under `stateRoot/out`. AvailableNow
    * drains what exists and stops; an unbounded production stream runs the
    * same writer with a processing-time trigger. */
  def nearDedupTo(docs: DataFrame, stateRoot: String, checkpointDir: String,
                  threshold: Double): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateRoot, batchId, threshold)
      }

  /** All survivors drained so far — the deduped corpus the downstream
    * trainer reads. */
  def survivors(spark: SparkSession, stateRoot: String): DataFrame = {
    val base = Paths.get(stateRoot, "out")
    val dirs = {
      val s = Files.list(base)
      try s.map[String](_.toString).toArray.toSeq.map(_.toString).sorted
      finally s.close()
    }
    spark.read.parquet(dirs: _*)
  }
}
