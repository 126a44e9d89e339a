package graft.streaming

import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.etl.SnapshotLake

/** Continuous CDC apply: a stream of change rows (upserts + tombstones)
  * merged into a [[SnapshotLake]] exactly once per micro-batch — the
  * "apply the CDC feed to the lake" production loop, composed from the
  * pieces each proven separately: per-batch [[SnapshotLake.mergeOnce]]
  * (tag `cdc-b<batchId>` ⇒ a crash-replayed batch is a no-op), the
  * min/max index targeting each merge's copy-on-write rewrite AND
  * re-indexing the rewritten files for the next batch, and the manifest
  * CAS isolating concurrent readers at every intermediate version. The
  * reference has no streaming story at all (a cron-invoked batch —
  * ref: pipeline.py); this is what its orders feed would need at 100 TB:
  * the per-batch write cost tracks the batch's TOUCHED files, not the
  * table, and the lake stays time-travelable across every applied batch.
  */
object CdcApply {

  /** File-fed change stream with the schema taken from the staged
    * directory itself (one footer read) — the q216 staging idiom. */
  def changesStream(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** The continuous query: each micro-batch of change rows MERGEs into
    * the lake under its batch tag. `deleteCol` rows flagged true are
    * tombstone deletes; everything else upserts by `key`. AvailableNow
    * drains what exists and stops; an unbounded production stream runs
    * the same writer on a processing-time trigger. */
  def upsertTo(changes: DataFrame, root: String, key: String,
               checkpointDir: String,
               index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none,
               deleteCol: Option[String] = None): DataStreamWriter[Row] =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotLake.mergeOnce(batch.sparkSession, root, batch, key,
          s"cdc-b$batchId", index, deleteCol)
        ()
      }
}
