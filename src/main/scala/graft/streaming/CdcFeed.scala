package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, not}

import graft.etl.SnapshotLake

/** Change-data-feed SOURCE on the snapshot lake — the Delta CDF-source
  * pattern, composing the q223 manifest-diff feed with q226's tagged
  * apply loop into a continuous two-lake pipeline: a consumer follows
  * the source lake's head version by version, emits
  * `changeFeed(v-1, v)` as one micro-batch per commit, and applies it
  * exactly-once into a destination lake.
  *
  * Progress IS the destination's idempotence-tag state: batch v commits
  * under tag `cdf-v<v>`, so resume scans head-down for the newest
  * applied tag ([[SnapshotLake.tagVersion]] — O(1) amortized manifest
  * reads per probe through the checkpoint tag index) and a
  * crash-replayed batch is a no-op. No side-channel offsets file: the
  * lake's own exactly-once primitive carries the stream position, which
  * is what makes the pipeline correct across ANY interleaving of crash,
  * replay, and concurrent destination readers.
  *
  * Per-version semantics ride the feed's classification: insert /
  * update_postimage rows upsert, delete rows tombstone (pre-images are
  * dropped — the apply side needs only the post state), and a
  * physical-only source commit (compaction) feeds ZERO changes — the
  * destination still advances its applied tag, so a compacting source
  * never stalls or replays the follower.
  *
  * [[drain]] is the AvailableNow form: drain every committed version,
  * stop. An unbounded production feed runs the same loop under a
  * processing-time trigger. At 100 TB each batch costs the CHANGE mass
  * of its source commit (the q223 property: only removed/added files
  * enter the diff, vector deltas prune to candidate files) plus an
  * index-targeted merge on the destination (the q222/q226 property) —
  * never either table.
  *
  * Retention contract: the follower must stay within the source's
  * vacuum window — the v-1 manifest of the next unapplied version must
  * still resolve — the same contract Delta documents between CDF
  * readers and VACUUM. The reference has no incremental story at all
  * (ref: pipeline.py re-reads the full table per cron run); this is the
  * shape its reporting mart would need once the table stops fitting a
  * re-read.
  */
object CdcFeed {

  private def tagFor(v: Long): String = s"cdf-v$v"

  /** Apply source version `v`'s change batch into `dstRoot`,
    * exactly-once under tag `cdf-v<v>`; returns the destination version
    * that carries it (existing one on replay). Bootstrap: an empty
    * destination takes the batch's upserts as a tagged append — deletes
    * against nothing drop nothing. */
  def applyVersion(spark: SparkSession, srcRoot: String, dstRoot: String,
                   key: String, v: Long,
                   index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Long = {
    val changes = SnapshotLake.changeFeed(spark, srcRoot, v - 1, v, key)
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("__del", col("_change_type") === "delete")
      .drop("_change_type")
    if (SnapshotLake.currentVersion(dstRoot).isEmpty)
      SnapshotLake.appendOnce(changes.filter(not(col("__del"))).drop("__del"),
        dstRoot, tagFor(v), index)
    else
      SnapshotLake.mergeOnce(spark, dstRoot, changes, key, tagFor(v),
        index, Some("__del"))
  }

  /** Drain every source version after the newest one the destination
    * has applied (found from the destination's own tag state), oldest
    * first; returns the source versions applied this call — empty when
    * already caught up, which is also what makes a replayed drain a
    * no-op. */
  def drain(spark: SparkSession, srcRoot: String, dstRoot: String,
            key: String,
            index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Seq[Long] = {
    val head = SnapshotLake.currentVersion(srcRoot).getOrElse(return Seq.empty)
    var last = 0L
    var v = head
    while (v >= 1L && last == 0L) {
      if (SnapshotLake.tagVersion(dstRoot, tagFor(v)).isDefined) last = v
      else v -= 1
    }
    ((last + 1) to head).map { w =>
      applyVersion(spark, srcRoot, dstRoot, key, w, index); w
    }
  }
}
