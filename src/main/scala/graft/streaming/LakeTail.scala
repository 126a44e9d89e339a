package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.SnapshotLake

/** Append-only streaming TAIL of a snapshot lake — the Delta streaming
  * source with `skipChangeCommits` re-expressed on the manifest log: a
  * consumer follows the source lake's head version by version and emits
  * each APPEND commit's added rows as one micro-batch, read STRAIGHT
  * from the commit's own `add` file list — an append's files ARE its
  * rows, so the per-batch cost is the batch's data mass with no diff
  * join at all (cheaper than [[CdcFeed]], which pays a full-outer key
  * join to classify changes).
  *
  * Non-append commits emit NOTHING and still advance the stream
  * position: a compaction or Z-order rewrite is physical-only churn the
  * tail must not re-emit (re-emitting a compaction would duplicate the
  * whole table downstream), and a merge/delete/restore is a CHANGE
  * commit an append-only consumer explicitly opts out of — exactly
  * Delta's `skipChangeCommits` contract. A consumer that needs those
  * semantics is a [[CdcFeed]] consumer, not a tail consumer; the two
  * sources share the lake and differ only in what a commit means to
  * them. This split is what production pipelines run: the CDC follower
  * maintains a replica, the tail feeds append-only consumers (feature
  * extraction, metrics, training-data accumulation) that must never see
  * a row twice.
  *
  * Stream position rides the DESTINATION lake's idempotence-tag index
  * (tag `tail-v<v>` per source version, probed via
  * [[SnapshotLake.tagVersion]]) — the same no-side-channel design as
  * [[CdcFeed]]: resume finds the newest applied tag head-down, a
  * crash-replayed batch is a no-op, and an empty (skipped) batch still
  * commits its tag so a compacting source never stalls the follower.
  * `transform` runs per micro-batch before the exactly-once append —
  * the map step of a tail → transform → sink pipeline.
  *
  * [[drain]] is the AvailableNow form; an unbounded feed runs the same
  * loop under a processing-time trigger. Retention: the follower must
  * stay within the source's vacuum window, like every incremental
  * reader of the lake.
  */
object LakeTail {

  private def tagFor(v: Long): String = s"tail-v$v"

  /** Apply source version `v` to the destination, exactly-once under
    * tag `tail-v<v>`: an append commit's added rows flow through
    * `transform` into a tagged append; any other op commits an empty
    * tagged batch (position advances, nothing emits). Returns the
    * destination version carrying the tag (the existing one on
    * replay). */
  def applyVersion(spark: SparkSession, srcRoot: String, dstRoot: String,
                   v: Long, transform: DataFrame => DataFrame,
                   index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Long = {
    val (op, add) = SnapshotLake.commitChange(srcRoot, v)
    if (op == "append" && add.nonEmpty)
      SnapshotLake.appendOnce(
        transform(SnapshotLake.readFiles(spark, srcRoot, add)),
        dstRoot, tagFor(v), index)
    else {
      // Skipped commit: a schema-only empty batch, tag still advances.
      // Version v's own state may list NO files (a delete or overwrite
      // that emptied the table) — reading it would throw and stall the
      // tail on the very commit it must skip past, so the schema comes
      // from the newest version ≤ v that HAS files, transformed like any
      // payload; failing that, from the destination verbatim (no
      // transform: it is already in output shape). A source with no
      // file-bearing history and no destination yet has nothing to know
      // a schema from — skip the tag too; every such version is an
      // op≠append no-op, so the re-walk on the next drain stays O(1)
      // manifest reads per version and applies nothing twice.
      // Bounded at the retention edge: a version past the vacuum horizon
      // has no record, so resolving it would THROW — stop the walk there
      // and let the destination-schema fallback engage instead of
      // stalling the tail on the very commit it must skip.
      val srcEmpty = (v to 1L by -1L).iterator
        .takeWhile(w => SnapshotLake.versionExists(srcRoot, w))
        .find(w => SnapshotLake.files(srcRoot, w).nonEmpty)
        .map(w => transform(SnapshotLake.read(spark, srcRoot, Some(w)).limit(0)))
      val payload = srcEmpty.orElse(
        SnapshotLake.currentVersion(dstRoot)
          .filter(dv => SnapshotLake.files(dstRoot, dv).nonEmpty)
          .map(dv => SnapshotLake.read(spark, dstRoot, Some(dv)).limit(0)))
      payload match {
        case Some(p) => SnapshotLake.appendOnce(p, dstRoot, tagFor(v), index)
        case None => SnapshotLake.currentVersion(dstRoot).getOrElse(0L)
      }
    }
  }

  /** Drain every source version after the newest one the destination
    * has applied, oldest first; returns the source versions applied
    * this call (empty = already caught up = a replayed drain is a
    * no-op). */
  def drain(spark: SparkSession, srcRoot: String, dstRoot: String,
            transform: DataFrame => DataFrame = identity,
            index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Seq[Long] = {
    val head = SnapshotLake.currentVersion(srcRoot).getOrElse(return Seq.empty)
    var last = 0L
    var v = head
    while (v >= 1L && last == 0L) {
      if (SnapshotLake.tagVersion(dstRoot, tagFor(v)).isDefined) last = v
      else v -= 1
    }
    ((last + 1) to head).map { w =>
      applyVersion(spark, srcRoot, dstRoot, w, transform, index); w
    }
  }
}
