package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, col, lit, sum, when}

import graft.etl.SnapshotLake

/** Incrementally-maintained MATERIALIZED VIEW over a snapshot lake —
  * the production MV-maintenance pattern (Delta Live Tables / DBSQL
  * materialized views): the view `SELECT group, count(*), sum(value)
  * GROUP BY group` is itself a snapshot lake, and [[refresh]] brings it
  * up to date by following the SOURCE's commit log version by version,
  * converting each commit's change feed into SIGNED GROUP DELTAS
  * (insert/update_postimage → +1/+value, delete/update_preimage →
  * −1/−value) and merging ONLY the touched groups. Cost per refresh
  * tracks the CHANGE mass, never the source table: a commit that
  * upserted 0.1% of rows touches the few groups they land in, and a
  * physical-only compaction feeds zero deltas (the q223 cancellation)
  * yet still advances the follower.
  *
  * Exactness: counts and LONG value sums are closed under signed
  * addition, so the incrementally-maintained view is bit-equal to the
  * from-scratch aggregate at every step — the oracle-checkable
  * contract (q236). Callers aggregate money as integer cents for the
  * same reason the whole suite does. A group whose count reaches zero
  * is DELETED from the view (not left as a zero row), so the view's
  * row set always equals the from-scratch GROUP BY's.
  *
  * Stream position rides the view lake's own idempotence-tag index
  * (tag `mv-v<v>`, the [[CdcFeed]]/[[LakeTail]] design): resume probes
  * head-down in O(1) amortized manifest reads, a crash-replayed
  * refresh of any prefix is a no-op, and there is no side-channel
  * state to lose. Retention: the follower must stay within the
  * source's vacuum window, like every incremental reader.
  */
object MatView {

  private def tagFor(v: Long): String = s"mv-v$v"

  /** Apply source version `v`'s group deltas to the view, exactly-once
    * under tag `mv-v<v>`. Returns the view version carrying the tag. */
  def applyVersion(spark: SparkSession, srcRoot: String, mvRoot: String,
                   key: String, groupCol: String, valCol: String, v: Long,
                   index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Long = {
    val changes = SnapshotLake.changeFeed(spark, srcRoot, v - 1, v, key)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes
      .select(col(groupCol), sign.as("__sign"), col(valCol).as("__v"))
      .groupBy(groupCol)
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * col("__v")).as("__dv"))
    if (SnapshotLake.currentVersion(mvRoot).isEmpty) {
      // bootstrap: the first deltas ARE the view (no negative deltas can
      // exist against an empty view)
      val init = delta.filter(col("__dn") > 0L)
        .select(col(groupCol), col("__dn").as("n_rows"),
          col("__dv").as("sum_v"))
      SnapshotLake.appendOnce(init, mvRoot, tagFor(v), index)
    } else {
      // touched groups only: read-modify-write against the current view,
      // deleting groups whose count reaches zero. Both sides are
      // group-cardinality sized (the view by definition, the delta by
      // its own GROUP BY), so the full-outer join — which no broadcast
      // strategy serves — shuffles only group-level rows, never source
      // mass; the merge then rewrites only candidate files.
      val cur = SnapshotLake.read(spark, mvRoot)
      val updated = cur.join(delta, Seq(groupCol), "full_outer")
        .select(col(groupCol),
          (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
            .as("sum_v"),
          col("__dn").isNotNull.as("__touched"))
        .filter(col("__touched")) // untouched groups stay in carried files
        .withColumn("__del", col("n_rows") === 0L)
        .drop("__touched")
      SnapshotLake.mergeOnce(spark, mvRoot, updated, groupCol, tagFor(v),
        index, Some("__del"))
    }
  }

  /** Refresh the view through every source version after the newest one
    * it has applied, oldest first; returns the source versions applied
    * this call (empty = already fresh = a replayed refresh is a
    * no-op). */
  def refresh(spark: SparkSession, srcRoot: String, mvRoot: String,
              key: String, groupCol: String, valCol: String,
              index: SnapshotLake.IndexSpec = SnapshotLake.IndexSpec.none): Seq[Long] = {
    val head = SnapshotLake.currentVersion(srcRoot).getOrElse(return Seq.empty)
    var last = 0L
    var v = head
    while (v >= 1L && last == 0L) {
      if (SnapshotLake.tagVersion(mvRoot, tagFor(v)).isDefined) last = v
      else v -= 1
    }
    ((last + 1) to head).map { w =>
      applyVersion(spark, srcRoot, mvRoot, key, groupCol, valCol, w, index); w
    }
  }
}
