package graft.incremental

import java.nio.file.{Files, Paths, Path}
import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.PartitionedLake

/** The incremental batch runner — the reference's 3-hourly ETL loop
  * restated as one lazy Spark plan per batch with driver-side watermark
  * state (ref: pipeline/ETL/extract.py:36-81,142-143 state file;
  * pipeline/ETL/pipeline.py:13-16 empty-batch short-circuit;
  * pipeline/ETL/load.py:50-56 partitioned append).
  *
  * Semantics reproduced exactly:
  *   - state = one ISO-8601 `max(at)` timestamp in a text file; missing
  *     file ⇒ first run ⇒ full extract (extract.py:66-70);
  *   - extraction bound is strictly-greater-than watermark **plus one
  *     second** (extract.py:51-53) — late rows inside the same second are
  *     dropped; SURVEY §7.4 trap 2 documents the `>=`+dedup alternative;
  *   - zero extracted rows short-circuit the batch (no write, no state
  *     update — pipeline.py:13-16);
  *   - each batch cleans, derives year/month/day, appends to the lake,
  *     then persists the new `max(at)`.
  *
  * Exactly-once story (same as the reference): appends are idempotent only
  * under watermark discipline — re-running with stale state double-writes.
  * The Structured Streaming twin with checkpointed offsets lives in
  * graft.streaming; this module is the deliberate batch restatement.
  *
  * At scale: the watermark filter lands on the source scan (JDBC pushdown
  * or parquet row-group stats), state IO is O(1) driver-side, and the
  * append only touches the partitions present in the batch.
  */
final class Incremental(stateFile: Path) {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Read the persisted watermark; None on first run (extract.py:66-70). */
  def readState(): Option[Timestamp] =
    if (Files.exists(stateFile))
      Some(Timestamp.valueOf(LocalDateTime.parse(
        Files.readString(stateFile).trim, fmt)))
    else None

  /** Persist the new watermark (extract.py:142-143). */
  def writeState(ts: Timestamp): Unit = {
    Files.createDirectories(stateFile.getParent)
    Files.writeString(stateFile, ts.toLocalDateTime.format(fmt))
  }

  /** The extraction lower bound: watermark + 1 s (extract.py:51-53). */
  def adjustedBound(w: Timestamp): Timestamp =
    Timestamp.valueOf(w.toLocalDateTime.plusSeconds(1))

  /** Incremental extract: everything after the adjusted watermark
    * (S2/P11 — the filter reaches the source scan). */
  def extract(source: DataFrame, tsCol: String): DataFrame =
    readState() match {
      case Some(w) => source.filter(col(tsCol) > lit(adjustedBound(w)))
      case None    => source
    }

  /** Run one batch: extract → clean → append → advance state.
    * Returns the number of rows appended (0 ⇒ short-circuited). */
  def runBatch(source: DataFrame, lakeRoot: String): Long = {
    val batch = extract(source, "ts")
    val cleaned = graft.etl.Clean.cleanEvents(batch).persist()
    try {
      val agg = cleaned.agg(count(lit(1)), max(col("ts"))).collect()(0)
      val n = agg.getLong(0)
      if (n == 0) 0L // empty-batch short-circuit (pipeline.py:13-16)
      else {
        PartitionedLake.append(cleaned, lakeRoot)
        writeState(agg.getTimestamp(1))
        n
      }
    } finally { val _ = cleaned.unpersist() }
  }
}

object Incremental {
  /** Runner with the reference's state path layout
    * (`pipeline-state/last_run.txt`). */
  def apply(stateDir: String): Incremental =
    new Incremental(Paths.get(stateDir, "pipeline-state", "last_run.txt"))
}
