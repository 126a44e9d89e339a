package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tables
import graft.streaming.StreamingJobs

/** Oracle-backed Structured Streaming evidence (§2.9d): the hourly-window
  * aggregation run as a REAL stream — `readStream` file source →
  * streaming aggregate → memory sink, drained with `Trigger.AvailableNow`
  * — and hash-compared against the same DuckDB SQL as its batch twin
  * (q28). Complete output mode emits every window at end-of-drain, so the
  * streamed result equals the batch result exactly; the watermarked
  * append-mode variant (bounded state, late-data eviction) is the
  * production shape and is unit-tested in StreamingSpec.
  */
object StreamingQueries {

  /** The raw events.parquet carries TIMESTAMP(NANOS), which the streaming
    * parquet source cannot declare in a schema; stream instead from a
    * Spark-written micros copy, materialized once per (session, sf dir).
    * At 100 TB the stream source is a landing directory the upstream
    * system writes — this copy stands in for it. */
  private val staged = new graft.etl.Memo[(SparkSession, String), String]
  private def stagedEventsDir(s: SparkSession, d: String): String =
    staged((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-stream-events").toString
      Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(tmp)
      tmp
    }

  /** Staged events WITH at-least-once redelivery: the full table plus an
    * exact copy of every 5th event appended as a second file — what a
    * retrying source hands the stream. Memoized per (session, sf dir). */
  private val stagedDup = new graft.etl.Memo[(SparkSession, String), String]
  private def dupEventsDir(s: SparkSession, d: String): String =
    stagedDup((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-stream-dup").toString
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.write.mode("overwrite").parquet(tmp)
      ev.filter(col("event_id") % 5 === 0).write.mode("append").parquet(tmp)
      tmp
    }

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  val defs: Vector[Q] = Vector(

    // ── §2.9d through the actual streaming engine: same oracle text as
    //    the batch twin q28 — the stream must reproduce it bit-for-bit.
    Q("q63_streaming_hourly_windows",
      """SELECT date_trunc('hour', ts) AS window_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q63_sink_${sinkSeq.getAndIncrement()}"
      val query = StreamingJobs
        .hourlyWindowsComplete(StreamingJobs.eventsStream(s, stagedEventsDir(s, d)))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      s.table(sink).orderBy("window_start")
    },

    // ── Streaming exact-dedup (§2.9 × the dedup family): the staged source
    //    re-delivers 20% of the events (every 5th event id appended as an
    //    exact copy — the at-least-once redelivery a retrying source
    //    produces), and the stream's keyed dedup state must collapse them
    //    so the drained sink equals a plain aggregate over the ORIGINAL
    //    events — which is exactly what the oracle computes. Duplicate rows
    //    are bit-identical copies, so keep-first nondeterminism cannot leak
    //    into the result.
    Q("q78_streaming_dedup",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q78_sink_${sinkSeq.getAndIncrement()}"
      val query = StreamingJobs
        .dedupStream(StreamingJobs.eventsStream(s, dupEventsDir(s, d)))
        .writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      s.table(sink)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
        .orderBy("event_type")
    }
  )
}
