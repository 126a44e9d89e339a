package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming twins of the incremental batch surface (§2.9).
  * The reference has no streaming engine — its 3-hourly watermarked batch
  * (graft.incremental) is the parity implementation — but the same
  * semantics map 1:1 onto Spark streams, and at 100 TB/day this is the
  * deployment shape: file/Kafka source → event-time watermark → windowed
  * aggregate or exactly-once lake append via checkpointed offsets.
  */
object StreamingJobs {

  /** Explicit schema for streaming event sources (readStream requires one;
    * schema-on-read inference is a batch luxury). Timestamps are
    * microsecond-precision (see graft.model.Tables.events for the
    * TIMESTAMP(NANOS) handling on the batch side). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a directory of event parquet files. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Tumbling 1-hour event-time windows with a 1-hour watermark — the
    * streaming twin of q28_hourly_event_windows (§2.9d). The watermark
    * bounds aggregation state: windows older than (max event time − 1 h)
    * are finalized and evicted, so state is O(active windows), not
    * O(stream history). Money rides as exact integer cents, identical to
    * the batch plan. */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .select(col("window.start").as("window_start"), col("n"), col("total_value"))

  /** Exactly-once-ish partitioned lake append (§2.9c): checkpointed source
    * offsets replace the text-file watermark, `foreachBatch` applies the
    * same clean→append batch logic. `Trigger.AvailableNow` drains what
    * exists and stops — the reference's cron-batch cadence without its
    * stale-state double-write hazard. */
  def toLake(events: DataFrame, lakeRoot: String, checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.PartitionedLake.append(
          graft.etl.Clean.cleanEvents(batch), lakeRoot)
      }
}
