package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.PartitionedLake

/** Structured-Streaming twins vs their batch counterparts. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** events re-materialized with micro timestamps so the file stream can
    * read them with an explicit schema (the raw testdata file carries
    * TIMESTAMP(NANOS); see Tables.events). */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    graft.model.Tables.events(spark, TestSpark.Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourlyWindows equals the batch hourly aggregate") {
    val q = StreamingJobs.hourlyWindows(StreamingJobs.eventsStream(spark, eventsDir))
      .writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
      .select("window_start", "n", "total_value").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = graft.model.Tables.events(spark, TestSpark.Sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet

    assert(streamed == batch)
  }

  test("toLake drains the stream exactly-once into the partitioned lake") {
    val work = Files.createTempDirectory("graft-stream-lake").toString
    val lake = s"$work/lake"

    def drain(): Unit = {
      val q = StreamingJobs.toLake(
        StreamingJobs.eventsStream(spark, eventsDir), lake, s"$work/cp").start()
      q.awaitTermination(120000)
    }
    drain()
    val expected = graft.etl.Clean.cleanEvents(
      graft.model.Tables.events(spark, TestSpark.Sf)).count()
    assert(PartitionedLake.read(spark, lake).count() == expected)

    // a second AvailableNow run over the same checkpoint sees no new files
    // and must not double-write (the checkpointed-offset exactly-once story)
    drain()
    assert(PartitionedLake.read(spark, lake).count() == expected)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val q = StreamingJobs.attributionJoin(
        StreamingJobs.eventsStream(spark, eventsDir)
          .filter(col("event_type") === "purchase" && col("ts").isNotNull),
        StreamingJobs.eventsStream(spark, eventsDir)
          .filter(col("event_type") === "click" && col("ts").isNotNull),
        windowMicros = 30L * 60 * 1000000, watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("attr_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("attr_stream")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = graft.model.Tables.events(spark, TestSpark.Sf)
      .filter(col("ts").isNotNull)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val batch = p.join(c, Seq("user_id"))
      .filter(col("cts") <= col("pts") &&
        col("cts") > col("pts") - expr("INTERVAL 30 MINUTES"))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch, "drained stream join must equal the batch interval join")
    assert(streamed.nonEmpty)
  }
}
