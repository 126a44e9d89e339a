package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge semantics of the cleaning operators the reference implies
  * (transform.py:10-46) — SURVEY §5 item 2. */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def df(rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropNullOrZero removes null and zero measures, keeps negatives") {
    val in = df(
      Row(1L, ts("2024-01-01 10:00:00"), 7L, "a", null),
      Row(2L, ts("2024-01-01 10:00:00"), 7L, "a", 0.0),
      Row(3L, ts("2024-01-01 10:00:00"), 7L, "a", -5.0),
      Row(4L, ts("2024-01-01 10:00:00"), 7L, "a", 2.5))
    val out = Clean.dropNullOrZero("value")(in).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(3L, 4L))
  }

  test("dropNullCritical drops a row when any critical column is null") {
    val in = df(
      Row(1L, null, 7L, "a", 1.0),
      Row(2L, ts("2024-01-01 10:00:00"), null, "a", 1.0),
      Row(3L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0))
    val out = Clean.dropNullCritical(Seq("ts", "user_id"))(in)
    assert(out.count() == 1)
  }

  test("dedupKeepFirst keeps the lowest order key, independent of partitioning") {
    val rows = Seq(
      Row(30L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      Row(10L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      Row(20L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      Row(5L, ts("2024-01-01 11:00:00"), 7L, "a", 1.0))
    // same input in different partition layouts must give identical output
    val results = Seq(1, 3).map { parts =>
      val in = spark.createDataFrame(rows.asJava, schema).repartition(parts)
      Clean.dedupKeepFirst(Seq("ts", "user_id", "event_type", "value"), "event_id")(in)
        .select("event_id").collect().map(_.getLong(0)).toSet
    }
    assert(results.head == Set(10L, 5L))
    assert(results.distinct.size == 1)
  }

  test("dedupKeepFirst is idempotent") {
    val in = df(
      Row(1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      Row(2L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0))
    val once = Clean.dedupKeepFirst(Seq("ts"), "event_id")(in)
    val twice = Clean.dedupKeepFirst(Seq("ts"), "event_id")(once)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("penceToPounds divides by 100 as double") {
    val in = df(Row(1L, ts("2024-01-01 10:00:00"), 7L, "a", 1999.0))
    val out = Clean.penceToPounds("value")(in).select("value").collect()(0).getDouble(0)
    assert(out == 19.99)
  }

  test("cleanEvents on an empty frame yields an empty frame with the full schema") {
    val out = Clean.cleanEvents(spark.createDataFrame(Seq.empty[Row].asJava, schema))
    assert(out.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "year", "month", "day"))
    assert(out.count() == 0)
  }
}
