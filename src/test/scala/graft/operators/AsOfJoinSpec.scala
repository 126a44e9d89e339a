package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of join semantics on controlled inputs: inclusive bound, no-match
  * nulls, per-key isolation, right-tie dedup. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left timestamp, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L),
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 10:30:00"), 201L),
      (3L, ts("2024-01-01 09:00:00"), 301L)) // key with no right rows
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 11L),
      (1L, ts("2024-01-01 10:00:00"), 12L), // equal ts: inclusive bound
      (1L, ts("2024-01-01 11:30:00"), 13L),
      (2L, ts("2024-01-01 11:00:00"), 21L)) // after left's only row
      .toDF("user_id", "ts", "rid")

    val out = AsOfJoin.asof(left, right, "user_id", "ts", "event_id", Seq("rid"))
      .select("event_id", "asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(
      101L -> 12L, // equal-timestamp purchase matches (inclusive)
      102L -> 13L, // latest before noon
      201L -> -1L, // right row is later -> no match
      301L -> -1L  // key absent from right -> no match
    ))
  }

  test("all asof_* values come from the SAME right row even when a value column is null") {
    // The matched right row (11:00) has note = null. A per-column
    // last(ignoreNulls) would tear: event id from 11:00 but note from
    // 09:00. The struct-packed window must carry the 11:00 row whole —
    // id 13, note NULL.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 101L))
      .toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 12L, Option("early-note")),
      (1L, ts("2024-01-01 11:00:00"), 13L, Option.empty[String]))
      .toDF("user_id", "ts", "rid", "note")

    val row = AsOfJoin.asof(left, right, "user_id", "ts", "click_id", Seq("rid", "note"))
      .select("asof_rid", "asof_note").collect()(0)
    assert(row.getLong(0) == 13L, "must match the latest right row")
    assert(row.isNullAt(1), "note must be the MATCHED row's null, not an older row's value")
  }

  test("dedupRight keeps the smallest order column per (key, ts)") {
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L),
      (1L, ts("2024-01-01 09:00:00"), 3L),
      (1L, ts("2024-01-01 10:00:00"), 9L))
      .toDF("user_id", "ts", "rid")
    val out = AsOfJoin.dedupRight(right, "user_id", "ts", "rid")
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 9L))
  }

  test("matches a broadcast range-join formulation on real events") {
    val e = graft.model.Tables.events(spark, TestSpark.Sf).filter(col("ts").isNotNull)
    val clicks = e.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purch = AsOfJoin.dedupRight(
      e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      "user_id", "ts", "event_id")

    val merged = AsOfJoin.asof(clicks, purch, "user_id", "ts", "event_id", Seq("event_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    // naive quadratic reference: max purchase ts <= click ts via range join
    val naive = clicks.alias("c")
      .join(purch.alias("p"),
        col("c.user_id") === col("p.user_id") && col("p.ts") <= col("c.ts"), "left")
      .groupBy(col("c.event_id"))
      .agg(max_by(col("p.event_id"), col("p.ts")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(merged == naive)
  }
}
