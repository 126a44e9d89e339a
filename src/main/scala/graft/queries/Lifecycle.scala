package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Data-lifecycle operators a production lake owes its users: subject
  * erasure (compliance delete-by-key) and change-data-capture merge
  * (keep-latest upsert). Both are the batch-view semantics of lakehouse
  * table formats' MERGE/DELETE, expressed as pure Spark plans over the
  * same tables the oracle sees, so the semantics — not a storage format —
  * are what is verified.
  */
object Lifecycle {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** Deterministic tombstone predicate for the erasure sweep: every 97th
    * user requests deletion. */
  private val ErasureMod = 97

  val defs: Vector[Q] = Vector(

    // ── Subject erasure (right-to-be-forgotten sweep): drop every event of
    //    the tombstoned users, report what remains + what was purged per
    //    event type. Plan: broadcast LEFT ANTI join against the (tiny)
    //    tombstone list — at 100 TB this runs partition-by-partition as the
    //    lake-rewrite job, and the anti-join is the per-file filter. The
    //    tombstone relation is derived (distinct user_ids), so the counts
    //    double-check the join's null/match semantics against the oracle's
    //    NOT EXISTS formulation — chosen over NOT IN deliberately: a left
    //    anti join KEEPS rows whose key is NULL while NOT IN with any
    //    non-empty subquery drops them, so NOT EXISTS (which matches
    //    anti-join semantics exactly) keeps the two sides equivalent even
    //    if a future source makes user_id nullable.
    Q("q80_user_erasure",
      s"""WITH tomb AS (SELECT DISTINCT user_id FROM events WHERE user_id % $ErasureMod = 0),
         |kept AS (SELECT * FROM events e
         |         WHERE NOT EXISTS (SELECT 1 FROM tomb t WHERE t.user_id = e.user_id))
         |SELECT event_type,
         |       count(*) AS n_kept,
         |       CAST((SELECT count(*) FROM events) - count(*) AS BIGINT) AS n_total_minus_kept,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS kept_value
         |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val events = ev(s, d)
      val tomb = events.filter(col("user_id") % ErasureMod === 0)
        .select("user_id").distinct()
      val total = events.agg(count(lit(1)).as("n_total"))
      events.join(broadcast(tomb), Seq("user_id"), "left_anti")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_kept"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("kept_value"))
        .crossJoin(broadcast(total))
        .select(col("event_type"), col("n_kept"),
          (col("n_total") - col("n_kept")).cast("long").as("n_total_minus_kept"),
          col("kept_value"))
        .orderBy("event_type")
    },

    // ── CDC merge (keep-latest upsert): an updates batch — a corrected
    //    value and a later timestamp for every 10th event — merged over the
    //    base table with last-writer-wins per key. Plan: union + one
    //    row_number window per key (equivalently a max_by aggregate); at
    //    100 TB the window shuffles on the merge key exactly once, which is
    //    the MERGE INTO shuffle every lakehouse format pays. The version
    //    tie-break (ts, then source rank) is total, so the survivor set is
    //    deterministic and the oracle replays it.
    Q("q81_cdc_merge",
      """WITH upd AS (
        |  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |         round(value * 2 * 100) / 100.0 AS value, 2 AS src
        |  FROM events WHERE event_id % 10 = 0),
        |base AS (SELECT event_id, ts, user_id, event_type,
        |                round(value * 100) / 100.0 AS value, 1 AS src
        |         FROM events),
        |m AS (SELECT *, row_number() OVER (
        |        PARTITION BY event_id ORDER BY ts DESC, src DESC) AS rn
        |      FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)),
        |cur AS (SELECT * FROM m WHERE rn = 1)
        |SELECT event_type,
        |       count(*) AS n,
        |       count(*) FILTER (WHERE src = 2) AS n_updated,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM cur GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val events = ev(s, d)
      val base = events.select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (round(col("value") * 100) / 100.0).as("value"), lit(1).as("src"))
      val upd = events.filter(col("event_id") % 10 === 0).select(
        col("event_id"), (col("ts") + expr("INTERVAL 1 HOUR")).as("ts"),
        col("user_id"), col("event_type"),
        (round(col("value") * 2 * 100) / 100.0).as("value"), lit(2).as("src"))
      base.unionByName(upd)
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_id").orderBy(col("ts").desc, col("src").desc)))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("src") === 2, 1)).as("n_updated"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
        .orderBy("event_type")
    },

    // ── SCD Type-2 history build: turn a flat change stream into
    //    versioned dimension rows with [valid_from, valid_to) intervals —
    //    the other half of the lakehouse MERGE story next to q81's
    //    keep-latest upsert. Per user (ordered by ts, event_id as the
    //    total tie-break), a new version opens whenever the tracked
    //    attribute (event_type) changes vs its lag; valid_to is the next
    //    version's valid_from (NULL = current). Plan: two windows over
    //    the SAME (user_id) partitioning — one shuffle, reused by both
    //    window operators — then one agg shuffle. At 100 TB the per-key
    //    window state is one row (lag/lead), so the build streams; no
    //    driver-side history assembly.
    Q("q99_scd2_history",
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |v AS (SELECT user_id, ts AS valid_from, event_id, event_type
        |      FROM o WHERE prev IS NULL OR prev <> event_type),
        |scd AS (SELECT user_id, event_type,
        |               lead(valid_from) OVER (
        |                 PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
        |        FROM v)
        |SELECT event_type,
        |       count(*) AS n_versions,
        |       count(*) FILTER (WHERE valid_to IS NULL) AS n_current,
        |       count(DISTINCT user_id) AS n_users
        |FROM scd GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val versions = ev(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("ts").as("valid_from"),
          col("event_id"), col("event_type"))
      val byVersion = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
      versions
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_versions"),
          count(when(col("valid_to").isNull, 1)).as("n_current"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }
  )
}
