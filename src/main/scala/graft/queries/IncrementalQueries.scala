package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.incremental.Incremental
import graft.model.Tables

/** End-to-end oracle evidence for the incremental batch runner
  * (ref: pipeline/ETL/extract.py:36-81,142-143 state file; pipeline.py
  * loop): TWO real [[Incremental.runBatch]] runs over a split events
  * source — batch 1 sees only rows up to a split timestamp, batch 2 sees
  * the whole source and must extract strictly after the persisted
  * watermark + 1 s — then a query over the resulting partitioned lake.
  *
  * The DuckDB oracle recomputes the lake's expected content from the RAW
  * events table alone: clean both batches (the q30 twin), derive the
  * watermark as `date_trunc('second', max(ts of batch 1))` — the state
  * file stores whole seconds (extract.py's `%Y-%m-%d %H:%M:%S`), so the
  * fractional part truncates — and re-extract batch 2 above watermark+1 s.
  * A broken state round-trip (stale watermark ⇒ double-append; missing
  * truncation ⇒ off-by-fraction row set) hash-mismatches immediately.
  * This replaces q29's pinned-literal filter as the §2.9a evidence: q29
  * checks the predicate, this checks the state machine.
  */
object IncrementalQueries {

  /** Everything ≤ split goes to batch 1; 2024-01-15 splits the synthetic
    * month roughly in half. */
  private val SplitTs = "2024-01-15 00:00:00"

  /** One built lake per (session, sf dir): two runBatch calls against a
    * fresh temp state dir, memoized so repeated query/bench invocations
    * read the same lake instead of re-appending (append is only
    * exactly-once under watermark discipline — a rebuilt runner with fresh
    * state would double-write, which is precisely the semantics under
    * test). */
  private val lakes = new graft.etl.Memo[(SparkSession, String), String]

  private def roundTripLake(s: SparkSession, d: String): String =
    lakes((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-incr-rt").toString
      val lake = s"$tmp/lake"
      val inc = Incremental(tmp)
      // Source the batches from the Spark-written micros events lake, not
      // the raw nanos file: the watermark bound (`ts > wm+1s`) then reaches
      // the parquet footer as a PushedFilter — the incremental extract's
      // scale story. Partition cols are dropped to restore the source shape
      // (runBatch re-derives them for its own append).
      val ev = s.read.parquet(graft.etl.PartitionedLake.ensureEventsLake(s, d))
        .drop("year", "month", "day")
      val n1 = inc.runBatch(ev.filter(col("ts") <= lit(SplitTs).cast("timestamp")), lake)
      val n2 = inc.runBatch(ev, lake)
      require(n1 > 0 && n2 > 0, s"both batches must append rows (got $n1, $n2)")
      lake
    }

  val defs: Vector[Q] = Vector(

    // ── §2.9a+S9+S6 end-to-end: state-file watermark round-trip across two
    //    appends, verified through the lake's content.
    Q("q60_incremental_roundtrip",
      s"""WITH c AS (
         |  SELECT event_id, ts, user_id, event_type,
         |         round(value * 100) / 100.0 AS value
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY ts, user_id, event_type, value
         |          ORDER BY event_id) AS rn
         |        FROM events
         |        WHERE value IS NOT NULL AND value <> 0
         |          AND event_id IS NOT NULL AND ts IS NOT NULL
         |          AND user_id IS NOT NULL AND event_type IS NOT NULL)
         |  WHERE rn = 1),
         |w AS (SELECT date_trunc('second', max(ts)) + INTERVAL 1 SECOND AS bound
         |      FROM c WHERE ts <= TIMESTAMP '$SplitTs'),
         |lake AS (
         |  SELECT * FROM c WHERE ts <= TIMESTAMP '$SplitTs'
         |  UNION ALL
         |  SELECT c.* FROM c, w WHERE c.ts > w.bound)
         |SELECT event_type,
         |       count(*) AS n_rows,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
         |       epoch_us(CAST(max(ts) AS TIMESTAMP)) AS max_ts_us
         |FROM lake GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      s.read.parquet(roundTripLake(s, d))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"),
          unix_micros(max("ts")).as("max_ts_us"))
        .orderBy("event_type")
    },

    // ── Lake maintenance under the oracle (S6 + compact): three
    //    incremental appends spray one file per (batch × touched day);
    //    compact() rewrites each day-partition to one file behind a
    //    crash-safe two-move swap. The oracle aggregates the RAW events
    //    table — append alignment, the directory swap, and the rewrite
    //    must lose or duplicate NOTHING, whatever the file layout. (File
    //    counts and crash-safety are LakeSpec's unit territory; this is
    //    the content-preservation half, hash-checked.) At 100 TB this is
    //    the out-of-band maintenance job every partitioned lake runs on a
    //    schedule.
    Q("q119_compacted_lake_roundtrip",
      """SELECT event_type,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
        |       epoch_us(CAST(max(ts) AS TIMESTAMP)) AS max_ts_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      s.read.parquet(compactedLake(s, d))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"),
          unix_micros(max("ts")).as("max_ts_us"))
        .orderBy("event_type")
    },

    // ── Schema evolution across lake generations: half the corpus is
    //    written WITHOUT the `value` column (the v1 schema), half with it
    //    (v2), side by side in one directory tree — exactly what a lake
    //    looks like mid-migration after a column is added. The
    //    `mergeSchema` read reconciles the footers by name, v1 rows
    //    surface `value` as NULL, and the aggregate must treat them as
    //    such. The oracle recomputes the same view from the raw table by
    //    NULLing the column on the v1 half. At 100 TB, schema-on-read
    //    evolution is what lets a column land without rewriting a
    //    petabyte of history.
    Q("q156_schema_evolution_read",
      """WITH m AS (SELECT event_type,
        |                  CASE WHEN event_id % 2 = 0 THEN NULL ELSE value END AS value
        |           FROM events)
        |SELECT event_type,
        |       count(*) AS n_rows,
        |       CAST(count(value) AS BIGINT) AS n_with_value,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      s.read.option("mergeSchema", "true").parquet(evolvedLake(s, d))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("value")).as("n_with_value"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
        .orderBy("event_type")
    },

    // ── Snapshot-isolated lake commits (graft.etl.SnapshotLake — the
    //    manifest/version protocol): the events table lands as three
    //    deterministic appends (event_id mod 3) with a COMPACTION between
    //    the second and third, and the query reads the PINNED version 2
    //    next to the latest — while two later commits (one of which
    //    rewrote v2's very files) exist. The pinned read must see exactly
    //    the first two slices and the latest all three; both ride the
    //    same manifest-resolved scan, so a torn or drifting snapshot
    //    hash-mismatches immediately. Reader isolation under a CONCURRENT
    //    append ∥ compact race is SnapshotLakeSpec's territory; this is
    //    the version-pinning contract, oracle-checked.
    Q("q217_snapshot_lake_versions",
      """SELECT event_type,
        |       count(*) FILTER (WHERE event_id % 3 <= 1) AS n_v2,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT))
        |            FILTER (WHERE event_id % 3 <= 1) AS BIGINT) / 100.0 AS val_v2,
        |       count(*) AS n_latest,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS val_latest
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val root = snapshotLake(s, d)
      val pinned = graft.etl.SnapshotLake.read(s, root, Some(2L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_v2"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("val_v2"))
      val latest = graft.etl.SnapshotLake.read(s, root)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_latest"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("val_latest"))
      // Row presence must be driven by the FULL table like the oracle's
      // (an event_type confined to the mod-3 == 2 slice is absent from v2
      // but still emitted with n_v2 = 0), so latest LEFT-joins the pinned
      // aggregate. Both sides are event_type-cardinality (≤ a handful of
      // rows) at ANY scale, but their size estimates derive from the full
      // event scans, so at 100× the planner flips this join to sort-merge
      // unless pinned (the q199 Finding-2 estimator class, ScaleAudit
      // r11); left-outer broadcasts its build (right) side fine.
      latest.join(broadcast(pinned), Seq("event_type"), "left")
        .select(col("event_type"),
          coalesce(col("n_v2"), lit(0L)).as("n_v2"), col("val_v2"),
          col("n_latest"), col("val_latest"))
        .orderBy("event_type")
    },

    // ── GROUP-COMMITTED lake (graft.etl.GroupCommit — round-19): the
    //    events table lands through EIGHT CONCURRENT tagged
    //    `appendOnceGrouped` writers (event_id mod 8, tags gc-0..gc-7),
    //    racing one manifest head through the in-JVM coalescer, then two
    //    of the epochs are REPLAYED (the streaming crash-recovery path) —
    //    the fixture requires each replay to ride its original committed
    //    version without advancing the head. The oracle recomputes the
    //    aggregate from the raw table: a lost writer, a double-applied
    //    replay, or a torn multi-tag record all hash-mismatch. Coalescing
    //    mechanics (links < writers, tagList indexing, leader failure)
    //    are GroupCommitSpec's territory; this is the data contract
    //    under real concurrency, oracle-checked.
    Q("q258_group_commit_exactly_once",
      """SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.etl.SnapshotLake.read(s, groupCommittedLake(s, d))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * 100).cast("long")).as("val_cents"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }
  )

  /** One compacted lake per (session, sf dir): the full events table
    * appended as three deterministic batches (event_id mod 3), then
    * compacted in place. Memoized — the build is the operator under
    * test; repeats read the finished lake. */
  private val compacted = new graft.etl.Memo[(SparkSession, String), String]

  private def compactedLake(s: SparkSession, d: String): String =
    compacted((s, d)) {
      val root = graft.etl.Scratch.tempDir("graft-compact-rt").toString + "/lake"
      val ev = s.read.parquet(graft.etl.PartitionedLake.ensureEventsLake(s, d))
        .drop("year", "month", "day")
      for (i <- 0 until 3)
        graft.etl.PartitionedLake.append(
          graft.etl.PartitionedLake.withPartitionCols(
            ev.filter(pmod(col("event_id"), lit(3)) === i), "ts"),
          root)
      graft.etl.PartitionedLake.compact(s, root)
      root
    }

  /** One snapshot lake per (session, sf dir): v1 = events slice 0,
    * v2 = +slice 1, v3 = compaction of v2, v4 = +slice 2. Versions 2 and 3
    * hold the same logical content on DIFFERENT physical files — exactly
    * the situation reader pinning exists for. Memoized; the commit
    * protocol itself is the operator under test. */
  private val snapshot = new graft.etl.Memo[(SparkSession, String), String]

  private def snapshotLake(s: SparkSession, d: String): String =
    snapshot((s, d)) {
      val root = graft.etl.Scratch.tempDir("graft-snap-lake").toString + "/lake"
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      for (i <- 0 until 2)
        graft.etl.SnapshotLake.append(
          ev.filter(pmod(col("event_id"), lit(3)) === i), root)
      graft.etl.SnapshotLake.compact(s, root)
      graft.etl.SnapshotLake.append(
        ev.filter(pmod(col("event_id"), lit(3)) === 2), root)
      root
    }

  /** One group-committed lake per (session, sf dir): the events table
    * appended by 8 CONCURRENT tagged `appendOnceGrouped` writers
    * (event_id mod 8), then epochs 2 and 5 replayed — each replay must
    * return its original version and leave the head unmoved (the
    * exactly-once contract a crash-recovered streaming writer relies
    * on). Memoized; the coalescing commit protocol is the operator
    * under test. */
  private val groupLake = new graft.etl.Memo[(SparkSession, String), String]

  private def groupCommittedLake(s: SparkSession, d: String): String =
    groupLake((s, d)) {
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val root = graft.etl.Scratch.tempDir("graft-group-lake").toString + "/lake"
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      def slice(i: Int) = ev.filter(pmod(col("event_id"), lit(8)) === i)
      val versions = new Array[Long](8)
      val start = new CountDownLatch(1)
      val done = new CountDownLatch(8)
      val pool = Executors.newFixedThreadPool(8)
      (0 until 8).foreach { i =>
        pool.execute { () =>
          start.await()
          versions(i) =
            graft.etl.SnapshotLake.appendOnceGrouped(slice(i), root, s"gc-$i")
          done.countDown()
        }
      }
      start.countDown()
      require(done.await(600, TimeUnit.SECONDS),
        "group-commit fixture stalled")
      pool.shutdown()
      val head = graft.etl.SnapshotLake.currentVersion(root).get
      for (i <- Seq(2, 5)) {
        val replayed =
          graft.etl.SnapshotLake.appendOnceGrouped(slice(i), root, s"gc-$i")
        require(replayed == versions(i),
          s"replayed tag gc-$i must ride its version: $replayed vs ${versions(i)}")
      }
      require(graft.etl.SnapshotLake.currentVersion(root).contains(head),
        "replays must not advance the head")
      root
    }

  /** One two-generation lake per (session, sf dir): even event_ids written
    * on the v1 schema (no `value` column), odd on v2 (with it), as two
    * subdirectories of one root. Memoized — the layout is the fixture;
    * the mergeSchema read is the operator under test. */
  private val evolved = new graft.etl.Memo[(SparkSession, String), String]

  private def evolvedLake(s: SparkSession, d: String): String =
    evolved((s, d)) {
      val root = graft.etl.Scratch.tempDir("graft-evolve-rt").toString
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.filter(pmod(col("event_id"), lit(2)) === 0).drop("value")
        .write.mode("overwrite").parquet(s"$root/gen=v1")
      ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .write.mode("overwrite").parquet(s"$root/gen=v2")
      root
    }
}
