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

  /** Staged events plus a FLUSH SENTINEL: one far-future purchase and one
    * far-future click (user_id −1, max(ts) + 10 days) appended as a
    * second write. The production "heartbeat event" pattern: an outer
    * stream-stream join can only emit its unmatched rows once the
    * watermark PROVES no match can still arrive, so a bounded drain needs
    * something to push both sides' watermarks past all real data. The
    * sentinels do exactly that — and sit an hour inside their own
    * watermark, so they are never emitted themselves. Memoized per
    * (session, sf dir). */
  private val stagedSentinel = new graft.etl.Memo[(SparkSession, String), String]
  private def sentinelEventsDir(s: SparkSession, d: String): String =
    stagedSentinel((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-stream-sentinel").toString
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.write.mode("overwrite").parquet(tmp)
      ev.agg(max("ts").as("mx"))
        .select(explode(array(
          struct(lit(-1L).as("event_id"),
            (col("mx") + expr("INTERVAL 10 DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("purchase").as("event_type"),
            lit(0.0).as("value")),
          struct(lit(-2L).as("event_id"),
            (col("mx") + expr("INTERVAL 10 DAYS")).as("ts"),
            lit(-1L).as("user_id"), lit("click").as("event_type"),
            lit(0.0).as("value")))).as("r"))
        .select("r.*")
        .write.mode("append").parquet(tmp)
      tmp
    }

  /** Documents staged as FOUR doc_id-range chunk files with strictly
    * increasing mtimes — the arrival order of a monotone-id ingest stream.
    * The file stream source processes files oldest-first, so with
    * `maxFilesPerTrigger = 1` each chunk becomes its own micro-batch and
    * arrival order = doc_id order (what lets q216's first-arrival-wins
    * policy coincide with the batch keep-lowest-id oracle). Memoized per
    * (session, sf dir). */
  private val stagedDocs = new graft.etl.Memo[(SparkSession, String), String]
  private def docChunksDir(s: SparkSession, d: String): String =
    stagedDocs((s, d)) {
      import java.nio.file.Files
      val dir = graft.etl.Scratch.tempDir("graft-stream-docs")
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val mx = docs.agg(max("doc_id")).head.getLong(0)
      val cut = (mx + 4) / 4 // ceil((mx+1)/4): 4 contiguous id ranges
      val base = System.currentTimeMillis() - 1000000L
      (0 until 4).foreach { i =>
        val tmp = graft.etl.Scratch.tempDir("graft-stream-docs-slice")
        docs.filter(col("doc_id") >= i * cut && col("doc_id") < (i + 1) * cut)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = {
          val l = Files.list(tmp)
          try l.filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst.orElseThrow()
          finally l.close()
        }
        val dst = dir.resolve(f"chunk-$i%04d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
        val leftovers = Files.list(tmp)
        try leftovers.forEach(p => Files.deleteIfExists(p))
        finally leftovers.close()
        Files.deleteIfExists(tmp)
        ()
      }
      dir.toString
    }

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run a streaming drain with stateful-op sizing: state-store commits
    * scale with (partitions × stores per operator) per micro-batch, so a
    * drain's partition count must follow its STATE volume, not the
    * session's batch-shuffle default; and most drains here emit eagerly
    * (append-mode dedup/inner join), re-emit everything per batch
    * (complete mode), or fold monotone counters (update mode), so the
    * trailing no-data finalization batch — a full re-run of the stateful
    * plan purely to advance the watermark — buys nothing. Outer joins are
    * the shape that DOES need it (`noDataBatches = true`, q142).
    *
    * The knobs live on a CHILD session (shared context, own SQLConf)
    * handed to `body`, never on the caller's session: a temporary
    * set/restore on the shared session is a conf RACE against anything
    * planning concurrently (parallel test suites caught exactly that —
    * a broadcast-shape assertion planned inside another drain's window
    * and saw its 8-partition, broadcast-off world). Streams, sinks, and
    * the post-drain read must all use the session `body` receives. */
  /** Shuffle width for a streaming drain: the sf0.1-profiled `partitions`
    * as the floor (state-store commit overhead dominates small drains —
    * q102 at sf0.1 measured 6.4 s at 32 partitions vs 3.1 s at 8), scaled
    * up one partition per 4 MB of the staged COMPRESSED source and capped
    * at the box's parallelism. 4 MB of columnar source expands to a few
    * hundred MB of operator state (UnsafeRow + store overhead, ~30-60×),
    * so this is the usual state-mass-per-task sizing rule expressed
    * against the only number known at plan time. Stateful operators are
    * per-partition single-threaded, so a width fixed at the small-scale
    * optimum leaves the box idle inside the only O(horizon) stages in
    * the suite: q102's stream-stream interval join at 100× (142 MB
    * staged) measured 259 s at the fixed width 8 vs 81.8 s at 32
    * (SCALE.md round 18). On a real cluster the same rule sizes the
    * drain to the data, not the demo. */
  private[queries] def streamParts(s: SparkSession, srcDir: String, base: Int): Int = {
    val bytes =
      try org.apache.commons.io.FileUtils.sizeOfDirectory(
        new java.io.File(srcDir))
      catch { case _: RuntimeException => 0L }
    math.max(base, math.min(s.sparkContext.defaultParallelism,
      (bytes >> 22).toInt))
  }

  private def withStreamTuning[A](s: SparkSession, partitions: Int,
                                  srcDir: String,
                                  noDataBatches: Boolean = false)
                                 (body: SparkSession => A): A = {
    val s2 = s.newSession()
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS")
      .map(_.toInt).getOrElse(streamParts(s, srcDir, partitions))
    s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatches.toString)
    body(s2)
  }

  val defs: Vector[Q] = Vector(

    // ── §2.9d through the actual streaming engine: same oracle text as
    //    the batch twin q28 — the stream must reproduce it bit-for-bit.
    Q("q63_streaming_hourly_windows",
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS window_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q63_sink_${sinkSeq.getAndIncrement()}"
      val src = stagedEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val query = StreamingJobs
          .hourlyWindowsComplete(StreamingJobs.eventsStream(st, src))
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .withColumn("window_start", unix_micros(col("window_start")))
          .orderBy("window_start")
      }
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
      val src = dupEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val query = StreamingJobs
          .dedupStream(StreamingJobs.eventsStream(st, src))
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
          .orderBy("event_type")
      }
    },

    // ── Bounded-state streaming dedup: dropDuplicatesWithinWatermark —
    //    the 100 TB dedup shape, because q78's plain dropDuplicates keys
    //    state FOREVER while this one evicts each key once the watermark
    //    passes its event time (O(horizon) state at any stream length).
    //    The semantic price: a duplicate redelivered LATER than the
    //    watermark delay is not caught. Here the delay (41 days) exceeds
    //    the staged corpus's whole span, so the drained result provably
    //    equals the exact-dedup oracle REGARDLESS of how the files split
    //    into micro-batches — the oracle equivalence never depends on
    //    batch layout; production sizes the delay to the source's
    //    redelivery window instead (StreamingSpec covers the
    //    short-horizon eviction path).
    Q("q147_streaming_bounded_dedup",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round((value) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q147_sink_${sinkSeq.getAndIncrement()}"
      val src = dupEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val query = StreamingJobs
          .dedupStreamWithinWatermark(
            StreamingJobs.eventsStream(st, src), "41 days")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
          .orderBy("event_type")
      }
    },

    // ── Stateful sessionization through the actual streaming engine
    //    (§2.9 × the temporal family): gap-based sessions via
    //    mapGroupsWithState with O(1) per-user state, drained with
    //    AvailableNow and hash-compared against the SAME oracle as the
    //    batch window twin (q46). The memory sink sees one row per
    //    (user, trigger) in update mode; every emitted counter is
    //    monotone non-decreasing across triggers, so folding with
    //    per-user max yields the final state deterministically even if
    //    the drain splits into several micro-batches.
    Q("q93_streaming_sessions",
      s"""WITH e AS (SELECT user_id, ts, event_id FROM events WHERE ts IS NOT NULL),
         |g AS (SELECT user_id, ts, event_id,
         |             CASE WHEN lag(ts) OVER w IS NULL
         |                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${Temporal.GapMicros}
         |                  THEN 1 ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT user_id,
         |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                            ROWS UNBOUNDED PRECEDING) AS sess_id
         |      FROM g),
         |c AS (SELECT user_id, sess_id, count(*) AS n FROM s GROUP BY 1, 2)
         |SELECT user_id, count(*) AS n_sessions,
         |       CAST(max(n) AS BIGINT) AS max_events,
         |       CAST(sum(n) AS BIGINT) AS total_events
         |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val sink = s"q93_sink_${sinkSeq.getAndIncrement()}"
      val src = stagedEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        import st.implicits._
        val stream = StreamingJobs.eventsStream(st, src)
          .filter(col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"))
          .as[StreamingJobs.SessionEvent]
        val query = StreamingJobs.sessionize(stream, Temporal.GapMicros)
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .groupBy("user_id")
          .agg(
            max("n_sessions").as("n_sessions"),
            max("max_events").cast("long").as("max_events"),
            max("total_events").cast("long").as("total_events"))
          .orderBy("user_id")
      }
    },

    // ── Stream-stream interval join through the actual streaming engine:
    //    purchase↔click attribution where BOTH sides are unbounded streams
    //    (q47's as-of family is the batch shape; this is what replaces it
    //    when neither side fits a batch). Watermarks + the interval bound
    //    give bounded join state; the drained inner join must equal the
    //    batch interval join the oracle computes. Ties (equal ts) are
    //    included on the click side, and the aggregate output (pairs and
    //    distinct purchases per hour) is a deterministic roll-up of the
    //    emitted matches regardless of micro-batch boundaries.
    Q("q102_streaming_attribution",
      """SELECT epoch_us(CAST(date_trunc('hour', p.ts) AS TIMESTAMP)) AS hour_us,
        |       count(*) AS n_pairs,
        |       count(DISTINCT p.event_id) AS n_purchases
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
        |WHERE p.ts IS NOT NULL AND c.ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q102_sink_${sinkSeq.getAndIncrement()}"
      val src = stagedEventsDir(s, d)
      // A stream-stream join commits (partitions × 4 state stores per
      // side) per batch — the drain that most needs withStreamTuning's
      // state-volume-sized partitions (profiled: 6.4s → 3.1s at sf0.1).
      withStreamTuning(s, partitions = 8, src) { st =>
        val purchases = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "purchase" && col("ts").isNotNull)
        val clicks = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "click" && col("ts").isNotNull)
        val query = StreamingJobs
          .attributionJoin(purchases, clicks,
            windowMicros = 30L * 60 * 1000000, watermark = "1 hour")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .groupBy(unix_micros(date_trunc("hour", col("purchase_ts"))).as("hour_us"))
          .agg(
            count(lit(1)).as("n_pairs"),
            countDistinct(col("purchase_id")).as("n_purchases"))
          .orderBy("hour_us")
      }
    },

    // ── Stream-stream LEFT OUTER interval join: the semantic q102's inner
    //    join can't show — "purchases with NO click in the window" must be
    //    emitted as null-click rows, and ONLY once the watermark proves no
    //    late click can still arrive. A bounded drain therefore needs the
    //    flush-sentinel staging (far-future heartbeat rows advance both
    //    sides' watermarks past all real data; the trailing no-data batch
    //    then evicts-and-emits the whole unmatched tail), after which the
    //    drained result equals the batch LEFT JOIN the oracle computes —
    //    matched and unmatched alike, invariant to micro-batch
    //    boundaries. The sentinels sit inside their own watermark and are
    //    never emitted; the p_user ≥ 0 filter is defense in depth.
    Q("q142_streaming_left_outer",
      """SELECT epoch_us(CAST(date_trunc('hour', p.ts) AS TIMESTAMP)) AS hour_us,
        |       count(*) AS n_rows,
        |       count(c.event_id) AS n_matched,
        |       count(*) FILTER (WHERE c.event_id IS NULL) AS n_unmatched,
        |       count(DISTINCT p.event_id) AS n_purchases
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        | AND c.ts IS NOT NULL
        | AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
        |WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q142_sink_${sinkSeq.getAndIncrement()}"
      val src = sentinelEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src, noDataBatches = true) { st =>
        val purchases = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "purchase" && col("ts").isNotNull)
        val clicks = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "click" && col("ts").isNotNull)
        val query = StreamingJobs
          .attributionJoin(purchases, clicks,
            windowMicros = 30L * 60 * 1000000, watermark = "1 hour",
            joinType = "left_outer")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .filter(col("p_user") >= 0)
          .groupBy(unix_micros(date_trunc("hour", col("purchase_ts"))).as("hour_us"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("click_id")).as("n_matched"),
            sum(when(col("click_id").isNull, 1).otherwise(0)).cast("long")
              .as("n_unmatched"),
            countDistinct(col("purchase_id")).as("n_purchases"))
          .orderBy("hour_us")
      }
    },

    // ── Stream-static enrichment join: the event stream joined per
    //    micro-batch to a bounded segment dimension (stateless — no join
    //    state survives a trigger, unlike q102's stream-stream shape).
    //    The dim keeps only segments 0 and 1, so the inner join also
    //    FILTERS the stream — the drained sink must equal the batch
    //    predicate the oracle computes. The dim is deterministic
    //    (user_id mod 3), so both engines derive it independently.
    Q("q109_stream_static_enrich",
      """SELECT user_id % 3 AS segment, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events
        |WHERE user_id % 3 <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q109_sink_${sinkSeq.getAndIncrement()}"
      val src = stagedEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val dim = Tables.events(st, d).select(col("user_id")).distinct()
          .select(col("user_id").as("uid"), pmod(col("user_id"), lit(3L)).as("segment"))
          .filter(col("segment") <= 1)
        val query = StreamingJobs
          .enrichWithDim(StreamingJobs.eventsStream(st, src),
            dim, "user_id", "uid")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .groupBy("segment")
          .agg(
            count(lit(1)).as("n"),
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
          .orderBy("segment")
      }
    },

    // ── Streaming KMV distinct-count sketch (§2.9 × the q97/q174 sketch
    //    family): per-day distinct-user estimation with EXACTLY k longs of
    //    state per day — the bounded-state streaming distinct-counter a
    //    100 TB/day stream needs where a plain streaming COUNT(DISTINCT)
    //    would key state per user forever. The k-smallest-of-a-union fold
    //    is order-independent and idempotent, so the drained final sketch
    //    is byte-identical regardless of micro-batch boundaries — the
    //    oracle replays it as one batch expression. Update mode emits
    //    per-batch snapshots; the final row per day is the fullest, then
    //    tightest, sketch (n_sketch monotone up, kth_hash monotone down
    //    once the sketch fills).
    Q("q183_streaming_kmv_sketch",
      s"""WITH hd AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         |                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |            FROM events WHERE user_id IS NOT NULL),
         |dh AS (SELECT DISTINCT day, h FROM hd),
         |pd AS (SELECT day, h FROM (
         |         SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
         |         FROM dh) WHERE r <= ${Quality.K}),
         |ds AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS kth_hash
         |       FROM pd GROUP BY 1)
         |SELECT day, n_sketch, kth_hash,
         |       CASE WHEN n_sketch < ${Quality.K} THEN n_sketch
         |            ELSE CAST(round(${Quality.K - 1}.0 * ${Quality.HashSpace} / kth_hash) AS BIGINT) END
         |         AS est_distinct
         |FROM ds ORDER BY day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sink = s"q183_sink_${sinkSeq.getAndIncrement()}"
      val src = stagedEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val query = StreamingJobs
          .kmvPerDayStream(StreamingJobs.eventsStream(st, src), Quality.K)
          .toDF("day", "n_sketch", "kth_hash")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .withColumn("rn", row_number().over(Window.partitionBy("day")
            .orderBy(col("n_sketch").desc, col("kth_hash").asc)))
          .filter(col("rn") === 1)
          .select(col("day"), col("n_sketch"), col("kth_hash"),
            when(col("n_sketch") < Quality.K, col("n_sketch"))
              .otherwise(round(lit((Quality.K - 1).toDouble) * lit(Quality.HashSpace)
                / col("kth_hash")).cast("long")).as("est_distinct"))
          .orderBy("day")
      }
    },

    // ── Streaming suppression guard (§2.9 × lifecycle × the q199 bloom):
    //    an erasure ledger (q80's contract — here every user_id < 50)
    //    enforced AT INGEST. The ledger rides the streaming plan twice:
    //    as a bloom literal whose might_contain is a STATELESS map-side
    //    short-circuit — the overwhelmingly-common untainted row never
    //    touches a join — and as the exact static relation that a
    //    stream-static left-outer join + null filter consults ONLY for
    //    bloom candidates (false positives die there; false negatives
    //    don't exist, so suppression is exact). The drained sink must
    //    equal the oracle's plain batch filter — proving the
    //    bloom/join split changes nothing.
    Q("q202_streaming_suppression_guard",
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events WHERE user_id >= 50 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q202_sink_${sinkSeq.getAndIncrement()}"
      val src202 = stagedEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src202) { st =>
        val ledger = Tables.events(st, d)
          .filter(col("user_id") < 50).select("user_id").distinct()
        val bloom = ledger
          .agg(graft.functions.BloomOps.bloomAgg(
            xxhash64(col("user_id")), 1L << 12, 1L << 17).as("bf"))
          .head.getAs[Array[Byte]]("bf")
        val might = graft.functions.BloomOps.mightContain(
          lit(bloom), xxhash64(col("user_id")))
        val stream = StreamingJobs.eventsStream(st, src202)
        val clean = stream.filter(!might)
        val verified = stream.filter(might)
          .join(ledger.withColumn("__supp", lit(1)), Seq("user_id"), "left_outer")
          .filter(col("__supp").isNull).drop("__supp")
        val query = clean.unionByName(verified)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink).orderBy("event_type")
      }
    },

    // ── Stream-stream FULL OUTER interval join — completing the join
    //    matrix (inner q102, left outer q142): purchases and clicks both
    //    emit their unmatched rows, each side only once ITS watermark
    //    proves no partner can still arrive. The q142 flush sentinels
    //    push both watermarks past all real data, and — being one
    //    purchase and one click at user −1 — surface as unmatched rows
    //    on BOTH sides of the outer join, so the post-drain filter must
    //    null-safely drop each side's sentinel without dropping the
    //    legitimate null keys outer rows carry. Oracle = the batch FULL
    //    OUTER twin over the same interval predicate.
    Q("q207_streaming_full_outer",
      """WITH p AS (SELECT event_id AS pid, user_id AS pu, ts AS pts FROM events
        |           WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |c AS (SELECT event_id AS cid, user_id AS cu, ts AS cts FROM events
        |      WHERE event_type = 'click' AND ts IS NOT NULL)
        |SELECT epoch_us(CAST(date_trunc('hour', coalesce(pts, cts)) AS TIMESTAMP)) AS hour_us,
        |       count(*) AS n_rows,
        |       count(*) FILTER (WHERE pid IS NOT NULL AND cid IS NOT NULL) AS n_matched,
        |       count(*) FILTER (WHERE cid IS NULL) AS n_purchase_only,
        |       count(*) FILTER (WHERE pid IS NULL) AS n_click_only
        |FROM p FULL JOIN c
        |  ON pu = cu AND cts <= pts AND cts > pts - INTERVAL 30 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val sink = s"q207_sink_${sinkSeq.getAndIncrement()}"
      val src = sentinelEventsDir(s, d)
      withStreamTuning(s, partitions = 8, src, noDataBatches = true) { st =>
        val purchases = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "purchase" && col("ts").isNotNull)
        val clicks = StreamingJobs.eventsStream(st, src)
          .filter(col("event_type") === "click" && col("ts").isNotNull)
        val query = StreamingJobs
          .attributionJoin(purchases, clicks,
            windowMicros = 30L * 60 * 1000000, watermark = "1 hour",
            joinType = "full_outer")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        st.table(sink)
          .filter(coalesce(col("p_user"), lit(0L)) >= 0 &&
            coalesce(col("c_user"), lit(0L)) >= 0)
          .groupBy(unix_micros(date_trunc("hour",
            coalesce(col("purchase_ts"), col("click_ts")))).as("hour_us"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(when(col("purchase_id").isNotNull && col("click_id").isNotNull, 1))
              .cast("long").as("n_matched"),
            count(when(col("click_id").isNull, 1)).cast("long").as("n_purchase_only"),
            count(when(col("purchase_id").isNull, 1)).cast("long").as("n_click_only"))
          .orderBy("hour_us")
      }
    },

    // ── Streaming NEAR-dup dedup — the last empty cell of the dedup ×
    //    streaming matrix (VERDICT r10 item 1): MinHash-LSH dedup applied
    //    to an ARRIVING document stream via q161's incremental idiom made
    //    continuous (per micro-batch: index → banded join against the
    //    accumulated corpus band index + within-batch LSH self-join →
    //    exact-Jaccard verify → survivors out, state committed per batchId
    //    for exactly-once replay — see graft.streaming.StreamingDedup).
    //    The staged source delivers the corpus as four doc_id-ordered
    //    chunks, one micro-batch each, so first-arrival-wins equals the
    //    batch keep-lowest-id policy and the drained survivors must
    //    hash-equal q36's batch near-dedup — SAME oracle text. Batch-split
    //    independence (1-file vs whole-corpus triggers) is proven in
    //    StreamingSpec; the q35 recall bound applies identically (the
    //    oracle sees every true pair, the stream only band-colliding ones).
    Q("q216_streaming_near_dedup",
      s"""${LlmPipeline.nearDupPairsSql}
         |SELECT lang, count(*) AS n_docs
         |FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM p WHERE jaccard >= ${LlmPipeline.JaccardThreshold})
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = docChunksDir(s, d)
      withStreamTuning(s, partitions = 8, src) { st =>
        val state = graft.etl.Scratch.tempDir("graft-sdedup-state").toString
        val ckpt = graft.etl.Scratch.tempDir("graft-sdedup-ckpt").toString
        val query = graft.streaming.StreamingDedup.nearDedupTo(
            graft.streaming.StreamingDedup.documentsStream(st, src),
            state, ckpt, LlmPipeline.JaccardThreshold)
          .start()
        query.awaitTermination()
        graft.streaming.StreamingDedup.survivors(st, state)
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .orderBy("lang")
      }
    }
  )
}
