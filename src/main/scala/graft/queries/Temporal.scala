package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables
import graft.operators.AsOfJoin

/** Temporal operators over the event stream: gap-based sessionization and
  * the as-of join — the two time-series primitives a behavioral /
  * training-data pipeline needs beyond calendar windows (§2.9d covers
  * those). Both are single-shuffle window plans; the streaming stateful
  * twin of sessionization lives in graft.streaming.
  */
object Temporal {

  /** Session gap: 8 hours (events' median per-user gap is ~7.3 h, so the
    * corpus splits into real multi-event sessions). Compared in exact
    * integer microseconds on both engines. */
  val GapMicros: Long = 8L * 3600 * 1000000

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  val defs: Vector[Q] = Vector(

    // ── Gap-based sessionization: lag → break flag → running session id →
    //    two-level aggregate. One shuffle on user_id; per-user state in the
    //    window scan is O(1) (the previous timestamp). The mapGroupsWithState
    //    streaming twin is graft.streaming.StreamingJobs.sessionize.
    Q("q46_user_sessions",
      s"""WITH e AS (SELECT user_id, ts, event_id FROM events WHERE ts IS NOT NULL),
         |g AS (SELECT user_id, ts, event_id,
         |             CASE WHEN lag(ts) OVER w IS NULL
         |                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $GapMicros
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
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev(s, d).filter(col("ts").isNotNull)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev"))) > GapMicros, 1)
            .otherwise(0))
        .withColumn("sess_id",
          sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n").cast("long").as("max_events"),
          sum("n").cast("long").as("total_events"))
        .orderBy("user_id")
    },

    // ── Native session windows: the SAME sessionization computed by
    //    Spark's built-in session_window aggregate (Spark's third way to
    //    sessionize, next to q46's explicit window plan and q93's
    //    mapGroupsWithState streaming state). One semantic difference is
    //    pinned by the oracle: session_window closes a session when the
    //    gap is >= the duration (an event exactly at last_ts + gap starts
    //    a NEW session), where q46's lag-based rule breaks only on >.
    //    The oracle encodes the >= rule, so the built-in's boundary
    //    semantics — not just its happy path — are what's hash-verified.
    //    Plan: one hash-partitioned sort per user (the session merge),
    //    then node-sized aggregates; works identically over readStream.
    Q("q115_session_window",
      s"""WITH e AS (SELECT user_id, ts, event_id FROM events WHERE ts IS NOT NULL),
         |g AS (SELECT user_id, ts, event_id,
         |             CASE WHEN lag(ts) OVER w IS NULL
         |                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= $GapMicros
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
      ev(s, d).filter(col("ts").isNotNull)
        .groupBy(col("user_id"), session_window(col("ts"), "8 hours"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n").cast("long").as("max_events"),
          sum("n").cast("long").as("total_events"))
        .orderBy("user_id")
    },

    // ── As-of join: each click picks up the most recent prior-or-equal
    //    purchase of the same user. Spark side is the merge/union window
    //    plan in graft.operators.AsOfJoin (one shuffle, linear scan — a
    //    range join would be quadratic per key); the oracle is DuckDB's
    //    *native* ASOF LEFT JOIN, so the composed operator is validated
    //    against an independent first-class implementation.
    Q("q47_asof_purchase_attribution",
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
        |                WHERE event_type = 'click' AND ts IS NOT NULL),
        |p0 AS (SELECT event_id, user_id, ts FROM events
        |       WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |purch AS (SELECT event_id, user_id, ts FROM (
        |            SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                         ORDER BY event_id) AS rn
        |            FROM p0)
        |          WHERE rn = 1)
        |SELECT c.event_id, c.user_id,
        |       epoch_us(CAST(c.ts AS TIMESTAMP)) AS ts_us,
        |       p.event_id AS asof_event_id,
        |       epoch_us(CAST(p.ts AS TIMESTAMP)) AS asof_ts_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val e = ev(s, d).filter(col("ts").isNotNull)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = AsOfJoin.dedupRight(
        e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
        key = "user_id", ts = "ts", orderCol = "event_id")
      AsOfJoin.asof(clicks, purchases,
        key = "user_id", ts = "ts", leftOrder = "event_id",
        rightVals = Seq("event_id", "ts"))
        // timestamps as explicit epoch-micros: the raw columns otherwise
        // reach the comparator in engine-native epoch units (ns vs µs)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .withColumn("asof_ts_us", unix_micros(col("asof_ts")))
        .drop("asof_ts")
        .orderBy("event_id")
    },

    // ── Conversion funnel (signup → click-within-7d → purchase-within-7d):
    //    the product-analytics staple next to sessions (q46) and as-of
    //    attribution (q47). Each stage is "earliest qualifying event after
    //    the previous stage's timestamp", so the funnel is three
    //    min-aggregates chained by equi-joins on user_id — every join
    //    co-partitioned on the same key (one shuffle partitioning reused
    //    down the chain at scale), nothing quadratic, and each stage's
    //    relation only shrinks. Conversion rates ride as round(10000·a/b)/100
    //    — integer counts, one IEEE divide, engine-identical.
    Q("q104_funnel",
      """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s ON e.user_id = s.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= s.t0
        |        AND e.ts <= s.t0 + INTERVAL 7 DAY GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t1
        |        AND e.ts <= c.t1 + INTERVAL 7 DAY GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM s) AS n_signup,
        |             (SELECT count(*) FROM c) AS n_click,
        |             (SELECT count(*) FROM p) AS n_purchase)
        |SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS step, n_signup AS n_users,
        |       CAST(100 AS DOUBLE) AS pct_of_prev FROM n
        |UNION ALL SELECT 'click', 2, n_click, round(10000.0 * n_click / n_signup) / 100.0 FROM n
        |UNION ALL SELECT 'purchase', 3, n_purchase, round(10000.0 * n_purchase / n_click) / 100.0 FROM n
        |ORDER BY step""".stripMargin) { (s, d) =>
      val e = ev(s, d)
      val signup = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val click = e.filter(col("event_type") === "click")
        .join(signup, "user_id")
        .filter(col("ts") >= col("t0") && col("ts") <= col("t0") + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id").agg(min("ts").as("t1"))
      val purchase = e.filter(col("event_type") === "purchase")
        .join(click, "user_id")
        .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val n = signup.agg(count(lit(1)).as("n_signup"))
        .crossJoin(click.agg(count(lit(1)).as("n_click")))
        .crossJoin(purchase.agg(count(lit(1)).as("n_purchase")))
      n.selectExpr(
        """stack(3,
          |  'signup', CAST(1 AS BIGINT), n_signup, CAST(100 AS DOUBLE),
          |  'click', CAST(2 AS BIGINT), n_click,
          |    round(CAST(10000 AS DOUBLE) * n_click / n_signup) / CAST(100 AS DOUBLE),
          |  'purchase', CAST(3 AS BIGINT), n_purchase,
          |    round(CAST(10000 AS DOUBLE) * n_purchase / n_click) / CAST(100 AS DOUBLE))
          |  AS (stage, step, n_users, pct_of_prev)""".stripMargin)
        .orderBy("step")
    },

    // ── First-order Markov transition matrix over per-user event
    //    sequences: lag(event_type) within each user's (ts, event_id)
    //    order gives (prev → cur) pairs; counting them and normalizing
    //    per source state yields the transition probabilities behavioral
    //    models train on (and q104's funnel generalizes from). Plan: ONE
    //    shuffle on user_id for the lag window (per-row state is O(1)),
    //    then the pair counts collapse to an event_type² relation —
    //    5×5 here, tiny at any corpus size — so the normalizing window
    //    runs on a driver-trivial relation. The (ts, event_id) composite
    //    sort key makes same-timestamp ordering deterministic in both
    //    engines.
    Q("q131_event_transitions",
      """WITH p AS (
        |  SELECT user_id, event_type AS cur,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events WHERE ts IS NOT NULL),
        |t AS (SELECT prev, cur, count(*) AS n
        |      FROM p WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, cur, n,
        |       round(1e6 * n / CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE)) / 1e6
        |         AS p_transition
        |FROM t ORDER BY prev, cur""".stripMargin) { (s, d) =>
      // ts IS NOT NULL pins the lag ordering: Spark sorts nulls first,
      // DuckDB last, so a null-ts row would silently shift (prev, cur)
      // pairs between engines (ADVICE r6).
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_type").as("cur"),
          lag(col("event_type"), 1).over(wSeq).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "cur")
        .agg(count(lit(1)).as("n"))
        .withColumn("p_transition",
          round(lit(1e6) * col("n")
            / sum("n").over(Window.partitionBy("prev")).cast("double")) / 1e6)
        .orderBy("prev", "cur")
    },

    // ── Time-weighted average (the finance/IoT aggregate plain AVG gets
    //    wrong): each event's value holds until the user's next event, so
    //    the mean must weight by holding time — Σ(value·Δt)/Σ(Δt) with
    //    Δt from lead() within the (ts, event_id)-ordered user stream
    //    (the last event holds nothing and drops out). ONE shuffle on
    //    user_id; the window state is O(1) per row. Determinism at the
    //    float level: value → integer cents, Δt → integer microseconds,
    //    so every product and both sums are exact longs (max |Σ| ≈ 2^56,
    //    inside BIGINT) and the single divide + micro-round is the only
    //    float step. Top 20 users by TWA, key tie-break.
    Q("q134_time_weighted_avg",
      """WITH seq AS (
        |  SELECT user_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id))
        |           - epoch_us(ts) AS dt
        |  FROM events),
        |agg AS (SELECT user_id,
        |               CAST(sum(cents * dt) AS BIGINT) AS wsum,
        |               CAST(sum(dt) AS BIGINT) AS tsum
        |        FROM seq WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT user_id,
        |       round(1e4 * wsum / CAST(tsum AS DOUBLE)) / 1e6 AS twa_value
        |FROM agg WHERE tsum > 0
        |ORDER BY twa_value DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, d)
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("cents"),
          (unix_micros(lead(col("ts"), 1).over(wSeq))
            - unix_micros(col("ts"))).as("dt"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(
          sum(col("cents") * col("dt")).cast("long").as("wsum"),
          sum("dt").cast("long").as("tsum"))
        .filter(col("tsum") > 0)
        .select(col("user_id"),
          (round(lit(1e4) * col("wsum") / col("tsum").cast("double")) / 1e6)
            .as("twa_value"))
        .orderBy(col("twa_value").desc, col("user_id"))
        .limit(20)
    },

    // ── Exponentially weighted moving average (α = 1/2, adjust=true —
    //    the pandas `ewm` smoother every metrics pipeline reaches for)
    //    over the daily revenue series, last 30 days per event type. The
    //    recurrence is rewritten to its closed form so it is ONE window
    //    scan, not an iterative loop: ewma_d = Σ cents_i·2^rn_i / Σ 2^rn_i
    //    over the expanding window — and because α = 1/2 makes every
    //    weight a power of two, numerator and denominator are EXACT
    //    BIGINTs (bounded: rn ≤ 30 ⇒ weight ≤ 2^30, cents ≤ ~2^24 per
    //    type-day ⇒ |Σ| < 2^56), order-independent under partial
    //    aggregation, and the single float step is the final divide —
    //    identical IEEE ops on both engines. One shuffle on event_type;
    //    per-group state is two running longs.
    Q("q143_ewma_daily_revenue",
      """WITH dly AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |bounded AS (
        |  SELECT * FROM dly
        |  WHERE day >= (SELECT max(day) FROM dly) - INTERVAL 29 DAYS),
        |wtd AS (
        |  SELECT event_type, day, cents,
        |         CAST(power(2, row_number() OVER (PARTITION BY event_type
        |                                          ORDER BY day)) AS BIGINT) AS w
        |  FROM bounded),
        |cum AS (
        |  SELECT event_type, day, cents,
        |         CAST(sum(cents * w) OVER cw AS BIGINT) AS num,
        |         CAST(sum(w) OVER cw AS BIGINT) AS den
        |  FROM wtd WINDOW cw AS (PARTITION BY event_type ORDER BY day
        |                         ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, CAST(day AS DATE) AS day,
        |       cents / 100.0 AS daily_value,
        |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0 AS ewma_value
        |FROM cum ORDER BY event_type, day""".stripMargin) { (s, d) =>
      // `day` is day-grained, so it surfaces as DATE — the one output type
      // both engines agree on regardless of the source's timestamp unit.
      val dly = ev(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).cast("long").as("cents"))
      val mx = dly.agg(max("day").as("mxd"))
      val wRank = Window.partitionBy("event_type").orderBy("day")
      val cw = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dly.crossJoin(broadcast(mx))
        .filter(col("day") >= col("mxd") - expr("INTERVAL 29 DAYS"))
        .drop("mxd")
        .withColumn("w", pow(lit(2), row_number().over(wRank)).cast("long"))
        .withColumn("num", sum(col("cents") * col("w")).over(cw).cast("long"))
        .withColumn("den", sum(col("w")).over(cw).cast("long"))
        .select(col("event_type"), col("day").cast("date").as("day"),
          (col("cents") / 100.0).as("daily_value"),
          (col("num").cast("double") / col("den").cast("double") / 100.0)
            .as("ewma_value"))
        .orderBy("event_type", "day")
    }
  )
}
