package graft.queries

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}

import graft.model.Tables

/** Keyed cents record shared by the typed queries: `k` is the grouping key
  * (order key / a dimension code point), `cents` the exact integer money
  * value. Top-level so the product Encoder derives cleanly. */
final case class KeyedCents(k: Long, cents: Long)

/** Accumulator for [[TypedOps.CentsStats]]: running (count, sum, min, max)
  * over integer cents — every field is exact integer math, so partial
  * states merge associatively in any order with bit-identical results. */
final case class CentsStatsBuf(n: Long, sum: Long, min: Long, max: Long)

/** Typed `Dataset` API surface — the escape hatch the DataFrame queries
  * deliberately avoid. Two operators exercise it where typed semantics
  * genuinely add something:
  *
  *   - `KeyValueGroupedDataset.cogroup` (q122): per-key iterators over TWO
  *     relations in one pass — the relational full-outer-join + aggregate
  *     written as imperative per-group logic. This is §2.10's "genuine
  *     per-partition imperative" tier: use it when the per-key merge is a
  *     real algorithm (sequence alignment, interval stitching); for plain
  *     sums prefer the DataFrame form (q13) which keeps codegen.
  *   - a user-level `Aggregator[IN, BUF, OUT]` (q123): the public typed-UDAF
  *     contract (registered via `udaf()` in user code), distinct from the
  *     engine-internal `TypedImperativeAggregate` kernels in
  *     graft.functions. Partial buffers merge on the map side exactly like
  *     built-in aggregates — the 100 TB behavior is inherited, not
  *     hand-built.
  *
  * Both queries still end in a DataFrame with a total ORDER BY so the
  * DuckDB oracle hash-compares them like every other entry.
  */
object TypedOps {

  /** Typed UDAF over integer cents: one-pass (count, sum, min, max).
    * The reduction is exactly what a map-side partial aggregate needs —
    * commutative, associative, with an identity `zero`. */
  object CentsStats extends Aggregator[KeyedCents, CentsStatsBuf, CentsStatsBuf] {
    override def zero: CentsStatsBuf =
      CentsStatsBuf(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: CentsStatsBuf, a: KeyedCents): CentsStatsBuf =
      CentsStatsBuf(b.n + 1, b.sum + a.cents,
        math.min(b.min, a.cents), math.max(b.max, a.cents))
    override def merge(x: CentsStatsBuf, y: CentsStatsBuf): CentsStatsBuf =
      CentsStatsBuf(x.n + y.n, x.sum + y.sum,
        math.min(x.min, y.min), math.max(x.max, y.max))
    override def finish(b: CentsStatsBuf): CentsStatsBuf = b
    override def bufferEncoder: Encoder[CentsStatsBuf] = Encoders.product
    override def outputEncoder: Encoder[CentsStatsBuf] = Encoders.product
  }

  private def ord(s: SparkSession, d: String): DataFrame = Tables.orders(s, d)
  private def li(s: SparkSession, d: String): DataFrame = Tables.lineitem(s, d)

  val defs: Vector[Q] = Vector(

    // ── Accounting reconciliation via typed cogroup: header totals
    //    (orders.o_totalprice) against detail sums (lineitem extendedprice)
    //    per order key, classified into no_lines / no_order / matches /
    //    differs with the absolute cents drift. cogroup shuffles BOTH
    //    inputs once on the shared key and hands each key's two iterators
    //    to one function — the same single co-partitioned exchange a
    //    full-outer join would plan, so the shape scales like any keyed
    //    aggregate (no driver collect, no second pass). The oracle replays
    //    the semantics as FULL OUTER JOIN + CASE in SQL, pinning the typed
    //    path's null/absent-side handling against the relational answer.
    Q("q122_cogroup_reconcile",
      """WITH o AS (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS oc
        |           FROM orders),
        |l AS (SELECT l_orderkey AS k,
        |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS lc
        |      FROM lineitem GROUP BY 1),
        |j AS (SELECT coalesce(o.k, l.k) AS k, oc, lc
        |      FROM o FULL OUTER JOIN l ON o.k = l.k)
        |SELECT CASE WHEN lc IS NULL THEN 'no_lines'
        |            WHEN oc IS NULL THEN 'no_order'
        |            WHEN oc = lc THEN 'matches'
        |            ELSE 'differs' END AS status,
        |       count(*) AS n_orders,
        |       CAST(sum(abs(coalesce(oc, 0) - coalesce(lc, 0))) AS BIGINT)
        |         AS total_abs_diff_cents
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val headers = ord(s, d).select(
        col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents")).as[KeyedCents]
      val details = li(s, d).select(
        col("l_orderkey").as("k"),
        round(col("l_extendedprice") * 100).cast("long").as("cents")).as[KeyedCents]
      headers.groupByKey(_.k)
        .cogroup(details.groupByKey(_.k)) { (_, os, ls) =>
          // o_orderkey is unique in orders, so the header side is 0-or-1;
          // the detail side is summed exactly as the oracle's GROUP BY.
          val oc = if (os.hasNext) Some(os.next().cents) else None
          var sum = 0L
          var any = false
          ls.foreach { r => sum += r.cents; any = true }
          val lc = if (any) Some(sum) else None
          val status = (oc, lc) match {
            case (_, None)                  => "no_lines"
            case (None, _)                  => "no_order"
            case (Some(a), Some(b)) if a == b => "matches"
            case _                          => "differs"
          }
          Iterator((status, math.abs(oc.getOrElse(0L) - lc.getOrElse(0L))))
        }
        .toDF("status", "abs_diff_cents")
        .groupBy("status")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("abs_diff_cents")).cast("long").as("total_abs_diff_cents"))
        .orderBy("status")
    },

    // ── User-level typed Aggregator: per-priority order-value stats in one
    //    pass through the public Aggregator[IN, BUF, OUT] contract (the API
    //    a library user extends — graft.functions' kernels are the
    //    engine-internal tier). groupByKey + .agg(toColumn) plans exactly
    //    like a built-in two-phase aggregate: partial CentsStatsBuf per
    //    map task, one shuffle of 5 tiny buffers, final merge — constant
    //    state per group at any scale. Integer cents end-to-end; the /100.0
    //    happens once on the final single-row-per-group output.
    Q("q123_typed_agg_stats",
      """SELECT o_orderpriority AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
        |         AS total_value,
        |       CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
        |         AS min_value,
        |       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
        |         AS max_value
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      // The group key stays the priority string; KeyedCents.k is unused
      // here (the Aggregator only reads cents), so it carries a zero.
      val typed = ord(s, d).select(
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .as[(String, Long)]
      typed.groupByKey(_._1)
        .mapValues { case (_, cents) => KeyedCents(0L, cents) }
        .agg(CentsStats.toColumn)
        .toDF("priority", "stats")
        .select(
          col("priority"),
          col("stats.n").as("n_orders"),
          (col("stats.sum") / 100.0).as("total_value"),
          (col("stats.min") / 100.0).as("min_value"),
          (col("stats.max") / 100.0).as("max_value"))
        .orderBy("priority")
    }
  )
}
