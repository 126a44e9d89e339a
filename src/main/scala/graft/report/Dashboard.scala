package graft.report

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** The interactive-dashboard session (ref: pipeline/dashboard.py, SURVEY
  * §3.3): one filtered view of the fact table shared by every chart query.
  *
  * The reference re-executes the whole script per UI interaction with a
  * 1-hour cache TTL on the scans; here the session holds ONE cached
  * filtered DataFrame (`df.filter(...).cache()`) and each chart is a lazy
  * aggregate over it — N charts cost one scan plus N tiny shuffles
  * (asserted by DashboardSpec). At 100 TB the cache becomes a materialized
  * daily extract; the chart queries are unchanged.
  *
  * Filters mirror the reference's sidebar exactly: inclusive date range
  * (P8), supplier IN-list, priority IN-list (P9) — ref dashboard.py:98-109.
  *
  * Every chart is oracle-backed (q55-q59): money rides as exact integer
  * cents, ties are broken totally, and functionally-dependent attributes
  * travel as GROUP BY keys — never `first()` (the A8 trap,
  * ref dashboard.py:320-321 `'fsa_rating': 'first'`, which is
  * row-order-dependent in a distributed engine).
  */
final class Dashboard private (slice: DataFrame) {

  import Dashboard._

  /** KPI row (ref :117-132): revenue, tx count, avg ticket, avg daily
    * revenue, card-share-of-transactions — all over the FILTERED slice.
    * `avg_daily_revenue` is the two-level aggregate (mean of exact daily
    * cent sums); `card_pct` is the reference's
    * `(payment_method == 'card').sum() / len * 100` with '1-URGENT' as the
    * card-like method. */
  def kpis: DataFrame = {
    val tot = slice.agg(
      sum(cents(rev)).as("rc"),
      count(lit(1)).as("n_tx"),
      sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_card"))
    val daily = slice
      .groupBy(to_date(col("l_shipdate")).as("date"))
      .agg(sum(cents(rev)).as("drc"))
      .agg(sum("drc").as("rc_sum"), count(lit(1)).as("n_days"))
    tot.crossJoin(daily).select(
      (col("rc") / 100.0).as("total_revenue"),
      col("n_tx"),
      (round(col("rc") / col("n_tx")) / 100.0).as("avg_tx"),
      (round(col("rc_sum") / col("n_days")) / 100.0).as("avg_daily_revenue"),
      (round(lit(10000.0) * col("n_card") / col("n_tx")) / 100.0).as("card_pct"))
  }

  /** Daily revenue trend (ref :143). */
  def dailyTrend: DataFrame =
    slice.groupBy(to_date(col("l_shipdate")).as("date"))
      .agg((sum(cents(rev)) / 100.0).as("revenue"))
      .orderBy("date")

  /** Hourly histogram analog — day-of-month histogram here (ref :156-157). */
  def dayOfMonthHistogram: DataFrame =
    slice.groupBy(dayofmonth(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_tx")).orderBy("day")

  /** Revenue by supplier, descending (ref :177-178). */
  def revenueBySupplier: DataFrame =
    slice.groupBy("s_name")
      .agg((sum(cents(rev)) / 100.0).as("revenue"))
      .orderBy(col("revenue").desc, col("s_name"))

  /** Priority mix for the pie chart (ref :230-231). */
  def priorityCounts: DataFrame =
    slice.groupBy("o_orderpriority").count().orderBy("o_orderpriority")

  /** Payment-method mix: grouped counts AND revenue per method — the pie
    * (ref :257-258 `value_counts`) and the revenue bar (:267-268) from one
    * pass over the slice. */
  def paymentMix: DataFrame =
    slice.groupBy(col("o_orderpriority").as("method"))
      .agg(count(lit(1)).as("n_tx"), (sum(cents(rev)) / 100.0).as("revenue"))
      .orderBy("method")

  /** Payment preference by truck (ref :268-281 grouped bar): the
    * truck × payment count matrix as a PIVOT — one hash aggregate on
    * s_name with the method columns folded map-side (values pinned, so no
    * extra distinct-scan to discover them; at 100 TB always pass the value
    * list). Absent combinations surface as 0, like the chart's empty bars. */
  def truckPaymentMatrix(methods: Seq[String]): DataFrame = {
    val wide = slice.groupBy("s_name")
      .pivot("o_orderpriority", methods)
      .agg(count(lit(1)))
    methods.foldLeft(wide) { (df, m) =>
      val clean = "n_" + m.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      df.withColumn(clean, coalesce(col(s"`$m`"), lit(0L))).drop(m)
    }.orderBy("s_name")
  }

  /** Per-truck performance table (ref :316-325): revenue sum/avg/count plus
    * the truck's own attributes (`fsa_rating`/`has_card_reader` analogs —
    * here `s_nationkey`/`s_acctbal`). The reference fetches those with
    * pandas `first()`; distributed, that is non-deterministic, so the
    * functionally-dependent columns ride as GROUP BY keys instead — zero
    * extra shuffle width, deterministic output (the A8 trap, properly). */
  def perTruckSummary: DataFrame =
    slice.groupBy("s_name", "s_nationkey", "s_acctbal")
      .agg(sum(cents(rev)).as("rc"), count(lit(1)).as("n_tx"))
      .select(
        col("s_name"), col("s_nationkey"), col("s_acctbal"),
        (col("rc") / 100.0).as("revenue"),
        (round(col("rc") / col("n_tx")) / 100.0).as("avg_tx"),
        col("n_tx"))
      .orderBy(col("revenue").desc, col("s_name"))

  /** Top-k revenue days with their transaction counts (ref :296-300). */
  def topDays(k: Int): DataFrame =
    slice.groupBy(to_date(col("l_shipdate")).as("date"))
      .agg(sum(cents(rev)).as("rc"), count(lit(1)).as("n_tx"))
      .orderBy(col("rc").desc, col("date"))
      .limit(k)
      .select(col("date"), (col("rc") / 100.0).as("revenue"), col("n_tx"))

  /** Raw explorer page (ref :342). */
  def rawHead(k: Int): DataFrame =
    slice.select("l_orderkey", "l_shipdate", "s_name", "o_orderpriority")
      .orderBy(col("l_shipdate").desc, col("l_orderkey")).limit(k)

  /** The cached slice itself — for plan assertions in tests. */
  private[report] def sliceDF: DataFrame = slice

  def close(): Unit = { val _ = slice.unpersist() }
}

object Dashboard {

  final case class Filters(
      from: LocalDate,
      to: LocalDate,
      suppliers: Option[Seq[String]] = None,
      priorities: Option[Seq[String]] = None)

  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** Open a session: join the fact to its dimensions once, apply the
    * sidebar filters, cache the slice. */
  def open(spark: SparkSession, sfDir: String, f: Filters): Dashboard = {
    val joined = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
    val dated = joined.filter(
      to_date(col("l_shipdate")).between(lit(f.from.toString), lit(f.to.toString)))
    val withSup = f.suppliers.fold(dated)(xs => dated.filter(col("s_name").isin(xs: _*)))
    val full = f.priorities.fold(withSup)(xs => withSup.filter(col("o_orderpriority").isin(xs: _*)))
    new Dashboard(full.cache())
  }
}
