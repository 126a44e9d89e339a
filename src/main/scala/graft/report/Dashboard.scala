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
  * aggregate over it — N charts cost one scan plus N tiny shuffles. At
  * 100 TB the cache becomes a materialized daily extract; the chart
  * queries are unchanged.
  *
  * Filters mirror the reference's sidebar exactly: inclusive date range
  * (P8), supplier IN-list, priority IN-list (P9) — ref dashboard.py:98-109.
  */
final class Dashboard private (slice: DataFrame, dims: DataFrame) {

  import Dashboard._

  /** KPI row (ref :117-132): revenue, tx count, avg ticket, urgent share. */
  def kpis: DataFrame =
    slice.agg(
      (sum(cents(rev)) / 100.0).as("total_revenue"),
      count(lit(1)).as("n_tx"),
      (round(sum(cents(rev)) / count(lit(1))) / 100.0).as("avg_tx"),
      (round(lit(10000.0) * avg(when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0))) / 100.0)
        .as("urgent_pct"))

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

  /** Top-k revenue days (ref :296-300). */
  def topDays(k: Int): DataFrame =
    slice.groupBy(to_date(col("l_shipdate")).as("date"))
      .agg(sum(cents(rev)).as("rc"))
      .orderBy(col("rc").desc, col("date"))
      .limit(k)
      .select(col("date"), (col("rc") / 100.0).as("revenue"))

  /** Raw explorer page (ref :342). */
  def rawHead(k: Int): DataFrame =
    slice.select("l_orderkey", "l_shipdate", "s_name", "o_orderpriority")
      .orderBy(col("l_shipdate").desc, col("l_orderkey")).limit(k)

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
    new Dashboard(full.cache(), Tables.supplier(spark, sfDir))
  }
}
