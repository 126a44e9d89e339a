package graft.report

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.PartitionedLake
import graft.model.Tables

/** The daily-report pipeline (ref: pipeline/report-lambda/
  * generate_report.py): read exactly one day's partition from the lake,
  * compute the financial KPI set, render HTML on the driver.
  *
  * Spark restatement of the Lambda (SURVEY §3.2): a partition-pruned scan
  * (the `year=Y/month=M/day=D` directory — zero IO outside the day, where
  * the reference builds the S3 prefix by hand, generate_report.py:32),
  * a handful of small aggregates over the day slice, `collect()` of a few
  * tiny rows into [[ReportMetrics]], template on the driver.
  *
  * All money rides as exact integer cents (order-independent at any
  * partition count); the fee model is the reference's 2%-of-revenue on
  * card-like methods (generate_report.py:124-142), with `o_orderpriority`
  * standing in for `payment_method` and 'urgent' for 'card'.
  *
  * Empty-day semantics (generate_report.py:72-84): a day with no rows
  * yields zeroed metrics and "n/a" best/worst — never a crash or a null —
  * and the HTML renders a "no data" banner.
  */
object Report {

  final case class TruckRow(name: String, revenue: Double, nTx: Long, avgTx: Double)
  final case class PaymentRow(method: String, revenue: Double, fee: Double)

  final case class ReportMetrics(
      reportDate: String,
      totalRevenue: Double,
      nTx: Long,
      avgTx: Double,
      bestTruck: String,
      bestRevenue: Double,
      worstTruck: String,
      worstRevenue: Double,
      totalFees: Double,
      netRevenue: Double,
      perTruck: Seq[TruckRow],
      perPayment: Seq[PaymentRow])

  /** "Yesterday" in UTC — the reference's default window
    * (generate_report.py:24-29 / F8); every job entry point takes the date
    * as a parameter so tests and backfills are deterministic. */
  def yesterday(): LocalDate = LocalDate.now(java.time.ZoneOffset.UTC).minusDays(1)

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** The day slice — a partition-column filter over the lake, pruned at
    * file-listing time. */
  def daySlice(spark: SparkSession, sfDir: String, date: LocalDate): DataFrame = {
    val root = PartitionedLake.ensureLineitemLake(spark, sfDir)
    PartitionedLake.read(spark, root)
      .filter(col("year") === date.getYear &&
        col("month") === date.getMonthValue &&
        col("day") === date.getDayOfMonth)
  }

  /** Single-row scalar-metrics plan (the CORRECTNESS-gated face of the
    * report; the list-valued tables are separate tiny aggregates consumed
    * by [[run]]). Deterministic ties: best/worst break on
    * (revenue, name) exactly like q18. */
  def metricsDF(spark: SparkSession, sfDir: String, date: LocalDate): DataFrame =
    metricsDFFrom(spark, sfDir, date, daySlice(spark, sfDir, date))

  /** Same plan over a caller-supplied (typically cached) slice — the seam
    * [[metrics]] uses so one scan of the lake feeds every aggregate of the
    * report run. */
  def metricsDFFrom(spark: SparkSession, sfDir: String, date: LocalDate,
                    slice: DataFrame): DataFrame = {
    val tot = slice.agg(
      coalesce(sum(cents(rev)), lit(0L)).as("rc"),
      count(lit(1)).as("n_tx"))

    val tieKey = concat(format_string("%020d", col("rc")), col("s_name"))
    val bestWorst = slice
      .join(broadcast(Tables.supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(sum(cents(rev)).as("rc"))
      .agg(
        coalesce(max_by(col("s_name"), tieKey), lit("n/a")).as("best_truck"),
        coalesce(max("rc"), lit(0L)).as("best_rc"),
        coalesce(min_by(col("s_name"), tieKey), lit("n/a")).as("worst_truck"),
        coalesce(min("rc"), lit(0L)).as("worst_rc"))

    val fees = perPaymentDF(spark, sfDir, slice)
      .agg(coalesce(sum("fee_cents"), lit(0L)).as("fee_c"))

    tot.crossJoin(bestWorst).crossJoin(fees).select(
      lit(date.toString).as("report_date"),
      (col("rc") / 100.0).as("total_revenue"),
      col("n_tx"),
      when(col("n_tx") === 0, 0.0)
        .otherwise(round(col("rc") / col("n_tx")) / 100.0).as("avg_tx"),
      col("best_truck"),
      (col("best_rc") / 100.0).as("best_revenue"),
      col("worst_truck"),
      (col("worst_rc") / 100.0).as("worst_revenue"),
      (col("fee_c") / 100.0).as("total_fees"),
      ((col("rc") - col("fee_c")) / 100.0).as("net_revenue"))
  }

  /** Per-payment-method revenue + processing fee (2% on card-like methods,
    * group-level rounding like the reference's per-method cost dict). */
  def perPaymentDF(spark: SparkSession, sfDir: String, slice: DataFrame): DataFrame =
    slice
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("method"))
      .agg(sum(cents(rev)).as("rc"))
      .select(
        col("method"), col("rc"),
        when(lower(col("method")).contains("urgent"), round(col("rc") * 0.02).cast("long"))
          .otherwise(0L).as("fee_cents"))

  /** Per-truck revenue table (ref generate_report.py:92-96). */
  def perTruckDF(spark: SparkSession, sfDir: String, slice: DataFrame): DataFrame =
    slice
      .join(broadcast(Tables.supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name").as("name"))
      .agg(sum(cents(rev)).as("rc"), count(lit(1)).as("n_tx"))
      .select(col("name"), (col("rc") / 100.0).as("revenue"), col("n_tx"),
        (round(col("rc") / col("n_tx")) / 100.0).as("avg_tx"))
      .orderBy(col("rc").desc, col("name"))

  /** Run the full report job for one date: metrics + tables collected into
    * the case class. The day slice is cached, so the (already
    * partition-pruned) lake is scanned ONCE per run — the scalar metrics,
    * the per-truck table and the per-payment table all aggregate the
    * in-memory slice (asserted by ReportSpec). */
  def metrics(spark: SparkSession, sfDir: String, date: LocalDate): ReportMetrics = {
    val slice = daySlice(spark, sfDir, date).cache()
    try metricsFrom(spark, sfDir, date, slice)
    finally { val _ = slice.unpersist() }
  }

  private def metricsFrom(spark: SparkSession, sfDir: String, date: LocalDate,
                          slice: DataFrame): ReportMetrics = {
    val m = metricsDFFrom(spark, sfDir, date, slice).collect()(0)
    val trucks = perTruckDF(spark, sfDir, slice).collect().toSeq.map { r =>
      TruckRow(r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
    }
    val pays = perPaymentDF(spark, sfDir, slice).orderBy("method").collect().toSeq.map { r =>
      PaymentRow(r.getString(0), r.getLong(1) / 100.0, r.getLong(2) / 100.0)
    }
    ReportMetrics(
      reportDate = m.getString(0),
      totalRevenue = m.getDouble(1), nTx = m.getLong(2), avgTx = m.getDouble(3),
      bestTruck = m.getString(4), bestRevenue = m.getDouble(5),
      worstTruck = m.getString(6), worstRevenue = m.getDouble(7),
      totalFees = m.getDouble(8), netRevenue = m.getDouble(9),
      perTruck = trucks, perPayment = pays)
  }

  /** Driver-side HTML render (ref generate_report.py:160-387). */
  def renderHtml(m: ReportMetrics): String = {
    def money(d: Double) = f"$$$d%,.2f"
    val body =
      if (m.nTx == 0)
        s"""<p class="empty">No transactions recorded on ${m.reportDate}.</p>"""
      else {
        val truckRows = m.perTruck.map(t =>
          s"<tr><td>${t.name}</td><td>${money(t.revenue)}</td><td>${t.nTx}</td><td>${money(t.avgTx)}</td></tr>")
          .mkString("\n")
        val payRows = m.perPayment.map(p =>
          s"<tr><td>${p.method}</td><td>${money(p.revenue)}</td><td>${money(p.fee)}</td></tr>")
          .mkString("\n")
        s"""<ul>
           |  <li>Total revenue: ${money(m.totalRevenue)}</li>
           |  <li>Transactions: ${m.nTx}</li>
           |  <li>Average transaction: ${money(m.avgTx)}</li>
           |  <li>Best seller: ${m.bestTruck} (${money(m.bestRevenue)})</li>
           |  <li>Worst seller: ${m.worstTruck} (${money(m.worstRevenue)})</li>
           |  <li>Processing fees: ${money(m.totalFees)}</li>
           |  <li>Net revenue: ${money(m.netRevenue)}</li>
           |</ul>
           |<h2>Per-seller</h2>
           |<table><tr><th>Seller</th><th>Revenue</th><th>Tx</th><th>Avg</th></tr>
           |$truckRows</table>
           |<h2>Payment methods</h2>
           |<table><tr><th>Method</th><th>Revenue</th><th>Fee</th></tr>
           |$payRows</table>""".stripMargin
      }
    s"""<!DOCTYPE html>
       |<html><head><title>Daily report ${m.reportDate}</title></head>
       |<body><h1>Daily report — ${m.reportDate}</h1>
       |$body
       |</body></html>""".stripMargin
  }

  /** Report sink (S10): write the HTML under `outDir` with the reference's
    * key scheme `reports/daily-report-<date>.html`. */
  def save(html: String, outDir: String, date: LocalDate): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"daily-report-$date.html"), html)
  }
}
