package graft.report

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The dashboard session: filters apply everywhere, charts agree with the
  * underlying slice, the cached base is shared. */
class DashboardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val filters = Dashboard.Filters(
    from = LocalDate.of(2000, 1, 1), to = LocalDate.of(2000, 12, 31),
    priorities = Some(Seq("1-URGENT", "2-HIGH")))

  test("charts are internally consistent over one filtered slice") {
    val d = Dashboard.open(spark, TestSpark.Sf, filters)
    try {
      val kpi = d.kpis.collect()(0)
      val nTx = kpi.getLong(1)
      assert(nTx > 0)
      // daily trend totals the same revenue as the KPI row
      val trendSum = d.dailyTrend.agg(sum(round(col("revenue") * 100).cast("long")))
        .collect()(0).getLong(0)
      assert(trendSum / 100.0 == kpi.getDouble(0))
      // histogram counts total the KPI count
      val histSum = d.dayOfMonthHistogram.agg(sum("n_tx")).collect()(0).getLong(0)
      assert(histSum == nTx)
      // priority filter actually applied
      val prios = d.priorityCounts.collect().map(_.getString(0)).toSet
      assert(prios.subsetOf(Set("1-URGENT", "2-HIGH")))
      // top days are a prefix of the ordered trend
      assert(d.topDays(5).count() <= 5)
      assert(d.rawHead(10).count() == 10)
    } finally d.close()
  }

  test("ONE cached scan feeds every chart: no chart re-reads the lake files") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val d = Dashboard.open(spark, TestSpark.Sf, filters)
    try {
      d.sliceDF.count() // materialize the cache once
      val charts = Seq(
        "kpis" -> d.kpis, "dailyTrend" -> d.dailyTrend,
        "dayOfMonthHistogram" -> d.dayOfMonthHistogram,
        "revenueBySupplier" -> d.revenueBySupplier,
        "paymentMix" -> d.paymentMix, "perTruckSummary" -> d.perTruckSummary,
        "truckPaymentMatrix" -> d.truckPaymentMatrix(Seq("1-URGENT", "2-HIGH")),
        "topDays" -> d.topDays(10), "rawHead" -> d.rawHead(10))
      charts.foreach { case (name, df) =>
        df.collect()
        val plan = df.queryExecution.optimizedPlan
        // the chart's logical plan reads ONLY the in-memory slice — a file
        // relation at this level would mean a second scan of the sources
        val fileRelations = plan.collect { case r: LogicalRelation => r }
        val cached = plan.collect { case m: InMemoryRelation => m }
        assert(fileRelations.isEmpty, s"$name re-scans source files: $fileRelations")
        assert(cached.nonEmpty, s"$name does not read the cached slice")
      }
    } finally d.close()
  }

  test("date-range filter bounds the slice inclusively") {
    val oneDay = Dashboard.Filters(LocalDate.of(2000, 6, 15), LocalDate.of(2000, 6, 15))
    val d = Dashboard.open(spark, TestSpark.Sf, oneDay)
    try {
      val dates = d.dailyTrend.collect().map(_.getDate(0).toString).toSet
      assert(dates == Set("2000-06-15"))
    } finally d.close()
  }
}
