package graft.report

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Report metrics + HTML, including the empty-day branch
  * (generate_report.py:72-84) — SURVEY §7.4 trap 5. */
class ReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("metrics on a day with data are internally consistent") {
    val m = Report.metrics(spark, TestSpark.Sf, LocalDate.of(2000, 6, 15))
    assert(m.nTx > 0)
    assert(m.totalRevenue > 0)
    assert(m.netRevenue == m.totalRevenue - m.totalFees)
    assert(m.bestRevenue >= m.worstRevenue)
    assert(m.perTruck.nonEmpty)
    // per-truck revenues sum back to the total (exact cents arithmetic)
    val perTruckSum = math.round(m.perTruck.map(t => t.revenue * 100).sum) / 100.0
    assert(perTruckSum == m.totalRevenue)
    // fee model: only card-like ('urgent') methods carry a fee
    assert(m.perPayment.filter(p => !p.method.toLowerCase.contains("urgent"))
      .forall(_.fee == 0.0))
  }

  test("empty day yields zeroed metrics, not nulls or a crash") {
    val m = Report.metrics(spark, TestSpark.Sf, LocalDate.of(1990, 1, 1))
    assert(m.nTx == 0)
    assert(m.totalRevenue == 0.0 && m.avgTx == 0.0 && m.netRevenue == 0.0)
    assert(m.bestTruck == "n/a" && m.worstTruck == "n/a")
    assert(m.perTruck.isEmpty && m.perPayment.isEmpty)
  }

  test("HTML renders data and empty variants") {
    val full = Report.renderHtml(Report.metrics(spark, TestSpark.Sf, LocalDate.of(2000, 6, 15)))
    assert(full.contains("<table>") && full.contains("Net revenue"))
    val empty = Report.renderHtml(Report.metrics(spark, TestSpark.Sf, LocalDate.of(1990, 1, 1)))
    assert(empty.contains("No transactions recorded"))
    assert(empty.startsWith("<!DOCTYPE html>"))
  }

  test("the report run feeds every aggregate from ONE cached lake scan") {
    val date = LocalDate.of(2000, 6, 15)
    val slice = Report.daySlice(spark, TestSpark.Sf, date).cache()
    try {
      val dfs = Seq(
        Report.metricsDFFrom(spark, TestSpark.Sf, date, slice),
        Report.perTruckDF(spark, TestSpark.Sf, slice),
        Report.perPaymentDF(spark, TestSpark.Sf, slice))
      dfs.foreach(_.collect())
      val lakeRoot = graft.etl.PartitionedLake.lakeRoot(TestSpark.Sf)
      def occurrences(s: String, sub: String): Int =
        s.sliding(sub.length).count(_ == sub)
      // every slice consumer must read the in-memory relation: each lake
      // FileScan in the executed plan sits INSIDE an InMemoryRelation
      // (cached-plan) block — a direct re-scan would print a lake FileScan
      // without a matching InMemoryRelation
      dfs.map(_.queryExecution.executedPlan.toString).foreach { s =>
        assert(s.contains("InMemoryTableScan"),
          s"report aggregate must read the cached slice:\n$s")
        assert(occurrences(s, lakeRoot) <= occurrences(s, "InMemoryRelation"),
          s"report aggregate must not re-scan the lake outside the cache:\n$s")
      }
    } finally { val _ = slice.unpersist() }
  }

  test("report sink writes the reference's key scheme") {
    val dir = java.nio.file.Files.createTempDirectory("graft-report").toString
    val date = LocalDate.of(2000, 6, 15)
    val p = Report.save("<html></html>", dir, date)
    assert(p.getFileName.toString == "daily-report-2000-06-15.html")
    assert(java.nio.file.Files.readString(p) == "<html></html>")
  }
}
