package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The documented 100 TB swaps for exact aggregates — HLL distinct counts
  * and t-digest percentiles — verified against their exact twins on real
  * data, so the "same query shape, bounded error" claim in the Scaladocs
  * is a tested property, not folklore. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct tracks exact COUNT(DISTINCT) within its rsd bound") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.Sf)
    val rows = li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.06, s"flag ${r.getString(0)}: approx $approx vs exact $exact (err $err)")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.Sf)
    val r = li.agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .collect()(0)
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"median approx $approx vs exact $exact")
  }
}
