package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the typed-Dataset operators (q122 cogroup, q123 typed
  * Aggregator) and the set-op/ranking additions (q121, q120, q124) beyond
  * the oracle hash: conservation laws the classifications must obey and
  * the merge algebra of the user-level Aggregator.
  */
class TypedOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def orders = graft.model.Tables.orders(spark, TestSpark.Sf)
  private def lineitem = graft.model.Tables.lineitem(spark, TestSpark.Sf)

  test("cogroup reconcile partitions the full orderkey universe") {
    val rows = run("q122_cogroup_reconcile").collect()
    val classified = rows.map(_.getAs[Long]("n_orders")).sum
    val universe = orders.select("o_orderkey")
      .union(lineitem.select("l_orderkey")).distinct().count()
    assert(classified == universe,
      "every order key lands in exactly one reconciliation class")
    // drift of the matches class is zero by definition
    rows.filter(_.getAs[String]("status") == "matches")
      .foreach(r => assert(r.getAs[Long]("total_abs_diff_cents") == 0L))
    // the synthetic data has orders without lineitems but no orphans
    assert(!rows.exists(_.getAs[String]("status") == "no_order"))
  }

  test("typed Aggregator matches the built-in aggregate algebra") {
    val got = run("q123_typed_agg_stats").collect()
      .map(r => r.getAs[String]("priority") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("total_value"))).toMap
    val want = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("tv"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
  }

  test("Aggregator merge is associative with identity zero") {
    val a = TypedOps.CentsStats
    val x = a.reduce(a.zero, KeyedCents(1, 500))
    val y = a.reduce(a.reduce(a.zero, KeyedCents(2, -30)), KeyedCents(3, 70))
    assert(a.merge(x, a.zero) == x)
    assert(a.merge(a.zero, x) == x)
    assert(a.merge(x, y) == a.merge(y, x))
    assert(a.merge(x, y) == CentsStatsBuf(3, 540, -30, 500))
  }

  test("set-op cohorts tile the two-year active universe") {
    val rows = run("q121_customer_set_ops").collect()
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_customers")).toMap
    def active(yr: Int) = orders
      .filter(year(col("o_orderdate")) === yr).select("o_custkey").distinct()
    val n95 = active(1995).count()
    val n96 = active(1996).count()
    val union = active(1995).union(active(1996)).distinct().count()
    assert(rows("churned_after_1995") + rows("retained_both_years") == n95)
    assert(rows("new_in_1996") + rows("retained_both_years") == n96)
    assert(rows.values.sum == union)
  }

  test("spend deciles are contiguous, near-equal, and cover all customers") {
    val rows = run("q120_spend_deciles").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1, "ntile buckets differ by at most 1")
    assert(sizes.sum == orders.select("o_custkey").distinct().count())
    // percent_rank ascends with the decile (spend DESC ordering)
    val prs = rows.map(_.getAs[Double]("min_percent_rank")).toSeq
    assert(prs == prs.sorted)
  }

  test("hll guard reports every verdict inside the tolerance gate") {
    val rows = run("q124_hll_distinct_guard").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_within_10pct")),
      "HLL++ at rsd=0.02 must sit far inside the 10% gate")
  }
}
