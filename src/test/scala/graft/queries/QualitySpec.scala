package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the quality/sketch operators (q97-q101) beyond the oracle
  * hash: the KMV estimate's error bound, the constraint suite catching
  * exactly the injected dirt, weighted sampling tracking its weights, SCD2
  * conservation laws, and the fuzzy-join blocking recall on this catalog.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("kmv estimate lands within 5 standard errors of the exact count") {
    val r = run("q97_kmv_distinct").collect().head
    val k = r.getAs[Long]("k")
    val est = r.getAs[Long]("est_distinct").toDouble
    val exact = r.getAs[Long]("exact_distinct").toDouble
    assert(exact > k, "sketch only estimates when distinct count exceeds k")
    // KMV standard error ~ 1/sqrt(k-2); 5 sigma keeps the test deterministic
    // in spirit (md5 is fixed) while documenting the accuracy contract.
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 5.0 / math.sqrt(k - 2.0), s"relative error $relErr too large")
  }

  test("q174: merged per-day KMV sketches equal the direct global sketch bit-for-bit") {
    // THE mergeability property: k-smallest-of-union-of-partition-sketches
    // must be identical to k-smallest-of-everything — the reason a 100 TB
    // lake can keep k longs per partition and still answer global
    // distincts without a re-scan.
    val hd = graft.model.Tables.events(spark, TestSpark.Sf)
      .filter(col("user_id").isNotNull)
      .select(col("ts").cast("date").cast("string").as("day"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val merged = Quality.kmvMergeSketch(Quality.kmvPerDaySketch(hd)).collect().head
    val direct = Quality.kmvMergeSketch(hd).collect().head
    assert(merged.getLong(0) == direct.getLong(0) && merged.getLong(1) == direct.getLong(1),
      s"merged sketch (${merged.mkString(",")}) must equal direct (${direct.mkString(",")})")
  }

  test("quality suite counts exactly the injected violations") {
    val rows = run("q100_quality_suite").collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("metric"), r.getAs[Boolean]("passed"))).toMap
    val li = graft.model.Tables.lineitem(spark, TestSpark.Sf)
    val base = li.count()
    val dup = li.filter(col("l_orderkey") % 23 === 0).count()
    val nulled = li.filter(col("l_orderkey") % 13 === 0).count() +
      li.filter(col("l_orderkey") % 23 === 0 && col("l_orderkey") % 13 === 0).count()
    assert(rows("row_count") == ((base + dup, true)))
    // the synthetic lineitem's (orderkey, linenumber) is not naturally
    // unique — the check truthfully reports base-data duplicates PLUS the
    // appended copies: metric = (base − distinct keys) + appended rows
    val baseDistinct = li.select(countDistinct(col("l_orderkey"), col("l_linenumber")))
      .collect().head.getLong(0)
    assert(rows("dup_order_line") == ((base - baseDistinct + dup, false)))
    assert(rows("null_shipdate") == ((nulled, false)))
    assert(rows("null_orderkey") == ((0L, true)))
    assert(rows("discount_out_of_range") == ((0L, true)))
    assert(!rows("qty_out_of_range")._2 && rows("qty_out_of_range")._1 > 0)
  }

  test("weighted sample keeps more of char-heavy sources, never more than all") {
    val rows = run("q98_weighted_sample").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept >= 0 && kept <= n)
    }
    // global acceptance rate should be near the mean weight (n_chars/1000)
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val meanW = docs.agg(avg(col("n_chars"))).collect().head.getDouble(0) / 1000.0
    val rate = rows.map(_.getAs[Long]("n_kept")).sum.toDouble /
      rows.map(_.getAs[Long]("n_docs")).sum
    assert(math.abs(rate - meanW) < 0.15, s"rate $rate vs mean weight $meanW")
  }

  test("scd2 versions: per-type currents sum to the distinct-user count") {
    val rows = run("q99_scd2_history").collect()
    val users = graft.model.Tables.events(spark, TestSpark.Sf)
      .select("user_id").distinct().count()
    // every user has exactly one open (valid_to IS NULL) version
    assert(rows.map(_.getAs[Long]("n_current")).sum == users)
    for (r <- rows)
      assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_current"))
  }

  test("fuzzy catalog dedup: pairs are near (lev 1-2), row fan-out consistent") {
    val rows = run("q101_fuzzy_catalog_dedup").collect()
    assert(rows.nonEmpty, "the catalog's vocabulary guarantees near pairs")
    for (r <- rows) {
      assert(r.getAs[Long]("n_near_name_pairs") > 0)
      assert(r.getAs[Long]("n_row_pairs") >= r.getAs[Long]("n_near_name_pairs"))
      val Array(a, b) = r.getAs[String]("example_pair").split(" \\| ")
      val d = spark.sql(s"SELECT levenshtein('$a', '$b')").collect().head.getInt(0)
      assert(d >= 1 && d <= 2, s"example pair '$a'/'$b' at distance $d")
    }
  }
}
