package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the lifecycle/monitoring operators (q79-q81) and the ANN
  * recall harness (q77), beyond the oracle hash: conservation laws
  * (erased + kept = total), update-wins merge policy, and recall bounds.
  */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def events = graft.model.Tables.events(spark, TestSpark.Sf)

  test("erasure conserves rows and purges every tombstoned user") {
    val rows = run("q80_user_erasure").collect()
    val total = events.count()
    val purged = events.filter(col("user_id") % 97 === 0).count()
    for (r <- rows)
      assert(r.getAs[Long]("n_total_minus_kept") == total - r.getAs[Long]("n_kept"))
    assert(rows.map(_.getAs[Long]("n_kept")).sum == total - purged,
      "kept rows must equal total minus the tombstoned users' events")
  }

  test("cdc merge: every updated key survives as the update, none twice") {
    val rows = run("q81_cdc_merge").collect()
    val perType = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("event_id") % 10 === 0, 1)).as("n_upd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- rows) {
      val (n, nUpd) = perType(r.getAs[String]("event_type"))
      // merge is an upsert of existing keys: cardinality is unchanged and
      // exactly the every-10th keys carry the src=2 row
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_updated") == nUpd)
    }
  }

  test("daily anomaly returns the 5 largest |z| days, z finite") {
    val rows = run("q79_daily_anomaly").collect()
    assert(rows.length == 5)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z"))).toSeq
    assert(zs == zs.sortBy(-(_: Double)), "must be ordered by |z| desc")
    assert(zs.forall(z => !z.isNaN && !z.isInfinite))
  }

  test("ann recall@10 matches an independent recount of the two top-k sets") {
    val rows = run("q77_ann_recall").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 10)
      assert(r.getAs[Double]("recall_at_10") == hits / 10.0)
    }
    // recount outside the query's join: collect both top-k sets and
    // intersect per query on the driver (tiny), so the harness's LEFT
    // JOIN + count(non-null) logic is itself under test. (Absolute recall
    // is a data property — 0.22 on the sf0.001 corpus, where true
    // neighbors scatter across cells — and the oracle already pins it.)
    val c = graft.etl.FanOut.fanOut(
      graft.model.Tables.embeddings(spark, TestSpark.Sf)
        .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label")),
      col("id"))
    val qs = c.filter(col("id") < 5).select("id", "vec")
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val bt = sets(graft.llm.Ann.bruteForceTopK(c, qs, 10))
    val it = sets(graft.llm.Ann.ivfTopK(c, qs, "label", 64, 2, 10))
    for (r <- rows) {
      val qid = r.getAs[Long]("qid")
      assert(r.getAs[Long]("n_hits") == (bt(qid) & it(qid)).size.toLong, s"qid $qid")
    }
  }

  test("funnel stages are monotone non-increasing with consistent rates") {
    val rows = run("q104_funnel").collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[String]("stage")).toSeq == Seq("signup", "click", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel must narrow: ${ns.toSeq}")
    assert(ns(0) > 0 && ns(2) > 0, "funnel must be exercised end-to-end")
    val pct = rows.map(_.getAs[Double]("pct_of_prev"))
    assert(pct(0) == 100.0)
    assert(math.abs(pct(1) - math.round(10000.0 * ns(1) / ns(0)) / 100.0) < 1e-9)
    assert(math.abs(pct(2) - math.round(10000.0 * ns(2) / ns(1)) / 100.0) < 1e-9)
  }
}
