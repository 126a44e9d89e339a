package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q177 sequence packing: the two-phase distributed prefix sum must
  * equal the single-window global prefix sum exactly, and the bin layout
  * must cover the corpus with no gaps or over-full bins. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    graft.SparkEntry.queries("q177_exact_global_packing")(spark, TestSpark.Sf)
      .collect()

  test("bins start at 0, strictly increase, and doc ranges do not overlap") {
    assert(rows.nonEmpty)
    val bins = rows.map(_.getAs[Long]("bin")).toSeq
    // strictly increasing, starting at 0; a gap is legal only when one
    // document spans multiple budget windows (bin = where a doc STARTS)
    assert(bins.head == 0L)
    assert(bins == bins.sorted && bins.distinct == bins)
    // a doc is attributed to the bin where it starts, in doc_id order —
    // so [first_doc, last_doc] ranges must be strictly increasing
    val ranges = rows.map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toSeq
    for (Seq(a, b) <- ranges.sliding(2).filter(_.length == 2))
      assert(a._2 < b._1, s"doc ranges overlap: $a then $b")
  }

  test("every document is packed exactly once; totals add up") {
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val nDocs = docs.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " "))).cast("long")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
  }

  test("two-phase prefix sum matches the single-window global prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val budget = CurationOps.PackBudget
    // reference: the naive one-partition global window
    val ref = graft.model.Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tc"))
      .withColumn("off", coalesce(
        sum("tc").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), expr(s"off div $budget").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"))).toMap
    val got = rows.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"))).toMap
    assert(got == ref)
  }

  test("each bin's first doc starts inside that bin's budget window") {
    val budget = CurationOps.PackBudget.toLong
    // cum before each row = the global token offset of that bin's first
    // doc; membership in bin b means b·budget ≤ offset < (b+1)·budget.
    var cum = 0L
    for (r <- rows) {
      val floor = r.getAs[Long]("bin") * budget
      assert(cum >= floor && cum < floor + budget,
        s"bin ${r.getAs[Long]("bin")}: first-doc offset $cum outside [$floor, ${floor + budget})")
      cum += r.getAs[Long]("total_tokens")
    }
  }
}
