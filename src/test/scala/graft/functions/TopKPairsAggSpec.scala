package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bounded-state top-k kernel must be bit-equivalent to the
  * collect_list formulation it replaced, with O(k) buffers. */
class TopKPairsAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topk_pairs equals slice(array_sort(collect_list)) on random grouped data") {
    val rows = {
      val rnd = new scala.util.Random(7)
      (0 until 5000).map(i => (i % 13L, rnd.nextLong() % 1000, i.toLong))
    }
    val df = rows.toDF("key", "neg", "id").repartition(8)
    val kernel = df.groupBy("key")
      .agg(call_function("topk_pairs", col("neg"), col("id"), lit(5)).as("top"))
    val reference = df.groupBy("key")
      .agg(slice(array_sort(collect_list(struct(col("neg"), col("id")))), 1, 5).as("top"))
    assert(kernel.exceptAll(reference).isEmpty && reference.exceptAll(kernel).isEmpty,
      "kernel and collect_list formulations must agree exactly, order included")
  }

  test("topk_pairs: groups smaller than k return all pairs, sorted") {
    val out = Seq((1L, 5L, 10L), (1L, 3L, 11L)).toDF("key", "neg", "id")
      .groupBy("key")
      .agg(call_function("topk_pairs", col("neg"), col("id"), lit(4)).as("top"))
      .select(explode(col("top")).as("e")).select("e.neg", "e.id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 11L), (5L, 10L)))
  }

  test("topk_pairs buffer: equal scores break ties by id, k boundary drops the largest") {
    val buf = new TopKPairsAgg.Buf(2)
    buf.insert(5L, 9L); buf.insert(5L, 3L); buf.insert(5L, 7L); buf.insert(4L, 99L)
    assert(buf.cnt == 2)
    assert((buf.negs.take(2).toSeq, buf.ids.take(2).toSeq) == (Seq(4L, 5L), Seq(99L, 3L)))
  }
}
