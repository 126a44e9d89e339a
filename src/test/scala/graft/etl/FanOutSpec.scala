package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adaptive fan-out: spreads single-split inputs, passes already-parallel
  * inputs through untouched (no gratuitous exchange at real scale). */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("single-split input is fanned out to the shuffle parallelism") {
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(docs.rdd.getNumPartitions < target,
      "precondition: the test corpus arrives under-partitioned")
    assert(FanOut.fanOut(docs, col("doc_id")).rdd.getNumPartitions == target)
  }

  test("already-parallel input passes through with no extra exchange") {
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pre = graft.model.Tables.documents(spark, TestSpark.Sf)
      .repartition(target, col("doc_id"))
    val out = FanOut.fanOut(pre, col("doc_id"))
    assert(out eq pre, "pre-partitioned input must be returned unchanged")
  }
}
