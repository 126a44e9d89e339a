package graft.etl

import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint-storage release contract: localCheckpoint blocks are
  * RDD-level, so Dataset.unpersist and catalog.clearCache leave them
  * pinned (the leak behind BENCH_r08's suite-wide heap pressure);
  * [[Ckpt.release]] frees them synchronously. */
class CkptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Dataset.unpersist leaves localCheckpoint blocks pinned; Ckpt.release frees them") {
    val sc = spark.sparkContext
    val df = spark.range(10000).toDF("id").localCheckpoint(true)
    val rddId = df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.id
    }.head
    assert(sc.getPersistentRDDs.contains(rddId), "checkpoint block registered")

    df.unpersist(blocking = true)
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.contains(rddId),
      "documents the gap: neither unpersist nor clearCache releases checkpoint blocks")

    Ckpt.release(df)
    assert(!sc.getPersistentRDDs.contains(rddId), "release frees the blocks")
  }

  test("release is a no-op on plans without checkpoint leaves") {
    Ckpt.release(spark.range(10).toDF("id")) // must not throw
  }
}
