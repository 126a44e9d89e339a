package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted plans must be exactly equivalent to their unsalted twins. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val li = graft.model.Tables.lineitem(spark, TestSpark.Sf)
  private lazy val sup = graft.model.Tables.supplier(spark, TestSpark.Sf)

  test("saltedDistinctCount equals plain countDistinct") {
    val plain = li.groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(li, Seq("l_returnflag"), "l_suppkey",
        buckets = 8, out = "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals the plain inner join") {
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_suppkey", "k"),
        sup.withColumnRenamed("s_suppkey", "k"),
        key = "k", bigSaltSource = "l_orderkey", buckets = 8)
      .groupBy("s_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
