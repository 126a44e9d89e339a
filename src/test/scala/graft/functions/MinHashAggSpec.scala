package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The MinHash sketch aggregate: signature semantics, buffer round-trip,
  * partition-order independence. */
class MinHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signature equals the direct per-hash computation") {
    val hs = Seq(3L, 99L, 1234567L)
    val sig = hs.toDF("h").agg(MinHashAgg.sig(col("h"))).collect()(0).getSeq[Long](0)
    val expected = (0 until MinHashAgg.NumHashes).map { k =>
      hs.map(h => ((h & 0xffffffffL) * MinHashAgg.A(k) + MinHashAgg.B(k)) % MinHashAgg.MersennePrime).min
    }
    assert(sig == expected)
  }

  test("result is independent of partitioning (merge path exercised)") {
    val df = spark.range(0, 10000).select(xxhash64(col("id")).as("h"))
    val one  = df.coalesce(1).agg(MinHashAgg.sig(col("h"))).collect()(0).getSeq[Long](0)
    val many = df.repartition(13).agg(MinHashAgg.sig(col("h"))).collect()(0).getSeq[Long](0)
    assert(one == many)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = MinHashAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val buf = Array.tabulate(MinHashAgg.NumHashes)(k => k.toLong * 7 + 1)
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("null inputs are ignored, empty group yields the identity buffer") {
    val sig = Seq(Option.empty[Long]).toDF("h")
      .agg(MinHashAgg.sig(col("h"))).collect()(0).getSeq[Long](0)
    assert(sig.forall(_ == Long.MaxValue))
  }
}
