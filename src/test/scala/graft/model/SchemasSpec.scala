package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pinned-schema contract: every testdata table matches, and drift is a
  * descriptive error, not a silent re-interpretation. */
class SchemasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every table loads under its pinned schema") {
    Tables.names.foreach { n =>
      assert(Tables.load(spark, TestSpark.Sf, n).columns.nonEmpty, s"table $n")
    }
  }

  test("drift fails fast naming the offending column") {
    val wrong = StructType(Seq(
      StructField("r_regionkey", LongType), // pinned type is Integer
      StructField("r_name", StringType)))
    val e = intercept[IllegalStateException] {
      Schemas.validate("region", Schemas.region, wrong)
    }
    assert(e.getMessage.contains("region"))
    assert(e.getMessage.contains("r_regionkey"))
  }

  test("missing column is reported as missing") {
    val truncated = StructType(Seq(StructField("r_regionkey", IntegerType)))
    val e = intercept[IllegalStateException] {
      Schemas.validate("region", Schemas.region, truncated)
    }
    assert(e.getMessage.contains("<missing>"))
  }
}
