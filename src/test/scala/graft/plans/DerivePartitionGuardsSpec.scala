package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.PartitionedLake

/** The custom optimizer rule: ts bounds on convention-partitioned lakes
  * must grow (year, month, day) partition guards automatically, the
  * guards must never change results (conservative boundary), and columns
  * outside the convention must never be guarded.
  */
class DerivePartitionGuardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lake =
    spark.read.parquet(PartitionedLake.ensureEventsLake(spark, TestSpark.Sf))
  private lazy val raw = graft.model.Tables.events(spark, TestSpark.Sf)

  test("a bare ts lower bound prunes partition directories") {
    val df = lake.filter(col("ts") >= lit("2024-01-15 06:30:00").cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(TestSpark.hasPartitionGuard(plan),
      s"the rule must inject a year/month/day guard into PartitionFilters:\n$plan")
  }

  test("the kill switch disables the rule") {
    // Flip the switch on a CHILD session only: disabling it on the shared
    // session would race concurrently-planning suites (q114's
    // PartitionFilters assertion) under testForkedParallel.
    val s2 = spark.newSession()
    s2.conf.set(DerivePartitionGuards.EnabledKey, "false")
    val lake2 =
      s2.read.parquet(PartitionedLake.ensureEventsLake(spark, TestSpark.Sf))
    val df = lake2.filter(col("ts") >= lit("2024-01-15 06:30:00").cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!TestSpark.hasPartitionGuard(plan),
      s"with the flag off, no guard may be injected:\n$plan")
  }

  test("guarded results equal the raw table on both bound directions") {
    // mid-day bounds make the conservative day guard strictly wider than
    // the ts predicate — any off-by-one in the tuple comparison (or a
    // guard that failed to keep the boundary day) changes these counts
    for (pred <- Seq(
        col("ts") >= lit("2024-01-15 06:30:00").cast("timestamp"),
        col("ts") > lit("2024-01-15 06:30:00").cast("timestamp"),
        col("ts") <= lit("2024-01-15 06:30:00").cast("timestamp"),
        col("ts") < lit("2024-01-15 06:30:00").cast("timestamp"),
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-20 12:00:00").cast("timestamp"))) {
      assert(lake.filter(pred).count() == raw.filter(pred).count(),
        s"guarded lake count diverged from the raw table for $pred")
    }
  }

  test("the rule is idempotent on an already-guarded plan") {
    // the operator-optimization batch runs to fixpoint, so re-application
    // must be a no-op — the canonicalized-conjunct check is what keeps
    // the rule from growing the filter forever. The direct application
    // below runs outside the optimizer, so pin the active session first:
    // Rule.conf would otherwise fall back to the JVM-default time zone on
    // a bare test thread and re-derive a zone-shifted (non-matching) guard.
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val df = lake.filter(col("ts") >= lit("2024-01-15 06:30:00").cast("timestamp"))
    val once = df.queryExecution.optimizedPlan // rule already ran in optimization
    val twice = DerivePartitionGuards(once)
    assert(twice.canonicalized == once.canonicalized,
      s"second application changed the plan:\n$twice\nvs\n$once")
  }

  test("timestamp columns outside the ts convention are never guarded") {
    // the lineitem lake partitions on l_shipdate-derived columns, but the
    // rule cannot know that relation-specific derivation — it must leave
    // the filter alone rather than risk dropping rows
    val li = spark.read.parquet(PartitionedLake.ensureLineitemLake(spark, TestSpark.Sf))
    val df = li.filter(col("l_shipdate") >= lit("1995-06-01 00:00:00").cast("timestamp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: []"),
      s"no partition guard may be derived from a non-ts column:\n$plan")
  }
}
