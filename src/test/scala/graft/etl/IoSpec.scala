package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Jdbc

/** CSV stage hand-off, JDBC reader assembly, and catalog registration. */
class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CSV stage round-trip preserves rows and timestamp values under an explicit schema") {
    val events = graft.model.Tables.events(spark, TestSpark.Sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft-csv").toString + "/stage"
    Csv.write(events, dir)
    val back = Csv.read(spark, dir, graft.streaming.StreamingJobs.eventsSchema)
    assert(back.count() == events.count())
    val a = events.agg(sum("event_id"), max("ts")).collect()(0)
    val b = back.agg(sum("event_id"), max("ts")).collect()(0)
    assert(a.getLong(0) == b.getLong(0))
    assert(a.getTimestamp(1) == b.getTimestamp(1), "ts must survive the CSV hop")
  }

  test("JDBC denormalizing query carries the incremental bound only when state exists") {
    val full = Jdbc.denormalizingQuery(None)
    assert(full.contains("JOIN DIM_Truck") && full.contains("JOIN DIM_Payment_Method"))
    assert(!full.contains("WHERE"))
    val inc = Jdbc.denormalizingQuery(Some(Timestamp.valueOf("2024-03-01 10:11:12")))
    assert(inc.contains("WHERE ft.at > '2024-03-01 10:11:12"))
  }

  test("catalog-registered lake table answers SQL with partition pruning") {
    val root = PartitionedLake.ensureLineitemLake(spark, TestSpark.Sf)
    PartitionedLake.registerTable(spark, "lineitem_lake", new java.io.File(root).getAbsolutePath)
    val df = spark.sql(
      "SELECT count(*) AS n FROM lineitem_lake WHERE year = 2000 AND month = 6")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    val expected = graft.model.Tables.lineitem(spark, TestSpark.Sf)
      .filter(year(col("l_shipdate")) === 2000 && month(col("l_shipdate")) === 6).count()
    assert(df.collect()(0).getLong(0) == expected)
  }
}
