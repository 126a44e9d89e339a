package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.SnapshotLake

/** The V2 catalog under its actual contract: pasted SQL (CREATE TABLE /
  * SELECT with VERSION AS OF / INSERT INTO) resolves lake tables with
  * the connector's pruning intact; external tables survive DROP;
  * managed tables own their data. */
class GraftLakeCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftLakeCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cat.warehouse",
      Files.createTempDirectory("graft-cat-wh").toString)
    s
  }
  import spark.implicits._

  private def buildLake(): String = {
    val root = Files.createTempDirectory("graft-cat-lake").toString + "/lake"
    val idx = SnapshotLake.IndexSpec(Seq("x"), None)
    (0 until 4).foreach { i =>
      SnapshotLake.append(
        spark.range(i * 10L, i * 10L + 10)
          .select(col("id").as("x"), (col("id") * 2).as("y"))
          .coalesce(1), root, idx)
    }
    root
  }

  test("external table: pasted SQL with VERSION AS OF rides the pruned connector scan") {
    val root = buildLake()
    SnapshotLake.deleteWhere(spark, root, Seq(5L).toDF("x")) // v5
    spark.sql(s"CREATE TABLE graft_cat.ns.ext USING graftlake LOCATION '$root'")
    assert(spark.sql("SELECT count(*) AS n FROM graft_cat.ns.ext")
      .head.getLong(0) == 39L, "head reads through the tombstone vector")
    // time travel to the pre-delete version, with a pruned band scan
    val tt = spark.sql(
      """SELECT sum(y) AS s FROM graft_cat.ns.ext VERSION AS OF 4
        |WHERE x >= 10 AND x <= 19""".stripMargin)
    assert(tt.head.getLong(0) == (10L to 19L).map(_ * 2).sum)
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.connector.read.Scan] = p.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        Seq(b.scan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(q.plan)
    }.flatten
    val scan = scansIn(tt.queryExecution.executedPlan)
      .collectFirst { case s: GraftLakeScan => s }
      .getOrElse(fail("plan must contain the graftlake scan"))
    assert(scan.keptFiles == 1 && scan.totalFiles == 4,
      s"the band prunes to one file through SQL: ${scan.description()}")
    // DROP removes the pointer, never the external lake
    spark.sql("DROP TABLE graft_cat.ns.ext")
    assert(!spark.catalog.tableExists("graft_cat.ns.ext"))
    assert(SnapshotLake.currentVersion(root).contains(5L),
      "dropping an external table must not touch the lake")
  }

  test("managed table: INSERT creates version 1, INSERT INTO appends, DROP removes the data") {
    spark.sql("CREATE TABLE graft_cat.ns.managed (x BIGINT, y BIGINT) USING graftlake")
    spark.sql("INSERT INTO graft_cat.ns.managed SELECT id AS x, id * 2 AS y FROM range(10)")
    spark.sql("INSERT INTO graft_cat.ns.managed SELECT id AS x, id * 2 AS y FROM range(10, 15)")
    val n = spark.sql("SELECT count(*) FROM graft_cat.ns.managed").head.getLong(0)
    assert(n == 15L)
    assert(spark.sql("SELECT max(x) FROM graft_cat.ns.managed VERSION AS OF 1")
      .head.getLong(0) == 9L, "the first insert is version 1")
    spark.sql("DROP TABLE graft_cat.ns.managed")
    assert(!spark.catalog.tableExists("graft_cat.ns.managed"))
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.ns.managed").collect()
    }
    ()
  }
}
