package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{FileStats, SnapshotLake}

/** The DSv2 connector under its actual contract: reads equal the native
  * snapshot reader at any version, pushed filters prune input
  * partitions through the sidecar index without ever changing an
  * answer, column pruning reaches the parquet projection, and the
  * documented scope limits fail loudly. */
class GraftLakeSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft-dsv2").toString + "/lake"

  /** Four one-file key-range commits with stats on x. */
  private def buildLake(): String = {
    val root = newRoot()
    val idx = SnapshotLake.IndexSpec(Seq("x"), None)
    (0 until 4).foreach { i =>
      SnapshotLake.append(
        spark.range(i * 10L, i * 10L + 10)
          .select(col("id").as("x"), (col("id") * 2).as("y"),
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("s"),
              col("id").cast("string")).as("s"))
          .coalesce(1), root, idx)
    }
    root
  }

  private def lakeScanOf(df: DataFrame): GraftLakeScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: GraftLakeScan => s }.getOrElse(
      fail("plan must contain a GraftLakeScan"))

  test("connector reads equal the native snapshot reader, at head and pinned versions") {
    val root = buildLake()
    val viaConnector = spark.read.format("graftlake").load(root)
    assert(viaConnector.schema == SnapshotLake.read(spark, root).schema)
    assert(viaConnector.collect().map(_.toSeq).toSet ==
      SnapshotLake.read(spark, root).collect().map(_.toSeq).toSet)
    val pinned = spark.read.format("graftlake")
      .option("versionAsOf", "2").load(root)
    assert(pinned.count() == 20L)
    assert(pinned.select("x").collect().map(_.getLong(0)).toSet ==
      (0L until 20L).toSet)
  }

  test("pushed range filters prune input partitions through the index, answers unchanged") {
    val root = buildLake()
    val df = spark.read.format("graftlake").load(root)
      .filter(col("x") >= 10L && col("x") <= 25L)
    val scan = lakeScanOf(df)
    assert(scan.planInputPartitions().length == 2,
      s"files [10,19] and [20,29] survive: ${scan.description()}")
    assert(scan.description().contains("kept=2/4"))
    // pruning never changes the answer: filters are re-applied row-level
    assert(df.select("x").collect().map(_.getLong(0)).toSet ==
      (10L to 25L).toSet)
    // a point filter through the same path
    val pt = spark.read.format("graftlake").load(root).filter(col("x") === 35L)
    assert(lakeScanOf(pt).planInputPartitions().length == 1)
    assert(pt.select("y").head.getLong(0) == 70L)
  }

  test("column pruning reaches the parquet projection; count(*) decodes zero columns") {
    val root = buildLake()
    val twoCols = spark.read.format("graftlake").load(root).select("s", "x")
    assert(lakeScanOf(twoCols).readSchema().fieldNames.toSet == Set("s", "x"))
    assert(twoCols.collect().map(r => r.getString(0)).toSet ==
      (0 until 40).map(i => s"s$i").toSet)
    val n = spark.read.format("graftlake").load(root).count()
    assert(n == 40L)
  }

  /** Every connector scan in the physical plan, descending through the
    * AQE wrapper an aggregate's exchange introduces. */
  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.connector.read.Scan] =
    p.collect {
      case b: BatchScanExec => Seq(b.scan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(q.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
        scansIn(r.child)
    }.flatten

  private def aggScanOf(df: DataFrame): Option[GraftLakeAggScan] =
    scansIn(df.queryExecution.executedPlan)
      .collectFirst { case s: GraftLakeAggScan => s }

  test("count/min/max push down to a metadata-only scan with sidecar-exact values") {
    val root = buildLake()
    val df = spark.read.format("graftlake").load(root)
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n"),
           org.apache.spark.sql.functions.min(col("x")).as("mn"),
           org.apache.spark.sql.functions.max(col("x")).as("mx"))
    val scan = aggScanOf(df).getOrElse(fail(
      s"expected GraftLakeAggScan in ${df.queryExecution.executedPlan}"))
    assert(scan.planInputPartitions().length == 1, "one synthetic partition")
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (40L, 0L, 39L))
    // pinned version resolves the aggregate against THAT snapshot
    val pinned = spark.read.format("graftlake").option("versionAsOf", "2")
      .load(root).agg(org.apache.spark.sql.functions.max(col("x")).as("mx"))
    assert(aggScanOf(pinned).isDefined && pinned.head.getLong(0) == 19L)
  }

  test("aggregate pushdown refuses what metadata cannot answer exactly, falling back to a file scan") {
    val root = buildLake()
    def fallsBack(df: DataFrame): Unit = {
      assert(aggScanOf(df).isEmpty, s"must not push: ${df.queryExecution}")
      ()
    }
    // a filter makes sidecar totals wrong → file scan, answer still right
    val filtered = spark.read.format("graftlake").load(root)
      .filter(col("x") >= 10L)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    fallsBack(filtered)
    assert(filtered.head.getLong(0) == 30L)
    // no stats harvested for y → refuse min(y)
    fallsBack(spark.read.format("graftlake").load(root)
      .agg(org.apache.spark.sql.functions.min(col("y"))))
    // string column → refuse (binary footer stats may truncate)
    fallsBack(spark.read.format("graftlake").load(root)
      .agg(org.apache.spark.sql.functions.min(col("s"))))
    // GROUP BY → refuse, grouped answers still exact
    val grouped = spark.read.format("graftlake").load(root)
      .groupBy((col("x") % 2).as("p"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    fallsBack(grouped)
    assert(grouped.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 20L, 1L -> 20L))
  }

  test("join-driven runtime filtering prunes files through the sidecar index at execution time") {
    val root = buildLake()
    val fact = spark.read.format("graftlake").load(root)
    val dim = spark.range(0, 40).toDF("k").filter(col("k") >= 34L)
    val joined = fact.join(
      org.apache.spark.sql.functions.broadcast(dim), col("x") === col("k"))
    val rows = joined.collect()
    assert(rows.length == 6 &&
      rows.map(_.getLong(0)).toSet == (34L to 39L).toSet)
    val scan = scansIn(joined.queryExecution.executedPlan)
      .collectFirst { case s: GraftLakeScan => s }
      .getOrElse(fail("plan must contain the graftlake scan"))
    assert(scan.keptFiles == 1,
      s"only the [30,39] file holds build keys 34..39: ${scan.description()}")
  }

  test("writes through the connector: create, append, overwrite — snapshot commits with indexes") {
    val root = newRoot()
    def df(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("x"), (col("id") * 2).as("y")).coalesce(1)
    // creating write (no version yet) commits v1 — v2 path sources
    // take explicit append/overwrite modes only
    df(0, 10).write.format("graftlake").mode("append")
      .option("statsCols", "x").save(root)
    assert(SnapshotLake.currentVersion(root).contains(1L))
    // append commits v2; both rowsets visible
    df(10, 20).write.format("graftlake").mode("append")
      .option("statsCols", "x").save(root)
    val both = spark.read.format("graftlake").load(root)
    assert(both.count() == 20L)
    // the requested stats index fires for pushed filters
    val pruned = both.filter(col("x") >= 15L)
    assert(lakeScanOf(pruned).description().contains("kept=1/2"))
    assert(pruned.count() == 5L)
    // overwrite replaces the whole table atomically; time travel keeps v2
    df(100, 105).write.format("graftlake").mode("overwrite").save(root)
    assert(spark.read.format("graftlake").load(root)
      .select("x").collect().map(_.getLong(0)).toSet == (100L until 105L).toSet)
    assert(spark.read.format("graftlake").option("versionAsOf", "2")
      .load(root).count() == 20L)
    // schema enforcement on an existing lake (by-position, Spark's
    // save() contract): wrong arity and unsafe casts both fail analysis
    intercept[Exception] {
      spark.range(5).select(col("id").as("x"))
        .write.format("graftlake").mode("append").save(root)
    }
    intercept[Exception] {
      spark.range(5)
        .select(col("id").cast("string").as("x"), col("id").as("y"))
        .write.format("graftlake").mode("append").save(root)
    }
    ()
  }

  test("the default read path is COLUMNAR: batches feed ColumnarToRow, the row path only under DV/exact filters") {
    val root = buildLake()
    def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
    // plain scan: the factory reports columnar and the plan converts
    // batches (this is the pin that the decode parity rests on — a
    // regression to row-based reads shows up HERE, not just in bench)
    val plain = spark.read.format("graftlake").load(root).filter(col("x") >= 5L)
    val scan = lakeScanOf(plain)
    assert(scan.toBatch.createReaderFactory()
      .supportColumnarReads(scan.planInputPartitions().head),
      "the default path must offer columnar batches")
    assert(planOf(plain).contains("ColumnarToRow"),
      s"plan must consume batches columnar:\n${planOf(plain)}")
    // live tombstones force the row path (per-task DV filter)
    SnapshotLake.deleteWhere(spark, root, Seq(3L).toDF("x"))
    val dv = spark.read.format("graftlake").load(root)
    val dvScan = lakeScanOf(dv)
    assert(!dvScan.toBatch.createReaderFactory()
      .supportColumnarReads(dvScan.planInputPartitions().head),
      "a DV version must read row-based")
    assert(dv.count() == 39L)
  }

  test("_file metadata column: per-row lineage as a constant vector, usable in filters and groups") {
    val root = buildLake() // four one-file commits
    val df = spark.read.format("graftlake").load(root)
      .select(col("x"), col("_file"))
    val byFile = df.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byFile.size == 4, s"four files: ${byFile.keySet}")
    assert(byFile.keySet.forall(_.startsWith("data/")),
      "manifest-relative paths")
    // each file holds exactly its commit's key decade
    assert(byFile.values.toSet ==
      (0 until 4).map(i => (i * 10L until i * 10L + 10).toSet).toSet)
    // grouping by _file — the per-file row-count audit a lake admin runs
    val counts = spark.read.format("graftlake").load(root)
      .groupBy("_file")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(10L, 10L, 10L, 10L))
    // _file stays hidden from SELECT * (the metadata-column contract)
    assert(!spark.read.format("graftlake").load(root)
      .columns.contains("_file"))
  }

  test("exactPushdown accepts evaluable filters as pushed and the readers apply them exactly") {
    val root = buildLake()
    def exact(df: DataFrame => DataFrame) = df(
      spark.read.format("graftlake").option("exactPushdown", "true").load(root))
    // range + equality on integrals: rows filtered IN the reader (no
    // Filter node re-application) must equal the default path's
    val a = exact(_.filter(col("x") >= 10L && col("x") <= 25L))
    assert(a.select("x").collect().map(_.getLong(0)).toSet == (10L to 25L).toSet)
    val b = exact(_.filter(col("s") === "s17"))
    assert(b.collect().map(r => (r.getAs[Long]("x"), r.getAs[String]("s"))).toSeq ==
      Seq((17L, "s17")))
    // projection that drops the filter column still filters on it
    val c = exact(_.filter(col("x") > 35L).select("y"))
    assert(c.collect().map(_.getLong(0)).toSet == (36L until 40L).map(_ * 2).toSet)
  }

  test("a filtered count pushes to the metadata+boundary hybrid count scan") {
    val root = buildLake() // four files: [0,9] [10,19] [20,29] [30,39]
    val df = spark.read.format("graftlake").option("exactPushdown", "true")
      .load(root)
      .filter(col("x") >= 10L && col("x") <= 25L)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val scan = scansIn(df.queryExecution.executedPlan)
      .collectFirst { case s: GraftLakeCountScan => s }
      .getOrElse(fail(s"expected GraftLakeCountScan: ${df.queryExecution}"))
    assert(scan.metadataFiles == 1, "file [10,19] counts from _rows.json")
    assert(scan.scannedFiles == 1, "file [20,29] is the boundary")
    assert(scan.prunedFiles == 2, "files [0,9] and [30,39] prune")
    assert(df.head.getLong(0) == 16L)
    // a whole-table filtered count where every file whole-matches is
    // pure metadata; a filter we can't evaluate exactly falls back
    val all = spark.read.format("graftlake").option("exactPushdown", "true")
      .load(root).filter(col("x") >= 0L).count()
    assert(all == 40L)
    val contains = spark.read.format("graftlake").option("exactPushdown", "true")
      .load(root).filter(col("s").contains("s1")).count()
    assert(contains == 11L, "unsupported shape stays residual and exact")
    // strictness: x > 9 must NOT whole-drop... er, whole-COUNT file
    // [10,19] wrongly if bounds touch; > 10 keeps it a boundary file
    val strict = spark.read.format("graftlake").option("exactPushdown", "true")
      .load(root).filter(col("x") > 10L)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val ss = scansIn(strict.queryExecution.executedPlan)
      .collectFirst { case s: GraftLakeCountScan => s }.get
    assert(ss.scannedFiles == 1 && ss.metadataFiles == 2,
      s"min == literal under > is a boundary, not a whole match: ${ss.description()}")
    assert(strict.head.getLong(0) == 29L)
  }

  test("deletion-vector versions read through the row path, equal to the native anti-join") {
    val root = buildLake()
    SnapshotLake.deleteWhere(spark, root,
      Seq(3L, 17L, 35L).toDF("x")) // v5: merge-on-read tombstones
    val df = spark.read.format("graftlake").load(root)
    assert(df.count() == 37L)
    assert(df.select("x").collect().map(_.getLong(0)).toSet ==
      (0L until 40L).toSet -- Set(3L, 17L, 35L))
    assert(df.collect().map(_.toSeq).toSet ==
      SnapshotLake.read(spark, root).collect().map(_.toSeq).toSet)
    // projection that does NOT include the tombstone key still filters
    assert(df.select("y").collect().map(_.getLong(0)).toSet ==
      ((0L until 40L).toSet -- Set(3L, 17L, 35L)).map(_ * 2))
    // the pre-delete version still reads (columnar path, no vector)
    assert(spark.read.format("graftlake").option("versionAsOf", "4")
      .load(root).count() == 40L)
    // compaction clears the vector; reads go columnar and stay equal
    SnapshotLake.compact(spark, root)
    assert(spark.read.format("graftlake").load(root).count() == 37L)
  }

  test("hive-partitioned lakes read through the connector, partition tuple pruned and re-attached") {
    val part = newRoot()
    val idx = SnapshotLake.IndexSpec(Seq("x"), None)
    SnapshotLake.appendPartitioned(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("x", "p").repartition(1),
      part, Seq("p"), idx)
    SnapshotLake.appendPartitioned(
      Seq((4L, "b"), (5L, "c")).toDF("x", "p").repartition(1),
      part, Seq("p"), idx)
    val df = spark.read.format("graftlake").load(part)
    assert(df.schema.fieldNames.toSet == Set("x", "p"))
    assert(df.collect().map(r => (r.getAs[Long]("x"), r.getAs[String]("p"))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (5L, "c")))
    // the partition column itself projects from the path, not the file
    assert(df.select("p").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "a", "b", "b", "c"))
    // partition-tuple pruning composes with the pushed filter: p='c'
    // survives only the one file of the second commit
    val pc = spark.read.format("graftlake").load(part).filter(col("p") === "c")
    assert(lakeScanOf(pc).keptFiles == 1,
      s"partition pruning through the connector: ${lakeScanOf(pc).description()}")
    assert(pc.select("x").head.getLong(0) == 5L)
    // and the stats index prunes within partitions (x >= 4)
    val px = spark.read.format("graftlake").load(part).filter(col("x") >= 4L)
    assert(px.collect().map(_.getAs[Long]("x")).toSet == Set(4L, 5L))
  }

  test("array columns and schema evolution decode through the vectorized path") {
    val root = newRoot()
    SnapshotLake.append(
      Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f))).toDF("id", "emb"),
      root)
    // a later commit adds a column; older files surface it as NULL
    // (mergeSchema = the native reader's opt-in evolution contract)
    SnapshotLake.append(
      Seq((3L, Seq(5.0f, 6.0f), "new")).toDF("id", "emb", "tag"), root)
    val df = spark.read.format("graftlake")
      .option("mergeSchema", "true").load(root)
    val rows = df.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[scala.collection.Seq[Float]]("emb").toSeq,
      Option(r.getAs[String]("tag")))).toSet
    assert(rows == Set(
      (1L, Seq(1.0f, 2.0f), None), (2L, Seq(3.0f, 4.0f), None),
      (3L, Seq(5.0f, 6.0f), Some("new"))))
  }

  test("reader option timestampAsOf pins the newest commit at-or-before the instant") {
    val root = newRoot()
    SnapshotLake.append(spark.range(0, 3).select(col("id").as("x")), root) // v1
    Thread.sleep(1200)
    val between = java.time.Instant.now()
    Thread.sleep(1200)
    SnapshotLake.append(spark.range(3, 5).select(col("id").as("x")), root) // v2
    val pinned = spark.read.format("graftlake")
      .option("timestampAsOf", between.toString).load(root)
    assert(pinned.count() == 3L, "the instant between the commits reads v1")
    // the space-separated local form parses in the SESSION timezone
    // (UTC in these sessions) — the same rule as a SQL timestamp literal
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    assert(spark.read.format("graftlake")
      .option("timestampAsOf", fmt.format(between)).load(root).count() == 3L)
    // both pins together refuse; a pre-table instant refuses
    intercept[Exception](spark.read.format("graftlake")
      .option("timestampAsOf", between.toString)
      .option("versionAsOf", "1").load(root).count())
    intercept[Exception](spark.read.format("graftlake")
      .option("timestampAsOf", "2001-01-01T00:00:00Z").load(root).count())
  }

  test("write option mergeSchema=true auto-evolves the lake to the append's union; without it the append refuses") {
    val root = newRoot()
    SnapshotLake.append(
      spark.range(0, 5).select(col("id").as("k"),
        (col("id") * 2).cast("int").as("n")), root) // v1: n INT
    // a wider + additive batch refuses without the option…
    val batch = spark.range(5, 8).select(col("id").as("k"),
      (col("id") * 2).as("n"), // LONG: widens
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("t"),
        col("id").cast("string")).as("tag")) // new column
    intercept[Exception](
      batch.write.format("graftlake").mode("append").save(root))
    // …and evolves + appends with it: ONE commit carrying both the
    // evolved schema declaration and the files (Delta's autoMerge is
    // atomic — a crash can never leave the schema evolved with no data)
    batch.write.format("graftlake").mode("append")
      .option("mergeSchema", "true").save(root)
    assert(SnapshotLake.currentVersion(root).contains(2L),
      "autoMerge commits schema + files as one atomic version (v2)")
    assert(SnapshotLake.declaredSchema(root, Some(2L)).isDefined &&
      SnapshotLake.declaredSchema(root, Some(1L)).isEmpty,
      "the schema declaration rides the append commit itself")
    val df = spark.read.format("graftlake").load(root)
    assert(df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq(("k", "bigint"), ("n", "bigint"), ("tag", "string")))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getString(2)))).toSet ==
      ((0L until 5L).map(i => (i, i * 2, None)) ++
        (5L until 8L).map(i => (i, i * 2, Some(s"t$i")))).toSet)
    // a batch MISSING a column also rides the option (null-fill), with
    // no gratuitous evolve commit — the union adds nothing new
    spark.range(8, 9).select(col("id").as("k")).write.format("graftlake")
      .mode("append").option("mergeSchema", "true").save(root)
    assert(SnapshotLake.currentVersion(root).contains(3L),
      "no schema re-declaration when the union equals the lake schema")
    val after = spark.read.format("graftlake").load(root)
    assert(after.filter(col("k") === 8L).collect().map(r =>
      (r.isNullAt(1), r.isNullAt(2))).toSeq == Seq((true, true)))
  }

  test("filtered-count wholeMatch compares integral stats at full precision — no 2^53 Double collapse") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}
    // 2^53 + 1: equal to 2^53 as a Double, distinct as a Long
    val big = "9007199254740993"
    val st = Map("k" -> FileStats.ColRange(big, big, numeric = true,
      nulls = Some(0L)))
    assert(!GraftLakeCountScan.wholeMatch(st, EqualTo("k", 9007199254740992L)),
      "Double compare would wrongly PROVE every row equals 2^53")
    assert(GraftLakeCountScan.wholeMatch(st, EqualTo("k", 9007199254740993L)))
    assert(GraftLakeCountScan.wholeMatch(st, GreaterThan("k", 9007199254740992L)),
      "full precision must still prove the strict bound 2^53+1 > 2^53")
    assert(!GraftLakeCountScan.wholeMatch(st, LessThanOrEqual("k", 9007199254740992L)))
    // an unparseable numeric bound proves nothing (falls back to a scan)
    // rather than throwing or over-claiming
    val nan = Map("f" -> FileStats.ColRange("NaN", "NaN", numeric = true,
      nulls = Some(0L)))
    assert(!GraftLakeCountScan.wholeMatch(nan, EqualTo("f", 1.0d)))
  }

  test("exact filters accepted by a scan used as a micro-batch STREAM reach the streaming readers") {
    val root = newRoot()
    val idx = SnapshotLake.IndexSpec(Seq("x"), None)
    SnapshotLake.append(spark.range(0L, 10L).select(col("id").as("x"),
      (col("id") * 2).as("y")).coalesce(1), root, idx) // v1
    SnapshotLake.append(spark.range(10L, 20L).select(col("id").as("x"),
      (col("id") * 2).as("y")).coalesce(1), root, idx) // v2
    val schema = SnapshotLake.read(spark, root).schema
    val sb = new GraftLakeScanBuilder(root, None, schema,
      exactPushdown = true)
    val residual = sb.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThan("x", 14L)))
    assert(residual.isEmpty, "the integral filter must be accepted as exact")
    val scan = sb.build().asInstanceOf[GraftLakeScan]
    val stream = scan.toMicroBatchStream("unused")
    val parts = stream.planInputPartitions(GraftLakeOffset(0L),
      GraftLakeOffset(2L))
    val rf = stream.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = rf.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      try { while (r.next()) buf += r.get().getLong(0) } finally r.close()
      buf
    }.toSet
    // Spark re-applies NOTHING for a fully-pushed filter: the streaming
    // readers themselves must filter, or unmatched rows leak downstream
    assert(got == (15L until 20L).toSet,
      s"streaming readers must apply the pushed exact filter: $got")
  }

  test("a recreated lake at the same root rebuilds the sidecar index") {
    // the per-(root, version) sidecar index is fingerprint-validated like
    // the resolve cache: a delete-and-recreate must never plan a
    // partitioned scan from the OLD index (whose composed stats map knows
    // nothing of the new files — formerly a NoSuchElementException at
    // plan time, or worse, stale min/max on colliding commit-dir names)
    val s = spark
    val dir = Files.createTempDirectory("graft-sidx-recreate").toString
    val root = s"$dir/lake"
    import org.apache.spark.sql.functions.{lit, sum}
    def build(mark: Long): Unit =
      SnapshotLake.appendPartitioned(
        s.range(0, 100).select(col("id").as("k"), lit(mark).as("m"),
          (col("id") % 2).as("p")).repartition(1), root, Seq("p"))
    def q(): Long = s.read.format("graftlake").load(root)
      .filter(col("k") >= 10 && col("p") === 1)
      .agg(sum("m")).head.getLong(0)
    build(1L)
    assert(q() == 45L) // warms the (root, v=1) index
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    build(2L)
    assert(q() == 90L,
      "the recreated lake must plan from ITS OWN sidecar index")
  }

  test("sidecar-index MRU slot: strong hit by identity, newer version replaces it, older pinned reads stay soft") {
    val root = buildLake() // v1..v4, stats on x
    val f4 = SnapshotLake.files(root, 4L)
    val idx4 = GraftLakeSidecarIndex.of(root, 4L, f4)
    assert(GraftLakeSidecarIndex.of(root, 4L, f4) eq idx4,
      "re-planning the newest version is a strong MRU hit (same instance)")
    // planning an OLDER version (a pinned time-travel read) must answer
    // without displacing the newest version from the strong slot
    val f2 = SnapshotLake.files(root, 2L)
    val idx2 = GraftLakeSidecarIndex.of(root, 2L, f2)
    assert(idx2.rows.keySet.size < idx4.rows.keySet.size,
      "the older version's index covers fewer commit dirs")
    assert(GraftLakeSidecarIndex.of(root, 4L, f4) eq idx4,
      "an older pinned read leaves the newest version pinned strongly")
    // a newer version replaces the MRU slot and carries the new stats
    SnapshotLake.append(
      spark.range(100L, 110L).select(col("id").as("x"),
        (col("id") * 2).as("y"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"),
          col("id").cast("string")).as("s")).coalesce(1),
      root, SnapshotLake.IndexSpec(Seq("x"), None)) // v5
    val f5 = SnapshotLake.files(root, 5L)
    val idx5 = GraftLakeSidecarIndex.of(root, 5L, f5)
    assert(idx5 ne idx4)
    assert(GraftLakeSidecarIndex.of(root, 5L, f5) eq idx5,
      "the newer version now owns the strong slot")
    val newFile = (f5.toSet -- f4.toSet).head
    assert(idx5.composed(newFile).get("x").exists(_.min == "100"),
      "the replacing index carries the new commit's sidecar ranges")
  }
}
