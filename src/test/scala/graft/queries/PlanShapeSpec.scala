package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape assertions for the scale claims the Scaladocs make — filter
  * pushdown reaching the scan, windows partitioned by their bucket key
  * (never a global single-partition sort), broadcast dimension chains.
  * PlanGuardSpec bans cartesians inventory-wide; this spec pins the
  * positive properties for the queries whose whole point is the plan.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString

  test("q82: the year filter reaches the orders parquet scan") {
    val p = plan("q82_star_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("GreaterThanOrEqual(o_orderdate"),
      s"o_orderdate bound not pushed to the scan:\n$p")
    assert(p.split("BroadcastHashJoin").length >= 4,
      "the customer->nation->region chain (and the filtered orders side at test " +
        "scale) must plan as broadcast hash joins")
  }

  test("q75: the eval-slice bound reaches the documents scan") {
    val p = plan("q75_inverted_index")
    assert(p.contains("LessThan(doc_id,40)"),
      s"doc_id < 40 not pushed to the scan:\n$p")
  }

  test("q85: the packing window partitions by bucket, not globally") {
    val p = plan("q85_sequence_packing")
    assert(p.contains("hashpartitioning(bucket"),
      s"cumsum window must shuffle on the bucket key:\n$p")
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"a single-partition exchange means the window went global:\n$p")
  }

  test("q80: the tombstone predicate reaches the scan and the anti-join broadcasts") {
    val p = plan("q80_user_erasure")
    assert(p.contains("LeftAnti, BuildRight"),
      s"erasure must plan a broadcast anti-join:\n$p")
  }

  test("q90: pasted SQL arrives at the same physical shapes as the DSL") {
    // The verbatim-SQL entry point must not lose the optimizations the
    // DSL twins get: the supplier dim joins as a broadcast hash join and
    // the lineitem scan is column-pruned to the three referenced columns
    // (a scan dragging l_comment through a 100 TB pass would be wrong).
    val p = plan("q90_sql_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"supplier dim must broadcast:\n$p")
    assert(!p.contains("l_comment") && !p.contains("l_quantity"),
      s"lineitem scan must prune to the referenced columns:\n$p")
  }

  test("curation family reads the shared materialized relations") {
    // "Tokenize once, curate many": the TF-IDF and surprisal queries must
    // scan the memoized tokenized-corpus parquet (not re-tokenize
    // documents), and the inverted-index Jaccard must scan the shared
    // hashed-shingle relation — the checkpoint-read evidence the shared
    // seam promises.
    assert(plan("q71_tfidf_topk").contains("graft-tokens"),
      "q71 must read the materialized tokenized relation")
    assert(plan("q92_unigram_surprisal").contains("graft-tokens"),
      "q92 must read the materialized tokenized relation")
    assert(plan("q87_ngram_jaccard").contains("graft-shingles"),
      "q87 must read the materialized shingle relation")
  }

  test("q89: one lineitem scan feeds all three grouping-set levels") {
    // The whole point of the consolidation: three reporting levels, ONE
    // pass over the fact table (Expand), not three scans. Count scans in
    // the current-plan section only (AQE plan strings may append an
    // "Initial Plan" copy that would double-count).
    val p = plan("q89_grouping_sets").split("== Initial Plan ==")(0)
    assert(p.contains("Expand"), s"grouping sets must plan as a single Expand:\n$p")
    assert(p.split("Scan parquet").length == 2, s"expected exactly one lineitem scan:\n$p")
  }

  test("q86: delta predicate prunes at the scan, partials merge full-outer") {
    val p = plan("q86_incremental_view")
    // Reading the Spark-written micros events lake (not the raw nanos
    // file), the split predicate must reach the parquet footer AND its
    // day-granular twin must prune partition directories — IVM's
    // "re-aggregate only the delta" is only real if both fire. Both
    // branches carry their own partial+final aggregate, and the merge is
    // an outer hash join, not a recompute.
    assert(p.contains("PushedFilters: [IsNotNull(ts)")
      || p.contains("GreaterThan(ts,") || p.contains("LessThanOrEqual(ts,"),
      s"ts split bound not pushed to the lake scan:\n$p")
    assert(TestSpark.hasPartitionGuard(p),
      s"day-granular guard must appear as a partition filter:\n$p")
    assert(p.split("HashAggregate").length > 4,
      s"both branches must carry their own partial+final aggregate:\n$p")
    assert(p.contains("FullOuter"), s"merge must be a full-outer join:\n$p")
  }

  test("q97: the KMV sketch plans top-k, never a global sort") {
    // The sketch's scale story is "k smallest of a distinct set via
    // TakeOrdered" — a global Sort before the limit would materialize the
    // whole distinct relation on one reducer at 100 TB.
    val p = plan("q97_kmv_distinct").split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      s"k-smallest must plan as TakeOrderedAndProject:\n$p")
    // scope to the sketch branch (everything before the broadcast of the
    // exact-count rider, whose single-row final merge is inherent): the
    // top-k must sit directly on the hash-partitioned distinct with no
    // single-partition exchange of its own
    val sketchBranch = p.split("BroadcastExchange")(0)
    assert(!sketchBranch.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"no single-partition exchange may feed the top-k:\n$p")
    // the distinct is two-phase: partial per partition, merge after shuffle
    assert(sketchBranch.split("HashAggregate").length >= 3,
      s"distinct must run as partial+final hash aggregates:\n$p")
  }

  test("q101: fuzzy ER joins hash-partitioned on the block key") {
    // Blocked entity resolution must plan an equi-join on the blocking
    // key (hash or broadcast — never nested-loop over the catalog), with
    // the Levenshtein predicate applied post-join inside codegen.
    val p = plan("q101_fuzzy_catalog_dedup")
    assert(p.contains("HashJoin"), s"block join must be a hash join:\n$p")
    assert(p.contains("levenshtein"),
      s"the edit-distance filter must ride the join, not a collect:\n$p")
  }

  test("q106: the salted join shuffles on (key, salt), not the bare hot key") {
    // The whole mitigation: the join's partitioning must include __salt so
    // the hot key's rows spread over `buckets` reducers instead of one.
    val p = plan("q106_skew_salted_join")
    assert(p.contains("__salt"),
      s"salt column must survive into the join keys:\n$p")
    assert(p.contains("hashpartitioning(hk") || p.contains("[hk"),
      s"join must still key on hk alongside the salt:\n$p")
  }

  test("q108: the calendar dim filter prunes fact partitions at runtime") {
    // The predicate lives on the dimension, so only DYNAMIC pruning can
    // eliminate fact partitions: the scan must carry a
    // dynamicpruningexpression partition filter (fed by the reused join
    // broadcast), and the dim must broadcast.
    val p = plan("q108_dpp_calendar_join")
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamic partition pruning filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 31-row calendar dim must broadcast:\n$p")
  }

  test("q110: the dim's predicate reaches the fact side as a Bloom filter") {
    // Both sides too large to broadcast (forced at test scale): the
    // filtered orders' keys must arrive on the lineitem side as a
    // might_contain(bloom_filter) guard BEFORE the join's shuffle — the
    // semi-join reduction that drops ~97% of fact rows pre-wire.
    val p = plan("q110_bloom_runtime_filter")
    assert(p.contains("might_contain"),
      s"fact side must carry the runtime Bloom filter:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"the join must be a shuffle join (broadcast is disabled):\n$p")
  }

  test("q114: the optimizer rule injects partition guards the query never wrote") {
    // q114 filters the events lake by bare ts bounds — the non-empty
    // PartitionFilters can only come from graft.plans.DerivePartitionGuards.
    val p = plan("q114_auto_partition_guards")
    assert(TestSpark.hasPartitionGuard(p),
      s"the derived (year, month, day) guard must reach PartitionFilters:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(ts)")
      || p.contains("GreaterThanOrEqual(ts,"),
      s"the exact ts bound must still push to the parquet footer:\n$p")
  }

  test("q100: the quality suite aggregates in one pass per branch") {
    // One combined aggregate computes every check (no per-check scan):
    // expect exactly the base scan + the 1/23rd duplicate-injection scan,
    // then a single partial+final aggregate pair feeding the unpivot.
    val p = plan("q100_quality_suite").split("== Initial Plan ==")(0)
    assert(p.split("Scan parquet").length <= 3,
      s"expected at most two lineitem scans (base + injected dups):\n$p")
    assert(p.contains("Expand") || p.contains("Generate"),
      s"the check-per-row unpivot must be an Expand/Generate, driver-free:\n$p")
  }

  test("q168: AQE splits the hot-key join partition at runtime") {
    // the skew marker only exists in the FINAL adaptive plan — execute,
    // then read the plan back
    val on = Extended.aqeSkewJoin(spark, TestSpark.Sf)
    on.collect()
    val pOn = on.queryExecution.executedPlan.toString
    assert(pOn.contains("skew=true"),
      s"AQE must split the 75%-hot-key partition (skew=true marker missing):\n$pOn")
    val off = Extended.aqeSkewJoin(spark, TestSpark.Sf, skewEnabled = false)
    off.collect()
    val pOff = off.queryExecution.executedPlan.toString
    assert(!pOff.contains("skew=true"),
      s"counterfactual: with skewJoin disabled the join must stay unsplit:\n$pOff")
  }

  test("q132: ANALYZE column stats, not file size, price the filtered side") {
    // Counterfactual pair on the SAME catalog table and the SAME 16 KiB
    // broadcast threshold: without CBO the filtered self-side is priced
    // at file size (hundreds of KiB -> sort-merge/shuffle join); with CBO
    // the ndv/range estimate for l_suppkey < 5 is a few hundred rows
    // (~KiB) -> broadcast. The flip can ONLY come from the statistics.
    val table = Extended.cboStatsTable(spark, TestSpark.Sf)

    val off = spark.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", (16 * 1024).toString)
    val pOff = Extended.cboJoin(off, table).queryExecution.executedPlan.toString
    assert(!pOff.contains("BroadcastHashJoin"),
      s"without CBO the file-size estimate must exceed the threshold:\n$pOff")

    val on = spark.newSession()
    on.conf.set("spark.sql.cbo.enabled", "true")
    on.conf.set("spark.sql.autoBroadcastJoinThreshold", (16 * 1024).toString)
    val pOn = Extended.cboJoin(on, table).queryExecution.executedPlan.toString
    assert(pOn.contains("BroadcastHashJoin"),
      s"with CBO the stats-based estimate must broadcast the filtered side:\n$pOn")
  }

  test("q145: the spatial join is an equi-join on the cell key, never a product") {
    // The whole point of the grid bucketing: candidate generation must be
    // a hash/sort-merge join on (jcx, jcy) — a nested-loop product over
    // the distance predicate would be the O(n²) shape the query exists
    // to avoid.
    val p = plan("q145_grid_spatial_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"spatial candidates must come from the cell equi-join:\n$p")
    assert(p.contains("jcx") && p.contains("jcy"),
      s"join keys must be the grid cell coordinates:\n$p")
  }

  test("q151: the share windows partition by nation, not globally") {
    val p = plan("q151_nation_share_window")
    assert(p.contains("hashpartitioning(n_name"),
      s"ratio-to-report windows must shuffle on the nation key:\n$p")
  }

  test("q143: the EWMA windows partition by event_type, not globally") {
    val p = plan("q143_ewma_daily_revenue")
    assert(p.contains("hashpartitioning(event_type"),
      s"EWMA windows must shuffle on the series key:\n$p")
  }

  test("user broadcast hints override the size-based join strategy") {
    // With auto-broadcast off (child session — no shared-conf race), the
    // join defaults to sort-merge; the user's .hint("broadcast") must
    // still flip it. This is the manual override every tuning guide
    // reaches for when statistics mislead the planner.
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = graft.model.Tables.lineitem(s2, TestSpark.Sf)
      .select("l_orderkey", "l_extendedprice")
    val ord = graft.model.Tables.orders(s2, TestSpark.Sf)
      .select("o_orderkey", "o_orderpriority")

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plain.contains("SortMergeJoin"),
      s"with broadcast off the unhinted join must sort-merge:\n$plain")

    val hinted = li.join(ord.hint("broadcast"), col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(hinted.contains("BroadcastHashJoin"),
      s"the broadcast hint must override the disabled threshold:\n$hinted")
  }

  test("DISTRIBUTE BY in pasted SQL becomes a hash-partitioned exchange") {
    // The SQL surface for pre-shuffling ahead of a co-partitioned
    // consumer: DISTRIBUTE BY must plan the same hashpartitioning
    // exchange repartition() does in the DSL.
    graft.model.Tables.registerAll(spark, TestSpark.Sf)
    val p = spark.sql(
      "SELECT l_suppkey, l_extendedprice FROM lineitem DISTRIBUTE BY l_suppkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(l_suppkey"),
      s"DISTRIBUTE BY must hash-partition on the named key:\n$p")
  }

  test("streaming-dedup probe: the bucketed corpus state joins with zero shuffles") {
    // The VERDICT r11 item-7 claim made checkable: with band state in a
    // table CLUSTERED BY bkey, the batch ⋈ corpus probe join needs no
    // Exchange on EITHER side — both are bucketed scans of the state
    // table, so the scan itself carries the join partitioning. At 100 TB
    // that is the difference between shuffling the corpus index every
    // trigger and shuffling nothing.
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    import spark.implicits._
    val stateRoot = java.nio.file.Files
      .createTempDirectory("graft-probe-shape").toString
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // two real batches through the actual per-batch entry point
    graft.streaming.StreamingDedup.processBatch(
      docs.filter(col("doc_id") < 20), stateRoot, 0L, 0.5)
    graft.streaming.StreamingDedup.processBatch(
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 40), stateRoot, 1L, 0.5)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the probe must stand on its bucketing (a
      // broadcast corpus would hide a missing bucket spec — and at scale
      // the corpus side could never broadcast anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = graft.streaming.StreamingDedup
        .crossCandidates(spark, stateRoot, 1L)
      val p = probe.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"the bucketed probe must plan with zero shuffle exchanges:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"probe must be a real bucket-colocated join:\n$p")
      assert(probe.count() >= 0L) // executes end-to-end on the bucketed scan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the verify side: the sets table scan is bucketed on doc_id
    val setsPlan = spark.table(
      graft.streaming.StreamingDedup.setsTable(stateRoot))
      .filter(col("b") <= 1L).drop("b")
      .alias("s").join(Seq(1L).toDF("doc_id").hint("shuffle_merge"),
        Seq("doc_id")).queryExecution.executedPlan.toString
    assert(setsPlan.contains("SelectedBucketsCount") ||
      setsPlan.contains("Bucketed: true"),
      s"sets scan must be bucketed:\n$setsPlan")
  }

  test("connector scans report statistics: a small graftlake dim auto-broadcasts with NO hint; big stats refuse") {
    // SupportsReportStatistics counterfactual: without reported stats a
    // DSv2 relation defaults to spark.sql.defaultSizeInBytes (Long.Max)
    // and the first unhinted dim⋈fact join goes sort-merge — the r14
    // verdict's #1 missing item. With the sidecar-derived estimate the
    // size-based JoinSelection rule fires on its own.
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.etl.SnapshotLake
    val dir = java.nio.file.Files.createTempDirectory("graft-scanstats").toString
    val dimRoot = s"$dir/dim"
    val factRoot = s"$dir/fact"
    SnapshotLake.append(spark.range(0, 100)
      .select(col("id").as("k"),
        concat(lit("name"), col("id").cast("string")).as("name"))
      .coalesce(1), dimRoot, SnapshotLake.IndexSpec(Seq("k"), None))
    SnapshotLake.append(spark.range(0, 50000)
      .select((col("id") % 100).as("k"), col("id").as("v")).coalesce(4),
      factRoot, SnapshotLake.IndexSpec(Seq("k", "v"), None))
    val dim = spark.read.format("graftlake").load(dimRoot)
    val fact = spark.read.format("graftlake").load(factRoot)
    val joined = fact.join(dim, "k") // NO broadcast() hint anywhere
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"a ~3 KB connector dim must auto-broadcast from its reported stats:\n$p")
    // counterfactual: the SAME join with the threshold below the dim's
    // reported size must NOT broadcast — proving the decision came from
    // the scan's statistics, not from some other default
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val p2 = fact.join(dim, "k").queryExecution.executedPlan.toString
      assert(!p2.contains("BroadcastHashJoin"),
        s"stats above the threshold must refuse the auto-broadcast:\n$p2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the estimate itself: exact numRows from the rows sidecars, bytes
    // from the post-pruning file lengths
    val scan = dim.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.collectFirst { case s: graft.sources.GraftLakeScan => s }.get
    val st = scan.estimateStatistics()
    assert(st.numRows.getAsLong == 100L, "sidecar row counts are exact")
    assert(st.sizeInBytes.getAsLong > 0L)
    // and pruning shrinks the estimate: a pushed range keeping one of the
    // fact's four files reports roughly a quarter of the bytes
    val whole = fact.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.collectFirst { case s: graft.sources.GraftLakeScan => s }.get
    val pruned = fact.filter(col("v") < 100L).queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.collectFirst { case s: graft.sources.GraftLakeScan => s }.get
    assert(pruned.estimateStatistics().sizeInBytes.getAsLong <
      whole.estimateStatistics().sizeInBytes.getAsLong,
      "a pushed filter must shrink the reported size with the pruned files")
  }

  test("connector COLUMN statistics price a filtered dim the size-only estimate gets wrong") {
    // The counterfactual the size-only stats CANNOT win: the dim's key
    // values are INTERLEAVED across its four files, so a selective range
    // predicate prunes NO file and the post-pruning byte estimate stays
    // at full table size (above the broadcast threshold -> sort-merge).
    // Only row-level selectivity estimation — Catalyst's FilterEstimation
    // over the scan's reported min/max + distinct count, under CBO — can
    // see that `k < 40` keeps ~0.1% of rows and broadcast the filtered
    // dim. Flipping the connector's `columnStats` option (same session,
    // same CBO, same threshold) flips the join: the decision provably
    // comes from the per-column statistics, nothing else.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.etl.SnapshotLake
    val dir = java.nio.file.Files.createTempDirectory("graft-colstats").toString
    val dimRoot = s"$dir/dim"
    val factRoot = s"$dir/fact"
    for (i <- 0 until 4) // interleaved: every file spans ~the full range
      SnapshotLake.append(spark.range(0, 40000)
        .filter(col("id") % 4 === i)
        .select(col("id").as("k"),
          concat(lit("pad-pad-pad-pad-pad-pad-pad-"),
            col("id").cast("string")).as("pad"))
        .coalesce(1), dimRoot,
        SnapshotLake.IndexSpec(Seq("k"), None, ndvCols = Seq("k")))
    SnapshotLake.append(spark.range(0, 200000)
      .select((col("id") % 40000).as("k"), col("id").as("v")).coalesce(4),
      factRoot, SnapshotLake.IndexSpec(Seq("k"), None))

    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
    val fact = s.read.format("graftlake").load(factRoot)
    def planWith(opts: (String, String)*): String = {
      val dim = opts.foldLeft(s.read.format("graftlake")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(dimRoot)
      fact.join(dim.filter(col("k") < lit(40L)), "k")
        .queryExecution.executedPlan.toString
    }
    val pOn = planWith()
    assert(pOn.contains("BroadcastHashJoin"),
      s"with column statistics, CBO must price k<40 at ~40 rows and broadcast:\n$pOn")
    val pOff = planWith("columnStats" -> "false")
    assert(!pOff.contains("BroadcastHashJoin"),
      "without column statistics the size-only estimate (full table — no " +
        s"file prunes) must refuse the broadcast:\n$pOff")

    // the premise and the reported statistics themselves
    val scan = s.read.format("graftlake").load(dimRoot)
      .filter(col("k") < lit(40L)).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.collectFirst { case sc: graft.sources.GraftLakeScan => sc }.get
    assert(scan.keptFiles == 4,
      "interleaved ranges must defeat file pruning — the counterfactual depends on it")
    val cs = scan.estimateStatistics().columnStats()
    val kStat = cs.entrySet().iterator().asScala
      .find(_.getKey.fieldNames.head == "k").map(_.getValue)
      .getOrElse(fail("column k must report statistics"))
    assert(kStat.min.get == java.lang.Long.valueOf(0L) &&
      kStat.max.get == java.lang.Long.valueOf(39999L),
      s"sidecar bounds must merge exactly: [${kStat.min}, ${kStat.max}]")
    assert(kStat.nullCount.getAsLong == 0L)
    // overlapping file ranges -> the NDV combiner takes the per-file MAX
    // (a lower bound, the safe direction for broadcast decisions)
    assert(kStat.distinctCount.getAsLong == 10000L,
      s"overlapping ranges combine NDV as max(per-file): ${kStat.distinctCount}")
  }

  test("NDV disjointness needs slack beyond double rounding above 2^53") {
    // pre-r17 sidecars folded INT64 bounds through Double, where a true
    // max above 2^53 can round DOWN by half an ulp: two files whose key
    // ranges actually overlap can LOOK disjoint, and summing their exact
    // NDVs overstates distinctCount — underestimating a join cardinality
    // into a potential false broadcast. The combiner claims disjointness
    // only with slack beyond the rounding error; at normal magnitudes an
    // integer gap clears the slack and the exact sum still applies.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    import graft.etl.{FileStats, SnapshotLake}
    val dir = java.nio.file.Files.createTempDirectory("graft-ndvslack").toString
    val idx = SnapshotLake.IndexSpec(Seq("k"), None, ndvCols = Seq("k"))
    def seed(root: String): Seq[String] = {
      SnapshotLake.append(
        spark.range(0, 5).select(col("id").as("k")).coalesce(1), root, idx)
      SnapshotLake.append(
        spark.range(5, 10).select(col("id").as("k")).coalesce(1), root, idx)
      SnapshotLake.files(root, 2L).sorted
    }
    def ndv(root: String): Long = {
      val scan = spark.read.format("graftlake").load(root)
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan
        }.collectFirst { case sc: graft.sources.GraftLakeScan => sc }.get
      scan.estimateStatistics().columnStats().entrySet().iterator().asScala
        .find(_.getKey.fieldNames.head == "k").get.getValue
        .distinctCount().getAsLong
    }
    // real bounds [0,4] | [5,9]: an integer gap at magnitude ~10 is far
    // beyond any rounding slack — exact per-file NDVs still SUM
    val rootA = s"$dir/a"
    seed(rootA)
    assert(ndv(rootA) == 10L, "integer-gapped small-magnitude ranges sum NDV")
    // same integer gap crafted at 2^53 (a fresh root: a version's
    // sidecars are contractually immutable once read): ulp(9e15) = 2, so
    // the gap of 1 is INSIDE the possible fold error — fall back to MAX
    val rootB = s"$dir/b"
    val live = seed(rootB)
    FileStats.writeStatsSidecar(rootB, Map(
      live.head -> Map("k" -> FileStats.ColRange(
        "9007199254740988", "9007199254740992", numeric = true, Some(0L))),
      live.last -> Map("k" -> FileStats.ColRange(
        "9007199254740993", "9007199254740997", numeric = true, Some(0L)))))
    assert(ndv(rootB) == 5L,
      "a gap inside double-rounding slack must fall back to max(per-file)")
  }
}
