package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BloomOps
import graft.llm.{Ann, TextOps}
import graft.model.Tables

/** Round-10 pipeline operators: sub-document line-granularity dedup with
  * document reassembly (the MassiveText/CCNet "remove duplicated lines
  * everywhere, keep the rest" policy — a different contract from q181's
  * keep-first chunk dedup), plus two new stage hand-off formats (ORC and
  * JSON-lines) completing the S-family next to q66's CSV hop.
  *
  * Shared idioms with [[CurationOps]]: whitespace tokens = DuckDB
  * `string_split`, exact integer counts, md5 fingerprints identical in
  * both engines.
  */
object PipelineOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def fanned(s: SparkSession, d: String) =
    graft.etl.FanOut.fanOut(docs(s, d), col("doc_id"))

  /** Tokens per "line" for q195 — the corpus is single-line prose, so the
    * line structure every real crawl carries is derived deterministically:
    * fixed 10-token windows, replayed identically by the oracle. */
  val LineW = 10

  /** One ORC copy of the lineitem slice per (session, sf dir) — the
    * between-stage hand-off in a columnar format with its own writer
    * (predicate pushdown + column pruning work on ORC exactly as on
    * parquet; at 100 TB this is the cross-team hop where one side of the
    * lake is ORC). */
  private val orcStage = new graft.etl.Memo[(SparkSession, String), String]
  private def orcLineitemDir(s: SparkSession, d: String): String =
    orcStage((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-orc-stage").toString
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
        .write.mode("overwrite").orc(tmp)
      tmp
    }

  /** One JSON-lines copy of the documents table per (session, sf dir) —
    * the landing format most crawls actually arrive in. Written by Spark's
    * JSON sink, read back with the EXPLICIT pinned schema (schema
    * inference over 100 TB of JSONL is a full extra pass and a drift
    * hazard — production readers always pin). */
  private val jsonStage = new graft.etl.Memo[(SparkSession, String), String]
  private def jsonDocsDir(s: SparkSession, d: String): String =
    jsonStage((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-jsonl-stage").toString
      docs(s, d).write.mode("overwrite").json(tmp)
      tmp
    }

  /** Neighbors per node in the q198 kNN graph. */
  val KnnK = 3

  /** MMR reranking (q203): candidates per query and selections made. */
  val MmrCand = 20
  val MmrK = 5

  /** q204's window length — q185's threshold. NOTE: must be declared
    * BEFORE `defs` (object vals initialize in declaration order; a
    * forward reference interpolates as 0 into the oracle SQL). */
  private val XN = CurationOps.MinRepeatTokens

  /** Bloom sizing for q199: the eval set's distinct 3-gram count is a few
    * thousand at any test SF; 2^19 bits (64 KiB) holds it at a sub-percent
    * FP rate, and at 100 TB the eval side is still benchmark-sized, so
    * the bloom stays a trivially-broadcast literal. */
  val DecontamEstItems = 1L << 12
  val DecontamNumBits  = 1L << 19

  /** (doc_id, lang, g) — one row per distinct word-3-gram per document. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    fanned(s, d).select(col("doc_id"), col("lang"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("g"))

  /** One bloom filter of the eval slice's hashed shingles per (session,
    * sf dir): built distributed, collected as a small binary (the model
    * artifact every decontamination task broadcasts), then carried as a
    * plan literal by q199's map-side prune. */
  private val evalBloomMemo = new graft.etl.Memo[(SparkSession, String), Array[Byte]]
  private def evalBloom(s: SparkSession, d: String): Array[Byte] =
    evalBloomMemo((s, d)) {
      shingled(s, d).filter(col("doc_id") < 20)
        .agg(BloomOps.bloomAgg(xxhash64(col("g")),
          DecontamEstItems, DecontamNumBits).as("bf"))
        .head.getAs[Array[Byte]]("bf")
    }

  /** Quantizer-cell schedule for [[knnGraphStats]]'s candidate routing —
    * THE fix for r11's one measured superlinear query. The `label` column
    * has FIXED cardinality, so label-only cells grow linearly with the
    * corpus and the within-cell all-pairs join is Σ|cell|² — quadratic
    * (measured 666× wall at 100× data). Routing candidate generation
    * through (label × trained-quantizer cell) with the cell count
    * PROPORTIONAL to the corpus keeps expected cell population bounded,
    * so pair mass ≈ n · |cell| stays linear — exactly the q170 SemDeDup
    * scale story ("k grows with the corpus so cells stay bounded")
    * applied to the kNN graph. Within a composed cell the top-k is still
    * exact; beyond one cell the graph is the standard IVF-routed
    * approximation every production kNN-graph builder ships.
    *
    * Determinism contract (the [[Ann.lshParams]] trade): at every oracle
    * scale (n ≤ [[KnnQuantTarget]]) this resolves to ONE cell — the
    * label-only form the static oracle SQL replays bit-for-bit — and the
    * adaptivity engages only beyond oracle scale. Schedule-pinned in
    * PipelineOpsSpec. */
  val KnnQuantTarget = 4000L
  val KnnQuantIters = 2
  def knnQuantCells(n: Long): Int = {
    // overflow-safe ceiling division (n + T − 1 wraps near Long.MaxValue)
    val c = n / KnnQuantTarget + (if (n % KnnQuantTarget == 0) 0 else 1)
    math.min(4096L, math.max(1L, c)).toInt
  }

  /** The q198 operator over any (id, vec, label) relation: per-cell exact
    * kNN edges (top-`k` cosine within the `label` cell, ties by id),
    * reduced to per-cell graph statistics — node count, directed edge
    * count, mutual (reciprocated) pair count, and the exact integer sum
    * of mutual cosine micros. Candidate generation routes through
    * (label × quantizer cell) per [[knnQuantCells]]; the reported graph
    * statistics stay keyed by label. */
  def knnGraphStats(e: DataFrame, k: Int): DataFrame =
    knnGraphStats(e, k, knnQuantCells(e.count()))

  /** [[knnGraphStats]] with the quantizer-cell count explicit — the seam
    * the spec uses to exercise the multi-cell routing at test scale. */
  def knnGraphStats(e: DataFrame, k: Int, cells: Int): DataFrame = {
    val routed =
      if (cells <= 1) e.withColumn("qcell", lit(0L))
      else {
        // Train the coarse quantizer on the corpus itself (q165's Lloyd
        // machinery, exact integer micro-space) and collect the k·dim-long
        // codebook — a model artifact, bounded driver state (the q170 /
        // BPE-table precedent) — so assignment re-broadcasts a local
        // relation with no training lineage.
        val vecs = Ann.quantized(e.select(col("id"), col("vec")))
          .withColumn("g", lit(0L)).select("g", "id", "x")
        val trained = Ann.lloyd(vecs, cells, KnnQuantIters)
        val codebook = trained.collect().toSeq.map(r =>
          (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
        trained.unpersist()
        val s = e.sparkSession
        import s.implicits._
        val asg = Ann.assignCells(vecs, codebook.toDF("g", "cell", "c"))
          .select(col("id"), col("cell").as("qcell"))
        e.join(asg, "id")
      }
    val scored = routed.select(col("id").as("cid"), col("vec").as("cv"),
        col("label"), col("qcell"))
      .join(routed.select(col("id").as("qid"), col("vec").as("qv"),
        col("label"), col("qcell")), Seq("label", "qcell"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid").as("key"), col("cid").as("id"),
        Ann.cosMicros(col("qv"), col("cv")).as("score"))
    val edges = Ann.topKPerKey(scored, k)
      .select(col("key").as("qid"), col("id").as("cid"),
        round(col("cos") * 1e6).cast("long").as("cm"))
    val ed = edges.join(e.select(col("id").as("qid"), col("label")), "qid")
    val mutual = ed
      .join(edges.select(col("cid").as("qid"), col("qid").as("cid")),
        Seq("qid", "cid"))
      .filter(col("qid") < col("cid"))
    val perCell = ed.groupBy("label")
      .agg(countDistinct("qid").as("n_nodes"), count(lit(1)).as("n_edges"))
    val perMutual = mutual.groupBy("label")
      .agg(count(lit(1)).as("n_mutual"), sum("cm").cast("long").as("mutual_cm_sum"))
    perCell.join(perMutual, Seq("label"), "left")
      .select(col("label"), col("n_nodes"), col("n_edges"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"),
        coalesce(col("mutual_cm_sum"), lit(0L)).as("mutual_cm_sum"))
      .orderBy("label")
  }

  /** The q195 operator over any (doc_id, lang, text) relation: remove
    * every [[LineW]]-token line whose exact text recurs anywhere in the
    * corpus (from ALL documents — repeated lines are boilerplate, no copy
    * is content), rebuild each document from its surviving lines in
    * order, and emit the per-document curation record. */
  def lineDedupRebuild(docsDf: DataFrame): DataFrame = {
    val lines = docsDf
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(1, size(toks), $LineW), st -> struct(" +
          s"CAST((st - 1) div $LineW AS BIGINT) AS ci, " +
          s"array_join(slice(toks, st, $LineW), ' ') AS lt, " +
          s"CAST(size(slice(toks, st, $LineW)) AS BIGINT) AS ln))")).as("e"))
      .select(col("doc_id"), col("lang"), col("e.ci").as("ci"),
        col("e.lt").as("lt"), col("e.ln").as("ln"))
    lines
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(md5(col("lt")))))
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("occ") < 2, 1)).cast("long").as("n_kept"),
        coalesce(sum(when(col("occ") >= 2, col("ln"))), lit(0L))
          .cast("long").as("tokens_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("occ") < 2,
              struct(col("ci"), col("lt"))))),
            x => x.getField("lt")),
          " ")).as("rebuilt_md5"))
      .orderBy("doc_id")
  }

  val defs: Vector[Q] = Vector(

    // ── Line-granularity dedup with document REASSEMBLY: every 10-token
    //    line whose exact text recurs anywhere in the corpus is removed
    //    from EVERY document (the MassiveText "repeated lines are
    //    boilerplate, none of the copies is content" policy — unlike
    //    q181's keep-first, which preserves one copy), and each document
    //    is rebuilt from its surviving lines in order. Output is the
    //    per-document curation record: kept/removed accounting plus the
    //    md5 of the rebuilt text, which IS the operator's payload (the
    //    rebuilt corpus), hash-verified. Plan: one shuffle on the line
    //    fingerprint (high-cardinality md5 key — the occurrence count is
    //    a window over that key), one shuffle on doc_id for the ordered
    //    reassembly (array_sort over collected (ci, line) structs — no
    //    single-reducer window). At 100 TB both keys are dense and
    //    uniform; nothing is ever compared pairwise.
    Q("q195_line_dedup_rebuild",
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
         |l AS (SELECT doc_id, lang, CAST((st - 1) // $LineW AS BIGINT) AS ci,
         |             array_to_string(toks[st:st+${LineW - 1}], ' ') AS lt,
         |             len(toks[st:st+${LineW - 1}]) AS ln
         |      FROM (SELECT doc_id, lang, toks,
         |                   unnest(range(1, len(toks) + 1, $LineW)) AS st
         |            FROM t WHERE len(toks) >= 1)),
         |o AS (SELECT *, count(*) OVER (PARTITION BY lt) AS occ FROM l)
         |SELECT doc_id, lang,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(count(*) FILTER (WHERE occ < 2) AS BIGINT) AS n_kept,
         |       CAST(coalesce(sum(ln) FILTER (WHERE occ >= 2), 0) AS BIGINT) AS tokens_removed,
         |       md5(coalesce(string_agg(lt, ' ' ORDER BY ci) FILTER (WHERE occ < 2), '')) AS rebuilt_md5
         |FROM o GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin) { (s, d) =>
      lineDedupRebuild(fanned(s, d))
    },

    // ── ORC stage round-trip (S-family, next to q66's CSV hop): the
    //    lineitem slice written by Spark's ORC sink, read back by the ORC
    //    source, and aggregated — proving the second columnar format
    //    loses no row, cent, or timestamp microsecond across the hop.
    //    The oracle aggregates the ORIGINAL parquet, so the entire
    //    write→read cycle is inside the verified path. Cents ride exact
    //    integers; the NTZ ship date is compared as epoch micros.
    Q("q196_orc_stage_roundtrip",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS gross,
        |       epoch_us(CAST(max(l_shipdate) AS TIMESTAMP)) AS max_ship_us
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      s.read.orc(orcLineitemDir(s, d))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("total_qty"),
          (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("gross"),
          unix_micros(max(col("l_shipdate")).cast("timestamp")).as("max_ship_us"))
        .orderBy("l_returnflag")
    },

    // ── JSON-lines stage round-trip: the documents table through Spark's
    //    JSON sink and back under the pinned schema — the crawl-landing
    //    hop. The aggregate re-derives length(text) AFTER the hop and
    //    sums it against the original n_chars, so any JSON escaping /
    //    unicode mangling in either direction breaks the hash. Reading
    //    with the explicit schema (never inference) is the 100 TB
    //    contract: inference is a second full pass over the lake.
    Q("q197_jsonl_stage_roundtrip",
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |       min(md5(text)) AS min_md5
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      s.read.schema(graft.model.Schemas.documents).json(jsonDocsDir(s, d))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(length(col("text"))).cast("long").as("sum_len"),
          min(md5(col("text"))).as("min_md5"))
        .orderBy("lang", "source")
    },

    // ── Mutual-kNN graph over the embedding lake: each vector's exact
    //    top-3 cosine neighbors WITHIN its coarse cell — (label ×
    //    trained quantizer cell), where knnQuantCells sizes the trained
    //    cells to the corpus (1 cell ⇒ label-only at every oracle scale,
    //    the form the SQL replays; the quantizer routing engages beyond,
    //    keeping the self-join per-cell instead of corpus² — the r11
    //    666×-at-100× fix), then the graph statistics diversity
    //    sampling and graph
    //    clustering start from: directed edge count, mutual
    //    (reciprocated) pair count, and the exact integer sum of mutual
    //    cosines. Plan: one equi-join on the cell key (never a cartesian),
    //    bounded-state two-stage top-k (Ann.topKPerKey — no single-reducer
    //    window), mutual edges by self-joining the k·n-sized edge
    //    relation on the swapped key pair. The oracle replays the whole
    //    graph from scratch with a rank window.
    Q("q198_knn_graph", {
      val cm = Ann.cosMicrosSql("a.embedding", "b.embedding")
      s"""WITH p AS (SELECT a.label, a.vec_id AS qid, b.vec_id AS cid, $cm AS cm
         |           FROM embeddings a JOIN embeddings b
         |             ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY cm DESC, cid) AS rk FROM p),
         |ed AS (SELECT label, qid, cid, cm FROM r WHERE rk <= $KnnK),
         |m AS (SELECT x.label, x.cm FROM ed x JOIN ed y
         |        ON x.qid = y.cid AND x.cid = y.qid WHERE x.qid < x.cid),
         |n AS (SELECT label, count(DISTINCT qid) AS n_nodes,
         |             count(*) AS n_edges FROM ed GROUP BY 1),
         |mm AS (SELECT label, count(*) AS n_mutual,
         |              sum(cm) AS mutual_cm_sum FROM m GROUP BY 1)
         |SELECT n.label, CAST(n_nodes AS BIGINT) AS n_nodes,
         |       CAST(n_edges AS BIGINT) AS n_edges,
         |       CAST(coalesce(mm.n_mutual, 0) AS BIGINT) AS n_mutual,
         |       CAST(coalesce(mm.mutual_cm_sum, 0) AS BIGINT) AS mutual_cm_sum
         |FROM n LEFT JOIN mm USING (label) ORDER BY label""".stripMargin
    }) { (s, d) =>
      knnGraphStats(Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label")),
        KnnK)
    },

    // ── Bloom-pruned decontamination — q65's semantics on the 100 TB
    //    plan: the eval slice's hashed 3-grams are aggregated into ONE
    //    small bloom (Spark's own BloomFilterAggregate, built distributed,
    //    carried as a plan literal), and the corpus's exploded shingles
    //    are pruned MAP-SIDE by bloom_might_contain before any exchange —
    //    so the verify join's shuffle carries only the (rare) survivors
    //    instead of every corpus shingle, which is the entire cost of
    //    exact decontamination at scale. The bloom is correctness-free
    //    machinery: no false negatives, and false positives die in the
    //    exact string-equality join — so the oracle replays plain exact
    //    decontamination and the hash compare proves the bloom path
    //    changes nothing.
    Q("q199_bloom_decontamination",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |              list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |                                           i -> array_to_string(toks[i:i+2], ' '))) AS s
        |       FROM t WHERE len(toks) >= 3),
        |e AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
        |c AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 20),
        |bad AS (SELECT DISTINCT doc_id FROM c JOIN e USING (g))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM bad))
        |            AS BIGINT) AS n_contaminated
        |FROM documents WHERE doc_id >= 20
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      // evalG and bad are BENCHMARK-sized by construction (the eval slice
      // is a fixed 20 docs regardless of corpus scale), but Spark's
      // size estimates derive from the corpus scan, so at 100× the
      // planner flips these joins to sort-merge unless the constant-size
      // side is hinted — the one case where the developer knows more
      // than the estimator (observed in the 100× audit).
      val evalG = broadcast(
        shingled(s, d).filter(col("doc_id") < 20).select("g").distinct())
      val survivors = shingled(s, d).filter(col("doc_id") >= 20)
        .filter(BloomOps.mightContain(lit(evalBloom(s, d)), xxhash64(col("g"))))
      val bad = survivors.join(evalG, "g").select("doc_id").distinct()
      docs(s, d).filter(col("doc_id") >= 20)
        .join(broadcast(bad.withColumn("hit", lit(1))), Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(col("hit")).cast("long").as("n_contaminated"))
        .orderBy("lang")
    },

    // ── Bloom false-positive-rate guard — the q124/q125 "verify the
    //    approximation against the exact answer IN-PLAN" pattern applied
    //    to q199's decontamination bloom (VERDICT r10 item 6): the
    //    measured FP rate is emitted next to the exact verify counts.
    //    Probes = the corpus-side distinct shingles NOT in the eval set
    //    (the exact join supplies ground truth); measured FPP = bloom
    //    positives among them / their count. Two sizings: the PRODUCTION
    //    64 KiB bloom, whose k≈89 hash functions put the theoretical FPP
    //    around 1e-40 at the eval set's cardinality (the verdict gates it
    //    at ≤0.1%), and a deliberately UNDERSIZED 1024-bit stress bloom
    //    (k=1), whose measured rate must sit within ±0.05 of the textbook
    //    1−e^(−n/m) — the non-vacuous half proving the measurement can
    //    fail. The bloom-dependent numbers live only in the VERDICTS
    //    (booleans the oracle expects uniformly true, q124's inversion);
    //    every emitted count is exact and SQL-replayed. The O(1)-row
    //    .head calls are the sanctioned scalar-bound class: the bloom is
    //    a plan literal and the two probe aggregates return one row each.
    Q("q218_bloom_fpp_guard",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |              list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |                                           i -> array_to_string(toks[i:i+2], ' '))) AS s
        |       FROM t WHERE len(toks) >= 3),
        |e AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 20),
        |c AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id >= 20),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus,
        |             CAST(count(*) FILTER (WHERE g IN (SELECT g FROM e)) AS BIGINT) AS n_hits
        |      FROM c),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_eval FROM e)
        |SELECT v.label, CAST(v.bits AS BIGINT) AS num_bits, ne.n_eval AS n_eval_grams,
        |       x.n_corpus - x.n_hits AS n_negatives, x.n_hits AS n_true_hits,
        |       true AS fpp_ok
        |FROM (VALUES ('production', 524288), ('undersized_stress', 1024)) v(label, bits), x, ne
        |ORDER BY v.label""".stripMargin) { (s, d) =>
      val sh = shingled(s, d)
      // eval grams checkpointed once (a benchmark-sized distinct): the
      // membership join, BOTH bloom builds, and the n_eval count read it —
      // unmaterialized, each re-derived the full corpus shingle explode
      // (ProfileQ r19: 4 redundant shingle passes inside one call).
      val evalG = sh.filter(col("doc_id") < 20).select("g").distinct()
        .localCheckpoint()
      val corpusG = sh.filter(col("doc_id") >= 20).select("g").distinct()
      // per corpus gram: exact membership (ground truth) once, reused by
      // both sizings' probes
      val probes = corpusG
        .join(broadcast(evalG.withColumn("inEval", lit(1))), Seq("g"), "left")
        .select(col("g"), col("inEval").isNotNull.as("hit"))
        .localCheckpoint() // two sizings probe it; keep the scan single
      // ONE eval-side pass: both sizings' blooms are independent bounded
      // aggregates over the same rows, so they and the gram count ride a
      // single job (bloomAgg is add-commutative — the built filter is
      // row-order independent). Previously 3 jobs, each a full evalG scan.
      val sizings = Seq(("production", 1L << 19), ("undersized_stress", 1L << 10))
      val eRow = evalG.agg(
        BloomOps.bloomAgg(xxhash64(col("g")), DecontamEstItems, sizings(0)._2).as("bf0"),
        BloomOps.bloomAgg(xxhash64(col("g")), DecontamEstItems, sizings(1)._2).as("bf1"),
        count(lit(1)).as("n_eval")).head
      val bfs = Seq(eRow.getAs[Array[Byte]]("bf0"), eRow.getAs[Array[Byte]]("bf1"))
      val nEval = eRow.getLong(2)
      // ONE probe-side pass: totals, true hits, and both sizings' false-
      // positive counts as four aggregates of the checkpointed probe scan
      // (previously 3 jobs: base + one filtered count per sizing).
      val pRow = probes.agg(
        count(lit(1)).as("n"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("hits"),
        sum(when(!col("hit") &&
          BloomOps.mightContain(lit(bfs(0)), xxhash64(col("g"))), 1L)
          .otherwise(0L)).as("fp0"),
        sum(when(!col("hit") &&
          BloomOps.mightContain(lit(bfs(1)), xxhash64(col("g"))), 1L)
          .otherwise(0L)).as("fp1")).head
      val (nCorpus, nHits) = (pRow.getLong(0), pRow.getLong(1))
      val nNeg = nCorpus - nHits
      val out = sizings.zipWithIndex.map { case ((label, bits), i) =>
        val fp = pRow.getLong(2 + i)
        val measured = fp.toDouble / nNeg
        // k as Spark sizes it: max(1, round(m/n·ln2)) with n = estItems
        val k = math.max(1L,
          math.round(bits.toDouble / DecontamEstItems * math.log(2.0)))
        val theo = math.pow(1.0 - math.exp(-k.toDouble * nEval / bits), k.toDouble)
        val ok =
          if (label == "production") measured <= 0.001
          else math.abs(measured - theo) <= 0.05
        (label, bits, nEval, nNeg, nHits, ok)
      }
      graft.etl.Ckpt.release(probes)
      graft.etl.Ckpt.release(evalG)
      import s.implicits._
      out.toDF("label", "num_bits", "n_eval_grams", "n_negatives",
          "n_true_hits", "fpp_ok")
        .orderBy("label")
    },

    // ── Token-budget mixture plan: the pre-training planning step q171's
    //    doc-count sampler doesn't cover — weights over TOKEN mass, and
    //    the output is the training recipe itself: per-source sampling
    //    weight and the number of epochs of that source consumed when a
    //    fixed token budget (half the corpus here) is drawn at
    //    temperature 0.5. epochs > 1e6 micro marks a source the mixture
    //    UPSAMPLES — the known failure mode temperature mixing must
    //    surface before training starts. Plan: one hash-agg on source
    //    (map-side partial absorbs the token explosion... actually no
    //    explosion at all: size(split()) is a map-side expression), a
    //    single-row total cross-joined back (documented-bound BNLJ, the
    //    q171 family). Arithmetic: IEEE sqrt micro-rounded, then one
    //    long→double divide + floor per source, identical in DuckDB.
    Q("q200_token_budget_plan",
      """WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(round(1e6 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wi
        |      FROM t),
        |tot AS (SELECT CAST(sum(wi) AS BIGINT) AS sw,
        |               CAST(sum(n_tokens) AS BIGINT) AS total FROM w)
        |SELECT source, n_docs, n_tokens,
        |       (1000000 * wi) // sw AS weight_ppm,
        |       CAST(floor(1e6 * (CAST((total // 2) * wi AS DOUBLE)
        |                         / CAST(sw * n_tokens AS DOUBLE))) AS BIGINT) AS epochs_micro
        |FROM w CROSS JOIN tot ORDER BY source""".stripMargin) { (s, d) =>
      val t = docs(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text")))).cast("long").as("n_tokens"))
      val w = t.withColumn("wi",
        round(lit(1e6) * sqrt(col("n_tokens").cast("double"))).cast("long"))
      val tot = w.agg(sum("wi").cast("long").as("sw"),
        sum("n_tokens").cast("long").as("total"))
      w.crossJoin(tot)
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("(1000000 * wi) div sw").as("weight_ppm"),
          floor(lit(1e6) * ((expr("total div 2") * col("wi")).cast("double")
            / (col("sw") * col("n_tokens")).cast("double"))).cast("long").as("epochs_micro"))
        .orderBy("source")
    },

    // ── Point-in-time (temporal) join: each purchase enriched with the
    //    SCD2 dimension version valid AT ITS TIMESTAMP — q99's version
    //    build (here over the user's NON-purchase activity, so the state
    //    a purchase lands in is its behavioral context, not itself)
    //    composed with q47's as-of merge operator: the classic "join the
    //    fact to the dimension as it was" warehouse op that a plain
    //    equi-join (latest version) silently gets wrong. The as-of
    //    formulation is ONE shuffle on user_id and a linear per-key
    //    window — never the quadratic valid_from <= ts range join. Equal
    //    timestamps resolve version-before-fact, same-instant version
    //    ties keep the lowest event_id, and a purchase before any
    //    activity groups under '(none)' — all replayed by the oracle's
    //    ASOF JOIN over the identically-deduped version relation.
    Q("q201_scd2_point_in_time",
      """WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
        |o AS (SELECT user_id, ts, event_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS prev
        |      FROM e WHERE event_type <> 'purchase'),
        |v0 AS (SELECT user_id, ts, event_id, event_type AS state
        |       FROM o WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, ts, event_id, state FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                     ORDER BY event_id) AS rn
        |        FROM v0)
        |      WHERE rn = 1),
        |p AS (SELECT user_id, ts, event_id, value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT coalesce(j.state, '(none)') AS state,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
        |       CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_users
        |FROM (SELECT p.user_id, p.value, v.state
        |      FROM p ASOF LEFT JOIN v
        |        ON p.user_id = v.user_id AND p.ts >= v.ts) j
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val versions = e.filter(col("event_type") =!= "purchase")
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("state"))
      val dim = graft.operators.AsOfJoin.dedupRight(
        versions, key = "user_id", ts = "ts", orderCol = "event_id")
      val facts = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.AsOfJoin.asof(facts, dim,
        key = "user_id", ts = "ts", leftOrder = "event_id",
        rightVals = Seq("state"))
        .groupBy(coalesce(col("asof_state"), lit("(none)")).as("state"))
        .agg(count(lit(1)).as("n_purchases"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"),
          countDistinct("user_id").as("n_users"))
        .orderBy("state")
    },

    // ── MMR diversity reranking — the serving-path step between q39's
    //    relevance top-k and the response: greedily select MmrK of the
    //    top-MmrCand candidates maximizing 7·relevance − 3·max-sim-to-
    //    already-selected (λ = 0.7 kept as exact integers — the monotone
    //    scale factor 10 is never divided out, so no rounding exists to
    //    diverge). Everything is bounded per query: candidates MmrCand,
    //    pairwise sims MmrCand², MmrK − 1 joined iterations over those
    //    tiny relations — at 100 TB reranking cost scales with query
    //    count alone, embarrassingly parallel, while the only corpus-
    //    sized stage (relevance top-k) rides the bounded-state reducer.
    //    The oracle replays the greedy chain step for step as CTEs, so
    //    the selection ORDER — not just the set — is verified.
    Q("q203_mmr_rerank", {
      val qcm = Ann.cosMicrosSql("q.qv", "e.embedding")
      val pcm = Ann.cosMicrosSql("ea.embedding", "eb.embedding")
      val steps = (2 to MmrK).map { t =>
        s"""pick$t AS (
           |  SELECT qid, cid, r, $t AS step FROM (
           |    SELECT c.qid, c.cid, c.r,
           |           row_number() OVER (PARTITION BY c.qid
           |             ORDER BY 7 * c.r - 3 * m.maxsim DESC, c.cid) AS rk
           |    FROM s0 c
           |    JOIN (SELECT p.qid, p.ca AS cid, max(p.pm) AS maxsim
           |          FROM pair p JOIN sel${t - 1} s
           |            ON p.qid = s.qid AND p.cb = s.cid
           |          GROUP BY 1, 2) m
           |      ON c.qid = m.qid AND c.cid = m.cid
           |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s2
           |                      WHERE s2.qid = c.qid AND s2.cid = c.cid))
           |  WHERE rk = 1),
           |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id < 5),
         |sc AS (SELECT q.qid, e.vec_id AS cid, e.embedding, $qcm AS r
         |       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
         |s0 AS (SELECT qid, cid, r FROM (
         |         SELECT *, row_number() OVER (PARTITION BY qid
         |                                      ORDER BY r DESC, cid) AS rk
         |         FROM sc)
         |       WHERE rk <= $MmrCand),
         |pair AS (SELECT a.qid, a.cid AS ca, b.cid AS cb, $pcm AS pm
         |         FROM s0 a JOIN s0 b ON a.qid = b.qid AND a.cid <> b.cid
         |         JOIN embeddings ea ON ea.vec_id = a.cid
         |         JOIN embeddings eb ON eb.vec_id = b.cid),
         |sel1 AS (SELECT qid, cid, r, 1 AS step FROM (
         |           SELECT qid, cid, r, row_number() OVER (PARTITION BY qid
         |                                ORDER BY r DESC, cid) AS rk FROM s0)
         |         WHERE rk = 1),
         |$steps
         |SELECT qid, CAST(step AS INTEGER) AS step, cid, r / 1e6 AS relevance
         |FROM sel$MmrK ORDER BY qid, step""".stripMargin
    }) { (s, d) =>
      mmrRerank(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        qBound = 5, k = MmrK, nCand = MmrCand)
    },

    // ── Cross-split verbatim-overlap depth: q185's maximal-span machinery
    //    pointed ACROSS the train/eval boundary — per train document, the
    //    spans (≥16 tokens) that appear verbatim anywhere in the eval
    //    slice, reported as count / max length / total leaked tokens.
    //    q65/q199 flag that contamination EXISTS (any shared 3-gram);
    //    this measures how DEEP the worst leak runs, which is what a
    //    span-masking (rather than doc-dropping) policy needs. Scale
    //    shape per Dedup.crossSpans: the corpus is touched once map-side
    //    by the O(L) rolling kernel, the eval anchor/fingerprint sets
    //    are benchmark-sized broadcasts, and only anchor HITS shuffle.
    //    The oracle recomputes from per-position md5 windows, so the
    //    rolling anchor's recall, the verify join, and the island merge
    //    are all independently checked.
    Q("q204_cross_split_spans",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |w AS (SELECT doc_id, p,
         |             md5(array_to_string(toks[p:p+$XN-1], ' ')) AS fp
         |      FROM t, unnest(range(1, len(toks) - $XN + 2)) AS u(p)
         |      WHERE len(toks) >= $XN),
         |e AS (SELECT DISTINCT fp FROM w WHERE doc_id < 20),
         |r AS (SELECT doc_id, p FROM w
         |      WHERE doc_id >= 20 AND fp IN (SELECT fp FROM e)),
         |g AS (SELECT doc_id, p,
         |             p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
         |      FROM r),
         |sp AS (SELECT doc_id, max(p) - min(p) + $XN AS span_len
         |       FROM g GROUP BY doc_id, grp)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |       CAST(max(span_len) AS BIGINT) AS max_span_len,
         |       CAST(sum(span_len) AS BIGINT) AS leaked_tokens
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.llm.Dedup.crossSpans(docs(s, d), XN, evalBound = 20L)
        .orderBy("doc_id")
    },

    // ── Length-bucketed batching audit — the dynamic-batching planner's
    //    input: documents assigned to power-of-two token buckets
    //    (16/32/64/128, a CASE ladder — no float log2 whose rounding
    //    could diverge between engines), with the padding waste a
    //    pad-to-bucket batcher pays per bucket. The complement of q177:
    //    packing eliminates padding by construction, this measures what
    //    NOT packing costs, which is the number that justifies the
    //    packer. Map-side expression + one hash-agg; at 100 TB the
    //    histogram is the bucket count wide.
    Q("q205_length_buckets",
      """WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
        |b AS (SELECT n, CAST(CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |                          WHEN n <= 64 THEN 64 ELSE 128 END AS BIGINT) AS bucket
        |      FROM t)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS sum_tokens,
        |       CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
        |       CAST((1000000 * (count(*) * bucket - sum(n))) // (count(*) * bucket) AS BIGINT) AS waste_ppm
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .withColumn("bucket",
          when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
            .when(col("n") <= 64, 64L).otherwise(128L))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n").cast("long").as("sum_tokens"))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"),
          (col("n_docs") * col("bucket")).as("padded_tokens"),
          expr("(1000000 * (n_docs * bucket - sum_tokens)) div (n_docs * bucket)")
            .as("waste_ppm"))
        .orderBy("bucket")
    },

    // ── Content-defined chunking (CDC) dedup: chunk boundaries cut where
    //    the md5 of the trailing 8-token window hits `% 8 == 0` — so an
    //    insertion near a document's head only perturbs fingerprints
    //    until the next boundary, where fixed-width chunking (q181)
    //    shifts EVERY downstream chunk and loses all dedup. The
    //    storage-dedup classic (Rabin/FastCDC) in token space, with the
    //    boundary predicate on md5 hex — engine-portable, so the oracle
    //    replays boundaries, chunking, and the keep-first policy exactly.
    //    Plan: map-side boundary flags, one per-doc window for the
    //    running chunk id, one fingerprint-key shuffle for the dedup —
    //    q181's scale shape with content-defined geometry.
    Q("q206_cdc_chunk_dedup",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |pos AS (SELECT doc_id, lang, toks[p] AS tok, p,
        |               CASE WHEN p >= 8 AND
        |                 ('0x' || substr(md5(array_to_string(toks[p-7:p], ' ')), 1, 8))::BIGINT % 8 = 0
        |               THEN 1 ELSE 0 END AS brk
        |        FROM (SELECT doc_id, lang, toks,
        |                     unnest(range(1, len(toks) + 1)) AS p FROM t)),
        |cid AS (SELECT doc_id, lang, tok, p,
        |               coalesce(sum(brk) OVER (PARTITION BY doc_id ORDER BY p
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ch
        |        FROM pos),
        |ck AS (SELECT doc_id, lang, ch,
        |              count(*) AS clen,
        |              md5(string_agg(tok, ' ' ORDER BY p)) AS fp
        |       FROM cid GROUP BY doc_id, lang, ch),
        |r AS (SELECT lang, clen,
        |             row_number() OVER (PARTITION BY fp ORDER BY doc_id, ch) AS rn
        |      FROM ck)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |       CAST(coalesce(sum(clen) FILTER (WHERE rn > 1), 0) AS BIGINT) AS tokens_removed
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      cdcChunkDedup(fanned(s, d))
    }
  )

  /** The q206 operator over any (doc_id, lang, text) relation. */
  def cdcChunkDedup(docsDf: DataFrame): DataFrame = {
    val pos = docsDf
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("toks"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("lang"), col("toks"), col("tok"),
        (col("p0") + 1).as("p"))
    val brk = when(col("p") >= 8 &&
        expr("CAST(conv(substr(md5(array_join(slice(toks, p - 7, 8), ' ')), 1, 8), 16, 10) AS BIGINT) % 8 = 0"),
      1).otherwise(0)
    val w = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = pos.withColumn("brk", brk)
      .withColumn("ch", coalesce(sum(col("brk")).over(w), lit(0)))
      .groupBy(col("doc_id"), col("lang"), col("ch"))
      .agg(count(lit(1)).as("clen"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ")).as("fp"))
    chunks
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id", "ch")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("rn") === 1, 1)).cast("long").as("n_kept"),
        coalesce(sum(when(col("rn") > 1, col("clen"))), lit(0L))
          .cast("long").as("tokens_removed"))
      .orderBy("lang")
  }

  /** The q203 operator over any (id, vec) relation: greedy MMR selection
    * of `k` of the top-`nCand` relevance candidates for each query
    * (id < qBound), maximizing 7·relevance − 3·max-sim-to-selected at
    * each step, ties by candidate id. Output rows carry the selection
    * step, so order — not just membership — is observable. */
  def mmrRerank(e: DataFrame, qBound: Int, k: Int, nCand: Int): DataFrame = {
    val q = e.filter(col("id") < qBound).select(col("id").as("qid"), col("vec").as("qv"))
    val scored = e.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid").as("key"), col("id"),
        Ann.cosMicros(col("qv"), col("vec")).as("score"))
    // Eager leaf plans for the two relations every greedy step re-reads:
    // without the checkpoint each of the k−1 iterations re-derives the
    // corpus-sized relevance scan through its whole lineage (the 100×
    // audit saw the composed plan reach ~330 file scans). Both are
    // (queries × nCand)-bounded — blocks swept by the harness (see q105).
    // Both leaves are checkpointed ALREADY HASH-PARTITIONED on qid: every
    // greedy step windows/aggregates per qid, and a leaf that carries the
    // right partitioning serves all k−1 iterations without a single
    // exchange (the unpartitioned variant shuffled cand for the window and
    // pairs for the max-sim aggregate every round).
    val cand = Ann.topKPerKey(scored, nCand)
      .select(col("key").as("qid"), col("id").as("cid"),
        round(col("cos") * 1e6).cast("long").as("r"))
      .repartition(col("qid"))
      .localCheckpoint()
    val withVec = (n: String) => e.select(col("id").as(n + "id"), col("vec").as(n + "v"))
    val pairs = cand.select(col("qid"), col("cid").as("ca"))
      .join(cand.select(col("qid"), col("cid").as("cb")), "qid")
      .filter(col("ca") =!= col("cb"))
      .join(withVec("a"), col("ca") === col("aid"))
      .join(withVec("b"), col("cb") === col("bid"))
      .select(col("qid"), col("ca"), col("cb"),
        Ann.cosMicros(col("av"), col("bv")).as("pm"))
      .repartition(col("qid"))
      .localCheckpoint()
    val byQ = Window.partitionBy("qid")
    var sel = cand
      .withColumn("rk", row_number().over(byQ.orderBy(col("r").desc, col("cid"))))
      .filter(col("rk") === 1).drop("rk")
      .withColumn("step", lit(1))
    for (t <- 2 to k) {
      // sel and maxsim are (queries × k)-bounded — broadcast them
      // explicitly: checkpointed leaves carry no size statistics, so the
      // planner's default for these joins was sort-merge with an exchange
      // + sort per side, per iteration.
      val maxsim = pairs
        .join(broadcast(sel.select(col("qid"), col("cid").as("cb"))), Seq("qid", "cb"))
        .groupBy(col("qid"), col("ca").as("cid"))
        .agg(max("pm").as("maxsim"))
      val pick = cand
        .join(broadcast(sel.select("qid", "cid")), Seq("qid", "cid"), "left_anti")
        .join(broadcast(maxsim), Seq("qid", "cid"))
        .withColumn("rk", row_number().over(
          byQ.orderBy((lit(7) * col("r") - lit(3) * col("maxsim")).desc, col("cid"))))
        .filter(col("rk") === 1).select("qid", "cid", "r")
        .withColumn("step", lit(t))
      // each step references sel twice (anti-join + maxsim), so an
      // uncheckpointed chain doubles the subtree per iteration — k·q rows
      // pinned eagerly keeps the plan linear in k.
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("qid"), col("step").cast("int").as("step"), col("cid"),
      (col("r") / 1e6).as("relevance"))
      .orderBy("qid", "step")
  }
}
