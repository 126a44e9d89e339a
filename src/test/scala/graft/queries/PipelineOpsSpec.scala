package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 pipeline operators: line-dedup-with-reassembly semantics on
  * controlled inputs, and byte-fidelity of the ORC / JSON-lines stage
  * hops. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("line dedup removes a repeated line from EVERY document, not keep-first") {
    // 10-token boilerplate line shared by docs 1 and 2; each also has a
    // unique tail shorter than a full line (the boundary remainder).
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val d = docsOf(
      (1L, "en", s"$boiler one two three"),
      (2L, "en", s"$boiler four five"),
      (3L, "en", "alpha beta gamma"))
    val out = PipelineOps.lineDedupRebuild(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // Both copies of the boilerplate line are dropped (MassiveText policy:
    // no survivor), each doc keeps only its unique remainder line.
    assert(out(1L) == ((2L, 1L, 10L, md5Hex("one two three"))))
    assert(out(2L) == ((2L, 1L, 10L, md5Hex("four five"))))
    // A doc with no repeated lines is rebuilt verbatim.
    assert(out(3L) == ((1L, 1L, 0L, md5Hex("alpha beta gamma"))))
  }

  test("line dedup: a doc made entirely of boilerplate rebuilds to the empty text") {
    val boiler = (1 to 10).map(i => s"x$i").mkString(" ")
    val d = docsOf((1L, "en", boiler), (2L, "en", boiler))
    val out = PipelineOps.lineDedupRebuild(d).collect()
    assert(out.forall(_.getLong(3) == 0L), "no line survives")
    assert(out.forall(_.getString(5) == md5Hex("")),
      "fully-deduped docs hash the empty rebuild, not NULL")
  }

  test("line dedup catches a repeat at a different document position (alignment-free policy check)") {
    // The same 10-token line appears as line 0 of doc 1 and line 1 of
    // doc 2 — line identity is the TEXT, not the (position, text) pair.
    val boiler = (1 to 10).map(i => s"y$i").mkString(" ")
    val pad = (1 to 10).map(i => s"p$i").mkString(" ")
    val d = docsOf(
      (1L, "en", s"$boiler tail one two"),
      (2L, "en", s"$pad $boiler end"))
    val out = PipelineOps.lineDedupRebuild(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getString(5))).toMap
    assert(out(1L) == ((10L, md5Hex("tail one two"))))
    assert(out(2L) == ((10L, md5Hex(s"$pad end"))))
  }

  test("ORC hop preserves rows, cents, and timestamp micros") {
    val dir = graft.etl.Scratch.tempDir("spec-orc").toString
    val src = graft.model.Tables.lineitem(spark, TestSpark.Sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)), sum(round(col("l_extendedprice") * 100).cast("long")),
      max(unix_micros(col("l_shipdate").cast("timestamp"))),
      min(unix_micros(col("l_shipdate").cast("timestamp")))).collect()(0)
    assert(sig(back) == sig(src))
  }

  test("JSON-lines hop is byte-faithful on hostile text (quotes, backslash, unicode, tab)") {
    val hostile = "he said \"hi\" \\ path\tc:\\x ünïcode é end"
    val d = Seq((1L, hostile, "en", "src0", hostile.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.etl.Scratch.tempDir("spec-jsonl").toString
    d.write.mode("overwrite").json(dir)
    val back = spark.read.schema(graft.model.Schemas.documents).json(dir)
      .collect()(0)
    assert(back.getString(1) == hostile, "text must survive the JSON hop unchanged")
  }

  test("knn graph: mutual pairs are reciprocated top-k edges, cells never mix") {
    // One cell with a tight pair (v1≈v2) plus two far points; k=1 so the
    // only mutual pair is (1,2). A second cell is a copy shifted in id —
    // its stats must come out identical and separate.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1, 0, 0), 0), (2L, v(0.99, 0.14, 0), 0),
      (3L, v(0, 1, 0), 0), (4L, v(0, 0, 1), 0),
      (11L, v(1, 0, 0), 1), (12L, v(0.99, 0.14, 0), 1),
      (13L, v(0, 1, 0), 1), (14L, v(0, 0, 1), 1))
    val e = rows.toDF("id", "vec", "label")
    val out = PipelineOps.knnGraphStats(e, 1).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 4 nodes, 4 directed edges (k=1 each); v1↔v2 is the only mutual
    // pair; v3 and v4 point INTO the tight pair without reciprocation.
    assert(out(0)._1 == 4L && out(0)._2 == 4L && out(0)._3 == 1L)
    assert(out(0) == out(1), "identical cells must produce identical stats")
    // The mutual cosine is cos(v1,v2) in micros, symmetric by construction.
    val expected = math.round(1e6 * (1 * 0.99f + 0 * 0.14f) /
      (1.0 * math.sqrt(0.99f * 0.99f + 0.14f * 0.14f)))
    assert(out(0)._4 == expected, s"got ${out(0)._4}, want $expected")
  }

  test("knn quantizer schedule: label-only at every oracle scale, cells ∝ corpus beyond") {
    // The lshParams-style determinism pin: every SF the oracle ever runs
    // (embeddings ≤ 2000 rows at sf0.1, and the sf0.01 gate far below)
    // MUST resolve to one cell — the label-only form the static SQL
    // replays — while 100×-scale corpora get proportionally many cells,
    // bounding per-cell population (the r11 666×-at-100× fix).
    assert(PipelineOps.knnQuantCells(60) == 1)
    assert(PipelineOps.knnQuantCells(2000) == 1)
    assert(PipelineOps.knnQuantCells(PipelineOps.KnnQuantTarget) == 1)
    assert(PipelineOps.knnQuantCells(PipelineOps.KnnQuantTarget + 1) == 2)
    assert(PipelineOps.knnQuantCells(200000) == 50,
      "100×-audit corpus (200k vectors) routes through ~50 trained cells")
    assert(PipelineOps.knnQuantCells(Long.MaxValue) == 4096, "cell-count cap")
  }

  test("knn graph via quantizer routing: node accounting intact, per-node degree bounded") {
    // Exercise the multi-cell path (Lloyd training + assignment + the
    // (label × qcell) composed join) at test scale through the explicit
    // seam. Exactness of edges within a cell is knnGraphStats's contract;
    // here we pin the structural invariants routing must preserve: every
    // node appears exactly once across label cells, each contributes ≤ k
    // directed edges, and mutual pairs never exceed edges/2.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      (i, v(rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble()), (i % 2).toInt)
    }
    val e = rows.toDF("id", "vec", "label")
    val out = PipelineOps.knnGraphStats(e, 2, cells = 4).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(0, 1))
    assert(out.values.map(_._1).sum == 60L, "every vector is a node in exactly one label cell")
    out.foreach { case (lbl, (nodes, edges, mutual)) =>
      assert(edges <= nodes * 2, s"label $lbl: degree bound k=2 violated")
      assert(mutual * 2 <= edges, s"label $lbl: mutual pairs exceed edge pairs")
    }
    // Non-zero-based id space: the quantizer seeding is rank-based, so an
    // order-preserving shift routes identically and the graph stats are
    // unchanged (the pre-fix literal `id < cells` seed would have trained
    // an EMPTY codebook here and silently returned empty stats).
    val shifted = PipelineOps.knnGraphStats(
      e.withColumn("id", col("id") + 500000L), 2, cells = 4).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(shifted == out, "id-shifted corpus must produce identical graph stats")
  }

  test("bloom: no false negatives, and real pruning on disjoint probes") {
    import graft.functions.BloomOps
    val n = 5000L
    val bloom = spark.range(n)
      .agg(BloomOps.bloomAgg(xxhash64(col("id")), 1L << 13, 1L << 19).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // Every inserted key must pass (bloom contract: zero false negatives).
    val inHits = spark.range(n)
      .filter(BloomOps.mightContain(lit(bloom), xxhash64(col("id"))))
      .count()
    assert(inHits == n, s"false negatives: only $inHits of $n inserted keys pass")
    // Disjoint probes mostly fail — the map-side prune is real.
    val outHits = spark.range(1000000L, 1000000L + n)
      .filter(BloomOps.mightContain(lit(bloom), xxhash64(col("id"))))
      .count()
    assert(outHits < n / 20,
      s"bloom passed $outHits of $n disjoint probes — no pruning power at this sizing")
  }

  test("token budget plan: drawn tokens sum to the budget, smaller sources upsample harder") {
    val rows = graft.SparkEntry.queries("q200_token_budget_plan")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = rows.map(_._2).sum
    // Σ epochs_i · n_tokens_i must reconstruct the token budget (total/2)
    // up to the per-source floor rounding (< 1 token each).
    val drawn = rows.map { case (_, nt, _, em) => em.toDouble * nt / 1e6 }.sum
    assert(math.abs(drawn - total / 2) < rows.length + 1,
      s"drawn $drawn vs budget ${total / 2}")
    // Temperature 0.5 flattens the mixture: epochs (upsampling rate) must
    // be anti-monotone in source size.
    val epochsBySize = rows.sortBy(_._2).map(_._4)
    assert(epochsBySize.sliding(2).forall {
      case Array(small, large) => small >= large
      case _                   => true
    }, s"epochs must be anti-monotone in source size: ${epochsBySize.mkString(",")}")
  }

  test("suppression split: bloom-clean union verified-candidates equals the plain anti-join") {
    import graft.functions.BloomOps
    val rows = (0L until 3000L).map(i => (i % 211, i))
    val data = rows.toDF("user_id", "event_id")
    val ledger = spark.range(50).select(col("id").as("user_id"))
    val bloom = ledger
      .agg(BloomOps.bloomAgg(xxhash64(col("user_id")), 1L << 12, 1L << 17).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val might = BloomOps.mightContain(lit(bloom), xxhash64(col("user_id")))
    val split = data.filter(!might).unionByName(
      data.filter(might)
        .join(ledger.withColumn("__supp", lit(1)), Seq("user_id"), "left_outer")
        .filter(col("__supp").isNull).drop("__supp"))
    val plain = data.join(ledger, Seq("user_id"), "left_anti")
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty,
      "the bloom short-circuit must not change which rows survive")
  }

  test("MMR reranks a near-duplicate below a less-relevant but diverse candidate") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // query 0; candidates 10 and 11 are EXACT duplicates (sim = 1.0, the
    // full λ penalty), 12 is equally relevant but mirrored — hand-checked:
    // 7·r − 3·sim gives 12 ≈ 4.45e6 vs 11 ≈ 3.29e6 at step 2.
    val e = Seq(
      (0L, v(1, 0, 0)),
      (10L, v(0.9, 0.44, 0)), (11L, v(0.9, 0.44, 0)),
      (12L, v(0.9, -0.44, 0))).toDF("id", "vec")
    val sel = PipelineOps.mmrRerank(e, qBound = 1, k = 3, nCand = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(sel(1) == 10L, "step 1 is pure relevance")
    assert(sel(2) == 12L, "step 2 must prefer the diverse candidate over the near-dup")
    assert(sel(3) == 11L, "the near-dup still lands once diversity is exhausted")
  }

  test("CDC chunking survives a head insertion that destroys fixed-width chunk dedup") {
    val base = (0 until 96).map(i => s"w$i")
    val shifted = base.take(2) ++ Seq("INSERTED") ++ base.drop(2)
    val d = Seq((1L, "en", base.mkString(" ")), (2L, "en", shifted.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // fixed 64-token chunks: the one-token shift leaves zero equal chunks
    val fixedFps = d.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(split(text, ' ')), 64), st -> md5(array_join(slice(split(text, ' '), st, 64), ' ')))")).as("fp"))
    val fixedShared = fixedFps.alias("a").join(fixedFps.alias("b"),
      col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id")).count()
    assert(fixedShared == 0L, "fixed chunks must lose all dedup after the shift")
    // content-defined chunks realign after the first post-edit boundary
    val out = PipelineOps.cdcChunkDedup(d).collect()(0)
    assert(out.getLong(3) > 0L,
      s"CDC must still find shared chunks (tokens_removed > 0): $out")
  }

  test("BPE fertility sits between 1 piece/word and the character baseline") {
    val rows = graft.SparkEntry.queries("q208_bpe_fertility")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    // character-level fertility baseline: pieces/word = chars/word
    val charPpm = graft.model.Tables.documents(spark, TestSpark.Sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg((sum(length(col("w"))) * 1000000L / count(lit(1))).cast("long"))
      .collect()(0).getLong(0)
    rows.foreach { case (lang, _, ppm) =>
      assert(ppm >= 1000000L, s"$lang fertility below 1 piece/word: $ppm")
      assert(ppm < charPpm,
        s"$lang: trained tokenizer must beat the character baseline ($ppm vs $charPpm)")
    }
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}
