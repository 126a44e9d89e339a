package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VecDot

/** vec_dot expression semantics + ANN reductions vs independent
  * formulations. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = {
    graft.model.Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
      .persist()
  }

  /** Mean IVF recall@10 vs the exact baseline, with cells from a Lloyd
    * run of `iters` iterations (0 = untrained seed centroids). */
  private def meanRecall(iters: Int): Double = {
    val vecs = Ann.quantized(corpus).withColumn("g", lit(0L)).select("g", "id", "x")
    val cents = Ann.lloyd(vecs, k = 10, iters = iters)
    val cells = Ann.assignCells(vecs, cents).select(col("id"), col("cell"))
    val c2 = corpus.select("id", "vec").join(cells, "id")
    val qs = c2.filter(col("id") < 5).select("id", "vec")
    val bt = Ann.bruteForceTopK(c2, qs, 10).select("qid", "vec_id")
    val it = Ann.ivfTopK(c2, qs, cellCol = "cell", dim = 64, nprobe = 2, k = 10)
      .select(col("qid"), col("vec_id")).withColumn("hit", lit(1))
    bt.join(it, Seq("qid", "vec_id"), "left")
      .agg((count(col("hit")).cast("double") / count(lit(1))).as("r"))
      .head.getDouble(0)
  }

  test("Lloyd training measurably improves the IVF index vs untrained seeds") {
    // The synthetic embeddings are UNCLUSTERED (near-uniform): measured
    // here, untrained seed cells are already balanced (max cell ≈ 12% of
    // corpus) and recall@10 at nprobe=2 is seed-insensitive (0.90 vs
    // 0.84-0.88 across 0/1/3/5 iterations) — on structureless data a
    // query's true neighbors scatter across cells no matter where the
    // centroids sit, so recall cannot register the training. What DOES
    // register it is the objective Lloyd descends: total integer
    // quantization error. Training must cut it strictly and
    // substantially (measured: 796e12 → 460e12, −42%), monotonically
    // per Lloyd's guarantee, while recall stays within noise of the
    // seed baseline. On clustered production embeddings the same SSE
    // drop is what turns into the recall win.
    def vecsOf = Ann.quantized(corpus).withColumn("g", lit(0L)).select("g", "id", "x")
    val sse0 = Ann.sseOf(vecsOf, Ann.lloyd(vecsOf, k = 10, iters = 0))
    val sse1 = Ann.sseOf(vecsOf, Ann.lloyd(vecsOf, k = 10, iters = 1))
    val sse3 = Ann.sseOf(vecsOf, Ann.lloyd(vecsOf, k = 10, iters = 3))
    info(s"SSE: seeds=$sse0, 1 iter=$sse1, 3 iters=$sse3")
    assert(sse1 < (sse0 * 0.75).toLong, "one Lloyd iteration must cut quantization error substantially")
    assert(sse3 <= sse1, "Lloyd's objective is non-increasing in the iteration count")
    val untrained = meanRecall(0)
    val trained = meanRecall(3)
    info(f"recall@10: untrained seeds = $untrained%.3f, 3 Lloyd iters = $trained%.3f")
    assert(trained >= untrained - 0.1,
      "trained-cell recall must stay within noise of the seed baseline on unclustered data")
  }

  test("lloyd seeds by rank: a sparse non-zero-based id space still trains a full codebook") {
    // The literal predicate `id < k` would select NOTHING here (every id
    // ≥ 100000) — an empty codebook whose downstream inner joins silently
    // drop the whole corpus. Rank-based seeding picks the k lowest ids
    // present; because the shift is order-preserving, the seeds are the
    // SAME vectors as the dense run and the trained centroids must come
    // out identical.
    val vecs = Ann.quantized(corpus).withColumn("g", lit(0L)).select("g", "id", "x")
    val shifted = vecs.withColumn("id", col("id") * 7 + 100000L)
    val dense = Ann.lloyd(vecs, k = 10, iters = 2).collect()
    val sparse = Ann.lloyd(shifted, k = 10, iters = 2).collect()
    assert(sparse.length == 10, "k cells must seed despite no id < k")
    def sig(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getSeq[Long](2), r.getLong(3))).toSet
    assert(sig(sparse) == sig(dense),
      "order-preserving id shift must not change the trained centroids")
  }

  test("vec_l2i / vec_doti equal their higher-order-function formulations on quantized vectors") {
    import graft.functions.VecIntOps
    val q = Ann.quantized(corpus).select(col("id"), col("x"))
    val pairs = q.select(col("id"), col("x"))
      .join(q.select((col("id") + 1).as("id"), col("x").as("y")), "id")
    val l2Hof = aggregate(zip_with(col("x"), col("y"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
    val dotHof = aggregate(zip_with(col("x"), col("y"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val bad = pairs.select(
        VecIntOps.l2(col("x"), col("y")).as("l2f"), l2Hof.as("l2s"),
        VecIntOps.dot(col("x"), col("y")).as("dotf"), dotHof.as("dots"))
      .filter(col("l2f") =!= col("l2s") || col("dotf") =!= col("dots"))
      .count()
    assert(bad == 0, "integer kernels must be bit-identical to zip_with/aggregate")
    // known values + length mismatch (common-prefix semantics)
    import spark.implicits._
    val row = Seq((Array(1L, 2L, 3L), Array(4L, 5L))).toDF("a", "b")
      .select(VecIntOps.l2($"a", $"b").as("l2"), VecIntOps.dot($"a", $"b").as("dot"))
      .head()
    assert(row.getLong(0) == 9L + 9L && row.getLong(1) == 4L + 10L)
  }

  test("vec_dot equals the higher-order-function formulation on real vectors") {
    val hof = aggregate(
      zip_with(col("vec"), col("vec"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = corpus
      .select(VecDot.dot(col("vec"), col("vec")).as("fast"), hof.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0, "codegen'd loop must be bit-identical to zip_with/aggregate")
  }

  test("vec_dot handles simple known values, length mismatch, and null input") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    assert(df.select(VecDot.dot(col("a"), col("b"))).collect()(0).getDouble(0) == 32.0)
    val mixed = Seq((Array(1f, 2f), Array(3f))).toDF("a", "b")
    assert(mixed.select(VecDot.dot(col("a"), col("b"))).collect()(0).getDouble(0) == 3.0)
    val withNull = Seq((Array(1f), Option.empty[Array[Float]])).toDF("a", "b")
    assert(withNull.select(VecDot.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("bruteForceTopK matches an independent window-based top-k") {
    val queries = corpus.filter(col("id") < 5).select("id", "vec")
    val fast = Ann.bruteForceTopK(corpus, queries, 10)
      .select("qid", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val scored = corpus.select(col("id").as("cid"), col("vec").as("cv"))
      .join(broadcast(queries.select(col("id").as("qid"), col("vec").as("qv"))))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), Ann.cosMicros(col("qv"), col("cv")).as("cm"))
    val ref = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cm").desc, col("cid"))))
      .filter(col("rank") <= 10)
      .select("qid", "rank", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(fast == ref)
  }

  test("ivfTopK results are rank-consistent per query") {
    val queries = corpus.filter(col("id") < 5).select("id", "vec")
    val ivf = Ann.ivfTopK(corpus, queries, "label", 64, nprobe = 2, k = 10).collect()
    assert(ivf.length == 5 * 10)
    // cosines are non-increasing within each query
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hyperplane buckets are deterministic and within signature range") {
    val b1 = Ann.hyperplaneBuckets(corpus, 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Ann.hyperplaneBuckets(corpus, 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < (1L << Ann.LshBits)))
  }

  test("lshParams: oracle scales keep (4,4); key-space tracks corpus size beyond") {
    // every oracle-checked corpus (≤ a few thousand vectors) must resolve
    // to the static constants the SQL texts replay
    for (n <- Seq(1L, 200L, 2000L))
      assert(Ann.lshParams(n) == (4, 4), s"n=$n")
    // beyond oracle scale the key-space grows with n (bucket ~constant)
    // and bands grow to restore recall
    val (r10, b10) = Ann.lshParams(20000L)
    val (r100, b100) = Ann.lshParams(200000L)
    assert(r10 > 4 && r100 > r10, s"r must grow with n: $r10, $r100")
    assert(b10 > 4 && b100 > b10, s"b must grow with r: $b10, $b100")
    // the quadratic driver is n/2^r: it must stay bounded by the target
    for (n <- Seq(2000L, 20000L, 200000L, 2000000L)) {
      val (r, _) = Ann.lshParams(n)
      assert(n.toDouble / (1L << r) <= Ann.LshTargetBucket,
        s"expected bucket at n=$n exceeds the target")
    }
  }

  test("lshNearDupPairs ⊆ exact pairs, finds every same-bucket pair, no cartesian") {
    val threshold = 400000L
    val banded = Ann.lshNearDupPairs(corpus, 64, threshold)
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // assert on the plan AFTER execution: under AQE the pre-execution
    // string is the initial plan, not the one that actually ran
    assert(!banded.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "banded near-dup must not execute a nested-loop product")

    val a = corpus.select(col("id").as("vec_a"), col("vec").as("va"))
    val b = corpus.select(col("id").as("vec_b"), col("vec").as("vb"))
    val exact = a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), Ann.cosMicros(col("va"), col("vb")).as("cm"))
      .filter(col("cm") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "banded verify must never emit a below-threshold pair")
    assert(got.nonEmpty, "corpus should contain banded near-dups")

    // recall floor: any exact pair sharing a FULL 16-bit bucket trivially
    // shares every band, so it must be present in the banded output
    val buckets = Ann.hyperplaneBuckets(corpus, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mustHave = exact.filter { case (x, y) => buckets(x) == buckets(y) }
    assert(mustHave.subsetOf(got), "full-bucket-equal pairs must be recalled")
  }

  test("lshNearDupPairsCkpt invalidates on content change under identical ids; empty corpus is safe") {
    // the r17 lesson (0d1abc5): unpinned caches are where the next
    // stale-state bug lives. The fingerprint must see a corpus
    // regenerated IN PLACE — same key, same id range, different vectors
    // (ADVICE r18: a count+min/max-id key could not).
    val dim = 16
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    // corpus A: ids 0..9 orthogonal one-hots except id 1 duplicates id 0
    val a = spark.createDataFrame(
      (0 until 10).map(i => (i.toLong, oneHot(if (i == 1) 0 else i))))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>"))
    val pa = Ann.lshNearDupPairsCkpt(a, dim, 400000L, "spec-ckpt-inval")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa == Set((0L, 1L)), s"corpus A pairs: $pa")
    // corpus B: SAME ids (count, min, max all unchanged), the duplicate
    // moved to (2,3) — a stale-serving cache would still answer {(0,1)}
    val b = spark.createDataFrame(
      (0 until 10).map(i => (i.toLong, oneHot(if (i == 3) 2 else i))))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>"))
    val pb = Ann.lshNearDupPairsCkpt(b, dim, 400000L, "spec-ckpt-inval")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pb == Set((2L, 3L)),
      s"regenerated corpus must MISS the checkpoint and recompute: $pb")
    // and the unchanged corpus still HITS (same fingerprint → same path)
    val pa2 = Ann.lshNearDupPairsCkpt(a, dim, 400000L, "spec-ckpt-inval")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa2 == pa)
    // empty corpus: sum(xxhash64) aggregates to NULL, not 0 — the guard
    // must keep the fingerprint read from NPEing (ADVICE r18)
    assert(Ann.lshNearDupPairsCkpt(a.limit(0), dim, 400000L,
      "spec-ckpt-empty").count() == 0L)
  }

  test("q176: mined hard negatives always cross labels and never beat the unrestricted best") {
    val rows = graft.SparkEntry.queries("q176_hard_negative_mining")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Int]("neg_label") != r.getAs[Int]("q_label"), s"same-label negative: $r")
    val best39 = graft.SparkEntry.queries("q39_ann_brute_topk")(spark, TestSpark.Sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos")).toMap
    for ((qid, rs) <- rows.groupBy(_.getAs[Long]("qid"))) {
      assert(rs.length == 10)
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sortBy(-(_: Double)), "cos must descend with rank")
      // restricting candidates (labels must differ) can only lower the top score
      assert(cs.head <= best39(qid) + 1e-9, s"negative beats unrestricted best for q$qid")
    }
  }

  test("q178: IVFADC returns 10 ranked results per query with real recall vs brute force") {
    val rows = graft.SparkEntry.queries("q178_ivfadc")(spark, TestSpark.Sf).collect()
    val exact = graft.SparkEntry.queries("q39_ann_brute_topk")(spark, TestSpark.Sf).collect()
    val exactTop = exact.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == exactTop.keySet)
    var hits = 0
    for ((qid, rs) <- byQ) {
      assert(rs.length == 10, s"q$qid returned ${rs.length} results")
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sortBy(-(_: Double)), "cos must descend with rank")
      hits += rs.map(_.getAs[Long]("vec_id")).count(exactTop(qid))
    }
    // a 2-probe compressed index must still find a meaningful share of the
    // exact top-10 — guards against a broken LUT/residual pipeline that
    // would still produce 10 well-formed rows of noise
    val recall = hits.toDouble / (byQ.size * 10)
    assert(recall >= 0.3, f"IVFADC mean recall@10 $recall%.2f below floor 0.30")
  }

  test("q179: NDCG/MRR bounded in [0,1] and consistent with hit counts") {
    val rows = graft.SparkEntry.queries("q179_retrieval_metrics")(spark, TestSpark.Sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val hits = r.getAs[Long]("n_hits"); val ndcg = r.getAs[Double]("ndcg_at_10")
      val mrr = r.getAs[Double]("mrr")
      assert(hits >= 0 && hits <= 10)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(mrr >= 0.0 && mrr <= 1.0 + 1e-9)
      assert((hits == 0) == (ndcg == 0.0), "zero hits iff zero NDCG")
      assert((hits == 0) == (mrr == 0.0), "zero hits iff zero MRR")
      if (hits == 10) assert(ndcg >= 0.999, "all 10 hits must give NDCG 1 under binary relevance")
    }
  }

  test("q180: index-refresh audit partitions both slices exactly") {
    val rows = graft.SparkEntry.queries("q180_ann_index_refresh")(spark, TestSpark.Sf).collect()
    val emb = graft.model.Tables.embeddings(spark, TestSpark.Sf)
    val thr = math.floor(0.8 * emb.agg(max("vec_id")).head.getLong(0)).toLong
    val nCorpus = emb.filter(col("vec_id") < thr).count()
    val nBatch = emb.filter(col("vec_id") >= thr).count()
    assert(rows.map(_.getAs[Long]("n_corpus")).sum == nCorpus)
    assert(rows.map(_.getAs[Long]("n_batch")).sum == nBatch)
    for (r <- rows) {
      val share = r.getAs[Double]("batch_share")
      assert(share >= 0.0 && share <= 1.0 + 1e-9)
    }
  }
}
