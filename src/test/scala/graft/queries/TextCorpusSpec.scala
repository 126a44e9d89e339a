package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the corpus-curation operators (q70-q76) beyond the DuckDB
  * hash gate: structural invariants that hold at ANY scale factor, plus a
  * JVM-side replay of the deterministic-hash bucketing.
  */
class TextCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val nDocs =
    graft.model.Tables.documents(spark, TestSpark.Sf).count()

  test("vocab top-k: document frequency never exceeds corpus size or term frequency") {
    val rows = run("q70_vocab_topk").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val tf = r.getAs[Long]("tf"); val df = r.getAs[Long]("df")
      assert(df <= nDocs && df >= 1, s"df $df out of [1, $nDocs]")
      assert(tf >= df, s"tf $tf < df $df for ${r.getAs[String]("tok")}")
    }
    // descending by tf, ties by token — the contract the LIMIT relies on
    val tfs = rows.map(_.getAs[Long]("tf")).toSeq
    assert(tfs == tfs.sortBy(-_))
  }

  test("tf-idf: at most 3 terms per doc, scores descend within each doc") {
    val rows = run("q71_tfidf_topk").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    for ((_, rs) <- byDoc) {
      assert(rs.length <= 3)
      val scores = rs.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores == scores.sortBy(-(_: Double)))
      // ubiquitous tokens (df = N) carry ln(1) = 0 weight, so a top term
      // must be discriminative unless every token in the doc is ubiquitous
      assert(scores.head >= 0.0)
    }
  }

  test("domain cap keeps at most 50 docs per source and all of a small source") {
    for (r <- run("q72_domain_cap").collect()) {
      val total = r.getAs[Long]("n_total"); val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(total, 50L),
        s"source ${r.getAs[String]("source")}: kept $kept of $total")
    }
  }

  test("pii scrub finds exactly the injected emails and phones") {
    val agg = run("q73_pii_scrub")
      .agg(sum("total_emails"), sum("total_phones"), sum("n_docs")).collect()(0)
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val expectEmails = docs.filter(col("doc_id") % 7 === 0).count()
    val expectPhones = docs.filter(col("doc_id") % 11 === 0).count()
    assert(agg.getLong(0) == expectEmails, "email count != injected count")
    assert(agg.getLong(1) == expectPhones, "phone count != injected count")
    assert(agg.getLong(2) == nDocs)
  }

  test("repetition ratio is a valid share and bigram counts match token counts") {
    val byId = run("q74_repetition_topk").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("rep_ratio"))).toMap
    assert(byId.nonEmpty)
    val toks = graft.model.Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id").isin(byId.keys.toSeq: _*))
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, (nb, rep)) <- byId) {
      assert(nb == toks(id) - 1, s"doc $id: $nb bigrams for ${toks(id)} tokens")
      assert(rep >= 0.0 && rep <= 1.0)
    }
  }

  test("inverted index: df equals posting-list length, postings sorted and in-slice") {
    val rows = run("q75_inverted_index").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ids = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(ids.length.toLong == r.getAs[Long]("df"))
      assert(ids == ids.sorted, "postings must be sorted")
      assert(ids.forall(_ < 40), "postings must respect the slice bound")
    }
  }

  test("stratified sample bucketing replays the md5 assignment exactly") {
    // JVM-side replay of the split primitive: bucket = first 4 md5 hex
    // digits of the STRING doc id, mod 10 — must match Spark bit-for-bit,
    // and be independent of partitioning (the reproducibility contract).
    def jvmBucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val docs = graft.model.Tables.documents(spark, TestSpark.Sf)
    val sparkBuckets = docs
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, b) <- sparkBuckets.take(200)) assert(b == jvmBucket(id), s"doc $id")

    val expect = sparkBuckets.values.count(_ == 0).toLong
    val got = run("q76_stratified_sample")
      .agg(sum("n_sampled")).collect()(0).getLong(0)
    assert(got == expect)
  }

  test("q175: RRF score decomposes into its rank contributions and descends per query") {
    val rows = run("q175_hybrid_rrf").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // the fused score must be EXACTLY the sum of the two published
      // contributions — no hidden third signal, no float drift
      val expect =
        Option(r.getAs[Integer]("dense_rank")).map(dr => math.round(1e6 / (60 + dr))).getOrElse(0L) +
        Option(r.getAs[Integer]("lex_rank")).map(lr => math.round(1e6 / (60 + lr))).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppm") == expect, s"row $r")
      // a fused row must come from at least one ranking
      assert(r.get(r.fieldIndex("dense_rank")) != null || r.get(r.fieldIndex("lex_rank")) != null)
    }
    for ((_, rs) <- rows.groupBy(_.getAs[Long]("qid"))) {
      assert(rs.length == 10)
      val scores = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("rrf_ppm")).toSeq
      assert(scores == scores.sortBy(-(_: Long)), "rrf_ppm must descend with rank")
    }
  }
}
