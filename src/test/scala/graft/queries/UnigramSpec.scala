package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM (EM) tokenizer trainer semantics (q186/q187): coverage,
  * EM improvement over the seed initialization, and the headline claim —
  * the trained subword vocabulary beats the character baseline. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val words = CurationOps.unigramWords(spark, TestSpark.Sf).cache()
  private lazy val model = CurationOps.unigramModel(spark, TestSpark.Sf)

  /** Corpus Viterbi cost (Σ word-freq · piece-lp, micro-units) and total
    * emitted pieces (Σ word-freq per best-segmentation piece row) under a
    * model. */
  private def segStats(m: DataFrame): (Long, Long) = {
    val seg = CurationOps.viterbiSeg(words, m)
      .join(m.select("piece", "lp"), "piece")
      .agg(sum(col("n") * col("lp")).as("cost"), sum("n").as("pieces"))
      .head()
    (seg.getLong(0), seg.getLong(1))
  }

  test("every corpus word is segmentable under the trained model") {
    val segWords = CurationOps.viterbiSeg(words, model)
      .select("word").distinct().count()
    assert(segWords == words.count(),
      "pruning must never strand a word (feasibility is inductive)")
  }

  test("EM improves corpus Viterbi cost over the seed initialization") {
    val (seedCost, _) = segStats(CurationOps.unigramSeedModel(words))
    val (emCost, _) = segStats(model)
    assert(emCost < seedCost,
      s"EM must not worsen the Viterbi objective: seed=$seedCost em=$emCost")
  }

  test("trained vocab beats the character baseline on pieces per corpus") {
    val (_, pieces) = segStats(model)
    val chars = words.agg(sum(col("n") * col("wl"))).head().getLong(0)
    assert(pieces < chars,
      s"trained segmentation must emit fewer pieces than chars: $pieces vs $chars")
    // and materially so: at least 2 chars per piece on average
    assert(pieces * 2 <= chars,
      s"expected >=2x compression over characters, got $pieces pieces / $chars chars")
  }

  test("model invariants: single-char coverage pieces present, counts positive, lp consistent") {
    val rows = model.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._2 > 0), "pruned model must carry positive counts")
    val tot = rows.map(_._2).sum.toDouble
    rows.foreach { case (p, c, lp) =>
      val expect = math.round(1e6 * math.log(tot / c))
      assert(lp == expect, s"lp($p) drifted from its count: $lp vs $expect")
    }
    // multi-char pieces dominate the mass (the point of subword training)
    val multiMass = rows.filter(_._1.length >= 2).map(_._2).sum
    assert(multiMass * 2 > rows.map(_._2).sum,
      "multi-char pieces should carry the majority of segmentation mass")
  }
}
