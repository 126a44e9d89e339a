package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven invariants evaluated in single Spark jobs over a
  * ScalaCheck-generated batch (SURVEY §5 item 3): text-operator ranges,
  * Jaccard bounds/symmetry, dedup idempotence on arbitrary content. */
class GeneratedDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val word = Gen.oneOf(
    "spark", "scan", "join", "filter", "agg", "sort", "merge", "hash",
    "row", "batch", "the", "a", "data", "key", "value", "window")
  private val doc = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private lazy val docsDf = {
    val texts = sample(Gen.listOfN(300, doc), seed = 42L)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("quality score stays within [0,1] and lang guess within the label set, any doc") {
    val toks = graft.llm.TextOps.tokens(col("text"))
    val bad = docsDf.select(
        graft.llm.TextOps.qualityScore(toks, length(col("text"))).as("q"),
        graft.llm.TextOps.langGuess(toks).as("g"))
      .filter(col("q") < 0 || col("q") > 1 || !col("g").isin("en", "und"))
      .count()
    assert(bad == 0)
  }

  test("shingle sets: every shingle has exactly n words; count bounded by token count") {
    val toks = graft.llm.TextOps.tokens(col("text"))
    val sh = graft.llm.TextOps.shingles(toks, 3)
    val bad = docsDf.select(size(toks).as("nt"), sh.as("s"))
      .select(col("nt"), size(col("s")).as("ns"),
        size(filter(col("s"), x => size(split(x, " ")) =!= 3)).as("malformed"))
      .filter(col("malformed") > 0 ||
        col("ns") > greatest(col("nt") - 2, lit(0)))
      .count()
    assert(bad == 0)
  }

  test("verified Jaccard is within [0,1] and 1 exactly on identical shingle sets") {
    val sets = graft.llm.Dedup.shingleSets(docsDf)
    val pairs = sets.select(col("doc_id").as("doc_a"))
      .crossJoin(sets.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") <= col("doc_b")).limit(5000)
    val j = graft.llm.Dedup.verifiedJaccard(pairs, sets)
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(j.filter(col("doc_a") === col("doc_b")).filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("exactDedup then exactDedup changes nothing (idempotence on arbitrary content)") {
    val d = docsDf.withColumn("lang", lit("en"))
    val once = graft.llm.Dedup.exactDedup(d)
    val again = graft.llm.Dedup.exactDedup(
      once.select(col("doc_id"), col("fp").as("text"), col("lang")))
    assert(once.count() == again.count())
  }

  test("partition guards preserve results on generated timestamps, any bound") {
    // end-to-end property for the optimizer rule: a lake written from
    // GENERATED event times (spanning pre-epoch through 2100, plus nulls)
    // filtered by random ts bounds must return exactly the rows the
    // unpartitioned source returns — the injected (year, month, day)
    // guards may prune directories, never rows
    val micros = Gen.frequency(
      9 -> Gen.choose(-2208988800000000L, 4102444800000000L),
      1 -> Gen.const(Long.MinValue)) // sentinel → null ts
    val rows = sample(Gen.listOfN(400, micros), seed = 11L)
      .zipWithIndex.map { case (m, i) =>
        (i.toLong, if (m == Long.MinValue) null
                   else new java.sql.Timestamp(Math.floorDiv(m, 1000L)))
      }
    val src = rows.toDF("id", "ts")
    val dir = graft.etl.Scratch.tempDir("graft-guard-gen").toString
    graft.etl.PartitionedLake.overwrite(
      graft.etl.PartitionedLake.withPartitionCols(src, "ts"), dir)
    val lake = spark.read.parquet(dir)
    val bounds = sample(Gen.listOfN(6,
      Gen.choose(-2208988800000000L, 4102444800000000L)), seed = 13L)
    for (b <- bounds) {
      val t = new java.sql.Timestamp(Math.floorDiv(b, 1000L))
      for (pred <- Seq(col("ts") >= lit(t), col("ts") < lit(t))) {
        val got = lake.filter(pred).agg(count(lit(1)), sum("id")).collect()(0)
        val want = src.filter(pred).agg(count(lit(1)), sum("id")).collect()(0)
        assert(got == want, s"guarded lake diverged for bound $t, pred $pred")
      }
    }
  }

  test("z-order interleave is a bijection on 16-bit pairs (round-trips, any input)") {
    // de-interleave in plain Scala: even bits back to a, odd bits to b —
    // losing any bit would collapse distinct key pairs into one z value
    // and silently merge file rectangles
    def deinterleave(z: Long): (Long, Long) = {
      var (a, b) = (0L, 0L)
      for (i <- 0 until graft.etl.ZOrder.BitsPerDim) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val pairs = sample(Gen.listOfN(500,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))), seed = 7L)
    val zs = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.etl.ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect()
    for (r <- zs)
      assert(deinterleave(r.getLong(2)) == ((r.getLong(0), r.getLong(1))),
        s"(${r.getLong(0)}, ${r.getLong(1)}) -> z=${r.getLong(2)} did not round-trip")
  }
}
