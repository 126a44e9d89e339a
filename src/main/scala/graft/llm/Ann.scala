package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VecDot.dot

/** Similarity search over an embedding column (`array<float>`), in two
  * tiers per the 100 TB contract:
  *
  *   - [[bruteForceTopK]] — exact cosine top-k: one distributed scan of the
  *     corpus per query batch, scored by the codegen'd [[graft.functions.VecDot]]
  *     expression, reduced with a two-stage bounded-state top-k (never a
  *     single-reducer window over the corpus).
  *   - [[ivfTopK]] — IVF-style: a coarse quantizer (here: per-label
  *     centroids, the stand-in for k-means cells; at scale the centroids
  *     are k-means-trained and broadcast) routes each query to `nprobe`
  *     cells, and only those cells are scored. Corpus partitioned/bucketed
  *     by cell id ⇒ the scan prunes to nprobe/k of the data.
  *   - [[hyperplaneBuckets]] — random-hyperplane LSH signatures: the
  *     bucket-join alternative when no trained quantizer exists.
  *
  * Determinism contract: scores are compared as `round(1e6·cosine)` longs
  * with vec_id tie-breaks, so ranking is integer-exact and identical in the
  * DuckDB oracle.
  */
object Ann {

  /** Cosine similarity in integer micro-units: round(1e6·(a·b)/(‖a‖‖b‖)).
    * All inputs float→double, sequential accumulation, one IEEE divide and
    * round — bit-identical across engines. */
  def cosMicros(a: Column, b: Column): Column =
    round(lit(1e6) * dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))).cast("long")

  /** SQL twin of the sequential-accumulation dot product. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosMicrosSql(a: String, b: String): String =
    s"CAST(round(1e6 * ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))) AS BIGINT)"

  /** Two-stage bounded-state top-k per key over (key, score, id) rows:
    * stage 1 takes the top k inside each (key, id-hash-bucket) group,
    * stage 2 merges the per-bucket lists. Both collect_lists are bounded
    * (bucket size, then buckets·k), unlike a row_number window that drags
    * a key's entire corpus through one reducer. Sorting is ascending on
    * struct(negScore, id) — i.e. score desc, id asc.
    */
  def topKPerKey(scored: DataFrame, k: Int, buckets: Int = 16): DataFrame =
    scored
      .withColumn("neg", -col("score"))
      .groupBy(col("key"), pmod(col("id"), lit(buckets)).as("bucket"))
      .agg(slice(array_sort(collect_list(struct(col("neg"), col("id")))), 1, k).as("part"))
      .groupBy("key")
      .agg(slice(array_sort(flatten(collect_list(col("part")))), 1, k).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(
        col("key"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"),
        (-col("col.neg") / 1e6).as("cos"))

  /** Exact cosine top-k of `corpus` for each row of `queries`
    * (both (id, vec)); queries are broadcast, the corpus streams. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("id").as("cid"), col("vec").as("cv"))
      .join(broadcast(queries.select(col("id").as("qid"), col("vec").as("qv"))))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid").as("key"), col("cid").as("id"),
        cosMicros(col("qv"), col("cv")).as("score"))
    topKPerKey(scored, k)
      .select(col("key").as("qid"), col("rank"), col("id").as("vec_id"), col("cos"))
  }

  /** Per-cell mean vectors — the coarse quantizer; output is k rows
    * (broadcastable). Computed in the EXPLODE shape: (cell, component,
    * value) rows → one narrow avg per (cell, component) → reassembled
    * into the array post-agg. An earlier formulation ran `dim` separate
    * avg aggregates in one groupBy — whole-stage codegen emits one huge
    * update method for all 64 accumulators, and huge generated methods
    * are the documented JIT hazard of this repo (compilation is
    * nondeterministically starved under compiler-queue pressure late in
    * a many-query run; observed as a 20× swing on the IVF query). The
    * explode shape keeps every generated method small, costs dim× rows
    * into a map-side partial agg, and collapses to cells×dim rows per
    * partition — the right trade at any scale.
    *
    * Each component is micro-rounded (`round(1e6·avg)/1e6`) before use:
    * a raw `avg` of doubles is summation-order-dependent, and a centroid
    * component sitting on a float rounding boundary could flip probe
    * routing between engines. The oracle SQL rounds identically. */
  def centroids(corpus: DataFrame, cellCol: String, dim: Int): DataFrame =
    corpus
      .select(col(cellCol).as("cell"), posexplode(col("vec")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col").cast("double")).as("a"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("a")))),
        s => round(lit(1e6) * s.getField("a")) / 1e6).as("cvec"))

  /** IVF search: route each query to its `nprobe` nearest cells (by cosine
    * to the centroid), then exact-score only vectors in those cells.
    * The probe table is tiny (queries × k cells) and broadcast; the corpus
    * side reduces to a semi-join on cell id — at scale, with the lake
    * bucketed by cell, that is a partition-pruned scan. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cellCol: String,
              dim: Int, nprobe: Int, k: Int): DataFrame = {
    val cents = centroids(corpus, cellCol, dim)
    // query→cell routing: tiny cross product, bounded top-nprobe per query
    val probes = queries.select(col("id").as("qid"), col("vec").as("qv"))
      .join(broadcast(cents.withColumn("cvec", col("cvec").cast("array<float>"))))
      .select(col("qid"), col("qv"), col("cell"),
        cosMicros(col("qv"), col("cvec")).as("cscore"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cscore").desc, col("cell"))))
      .filter(col("r") <= nprobe)
      .select("qid", "qv", "cell")
    val scored = corpus.select(col("id").as("cid"), col("vec").as("cv"), col(cellCol).as("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid").as("key"), col("cid").as("id"),
        cosMicros(col("qv"), col("cv")).as("score"))
    topKPerKey(scored, k)
      .select(col("key").as("qid"), col("rank"), col("id").as("vec_id"), col("cos"))
  }

  // ── Random-hyperplane LSH ────────────────────────────────────────────────

  val LshBits = 16

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes in [−1, 1]^dim, materialized as
    * *float* constants (so the Spark literal array and the SQL literal list
    * parse to the identical values in both engines). Generated at plan
    * build — zero per-row hashing at runtime. */
  def planes(dim: Int): IndexedSeq[IndexedSeq[Float]] =
    (0 until LshBits).map(j => (0 until dim).map { i =>
      val u = (splitmix64(j.toLong * dim + i) >>> 11).toDouble / (1L << 53).toDouble
      (2.0 * u - 1.0).toFloat
    })

  /** (id, bucket): the LshBits-bit signature of each vector — sign of the
    * dot product against each hyperplane. Map-side only, no shuffle. */
  def hyperplaneBuckets(corpus: DataFrame, dim: Int): DataFrame = {
    val ps = planes(dim)
    val bucket = (0 until LshBits).map { j =>
      val plane = typedLit(ps(j)).cast("array<float>")
      when(dot(col("vec"), plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    corpus.select(col("id"), bucket.as("bucket"))
  }

  /** SQL literal for plane j, matching [[planes]] bit-for-bit (shortest
    * round-trip decimal repr of each float re-parses to the same value). */
  def planeSql(dim: Int, j: Int): String =
    planes(dim)(j).map(f => s"CAST(${f.toDouble} AS FLOAT)").mkString("[", ", ", "]")

  /** Bands for LSH-bucketed near-dup candidate generation: 4 bands × 4 bits.
    * A pair agreeing on ANY band is a candidate — banding trades the full
    * 16-bit bucket equality (which near-dups at cosine ~0.9 only satisfy
    * ~8% of the time: each sign bit flips with p = θ/π ≈ 0.14) for
    * ≥1-of-4 4-bit band agreement (~95% recall at the same similarity),
    * exactly the MinHash banding trade applied to hyperplane signatures. */
  val LshBands = 4

  /** Embedding-cosine near-duplicate pairs via hyperplane-LSH banding:
    * signature → band explode → bucketed equality self-join on
    * (band, key) → distinct candidates → exact-cosine verify ≥
    * `thresholdMicros`. The plan has NO corpus×corpus product — the only
    * joins are hash joins on band keys and ids, so it survives a 100×
    * scale-up where the exact all-pairs baseline (quadratic) does not.
    * Recall is governed by the banding parameters, and the oracle replays
    * the identical banded algorithm, so the compare is exact. */
  def lshNearDupPairs(corpus: DataFrame, dim: Int, thresholdMicros: Long): DataFrame = {
    val bandBits = LshBits / LshBands
    val bands = hyperplaneBuckets(corpus, dim).select(
        col("id"),
        posexplode(array((0 until LshBands).map(b =>
          shiftright(col("bucket"), b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .toDF("id", "band", "key")
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"))
      .distinct()
    val vecs = corpus.select(col("id"), col("vec"))
    cand
      .join(vecs.select(col("id").as("vec_a"), col("vec").as("va")), "vec_a")
      .join(vecs.select(col("id").as("vec_b"), col("vec").as("vb")), "vec_b")
      .withColumn("cm", cosMicros(col("va"), col("vb")))
      .filter(col("cm") >= thresholdMicros)
      .select("vec_a", "vec_b", "cm")
  }
}
