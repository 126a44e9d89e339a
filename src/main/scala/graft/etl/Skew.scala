package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled complement to AQE's
  * runtime skew-join splitting (`spark.sql.adaptive.skewJoin`, already on
  * in [[graft.Sessions]]).
  *
  * When one key holds a disproportionate share of a 100 TB fact table, a
  * plain shuffle sends that key's entire volume through one reducer.
  * Salting splits the hot key across `buckets` reducers and recombines:
  *
  *   - [[saltedDistinctCount]]: two-phase COUNT(DISTINCT v) — salt by
  *     `hash(v) mod buckets`, so each bucket owns a *disjoint slice of the
  *     value space* and per-bucket exact distinct counts sum to the total.
  *     (Plain additive aggregates don't need this: hash-aggregate already
  *     partial-aggregates map-side. Distinct state is what skews.)
  *   - [[saltedJoin]]: replicate the small side `buckets`× (salt column
  *     exploded), salt the big side deterministically from a unique
  *     column, join on (key, salt). Each reducer sees 1/buckets of the
  *     hot key's rows; the small side grows by buckets× (still tiny).
  *
  * Both are exact — results equal the unsalted plans (asserted by
  * SkewSpec) — and deterministic (salts derive from data hashes, never
  * rand()). */
object Skew {

  /** Exact two-phase distinct count per key. One shuffle on
    * (keys, value-hash-bucket) with bounded per-reducer distinct state,
    * then a tiny second aggregate on keys. */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], value: String,
                          buckets: Int, out: String): DataFrame =
    df.groupBy((keys.map(col) :+ pmod(xxhash64(col(value)), lit(buckets)).as("__salt")): _*)
      .agg(countDistinct(col(value)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").cast("long").as(out))

  /** Exact inner equi-join with the big side's hot keys spread over
    * `buckets` reducers. `bigSaltSource` must be a column of `big` whose
    * values spread rows of the same key (a row id, an event id — anything
    * high-cardinality). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltSource: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(bigSaltSource)), lit(buckets)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
