package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Column surface for Spark's own bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime join filters), registered by [[graft.GraftExtensions]]
  * as `bloom_agg` / `bloom_might_contain`.
  *
  * Intended shape (the q199 decontamination path): aggregate the SMALL
  * side's hashed keys into one bloom (a few-KiB binary), carry it as a
  * plan literal, and prune the HUGE side map-side with [[mightContain]]
  * BEFORE any exchange — only survivors reach the exact verify join. The
  * bloom is a pure pre-filter: false positives are removed by the exact
  * join, false negatives don't exist, so results never depend on the
  * bloom's seeds — which is why oracle SQL stays bloom-free.
  *
  * Inputs must already be hashed to longs (`xxhash64`) on BOTH the build
  * and probe side — the same convention Spark's injected runtime filters
  * use (`XxHash64` on either end).
  */
object BloomOps {

  /** Aggregate: bloom of all `hashed` values, sized for `estItems`
    * distinct items in `numBits` bits. Returns one BinaryType row. */
  def bloomAgg(hashed: Column, estItems: Long, numBits: Long): Column =
    call_function("bloom_agg", hashed, lit(estItems), lit(numBits))

  /** Predicate: might `hashed` be in `bloom` (a binary literal or scalar
    * subquery)? No false negatives; false positives at the sized rate. */
  def mightContain(bloom: Column, hashed: Column): Column =
    call_function("bloom_might_contain", bloom, hashed)
}
