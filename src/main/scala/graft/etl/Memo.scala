package graft.etl

/** Exactly-once keyed memoization for side-effecting builders.
  *
  * `TrieMap.getOrElseUpdate` alone is lock-free but NOT once-only: two
  * threads racing on the same absent key may both evaluate the by-name
  * default, and for our builders (staging a parquet copy, opening a
  * dashboard session, running incremental batches) a double evaluation
  * means doubled IO and a leaked scratch directory. Wrapping the value in
  * a lazy holder fixes it: racing threads may create two *holders*, but
  * `getOrElseUpdate`'s put-if-absent installs exactly one, both callers
  * receive the installed holder, and Scala's `lazy val` initialization
  * (synchronized per holder) runs the build exactly once.
  */
final class Memo[K, V] {
  private val m = scala.collection.concurrent.TrieMap.empty[K, () => V]

  def apply(k: K)(build: => V): V = {
    val holder = m.getOrElseUpdate(k, { lazy val v = build; () => v })
    holder()
  }
}
