package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key (the temporal-join primitive
  * Spark lacks as a built-in; preference order per the brief is "compose
  * existing ops if semantics allow", which they do here).
  *
  * Implementation is the merge/union formulation, not a range join:
  * tag both sides, union, and run one `last(value, ignoreNulls)` window
  * per key ordered by (ts, side, order) — right rows sort before left rows
  * at equal timestamps, so the match bound is inclusive. Left rows then
  * carry the latest right value at or before their timestamp.
  *
  * Scale shape: ONE shuffle on the key and a linear per-key scan —
  * O(n log n) for the sort, no candidate blow-up. A naive
  * `left.ts >= right.ts` range join materializes every (left, right)
  * pair per key before filtering — quadratic per key at 100 TB. Window
  * state is a single value (running "last seen"), so skewed keys stream
  * rather than buffer.
  *
  * Determinism: callers must ensure at most one right row per (key, ts) —
  * [[dedupRight]] keeps the smallest order column — because "the" value
  * at a timestamp is otherwise ambiguous (DuckDB's ASOF JOIN has the same
  * tie ambiguity).
  */
object AsOfJoin {

  /** Keep one right row per (key, ts): the smallest `orderCol`. Uses a
    * lag over the key-only window (ordered by ts, order) rather than a
    * (key, ts)-partitioned row_number, so the shuffle is on `key` alone —
    * the same partitioning the as-of merge window needs downstream. */
  def dedupRight(right: DataFrame, key: String, ts: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(orderCol))
    right.withColumn("__prev_ts", lag(col(ts), 1).over(w))
      .filter(col("__prev_ts").isNull || col("__prev_ts") =!= col(ts))
      .drop("__prev_ts")
  }

  /** As-of join `left` to `right` on `key` with bound
    * `right(ts) <= left(ts)`. `rightVals` (columns of `right`) are carried
    * onto matching left rows as `asof_<name>` (null when no right row
    * precedes). `leftOrder` must be a numeric tie-break column of `left`.
    * Output = all left columns + the asof columns. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           leftOrder: String, rightVals: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(_ == key)
    // All right values ride in ONE struct column filled by ONE
    // last(ignoreNulls) window, so every asof_* output comes from the SAME
    // right row. (Per-column last() windows would tear values from
    // different rows whenever a right-value column is null on some row.)
    val rType = org.apache.spark.sql.types.StructType(rightVals.map(right.schema(_)))
    val rightBranch = right.select(
      col(key) +:
        col(ts).as("__ts") +: lit(0).as("__side") +: lit(0L).as("__ord") +:
        struct(rightVals.map(col): _*).cast(rType).as("__rvals") +:
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftBranch = left.select(
      col(key) +:
        col(ts).as("__ts") +: lit(1).as("__side") +: col(leftOrder).cast("long").as("__ord") +:
        lit(null).cast(rType).as("__rvals") +:
        leftRest.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightBranch.unionByName(leftBranch)
      .withColumn("__asof", last(col("__rvals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(col) ++
        rightVals.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
