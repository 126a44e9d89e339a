package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable cleaning operators mirroring the reference's transform stage
  * (reference `pipeline/ETL/transform.py:10-46`), composed as ONE lazy
  * Catalyst plan instead of seven eager pandas steps with CSV hops between
  * them (SURVEY.md §3.1). Each helper is a `DataFrame => DataFrame` so ETL
  * pipelines chain them with `transform(...)`.
  *
  * Scale notes: the only shuffle in the whole chain is the window used for
  * deterministic keep-first dedup (one hash exchange on the dedup key).
  * Everything else is narrow and stays inside a single WholeStageCodegen
  * span on top of the parquet scan.
  */
object Clean {

  /** P2+P3: drop null and zero measures (transform.py:14-16). */
  def dropNullOrZero(measure: String)(df: DataFrame): DataFrame =
    df.filter(col(measure).isNotNull && col(measure) =!= 0)

  /** P4: multi-column null guard over critical columns (transform.py:40-42). */
  def dropNullCritical(cols: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop(cols = cols)

  /** P5: pence→pounds money normalization (transform.py:21). */
  def penceToPounds(c: String)(df: DataFrame): DataFrame =
    df.withColumn(c, col(c).cast("double") / 100)

  /** A12 made deterministic (SURVEY.md §7.4 trap 1): the reference's
    * pandas `drop_duplicates(keep='first')` (transform.py:29-37) depends on
    * input order; across Spark partitions that order does not exist, so we
    * pin "first" to the smallest `orderCol` per key with a row_number
    * window. One shuffle on `keys`.
    */
  def dedupKeepFirst(keys: Seq[String], orderCol: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** F4: derive year/month/day partition columns from the event timestamp
    * (load.py:45-47) — unpadded integer values, matching Spark's own
    * `partitionBy` convention (SURVEY.md §7.4 trap 4).
    */
  def derivePartitionCols(tsCol: String)(df: DataFrame): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))

  /** The full cleaning pipeline over the `events` table, stage order as in
    * transform.py:10-46: value null/zero filter → keep-first dedup on the
    * natural key → partition-column derivation → projection.
    */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      .transform(dropNullOrZero("value"))
      .transform(dropNullCritical(Seq("event_id", "ts", "user_id", "event_type", "value")))
      .transform(dedupKeepFirst(Seq("ts", "user_id", "event_type", "value"), "event_id"))
      .transform(derivePartitionCols("ts"))
      .select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        (round(col("value") * 100) / 100.0).as("value"),
        col("year"), col("month"), col("day"))
}
