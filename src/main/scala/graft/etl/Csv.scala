package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV stage hand-off (S3/S4) — the reference materializes every ETL stage
  * to CSV files under `data/` and re-reads them in the next process
  * (ref: pipeline/ETL/extract.py:112-115, transform.py:5-7,
  * partition_transactions.py:5-9).
  *
  * In this engine stages chain lazily inside one Catalyst plan, so these
  * hops are unnecessary — the helpers exist for interop parity (exporting
  * to / ingesting from CSV-speaking systems). Two deliberate upgrades over
  * the reference: writes are distributed (no single-process serialization)
  * and reads take an explicit schema — the reference re-infers on every
  * hop and must re-cast `at` to datetime each time
  * (partition_transactions.py:8); schema drift here is an error, not a
  * silent re-interpretation. */
object Csv {

  /** Full-microsecond timestamps — Spark's CSV default keeps only
    * milliseconds, which would silently round event times on the hop. */
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)
}
