package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated star schema (TESTDATA.md).
  *
  * The reference engine's data model (SURVEY.md §1; reference
  * `pipeline/ETL/extract.py:86-109`) is a denormalized fact table plus two
  * tiny dimensions. Here the stand-ins are:
  *   - `lineitem` (+`orders`)  → `transactions` fact
  *   - `supplier`              → `dim_trucks`-like broadcast dimension
  *   - `nation`/`region`       → `dim_payment_methods`-like tiny dimension
  *   - `events`                → incremental / streaming-shaped table
  *   - `documents`/`embeddings`→ LLM-pipeline extension tables
  *
  * Every reader is a plain parquet scan: Catalyst handles column pruning,
  * predicate pushdown, and (for partitioned layouts written by
  * [[graft.etl.PartitionedLake]]) partition pruning. At 100 TB the same
  * code path works unchanged — `dir` becomes an object-store prefix and the
  * scan parallelism follows `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema-validated scan: the read uses parquet's own footer schema
    * (vectorized, pruned), then asserts it matches the pinned contract in
    * [[Schemas]] — drift fails fast with the exact columns, instead of the
    * reference's silent per-hop re-inference (SURVEY §1.3).
    *
    * Memoized per (session, dir, name): `spark.read.parquet` runs a footer
    * schema-inference job (~15-30 ms) on EVERY call, and a bench/verify
    * pass re-loads each base table hundreds of times — the inference jobs
    * alone were a measured ~10% of the sf0.1 suite total (ProfileQ r19:
    * every query led with one ~25 ms job per table it touches; the
    * SQL family's registerAll paid all ten). The base tables are immutable
    * inputs, so reusing the resolved relation (schema + file index) is
    * semantics-free; a NEW path (every test fixture uses a fresh temp dir)
    * gets its own entry. At 100 TB the same memo is what keeps a
    * many-query driver from re-listing the lake prefix per query. */
  private val loaded = new graft.etl.Memo[(SparkSession, String, String), DataFrame]
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded((spark, dir, name)) {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") Schemas.validate(name, Schemas.eventsRawWith(eventsTsType(df)), df.schema)
      else Schemas.byName.get(name).foreach(Schemas.validate(name, _, df.schema))
      df
    }

  /** Observed at-rest `ts` encoding of an events scan, restricted to the
    * legal set — any other shape falls through to the NTZ contract so
    * [[Schemas.validate]] names the drift. */
  private def eventsTsType(df: DataFrame) = {
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema.fields.find(_.name == "ts").map(_.dataType)
      .filter(Schemas.eventsTsEncodings.contains).getOrElse(TimestampNTZType)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet`'s `ts` column has shipped in multiple at-rest
    * encodings across testdata generations (see [[Schemas.eventsTsEncodings]]):
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as LongType
    * nanos (the flag is set once in [[graft.Sessions]]) — and plain
    * timestamp[us], surfaced as TimestampNTZType/TimestampType. All are
    * the same instants; this reader branches on the observed footer type
    * and normalizes every legal encoding to microsecond TimestampType
    * (session timezone is UTC, so the NTZ→TZ cast is exact), the precision
    * the DuckDB oracle compares at. Any other shape still fails fast with
    * the exact drift. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    val df = load(s, d, "events") // encoding-aware validation lives in load
    eventsTsType(df) match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries (the
    * reference's Athena surface, SURVEY.md §2 "honorable mention") run
    * verbatim through the full parse→analyze→optimize Catalyst path. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
