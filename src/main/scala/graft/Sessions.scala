package graft

import org.apache.spark.sql.SparkSession

/** Single place where local SparkSessions are built, so session-scoped
  * configuration lives in exactly one spot (no reader-side `conf.set`
  * side effects — ADVICE.md round 1).
  *
  * Config notes:
  *   - `spark.sql.legacy.parquet.nanosAsLong`: some generations of the
  *     driver-generated `events.parquet` carry TIMESTAMP(NANOS), which
  *     Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]) unless
  *     this flag surfaces the column as long nanos. [[graft.model.Tables
  *     .events]] normalizes every legal at-rest encoding (nanos-as-long,
  *     timestamp[us] NTZ/UTC — the current testdata) to microsecond
  *     TimestampType, the precision the DuckDB oracle compares at. The
  *     flag is harmless when the data is already micros.
  *   - shuffle partitions = executor threads: local mode has no reason for
  *     the 200 default; at cluster scale this knob is sized to data volume
  *     (~128 MB per shuffle partition), not hardcoded.
  */
object Sessions {
  /** Default parallelism = every core the machine has (the driver's bench
    * box is local[32]); `SPARK_GRAFT_CPUS` pins it lower for tests that
    * want small deterministic partition counts. */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // shuffle/spill scratch on tmpfs: the bench VM's disk intermittently
      // stalls for tens of seconds, randomly inflating whichever query is
      // mid-shuffle; data volumes at test SF are far below RAM
      .config("spark.local.dir",
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm/spark-local" else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark-written lakes must carry INT64 micros timestamps (never
      // INT96): INT64 columns have usable min/max statistics, so ts
      // predicates on derived lakes (incremental delta, IVM) push to the
      // parquet footer and prune row groups.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      // Object-typed aggregates (the sketch kernels: minhash_sig,
      // simhash_sig, topk_pairs; also collect_list/listagg) run on
      // ObjectHashAggregateExec, which abandons hash aggregation for a
      // SORT of the entire input once a partition sees >128 distinct
      // groups (spark.sql.objectHashAggregate.sortBased.fallbackThreshold
      // default). Every sketch aggregate in this engine keeps a BOUNDED
      // buffer (k pairs / H longs), so hash mode costs O(groups·buffer)
      // memory — a few hundred MB at worst per task — while the sort
      // fallback costs a full shuffle-spill of the pre-aggregation rows:
      // at the 100× audit, q198's 4e9-pair stage spilled tens of GB
      // through exactly this fallback. 4M groups/partition keeps every
      // bounded-buffer aggregate in hash mode at any realistic reducer
      // width; unbounded list aggregates stay safe because their lists,
      // not the group count, are what bounds them (q75 builds posting
      // lists over a bounded eval slice by construction).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      // Driver self-defense: plan→string rendering (AQE plan-change log,
      // explain, UI) is O(plan size), and an iterative job that fails to
      // truncate lineage grows its plan exponentially — an unbounded
      // render can wedge the driver for minutes (observed: a
      // connected-components variant before per-round localCheckpoint).
      // 1 MiB is far beyond any legitimate plan and caps the damage.
      .config("spark.sql.maxPlanStringLength", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
