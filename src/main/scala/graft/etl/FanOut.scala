package graft.etl

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit pre-compute fan-out for under-partitioned inputs.
  *
  * Heavy map-side pipelines (shingling, hashing, per-row scoring) run at
  * the parallelism of their *input* partitioning. A single-file
  * single-row-group parquet source — exactly what the small test corpora
  * are — arrives as ONE input split, serializing everything downstream
  * into one task. Fanning out with `repartition(n, key)` fixes that, and
  * the count must be pinned: a bare `repartition(col)` is AQE-coalescible,
  * and because the shuffled bytes are tiny AQE merges it back to one
  * partition, nondeterministically re-serializing the expensive compute
  * the exchange exists to spread.
  *
  * The fan-out is ADAPTIVE: an input that already arrives with at least
  * the target parallelism (the normal case at real scale — 100 TB arrives
  * as tens of thousands of splits) is returned unchanged, so production
  * plans never pay a gratuitous extra exchange for test-corpus-shaped
  * tuning. Inspecting `rdd.getNumPartitions` plans the query but runs no
  * job.
  */
object FanOut {

  /** `df` repartitioned to the session's shuffle parallelism on `key`, or
    * `df` itself (same object — zero plan change) when it already has at
    * least that many partitions. */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
