package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is the
  * dominant cost; suites must not stop() it). 16 threads: the suite grew
  * past 45 min on local[4] (27 suites × real lake/streaming work run
  * SEQUENTIALLY in the forked JVM); no test depends on the partition
  * count — the two that touch parallelism (FanOutSpec) read
  * spark.sql.shuffle.partitions at runtime. Not the full 32: concurrent
  * suites (build.sbt testForkedParallel) each run multi-task jobs, and
  * oversubscribing every hardware thread with shuffle+GC helps nothing. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("16")
  val Sf = "/root/testdata/sf0.001"

  /** True iff some scan in the plan string carries a NON-empty
    * PartitionFilters list naming the `year` partition column — the one
    * place the fragile plan-string parsing lives (plan formats shift
    * across Spark versions; fix it here, not per spec). Matches INSIDE
    * the bracket list only: the scan's output schema also spells "year",
    * which a whole-plan contains() would false-positive on. */
  def hasPartitionGuard(plan: String): Boolean =
    "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan)
      .exists(_.group(1).contains("year"))
}
