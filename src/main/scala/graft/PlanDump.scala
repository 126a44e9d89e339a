package graft

/** Writes `.explain("formatted")` for the named queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query...>
  * Each query's formatted physical plan lands at <outDir>/<query>_<suffix>.txt.
  * Data dir: SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE is what the
  * files witness; sf only changes row counts, and ScaleAudit separately
  * proves plan stability across SFs).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local()
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), plan)
      println(s"wrote ${q}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
