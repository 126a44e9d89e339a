package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val d = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: exchanges, broadcasts, scans
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Broadcast") || l.contains("Scan parquet") ||
        l.contains("WindowExec") || l.contains("Sort") || l.contains("NestedLoop"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
