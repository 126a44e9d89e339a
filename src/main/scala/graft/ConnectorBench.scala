package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Scratch, SnapshotLake}

/** Connector-vs-native decode benchmark (SCALE.md evidence for the
  * DSv2 read path): build one indexed lake from lineitem at
  * `SPARK_GRAFT_SF_DIR`, then time the SAME aggregate over (a) the
  * native `SnapshotLake.read` scan and (b) the connector
  * (`spark.read.format("graftlake")`), full-table decode-bound and
  * band-filtered, min-of-3 each. Prints one JSON line. The connector
  * rides Spark's vectorized parquet reader into whole-stage codegen,
  * so the two paths should be within noise of each other — this is the
  * measurement that claim rests on. */
object ConnectorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val root = Scratch.tempDir("graft-connbench").toString + "/lake"
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_returnflag")
    val li = graft.model.Tables.lineitem(spark, sfDir)
      .select(cols.map(col): _*)
    val maxK = li.agg(max("l_orderkey")).head.getLong(0)
    val idx = SnapshotLake.IndexSpec(Seq("l_orderkey", "l_partkey"), None)
    for (i <- 0L until 4L) {
      val lo = maxK * i / 4
      val cap = if (i == 3) col("l_orderkey") <= maxK
                else col("l_orderkey") < maxK * (i + 1) / 4
      SnapshotLake.append(
        li.filter(col("l_orderkey") >= lo && cap)
          .repartitionByRange(8, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"),
        root, idx)
    }

    // the q238 aggregate widened to every column: decode-bound on purpose
    def run(df: DataFrame): Unit = {
      df.groupBy("l_returnflag")
        .agg(count(lit(1)), sum(col("l_quantity").cast("long")),
          sum(round(col("l_extendedprice") * 100).cast("long")),
          sum("l_partkey"), sum("l_suppkey"))
        .collect()
      ()
    }
    def native(): DataFrame = SnapshotLake.read(spark, root)
    def connector(): DataFrame = spark.read.format("graftlake").load(root)
    def band(df: DataFrame): DataFrame =
      df.filter(col("l_orderkey") >= maxK / 2 && col("l_orderkey") <= maxK * 5 / 8)

    def best(mk: () => DataFrame, f: DataFrame => Unit): Double = {
      run(mk()) // warm
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(mk()); (System.nanoTime() - t0) / 1e9
      }.min
    }

    val nFull = best(native _, run)
    val cFull = best(connector _, run)
    val nBand = best(() => band(native()), run)
    val cBand = best(() => band(connector()), run)
    println(f"""{"metric":"connector_vs_native","sf_dir":"$sfDir","native_full_s":$nFull%.3f,"connector_full_s":$cFull%.3f,"full_ratio":${cFull / nFull}%.3f,"native_band_s":$nBand%.3f,"connector_band_s":$cBand%.3f,"band_ratio":${cBand / nBand}%.3f}""")
    spark.stop()
  }
}
