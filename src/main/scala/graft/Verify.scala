package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q120,q35 → dump only the named queries
    // (prefix match) — local-iteration lever, the driver sets nothing.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // Emitted-schema record (name → col:type), written alongside the
    // results and diffed against the committed golden
    // (tools/schema_golden.json) by tools/check.py: a testdata
    // regeneration that shifts an output type (round 6: events.parquet
    // µs→ns) surfaces as a reviewable schema diff BEFORE the driver's
    // hash gate goes red.
    val schemas = scala.collection.mutable.TreeMap.empty[String, Seq[String]]
    // Input-table footer schemas, recorded as they arrive at rest (raw
    // spark.read, BEFORE any reader normalization such as Tables.events'
    // ts handling): a driver-side testdata regeneration (round 8: events
    // ts nanos→micros) surfaces here as a reviewable `input:` diff even
    // when the engine tolerates the change.
    graft.model.Tables.names.foreach { t =>
      try schemas(s"input:$t") = spark.read.parquet(s"$sfDir/$t.parquet")
        .schema.fields.toSeq.map(f => s"${f.name}:${f.dataType.sql}")
      catch { case e: Throwable =>
        System.err.println(s"[verify] input:$t unreadable: ${e.getMessage}") }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // recorded only AFTER the successful write: a failed write must not
        // leave a clean schema entry for a query with no comparable output
        schemas(name) = df.schema.fields.toSeq
          .map(f => s"${f.name}:${f.dataType.sql}")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // per-query intermediates must not accumulate
      // localCheckpoint strays are RDD-level and invisible to clearCache;
      // released here so 176 queries don't accumulate dead blocks (all
      // cross-query memoized state is parquet- or local-rows-backed).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val schemaJson = schemas
      .map { case (k, cols) =>
        s"${q(k)}: ${cols.map(q).mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/schemas.json"), schemaJson)
    spark.stop()
  }
}
