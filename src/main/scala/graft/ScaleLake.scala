package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress lake builder (SCALE.md): writes an N× replica of a source
  * sf dir so the expensive end of the query inventory can be re-measured
  * at a genuinely larger size on the same machine.
  *
  * `runMain graft.ScaleLake <srcDir> <outDir> <factor>`
  *
  * Replication is KEY-SHIFTED, not row-duplicated, so every table keeps
  * its integrity constraints and its workload shape at N×:
  *   - dims (`region nation customer supplier part`) copy unchanged — at
  *     100 TB the dims are still dim-sized; scaling them would silently
  *     flip every broadcast join the bench is supposed to observe.
  *   - `orders`/`lineitem` shift `o_orderkey`/`l_orderkey` together by
  *     `i * (max key + 1)` per replica i, keeping the fact⋈fact join
  *     resolvable and the key space dense-unique. FK columns into the
  *     dims are untouched (per-day/per-supplier densities grow N× — the
  *     traffic-growth scale shape).
  *   - `events` shifts `event_id` (uniqueness) and `ts` by i × 30 days
  *     (nanos at rest), so the stream horizon grows N× while per-window
  *     densities stay constant — watermark state must NOT grow with
  *     corpus size, which is exactly what the streaming queries claim.
  *   - `documents` shifts `doc_id` and suffixes every token with a
  *     per-replica lowercase tag (`regexp_replace`, one codegen'd pass;
  *     `n_chars` recomputed). Replica vocabularies are disjoint, so the
  *     intra-replica duplicate structure is preserved exactly N× and the
  *     near-dup pair count grows LINEARLY — duplicating text verbatim
  *     would instead create N-sized duplicate cliques and a quadratic
  *     pair blow-up that no real corpus growth produces.
  *   - `embeddings` shifts `vec_id`; vectors are copied as-is (queries
  *     are the replica-0 ids; corpus-side exact ties resolve through the
  *     deterministic id tie-breaks every ANN query already carries).
  */
object ScaleLake {
  def main(args: Array[String]): Unit = {
    val Array(src, out, fStr) = args
    val n = fStr.toInt
    val spark = Sessions.local()
    import graft.model.Tables

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      Tables.load(spark, src, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    def span(name: String, key: String): Long =
      Tables.load(spark, src, name).agg(max(col(key))).head.getLong(0) + 1L

    def replicate(name: String)(tf: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.load(spark, src, name)
      (0 until n).map(i => tf(base, i)).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    val ordSpan = span("orders", "o_orderkey")
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordSpan)) }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordSpan)) }

    // events goes through Tables.events (not the raw load): the at-rest ts
    // encoding varies by testdata generation (nanos-as-long, timestamp[us]
    // NTZ/UTC) and the reader normalizes all of them to micros
    // TimestampType; the replicated lake is written back as micros, one of
    // the legal encodings. Shift arithmetic rides exact unix micros.
    val monthMicros = 30L * 86400L * 1000000L
    val evBase = Tables.events(spark, src)
    val evSpan = evBase.agg(max(col("event_id"))).head.getLong(0) + 1L
    (0 until n).map { i =>
      evBase.withColumn("event_id", col("event_id") + lit(i * evSpan))
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(i * monthMicros)))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docSpan = span("documents", "doc_id")
    replicate("documents") { (df, i) =>
      // tag = "q" + two lowercase ASCII letters: the r18 single-char tag
      // ('a'+i) left ASCII at replica 31 and up, silently making UTF-8
      // byte length ≠ char length — which the byte-level multimodal
      // oracles (ord/length over chars vs payload bytes) correctly
      // flagged at the first hash-verified 100× run (scale_check r19,
      // q127: 62.7% of rows = replicas 31-99). Real corpora are of
      // course not ASCII — but the FIXTURE's contract is that replicas
      // preserve replica-0's structure exactly, and replica-0 is ASCII.
      val tagged =
        if (i == 0) df
        else df.withColumn("text",
            regexp_replace(col("text"), "(\\S+)",
              "$1q" + ('a' + i / 26).toChar + ('a' + i % 26).toChar))
          .withColumn("n_chars", length(col("text")).cast("long"))
      tagged.withColumn("doc_id", col("doc_id") + lit(i * docSpan)) }

    val vecSpan = span("embeddings", "vec_id")
    replicate("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecSpan)) }

    spark.stop()
  }
}
