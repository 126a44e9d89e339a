package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextOps
import graft.model.Tables

/** Round-10 pipeline operators: sub-document line-granularity dedup with
  * document reassembly (the MassiveText/CCNet "remove duplicated lines
  * everywhere, keep the rest" policy — a different contract from q181's
  * keep-first chunk dedup), plus two new stage hand-off formats (ORC and
  * JSON-lines) completing the S-family next to q66's CSV hop.
  *
  * Shared idioms with [[CurationOps]]: whitespace tokens = DuckDB
  * `string_split`, exact integer counts, md5 fingerprints identical in
  * both engines.
  */
object PipelineOps {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def fanned(s: SparkSession, d: String) =
    graft.etl.FanOut.fanOut(docs(s, d), col("doc_id"))

  /** Tokens per "line" for q195 — the corpus is single-line prose, so the
    * line structure every real crawl carries is derived deterministically:
    * fixed 10-token windows, replayed identically by the oracle. */
  val LineW = 10

  /** One ORC copy of the lineitem slice per (session, sf dir) — the
    * between-stage hand-off in a columnar format with its own writer
    * (predicate pushdown + column pruning work on ORC exactly as on
    * parquet; at 100 TB this is the cross-team hop where one side of the
    * lake is ORC). */
  private val orcStage = new graft.etl.Memo[(SparkSession, String), String]
  private def orcLineitemDir(s: SparkSession, d: String): String =
    orcStage((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-orc-stage").toString
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
        .write.mode("overwrite").orc(tmp)
      tmp
    }

  /** One JSON-lines copy of the documents table per (session, sf dir) —
    * the landing format most crawls actually arrive in. Written by Spark's
    * JSON sink, read back with the EXPLICIT pinned schema (schema
    * inference over 100 TB of JSONL is a full extra pass and a drift
    * hazard — production readers always pin). */
  private val jsonStage = new graft.etl.Memo[(SparkSession, String), String]
  private def jsonDocsDir(s: SparkSession, d: String): String =
    jsonStage((s, d)) {
      val tmp = graft.etl.Scratch.tempDir("graft-jsonl-stage").toString
      docs(s, d).write.mode("overwrite").json(tmp)
      tmp
    }

  /** The q195 operator over any (doc_id, lang, text) relation: remove
    * every [[LineW]]-token line whose exact text recurs anywhere in the
    * corpus (from ALL documents — repeated lines are boilerplate, no copy
    * is content), rebuild each document from its surviving lines in
    * order, and emit the per-document curation record. */
  def lineDedupRebuild(docsDf: DataFrame): DataFrame = {
    val lines = docsDf
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(1, size(toks), $LineW), st -> struct(" +
          s"CAST((st - 1) div $LineW AS BIGINT) AS ci, " +
          s"array_join(slice(toks, st, $LineW), ' ') AS lt, " +
          s"CAST(size(slice(toks, st, $LineW)) AS BIGINT) AS ln))")).as("e"))
      .select(col("doc_id"), col("lang"), col("e.ci").as("ci"),
        col("e.lt").as("lt"), col("e.ln").as("ln"))
    lines
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(md5(col("lt")))))
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("occ") < 2, 1)).cast("long").as("n_kept"),
        coalesce(sum(when(col("occ") >= 2, col("ln"))), lit(0L))
          .cast("long").as("tokens_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("occ") < 2,
              struct(col("ci"), col("lt"))))),
            x => x.getField("lt")),
          " ")).as("rebuilt_md5"))
      .orderBy("doc_id")
  }

  val defs: Vector[Q] = Vector(

    // ── Line-granularity dedup with document REASSEMBLY: every 10-token
    //    line whose exact text recurs anywhere in the corpus is removed
    //    from EVERY document (the MassiveText "repeated lines are
    //    boilerplate, none of the copies is content" policy — unlike
    //    q181's keep-first, which preserves one copy), and each document
    //    is rebuilt from its surviving lines in order. Output is the
    //    per-document curation record: kept/removed accounting plus the
    //    md5 of the rebuilt text, which IS the operator's payload (the
    //    rebuilt corpus), hash-verified. Plan: one shuffle on the line
    //    fingerprint (high-cardinality md5 key — the occurrence count is
    //    a window over that key), one shuffle on doc_id for the ordered
    //    reassembly (array_sort over collected (ci, line) structs — no
    //    single-reducer window). At 100 TB both keys are dense and
    //    uniform; nothing is ever compared pairwise.
    Q("q195_line_dedup_rebuild",
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
         |l AS (SELECT doc_id, lang, CAST((st - 1) // $LineW AS BIGINT) AS ci,
         |             array_to_string(toks[st:st+${LineW - 1}], ' ') AS lt,
         |             len(toks[st:st+${LineW - 1}]) AS ln
         |      FROM (SELECT doc_id, lang, toks,
         |                   unnest(range(1, len(toks) + 1, $LineW)) AS st
         |            FROM t WHERE len(toks) >= 1)),
         |o AS (SELECT *, count(*) OVER (PARTITION BY lt) AS occ FROM l)
         |SELECT doc_id, lang,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(count(*) FILTER (WHERE occ < 2) AS BIGINT) AS n_kept,
         |       CAST(coalesce(sum(ln) FILTER (WHERE occ >= 2), 0) AS BIGINT) AS tokens_removed,
         |       md5(coalesce(string_agg(lt, ' ' ORDER BY ci) FILTER (WHERE occ < 2), '')) AS rebuilt_md5
         |FROM o GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin) { (s, d) =>
      lineDedupRebuild(fanned(s, d))
    },

    // ── ORC stage round-trip (S-family, next to q66's CSV hop): the
    //    lineitem slice written by Spark's ORC sink, read back by the ORC
    //    source, and aggregated — proving the second columnar format
    //    loses no row, cent, or timestamp microsecond across the hop.
    //    The oracle aggregates the ORIGINAL parquet, so the entire
    //    write→read cycle is inside the verified path. Cents ride exact
    //    integers; the NTZ ship date is compared as epoch micros.
    Q("q196_orc_stage_roundtrip",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS gross,
        |       epoch_us(CAST(max(l_shipdate) AS TIMESTAMP)) AS max_ship_us
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      s.read.orc(orcLineitemDir(s, d))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("total_qty"),
          (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("gross"),
          unix_micros(max(col("l_shipdate")).cast("timestamp")).as("max_ship_us"))
        .orderBy("l_returnflag")
    },

    // ── JSON-lines stage round-trip: the documents table through Spark's
    //    JSON sink and back under the pinned schema — the crawl-landing
    //    hop. The aggregate re-derives length(text) AFTER the hop and
    //    sums it against the original n_chars, so any JSON escaping /
    //    unicode mangling in either direction breaks the hash. Reading
    //    with the explicit schema (never inference) is the 100 TB
    //    contract: inference is a second full pass over the lake.
    Q("q197_jsonl_stage_roundtrip",
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |       min(md5(text)) AS min_md5
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      s.read.schema(graft.model.Schemas.documents).json(jsonDocsDir(s, d))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(length(col("text"))).cast("long").as("sum_len"),
          min(md5(col("text"))).as("min_md5"))
        .orderBy("lang", "source")
    }
  )
}
