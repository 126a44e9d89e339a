package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.etl.SnapshotLake

/** Stream offset = the newest lake version this stream has FULLY
  * emitted, plus (under file-granular admission control) how many
  * add-files of the NEXT version it has already emitted — Delta's
  * (reservoirVersion, index) offset shape. `part` = 0 is the plain
  * whole-version form and serializes as the bare version number, so
  * checkpoints written before admission control replay unchanged. The
  * manifest log IS the write-ahead log: an add list is immutable and
  * ordered, so (version, part) identifies an exact file frontier. */
final case class GraftLakeOffset(version: Long, part: Long = 0L)
    extends Offset {
  override def json(): String =
    if (part == 0L) version.toString
    else s"""{"v":$version,"p":$part}"""
}

object GraftLakeOffset {
  def parse(json: String): GraftLakeOffset = {
    val t = json.trim
    if (!t.startsWith("{")) GraftLakeOffset(t.toLong)
    else {
      def num(k: String): Long = {
        val m = s""""$k":""".r.findFirstMatchIn(t).getOrElse(
          throw new IllegalArgumentException(s"bad graftlake offset: $json"))
        t.substring(m.end).takeWhile(c => c.isDigit || c == '-').toLong
      }
      GraftLakeOffset(num("v"), num("p"))
    }
  }
}

/** The connector's streaming source — `spark.readStream
  * .format("graftlake")` — the [[graft.streaming.LakeTail]] contract
  * behind Spark's standard micro-batch machinery:
  *
  *   - **Offsets are lake versions.** `latestOffset` reads the head
  *     pointer; `planInputPartitions(start, end)` walks the commit
  *     records of versions `(start, end]` and emits each APPEND
  *     commit's added files as that batch's input partitions — read
  *     straight from the commit's own `add` list, no diff join, cost =
  *     the batch's data mass (an append's files ARE its rows).
  *   - **Change commits**: a merge/delete/restore is a CHANGE commit an
  *     append-only consumer must opt out of — with
  *     `.option("skipChangeCommits", "true")` (Delta's option) the
  *     version advances and feeds nothing; without it the stream FAILS
  *     with a clear error rather than silently dropping or duplicating
  *     rows. Physical-only rewrites (compact/Z-order) are always
  *     skipped: re-emitting a compaction would re-feed the whole table.
  *   - **`startingVersion`** (default 1 = the whole history; for an
  *     append-built lake version 1 onward IS the initial snapshot) and
  *     **`maxVersionsPerTrigger`** (admission control: at most N source
  *     versions per micro-batch) mirror Delta's source options.
  *   - **`maxFilesPerTrigger` / `maxBytesPerTrigger`** — FILE-granular
  *     admission control (Delta's same-named options): a fat commit is
  *     split across triggers at file boundaries, the offset carrying
  *     (version, files-emitted-of-next-version). Every trigger admits
  *     at least one file however small the byte cap (the soft-max
  *     contract), and the (start, end] file slice is deterministic —
  *     add lists are immutable and ordered — so restart replay stays
  *     byte-identical and exactly-once sinks are unaffected.
  *   - **Restart** replays from the checkpointed offset:
  *     `planInputPartitions` is deterministic in (start, end] — the
  *     manifest records are immutable — so a restarted batch re-reads
  *     byte-identical input, the property exactly-once sinks
  *     (`appendOnce` on a destination lake) build on. Retention
  *     contract: the checkpoint must stay within the source's vacuum
  *     window, like every incremental reader.
  *
  * Batches read through the same vectorized reader factory as batch
  * scans (column pruning included — `required` is the pruned schema).
  */
final class GraftLakeMicroBatchStream(root: String, rootAbs: String,
                                      required: StructType,
                                      startingVersion: Long,
                                      skipChangeCommits: Boolean,
                                      maxVersionsPerTrigger: Option[Long],
                                      hconf: SerializableConfiguration,
                                      exact: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                                      fullSchema: StructType = new StructType(),
                                      maxFilesPerTrigger: Option[Long] = None,
                                      maxBytesPerTrigger: Option[Long] = None,
                                      cdf: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(!cdf || (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty),
    "CDF stream admission is version-granular — a commit's change set " +
      "is atomic; use maxVersionsPerTrigger")

  /** Trigger.AvailableNow's drain bound: the head version captured when
    * the trigger starts — batches step toward it (the per-trigger caps
    * at a time) and the query stops there, commits racing the drain
    * left for the next run (Spark's AvailableNow contract). */
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound =
      Some(SnapshotLake.currentVersion(root).getOrElse(startingVersion - 1))

  override def initialOffset(): Offset = GraftLakeOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    GraftLakeOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control form")

  /** The add-files a version feeds the stream (empty for the skipped
    * commit kinds). `strict` applies the fail-on-change-commit contract;
    * admission WALKS with strict=false so the error surfaces when the
    * batch is planned, with the version in hand, not while sizing it. */
  private def emittable(v: Long, strict: Boolean): Seq[String] = {
    val (op, add) = SnapshotLake.commitChange(root, v)
    op match {
      case "append" => add
      case "compact" => Nil // physical-only: never re-emitted
      case "evolve" => Nil // metadata-only: no row ever changes
      case _ if skipChangeCommits || !strict => Nil
      case other => throw new UnsupportedOperationException(
        s"graftlake streaming source hit a change commit (version $v, " +
          s"op '$other'). An append-only stream cannot represent it; " +
          "set .option(\"skipChangeCommits\", \"true\") to skip change " +
          "commits, or follow changes with the CDC feed instead.")
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableNowBound.getOrElse(
      SnapshotLake.currentVersion(root).getOrElse(startingVersion - 1))
    val s = start.asInstanceOf[GraftLakeOffset]
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      // version-granular admission (or none): the original contract
      return GraftLakeOffset(maxVersionsPerTrigger match {
        case Some(n) => math.min(head, s.version + math.max(1L, n))
        case None => head
      })
    // file-granular admission: pack whole files up to the caps, splitting
    // INSIDE a commit when it alone exceeds them; always admit at least
    // one file (the soft-max contract — a file bigger than maxBytes must
    // still flow). Caps compose: maxVersionsPerTrigger still bounds how
    // many source versions one batch may span.
    var v = s.version
    var p = s.part
    var files = 0L
    var bytes = 0L
    var versions = 0L
    var full = false
    while (!full && v < head &&
        maxVersionsPerTrigger.forall(n => versions < math.max(1L, n))) {
      val add = emittable(v + 1, strict = false)
      var i = p
      while (!full && i < add.size) {
        val sz = java.nio.file.Files.size(
          java.nio.file.Paths.get(root, add(i.toInt)))
        val wouldExceed =
          maxFilesPerTrigger.exists(n => files + 1 > math.max(1L, n)) ||
            maxBytesPerTrigger.exists(b => bytes + sz > b)
        if (wouldExceed && files > 0) full = true
        else { files += 1; bytes += sz; i += 1 }
      }
      if (i == add.size) { v += 1; p = 0; versions += 1 }
      else p = i // the caps landed inside this commit: split it here
    }
    GraftLakeOffset(v, p)
  }

  override def reportLatestOffset(): Offset =
    GraftLakeOffset(SnapshotLake.currentVersion(root)
      .getOrElse(startingVersion - 1))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLakeOffset]
    val e = end.asInstanceOf[GraftLakeOffset]
    // CDF mode: each version's CHANGE batch — append files as constant
    // 'insert' partitions, change commits' materialized feeds — whole
    // versions only (the ctor refuses file-granular caps with cdf)
    if (cdf)
      return ((s.version + 1) to e.version).flatMap(v =>
        GraftLakeCdf.partitions(root, rootAbs, v, skipChangeCommits)).toArray
    // versions (s.version, e.version] fully, plus the first e.part files
    // of e.version+1; s.part files of s.version+1 were already emitted.
    // Deterministic in (start, end]: add lists are immutable and ordered,
    // so a restarted batch re-reads byte-identical input.
    val last = if (e.part > 0L) e.version + 1 else e.version
    ((s.version + 1) to last).flatMap { v =>
      val add = emittable(v, strict = true)
      val from = if (v == s.version + 1) s.part else 0L
      val until = if (v == e.version + 1) e.part else add.size.toLong
      add.slice(from.toInt, until.toInt).map { f =>
        GraftLakeInputPartition(s"$rootAbs/$f",
          java.nio.file.Files.size(java.nio.file.Paths.get(root, f)),
          GraftLakeScan.partTupleOf(f) :+ ("_file" -> f))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the scan accepted these filters as EXACT (pushed, not residual) —
    // the streaming readers apply them just like the batch readers do
    new GraftLakeReaderFactory(required, None, hconf, exact, fullSchema)

  override def commit(end: Offset): Unit = () // progress lives in the checkpoint
  override def stop(): Unit = ()
}

/** One epoch-task's contribution: the task file it wrote (empty for a
  * zero-row partition — no file is even created) plus its row count. */
final case class GraftLakeFilesMsg(files: Seq[String], rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** The connector's streaming SINK — `df.writeStream
  * .format("graftlake")` — the write half of the streaming story:
  * executors write their epoch-task parquet files straight into the
  * lake's data area through Spark's own [[org.apache.spark.sql
  * .execution.datasources.parquet.ParquetWriteSupport]] (the same
  * encoder the built-in sink uses), and the DRIVER turns each epoch's
  * commit messages into ONE tagged manifest commit
  * ([[graft.etl.SnapshotLake.commitStreamedFiles]]) — sidecar indexes
  * harvested like any commit (`.option("statsCols", ...)` /
  * `.option("bloomCol", ...)` work).
  *
  * Exactly-once: the epoch tag is `stream-<queryId>-e<epochId>`
  * (queryId = the checkpoint-stable streaming query id) — a
  * crash-replayed epoch finds its tag and commits nothing; its re-run
  * task files, like any attempt that lost the task-commit
  * coordination, stay unreferenced orphans for vacuum. That is the
  * appendOnce contract surfaced through the standard sink API, so
  * `readStream.format("graftlake") → writeStream.format("graftlake")`
  * is an end-to-end exactly-once lake-to-lake pipeline with no
  * foreachBatch glue. */
final class GraftLakeStreamingWrite(root: String, rootAbs: String,
                                    schema: org.apache.spark.sql.types.StructType,
                                    index: SnapshotLake.IndexSpec,
                                    queryId: String,
                                    hconf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  // files must land under PHYSICAL column names (the column-mapping
  // invariant every reader relies on); resolved once at write
  // construction — the stream's analyzed schema is of this moment's
  // logical names. Identity on unmapped lakes, or before the first commit.
  private val physSchema: org.apache.spark.sql.types.StructType = {
    val m = if (SnapshotLake.currentVersion(root).isEmpty) Map.empty[String, String]
            else SnapshotLake.columnMapping(root)
    if (m.isEmpty) schema
    else org.apache.spark.sql.types.StructType(
      schema.fields.map(f => f.copy(name = m.getOrElse(f.name, f.name))))
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftLakeStreamWriterFactory(rootAbs, physSchema, queryId, hconf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.collect { case m: GraftLakeFilesMsg => m.files }.flatten
    // Epoch commits ride the GROUP coalescer: with one query per table
    // this is byte-identical to the solo tagged CAS (a batch of one
    // writes the legacy `tag` field), and with N queries sharing a
    // table their epochs coalesce into multi-tag links instead of
    // racing the head once per epoch per trigger — the object-store
    // RTT case CommitContention phase 5 prices.
    SnapshotLake.commitStreamedFilesGrouped(
      org.apache.spark.sql.SparkSession.active, root, files,
      s"stream-$queryId-e$epochId", index)
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    // nothing was linked into any manifest: the written task files are
    // unreferenced orphans, exactly what vacuum's sweep exists for
    ()
}

final case class GraftLakeStreamWriterFactory(
    rootAbs: String, schema: org.apache.spark.sql.types.StructType,
    queryId: String, hconf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new GraftLakeDataWriter(rootAbs,
      // epoch-deterministic DIRECTORY, attempt-unique FILE name: a
      // replayed epoch (or a speculative attempt) never collides with
      // a live writer, and only committed messages' names are linked
      s"data/stream-$queryId-e$epochId",
      f"part-$partitionId%05d-t$taskId.parquet", schema, hconf.value)
}

/** Task-side parquet writer over InternalRow — lazily opened so a
  * zero-row partition writes nothing at all. */
final class GraftLakeDataWriter(rootAbs: String, relDir: String,
                                fileName: String,
                                schema: org.apache.spark.sql.types.StructType,
                                conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

  private var rows = 0L
  private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _

  private final class RowWriterBuilder(path: org.apache.hadoop.fs.Path)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(c: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private def open(): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(rootAbs, relDir))
    val c = new org.apache.hadoop.conf.Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    writer = new RowWriterBuilder(
      new org.apache.hadoop.fs.Path(s"$rootAbs/$relDir/$fileName"))
      .withConf(c)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(record: InternalRow): Unit = {
    if (writer == null) open()
    writer.write(record)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftLakeFilesMsg(if (rows > 0) Seq(s"$relDir/$fileName") else Nil, rows)
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    if (writer != null) { writer.close(); writer = null }
  }
}
