package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.etl.SnapshotLake

/** Stream offset = the newest lake version whose commit this stream has
  * fully emitted. The manifest log IS the write-ahead log, so offsets
  * are just version numbers — Delta's streaming-source design. */
final case class GraftLakeOffset(version: Long) extends Offset {
  override def json(): String = version.toString
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
                                      hconf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow's drain bound: the head version captured when
    * the trigger starts — batches step toward it (maxVersionsPerTrigger
    * at a time) and the query stops there, commits racing the drain
    * left for the next run (Spark's AvailableNow contract). */
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound =
      Some(SnapshotLake.currentVersion(root).getOrElse(startingVersion - 1))

  override def initialOffset(): Offset = GraftLakeOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    GraftLakeOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control form")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableNowBound.getOrElse(
      SnapshotLake.currentVersion(root).getOrElse(startingVersion - 1))
    val s = start.asInstanceOf[GraftLakeOffset].version
    GraftLakeOffset(maxVersionsPerTrigger match {
      case Some(n) => math.min(head, s + math.max(1L, n))
      case None => head
    })
  }

  override def reportLatestOffset(): Offset =
    GraftLakeOffset(SnapshotLake.currentVersion(root)
      .getOrElse(startingVersion - 1))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLakeOffset].version
    val e = end.asInstanceOf[GraftLakeOffset].version
    ((s + 1) to e).flatMap { v =>
      val (op, add) = SnapshotLake.commitChange(root, v)
      op match {
        case "append" =>
          add.map { f =>
            GraftLakeInputPartition(s"$rootAbs/$f",
              java.nio.file.Files.size(java.nio.file.Paths.get(root, f)),
              GraftLakeScan.partTupleOf(f))
          }
        case "compact" => Nil // physical-only: never re-emitted
        case other if skipChangeCommits => Nil
        case other => throw new UnsupportedOperationException(
          s"graftlake streaming source hit a change commit (version $v, " +
            s"op '$other'). An append-only stream cannot represent it; " +
            "set .option(\"skipChangeCommits\", \"true\") to skip change " +
            "commits, or follow changes with the CDC feed instead.")
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLakeReaderFactory(required, None, hconf)

  override def commit(end: Offset): Unit = () // progress lives in the checkpoint
  override def stop(): Unit = ()
}
