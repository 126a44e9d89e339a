package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.SnapshotLake

/** The connector's change-data-feed surface: batch and streaming
  * `readChangeFeed` reads over an enabled lake must equal the native
  * [[SnapshotLake.changeFeed]] classification per version — appends as
  * file-exact inserts, merges/DV-deletes from the write-time
  * materialized feed — with range options bounding the versions and a
  * non-enabled lake refusing on change commits. */
class GraftLakeCdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft-cdf-$tag").toString

  private def kv(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  private val idx = SnapshotLake.IndexSpec(Seq("k"), None)

  /** v1 append (0..5), v2 append (5..8), v3 merge (update k=1, delete
    * k=3), v4 deleteWhere (k=6 tombstone), v5 compact. */
  private def buildSrc(root: String): Unit = {
    SnapshotLake.enableCdf(root, "k")
    SnapshotLake.append(kv(0, 5), root, idx) // v1
    SnapshotLake.append(kv(5, 8), root, idx) // v2
    SnapshotLake.merge(spark, root,
      Seq((1L, "X1", false), (3L, "dead", true)).toDF("k", "v", "__del"),
      "k", idx, Some("__del")) // v3: change commit, CDC materialized
    SnapshotLake.deleteWhere(spark, root, Seq(6L).toDF("k")) // v4: DV
    SnapshotLake.compact(spark, root) // v5: physical-only, zero changes
  }

  private def changes(df: DataFrame): Set[(Long, String, Long, String)] =
    df.collect().map(r => (r.getAs[Long]("k"),
      Option(r.getAs[String]("v")).getOrElse("∅"),
      r.getAs[Long]("_commit_version"),
      r.getAs[String]("_change_type"))).toSet

  private val fullFeed: Set[(Long, String, Long, String)] =
    (0L until 5L).map(i => (i, s"v$i", 1L, "insert")).toSet ++
      (5L until 8L).map(i => (i, s"v$i", 2L, "insert")) ++
      Set((1L, "v1", 3L, "update_preimage"), (1L, "X1", 3L, "update_postimage"),
        (3L, "v3", 3L, "delete"),
        (6L, "v6", 4L, "delete"))

  test("batch readChangeFeed equals the native feed; version ranges bound it; columns prune") {
    val root = newDir("batch") + "/lake"
    buildSrc(root)
    val all = spark.read.format("graftlake")
      .option("readChangeFeed", "true").load(root)
    assert(all.schema.fieldNames.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
    assert(changes(all) == fullFeed)
    // write-time materialization: the merge and the DV delete have
    // their feeds on disk already; compact never materializes
    assert(SnapshotLake.cdcFiles(root, 3L).exists(_.nonEmpty))
    assert(SnapshotLake.cdcFiles(root, 4L).isDefined)
    assert(SnapshotLake.cdcFiles(root, 5L).isEmpty)
    // ranges: ending bounds the head side, starting the tail
    val v12 = spark.read.format("graftlake")
      .option("readChangeFeed", "true").option("endingVersion", "2").load(root)
    assert(changes(v12) == fullFeed.filter(_._3 <= 2L))
    val v34 = spark.read.format("graftlake")
      .option("readChangeFeed", "true")
      .option("startingVersion", "3").load(root)
    assert(changes(v34) == fullFeed.filter(_._3 >= 3L))
    // column pruning through the same reader factory
    val pruned = spark.read.format("graftlake")
      .option("readChangeFeed", "true").option("startingVersion", "3")
      .load(root).select("k", "_change_type")
    assert(pruned.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      fullFeed.filter(_._3 >= 3L).map(t => (t._1, t._4)))
    // a pinned read and a change range are different questions
    intercept[Exception](spark.read.format("graftlake")
      .option("readChangeFeed", "true").option("versionAsOf", "2")
      .load(root).count())
    // the feed is read-only
    intercept[Exception](kv(0, 1).write.format("graftlake").mode("append")
      .option("readChangeFeed", "true").save(root))
  }

  test("a change commit without enablement refuses; an append-only range still reads") {
    val root = newDir("noenable") + "/lake"
    SnapshotLake.append(kv(0, 4), root, idx) // v1
    SnapshotLake.merge(spark, root,
      Seq((0L, "X0", false)).toDF("k", "v", "__del"),
      "k", idx, Some("__del")) // v2: change commit, NOT materialized
    val inserts = spark.read.format("graftlake")
      .option("readChangeFeed", "true").option("endingVersion", "1").load(root)
    assert(changes(inserts) == (0L until 4L).map(i => (i, s"v$i", 1L, "insert")).toSet)
    val e = intercept[Exception](spark.read.format("graftlake")
      .option("readChangeFeed", "true").load(root).count())
    assert(e.getMessage != null && e.getMessage.contains("enableCdf"),
      s"the refusal must point at enablement: ${e.getMessage}")
    // skipChangeCommits degrades the feed to appends-only instead
    val skipped = spark.read.format("graftlake")
      .option("readChangeFeed", "true").option("skipChangeCommits", "true")
      .load(root)
    assert(changes(skipped) == (0L until 4L).map(i => (i, s"v$i", 1L, "insert")).toSet)
  }

  test("streaming readChangeFeed: per-version batches drive an exactly-once follower") {
    val root = newDir("stream") + "/lake"
    buildSrc(root)
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[Set[(Long, String, Long, String)]]
    val ckpt = newDir("cp")
    def drainFeed(): Unit = {
      val q = spark.readStream.format("graftlake")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1").load(root)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          val c = changes(df)
          batches.synchronized { batches += c }; ()
        }
        .start()
      assert(q.awaitTermination(120000), "drain must finish")
    }
    drainFeed()
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.size == 4, // v1, v2, v3, v4 feed; v5 compact is empty
      s"one change batch per feeding version: ${batches.map(_.size)}")
    assert(nonEmpty.map(_.map(_._3)).forall(_.size == 1),
      "a micro-batch never mixes source versions (atomic change sets)")
    assert(batches.flatten.toSet == fullFeed)
    // restart replay: caught up, nothing re-fed
    val before = batches.size
    drainFeed()
    assert(batches.drop(before).forall(_.isEmpty))
    // new source commits flow through the same checkpoint
    SnapshotLake.append(kv(100, 102), root, idx) // v6
    drainFeed()
    assert(batches.drop(before).flatten.toSet ==
      Set((100L, "v100", 6L, "insert"), (101L, "v101", 6L, "insert")))
  }
}
