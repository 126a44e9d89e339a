package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The multimodal plumbing: binary payload round-trip, typed metadata,
  * and the batched mapPartitions decode seam. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs = graft.model.Tables.documents(spark, TestSpark.Sf)

  test("metadata is derivable without decoding and matches payload bytes") {
    val meta = Multimodal.withMeta(Multimodal.asMedia(docs))
      .select("doc_id", "payload", "meta.n_bytes", "meta.checksum")
      .collect()
    assert(meta.nonEmpty)
    meta.take(20).foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(r.getAs[Int]("n_bytes") == payload.length)
      val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val hex = String.format("%032x", new java.math.BigInteger(1, digest))
      assert(r.getAs[String]("checksum") == hex)
    }
  }

  test("decodeFeatures produces one fixed-shape record per input, deterministically") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asMedia(docs)
    val out1 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(out1.length == docs.count())
    assert(out1.forall(_.features.length == Multimodal.FeatureDim))
    // partitioning must not change decoded output
    assert(out1.map(f => (f.doc_id, f.checksum, f.features.toSeq)).toSeq ==
      out2.map(f => (f.doc_id, f.checksum, f.features.toSeq)).toSeq)
  }

  test("frameSample reassembles to the exact sampled byte subsequence") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val payload = (0 until 300).map(i => (i % 251).toByte).toArray
    val media = Seq((1L, "s", payload)).toDF("doc_id", "source", "payload")
    val frames = Multimodal.frameSample(media, frameBytes = 64, every = 3)
      .collect().sortBy(_.frame_idx)
    // 300 bytes -> frames 0..4 (last is 44 bytes); sampled: 0 and 3
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3))
    assert(frames(0).frame.toSeq == payload.slice(0, 64).toSeq)
    assert(frames(1).frame.toSeq == payload.slice(192, 256).toSeq)
  }

  test("resizeStub caps length, keeps first byte, and is a no-op when small") {
    val big = (0 until 1000).map(_.toByte).toArray
    val out = Multimodal.resizeStub(big, 100)
    assert(out.length == 100)
    assert(out(0) == big(0))
    val small = Array[Byte](1, 2, 3)
    assert(Multimodal.resizeStub(small, 100).toSeq == small.toSeq)
  }

  test("decode stub batches respect the batch-size contract") {
    val records = (1L to 150L).map(i =>
      Multimodal.MediaRecord(i, "s", s"payload-$i".getBytes))
    val out = Multimodal.DecodeStub.decodeBatch(records)
    assert(out.map(_.doc_id) == records.map(_.doc_id), "order-preserving")
  }

  test("dHash: identical payloads collide, a localized brightness edit stays near, scramble goes far") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // sawtooth payload: alternating low/high bytes give a gradient-rich
    // signature (a uniform payload has a near-empty dhash and everything
    // "collides" — the perceptual-hash analogue of a blank image)
    val base = Array.tabulate(104)(i => (if (i % 2 == 0) 50 else 200).toByte)
    // byte 40 is dhash sample 13 ((13*104)/33); its left neighbor sample
    // (byte 37) is high, so raising it to 255 flips exactly bit 12
    val near = base.clone(); near(40) = 255.toByte
    // phase-swapped sawtooth inverts every defined gradient bit
    val far = Array.tabulate(104)(i => (if (i % 2 == 0) 200 else 50).toByte)
    val media = Seq(
      (1L, "s", base), (2L, "s", base), (3L, "s", near), (4L, "s", far))
      .toDF("doc_id", "source", "payload")
    val h = Multimodal.dhashes(media).collect().map(r => r.doc_id -> r.dhash).toMap
    assert(h(1L) == h(2L), "identical payloads must share the dhash")
    val nearHam = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(nearHam >= 1 && nearHam <= Multimodal.DhashBands - 1,
      s"localized edit should move few bits, got $nearHam")
    val pairs = Multimodal.dhashPairs(media, Multimodal.DhashBands - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"banding must surface the exact and near pairs: $pairs")
    assert(!pairs.contains((1L, 4L)), "scrambled payload must not pair")
  }

  test("dHash banding recall is exact on the real corpus: pairs == all-pairs <= maxHamming") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asMedia(docs)
    val maxHamming = Multimodal.DhashBands - 1
    val banded = Multimodal.dhashPairs(media, maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Multimodal.dhashes(media).collect()
    val brute = (for {
      a <- sigs; b <- sigs if a.doc_id < b.doc_id
      ham = java.lang.Long.bitCount(a.dhash ^ b.dhash) if ham <= maxHamming
    } yield (a.doc_id, b.doc_id, ham)).toSet
    assert(banded == brute,
      s"banded pairs must equal brute-force pairs: ${banded.size} vs ${brute.size}")
    assert(brute.nonEmpty, "corpus should contain at least one perceptual near-dup pair")
  }

  test("waveform frames carry exact integer energy/peak per frame") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // 70 bytes at frameBytes=32 -> frames of 32, 32, 6
    val payload = (0 until 70).map(i => ((i * 7) % 256).toByte).toArray
    val media = Seq((9L, "s", payload)).toDF("doc_id", "source", "payload")
    val frames = Multimodal.waveform(media, frameBytes = 32)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    frames.foreach { f =>
      val slice = payload.slice(f.frame_idx * 32, math.min(f.frame_idx * 32 + 32, 70))
        .map(_ & 0xff)
      assert(f.energy == slice.map(_.toLong).sum, s"energy frame ${f.frame_idx}")
      assert(f.peak == slice.max, s"peak frame ${f.frame_idx}")
    }
    // partitioning must not change frame stats
    val re = Multimodal.waveform(media.repartition(5), frameBytes = 32)
      .collect().sortBy(_.frame_idx)
    assert(re.map(f => (f.frame_idx, f.energy, f.peak)).toSeq ==
      frames.map(f => (f.frame_idx, f.energy, f.peak)).toSeq)
  }
}
