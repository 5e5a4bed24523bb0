package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "hello world"), (2L, "x" * 250)).toDF("id", "payload"),
    "id", "payload", "fake")

  test("asMediaTable produces the binary + typed-metadata contract") {
    val schema = media.schema
    assert(schema("media").dataType == BinaryType)
    assert(schema("meta").dataType.typeName == "struct")
    val r = media.filter(col("media_id") === 1).first()
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") == 11L)
  }

  test("decodeMeta runs the stub decoder per partition, deterministic") {
    val out = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Long]("n_bytes"))).toMap
    assert(out(1L)._3 == 11L)
    assert(out(1L)._1 >= 64 && out(1L)._1 < 128)
    // determinism across runs
    val again = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Long]("n_bytes"))).toMap
    assert(out == again)
  }

  test("sampleFrames: stride-1 frames reassemble the payload") {
    val frames = Multimodal.sampleFrames(media, blockSize = 100, stride = 1)
      .filter(col("media_id") === 2)
      .orderBy("frame_idx").collect()
    assert(frames.length == 3) // 250 bytes → blocks of 100,100,50
    assert(frames.map(_.getAs[Int]("frame_bytes")).toSeq == Seq(100, 100, 50))
  }

  test("sampleFrames: stride skips blocks; hashes match per-slice md5") {
    // 250 bytes → blocks (100,100,50); stride 2 keeps blocks 0 and 2
    val frames = Multimodal.sampleFrames(media, blockSize = 100, stride = 2)
      .filter(col("media_id") === 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1))
    assert(frames.map(_.getAs[Int]("frame_bytes")).toSeq == Seq(100, 50))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames.map(_.getAs[String]("frame_hash")).toSeq ==
      Seq(md5hex("x" * 100), md5hex("x" * 50)))
  }

  test("sampleFrames: zero-length media yields zero frames") {
    val empty = Multimodal.asMediaTable(
      Seq((9L, "")).toDF("id", "payload"), "id", "payload", "fake")
    assert(Multimodal.sampleFrames(empty, 100, 1).count() == 0)
  }

  test("pcmWindowEnergy: exact integer energy, and empty payloads emit no rows") {
    // "hello world" = 11 bytes → windows of 4 samples: 4, 4, 3
    val withEmpty = Multimodal.asMediaTable(
      Seq((1L, "hello world"), (9L, "")).toDF("id", "payload"),
      "id", "payload", "audio")
    val out = Multimodal.pcmWindowEnergy(withEmpty, sampleRate = 8000,
      windowSamples = 4, activeThreshold = 1L)
      .orderBy("media_id", "window_idx").collect()
    // empty payload: sequence(1, 0) would count DOWN and emit two
    // phantom samples without the guard — must emit nothing instead
    assert(out.forall(_.getAs[Long]("media_id") == 1L))
    assert(out.map(_.getAs[Long]("n_samples")).toSeq == Seq(4L, 4L, 3L))
    val bytes = "hello world".getBytes("UTF-8").map(b => (b & 0xff).toLong)
    val expected = bytes.grouped(4)
      .map(w => w.map(v => (v - 128) * (v - 128)).sum).toSeq
    assert(out.map(_.getAs[Long]("energy")).toSeq == expected)
  }

  test("perceptualHash: exact dups collide, banded pairs ≡ brute force") {
    // 40 docs: 4 exact-dup pairs (identical payload → identical plane →
    // hamming 0) among distinct fillers
    val rnd = new scala.util.Random(7)
    val docs = (0L until 32L).map(i =>
      (i, Seq.fill(60)(rnd.nextInt(1000).toString).mkString(" "))) ++
      (0 until 4).map(i => (100L + i, ("dup payload " * 20) + i)) ++
      (0 until 4).map(i => (200L + i, ("dup payload " * 20) + i))
    val media = Multimodal.asMediaTable(docs.toDF("id", "payload"),
      "id", "payload", "image")
    val ph = Multimodal.perceptualHash(media, width = 64)
    assert(ph.count() == 40)
    val hashes = ph.collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    (0 until 4).foreach(i => assert(hashes(100L + i) == hashes(200L + i)))
    // law: the pigeonhole-banded pairs equal the brute-force scan
    val maxDist = 3
    val banded = Multimodal.phashNearDups(media, 64, maxDist).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming"))).toSet
    val brute = (for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= maxDist
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
    assert(banded == brute)
    assert((0 until 4).forall(i =>
      banded.contains((100L + i, 200L + i, 0L))))
  }

  test("servePhashDedup: history wins, within-batch min-id, fresh is fresh") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phashstore").toString
    def mt(rows: Seq[(Long, String)]) = Multimodal.asMediaTable(
      rows.toDF("id", "payload"), "id", "payload", "image")
    val shared = "the very same payload " * 10
    val hist = mt(Seq(5L -> shared, 6L -> ("history only " * 12)))
    Multimodal.writePhashStore(hist, width = 64, dir)
    // batch: 10 matches history 5 AND batch 11; 11 matches 10; 12 fresh
    val batch = mt(Seq(10L -> shared, 11L -> shared,
      12L -> ("completely different and fresh " * 9)))
    val out = Multimodal.servePhashDedup(spark, dir, batch,
        width = 64, maxDist = 3)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("is_fresh"))).toMap
    assert(out(10L) == (Some(5L), false)) // history 5 beats batch peer 11
    assert(out(11L) == (Some(5L), false)) // history wins over batch 10
    assert(out(12L) == (None, true))
  }

  test("appendPhash absorption: batch-2 copies of batch-1 keepers are caught; " +
      "the batchCut fence hides a batch's own absorbed hashes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phashstream").toString
    def mt(rows: Seq[(Long, String)]) = Multimodal.asMediaTable(
      rows.toDF("id", "payload"), "id", "payload", "image")
    Multimodal.writePhashStore(mt(Seq(1L -> ("history doc " * 15))),
      width = 64, dir)
    val novel = "a brand new crawl image " * 10
    val b1 = mt(Seq(10L -> novel))
    val s1 = Multimodal.servePhashDedup(spark, dir, b1, 64, 3,
      batchCut = Some(1L))
    assert(s1.filter(col("is_fresh")).count() == 1)
    Multimodal.appendPhash(
      Multimodal.perceptualHash(b1, 64).select(col("media_id"), col("dhash")),
      dir, batchId = 1L)
    // the fence: re-serving batch 1 under b < 1 (redelivery) must NOT
    // see its own absorbed hash — byte-identical fresh verdict
    val s1again = Multimodal.servePhashDedup(spark, dir, b1, 64, 3,
      batchCut = Some(1L))
    assert(s1again.filter(col("is_fresh")).count() == 1)
    // unfenced poison control: without the cut the batch dedups
    // against itself — the fence is load-bearing
    assert(Multimodal.servePhashDedup(spark, dir, b1, 64, 3)
      .filter(col("is_fresh")).count() == 0)
    // absorption bites: a batch-2 copy of the batch-1 keeper is a dup
    // OF THE BATCH-1 ID under the b < 2 fence
    val s2 = Multimodal.servePhashDedup(spark, dir,
        mt(Seq(20L -> novel)), 64, 3, batchCut = Some(2L))
      .collect()
    assert(s2.length == 1 && s2.head.getAs[Long]("dup_of") == 10L &&
      !s2.head.getAs[Boolean]("is_fresh"))
  }

  test("byteFeatures md5 matches the payload hash") {
    val r = Multimodal.byteFeatures(media).filter(col("media_id") === 1).first()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("content_hash") == expected)
  }
}
