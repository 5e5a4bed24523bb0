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

  test("byteFeatures md5 matches the payload hash") {
    val r = Multimodal.byteFeatures(media).filter(col("media_id") === 1).first()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("content_hash") == expected)
  }
}
