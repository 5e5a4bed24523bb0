package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class DocumentStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Doc(event_time: Timestamp, doc_id: Long, text: String)

  private val good =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val german =
    "der hund und die katze ist ein tier der die und das heute hier"
  private val junk = "x y z"

  test("streaming gates + watermark dedup: quality, language, duplicates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocumentStreams.gatedDedupedDocs(in.toDF(), "event_time", "text",
        minQuality = 1.0, keepLangs = Seq("en"), lateness = "30 minutes")
      .writeStream.format("memory").queryName("gated_docs")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Doc(ts(1), 1L, good),   // passes every gate
        Doc(ts(2), 2L, junk),   // fails quality (3 tokens)
        Doc(ts(3), 3L, german)) // fails language keep
      q.processAllAvailable()
      in.addData(
        Doc(ts(5), 4L, good),   // exact re-crawl dup within watermark
        Doc(ts(6), 5L, good + " extra")) // near-dup but distinct content
      q.processAllAvailable()
      val rows = spark.table("gated_docs")
        .select("doc_id", "lang_pred", "quality_score")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      // doc 1 survives; 2 (quality) and 3 (lang) gated; 4 deduped
      // against 1; 5 is new content and survives
      assert(rows.map(_._1).sorted.toSeq == Seq(1L, 5L), s"got $rows")
      assert(rows.forall(r => r._2 == "en" && r._3 == 1.0))
    } finally q.stop()
  }

  test("gate columns pass through unchanged for downstream operators") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val out = DocumentStreams.gatedDedupedDocs(in.toDF(), "event_time", "text",
      minQuality = 0.0, keepLangs = Seq("en", "de"), lateness = "10 minutes")
    // schema contract: original columns + the two gate verdicts
    assert(out.columns.toSeq ==
      Seq("event_time", "doc_id", "text", "quality_score", "lang_pred"))
    assert(out.isStreaming)
  }
}
