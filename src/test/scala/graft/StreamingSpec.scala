package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  test("windowed counts: streaming replay equals batch computation") {
    val q = StreamOps.replayToMemorySink(spark, s"$sf/events.parquet",
      "win_sink")
    q.awaitTermination(120000)
    val streamed = spark.table("win_sink")
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("total_value"))
      .collect().map(_.toString).sorted.toSeq
    val batch = StreamOps.windowedCounts(
      spark.read.parquet(s"$sf/events.parquet"))
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("total_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    // append mode emits a window only once the watermark passes it — the
    // tail windows of a bounded replay are (correctly) withheld, so the
    // streamed result is a large subset of the batch result, never different
    assert(streamed.toSet.subsetOf(batch.toSet),
      s"stream emitted rows batch doesn't have: ${streamed.toSet.diff(batch.toSet).take(3)}")
    assert(streamed.size >= batch.size / 2, s"${streamed.size} vs ${batch.size}")
  }

  test("stateful dedup counts duplicates per (user, type)") {
    import spark.implicits._
    val in = Seq(
      StreamOps.EventIn(1L, "click", 1000L),
      StreamOps.EventIn(1L, "click", 2000L),
      StreamOps.EventIn(1L, "click", 3000L),
      StreamOps.EventIn(2L, "view", 500L)
    ).toDS()
    val out = StreamOps.dedupWithState(in).collect()
      .map(o => (o.userId, o.eventType) -> o).toMap
    assert(out((1L, "click")).dupCount == 2)
    assert(out((1L, "click")).firstTsMs == 1000L)
    assert(out((2L, "view")).dupCount == 0)
  }
}
