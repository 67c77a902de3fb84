package graft

import graft.operators.Relational
import graft.streaming.Streams

class StreamingSpec extends SparkSpec {

  test("streaming sessionization equals the batch window-function form") {
    val streamed = Streams.streamSessions(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Relational.qEventsSessionize(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("streaming windowed agg emits a watermark-finalized subset of batch windows") {
    val streamed = Streams.streamWindow(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Relational.qEventsWindow(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed windows must match batch values: ${(streamed diff batch).take(3)}")
    // only the tail beyond the watermark horizon may be withheld
    assert(batch.size - streamed.size <= 48, // ≤ 2h horizon × event types + slack
      s"too many withheld windows: batch=${batch.size} streamed=${streamed.size}")
  }
}
