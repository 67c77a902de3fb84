package graft

import graft.operators.Relational
import graft.streaming.Streams

/** The end-of-stream sentinel (Streams scaladoc) advances the watermark past
  * all real data, so every streaming query must equal its batch counterpart
  * EXACTLY on a finite backlog — the strongest check a stream can carry. */
class StreamingSpec extends SparkSpec {

  test("streaming sessionization equals the batch window-function form") {
    val streamed = Streams.streamSessions(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Relational.qEventsSessionize(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("streaming windowed agg equals the batch tumbling-window form") {
    val streamed = Streams.streamWindow(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Relational.qEventsWindow(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("streaming catalog sink read-back equals the batch hourly counts") {
    val streamed = Streams.streamToCatalog(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Relational.qEventsWindow(spark, sfDir)
      .select("window_start", "event_type", "n_events").collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("resuming the catalog sink from its checkpoint adds nothing (exactly-once)") {
    val first = Streams.streamToCatalog(spark, sfDir).count()
    val resumed = Streams.streamToCatalog(spark, sfDir, fresh = false).count()
    assert(resumed == first,
      s"resume re-emitted rows: first=$first resumed=$resumed")
  }
}
