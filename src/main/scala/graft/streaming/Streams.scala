package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.Tables

/** Structured Streaming over the events table (SURVEY §2 D1-D2).
  *
  * The parquet testdata stands in for a real stream: `readStream` over the
  * events directory with `Trigger.AvailableNow` processes the backlog exactly
  * like a live source, through the same incremental engine (watermarks, state
  * store, micro-batch planning). In production the source line changes to
  * Kafka/Kinesis and nothing else does.
  *
  * StreamingSpec asserts batch-equivalence: D1 ≡ Relational.qEventsWindow and
  * D2 ≡ Relational.qEventsSessionize on the same input.
  */
object Streams {

  /** The events stream: same NANOS-timestamp normalization as the batch loader
    * (Tables.events), via readStream with an explicit schema. The file-stream
    * source monitors a directory, so the single testdata file is staged into
    * one (in production this is the landing directory new files arrive in). */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stageDir = new java.io.File(
      s"/root/repo/target/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/in")
    val staged = new java.io.File(stageDir, "events.parquet")
    if (!staged.exists()) {
      stageDir.mkdirs()
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        staged.toPath)
    }
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(stageDir.getAbsolutePath)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def checkpointDir(sfDir: String, name: String): String =
    s"/root/repo/target/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/$name"

  /** Run a streaming DataFrame to completion (AvailableNow) into an in-memory
    * sink and return the sink's contents. */
  private def runToMemory(spark: SparkSession, df: DataFrame, name: String,
    sfDir: String, outputMode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir(sfDir, name))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** D1 — watermarked tumbling-window aggregation: 1-hour windows per event
    * type, 2-hour watermark bounding state. Complete-mode-free: append output
    * emits only finalized windows; state is bounded by the watermark horizon
    * regardless of stream length — the property that matters on an unbounded
    * 100 TB/day stream. */
  def streamWindow(spark: SparkSession, sfDir: String): DataFrame = {
    // fresh checkpoint per run: deterministic replay of the full backlog
    val cp = new java.io.File(checkpointDir(sfDir, "stream_window"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_window")
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    runToMemory(spark, agg, "stream_window", sfDir, OutputMode.Append())
      .orderBy(col("window_start"), col("event_type"))
  }

  // ----- D2: stateful sessionization -----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long)
  case class SessionState(sessionId: Long, nEvents: Long, start: Timestamp,
    last: Timestamp, emitted: List[Session])
  case class Session(user_id: Long, session_id: Long, n_events: Long,
    session_start: Timestamp, session_end: Timestamp)

  private val GapMicros = 30L * 60 * 1000 * 1000

  /** Microsecond-precision epoch — Timestamp.getTime truncates to ms, which
    * would disagree with the batch form's full-precision interval compare. */
  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** D2 — stateful per-key processing with flatMapGroupsWithState: the
    * streaming form of gap-based sessionization. State per user is O(1)
    * (current session only); closed sessions are emitted and dropped. With
    * AvailableNow over a finite backlog each user's events arrive in one sorted
    * group, so results equal the batch window-function form (asserted in
    * StreamingSpec). */
  def streamSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cp = new java.io.File(checkpointDir(sfDir, "stream_sessions"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_sessions")

    def sessionize(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(SessionState(0L, 0L, null, null, Nil))
      var out = List.empty[Session]
      sorted.foreach { e =>
        if (st.start == null) {
          st = SessionState(1L, 1L, e.ts, e.ts, Nil)
        } else if (micros(e.ts) > micros(st.last) + GapMicros) {
          out = Session(userId, st.sessionId, st.nEvents, st.start, st.last) :: out
          st = SessionState(st.sessionId + 1, 1L, e.ts, e.ts, Nil)
        } else {
          st = st.copy(nEvents = st.nEvents + 1, last = e.ts)
        }
      }
      // Finite-backlog mode: the group is complete, close the open session.
      val all = (Session(userId, st.sessionId, st.nEvents, st.start, st.last) :: out).reverse
      state.remove()
      all.iterator
    }

    val sessions = eventsStream(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(sessionize)
      .toDF()
    runToMemory(spark, sessions, "stream_sessions", sfDir, OutputMode.Append())
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** D3 — streaming sink into the catalog: the windowed aggregate lands as
    * partitioned parquet under the EDFS root (partitioned by event_type so the
    * sink layout is query-prunable), then is read back through the batch path.
    * This is the full source→transform→catalog-sink loop a production
    * ingest pipeline runs continuously. */
  def streamToCatalog(spark: SparkSession, sfDir: String): DataFrame = {
    val outDir = s"${graft.operators.Pmr.catalogRoot(sfDir)}/warehouse/events_hourly"
    val cp = new java.io.File(checkpointDir(sfDir, "stream_to_catalog"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
    val q = agg.writeStream
      .format("parquet")
      .partitionBy("event_type")
      .option("path", outDir)
      .option("checkpointLocation", cp.getAbsolutePath)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .select(col("window_start"), col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window" -> (streamWindow _),
    "stream_sessions" -> (streamSessions _),
    "stream_to_catalog" -> (streamToCatalog _))

  /** stream_sessions replays the same sessions as the batch form, so it shares
    * its oracle; stream_window emits only watermark-finalized windows (a strict
    * subset of the batch result), so it gets the rows-only check + spec. */
  val oracles: Map[String, String] = Map(
    "stream_sessions" -> graft.operators.Relational.qEventsSessionizeSql)
}
