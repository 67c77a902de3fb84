package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming over the events table (SURVEY §2 D1-D3).
  *
  * The parquet testdata stands in for a real stream: `readStream` over the
  * events directory with `Trigger.AvailableNow` processes the backlog exactly
  * like a live source, through the same incremental engine (watermarks, state
  * store, micro-batch planning). In production the source line changes to
  * Kafka/Kinesis and nothing else does.
  *
  * Finite-backlog draining: a real stream's watermark keeps advancing as new
  * events arrive, closing windows and timing out idle sessions. A finite
  * backlog stops, so whatever the watermark hasn't passed would stay in state
  * forever. The staging step therefore appends ONE sentinel row with an event
  * time far past the real data (the streaming analog of an end-of-stream
  * marker). The sentinel advances the watermark past every real window/session,
  * the engine's no-data micro-batch then finalizes them, and the sentinel
  * itself is filtered out of every query (its own window/session stays open and
  * is never emitted). This makes all three queries EXACTLY batch-equivalent,
  * so they share the batch queries' DuckDB oracles.
  */
object Streams extends Serializable {

  /** Sentinel marker: event_id/user_id -1, this event_type. */
  private val SentinelType = "__graft_eos"

  /** Canonical staged-events schema: `ts` is ALWAYS microsecond TimestampType
    * in the landing dir — stageEventsNormalized rewrites whatever encoding the
    * source testdata ships (int64 nanos or TIMESTAMP_NTZ; see Tables.events)
    * into this one form at stage time, so the streaming read schema never
    * guesses about physical encodings. */
  private[graft] val EventsSchema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** Pre-create the staged landing directories (testdata copy + EOS sentinel)
    * — harness plumbing a production pipeline wouldn't pay per query; Bench
    * calls this in warmup so streaming timings measure the engine, not the
    * one-time fixture copy. */
  def stage(spark: SparkSession, sfDir: String): Unit = {
    eventsStream(spark, sfDir)
    docsStream(spark, sfDir)
    embeddingsStream(spark, sfDir)
    mediaStream(spark, sfDir)
    stageEmbeddingsBatch(spark, sfDir, embBatchStageDir(sfDir))
    stageKnnQueries(spark, sfDir, knnQueryStageDir(sfDir))
    stageTrainVectors(spark, sfDir, decontamVecStageDir(sfDir))
    ()
  }

  /** The landing dir for the D11 "new vectors" backlog — ONE definition, so
    * warmup staging (stage) and the query (streamIvfAppend) can never
    * diverge on layout or sanitization and silently restage inside a timed
    * run. */
  private def embBatchStageDir(sfDir: String): java.io.File = new java.io.File(
    s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/emb_batch_in")

  /** Stage a testdata table into a stream landing dir, re-copying when the
    * SOURCE's fingerprint no longer matches the one recorded at copy time —
    * the same staleness rule every derived artifact uses (Tables.fingerprint);
    * without it a regenerated source would silently stream the old corpus.
    * Returns true when (re)staged, so sentinel-style derived files know to
    * rebuild too. */
  private[graft] def stageCopy(sfDir: String, table: String, stageDir: java.io.File): Boolean = {
    val staged = new java.io.File(stageDir, s"$table.parquet")
    withFingerprint(sfDir, table, stageDir, freshData = staged.exists()) {
      stageDir.mkdirs()
      val src = new java.io.File(s"$sfDir/$table.parquet")
      // a part-file DIRECTORY source (plain Spark write layout) must copy
      // recursively — Files.copy of a directory copies only the empty dir
      // entry and the fingerprint would then mark the broken copy fresh
      if (src.isDirectory) {
        org.apache.commons.io.FileUtils.deleteQuietly(staged)
        org.apache.commons.io.FileUtils.copyDirectory(src, staged)
      } else {
        java.nio.file.Files.copy(src.toPath, staged.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** The shared staleness contract every staged copy uses: run `restage` when
    * the recorded source fingerprint is missing/mismatched OR the caller's own
    * data check fails, and make the fingerprint file the COMMIT MARKER —
    * deleted before the mutation starts, written only after it completes — so
    * a crash mid-restage (OOM-kill, Ctrl-C during a multi-file move) leaves
    * the dir verifiably stale and the next run self-heals instead of serving
    * a partial copy as fresh. Returns true when (re)staged. */
  private def withFingerprint(sfDir: String, table: String,
    stageDir: java.io.File, freshData: Boolean, tag: String = "")(
    restage: => Unit): Boolean = {
    val fpFile = new java.io.File(stageDir, s".$table.src_fp")
    // `tag` rides the fingerprint for staged copies whose CONTENT depends
    // on a policy constant as well as the source bytes (D20's train slice
    // moves when the bench cap does) — a changed tag restages loudly
    val fp = graft.Tables.fingerprint(sfDir, table) + tag
    val fresh = freshData && fpFile.exists() &&
      new String(java.nio.file.Files.readAllBytes(fpFile.toPath)) == fp
    if (!fresh) {
      java.nio.file.Files.deleteIfExists(fpFile.toPath) // invalidate FIRST
      restage
      java.nio.file.Files.write(fpFile.toPath, fp.getBytes) // commit LAST
    }
    !fresh
  }

  /** Stage the events table into the landing dir in the CANONICAL encoding:
    * read through the schema-adaptive batch loader (Tables.events — handles
    * every physical ts encoding the driver has shipped) and rewrite as flat
    * `events_NNNNN.parquet` part files with µs TimestampType. Same
    * fingerprint-based staleness rule as stageCopy. Flat files (not a nested
    * part-file directory) keep the landing dir a plain one-level file-stream
    * source — no partition-discovery ambiguity. The EOS sentinel is rewritten
    * INSIDE the commit boundary (before the fingerprint marker lands) and its
    * absence fails the freshness check, so no crash point can leave fresh
    * staging paired with a stale or missing sentinel — a stale sentinel would
    * silently stop windows/sessions past the OLD corpus's end-of-stream time,
    * and nothing downstream would ever notice. Returns true when (re)staged. */
  private[graft] def stageEventsNormalized(spark: SparkSession, sfDir: String,
    stageDir: java.io.File): Boolean = {
    // a raw-copy landing dir from the pre-normalization layout must restage —
    // its events.parquet would be read by the stream source in the old encoding
    val legacy = new java.io.File(stageDir, "events.parquet")
    val sentinel = new java.io.File(stageDir, "z_sentinel.parquet")
    def parts = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("events_") && f.getName.endsWith(".parquet"))
    withFingerprint(sfDir, "events", stageDir,
      freshData = parts.nonEmpty && !legacy.exists() && sentinel.exists()) {
      stageDir.mkdirs()
      org.apache.commons.io.FileUtils.deleteQuietly(legacy)
      parts.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(stageDir.getParentFile, "events_norm_tmp")
      graft.Tables.events(spark, sfDir)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      moveStagedParts(tmp, stageDir, "events")
      // the EOS sentinel is written AFTER the data parts, so its real
      // mtime sorts strictly behind their pinned ones — it must land in
      // the LAST micro-batch or windows/sessions finalize early
      writeSentinel(spark, stageDir, sentinel)
    }
  }

  /** Move a tmp dir's part files into a landing dir as sequentially-named
    * flat files with PINNED ascending mtimes, then drop the tmp dir — ONE
    * copy of the staging move shared by every staged stream source.
    * Part-file name order IS write order (and range order under
    * repartitionByRange), and the file-stream source lists batches by
    * (mtime, path); write-task mtimes are arbitrary, so without the sort
    * AND the pin a maxFilesPerTrigger=1 replay could ingest batches in
    * filesystem-arbitrary order. */
  private def moveStagedParts(tmp: java.io.File, stageDir: java.io.File,
    prefix: String): Unit = {
    tmp.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (p, i) =>
        val dst = new java.io.File(stageDir, f"${prefix}_$i%05d.parquet")
        java.nio.file.Files.move(p.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        pinMtime(dst, StagedMtimeEpoch + i * 60000L)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  /** Base of the pinned staged-file mtime ladder (parts ascend from here in
    * 60 s steps; the EOS sentinel is pinned one step past the last part).
    * Pinning EVERYTHING in the ladder — sentinel included — keeps the whole
    * ingest order a function of staging, never of wall clock: a sentinel
    * left at its real (current) mtime sits >7 days past the pinned parts,
    * so a checkpoint that survived a restage and had already seen the old
    * sentinel would batch it BEFORE freshly restaged parts (FileStreamSource
    * orders by (mtime, path)) and silently finalize windows early. */
  private val StagedMtimeEpoch = 1700000000000L

  /** setLastModified with its result CHECKED: on a filesystem where the call
    * fails (returns false) the staged-order contract silently breaks — the
    * source would list files in write-time order, which is arbitrary across
    * write tasks — so refuse loudly instead. */
  private def pinMtime(f: java.io.File, mtime: Long): Unit =
    require(f.setLastModified(mtime),
      s"setLastModified failed for $f — this filesystem cannot pin staged " +
        "mtimes, so the file-stream ingest order contract cannot hold")

  /** The events stream: readStream over the staged landing dir, which holds
    * the canonically-encoded testdata copy (stageEventsNormalized) plus the
    * end-of-stream sentinel (in production this is the landing directory new
    * files arrive in). Callers apply `withWatermark` and then filter the
    * sentinel out — the sentinel must pass through the EventTimeWatermark
    * operator to advance the watermark, so the filter has to come after it. */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = new java.io.File(
      s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/in")
    // staging owns the sentinel: a fresh dir implies a committed sentinel
    // (sentinel existence is part of the freshness check, and restages
    // rewrite it before the fingerprint marker commits)
    stageEventsNormalized(spark, sfDir, stageDir)
    spark.readStream.schema(EventsSchema).parquet(stageDir.getAbsolutePath)
  }

  /** Write the end-of-stream sentinel: one row whose event time clears every
    * real window end (≤ maxTs+1h) and session timeout (≤ maxTs+30min) even
    * after the 2h watermark delay is subtracted. 8h total margin. Reads only
    * the staged events_* part files (never the previous sentinel — that would
    * ratchet the EOS time forward on every restage). */
  private def writeSentinel(spark: SparkSession, stageDir: java.io.File,
    sentinel: java.io.File): Unit = {
    import spark.implicits._
    val dataFiles = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("events_") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    require(dataFiles.nonEmpty,
      s"no staged events_*.parquet in $stageDir — staging must run before the sentinel")
    val maxTs = spark.read.schema(EventsSchema).parquet(dataFiles.toSeq: _*)
      .agg(max(col("ts"))).head().getTimestamp(0)
    require(maxTs != null,
      s"staged events backlog in $stageDir is EMPTY (max(ts) is null) — " +
        "cannot place an end-of-stream sentinel; check the source events table")
    val eosTs = java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(8L * 3600))
    val tmp = new java.io.File(stageDir.getParentFile, "sentinel_tmp")
    Seq((-1L, eosTs, -1L, SentinelType, 0.0d, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, sentinel.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the sentinel joins the pinned mtime ladder one step past the last
    // part (see StagedMtimeEpoch: a real-clock sentinel mtime breaks the
    // ingest-order contract under a surviving checkpoint or maxFileAge)
    pinMtime(sentinel, StagedMtimeEpoch + dataFiles.length.toLong * 60000L)
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  private val DocsSchema = "doc_id BIGINT, text STRING, lang STRING, " +
    "source STRING, n_chars BIGINT"

  /** The documents stream: the ingest-side landing directory of a training
    * corpus (the file-stream stand-in for the crawler's output queue). No
    * sentinel — D4's dedup state is keyed by content digest, not event time,
    * so there is no watermark to advance. */
  private def docsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = new java.io.File(
      s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/docs_in")
    stageCopy(sfDir, "documents", stageDir)
    spark.readStream.schema(DocsSchema).parquet(stageDir.getAbsolutePath)
  }

  private[graft] def checkpointDir(sfDir: String, name: String): String =
    s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/$name"

  /** Run a streaming DataFrame to completion (AvailableNow) into an in-memory
    * sink and return the sink's contents. */
  private def runToMemory(spark: SparkSession, df: DataFrame, name: String,
    sfDir: String, outputMode: OutputMode): DataFrame =
    runToMemory(spark, df, name,
      new java.io.File(checkpointDir(sfDir, name)), outputMode)

  private def runToMemory(spark: SparkSession, df: DataFrame, name: String,
    cp: java.io.File, outputMode: OutputMode): DataFrame =
    runToMemory(spark, df, name, cp, outputMode, stateKeyHint = 0L)

  /** Stateful micro-batch cost scales with the state-store partition count
    * in BOTH directions: every batch opens, commits and snapshots one store
    * per shuffle partition (so a small-state stream pays ~4× fixed overhead
    * under the session's batch-tuned ≈cores setting), while a large keyed
    * state serializes store commits behind too FEW partitions (measured at
    * sf1: the 800k-key LSH band state runs 25.1 s on 4 partitions, 16.4 s on
    * 16). Callers that can estimate their state-key cardinality pass it as
    * `stateKeyHint` and the count scales ~1 partition per 50k keys, clamped
    * to [4, 32]; no hint keeps the small-stream floor. Queries start from a
    * fresh checkpoint each run, so the per-run count is safe (it is frozen
    * into the checkpoint at first start); production streams size this to
    * their key cardinality the same way. Env override wins for experiments.
    *
    * State-store PROVIDER is switchable the same way
    * (SPARK_GRAFT_STATE_STORE=rocksdb|hdfs): the default HDFS-backed store
    * holds every key on-heap — fine at bench scale, an OOM ceiling on an
    * unbounded stream — while RocksDB keeps a bounded heap and spills to
    * local disk. Measured at sf1 on the three heaviest stateful keys
    * (9.6M-key LSH band state + sessions + windows): 28.9 s either way
    * (dedup_near 17.5↔18.0, sessions 9.0↔7.2, window 2.3↔3.7 — all within
    * run noise), so the switch is COST-NEUTRAL here and the choice is purely
    * a deployment-scale call: a 100 TB/day stream runs rocksdb. */
  private def withStreamShufflePartitions[T](spark: SparkSession,
    stateKeyHint: Long = 0L)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    // resolve (and VALIDATE) the provider before touching any session conf:
    // a typo'd provider must fail, not silently benchmark the default (same
    // fail-fast contract as SPARK_GRAFT_ONLY) — and it must fail with the
    // session untouched, so the fast path out of here can't strand a
    // modified shuffle-partitions conf outside the try/finally below
    val provider = sys.env.get("SPARK_GRAFT_STATE_STORE").map {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case other => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_STORE must be 'rocksdb' or 'hdfs', got '$other'")
    }
    val prev = spark.conf.get(key)
    val prevProv = spark.conf.getOption(provKey)
    val auto =
      if (stateKeyHint > 0) math.max(4L, math.min(32L, stateKeyHint / 50000L)).toString
      else "4"
    spark.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", auto))
    provider.foreach(spark.conf.set(provKey, _))
    try f finally {
      spark.conf.set(key, prev)
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  /** Executed plan of the last completed micro-batch (test hook: plan gates
    * for streaming operators — the batch noop-write gate can't see inside a
    * streaming query). Reflection keeps the internal StreamExecution access
    * contained; an incompatible runtime just leaves the hook empty. */
  @volatile private[graft] var lastStreamPlan: String = ""

  private def capturePlan(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try {
      val se = q.getClass.getMethod("streamingQuery").invoke(q)
      val le = se.getClass.getMethod("lastExecution").invoke(se)
      lastStreamPlan = le.getClass.getMethod("executedPlan").invoke(le).toString
    } catch { case _: Throwable => lastStreamPlan = "" }

  /** Drain a stream into a parquet FILE sink and hand back a batch reader
    * over it — the production shape for high-volume intermediate streams
    * (the memory sink materializes every row on the driver; fine for the
    * harness's small final outputs, unbounded for candidate-pair volumes).
    * The explicit schema makes an empty drain read as an empty relation
    * instead of failing schema inference. */
  private def runToFiles(spark: SparkSession, df: DataFrame, outDir: java.io.File,
    cp: java.io.File, stateKeyHint: Long): DataFrame =
    withStreamShufflePartitions(spark, stateKeyHint) {
      org.apache.commons.io.FileUtils.deleteQuietly(outDir)
      val q = df.writeStream
        .format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", cp.getAbsolutePath)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan(q)
      spark.read.schema(df.schema).parquet(outDir.getAbsolutePath)
    }

  // storeDir path -> reuse key: an ingest store already built in this JVM
  // for the same (source fingerprint, derivation) is consumed as-is — the
  // fingerprint-keyed reuse rule every ensure* builder applies, here cutting
  // the repeated-run cost of the D10/D12 ingest replay (the store's content
  // is a deterministic function of the staged source, so a rebuild could
  // only reproduce it byte-for-byte)
  // value = (reuse key, file manifest at build time): the warm path
  // re-validates the manifest, not just isDirectory — files deleted or
  // partially removed under a live memo force a rebuild, never a silent
  // read of a truncated store
  private val ingestStoreMemo =
    scala.collection.concurrent.TrieMap.empty[String, (String, Map[String, Long])]

  /** Evict the in-memory ingest-store reuse markers (the stream-store
    * analog of Similarity.clearCaches). The next run re-validates against
    * the PERSISTED sidecar and adopts a still-valid store; a genuine
    * rebuild additionally needs StoreFp.invalidateAll() (ColdWarm's
    * cold-path pairing). */
  private[graft] def clearIngestStores(): Unit = ingestStoreMemo.clear()

  /** A store directory derived from a checkpoint path (`<cp><suffix>`) —
    * ONE derivation shared by the builders and the specs, so a layout or
    * sanitization change can never silently decouple a test from the real
    * directory. */
  private[graft] def storeSibling(cp: java.io.File, suffix: String): java.io.File =
    new java.io.File(cp.getAbsolutePath + suffix)

  /** Recursive relative-path → length manifest of a store dir (empty when
    * absent) — what the reuse memo records at build time and re-checks on
    * the warm path, so an externally deleted, truncated or partially
    * rewritten store is rebuilt instead of being consumed silently (the
    * LENGTH is what catches in-place truncation, which a name-only set
    * would miss). */
  private def storeManifest(store: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File, prefix: String): Iterator[(String, Long)] =
      if (f.isFile) Iterator((prefix + f.getName) -> f.length)
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).iterator
        .flatMap(c => walk(c, prefix + f.getName + "/"))
    if (!store.isDirectory) Map.empty
    else Option(store.listFiles()).getOrElse(Array.empty[java.io.File])
      .iterator.flatMap(c => walk(c, "")).toMap
  }

  /** ONE reuse guard for every stream-side store builder (the dedup ingest
    * stores and the IVF append layout share this contract, not two
    * hand-maintained copies of it): consume the store as-is when this JVM —
    * or, via the persisted sidecar, a PREVIOUS JVM — already built it for
    * `key`, otherwise run `build` and commit the memo only after the build
    * completes — a build that throws leaves no marker, so the next call
    * rebuilds. The (key, manifest) pair is persisted NEXT TO the store
    * (`<store>_graft_store_fp` — outside it, because the manifest covers
    * the store's own files), so a fresh session validates and reuses the
    * replayed backlog instead of re-ingesting it (the r13 on-disk-
    * fingerprint directive applied to the streaming stores). */
  private def reuseOrBuild(store: java.io.File, key: Option[String])(
    build: => Unit): Unit = {
    val path = store.getAbsolutePath
    val reusable = key.exists { k =>
      ingestStoreMemo.get(path).orElse(readStoreSidecar(store))
        .exists { case (mk, manifest) =>
          mk == k && store.isDirectory && storeManifest(store) == manifest
        }
    }
    if (reusable) {
      // promote a sidecar hit into the in-memory memo (skip the disk read
      // and manifest walk next call)
      key.foreach(k => ingestStoreMemo.getOrElseUpdate(path, (k, storeManifest(store))))
      return
    }
    build
    key.foreach { k =>
      val m = storeManifest(store)
      ingestStoreMemo(path) = (k, m)
      writeStoreSidecar(store, k, m)
    }
  }

  private def storeSidecarFile(store: java.io.File): java.io.File =
    new java.io.File(store.getParentFile,
      store.getName + graft.StoreFp.SidecarName)

  private def writeStoreSidecar(store: java.io.File, key: String,
    manifest: Map[String, Long]): Unit = {
    val body = (s"key=$key" +:
      manifest.toSeq.sorted.map { case (p, l) => s"m=$p\t$l" }).mkString("\n")
    java.nio.file.Files.write(storeSidecarFile(store).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def readStoreSidecar(
    store: java.io.File): Option[(String, Map[String, Long])] = {
    val f = storeSidecarFile(store)
    if (!f.isFile) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split('\n')
      lines.headOption.filter(_.startsWith("key=")).map { h =>
        val manifest = lines.tail.filter(_.startsWith("m=")).map { l =>
          val Array(p, n) = l.stripPrefix("m=").split('\t')
          p -> n.toLong
        }.toMap
        (h.stripPrefix("key="), manifest)
      }
    }
  }

  /** Delete scratch siblings (`<store>_stage<id>`) a crashed foreachBatch
    * attempt may have stranded — the success path cleans its own scratch,
    * but a death between the parquet write and the move would otherwise
    * leak corpus-scale files forever (nothing else ever reads the dir). */
  private def sweepScratch(store: java.io.File): Unit =
    Option(store.getParentFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(store.getName + "_stage"))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)

  /** Run the INGEST tier of a dedup stream to completion: `derive` each
    * micro-batch's row-local records (perceptual hash, cluster assignment)
    * ONCE per arrival and append them to the stream-side STORE directory —
    * D11's O(batch) foreachBatch append applied to the dedup stores. The
    * store is what makes the downstream resolve honest for arrivals the
    * batch corpus has never seen: the dedup tier consumes the store (so the
    * expensive derivation never runs twice), and every candidate pair's
    * BOTH sides are stream arrivals, so store lookups resolve novel rows by
    * construction — no join against a corpus-only table that would silently
    * drop them. One coalesced file per micro-batch, written OVERWRITE-BY-
    * BATCH-ID: the batch lands in a scratch dir and its part file is MOVED
    * to the deterministic name `batch-<id>.parquet` (replace-existing), so
    * a failed-then-retried micro-batch replaces its own earlier attempt
    * instead of appending a duplicate alongside it — foreachBatch's
    * at-least-once delivery becomes an idempotent store write, matching the
    * end-to-end-checkpointed contract the resolve join relies on. The file
    * carries a pinned ascending mtime: the downstream dedup query is a
    * file-stream source ordered by (mtime, path), and arbitrary write-task
    * mtimes would reorder its replay against the ingest order the
    * keeper-rank oracle relies on. (Per-batch file count is a throughput
    * dial in production — the order contract only needs batch-monotone
    * mtimes.) `reuseKey` (the source-fingerprint tag) short-circuits a
    * rebuild of a store this JVM already built for identical input. */
  private def ingestAppend(spark: SparkSession, src: DataFrame,
    storeDir: java.io.File, cp: java.io.File, reuseKey: Option[String] = None)(
    derive: DataFrame => DataFrame): Unit = reuseOrBuild(storeDir, reuseKey) {
    org.apache.commons.io.FileUtils.deleteQuietly(storeDir)
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    sweepScratch(storeDir)
    // an EMPTY source stream fires no batch and appends nothing — create
    // the store dir up front so the downstream dedup/resolve reads (all
    // explicit-schema) see an empty relation, not a missing path
    storeDir.mkdirs()
    withStreamShufflePartitions(spark) {
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          writeBatchFile(derive(batch), storeDir, id)
        }
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }

  /** Land one micro-batch's derived rows as the deterministic store file
    * `batch-<id>.parquet` (scratch write + move, REPLACE_EXISTING): a
    * failed-then-retried batch replaces its own earlier attempt, so
    * foreachBatch's at-least-once delivery becomes an idempotent store
    * write; the pinned mtime keeps any downstream file-stream replay in
    * batch order. Factored from ingestAppend so D18's multi-store batches
    * share the exact commit discipline. */
  private def writeBatchFile(rows: DataFrame, storeDir: java.io.File,
    id: Long): Unit = {
    storeDir.mkdirs()
    val scratch = new java.io.File(storeDir.getParentFile,
      storeDir.getName + s"_stage$id")
    rows.coalesce(1).write.mode("overwrite").parquet(scratch.getAbsolutePath)
    Option(scratch.listFiles()).getOrElse(Array.empty[java.io.File])
      .find(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val dst = new java.io.File(storeDir, f"batch-$id%09d.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        pinMtime(dst, StagedMtimeEpoch + id * 60000L)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(scratch)
    ()
  }

  /** Batch reader over a batch-file store, EXCLUDING the current batch's
    * own file — under an at-least-once replay the store may already hold
    * this batch's earlier attempt, and reading it back would double-count
    * the batch against itself (the idempotence rule writeBatchFile's
    * replace gives the write side, applied to the read side). Empty or
    * absent store reads as an empty relation. */
  private def readOtherBatches(spark: SparkSession, storeDir: java.io.File,
    schema: String, excludeId: Long): DataFrame = {
    val files = Option(storeDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("batch-") && f.getName.endsWith(".parquet"))
      .filterNot(_.getName == f"batch-$excludeId%09d.parquet")
      .map(_.getAbsolutePath).toSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema).parquet(files: _*)
  }

  private def runToMemory(spark: SparkSession, df: DataFrame, name: String,
    cp: java.io.File, outputMode: OutputMode, stateKeyHint: Long): DataFrame =
    withStreamShufflePartitions(spark, stateKeyHint) {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan(q)
      spark.table(name)
    }

  /** D1 — watermarked tumbling-window aggregation: 1-hour windows per event
    * type, 2-hour watermark bounding state. Append output emits only finalized
    * windows; state is bounded by the watermark horizon regardless of stream
    * length — the property that matters on an unbounded 100 TB/day stream.
    * The sentinel finalizes every real window, so the result equals the batch
    * form (B7) exactly and shares its oracle. */
  def streamWindow(spark: SparkSession, sfDir: String): DataFrame = {
    // fresh checkpoint per run: deterministic replay of the full backlog
    val cp = new java.io.File(checkpointDir(sfDir, "stream_window"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_window")
    // NOTE: no sentinel filter inside the streaming plan — Catalyst would push
    // it below the EventTimeWatermark node (the predicate doesn't touch ts),
    // hiding the sentinel from watermark tracking. The sentinel's own window
    // can never finalize (its end is past the final watermark), so append mode
    // never emits it; the post-sink filter is a pure safety net.
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    runToMemory(spark, agg, "stream_window", sfDir, OutputMode.Append())
      .filter(col("event_type") =!= SentinelType)
      .orderBy(col("window_start"), col("event_type"))
  }

  // ----- D2: stateful sessionization -----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long)
  case class SessionState(sessionId: Long, nEvents: Long, start: Timestamp,
    last: Timestamp)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
    session_start: Timestamp, session_end: Timestamp)

  private val GapMicros = 30L * 60 * 1000 * 1000
  private val GapMillis = 30L * 60 * 1000

  /** Microsecond-precision epoch — Timestamp.getTime truncates to ms, which
    * would disagree with the batch form's full-precision interval compare. */
  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** D2 — stateful per-key processing with flatMapGroupsWithState: the
    * streaming form of gap-based sessionization. State per user is O(1) (the
    * current open session only); a session closes either when a later event
    * exceeds the 30-min gap (emitted inline) or when the event-time watermark
    * passes its gap horizon (EventTimeTimeout → emitted on timeout). Sessions
    * spanning micro-batch boundaries are therefore merged correctly no matter
    * how the source slices the data (maxFilesPerTrigger, Kafka batch sizing);
    * nothing is emitted per-batch that could still grow. The sentinel advances
    * the watermark past every real session, so on a finite backlog the result
    * equals the batch window-function form (B8) and shares its oracle.
    *
    * Equivalence precondition: per-user event time must not jump BACKWARD
    * across batches by more than the 30-min gap (in-batch disorder and
    * within-gap cross-batch disorder are handled). An event that late forms
    * its own session with the next counter value — ids stay unique and
    * time-ordered against the open session, but the batch form would have
    * renumbered globally; append-mode streams cannot renumber what they
    * already emitted. Gap sessionization is inherently order-sensitive. */
  def streamSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_sessions"))
    sessionRun(spark, eventsStream(spark, sfDir), "stream_sessions", cp)
  }

  /** Test hook: the same sessionizer over an arbitrary staged directory with
    * maxFilesPerTrigger=1, so EVERY file is its own micro-batch — the
    * cross-batch state-merge path (tombstones, event-time timeouts, monotone
    * bounds) runs for real instead of being vacuously exercised by a
    * single-batch fixture. */
  private[graft] def streamSessionsMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(EventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    sessionRun(spark, src, name, cp)
  }

  private def sessionRun(spark: SparkSession, src: DataFrame, name: String,
    cp: java.io.File): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)

    def sessionize(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // Watermark passed the open session's gap horizon: it can never grow.
        // Keep a TOMBSTONE carrying the session counter (start=null, no
        // timeout) instead of removing state: a user who returns in a later
        // micro-batch must continue at sessionId+1, not restart at 1, or the
        // emitted keys would collide and diverge from the batch numbering.
        // State is O(distinct users) either way — the counter adds nothing.
        val st = state.get
        state.update(SessionState(st.sessionId, 0L, null, null))
        Iterator.single(Session(userId, st.sessionId, st.nEvents, st.start, st.last))
      } else {
        // Within a batch arrival order is not guaranteed: sort by event time.
        // The sentinel (event_id<0) is dropped HERE, not with a DataFrame
        // filter: a filter not referencing ts would be pushed below the
        // EventTimeWatermark node and hide the sentinel from the watermark.
        val sorted = events.toSeq.filter(_.event_id >= 0)
          .sortBy(e => (micros(e.ts), e.event_id))
        var st = state.getOption.getOrElse(SessionState(0L, 0L, null, null))
        var out = List.empty[Session]
        sorted.foreach { e =>
          if (st.start == null) {
            st = SessionState(st.sessionId + 1, 1L, e.ts, e.ts)
          } else if (micros(e.ts) > micros(st.last) + GapMicros) {
            out = Session(userId, st.sessionId, st.nEvents, st.start, st.last) :: out
            st = SessionState(st.sessionId + 1, 1L, e.ts, e.ts)
          } else if (micros(e.ts) + GapMicros < micros(st.start)) {
            // A watermark-admitted event more than a gap OLDER than the open
            // session's start is its own earlier session, not a member of
            // this one. The open session hasn't been emitted yet, so it can
            // still renumber up; already-closed earlier sessions cannot be
            // renumbered retroactively in append mode — this is the one
            // documented divergence from the batch form, which renumbers
            // globally (it only arises when a source delivers an event >gap
            // out of order across batches yet within the watermark delay).
            out = Session(userId, st.sessionId, 1L, e.ts, e.ts) :: out
            st = st.copy(sessionId = st.sessionId + 1)
          } else {
            // Mildly out-of-order (within a gap of the session's span):
            // merge, keeping bounds monotone so session_end never regresses
            // and a later gap decision cannot split what batch merges.
            val newLast = if (micros(e.ts) > micros(st.last)) e.ts else st.last
            val newStart = if (micros(e.ts) < micros(st.start)) e.ts else st.start
            st = st.copy(nEvents = st.nEvents + 1, start = newStart, last = newLast)
          }
        }
        if (st.start == null) Iterator.empty // no state and no events
        else {
          // +1ms: setTimeoutTimestamp is ms-granular, micros(last)+gap rounds up
          val timeoutMs = micros(st.last) / 1000 + GapMillis + 1
          if (timeoutMs <= state.getCurrentWatermarkMs()) {
            // Gap horizon already behind the watermark: close immediately
            // (tombstone keeps the counter, same as the timeout path).
            out = Session(userId, st.sessionId, st.nEvents, st.start, st.last) :: out
            state.update(SessionState(st.sessionId, 0L, null, null))
          } else {
            state.update(st)
            state.setTimeoutTimestamp(timeoutMs)
          }
          out.reverse.iterator
        }
      }
    }

    val sessions = src
      .withWatermark("ts", "2 hours")
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionize)
      .toDF()
    runToMemory(spark, sessions, name, cp, OutputMode.Append())
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // ----- D4: streaming ingest dedup -----

  case class Doc(doc_id: Long, h: String)
  case class KeeperState(keeper: Long)
  case class DedupDecision(doc_id: Long, dup_of: Option[Long], is_duplicate: Boolean)

  /** D4 — streaming exact dedup: the CONTINUOUS form of C16's incremental
    * dedup, run as the corpus arrives instead of batch-by-batch. State per
    * content digest is one long (the keeper id) — the in-engine mirror of the
    * C16 bucketed digest store; every arriving doc is decided exactly once,
    * in the same pass that would route it into the corpus. At 100 TB the
    * digest keyspace is what C16 already persists; a production stream bounds
    * the HOT state with a digest-store lookup tier or a state TTL — the TTL
    * tier is implemented below (streamDedupTtlMultiBatch: EventTimeTimeout
    * eviction, state bounded by the TTL window) with the same decision logic.
    * This query keeps NoTimeout so the finite backlog stays exactly
    * batch-equivalent for the oracle.
    *
    * Batch equivalence: within a batch, digest groups decide by ascending
    * doc_id (sorted below), so on the single-file backlog the result equals
    * the batch window-min form exactly and carries its SQL oracle. Across
    * micro-batches the semantics are first-seen-wins: a later batch carrying
    * a SMALLER doc_id for a known digest still points at the established
    * keeper — append mode cannot re-crown what it already emitted (the same
    * inherent ordering caveat D2 documents; ingest ids are monotone in
    * practice). */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup"))
    dedupRun(spark, docsStream(spark, sfDir), "stream_dedup", cp)
  }

  /** D6 — streaming quality gate: the filter tier of continuous ingest,
    * running AHEAD of the dedup tiers (D4/D5) so junk never reaches the
    * signature stores. The C9 score is a pure row-local projection, so its
    * streaming form is STATELESS — no watermark, no state store, no
    * shuffle; each micro-batch scores and filters independently, which is
    * why this tier scales to any ingest rate by adding executors alone.
    * Gate: quality_score > 0.25 (int/int ratios → identical doubles across
    * engines, so the threshold decision is exact). Stateless ⇒ trivially
    * batch-equivalent on a finite backlog → carries C9's SQL with the gate
    * folded in. */
  def streamQualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_quality_gate"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_quality_gate")
    val scored = graft.operators.TextAnalysis
      .qualityProjection(spark, docsStream(spark, sfDir))
      .filter(col("quality_score") > 0.25)
    runToMemory(spark, scored, "stream_quality_gate", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  /** D9 — streaming classifier gate: the C34 hashing-trick linear model as a
    * continuous-ingest filter, the production form of a learned quality gate
    * (score each arriving document, admit positives downstream). Stateless
    * like D6 — scoring is ONE fused kernel call per row inside the
    * micro-batch's scan, no state store, no watermark, so throughput is the
    * batch kernel's throughput and the drained backlog equals the gated
    * batch query exactly (shared classifySql oracle). */
  def streamClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_classify"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_classify")
    val scored = graft.operators.TextAnalysis
      .classifyProjection(spark, docsStream(spark, sfDir))
      .filter(col("clf_score") > 0.0)
    runToMemory(spark, scored, "stream_classify", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  /** D13 — streaming reference-LM gate: C40's CCNet-style model as a
    * continuous-ingest filter, completing the stateless gate ladder (D6
    * heuristic quality, D7 decontamination, D9 learned classifier, this
    * LM-likelihood tier — the four gates real crawl pipelines stack before
    * the dedup tiers). The offline-trained bigram model rides into the
    * stream as the same plan-literal blobs the batch query uses and scoring
    * is ONE fused kernel call per row (functions.GramLmScore) inside the
    * micro-batch's scan — no state store, no watermark, no shuffle, so
    * throughput is the batch kernel's and the drained backlog equals the
    * gated batch query exactly (shared lmSql oracle). Admits documents the
    * reference LM can explain (NOT lowq — CCNet's keep-the-head rule). */
  def streamLmGate(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_lm_gate"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_lm_gate")
    val (uniBlob, biBlob) = graft.operators.TextAnalysis.lmModel(spark, sfDir)
    val scored = graft.operators.TextAnalysis
      .lmProjection(spark, docsStream(spark, sfDir), uniBlob, biBlob)
      .filter(!col("lowq"))
    runToMemory(spark, scored, "stream_lm_gate", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  /** D16 — streaming Gopher-rule gate: C47's full word/line-shape bundle as
    * a continuous-ingest filter, the heuristic-rule tier of the stateless
    * gate ladder (D6 score, D7 decontamination, D9 learned classifier, D13
    * reference LM, this rule bundle — Gopher runs its rule filter BEFORE
    * the learned tiers, Rae et al. 2021 §A1.1, and so does this ladder).
    * All six rules come from ONE fused byte-pass kernel call per row
    * (functions.GopherStats) inside the micro-batch's scan — no state
    * store, no watermark, no shuffle — so the tier's throughput is the
    * batch kernel's and the drained backlog equals the gated batch query
    * exactly (single-sourced gopherSql oracle). Admits the composed rule
    * decision; the per-rule fractions ride along so downstream tiers can
    * re-threshold without re-scanning. */
  def streamGopherGate(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_gopher"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_gopher")
    val scored = graft.operators.TextAnalysis
      .gopherProjection(spark, docsStream(spark, sfDir))
      .filter(col("admit"))
    runToMemory(spark, scored, "stream_gopher", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  /** D7 — streaming decontamination gate: the eval-overlap tier of
    * continuous ingest, between D6's quality filter and the dedup tiers —
    * benchmark-contaminated crawl output should never reach the corpus at
    * all. The C15 decision (count of a doc's distinct 5-grams that appear
    * in the eval-suite gram set) is made ROW-LOCAL by shipping the exact
    * gram set as a plan reference probed inside codegen
    * (functions.GramSetStats) — so like D6 the tier is STATELESS: no
    * watermark, no state store, no join, no shuffle; throughput scales with
    * executors alone. This is deliberately the C15 regime (eval suites are
    * ~10^5 grams); a 10^8-gram blocklist ships C24's bloom sketch instead
    * and diverts the ~1% suspicious docs to a batch-side exact verify.
    * Stateless ⇒ batch-equivalent on a finite backlog: the oracle is C15's
    * contamination report with the gate verdict folded in. */
  def streamDecontamGate(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_decontam_gate"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_decontam_gate")
    // the offline eval-suite build (batch side, cached per dir)
    val blob = graft.operators.PipelineOps.benchGramBlob(spark, sfDir)
    val gated = docsStream(spark, sfDir)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.gramHits(spark, col("text"), 5, blob).as("gh"))
      .select(col("doc_id"),
        col("gh.n_grams").as("n_grams"),
        col("gh.n_contaminated").as("n_contaminated"),
        (col("gh.n_contaminated") === 0).as("kept"))
    runToMemory(spark, gated, "stream_decontam_gate", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  /** D14 — streaming span-cut DECONTAMINATION: C45's salvage operator as a
    * continuous-ingest tier. D7's gate DROPS a contaminated arrival whole;
    * this tier CUTS the benchmark-shared spans and keeps the rest — the
    * token-preserving form a starved pipeline wants, now applied at ingest
    * so a salvageable crawl page never costs a full drop-and-recrawl cycle.
    * The mark stage is fully ROW-LOCAL: the eval-suite gram set rides as a
    * plan reference (D7's transport) into functions.GramMarkPositions,
    * which emits each arrival's marked gram-start positions in one pass —
    * no owner window, no join, no state store, no shuffle, so the tier is
    * STATELESS like D6/D7/D9/D13 and the drained backlog equals the batch
    * operator exactly: stream and batch share C45's cut projection
    * (PipelineOps.cutFromMarked) in code and ONE oracle
    * (decontamSubstrSql) in the gate. At C24's blocklist scale the same
    * split applies as D7 documents: the bloom sketch gates in-stream, and
    * suspicious arrivals divert to the batch-side exact cut (C45's
    * bloom-fronted form). */
  def streamDecontamCut(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_decontam_cut"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_decontam_cut")
    // the offline eval-suite build (batch side, cached per dir) — the blob's
    // extra <5-token whole-text entries can never equal a positional 5-gram
    // (exactly 4 separator spaces vs at most 3), so the positional kernel
    // marks exactly the batch mark join's pair set
    val blob = graft.operators.PipelineOps.benchGramBlob(spark, sfDir)
    val cut = graft.operators.PipelineOps.cutFromMarked(
      docsStream(spark, sfDir)
        .filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), split(col("text"), " ").as("ts"),
          graft.functions.GraftFunctions
            .gramMarks(spark, col("text"), 5, blob).as("marked")))
    runToMemory(spark, cut, "stream_decontam_cut", cp, OutputMode.Append())
      .orderBy(col("doc_id"))
  }

  // ----- D15: streaming sequence packing -----

  case class PackDoc(lang: String, shard: Long, doc_id: Long, n_tok: Long)
  case class PackCursor(cum: Long)
  case class PackRow(lang: String, shard: Long, doc_id: Long, n_tok: Long,
    win_id: Long, win_offset: Long)

  /** D15 — streaming sequence packing: C44's document-grain packing manifest
    * computed CONTINUOUSLY, the tier that turns the gated/deduped ingest
    * stream into trainer shards without a batch re-pack. State per
    * (lang, shard) sub-shard is ONE long — the running token total, i.e.
    * the packing cursor — so an arriving document is assigned its
    * (win_id, win_offset) in the same pass that admits it, and the state
    * store holds exactly langs × SeqPackShards longs regardless of corpus
    * size (the smallest keyed state of any stateful tier here). The
    * sub-shard layout and token measure are PipelineOps.packDocFrame /
    * WsTokMeasure — single-sourced with C20/C44, so batch and stream cannot
    * disagree on which window a document packs into, and the two forms
    * share ONE oracle (seqPackManifestSql, the C29/D10 rule).
    *
    * Batch equivalence: within a batch each sub-shard packs by ascending
    * doc_id (sorted below); across micro-batches the cursor carries over,
    * so the drained backlog equals the batch manifest exactly when arrival
    * order is doc_id-monotone per sub-shard — the same inherent ordering
    * caveat D2/D4 document (ingest ids are monotone in practice; the
    * multi-batch spec stages a split backlog and pins cursor carry-over
    * for real). */
  def streamPack(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_pack"))
    packRun(spark, docsStream(spark, sfDir), "stream_pack", cp)
  }

  private def packRun(spark: SparkSession, src: DataFrame, name: String,
    cp: java.io.File): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)
    val w = graft.operators.PipelineOps.PackWindowTokens

    def pack(key: (String, Long), docs: Iterator[PackDoc],
      state: GroupState[PackCursor]): Iterator[PackRow] = {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = docs.toArray.sortBy(_.doc_id).map { d =>
        val row = PackRow(d.lang, d.shard, d.doc_id, d.n_tok, cum / w, cum % w)
        cum += d.n_tok
        row
      }
      state.update(PackCursor(cum))
      out.iterator
    }

    val assigned = graft.operators.PipelineOps
      .packDocFrame(src, graft.operators.PipelineOps.WsTokMeasure(spark))
      .as[PackDoc]
      .groupByKey(d => (d.lang, d.shard))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(pack)
      .toDF()
    runToMemory(spark, assigned, name, cp, OutputMode.Append())
      .select(col("lang"), col("shard"), col("doc_id"), col("n_tok"),
        col("win_id"), col("win_offset"))
      .orderBy(col("doc_id"))
  }

  /** Test hook: the packer over a staged multi-file backlog, one micro-batch
    * per file, so the cursor carry-over across batches runs for real. */
  private[graft] def streamPackMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(DocsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    packRun(spark, src, name, cp)
  }

  /** Test hook: every staged file its own micro-batch (maxFilesPerTrigger=1),
    * so cross-batch keeper persistence runs for real. */
  private[graft] def streamDedupMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(DocsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    dedupRun(spark, src, name, cp)
  }

  case class TsDoc(doc_id: Long, h: String, ingest_ts: Timestamp)

  /** D4's TTL variant — the state-bounding tier the production notes above
    * promise: digest state carries an ingest-time TTL (EventTimeTimeout), so
    * the HOT keyed state holds only digests seen within the TTL window and
    * the watermark evicts the idle tail. Inside the window decisions equal
    * the batch oracle (first-seen-wins); a duplicate re-arriving AFTER its
    * digest was evicted is re-crowned as fresh — the documented, bounded
    * trade: at 100 TB/day the unbounded-digest tier is C16's bucketed store
    * (joined at batch boundaries), and this in-engine state is the recent
    * window only. StreamingSpec stages the eviction timeline for real
    * (multi-batch, watermark-driven) and pins both the decisions and the
    * state-store row counts. */
  private[graft] def streamDedupTtlMultiBatch(spark: SparkSession,
    stageDir: String, name: String, ttlMinutes: Int):
      (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    import spark.implicits._
    val cp = new java.io.File(stageDir + "_cp_" + name)
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)
    val src = spark.readStream
      .schema("doc_id BIGINT, text STRING, ingest_ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)

    def decide(h: String, docs: Iterator[TsDoc],
      state: GroupState[KeeperState]): Iterator[DedupDecision] = {
      if (state.hasTimedOut) {
        // idle past the TTL: drop the digest outright — unlike D2's session
        // counter there is nothing to renumber, so no tombstone is needed
        // and state stays bounded by the TTL window, not stream history
        state.remove()
        Iterator.empty
      } else {
        val arr = docs.toArray.sortBy(_.doc_id)
        // presence-based keeper, never a negative sentinel (dedupRun's rule)
        var keeper: Option[Long] = state.getOption.map(_.keeper)
        val out = arr.map { d =>
          keeper match {
            case None =>
              keeper = Some(d.doc_id)
              DedupDecision(d.doc_id, None, is_duplicate = false)
            case Some(k) => DedupDecision(d.doc_id, Some(k), is_duplicate = true)
          }
        }
        keeper.foreach(k => state.update(KeeperState(k)))
        val lastSeenMs = arr.map(d => micros(d.ingest_ts)).max / 1000
        val timeoutMs = lastSeenMs + ttlMinutes * 60000L
        // a timeout at-or-behind the watermark would THROW (D2 guards the
        // same call): a digest whose whole batch arrived ≥TTL late is
        // already past its horizon — evict now; the next arrival re-crowns
        // (the documented TTL trade, just taken immediately)
        if (timeoutMs <= state.getCurrentWatermarkMs()) state.remove()
        else state.setTimeoutTimestamp(timeoutMs)
        out.iterator
      }
    }

    val decided = src
      .withWatermark("ingest_ts", "0 seconds")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"), col("ingest_ts"))
      .as[TsDoc]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(decide)
      .toDF()
    withStreamShufflePartitions(spark) {
      val q = decided.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (spark.table(name)
        .select(col("doc_id"), col("dup_of"), col("is_duplicate"))
        .orderBy(col("doc_id")),
        q.recentProgress.toSeq)
    }
  }

  private def dedupRun(spark: SparkSession, src: DataFrame, name: String,
    cp: java.io.File): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)

    // keeper presence is the STATE's presence, never a sentinel value — a
    // `-1` flag re-crowns every doc whose keeper id is negative (hashed
    // 64-bit crawl ids), the bug class C48's keeper fix removed
    def decide(h: String, docs: Iterator[Doc],
      state: GroupState[KeeperState]): Iterator[DedupDecision] = {
      val ids = docs.map(_.doc_id).toArray.sorted
      var keeper: Option[Long] = state.getOption.map(_.keeper)
      val out = ids.map { id =>
        keeper match {
          case None =>
            keeper = Some(id); DedupDecision(id, None, is_duplicate = false)
          case Some(k) => DedupDecision(id, Some(k), is_duplicate = true)
        }
      }
      keeper.foreach(k => state.update(KeeperState(k)))
      out.iterator
    }

    val decided = src
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .as[Doc]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(decide)
      .toDF()
    runToMemory(spark, decided, name, cp, OutputMode.Append())
      .select(col("doc_id"), col("dup_of"), col("is_duplicate"))
      .orderBy(col("doc_id"))
  }

  // ----- D5: streaming NEAR-dedup -----

  case class BandDoc(doc_id: Long, band_key: Long)
  case class BandKeepers(ids: Seq[Long])
  case class CandPair(doc_id: Long, cand_id: Long)

  /** D5 — streaming MinHash/LSH near-dedup: the near-dup tier of the
    * continuous ingest path (D4 is the exact tier). Signatures are computed
    * ROW-LOCALLY in the stream by the native MinHashSignature kernel — no
    * aggregation stage before the keyed state, which is what makes LSH
    * possible under a single stateful operator — then each document fans out
    * to its 16 band keys and flatMapGroupsWithState keyed by band_key holds
    * the band's first-MaxBucket keeper IDS. An arriving doc emits a
    * candidate pair per keeper already present and joins the keepers if
    * there is room; signature AGREEMENT is then resolved OUTSIDE the state
    * op against the memoized corpus signature store C2b maintains —
    * signatures are a deterministic row-local function of the text, so the
    * store lookup is bit-identical to having carried them, and keeper state
    * shrinks from 64 longs per (band, doc) to the id alone (measured at sf1: ~16× less state, 37.4 → 19.2 s committed in
    * BENCH_sf1_r6; state-store commit cost, not the compare loop, dominated
    * the fat-state form). The trade the move makes: sub-threshold band
    * collisions now reach the sink (bounded at bands × MaxBucket pairs per
    * doc) instead of dying in-state — the memory sink here is the test
    * harness's stand-in; production lands candidates in a file sink. The
    * rank-style keeper bound is the streaming analog of C2's
    * drop-the-bucket skew guard (append output cannot retract edges, so
    * state bounds membership instead of disqualifying buckets) and is
    * expressed in closed form by the generated DuckDB oracle
    * (Dedup.streamDedupNearSql) — the whole streaming operator is three-way
    * SQL-checked. The same monotone-ingest-id caveat as D4 applies across
    * batches. */
  def streamDedupNear(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup_near"))
    // resolve probes the SAME memoized signature store as C2b — one corpus
    // signature pass amortized across the batch and streaming near-dup tiers
    // (the sigs DataFrame is joined on both pair sides; uncached it would be
    // recomputed per join because the two shuffles partition differently)
    nearDedupRun(spark, docsStream(spark, sfDir), "stream_dedup_near", cp,
      graft.Tables.load(spark, sfDir, "documents"),
      graft.operators.Dedup.rowLocalSigs(spark, sfDir))
  }

  /** Test hook: every staged file its own micro-batch, so keepers persist
    * across the batch boundary for real. */
  private[graft] def streamDedupNearMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(DocsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    val staged = spark.read.schema(DocsSchema).parquet(stageDir)
    nearDedupRun(spark, src, name, cp, staged,
      staged.select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(spark, col("text")).as("sig")))
  }

  // ----- D17: streaming LINE-level dedup -----

  case class LineOcc(doc_id: Long, idx: Int, lh: String)
  case class LineKeeper(kdoc: Long, kidx: Int)
  case class LineMark(doc_id: Long, idx: Int)

  /** D17 — streaming cross-document LINE dedup: C48's CCNet tier as a
    * continuous-ingest operator, completing the streaming dedup ladder at
    * the grain it was missing (exact D4, near D5, semantic D10, media D12).
    * Each arriving doc re-lays into the deterministic 10-token lined view
    * inside the micro-batch scan (PipelineOps.linedDocs — the C48
    * construction verbatim), fans out to slim (doc_id, idx, lh)
    * occurrences, and flatMapGroupsWithState keyed on the LINE HASH holds
    * the keeper (doc_id, idx) — ONE long+int per distinct line. That state
    * shape is the streaming mirror of C48's de-skewed two-phase aggregate
    * and is inherently saturation-proof: a boilerplate line arriving 10^8
    * times updates one point state row (D5's MaxBucket guard exists
    * because its band state holds a keeper LIST; here membership never
    * accumulates). Only NON-keeper occurrences emit marks, and they land
    * in a FILE sink (D5's candidate-volume rule: on a boilerplate-heavy
    * backlog marks approach the corpus line count, and a memory sink would
    * round-trip them through the driver). The batch resolve rolls marks up
    * per doc and applies the factored C48 cut (PipelineOps.lineCut) over
    * the staged corpus — output frame and oracle are C48's VERBATIM (the
    * C29/D10 one-oracle rule).
    *
    * Batch equivalence: within a batch, a line hash's occurrences decide
    * by ascending (doc_id, idx), so the single-backlog run equals the
    * batch min-struct keeper exactly. Across micro-batches first-seen-wins
    * — a later batch's smaller (doc_id, idx) cannot re-crown an
    * established keeper (append mode already emitted its marks); D4's
    * monotone-ingest-id caveat, pinned by the multi-batch carry-over spec. */
  def streamDedupLines(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup_lines"))
    // oracleBatchGuard: the REGISTERED query shares C48's batch oracle, and
    // that equivalence holds only when the backlog drains in one micro-batch
    dedupLinesRun(spark, docsStream(spark, sfDir), "stream_dedup_lines", cp,
      graft.Tables.load(spark, sfDir, "documents"), oracleBatchGuard = true)
  }

  /** Count of micro-batches a drained query committed (checkpoint offset
    * log entries) — the guard input for streams whose registered oracle is
    * only valid on a single-batch drain. */
  private def committedBatches(cp: java.io.File): Int =
    Option(new java.io.File(cp, "offsets").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(f => f.getName.forall(_.isDigit))

  private def dedupLinesRun(spark: SparkSession, src: DataFrame, name: String,
    cp: java.io.File, allDocs: DataFrame,
    oracleBatchGuard: Boolean = false): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)

    // Single-pass running-min keeper: a hot boilerplate line's 10^8
    // in-batch occurrences must NOT be buffered and sorted in this task
    // (each LineOcc carries a 32-char hash string — the in-memory blowup
    // the batch side's two-phase aggregate exists to avoid). Tracking the
    // candidate min and emitting the DISPLACED candidate as a mark yields
    // the identical mark set (everything but the final min) with O(1)
    // group memory beyond the emitted marks themselves. A keeper restored
    // from STATE is never displaced (k eq stateK ⇒ mark any arrival):
    // first-seen-wins across batches, append mode can't re-crown.
    def decide(lh: String, occs: Iterator[LineOcc],
      state: GroupState[LineKeeper]): Iterator[LineMark] = {
      val stateK = state.getOption.orNull
      var k = stateK
      val out = Array.newBuilder[LineMark]
      occs.foreach { o =>
        if (k == null) k = LineKeeper(o.doc_id, o.idx)
        else if ((k ne stateK) &&
            (o.doc_id < k.kdoc || (o.doc_id == k.kdoc && o.idx < k.kidx))) {
          out += LineMark(k.kdoc, k.kidx)
          k = LineKeeper(o.doc_id, o.idx)
        } else if (o.doc_id != k.kdoc || o.idx != k.kidx)
          out += LineMark(o.doc_id, o.idx)
      }
      state.update(k)
      out.result().iterator
    }

    val occs = graft.operators.PipelineOps
      .lineOccs(graft.operators.PipelineOps.linedDocs(src))
      .as[LineOcc]
    val marks = occs
      .groupByKey(_.lh)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(decide)
      .toDF()
    // state-key cardinality ≈ distinct lines ≈ docs × ~12 ten-token lines
    val sink = runToFiles(spark, marks, storeSibling(cp, "_marks"), cp,
      stateKeyHint = allDocs.count() * 12L)
    // Cross-batch keeper semantics are FIRST-SEEN-WINS (a later batch's
    // smaller (doc_id, idx) cannot re-crown — append mode already emitted
    // its marks), while C48's batch oracle crowns the GLOBAL min. The two
    // agree exactly when the backlog drains in ONE micro-batch (the
    // registered production path: AvailableNow over the single staged
    // file); any future maxFilesPerTrigger or multi-file staging would
    // silently break oracle parity, so the registered entry ASSERTS the
    // single-batch precondition instead of assuming it. The multi-batch
    // spec path exercises carry-over deliberately and skips the guard.
    if (oracleBatchGuard) {
      val n = committedBatches(cp)
      require(n <= 1,
        s"$name drained in $n micro-batches — its registered oracle " +
          "(C48's global-min keeper) is only first-seen-wins-equivalent " +
          "on a single-batch drain; restage as one file or re-derive the " +
          "oracle for monotone multi-batch ingest")
    }
    val marked = sink.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("idx"))).as("marked"))
    graft.operators.PipelineOps
      .lineCut(graft.operators.PipelineOps.linedDocs(allDocs), marked)
      .orderBy(col("doc_id"))
  }

  /** Multi-batch form for the keeper carry-over spec: maxFilesPerTrigger=1
    * over a pre-staged two-file layout. */
  private[graft] def streamDedupLinesMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(DocsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    dedupLinesRun(spark, src, name, cp,
      spark.read.schema(DocsSchema).parquet(stageDir))
  }

  // ----- D18: streaming frequency-ceiling line REMOVAL -----

  /** D18 — streaming corpus-frequency line removal (`stream_dedup_lines_df`):
    * C50's REMOVAL policy as continuous ingest — the sixth grain of the
    * streaming dedup ladder, and the one first-seen-wins state CANNOT
    * express: document frequency is a GLOBAL count, so a line's verdict can
    * flip from innocent to boilerplate mid-stream and its EARLIER
    * occurrences (keeper included) must be invalidated retroactively.
    *
    * Shape (the C16b persisted-store pattern, not keyed state): each
    * micro-batch refreshes a persisted (lh, df-increment) store via C50's
    * two-phase distinct-pair aggregate — `occB.select(lh, doc_id).distinct()
    * .groupBy(lh).count()` de-skews a hot line's occurrences across the
    * pair exchange, and because a document arrives in exactly one batch,
    * per-batch increments SUM to the exact global df (within-doc repeats
    * still count once). Marks are emitted per batch to a file sink: every
    * current-batch occurrence of an over-ceiling line, plus — for lines
    * that CROSSED the ceiling this batch — every past occurrence read back
    * from the occurrence store (the retroactive late-invalidation leg; the
    * documented caveat is latency, not correctness — a mark can arrive
    * batches after the occurrence it kills, so a downstream consumer must
    * treat admitted lines as provisional until the resolve). The batch
    * resolve rolls all marks up per doc and applies the shared lineCut —
    * C50's frame and oracle VERBATIM (one-oracle rule), and unlike D17 the
    * equivalence needs NO single-batch precondition: df increments are
    * additive and marks retroactive, so the drained result is identical
    * under ANY batch slicing (the multi-batch spec pins a mid-stream
    * ceiling crossing).
    *
    * Crash/idempotence contract: all three per-batch artifacts (df
    * increment, occurrences, marks) land as deterministic batch-id files
    * (writeBatchFile's replace), and every read EXCLUDES the current
    * batch's own file (readOtherBatches), so an at-least-once replay can
    * neither double-count df nor duplicate retro marks; the mark rollup's
    * collect_set makes the resolve additionally set-idempotent. */
  def streamDedupLinesDf(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup_lines_df"))
    dedupLinesDfRun(spark, docsStream(spark, sfDir), "stream_dedup_lines_df",
      cp, graft.Tables.load(spark, sfDir, "documents"))
  }

  private val LineOccSchema = "doc_id BIGINT, idx INT, lh STRING"
  private val LineDfSchema = "lh STRING, bdf BIGINT"
  private val LineMarkSchema = "doc_id BIGINT, idx INT"

  private def dedupLinesDfRun(spark: SparkSession, src: DataFrame,
    name: String, cp: java.io.File, allDocs: DataFrame): DataFrame = {
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    val occStore = storeSibling(cp, "_occ")
    val dfStore = storeSibling(cp, "_df")
    val markStore = storeSibling(cp, "_marks")
    Seq(occStore, dfStore, markStore).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      sweepScratch(d)
      d.mkdirs()
    }
    val dfMax = graft.operators.PipelineOps.LineDfMax
    withStreamShufflePartitions(spark, stateKeyHint = allDocs.count() * 12L) {
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val occB = graft.operators.PipelineOps
            .lineOccs(graft.operators.PipelineOps.linedDocs(batch))
            .localCheckpoint() // feeds the pair aggregate AND the mark join
          val bdf = occB.select(col("lh"), col("doc_id")).distinct()
            .groupBy(col("lh")).agg(count(lit(1)).as("bdf"))
          val dfOld = readOtherBatches(spark, dfStore, LineDfSchema,
              excludeId = id)
            .groupBy(col("lh")).agg(sum(col("bdf")).as("odf"))
          // dfNew per line; hot = over ceiling now, newly = crossed it in
          // THIS batch (retro marks fire exactly once per line)
          // (lh, df, odf) feeds BOTH the hot and newly-hot filters; as
          // sibling subtrees each would re-run the bdf aggregate + dfOld
          // scan + full-outer join per batch. One per-line row per lh —
          // tiny — so materialize the verdict table once per batch.
          val joined = bdf.join(dfOld, Seq("lh"), "full_outer")
            .select(col("lh"),
              (coalesce(col("bdf"), lit(0L)) + coalesce(col("odf"), lit(0L))).as("df"),
              coalesce(col("odf"), lit(0L)).as("odf"))
            .localCheckpoint()
          val hot = joined.filter(col("df") > dfMax).select(col("lh"))
          val newlyHot = joined
            .filter(col("df") > dfMax && col("odf") <= dfMax).select(col("lh"))
          val retro = readOtherBatches(spark, occStore,
              schema = LineOccSchema, excludeId = id)
            .join(newlyHot, "lh").select(col("doc_id"), col("idx"))
          val marks = occB.join(hot, "lh").select(col("doc_id"), col("idx"))
            .union(retro)
          // commit order: marks first (recomputable from the OLD stores on
          // a replay), then the stores the NEXT batch reads
          writeBatchFile(marks, markStore, id)
          writeBatchFile(occB, occStore, id)
          writeBatchFile(bdf, dfStore, id)
        }
        .option("checkpointLocation", cp.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val marked = spark.read.schema(LineMarkSchema)
      .parquet(markStore.getAbsolutePath)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("idx"))).as("marked"))
    graft.operators.PipelineOps
      .lineCut(graft.operators.PipelineOps.linedDocs(allDocs), marked)
      .orderBy(col("doc_id"))
  }

  /** Multi-batch form for the mid-stream ceiling-crossing spec:
    * maxFilesPerTrigger=1 over a pre-staged layout. */
  private[graft] def streamDedupLinesDfMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(DocsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    dedupLinesDfRun(spark, src, name, cp,
      spark.read.schema(DocsSchema).parquet(stageDir))
  }

  /** The shared band-keeper state transition (D5's LSH bands and D12's
    * perceptual-hash chunks — any tier whose band key is a Long over docs).
    * Saturation guard — the streaming analog of the batch MaxBucket
    * drop-the-bucket rule: once a band holds MaxBucket keepers it is a
    * degenerate boilerplate cluster (handled by the exact tier, C1/D4),
    * and later arrivals emit NOTHING from it. Without this, a hot band
    * emits MaxBucket pairs per arriving doc FOREVER — O(N·bands·64)
    * candidate volume on a dup-heavy stream, the one super-linear bench
    * row at sf1 round 7. With it, a band's lifetime emission is capped at
    * C(MaxBucket, 2) pairs, mirroring batch's bounded per-bucket work. */
  private def keeperDecide(bandKey: Long, docs: Iterator[BandDoc],
    state: GroupState[BandKeepers]): Iterator[CandPair] = {
    val sorted = docs.toArray.sortBy(_.doc_id)
    var ids = state.getOption.map(_.ids.toArray).getOrElse(Array.empty[Long])
    val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
    sorted.foreach { d =>
      if (ids.length < graft.operators.Dedup.MaxBucket) {
        var i = 0
        while (i < ids.length) {
          if (ids(i) < d.doc_id) out += CandPair(d.doc_id, ids(i))
          i += 1
        }
        ids = ids :+ d.doc_id
      }
    }
    state.update(BandKeepers(ids.toSeq))
    out.iterator
  }

  private def nearDedupRun(spark: SparkSession, src: DataFrame, name: String,
    cp: java.io.File, allDocs: DataFrame, sigs: DataFrame): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)

    val banded = src
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(spark, col("text")).as("sig"))
      .select(col("doc_id"),
        explode(graft.operators.Dedup.bandKeyArray(col("sig"))).as("band_key"))
      .as[BandDoc]
    val cands = banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(keeperDecide)
      .toDF()
    // state-key cardinality ≈ docs × 16 band keys; the count is a
    // metadata-only parquet count-star, cheap next to the stream itself.
    // Candidates land in a FILE sink, not the memory sink the other
    // streaming queries use for the harness: on a dup-heavy backlog the
    // candidate volume approaches the corpus, and a memory sink would
    // round-trip every pair through the driver (unbounded driver heap at
    // 100 TB; measured 8.5 s of a 15.9 s sf1 run in the driver-held
    // resolve) — the parquet sink keeps pairs distributed end-to-end.
    val sink = runToFiles(spark, cands,
      storeSibling(cp, "_cands"), cp,
      stateKeyHint = allDocs.count() * 16L)
    // batch resolve over the candidate sink: distinct pairs (a pair can
    // collide in several bands), look both signatures up in the caller's
    // signature store (memoized corpus store in production; signatures are a
    // deterministic row-local function of the text, so a lookup is
    // bit-identical to re-deriving), fused agreement count, est >= 0.5 —
    // identical decisions to the fat-state form, same generated oracle. Join strategy
    // is left to AQE on purpose: on a lightly-duplicated stream the
    // signature sides are tiny and broadcast; on a pathological backlog
    // (the sf1 fixture runs ~90% near-dup) candidates approach the corpus
    // and AQE keeps the shuffle join — forcing either choice loses the
    // other regime.
    val pairs = sink.distinct()
      .join(sigs, Seq("doc_id"))
      .join(sigs.select(col("doc_id").as("cand_id"), col("sig").as("cand_sig")),
        Seq("cand_id"))
      .withColumn("agree",
        graft.functions.GraftFunctions.sigAgreement(spark, col("sig"), col("cand_sig")))
      .filter(col("agree") >= 32)
    val dup = pairs.groupBy(col("doc_id"))
      .agg(min(col("cand_id")).as("dup_of"),
        max(col("agree") / lit(64.0)).as("max_est_jaccard"))
    allDocs.select(col("doc_id"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        coalesce(col("max_est_jaccard"), lit(0.0)).as("max_est_jaccard"),
        col("dup_of").isNotNull.as("is_duplicate"))
      .orderBy(col("doc_id"))
  }

  // ----- D12: streaming MEDIA near-dedup -----

  private val MediaSchema = "media_id BIGINT, media BINARY"

  /** Stage the synthesized media corpus (C37's gradient PNGs) into the media
    * landing dir as several ranged flat part files — ordered names and
    * mtimes keep a multi-batch replay's ingest ids monotone, the same
    * arrival-order contract D4/D5/D10 document. Fingerprint-committed
    * against the documents table the payloads derive from. */
  private[graft] def stageMedia(spark: SparkSession, sfDir: String,
    stageDir: java.io.File): Boolean = {
    def parts = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("media_") && f.getName.endsWith(".parquet"))
    withFingerprint(sfDir, "documents", stageDir, freshData = parts.nonEmpty) {
      stageDir.mkdirs()
      parts.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(stageDir.getParentFile, "media_tmp")
      graft.operators.Multimodal.gradMediaTable(spark, sfDir)
        .repartitionByRange(4, col("media_id"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      moveStagedParts(tmp, stageDir, "media")
    }
  }

  /** The media stream: the landing directory a crawler writes image payloads
    * into — the media leg of the continuous ingest path. */
  private def mediaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = new java.io.File(
      s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/media_in")
    stageMedia(spark, sfDir, stageDir)
    spark.readStream.schema(MediaSchema).parquet(stageDir.getAbsolutePath)
  }

  case class MediaIn(media_id: Long, media: Array[Byte])

  /** D12 — streaming media near-dedup: the C37 tier of the continuous ingest
    * path, extending the dedup ladder (D4 exact, D5 MinHash/LSH, D10
    * semantic) to media BYTES, as TWO chained continuous tiers. The INGEST
    * tier decodes and perceptually hashes each arriving payload ROW-LOCALLY
    * inside its micro-batch (the codec seam — a real javax.imageio decode
    * per row, exactly once per arrival) and appends (id, dhash) into the
    * stream-side hash store, D11's O(batch) append applied to C37's store.
    * The DEDUP tier consumes that store: band fan-out is pure bit ops on
    * the stored hash (media bytes never enter this query), and the shared
    * band-keeper state transition (keeperDecide — D5's operator with the
    * chunk key playing the band key, including the saturated-band guard)
    * emits candidate pairs into a parquet FILE sink. Pairs are resolved
    * OUTSIDE the state op by full-hash Hamming ≤ 3 against the stream-side
    * store itself — both sides of every pair are stream arrivals, so a
    * payload the batch corpus has NEVER seen still resolves (spec-pinned
    * with a novel-arrival fixture); keeper state stays the id alone. The
    * shuffle carries (band, doc) rows, NEVER the media bytes — at 100 TB
    * the payloads stay in the ingest scan stage and only 12 bytes per
    * (doc, band) move. Closed form: the generated oracle
    * (Multimodal.streamDedupMediaSql) is C37's SQL with the keeper-rank
    * guard. Same monotone-ingest-id caveat as D4/D5/D10 across batches. */
  def streamDedupMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup_media"))
    // media payloads derive from documents — their fingerprint keys reuse
    mediaDedupRun(spark, mediaStream(spark, sfDir), cp,
      Some("mediastore:" + graft.Tables.fingerprint(sfDir, "documents")))
  }

  /** Test hook: every staged file its own micro-batch — band keepers must
    * persist across batch boundaries for real. */
  private[graft] def streamDedupMediaMultiBatch(spark: SparkSession,
    sfDir: String, stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(MediaSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    mediaDedupRun(spark, src, cp)
  }

  private val MediaHashSchema = "doc_id BIGINT, dhash BIGINT"

  private def mediaDedupRun(spark: SparkSession, src: DataFrame,
    cp: java.io.File, storeReuseKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    // INGEST tier: one javax.imageio decode + dHash per arrival, appended
    // into the stream-side hash store (the C37 store's continuous-maintenance
    // form) — the store the dedup tier consumes and the resolve looks up, so
    // a payload the batch corpus never saw still gets a verdict
    val store = storeSibling(cp, "_hashstore")
    ingestAppend(spark, src, store,
      storeSibling(cp, "_ingest"), storeReuseKey) { batch =>
      batch.as[MediaIn](org.apache.spark.sql.Encoders.product[MediaIn])
        .mapPartitions(_.map(m =>
          (m.media_id, graft.operators.Multimodal.dHashOfBytes(m.media))))(
          org.apache.spark.sql.Encoders.product[(Long, Long)])
        .toDF("doc_id", "dhash")
    }
    val hashes = spark.read.schema(MediaHashSchema)
      .parquet(store.getAbsolutePath)
    // DEDUP tier: consumes the hash store — band fan-out is pure bit ops on
    // the stored dhash (chunk index disambiguates the 16-bit key spaces,
    // exactly the batch tier's (chunk_id, chunk_key) composite); media bytes
    // never reach this query at all
    val banded = spark.readStream.schema(MediaHashSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(store.getAbsolutePath)
      .select(col("doc_id"), explode(array((0 until 4).map(j =>
        lit(j.toLong << 16).bitwiseOR(
          shiftrightunsigned(col("dhash"), 16 * j).bitwiseAND(lit(0xFFFFL)))): _*))
        .as("band_key"))
      .as[BandDoc]
    val cands = banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(keeperDecide)
      .toDF()
    // state-key cardinality ≈ docs × 4 chunk keys (bounded above by the
    // 4 × 65536 key space); candidates land distributed, never the driver
    val sink = runToFiles(spark, cands,
      storeSibling(cp, "_cands"), cp,
      stateKeyHint = math.min(hashes.count() * 4L, 4L * 65536L))
    // resolve against the STREAM store: both pair sides are stream arrivals
    // (keepers are arrivals too), so every candidate — including one for a
    // genuinely novel payload — finds its hash here
    val pairs = sink.distinct()
      .join(hashes, Seq("doc_id"))
      .join(hashes.select(col("doc_id").as("cand_id"), col("dhash").as("cand_hash")),
        Seq("cand_id"))
      .withColumn("hamming", bit_count(col("dhash").bitwiseXOR(col("cand_hash"))))
      .filter(col("hamming") <= 3)
    val dup = pairs.groupBy(col("doc_id"))
      .agg(min(col("cand_id")).as("dup_of"))
    hashes.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dhash"), col("dup_of"),
        col("dup_of").isNotNull.as("is_duplicate"))
      .orderBy(col("doc_id"))
  }

  // ----- D10: streaming SEMANTIC dedup -----

  private val EmbSchema = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"

  /** The embeddings stream: the vector leg of the continuous ingest path
    * (the landing directory an embedding service writes to). */
  private def embeddingsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = new java.io.File(
      s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/emb_in")
    stageCopy(sfDir, "embeddings", stageDir)
    spark.readStream.schema(EmbSchema).parquet(stageDir.getAbsolutePath)
  }


  /** D10 — streaming semantic dedup: the C29 tier of the continuous ingest
    * path, completing the lexical→semantic ladder (D4 exact, D5 MinHash/LSH,
    * this paraphrase-level), as TWO chained continuous tiers. The INGEST
    * tier assigns each arriving vector its cluster ROW-LOCALLY by the
    * broadcast-backed `graft_nearest_cid_bc` kernel against the FROZEN
    * corpus codebook (the offline-trained artifact — a stream must never
    * retrain it, or assignments would drift against the stored corpus
    * clusters) and appends (id, v, cid) into the stream-side assignment
    * store — D11's O(batch) append applied to the C29/C32 assignment table.
    * The DEDUP tier consumes that store: flatMapGroupsWithState keyed by
    * the stored cid holds the cluster's first-MaxBucket keeper ids — the D5
    * state pattern with the cluster id playing the band key. An arrival
    * emits one candidate per keeper present and joins if there is room; a
    * SATURATED cluster emits nothing (the same degenerate-bucket guard,
    * capping lifetime emission at C(MaxBucket, 2) pairs per cluster).
    * Candidates land in a parquet FILE sink (never the driver) and are
    * resolved OUTSIDE the state op by exact cosine ≥ τ against the
    * stream-side store itself — both sides of every pair are stream
    * arrivals, so a vector the batch corpus has NEVER seen still resolves
    * (spec-pinned with a novel-arrival fixture); vectors are looked up, not
    * carried, so keeper state is the id alone and the state-op shuffle
    * moves (id, cid) pairs only. The keeper-rank bound makes the whole
    * operator closed-form: the generated oracle
    * (Similarity.streamDedupSemanticSql) is C29's SQL with a
    * ROW_NUMBER-by-vec_id rank guard. Same monotone-ingest-id caveat as
    * D4/D5 across batches. */
  def streamDedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_dedup_semantic"))
    val codebook = graft.operators.Similarity.trainSemanticCodebook(spark, sfDir)
    // the store's content depends on (embeddings, frozen codebook); the
    // semantic cache tag covers both (fingerprint + K budget)
    semanticDedupRun(spark, embeddingsStream(spark, sfDir), cp, codebook,
      Some("semstore:" + graft.operators.Similarity.semanticCacheTag(sfDir)))
  }

  /** Test hook: every staged file its own micro-batch — keeper state must
    * persist across batch boundaries for real. */
  private[graft] def streamDedupSemanticMultiBatch(spark: SparkSession,
    sfDir: String, stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    val src = spark.readStream.schema(EmbSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    semanticDedupRun(spark, src, cp,
      graft.operators.Similarity.trainSemanticCodebook(spark, sfDir))
  }

  private val SemAssignSchema = "vec_id BIGINT, v ARRAY<DOUBLE>, cid BIGINT"

  private def semanticDedupRun(spark: SparkSession, src: DataFrame,
    cp: java.io.File, codebook: Array[(Int, Array[Double])],
    storeReuseKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(cp)

    // INGEST tier: assign each arrival its cluster ROW-LOCALLY with the
    // broadcast-backed kernel under the FROZEN corpus codebook, and append
    // (vec_id, v, cid) into the stream-side assignment store — D11's
    // O(batch) append applied to the C29/C32 assignment table, and the
    // store the resolve below looks up, so a vector the batch corpus never
    // saw still gets a verdict
    val store = storeSibling(cp, "_assignstore")
    ingestAppend(spark, src, store,
      storeSibling(cp, "_ingest"), storeReuseKey) { batch =>
      batch
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("v"))
        .withColumn("cid", graft.functions.GraftFunctions
          .nearestCidBroadcast(batch.sparkSession, col("v"), codebook))
    }
    val assignedAll = spark.read.schema(SemAssignSchema)
      .parquet(store.getAbsolutePath)

    // DEDUP tier: consumes the store — the SHARED keeper transition
    // (keeperDecide) with the stored cluster id playing the band key; one
    // copy of the saturation-guard logic for the lexical (D5), media (D12)
    // and semantic tiers. Vectors never enter this query: (id, cid) only.
    val assigned = spark.readStream.schema(SemAssignSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(store.getAbsolutePath)
      .select(col("vec_id").as("doc_id"), col("cid").as("band_key"))
      .as[BandDoc]
    val cands = assigned
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(keeperDecide)
      .toDF()
    // state-key cardinality = cluster count (K), tiny next to D5's band keys
    val sink = runToFiles(spark, cands,
      storeSibling(cp, "_cands"), cp,
      stateKeyHint = codebook.length.toLong)
      .withColumnRenamed("doc_id", "vec_id")
    // resolve against the STREAM store: one vector lookup per pair side —
    // both sides of every pair are stream arrivals (keepers are arrivals
    // too), so even a genuinely novel vector's candidates find their
    // vectors here (spec-pinned with a novel-arrival fixture); each vector
    // has exactly ONE cid, so pairs are already distinct
    val vecs = assignedAll.select(col("vec_id"), col("v"))
    val pairs = sink
      .join(vecs, Seq("vec_id"))
      .join(vecs.select(col("vec_id").as("cand_id"), col("v").as("cand_v")),
        Seq("cand_id"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosine(spark, col("v"), col("cand_v")))
      // the SHARED admit threshold — the batch tier (C29), the composed
      // pipelines and the generated D10 oracle all read this constant, so
      // a retune moves every tier together
      .filter(col("cosine") >= graft.operators.Similarity.SemanticTau)
    val dup = pairs.groupBy(col("vec_id"))
      .agg(min(col("cand_id")).as("dup_of"), max(col("cosine")).as("max_cosine"))
    assignedAll.select(col("vec_id"), col("cid"))
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("dup_of"),
        coalesce(col("max_cosine"), lit(0.0)).as("max_cosine"),
        col("dup_of").isNotNull.as("is_duplicate"))
      .orderBy(col("vec_id"))
  }

  // ----- D11: streaming IVF index append (C7d's continuous form) -----

  /** D11 — continuous index maintenance: the daily-batch append of C7d run
    * as a stream. New vectors land in a file-stream directory; each
    * micro-batch is assigned with the FROZEN corpus codebook and appended
    * into a cid-partitioned parquet layout via foreachBatch — the O(batch)
    * append path, never an O(corpus) rebuild; existing files are never
    * rewritten. The probe then reads the UNION of the corpus base layout and
    * the stream-appended layout, each side partition-pruned to the nProbe
    * lists (PartitionFilters on both scans — spec-pinned), so a freshly
    * streamed vector is a first-class ANN candidate the moment its
    * micro-batch commits. Content equals C7d's two-step build exactly, so
    * the probe shares its oracle. A replay starts from a fresh checkpoint
    * into an empty append dir (exactly-once per run), but an append layout
    * this JVM already built for the same source fingerprint is consumed
    * as-is — the ingestStoreMemo rule, since the layout is a deterministic
    * function of (staged batch, frozen codebook) and the codebook is itself
    * fingerprint-keyed. A production deploy keeps the checkpoint and the
    * append dir forever, so neither the replay nor the memo is on its
    * steady-state path. */
  def streamIvfAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val (basePath, codebook) =
      graft.operators.Similarity.ensureStreamCorpusIndex(spark, sfDir)
    // stage the "new vectors" backlog (the C16/C7d ingest split) as SEVERAL
    // files so AvailableNow + maxFilesPerTrigger exercises real multi-batch
    // appends, not one degenerate batch
    val stageDir = embBatchStageDir(sfDir)
    stageEmbeddingsBatch(spark, sfDir, stageDir)
    val cp = new java.io.File(checkpointDir(sfDir, "stream_ivf_append"))
    val appendDir = storeSibling(cp, "_appended")
    // the appended layout's cids come from the frozen corpus codebook, whose
    // K is policy-sized — the reuse key must move when the sizing does
    val reuseKey = "ivfappend:" +
      graft.operators.Similarity.corpusIvfFpTag(spark, sfDir)
    reuseOrBuild(appendDir, Some(reuseKey)) {
      org.apache.commons.io.FileUtils.deleteQuietly(cp)
      org.apache.commons.io.FileUtils.deleteQuietly(appendDir)
      val src = spark.readStream.schema(EmbSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir.getAbsolutePath)
      withStreamShufflePartitions(spark) {
        val q = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch
              .select(col("vec_id"), transform(col("embedding"),
                x => x.cast("double")).as("v"))
              .withColumn("cid", graft.functions.GraftFunctions
                .nearestCidBroadcast(batch.sparkSession, col("v"), codebook))
              .write.mode("append").partitionBy("cid")
              .parquet(appendDir.getAbsolutePath)
            ()
          }
          .option("checkpointLocation", cp.getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    graft.operators.Similarity.prunedProbe(spark, sfDir,
      Seq(basePath, appendDir.getAbsolutePath), codebook)
  }

  // ----- D21: streaming kNN-graph maintenance (C56 as continuous ingest) -----

  /** D21 — continuous graph maintenance (`stream_knn_graph_append`): C56's
    * O(batch) append run per micro-batch over D11's ingest backlog — the
    * WRITE path that keeps both the serving index layout and the neighbor
    * GRAPH store current as vectors arrive. Each micro-batch:
    *
    *  1. appends its frozen-codebook-assigned rows to the stream index
    *     layout (new files only — D11's append pattern), so the batch is a
    *     first-class ANN candidate the moment it commits;
    *  2. derives its probe lists ONCE, row-locally (the only probe planning
    *     in the batch — C56's plan-gate contract), and computes the two
    *     shortlist legs: new-queries vs corpus (exchange-free bucketed
    *     scan) + stream-so-far, and reverse-candidates from the PERSISTED
    *     probe stores (the corpus store AND the stream-side store of prior
    *     arrivals) joined to this batch's cid set — all ∝ batch/affected,
    *     never a corpus re-plan or re-score;
    *  3. merges the shortlists into the running q_id-BUCKETED full-precision
    *     graph store ∝-AFFECTED ([[graft.operators.GraphStore.mergeInPlace]]):
    *     only buckets holding shortlist q_ids are read, only those q_ids'
    *     edges are re-ranked (broadcast semi-join prune — the rank exchange
    *     carries batch-proportional slim rows, never 5N), and only the
    *     touched `bkt=` directories are swapped (rename-aside, no
    *     delete-then-move crash window); untouched buckets stay
    *     byte-identical on disk, so a drained stream of B batches does
    *     O(Σ affected_b) rank work, not Θ(B·N);
    *  4. only then appends its own probe lists to the stream probe store —
    *     the reverse legs of FUTURE batches join them there.
    *
    * By C56's exactness argument applied inductively per batch, the drained
    * graph equals the appended-corpus rebuild ROW-FOR-ROW regardless of
    * batch slicing (spec-pinned across maxFilesPerTrigger=1 multi-batch
    * runs), so the query shares C56's oracle verbatim. Replay contract is
    * D11's: fresh checkpoint into fresh store dirs per (re)build, reuse via
    * the manifest sidecar under a corpus-K-tagged key. */
  def streamKnnGraphAppend(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.{GraphStore, Similarity}
    // bind the frozen corpus codebook, base graph, probe-list and vector
    // stores BEFORE streaming (store doctrine + oracle-binding rule)
    val baseDir = Similarity.ensureBaseGraphDir(spark, sfDir)
    val stageDir = embBatchStageDir(sfDir)
    stageEmbeddingsBatch(spark, sfDir, stageDir)
    val cp = new java.io.File(checkpointDir(sfDir, "stream_knn_graph_append"))
    val graphDir = storeSibling(cp, "_graph")
    val idxDir = storeSibling(cp, "_idx")
    val probesDir = storeSibling(cp, "_probes")
    val reuseKey = "streamgraph:" + Similarity.corpusIvfFpTag(spark, sfDir)
    reuseOrBuild(graphDir, Some(reuseKey)) {
      Seq(cp, graphDir, idxDir, probesDir)
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      // seed the running graph with a byte-identical copy of the corpus-only
      // base store (same bucketed layout — the per-batch merge swaps only
      // the buckets each batch touches)
      org.apache.commons.io.FileUtils.copyDirectory(baseDir, graphDir)
      // the copied fp sidecar belongs to the BASE store, not this replay
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(graphDir, graft.StoreFp.SidecarName))
      val src = spark.readStream.schema(EmbSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir.getAbsolutePath)
      withStreamShufflePartitions(spark) {
        val q = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val s = batch.sparkSession
            val batchQ = batch.select(col("vec_id").as("q_id"),
              transform(col("embedding"), x => x.cast("double")).as("q"))
            val batchProbes = Similarity.corpusProbesOf(s, sfDir, batchQ)
            // (1) index append: new files in their cid partitions only
            val assigned = batchQ
              .select(col("q_id").as("vec_id"), col("q").as("v"))
              .withColumn("cid", graft.functions.GraftFunctions
                .nearestCidBroadcast(s, col("v"),
                  Similarity.corpusCodebook(s, sfDir)).cast("bigint"))
            assigned.write.mode("append").partitionBy("cid")
              .parquet(idxDir.getAbsolutePath)
            val streamIdx = s.read.parquet(idxDir.getAbsolutePath)
              .select(col("vec_id"), col("v"), col("cid").cast("bigint").as("cid"))
            // (2) the two legs — prior probes exclude THIS batch (step 4
            // hasn't run yet, so the scan can't see them)
            val prior =
              if (probesDir.isDirectory) s.read.parquet(probesDir.getAbsolutePath)
              else batchProbes.limit(0)
            val shortlists = Similarity.streamGraphBatchShortlists(
              s, sfDir, batchQ, streamIdx, assigned, prior)
            // (3) exact ∝-affected merge into the bucketed running graph:
            // only shortlist q_ids re-rank, only touched buckets swap
            GraphStore.mergeInPlace(s, graphDir, shortlists)
            // (4) publish this batch's probe lists for future reverse legs
            batchProbes.write.mode("append").parquet(probesDir.getAbsolutePath)
            ()
          }
          .option("checkpointLocation", cp.getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    GraphStore.display(GraphStore.read(spark, graphDir))
      .orderBy(col("q_id"), col("rnk"))
  }

  // ----- D19: continuous ANN query (C38b's kNN join as a stream) -----

  /** D19 — continuous similarity QUERY (`stream_knn`): C38b's kNN join run
    * as a stream of arriving queries against the FROZEN corpus index — the
    * online read path of the ANN matrix (D11 is the continuous WRITE path;
    * this is the retrieval/embedding-dedup service consuming the same
    * cid-bucketed store the batch join plans into). Each micro-batch plans
    * EXACTLY C38b's distributed join for its arrivals — the rank core is
    * Similarity.knnTopkOver, single-sourced with the batch operator, so
    * probe planning (row-local kernel, O(K) codebook broadcast only), the
    * exchange-free bucketed corpus side, and the rank/tie/round rules can
    * never drift. Results append to a parquet file sink, never the driver.
    *
    * Stateless across batches — the index is frozen and the per-query rank
    * reads only that query's own candidates, all of which arrive in its
    * own micro-batch — so the drained backlog equals the batch join on the
    * same query set REGARDLESS of batch slicing (stronger than D17's
    * monotone-ingest precondition; there is no cross-batch state to
    * order). The staged backlog is the C38 graded query slice split into
    * several files, run with maxFilesPerTrigger=1 so the production
    * multi-batch path is what the oracle grades: C38b's SQL verbatim. */
  def streamKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = knnQueryStageDir(sfDir)
    stageKnnQueries(spark, sfDir, stageDir)
    val cp = new java.io.File(checkpointDir(sfDir, "stream_knn"))
    val outDir = storeSibling(cp, "_out")
    // the sink's content is a deterministic function of (embeddings
    // fingerprint) — the staged slice, the frozen codebook, and the
    // bucketed index all derive from it
    val reuseKey = "streamknn:" + graft.Tables.fingerprint(sfDir, "embeddings")
    reuseOrBuild(outDir, Some(reuseKey)) {
      org.apache.commons.io.FileUtils.deleteQuietly(cp)
      org.apache.commons.io.FileUtils.deleteQuietly(outDir)
      val src = spark.readStream.schema(EmbSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir.getAbsolutePath)
      withStreamShufflePartitions(spark) {
        val q = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val queries = batch.select(col("vec_id").as("q_id"),
              transform(col("embedding"), x => x.cast("double")).as("q"))
            graft.operators.Similarity
              .knnTopkOver(batch.sparkSession, sfDir, queries)
              .write.mode("append").parquet(outDir.getAbsolutePath)
            ()
          }
          .option("checkpointLocation", cp.getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.read.parquet(outDir.getAbsolutePath).orderBy(col("q_id"), col("rnk"))
  }

  // ----- D20: continuous semantic decontamination (C55 as a gate) -----

  /** D20 — continuous SEMANTIC decontamination (`stream_decontam_semantic`):
    * C55's verdict run over arriving training vectors — the semantic tier
    * of the streaming gate ladder (D6 quality, D9 classifier, D13 LM, D16
    * Gopher, D7/D14 lexical decontam), and the gate a continuous-ingest
    * pipeline actually wants in front of its corpus store: eval leakage is
    * cheapest to stop at arrival, before the contaminated vector is
    * indexed, packed and mixed. Each micro-batch feeds
    * Similarity.decontamSemanticOver — the verdict core single-sourced
    * with C55, bench side broadcast from the frozen eval slice — and
    * appends (vec_id, max_bench_sim_r, contaminated) to a parquet file
    * sink. Stateless across batches (the eval suite is frozen; a vector's
    * max is over the STATIC bench set, not over other arrivals), so the
    * drained backlog equals C55 REGARDLESS of batch slicing — the oracle
    * is C55's verbatim. Staged as 3 files at maxFilesPerTrigger=1 so the
    * graded path is real multi-batch gating. */
  def streamDecontamSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val stageDir = decontamVecStageDir(sfDir)
    stageTrainVectors(spark, sfDir, stageDir)
    val cp = new java.io.File(checkpointDir(sfDir, "stream_decontam_semantic"))
    val outDir = storeSibling(cp, "_out")
    // the verdicts depend on the bench-cap policy as well as the bytes —
    // a retuned cap must replay, never reuse an old sink
    val reuseKey = "streamdecontamsem:" +
      graft.Tables.fingerprint(sfDir, "embeddings") +
      ":benchcap" + graft.operators.Similarity.DecontamBenchCap
    reuseOrBuild(outDir, Some(reuseKey)) {
      org.apache.commons.io.FileUtils.deleteQuietly(cp)
      org.apache.commons.io.FileUtils.deleteQuietly(outDir)
      val src = spark.readStream.schema(EmbSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir.getAbsolutePath)
      withStreamShufflePartitions(spark) {
        val q = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val train = batch.select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
            graft.operators.Similarity
              .decontamSemanticOver(batch.sparkSession, sfDir, train)
              .write.mode("append").parquet(outDir.getAbsolutePath)
            ()
          }
          .option("checkpointLocation", cp.getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.read.parquet(outDir.getAbsolutePath).orderBy(col("vec_id"))
  }

  /** The landing dir for the D20 training-vector backlog. */
  private def decontamVecStageDir(sfDir: String): java.io.File = new java.io.File(
    s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/dsem_in")

  /** Stage the training-side vectors (everything outside the CAPPED bench
    * slice — C55's split, single-sourced via Similarity.decontamBench: the
    * bench is the frozen fixed-size eval suite, never an arrival) as 3
    * flat parquet files, fingerprint-committed like every staged copy (the
    * bench cap rides the fingerprint tag, so a cap retune restages). */
  private def stageTrainVectors(spark: SparkSession, sfDir: String,
    stageDir: java.io.File): Boolean = {
    def parts = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("dsem_") && f.getName.endsWith(".parquet"))
    withFingerprint(sfDir, "embeddings", stageDir, freshData = parts.nonEmpty,
      tag = ":benchcap" + graft.operators.Similarity.DecontamBenchCap) {
      stageDir.mkdirs()
      parts.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(stageDir.getParentFile, "dsem_tmp")
      graft.Tables.load(spark, sfDir, "embeddings")
        .filter(!graft.operators.Similarity.decontamBench(col("vec_id")))
        .repartitionByRange(3, col("vec_id"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      moveStagedParts(tmp, stageDir, "dsem")
    }
  }

  /** The landing dir for the D19 query backlog — one definition, shared by
    * warmup staging and the query (the embBatchStageDir rule). */
  private def knnQueryStageDir(sfDir: String): java.io.File = new java.io.File(
    s"${graft.GraftConf.localRoot}/graft_stream/${sfDir.replaceAll("[^A-Za-z0-9]+", "_")}/knnq_in")

  /** Stage the C38 graded query slice (vec_id % 97 == 7) as 3 flat parquet
    * files under the landing dir, fingerprint-committed like every staged
    * copy — several files so AvailableNow + maxFilesPerTrigger exercises
    * real multi-batch serving, not one degenerate batch. */
  private def stageKnnQueries(spark: SparkSession, sfDir: String,
    stageDir: java.io.File): Boolean = {
    def parts = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("knnq_") && f.getName.endsWith(".parquet"))
    withFingerprint(sfDir, "embeddings", stageDir, freshData = parts.nonEmpty) {
      stageDir.mkdirs()
      parts.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(stageDir.getParentFile, "knnq_tmp")
      graft.Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 97 === 7)
        .repartitionByRange(3, col("vec_id"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      moveStagedParts(tmp, stageDir, "knnq")
    }
  }

  /** Stage the batch-split vectors (vec_id % 10 == 9) as 3 flat parquet
    * files under the landing dir, fingerprint-committed like every staged
    * copy. */
  private def stageEmbeddingsBatch(spark: SparkSession, sfDir: String,
    stageDir: java.io.File): Boolean = {
    def parts = Option(stageDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("emb_") && f.getName.endsWith(".parquet"))
    withFingerprint(sfDir, "embeddings", stageDir, freshData = parts.nonEmpty) {
      stageDir.mkdirs()
      parts.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      val tmp = new java.io.File(stageDir.getParentFile, "emb_batch_tmp")
      graft.Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 10 === 9)
        .repartitionByRange(3, col("vec_id"))
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      moveStagedParts(tmp, stageDir, "emb")
    }
  }

  // ----- D8: stream-stream interval join -----

  /** D8 — watermarked stream-stream interval join: click→purchase attribution
    * (every purchase joined to the same user's clicks in the preceding hour).
    * Both sides carry a 2-hour watermark and the join condition carries the
    * time range, so Spark derives per-side STATE WATERMARKS: a buffered click
    * is dropped once the purchase-side watermark passes click_ts + 1h, a
    * buffered purchase once the click-side watermark passes it — state is
    * bounded by the join window + delay at ANY stream length, the property
    * that makes this runnable on an unbounded 100 TB/day stream. Matching is
    * co-partitioned by the user_id equality (one Exchange per side, same as
    * the batch join's shuffle).
    *
    * No sentinel dependency: append-mode INNER join emits a pair the moment
    * both rows have arrived — the watermark only EVICTS state, it never gates
    * emission — so the drained backlog equals the batch join exactly and the
    * query shares a plain two-sided SQL-join oracle (the type filters also
    * drop the sentinel on both sides before it reaches the join). */
  def streamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cp = new java.io.File(checkpointDir(sfDir, "stream_join"))
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView("stream_join")
    joinRun(spark, eventsStream(spark, sfDir), eventsStream(spark, sfDir),
      "stream_join", cp)
  }

  /** Test hook: each staged file its own micro-batch, so pairs whose two
    * sides arrive in DIFFERENT batches must match through buffered state. */
  private[graft] def streamJoinMultiBatch(spark: SparkSession,
    stageDir: String, name: String): DataFrame = {
    val cp = new java.io.File(stageDir + "_cp_" + name)
    org.apache.commons.io.FileUtils.deleteQuietly(cp)
    spark.catalog.dropTempView(name)
    def src() = spark.readStream.schema(EventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    joinRun(spark, src(), src(), name, cp)
  }

  private def joinRun(spark: SparkSession, clickSrc: DataFrame,
    purchaseSrc: DataFrame, name: String, cp: java.io.File): DataFrame = {
    val clicks = clickSrc
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = purchaseSrc
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
    runToMemory(spark, joined, name, cp, OutputMode.Append())
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** D3 — streaming sink into the catalog: the windowed aggregate lands as
    * partitioned parquet under the EDFS root (partitioned by event_type so the
    * sink layout is query-prunable), then is read back through the batch path.
    * This is the full source→transform→catalog-sink loop a production
    * ingest pipeline runs continuously. Sentinel-finalized like D1, so the
    * read-back equals the batch hourly count and carries a sql oracle. */
  def streamToCatalog(spark: SparkSession, sfDir: String): DataFrame =
    streamToCatalog(spark, sfDir, fresh = true)

  /** `fresh = false` resumes from the existing checkpoint instead of
    * replaying — with no new source files this is a no-op batch, and the sink
    * gains NOTHING: the exactly-once property StreamingSpec pins. */
  def streamToCatalog(spark: SparkSession, sfDir: String, fresh: Boolean): DataFrame = {
    val outDir = s"${graft.operators.Pmr.catalogRoot(sfDir)}/warehouse/events_hourly"
    val cp = new java.io.File(checkpointDir(sfDir, "stream_to_catalog"))
    if (fresh) {
      org.apache.commons.io.FileUtils.deleteQuietly(cp)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
    // Same no-in-plan-filter rule as D1; the sentinel window is never emitted.
    val agg = eventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
    withStreamShufflePartitions(spark) {
      val q = agg.writeStream
        .format("parquet")
        .partitionBy("event_type")
        .option("path", outDir)
        .option("checkpointLocation", cp.getAbsolutePath)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(outDir)
      .filter(col("event_type") =!= SentinelType)
      .select(col("window_start"), col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window" -> (streamWindow _),
    "stream_sessions" -> (streamSessions _),
    "stream_to_catalog" -> (streamToCatalog _),
    "stream_dedup" -> (streamDedup _),
    "stream_dedup_near" -> (streamDedupNear _),
    "stream_dedup_lines" -> (streamDedupLines _),
    "stream_dedup_lines_df" -> (streamDedupLinesDf _),
    "stream_dedup_semantic" -> (streamDedupSemantic _),
    "stream_dedup_media" -> (streamDedupMedia _),
    "stream_ivf_append" -> (streamIvfAppend _),
    "stream_knn" -> (streamKnn _),
    "stream_knn_graph_append" -> (streamKnnGraphAppend _),
    "stream_decontam_semantic" -> (streamDecontamSemantic _),
    "stream_quality_gate" -> (streamQualityGate _),
    "stream_classify" -> (streamClassify _),
    "stream_lm_gate" -> (streamLmGate _),
    "stream_gopher" -> (streamGopherGate _),
    "stream_decontam_gate" -> (streamDecontamGate _),
    "stream_decontam_cut" -> (streamDecontamCut _),
    "stream_pack" -> (streamPack _),
    "stream_join" -> (streamJoin _))

  /** With sentinel-driven finalization all three streaming queries are exactly
    * batch-equivalent on a finite backlog, so each carries a sql oracle:
    * stream_window ≡ B7, stream_sessions ≡ B8, stream_to_catalog ≡ B7 minus
    * the value sum. */
  val oracles: Map[String, String] = Map(
    "stream_window" -> graft.operators.Relational.qEventsWindowSql,
    "stream_sessions" -> graft.operators.Relational.qEventsSessionizeSql,
    "stream_to_catalog" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, COUNT(*) AS n_events
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // D5's closed-form oracle: rank-guarded band candidates + signature
    // agreement (see Dedup.streamDedupNearSql's scaladoc)
    "stream_dedup_near" -> graft.operators.Dedup.streamDedupNearSql,
    // D17 is batch-equivalent on the finite backlog → C48's oracle
    // VERBATIM (the C29/D10 one-oracle rule)
    "stream_dedup_lines" -> graft.operators.PipelineOps.dedupLinesSql,
    // D18 shares C50's oracle verbatim — and unlike D17 the equivalence is
    // batch-slicing-INDEPENDENT (df increments are additive, marks
    // retroactive), so no single-batch guard is needed
    "stream_dedup_lines_df" -> graft.operators.PipelineOps.dedupLinesDfSql,
    // D12's closed-form oracle: C37's pixel/hash/banding SQL with the
    // keeper-rank guard (see Multimodal.streamDedupMediaSql's scaladoc)
    "stream_dedup_media" -> graft.operators.Multimodal.streamDedupMediaSql,
    // D6 is stateless → exactly the gated C9 on the drained backlog
    "stream_quality_gate" -> graft.operators.TextAnalysis.qualityGateSql("0.25"),
    // D9 is stateless → exactly the gated C34 on the drained backlog
    "stream_classify" -> graft.operators.TextAnalysis.classifyGateSql,
    "stream_lm_gate" -> graft.operators.TextAnalysis.lmGateSql,
    // D16 is stateless → exactly the gated C47 on the drained backlog
    // (single-sourced gopherSql, the D6/D9/D13 pattern)
    "stream_gopher" -> graft.operators.TextAnalysis.gopherGateSql,
    // D7 is stateless → exactly C15's report with the gate verdict; shares
    // the gramsCte domain (incl. the <5-token whole-text fallback)
    "stream_decontam_gate" ->
      (s"WITH ${graft.operators.PipelineOps.gramsCte},\n" +
      """bench AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0),
        |corpus AS (SELECT * FROM grams WHERE doc_id % 97 != 0),
        |hits AS (
        | SELECT e.doc_id, COUNT(*) AS n_contaminated
        | FROM (SELECT doc_id, unnest(gs) AS g FROM corpus) e
        | JOIN bench b ON e.g = b.g
        | GROUP BY e.doc_id)
        |SELECT c.doc_id, CAST(len(c.gs) AS BIGINT) AS n_grams,
        | COALESCE(h.n_contaminated, 0) AS n_contaminated,
        | COALESCE(h.n_contaminated, 0) = 0 AS kept
        |FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
        |ORDER BY c.doc_id""".stripMargin),
    // D14 is stateless -> exactly C45's batch cut on the drained backlog
    // (ONE oracle for the batch and streaming forms, the C29/D10 rule)
    "stream_decontam_cut" -> graft.operators.PipelineOps.decontamSubstrSql,
    // D15 shares C44's manifest oracle: layout and measure are single-
    // sourced (packDocFrame/WsTokMeasure) and the in-batch sub-shard order
    // is ascending doc_id, so the drained backlog IS the batch manifest
    "stream_pack" -> graft.operators.PipelineOps.seqPackManifestSql,
    // D8: inner interval joins emit watermark-independently, so the drained
    // backlog is exactly the batch join (timestamps compared at the micro
    // precision both engines truncate to)
    "stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS ts_us FROM events)
        |SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        | epoch_us(p.ts_us) - epoch_us(c.ts_us) AS gap_us
        |FROM e p JOIN e c
        | ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id""".stripMargin,
    // D4 ≡ the batch window-min dedup on a single-batch backlog (in-batch
    // groups decide by ascending doc_id, matching MIN OVER the digest)
    "stream_dedup" ->
      """SELECT doc_id,
        | CASE WHEN doc_id = mn THEN NULL ELSE mn END AS dup_of,
        | doc_id <> mn AS is_duplicate
        |FROM (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS mn
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin)
}
