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

  test("sessionization survives multi-batch slicing (maxFilesPerTrigger=1)") {
    import org.apache.spark.sql.functions._
    // stage the backlog as three time-sliced files + the EOS sentinel, each
    // its own micro-batch: sessions spanning slice boundaries must merge
    // through state, late slices must not collide with closed counters
    val stageDir = new java.io.File("/root/repo/target/test_stream_multibatch")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    // slice the CANONICAL (µs TimestampType) form — the landing dir's contract
    val raw = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val Array(t1, t2) = raw.stat.approxQuantile("us", Array(0.33, 0.66), 0.001)
    val maxUs = raw.agg(max(col("us"))).head().getLong(0)
    val slices = Seq(
      raw.filter(col("us") <= t1.toLong).drop("us"),
      raw.filter(col("us") > t1.toLong && col("us") <= t2.toLong).drop("us"),
      raw.filter(col("us") > t2.toLong).drop("us"))
    val sentinel = spark.range(1).select(lit(-1L).as("event_id"),
      timestamp_micros(lit(maxUs + 8L * 3600 * 1000 * 1000)).as("ts"), lit(-1L).as("user_id"),
      lit("__graft_eos").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
    (slices :+ sentinel).zipWithIndex.foreach { case (df, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"mb_tmp_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"slice_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L) // strictly increasing
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val streamed = Streams.streamSessionsMultiBatch(spark,
      stageDir.getAbsolutePath, "mb_sessions").collect().map(_.toSeq).toSet
    val batch = Relational.qEventsSessionize(spark, sfDir).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"multi-batch divergence: extra=${(streamed diff batch).take(3)} missing=${(batch diff streamed).take(3)}")
  }

  test("stream-stream interval join equals the batch join on one backlog") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.streamJoin(spark, sfDir).collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, sfDir)
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .join(ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("click_ts")),
        col("c_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("stream-stream join matches pairs across micro-batch boundaries") {
    import org.apache.spark.sql.functions._
    // a click and its purchase land in DIFFERENT micro-batches: the click
    // must wait in join state until the purchase's batch arrives
    val stageDir = new java.io.File("/root/repo/target/test_stream_join_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val us = 1000L * 1000
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L) // canonical µs form
    val rows = Seq(
      // user 1: click then purchase 10 min later (cross-batch pair)
      (1L, ts(1000), 1L, "click", 1.0, "{}"),
      (2L, ts(1600), 1L, "purchase", 5.0, "{}"),
      // user 2: click a full 2h before the purchase — outside the window
      (3L, ts(1000), 2L, "click", 1.0, "{}"),
      (4L, ts(1000 + 7200), 2L, "purchase", 5.0, "{}"),
      // user 3: purchase BEFORE the click — must not match
      (5L, ts(2000), 3L, "purchase", 5.0, "{}"),
      (6L, ts(2500), 3L, "click", 1.0, "{}"))
    val slices = Seq(rows.take(1), rows.drop(1)) // click alone, rest later
    slices.zipWithIndex.foreach { case (slice, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"sj_tmp_$i")
      import spark.implicits._
      slice.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"slice_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val got = Streams.streamJoinMultiBatch(spark, stageDir.getAbsolutePath,
      "sj_mb").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 1L, 1L, 600L * us)),
      s"expected exactly the cross-batch pair, got ${got.mkString(", ")}")
  }

  test("stream-stream join plan: symmetric hash join, one exchange per side, two state watermarks") {
    // the scale contract of D8: matching is co-partitioned by the user-id
    // equality (exactly one Exchange per side, REQUIRED_BY_STATEFUL_OPERATOR)
    // into a StreamingSymmetricHashJoin whose per-side state-cleanup
    // predicates bound buffered state at any stream length — if this ever
    // degrades to a non-equi-keyed cross-stream compare (no exchanges, or
    // state never cleaned), the query stops being runnable on an unbounded
    // stream even though results on a finite backlog stay correct
    Streams.streamJoin(spark, sfDir)
    val plan = Streams.lastStreamPlan
    assert(plan.contains("StreamingSymmetricHashJoin"),
      s"interval join lost the symmetric hash join operator:\n${plan.take(2000)}")
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 2, s"expected exactly one exchange per side, got $ex:\n${plan.take(2000)}")
    assert(plan.contains("left value predicate:") && plan.contains("right value predicate:"),
      s"state cleanup must carry BOTH per-side watermark predicates:\n${plan.take(2000)}")
  }

  test("resuming the catalog sink from its checkpoint adds nothing (exactly-once)") {
    val first = Streams.streamToCatalog(spark, sfDir).count()
    val resumed = Streams.streamToCatalog(spark, sfDir, fresh = false).count()
    assert(resumed == first,
      s"resume re-emitted rows: first=$first resumed=$resumed")
  }

  test("staging re-copies when the source fingerprint changes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = new java.io.File("/root/repo/target/test_stage_src")
    val stageDir = new java.io.File("/root/repo/target/test_stage_dst")
    Seq(srcDir, stageDir).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    srcDir.mkdirs()
    def writeSource(tag: String, mtime: Long): Unit = {
      val tmp = new java.io.File(srcDir.getParent, "stage_src_tmp")
      Seq((1L, tag)).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, "documents.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    writeSource("old", 1700000000000L)
    assert(Streams.stageCopy(srcDir.getAbsolutePath, "documents", stageDir),
      "first call must stage")
    assert(!Streams.stageCopy(srcDir.getAbsolutePath, "documents", stageDir),
      "unchanged source must not re-stage")
    writeSource("new", 1700000060000L) // regenerated in place
    assert(Streams.stageCopy(srcDir.getAbsolutePath, "documents", stageDir),
      "changed fingerprint must re-stage")
    val staged = spark.read.parquet(s"${stageDir.getAbsolutePath}/documents.parquet")
      .select(col("text")).head().getString(0)
    assert(staged == "new", s"stale staged copy served: $staged")
  }

  test("media staging restages on source change and keeps ranged part order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = new java.io.File("/root/repo/target/test_media_stage_src")
    val stageDir = new java.io.File("/root/repo/target/test_media_stage_dst")
    Seq(srcDir, stageDir).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    srcDir.mkdirs()
    def writeSource(n: Int, mtime: Long): Unit = {
      val tmp = new java.io.File(srcDir.getParent, "media_stage_tmp")
      (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, "documents.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(mtime)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    writeSource(40, 1700000000000L)
    assert(Streams.stageMedia(spark, srcDir.getAbsolutePath, stageDir),
      "first call must stage")
    assert(!Streams.stageMedia(spark, srcDir.getAbsolutePath, stageDir),
      "unchanged source must not re-stage")
    // the landing files are RANGED and name-ordered: every id in media_000
    // precedes every id in media_001.. — the monotone-ingest contract a
    // multi-batch replay relies on
    val parts = stageDir.listFiles().filter(f =>
      f.getName.startsWith("media_") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parts.length == 4, s"expected 4 ranged parts, got ${parts.length}")
    val ranges = parts.map { p =>
      val ids = spark.read.parquet(p.getAbsolutePath)
        .select(col("media_id")).collect().map(_.getLong(0))
      (ids.min, ids.max)
    }.toSeq
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi < lo, s"part ranges overlap or are misordered: $ranges")
    }
    // crash mid-restage (commit marker gone) → the next call self-heals
    new java.io.File(stageDir, ".documents.src_fp").delete()
    assert(Streams.stageMedia(spark, srcDir.getAbsolutePath, stageDir),
      "missing commit marker must force a restage")
    // regenerated corpus → fingerprint mismatch → restage with new payloads
    writeSource(50, 1700000060000L)
    assert(Streams.stageMedia(spark, srcDir.getAbsolutePath, stageDir),
      "changed fingerprint must re-stage")
    val total = spark.read.parquet(stageDir.listFiles()
      .filter(f => f.getName.startsWith("media_") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath): _*).count()
    assert(total == 50, s"restaged corpus size $total != 50")
  }

  test("interrupted events restage self-heals (fingerprint is the commit marker)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = new java.io.File("/root/repo/target/test_evnorm_src")
    val stageDir = new java.io.File("/root/repo/target/test_evnorm_dst")
    Seq(srcDir, stageDir).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    srcDir.mkdirs()
    Seq((1L, new java.sql.Timestamp(1700000000000L), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"${srcDir.getAbsolutePath}/events.parquet")
    assert(Streams.stageEventsNormalized(spark, srcDir.getAbsolutePath, stageDir),
      "first call must stage")
    assert(!Streams.stageEventsNormalized(spark, srcDir.getAbsolutePath, stageDir),
      "unchanged source must not re-stage")
    // crash mid-restage: data mutated but the commit marker never written —
    // the next run must treat the dir as stale and restage, not serve it
    new java.io.File(stageDir, ".events.src_fp").delete()
    assert(Streams.stageEventsNormalized(spark, srcDir.getAbsolutePath, stageDir),
      "missing commit marker must force a restage")
    // a pre-normalization raw-copy layout must restage even with a valid
    // marker, and the old-encoding copy must be gone afterwards
    val legacy = new java.io.File(stageDir, "events.parquet")
    java.nio.file.Files.writeString(legacy.toPath, "old-layout")
    assert(Streams.stageEventsNormalized(spark, srcDir.getAbsolutePath, stageDir),
      "legacy raw-copy layout must force a restage")
    assert(!legacy.exists(), "legacy events.parquet must be removed by the restage")
    // the EOS sentinel is INSIDE the commit boundary: staging writes it, its
    // absence fails the freshness check even under a valid marker, and a
    // restage recreates it — so a crash between data commit and sentinel
    // write can never serve fresh data with a stale/missing sentinel
    val sentinel = new java.io.File(stageDir, "z_sentinel.parquet")
    assert(sentinel.exists(), "staging must write the EOS sentinel itself")
    sentinel.delete()
    assert(Streams.stageEventsNormalized(spark, srcDir.getAbsolutePath, stageDir),
      "missing sentinel must force a restage despite a valid marker")
    assert(sentinel.exists(), "restage must recreate the EOS sentinel")
  }

  test("streaming quality gate is stateless and equals the gated batch query exactly") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val got = Streams.streamQualityGate(spark, sfDir).collect().map(_.toSeq).toSeq
    val want = graft.operators.TextAnalysis.textQuality(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("quality_score") > 0.25)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "stream/batch divergence in the quality gate")
    assert(got.nonEmpty && got.length < total, "gate must pass some docs and drop some")
    // statelessness contract (same as D9): the filter tier must never grow a
    // state store or a shuffle — that's what makes it free-throughput
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore") && !plan.contains("Exchange hashpartitioning"),
      s"quality gate stopped being stateless:\n${plan.take(2000)}")
  }

  test("streaming dedup decisions are state-store-provider agnostic (RocksDB = HDFS)") {
    // the deployment-scale switch (SPARK_GRAFT_STATE_STORE) must never change
    // WHAT a stateful query decides — this pins that the RocksDB provider is
    // actually runnable in this build and bit-agrees with the on-heap default
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def run(provider: String): Seq[Seq[Any]] = {
      spark.conf.set(key, provider)
      try Streams.streamDedup(spark, sfDir).collect().map(_.toSeq).toSeq
      finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
    val hdfs = run(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    val rocks = run(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    assert(rocks.nonEmpty, "provider check ran an empty stream")
    assert(rocks == hdfs, "state-store provider changed dedup decisions")
  }

  test("streaming classifier gate is stateless and equals the gated batch query exactly") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val got = Streams.streamClassify(spark, sfDir).collect().map(_.toSeq).toSeq
    val want = graft.operators.TextAnalysis.textClassify(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("clf_score") > 0.0)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "stream/batch divergence in the classifier gate")
    assert(got.nonEmpty && got.length < total, "gate must pass some docs and drop some")
    // the statelessness contract: scoring is a pure projected kernel — a
    // state store or a shuffle in the micro-batch plan would mean the gate
    // stopped being a free-throughput filter tier
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore"),
      s"classifier gate grew a state store:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"classifier gate grew a shuffle:\n${plan.take(2000)}")
  }

  test("streaming LM gate is stateless and equals the gated batch query exactly") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val got = Streams.streamLmGate(spark, sfDir).collect().map(_.toSeq).toSeq
    val want = graft.operators.TextAnalysis.textPerplexity(spark, sfDir)
      .filter(!org.apache.spark.sql.functions.col("lowq"))
      .collect().map(_.toSeq).toSeq
    assert(got == want, "stream/batch divergence in the LM gate")
    assert(got.nonEmpty && got.length < total, "gate must pass some docs and drop some")
    // same statelessness contract as D9: the model is a plan literal and
    // scoring a pure projected kernel — no state store, no shuffle
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore"),
      s"LM gate grew a state store:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"LM gate grew a shuffle:\n${plan.take(2000)}")
  }

  test("streaming Gopher gate is stateless and equals the gated batch query exactly") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val got = Streams.streamGopherGate(spark, sfDir).collect().map(_.toSeq).toSeq
    val want = graft.operators.TextAnalysis.textGopher(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("admit"))
      .collect().map(_.toSeq).toSeq
    assert(got == want, "stream/batch divergence in the Gopher gate")
    assert(got.nonEmpty && got.length < total, "gate must pass some docs and drop some")
    // the statelessness contract shared by the whole gate ladder: the six
    // rules are one fused kernel call in the scan — a state store or a
    // shuffle would mean the tier stopped being free-throughput
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore"),
      s"Gopher gate grew a state store:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"Gopher gate grew a shuffle:\n${plan.take(2000)}")
  }

  test("streaming decontamination gate equals the batch contamination report") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamDecontamGate(spark, sfDir).collect()
    // C15 is the batch semantic reference: same corpus split, same distinct
    // 5-gram domain; the gate verdict is ratio == 0
    val want = graft.operators.PipelineOps.contamination(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.length == want.size, "gate must emit one verdict per corpus doc")
    got.foreach { r =>
      val (nGrams, nCont) = want(r.getLong(0))
      assert(r.getLong(1) == nGrams && r.getLong(2) == nCont,
        s"doc ${r.getLong(0)}: stream (${r.getLong(1)},${r.getLong(2)}) != batch ($nGrams,$nCont)")
      assert(r.getBoolean(3) == (nCont == 0L))
    }
    assert(got.exists(!_.getBoolean(3)), "fixture has no contaminated doc — gate never fired")
    assert(got.exists(_.getBoolean(3)), "gate dropped everything")
    // statelessness contract (same as D6/D9): the gram-set probe is a plan
    // reference evaluated in the scan — no state store, no shuffle
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore") && !plan.contains("Exchange hashpartitioning"),
      s"decontamination gate stopped being stateless:\n${plan.take(2000)}")
  }

  test("streaming span-cut decontamination equals the batch C45 cut exactly") {
    import org.apache.spark.sql.functions._
    val got = Streams.streamDecontamCut(spark, sfDir).collect().map(_.toSeq)
    // one shared contract: the drained backlog IS the batch operator's frame
    val want = graft.operators.PipelineOps.decontamSubstr(spark, sfDir)
      .collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      s"stream cut drifted from batch: got ${got.take(3)} want ${want.take(3)}")
    // the fixture must drive the cut non-vacuously in BOTH directions
    assert(got.exists(_(2).asInstanceOf[Long] > 0), "no span cut on the backlog")
    assert(got.exists(_(2).asInstanceOf[Long] == 0), "everything cut")
    // statelessness contract (D6/D7/D9/D13's): the mark is a plan-reference
    // kernel in the scan and the cut is row-local — no state store, no
    // shuffle, no join
    val plan = Streams.lastStreamPlan
    assert(!plan.contains("StateStore") && !plan.contains("Exchange hashpartitioning")
        && !plan.contains("Join"),
      s"span-cut tier stopped being stateless:\n${plan.take(2000)}")
  }

  test("streaming dedup equals the batch window-min form on one backlog") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.streamDedup(spark, sfDir).collect().map(_.toSeq).toSet
    val batch = Tables.load(spark, sfDir, "documents")
      .withColumn("mn", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text").cast("binary")))))
      .select(col("doc_id"),
        when(col("doc_id") =!= col("mn"), col("mn")).as("dup_of"),
        (col("doc_id") =!= col("mn")).as("is_duplicate"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("streaming dedup keeps its keeper across micro-batches (first-seen wins)") {
    import org.apache.spark.sql.functions._
    // batch 1 establishes keepers; batch 2 re-sends some of the same texts
    // under NEW higher ids — every one must point at the batch-1 keeper, and
    // a batch-2-only text must crown its own keeper
    val stageDir = new java.io.File("/root/repo/target/test_stream_dedup_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    import spark.implicits._
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    val b2 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"), (13L, "gamma"))
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"dedup_tmp_$i")
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("test").as("source"), length(col("text")).cast("bigint").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val got = Streams.streamDedupMultiBatch(spark, stageDir.getAbsolutePath,
      "mb_dedup").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
      .toSet
    val want = Set(
      (1L, -1L, false), (2L, -1L, false), (3L, 1L, true),     // batch 1
      (10L, 1L, true), (11L, -1L, false), (12L, 2L, true),    // batch 2
      (13L, 11L, true))                                       // in-batch dup
    assert(got == want, s"got $got")
  }

  test("streaming dedup crowns negative doc_ids correctly (no sentinel re-crowning)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hashed 64-bit crawl ids are routinely negative: the keeper must be
    // presence-based, never a 'keeper < 0' sentinel test — under the old
    // sentinel every doc whose keeper was negative re-crowned itself
    val stageDir = new java.io.File("/root/repo/target/test_stream_dedup_neg")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val b1 = Seq((-7L, "alpha"), (-3L, "alpha"), (-9L, "beta"))
    val b2 = Seq((5L, "alpha"), (-1L, "beta"))
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"neg_tmp_$i")
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("test").as("source"), length(col("text")).cast("bigint").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val got = Streams.streamDedupMultiBatch(spark, stageDir.getAbsolutePath,
      "mb_dedup_neg").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        r.getBoolean(2)))
      .toSet
    val want = Set(
      (-7L, Long.MinValue, false),  // crowned
      (-3L, -7L, true),             // in-batch dup of a NEGATIVE keeper
      (-9L, Long.MinValue, false),  // crowned
      (5L, -7L, true),              // cross-batch dup of the negative keeper
      (-1L, -9L, true))             // negative dup of a negative keeper
    assert(got == want, s"got $got")
  }

  test("streaming line dedup keeps line keepers across micro-batches (first-seen wins)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // lines are exact 10-token blocks so the lined view is deterministic.
    // batch 1 crowns keepers for lines A (doc 1, idx 0), B (1, 1), C (2, 1);
    // batch 2 re-sends A under a new doc (must be cut against the batch-1
    // keeper), a within-doc repeat (E), and a doc made ENTIRELY of batch-1
    // lines (fully cut)
    def ln(p: String) = (0 until 10).map(i => s"$p$i").mkString(" ")
    val (a, b, c, d, e) = (ln("aa"), ln("bb"), ln("cc"), ln("dd"), ln("ee"))
    val b1 = Seq((1L, s"$a $b"), (2L, s"$a $c"))
    val b2 = Seq((10L, s"$a $d"), (11L, s"$e $e"), (12L, s"$b $c"))
    val stageDir = new java.io.File("/root/repo/target/test_stream_lines_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"lines_tmp_$i")
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("test").as("source"), length(col("text")).cast("bigint").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val got = Streams.streamDedupLinesMultiBatch(spark, stageDir.getAbsolutePath,
      "mb_dedup_lines").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val want = Map(
      1L -> ((2L, 0L, s"$a $b")),   // keeper doc, untouched
      2L -> ((2L, 1L, c)),          // in-batch dup of A
      10L -> ((2L, 1L, d)),         // CROSS-BATCH dup of A: batch-1 keeper held
      11L -> ((2L, 1L, e)),         // within-doc repeat, first kept
      12L -> ((2L, 2L, "")))        // both lines crowned in batch 1: fully cut
    assert(got == want, s"got $got")
  }

  test("streaming df line removal marks a line retroactively when it crosses the ceiling mid-stream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the D18 contract: df is GLOBAL, so line S (df ceiling = 2) is innocent
    // through batch 1 (df 2 — within-doc repeats count once), crosses the
    // ceiling in batch 2 (df 3 → its batch-1 occurrences, keeper included,
    // must be marked RETROACTIVELY from the occurrence store), and batch 3
    // exercises the already-hot path (current-batch mark only — retro marks
    // fire exactly once per line)
    def ln(p: String) = (0 until 10).map(i => s"$p$i").mkString(" ")
    val (s, u2, u3, u4) = (ln("ss"), ln("uu"), ln("vv"), ln("ww"))
    val batches = Seq(
      Seq((1L, s"$s $s"), (2L, s"$s $u2")),
      Seq((3L, s"$s $u3")),
      Seq((4L, s"$s $u4")))
    val stageDir = new java.io.File("/root/repo/target/test_stream_lines_df_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"linesdf_tmp_$i")
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("test").as("source"), length(col("text")).cast("bigint").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val name = "mb_dedup_lines_df"
    val got = Streams.streamDedupLinesDfMultiBatch(spark,
        stageDir.getAbsolutePath, name).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // REMOVAL semantics: every occurrence of S dies, keeper included
    val want = Map(
      1L -> ((2L, 2L, "")),
      2L -> ((2L, 1L, u2)),
      3L -> ((2L, 1L, u3)),
      4L -> ((2L, 1L, u4)))
    assert(got == want, s"got $got")
    // batch-slicing independence (what lets D18 share C50's oracle with no
    // single-batch guard): the drained result equals the batch operator on
    // the same union
    val batchGot = graft.operators.PipelineOps.dedupLinesDfOn(
        graft.operators.PipelineOps.linedDocs(
          batches.flatten.toDF("doc_id", "text")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == batchGot, "streamed result diverged from batch C50 on the union")
    // retro marks fire EXACTLY once per line: the raw mark store holds the
    // 5 occurrence marks with no duplicates (batch 3 must not re-retro S)
    val markStore = Streams.storeSibling(
      new java.io.File(stageDir + "_cp_" + name), "_marks")
    val rawMarks = spark.read.schema("doc_id BIGINT, idx INT")
      .parquet(markStore.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rawMarks.sorted == Seq((1L, 0), (1L, 1), (2L, 0), (3L, 0), (4L, 0)),
      s"raw mark stream wrong (duplicated or missing retro marks): $rawMarks")
  }

  test("TTL'd streaming dedup evicts idle digests and stays batch-exact inside the window") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    // timeline (TTL = 120 min, watermark delay 0): X re-arrives once INSIDE
    // the TTL (must dedup against the original keeper) and once AFTER its
    // digest idled past it (must be re-crowned fresh — the documented bounded
    // trade of the TTL tier). Y idles out and is silently evicted. The two
    // filler batches exist because event-time timeouts fire one batch after
    // the watermark passes them — Z advances the watermark, W's batch is
    // where the eviction of X and Y actually runs, so X'' in the final batch
    // finds no state.
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    val batches = Seq(
      Seq((1L, "xx", ts(0)), (2L, "yy", ts(0))),   // X, Y crowned
      Seq((3L, "xx", ts(60))),                     // X' inside TTL -> dup of 1
      Seq((5L, "zz", ts(480))),                    // Z advances the watermark
      Seq((7L, "ww", ts(540))),                    // timeouts fire: X, Y evicted
      Seq((6L, "xx", ts(600))))                    // X'' after eviction -> fresh
    val stageDir = new java.io.File("/root/repo/target/test_stream_dedup_ttl")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    import spark.implicits._
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"ttl_tmp_$i")
      rows.toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val (df, progress) = Streams.streamDedupTtlMultiBatch(spark,
      stageDir.getAbsolutePath, "ttl_dedup", ttlMinutes = 120)
    val got = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
      .toSet
    val want = Set(
      (1L, -1L, false), (2L, -1L, false),  // crowned
      (3L, 1L, true),                      // inside the TTL: batch-oracle-exact
      (5L, -1L, false), (7L, -1L, false),  // fillers are fresh
      (6L, -1L, false))                    // post-eviction re-arrival is fresh
    assert(got == want, s"got $got")
    // state-bound pin: 4 distinct digests were seen, but eviction fired (X
    // and Y removed), so the final state holds only {X'', Z, W} = 3 rows —
    // with NoTimeout it would hold all 4 and grow with stream history
    val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty, "no state operator progress recorded")
    assert(stateRows.last == 3,
      s"final state should hold 3 digests after eviction; saw $stateRows")
    val removed = progress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    assert(removed == 2, s"expected 2 evicted digests; progress shows $removed")
  }

  test("TTL'd streaming dedup survives a whole-batch-late digest (immediate eviction, no throw)") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    import spark.implicits._
    // flatMapGroupsWithState does NOT drop watermark-late input, so a NEW
    // digest whose entire batch arrives with ingest_ts more than TTL behind
    // the watermark computes a timeout at-or-behind it — an unguarded
    // setTimeoutTimestamp THROWS and fails the query. The guard must
    // instead decide the batch normally and evict the state immediately
    // (the TTL re-crown trade taken at once): L is crowned, emitted, and a
    // later L re-arrival is fresh because no state survived.
    val t0 = 1700000000000L
    def ts(min: Long) = new Timestamp(t0 + min * 60000L)
    val batches = Seq(
      Seq((1L, "aa", ts(600))),                    // advances watermark to 600
      Seq((2L, "ll", ts(0)), (3L, "ll", ts(10))),  // WHOLE batch ≥TTL late
      Seq((4L, "ll", ts(700))))                    // re-arrival: fresh (evicted)
    val stageDir = new java.io.File("/root/repo/target/test_stream_dedup_ttl_late")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"ttl_late_tmp_$i")
      rows.toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val (df, _) = Streams.streamDedupTtlMultiBatch(spark,
      stageDir.getAbsolutePath, "ttl_dedup_late", ttlMinutes = 120)
    val got = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
      .toSet
    val want = Set(
      (1L, -1L, false),   // watermark driver
      (2L, -1L, false),   // late digest still crowned and decided in-batch
      (3L, 2L, true),     // in-batch dup of the late keeper
      (4L, -1L, false))   // state was evicted at once -> re-crowned fresh
    assert(got == want, s"got $got")
  }

  test("streaming semantic dedup survives multi-batch slicing (keeper state persists)") {
    import org.apache.spark.sql.functions._
    // slice the corpus embeddings into two vec_id-ordered files: cluster
    // keepers crowned in batch 1 must still collect batch-2 candidates, and
    // the decisions must equal the single-batch run exactly
    val stageDir = new java.io.File("/root/repo/target/test_stream_sem_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val e = Tables.load(spark, sfDir, "embeddings")
    val mid = e.count() / 2
    Seq(col("vec_id") < mid, col("vec_id") >= mid).zipWithIndex.foreach {
      case (pred, i) =>
        val tmp = new java.io.File(stageDir.getParent, s"sem_tmp_$i")
        e.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3), r.getBoolean(4))
    }.toSeq
    val multi = rows(Streams.streamDedupSemanticMultiBatch(spark, sfDir,
      stageDir.getAbsolutePath, "mb_sem"))
    val single = rows(Streams.streamDedupSemantic(spark, sfDir))
    assert(multi == single)
    // ONE pair-set contract for the semantic tier: with the keeper-rank
    // guard folded into the batch verify, C29 and D10 must return
    // IDENTICAL frames (and share their closed-form oracle)
    val batch = rows(operators.Similarity.dedupSemantic(spark, sfDir))
    assert(single == batch,
      "batch C29 and streaming D10 drifted apart on the shared contract")
    // non-degenerate: the corpus actually contains semantic dups to find
    assert(single.count(_._5) > 0, "fixture found no semantic duplicates")
    // and CROSS-BATCH pairs were resolved: some batch-2 vector (vec_id >=
    // mid) must cite a batch-1 keeper (dup_of < mid)
    assert(multi.exists(r => r._1 >= mid && r._3 >= 0 && r._3 < mid),
      "no cross-batch candidate pair survived the batch boundary")
  }

  test("streaming semantic dedup resolves a NOVEL vector the batch corpus never saw") {
    import org.apache.spark.sql.functions._
    // the honest-resolve contract: candidate pairs are looked up in the
    // STREAM-side assignment store the ingest tier appends, so an arrival
    // absent from every batch-corpus table still gets a verdict (the old
    // resolve joined against the memoized corpus assignment — a genuinely
    // new vector's pairs silently dropped out of that join)
    val stageDir = new java.io.File("/root/repo/target/test_stream_sem_novel")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val e = Tables.load(spark, sfDir, "embeddings")
    val novelId = 999999L
    Seq(e.filter(col("vec_id") < 10),
        e.filter(col("vec_id") === 0).withColumn("vec_id", lit(novelId)))
      .zipWithIndex.foreach { case (df, i) =>
        val tmp = new java.io.File(stageDir.getParent, s"sem_novel_tmp_$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    val got = Streams.streamDedupSemanticMultiBatch(spark, sfDir,
      stageDir.getAbsolutePath, "mb_sem_novel").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.size == 11, s"expected 10 corpus + 1 novel rows, got ${got.size}")
    val (cid0, _, _, _) = got(0L)
    // the novel copy of vec 0 assigns to vec 0's cluster, pairs with keeper
    // 0 across the batch boundary, and resolves well above τ = 0.45. NOT
    // asserted == 1.0: cosine(v, v) = d/(sqrt(d)·sqrt(d)) hits exactly 1.0
    // only when the norm's sqrt round-trips — a data-dependent IEEE
    // coincidence, not the resolve contract this spec pins
    val (cidN, dupN, cosN, isDupN) = got(novelId)
    assert((cidN, dupN, isDupN) == ((cid0, 0L, true)),
      s"novel arrival did not resolve: ${got(novelId)}")
    assert(math.abs(cosN - 1.0) < 1e-12, s"self-cosine far from 1: $cosN")
  }

  test("streaming media dedup resolves a NOVEL payload the batch corpus never saw") {
    import org.apache.spark.sql.functions._
    // same honest-resolve contract as the semantic tier, over media bytes:
    // the novel payload's hash lands in the stream-side hash store at
    // ingest, so its candidate pair survives to the Hamming verdict
    val stageDir = new java.io.File("/root/repo/target/test_stream_media_novel")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val m = operators.Multimodal.gradMediaTable(spark, sfDir)
    val novelId = 999999L
    Seq(m.filter(col("media_id") < 10),
        m.filter(col("media_id") === 0).withColumn("media_id", lit(novelId)))
      .zipWithIndex.foreach { case (df, i) =>
        val tmp = new java.io.File(stageDir.getParent, s"media_novel_tmp_$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    val got = Streams.streamDedupMediaMultiBatch(spark, sfDir,
      stageDir.getAbsolutePath, "mb_media_novel").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got.size == 11, s"expected 10 corpus + 1 novel rows, got ${got.size}")
    val (dhash0, _, _) = got(0L)
    // identical bytes → identical dhash → Hamming 0 against keeper 0
    assert(got(novelId) == ((dhash0, 0L, true)),
      s"novel arrival did not resolve: ${got(novelId)}")
  }

  test("streaming semantic dedup on an EMPTY landing dir yields an empty relation") {
    // a landing dir the embedding service hasn't written to yet must drain
    // to zero rows — not a missing-path crash: the ingest tier creates the
    // store dir even when no batch fires, and every downstream read uses an
    // explicit schema
    val stageDir = new java.io.File("/root/repo/target/test_stream_sem_empty")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val got = Streams.streamDedupSemanticMultiBatch(spark, sfDir,
      stageDir.getAbsolutePath, "mb_sem_empty")
    assert(got.count() == 0L, "empty landing dir produced rows")
  }

  test("streaming media dedup survives multi-batch slicing (band keepers persist)") {
    import org.apache.spark.sql.functions._
    // slice the media corpus into two media_id-ordered files: band keepers
    // crowned in batch 1 must still collect batch-2 candidates, and the
    // decisions must equal the single-batch run exactly
    val stageDir = new java.io.File("/root/repo/target/test_stream_media_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    val m = operators.Multimodal.gradMediaTable(spark, sfDir)
    val mid = m.count() / 2
    Seq(col("media_id") < mid, col("media_id") >= mid).zipWithIndex.foreach {
      case (pred, i) =>
        val tmp = new java.io.File(stageDir.getParent, s"media_tmp_$i")
        m.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3))
    }.toSeq
    val multi = rows(Streams.streamDedupMediaMultiBatch(spark, sfDir,
      stageDir.getAbsolutePath, "mb_media"))
    val single = rows(Streams.streamDedupMedia(spark, sfDir))
    assert(multi == single)
    // non-degenerate: the corpus actually contains media near-dups to find
    assert(single.count(_._4) > 0, "fixture found no media duplicates")
    // and CROSS-BATCH pairs were resolved: some batch-2 image (media_id >=
    // mid) must cite a batch-1 keeper (dup_of < mid)
    assert(multi.exists(r => r._1 >= mid && r._3 >= 0 && r._3 < mid),
      "no cross-batch candidate pair survived the batch boundary")
  }

  test("streaming IVF append equals the batch-maintained index probe (C7d ≡ D11)") {
    // same frozen corpus codebook, same corpus+batch content → the pruned
    // probe over (base ∪ streamed-append) must return C7d's rows exactly
    val batch = operators.Similarity.simIvfAppend(spark, sfDir).collect().toSeq
    // record the corpus base layout before the streaming run
    val (basePath, _) = operators.Similarity.ensureStreamCorpusIndex(spark, sfDir)
    def baseState = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(basePath)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length, f.lastModified)).sortBy(_._1)
    }
    val before = baseState
    val streamed = Streams.streamIvfAppend(spark, sfDir)
    val got = streamed.collect().toSeq
    assert(got == batch, s"streamed probe diverged:\n$got\nvs\n$batch")
    // append-only: not one corpus base file rewritten by the stream
    assert(baseState == before, "streaming append touched corpus base files")
    // both scan legs keep partition pruning (the point of the cid layout)
    val plan = streamed.queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[.*cid".r.findAllIn(plan).size
    assert(pruned >= 2, s"expected 2 partition-pruned scans, plan:\n${plan.take(3000)}")
  }

  test("stream_knn drains the query backlog to exactly the batch kNN join, multi-batch") {
    // D19 is stateless per batch (frozen index; a query's rank reads only
    // its own batch's candidate rows), so the drained backlog must equal
    // C38b on the same query set regardless of batch slicing. The staged
    // slice is 3 files run at maxFilesPerTrigger=1, so this equality IS the
    // multi-batch serving path, not a degenerate single batch — pinned
    // below via the checkpoint's committed batch count.
    val batch = operators.Similarity.knnJoinIvf(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = Streams.streamKnn(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"streamed kNN diverged from the batch join:\n$streamed\nvs\n$batch")
    val commits = new java.io.File(
      Streams.checkpointDir(sfDir, "stream_knn"), "commits")
    val nBatches = Option(commits.listFiles()).getOrElse(Array.empty)
      .count(_.getName.forall(_.isDigit))
    assert(nBatches >= 3, s"expected >=3 committed micro-batches, got $nBatches")
  }

  test("stream_knn_graph_append drains to exactly C56's appended graph, multi-batch") {
    // D21's exactness contract: per-batch append legs merged into the
    // running full-precision graph must reproduce C56's appended graph —
    // itself spec-pinned equal to the full rebuild — ROW-FOR-ROW, and the
    // result must be independent of batch slicing (the staged backlog is 3
    // files at maxFilesPerTrigger=1, pinned via the committed batch count,
    // so the reverse legs genuinely exercise BOTH probe stores: the corpus
    // store and prior arrivals' stream store).
    val want = operators.Similarity.knnGraphAppend(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val got = Streams.streamKnnGraphAppend(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got == want,
      s"streamed graph diverged from C56:\n${got.take(5)}\nvs\n${want.take(5)}")
    val commits = new java.io.File(
      Streams.checkpointDir(sfDir, "stream_knn_graph_append"), "commits")
    val nBatches = Option(commits.listFiles()).getOrElse(Array.empty)
      .count(_.getName.forall(_.isDigit))
    assert(nBatches >= 3, s"expected >=3 committed micro-batches, got $nBatches")
  }

  test("stream_decontam_semantic drains to exactly the batch C55 report, multi-batch") {
    // D20 is stateless per batch (frozen bench set; a vector's max reads
    // only the static bench side), so the drained backlog must equal C55
    // regardless of batch slicing. 3 staged files at maxFilesPerTrigger=1 —
    // the multi-batch gate path, pinned via the checkpoint's commit count.
    val batch = operators.Similarity.decontamSemantic(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = Streams.streamDecontamSemantic(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"streamed decontam diverged from C55:\n${streamed.take(5)}\nvs\n${batch.take(5)}")
    val commits = new java.io.File(
      Streams.checkpointDir(sfDir, "stream_decontam_semantic"), "commits")
    val nBatches = Option(commits.listFiles()).getOrElse(Array.empty)
      .count(_.getName.forall(_.isDigit))
    assert(nBatches >= 3, s"expected >=3 committed micro-batches, got $nBatches")
  }

  test("ivf append store is fingerprint-reused in-JVM and survives eviction") {
    // the reuse contract: a warm call consumes the append layout as-is (no
    // file rewritten — the layout is a deterministic function of the staged
    // batch + frozen codebook), and clearIngestStores() forces a rebuild
    // that reproduces the same probe results
    def listing(d: java.io.File): Set[String] = {
      val base = d.toPath
      val s = java.nio.file.Files.walk(base)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .map(p => base.relativize(p).toString + ":" +
            java.nio.file.Files.getLastModifiedTime(p).toMillis).toSet
      } finally s.close()
    }
    // the REAL layout via Streams' own derivation — a hand-rebuilt path
    // here would silently decouple this test from a checkpointDir rename
    val appendDir = Streams.storeSibling(
      new java.io.File(Streams.checkpointDir(sfDir, "stream_ivf_append")),
      "_appended")
    val r1 = Streams.streamIvfAppend(spark, sfDir).collect().map(_.toSeq).toSeq
    val l1 = listing(appendDir)
    assert(l1.nonEmpty, "append layout missing after a cold run")
    val r2 = Streams.streamIvfAppend(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(r2 == r1, "warm (reused-store) probe drifted from the cold run")
    assert(listing(appendDir) == l1, "warm run rewrote the append store")
    // memory eviction alone ADOPTS the persisted store via its on-disk
    // sidecar (the fresh-JVM reuse path, r14): same results, no rewrite
    Streams.clearIngestStores()
    val rAdopt = Streams.streamIvfAppend(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(rAdopt == r1, "sidecar-adopted store probe drifted")
    assert(listing(appendDir) == l1,
      "memory eviction with a valid sidecar rewrote the store (adoption " +
        "should reuse it as-is)")
    // genuine rebuild needs the disk fingerprint invalidated too
    Streams.clearIngestStores()
    graft.StoreFp.invalidateAll()
    val r3 = Streams.streamIvfAppend(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(r3 == r1, "post-eviction rebuild drifted")
    assert(listing(appendDir) != l1, "eviction did not force a rebuild")
    // manifest re-validation: files deleted EXTERNALLY while the JVM memo is
    // live must force a rebuild, never a silent read of a truncated store
    val victim = {
      val w = java.nio.file.Files.walk(appendDir.toPath)
      try {
        import scala.jdk.CollectionConverters._
        val fs = w.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
        assert(fs.nonEmpty, "no parquet file in the append store to delete")
        fs.head
      } finally w.close()
    }
    java.nio.file.Files.delete(victim)
    val truncated = listing(appendDir)
    val r4 = Streams.streamIvfAppend(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(r4 == r1, "rebuild after external file loss drifted")
    assert(listing(appendDir) != truncated,
      "store not rebuilt after external file loss")
  }

  test("ingest-store rebuilds sweep scratch dirs a crashed batch left behind") {
    // the success path cleans its own scratch; a death between the parquet
    // write and the move must not leak the sibling dir forever — the next
    // rebuild sweeps every <store>_stage* orphan
    val store = Streams.storeSibling(
      new java.io.File(Streams.checkpointDir(sfDir, "stream_dedup_semantic")),
      "_assignstore")
    val orphan = new java.io.File(store.getParentFile, store.getName + "_stage99")
    // self-healing fixture: a prior failed run may have left the orphan
    // behind — clear it so createNewFile can't mask the real regression
    org.apache.commons.io.FileUtils.deleteQuietly(orphan)
    orphan.mkdirs()
    assert(new java.io.File(orphan, "stranded.parquet").createNewFile())
    Streams.clearIngestStores() // force the rebuild path...
    graft.StoreFp.invalidateAll() // ...including past the on-disk sidecar
    Streams.streamDedupSemantic(spark, sfDir).collect()
    assert(!orphan.exists(), "orphan scratch dir survived the rebuild sweep")
  }

  test("streaming packer carries the sub-shard cursor across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two staged files = two micro-batches; every doc is 2200 words, so any
    // sub-shard that receives two docs crosses the 4096-token window INSIDE
    // the second doc — if the cursor state did not persist across batches,
    // every batch-2 doc would restart at win_id 0 / offset 0 and diverge
    // from the batch manifest recompute below
    val nTok = 2200L
    val text = Seq.fill(nTok.toInt)("x").mkString(" ")
    val b1 = (1L to 20L).map(id => (id, text))
    val b2 = (21L to 40L).map(id => (id, text))
    val stageDir = new java.io.File("/root/repo/target/test_stream_pack_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    Seq(b1, b2).zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"pack_tmp_$i")
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("test").as("source"), length(col("text")).cast("bigint").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    // the C44 manifest rule recomputed on the driver: shard = md5-hash
    // bucket, cursor = running token total per shard in doc_id order
    // (arrival order here IS doc_id order — batch files are staged
    // ascending), win_id/offset from the cursor before each doc
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val cursor = scala.collection.mutable.Map.empty[Long, Long]
    val want = (1L to 40L).map { id =>
      val shard = h(id) % 16
      val cum = cursor.getOrElse(shard, 0L)
      cursor(shard) = cum + nTok
      (id, shard, nTok, cum / 4096, cum % 4096)
    }.toSet
    val got = Streams.streamPackMultiBatch(spark, stageDir.getAbsolutePath,
      "mb_pack").collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == want,
      s"cursor carry-over diverged: ${(got diff want).take(3)} vs ${(want diff got).take(3)}")
    // the boundary actually crossed: some doc landed at win_id >= 1
    assert(got.exists(_._4 >= 1), "no sub-shard ever crossed the 4096 window")
    // and some batch-2 doc inherited a NONZERO offset from batch-1 tokens
    assert(got.exists(t => t._1 >= 21L && t._5 > 0),
      "no batch-2 doc started mid-window — cursor state never persisted")
  }
}
