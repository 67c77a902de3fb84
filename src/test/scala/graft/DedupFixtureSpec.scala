package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ground-truth fixtures for the dedup family: a synthetic corpus with
  * PLANTED near-duplicate pairs of exactly known shingle Jaccard. The DuckDB
  * oracles verify the pipelines are computed identically cross-engine; these
  * fixtures verify the pipelines compute the RIGHT THING — recall, precision
  * and estimate quality against planted ground truth no hash-equality check
  * can see.
  *
  * Corpus layout (disjoint per-doc vocabulary, so unrelated docs share zero
  * shingles and every flagged pair must be a planted one — precision is
  * checked exactly, not probabilistically):
  *   - ids 0..59:   independent 50-token base docs
  *   - ids 70..74:  independent 400-token base docs (simhash targets: one
  *                  changed token among 400 moves few sign-votes, keeping the
  *                  pair within simhash's Hamming≤3 detection radius)
  *   - ids 100+i:   copy of doc i with 1 token changed      (J = 45/51 ≈ 0.882)
  *   - ids 200+i:   copy of doc 10+i with 3 tokens changed  (J = 39/57 ≈ 0.684)
  *   - ids 300,301: two 1-token-changed copies of doc 20 → a 3-doc cluster
  *   - ids 400+i:   copy of doc 70+i with 1 token changed  (J = 395/401 ≈ 0.985)
  */
class DedupFixtureSpec extends SparkSpec {

  private def baseTokens(i: Int, n: Int): IndexedSeq[String] =
    (0 until n).map(j => s"w${i}_$j")

  private def perturb(toks: IndexedSeq[String], changed: Set[Int]): IndexedSeq[String] =
    toks.zipWithIndex.map { case (t, j) => if (changed(j)) s"x_$j$t" else t }

  private def shingleSet(toks: Seq[String]): Set[String] =
    toks.sliding(3).map(_.mkString(" ")).toSet

  private def exactJaccard(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  // (doc_id, tokens) for the whole corpus + the planted (original, copy, J) truth
  private lazy val corpus: Seq[(Long, IndexedSeq[String])] = {
    val bases50 = (0 until 60).map(i => i.toLong -> baseTokens(i, 50))
    val bases200 = (70 until 75).map(i => i.toLong -> baseTokens(i, 400))
    val strong = (0 until 5).map(i =>
      (100 + i).toLong -> perturb(baseTokens(i, 50), Set(25)))
    val medium = (0 until 5).map(i =>
      (200 + i).toLong -> perturb(baseTokens(10 + i, 50), Set(10, 20, 30)))
    val triple = Seq(
      300L -> perturb(baseTokens(20, 50), Set(5)),
      301L -> perturb(baseTokens(20, 50), Set(35)))
    val longPairs = (0 until 5).map(i =>
      (400 + i).toLong -> perturb(baseTokens(70 + i, 400), Set(100)))
    bases50 ++ bases200 ++ strong ++ medium ++ triple ++ longPairs
  }

  /** planted (smallerId, largerId) → exact shingle Jaccard */
  private lazy val planted: Map[(Long, Long), Double] = {
    val byId = corpus.toMap
    val pairs = (0 until 5).map(i => (i.toLong, (100 + i).toLong)) ++
      (0 until 5).map(i => ((10 + i).toLong, (200 + i).toLong)) ++
      Seq((20L, 300L), (20L, 301L), (300L, 301L)) ++
      (0 until 5).map(i => ((70 + i).toLong, (400 + i).toLong))
    pairs.map(p => p -> exactJaccard(byId(p._1), byId(p._2))).toMap
  }

  private lazy val fixtureDir: String = {
    val dir = s"${GraftConf.localRoot}/test_fixture_dedup"
    import spark.implicits._
    corpus.map { case (id, toks) =>
      val text = toks.mkString(" ")
      (id, text, "en", "synthetic", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash recovers every planted pair and nothing else") {
    val out = Dedup.dedupMinhash(spark, fixtureDir).collect()
    assert(out.length == corpus.size)
    val flagged = out.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recall: every planted copy is flagged against its true original
    // (dup_of is the SMALLEST matching id, so the triple members map to 20)
    val expected = ((0 until 5).map(i => (100 + i).toLong -> i.toLong) ++
      (0 until 5).map(i => (200 + i).toLong -> (10 + i).toLong) ++
      Seq(300L -> 20L, 301L -> 20L) ++
      (0 until 5).map(i => (400 + i).toLong -> (70 + i).toLong)).toMap
    assert(flagged == expected,
      s"minhash flagged ${flagged.toSeq.sorted} expected ${expected.toSeq.sorted}")
    // estimate quality: est-Jaccard within 0.25 of the exact planted truth
    // (64 hashes → σ ≈ 0.06, so 0.25 ≈ 4σ)
    val est = out.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    planted.foreach { case ((a, b), j) =>
      if (a != 300L) // (300,301) is subsumed by the (20,·) pairs in dup_of form
        assert(math.abs(est(b) - j) < 0.25 || est(b) > j,
          s"pair ($a,$b): est ${est(b)} vs exact $j")
    }
  }

  test("exact jaccard verify returns planted pairs with their true similarity") {
    val out = Dedup.dedupJaccard(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision: every emitted pair is a planted one
    assert(out.keySet.subsetOf(planted.keySet),
      s"unexpected pairs: ${out.keySet -- planted.keySet}")
    // recall + value truth: all 18 planted pairs surface (top-50 ≥ 18) with
    // their exact set Jaccard, bit-equal up to double division
    planted.foreach { case (p, j) =>
      assert(out.contains(p), s"planted pair $p missing from jaccard output")
      assert(math.abs(out(p) - j) < 1e-12, s"pair $p: got ${out(p)} want $j")
    }
  }

  test("simhash catches the long-doc planted pairs with zero false positives") {
    val out = Dedup.dedupSimhash(spark, fixtureDir).collect()
    val flagged = out.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // precision: nothing outside the planted copies may be flagged
    val copies = planted.keySet.map(_._2)
    assert(flagged.keySet.subsetOf(copies), s"false positives: ${flagged.keySet -- copies}")
    // recall floor: a 1-token change in 400 tokens flips <1 expected sign-vote
    // bit, safely inside the Hamming≤3 radius — all 5 long pairs must land;
    // the 50-token pairs sit at the EDGE of simhash's radius (1 change in 50
    // shifts ~6 bits in expectation) and are minhash's job, not pinned here
    (0 until 5).foreach { i =>
      assert(flagged.get((400 + i).toLong).contains((70 + i).toLong),
        s"long planted pair ${70 + i}→${400 + i} not flagged: $flagged")
    }
  }

  test("incremental near-dedup recovers planted pairs across the batch/corpus " +
    "boundary with no corpus-side shuffle") {
    // corpus = the base docs (< 100), batch = every planted copy (>= 100):
    // all cross-boundary pairs must be recovered from the PERSISTED band
    // store, not a corpus re-shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Dedup.incrementalNearSplit(
        spark, fixtureDir, "ge100", col("doc_id") < 100)
      val out = df.collect()
      // one row per batch doc: 5 strong + 5 medium + {300,301} + 5 long = 17
      assert(out.length == 17, s"expected 17 batch rows, got ${out.length}")
      val flagged = out.filter(_.getBoolean(3))
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every planted copy maps to its smallest corpus-side match; 300/301
      // are near-dups of each other too, but batch-internal pairs are out of
      // scope by design — both resolve against corpus doc 20
      val expected = ((0 until 5).map(i => (100 + i).toLong -> i.toLong) ++
        (0 until 5).map(i => (200 + i).toLong -> (10 + i).toLong) ++
        Seq(300L -> 20L, 301L -> 20L) ++
        (0 until 5).map(i => (400 + i).toLong -> (70 + i).toLong)).toMap
      assert(flagged == expected,
        s"flagged ${flagged.toSeq.sorted} expected ${expected.toSeq.sorted}")
      // plan pin: both corpus store tables scan as buckets, and the corpus
      // side contributes zero exchanges — batch-side pipeline (gram window,
      // band guard, candidate distinct, verify joins, final agg+sort) owns
      // every shuffle in the plan
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert("SelectedBucketsCount: 8 out of 8".r.findAllIn(plan).length == 2,
        s"expected two bucketed corpus scans (bands + sigs):\n${plan.take(2000)}")
      // a corpus scan feeding an Exchange is exactly what the planner marks
      // "Bucketed: false (disabled by query planner)" — its absence plus the
      // two bucket-pruned scans above IS the no-corpus-shuffle property; the
      // total then bounds the batch-side pipeline (gram window, band guard,
      // candidate distinct, two verify-join keys, final agg + output sort)
      assert(!plan.contains("disabled by query planner"),
        s"a corpus store scan lost its bucket layout:\n${plan.take(2000)}")
      val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(plan).length
      assert(shuffles <= 8, s"batch-side shuffle count regressed: $shuffles exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming near-dedup recovers planted pairs across micro-batches") {
    // the fixture corpus sliced into two micro-batches at the id-100 boundary
    // (bases stream first, copies second): every planted pair must be
    // recovered through per-band keeper STATE, matching dedup_minhash's
    // decisions exactly on this corpus (no band bucket exceeds MaxBucket, so
    // the rank guard and the drop-bucket guard agree)
    val stageDir = new java.io.File("/root/repo/target/test_stream_near_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    import spark.implicits._
    val batches = Seq(corpus.filter(_._1 < 100), corpus.filter(_._1 >= 100))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = new java.io.File(stageDir.getParent, s"near_tmp_$i")
      rows.map { case (id, toks) =>
        val text = toks.mkString(" ")
        (id, text, "en", "synthetic", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val out = graft.streaming.Streams.streamDedupNearMultiBatch(spark,
      stageDir.getAbsolutePath, "near_mb").collect()
    assert(out.length == corpus.size)
    val flagged = out.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ((0 until 5).map(i => (100 + i).toLong -> i.toLong) ++
      (0 until 5).map(i => (200 + i).toLong -> (10 + i).toLong) ++
      Seq(300L -> 20L, 301L -> 20L) ++
      (0 until 5).map(i => (400 + i).toLong -> (70 + i).toLong)).toMap
    assert(flagged == expected,
      s"flagged ${flagged.toSeq.sorted} expected ${expected.toSeq.sorted}")
  }

  test("saturated bands stop emitting: the keeper cap all three stream tiers share") {
    // MaxBucket+16 IDENTICAL docs: every one of the 16 bands saturates at
    // MaxBucket keepers, so arrivals past the cap emit NO pairs and surface
    // as non-duplicates — by design the degenerate boilerplate cluster
    // belongs to the exact tier (C1/D4), and a band's lifetime emission is
    // capped at C(MaxBucket, 2) pairs instead of growing with stream length.
    // The batch split lands AFTER saturation, so batch 2 must stay silent
    // through RESTORED state, not just in-batch bookkeeping. D10/D12 run
    // this exact transition (keeperDecide), so one pin covers all three.
    val cap = graft.operators.Dedup.MaxBucket
    val n = cap + 16
    val stageDir = new java.io.File("/root/repo/target/test_stream_sat_mb")
    org.apache.commons.io.FileUtils.deleteQuietly(stageDir)
    stageDir.mkdirs()
    import spark.implicits._
    val text =
      "the same boilerplate sentence repeated verbatim across the whole corpus"
    val rows = (0 until n).map(i =>
      (i.toLong, text, "en", "synthetic", text.length.toLong))
    val splitAt = cap + 6
    Seq(rows.filter(_._1 < splitAt), rows.filter(_._1 >= splitAt)).zipWithIndex
      .foreach { case (slice, i) =>
        val tmp = new java.io.File(stageDir.getParent, s"sat_tmp_$i")
        slice.toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(stageDir, f"batch_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + i * 60000L)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      }
    val out = graft.streaming.Streams.streamDedupNearMultiBatch(spark,
      stageDir.getAbsolutePath, "sat_mb").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(3))).toMap
    assert(out.size == n)
    assert(out(0L) == ((-1L, false)))
    (1 until cap).foreach { i =>
      assert(out(i.toLong) == ((0L, true)),
        s"keeper-window doc $i should cite doc 0: ${out(i.toLong)}")
    }
    (cap until n).foreach { i =>
      assert(out(i.toLong) == ((-1L, false)),
        s"post-saturation doc $i emitted a pair: ${out(i.toLong)}")
    }
  }

  test("cluster extraction reconstructs the planted components exactly") {
    val out = Dedup.dedupClusters(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == corpus.size)
    // the 3-member component: rep = smallest id, size 3 for all members
    Seq(20L, 300L, 301L).foreach { id =>
      assert(out(id) == ((20L, 3L)), s"doc $id: ${out(id)}")
    }
    // every planted 2-component
    ((0 until 5).map(i => (i.toLong, (100 + i).toLong)) ++
      (0 until 5).map(i => ((10 + i).toLong, (200 + i).toLong)) ++
      (0 until 5).map(i => ((70 + i).toLong, (400 + i).toLong))).foreach {
      case (a, b) =>
        assert(out(a) == ((a, 2L)) && out(b) == ((a, 2L)),
          s"pair ($a,$b): ${out(a)} / ${out(b)}")
    }
    // everything else is a singleton
    val inComponent = planted.keySet.flatMap(p => Seq(p._1, p._2))
    corpus.map(_._1).filterNot(inComponent).foreach { id =>
      assert(out(id) == ((id, 1L)), s"doc $id should be a singleton: ${out(id)}")
    }
  }

  test("component extraction over an EMPTY edge set returns all singletons") {
    // the r15 advisory: an edge-free input (a corpus where the τ filter cuts
    // every candidate — legitimate for C57) used to NPE on the null SUM of
    // zero labels while the oracle correctly answered all-singletons; pin
    // the crash-vs-result divergence closed
    import spark.implicits._
    val ids = Seq(3L, 7L, 11L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Dedup.minLabelComponents(spark, ids, noPairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(3L -> ((3L, 1L)), 7L -> ((7L, 1L)), 11L -> ((11L, 1L))),
      s"empty-edge components should be singletons: $out")
  }
}
