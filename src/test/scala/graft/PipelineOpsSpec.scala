package graft

import org.apache.spark.sql.functions._

import graft.operators.{Joins, PipelineOps}

class PipelineOpsSpec extends SparkSpec {

  test("as-of join matches a brute-force latest-click-at-or-before computation") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("probe_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    // brute force: max click ts at-or-before each purchase (small sf only)
    val brute = purchases.join(clicks,
        col("pu") === col("cu") && col("cts") <= col("pts"), "left")
      .groupBy(col("probe_id")).agg(max(col("cts")).as("want_ts"))
      .select(col("probe_id"),
        date_format(col("want_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("want_ts"))
    val got = Joins.qAsofJoin(spark, sfDir).select(col("probe_id"), col("click_ts"))
    val joined = got.join(brute, "probe_id")
    assert(joined.count() > 0)
    val diff = joined.filter(
      !(col("click_ts") <=> col("want_ts"))).count()
    assert(diff == 0, s"$diff as-of rows disagree with brute force")
  }

  test("range join counts match a brute-force interval join") {
    val ev = Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("probe_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val brute = purchases.join(views,
        col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("vts") <= col("pts"), "left")
      .groupBy(col("probe_id")).agg(count(col("vts")).as("want_n"))
    val got = Joins.qRangeJoin(spark, sfDir).select(col("probe_id"), col("n_views_30m"))
    val diff = got.join(brute, "probe_id")
      .filter(col("n_views_30m") =!= col("want_n")).count()
    assert(diff == 0, s"$diff range-join counts disagree with brute force")
  }

  test("train/val/test split is exhaustive, disjoint, stable, and ~90/5/5") {
    val rows = PipelineOps.corpusSplit(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == nDocs) // every doc assigned exactly once
    val bys = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bys.keySet == Set("train", "val", "test"))
    val trainFrac = bys("train").toDouble / nDocs
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // growth stability: the assignment of a doc depends only on its own id,
    // so a doc keeps its split when the corpus around it changes
    val half = Tables.load(spark, sfDir, "documents").filter(col("doc_id") % 2 === 0)
    val again = half.select(col("doc_id"),
        PipelineOps.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    again.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("corpus shuffle is a reproducible permutation in key order") {
    val a = PipelineOps.corpusShuffle(spark, sfDir).collect()
    val b = PipelineOps.corpusShuffle(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq) // same epoch order
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(a.length == nDocs)
    assert(a.map(_.getLong(0)).toSet.size == nDocs) // a permutation, no dups
    val keys = a.map(_.getString(1)).toSeq
    assert(keys == keys.sorted, "rows must come back in shuffle-key order")
    assert(a.map(_.getLong(0)).toSeq != a.map(_.getLong(0)).sorted.toSeq,
      "shuffle order should differ from id order")
  }

  test("source mixing caps every source near an equal share") {
    val out = PipelineOps.mixSources(spark, sfDir).collect()
    val d = Tables.load(spark, sfDir, "documents")
    val total = d.count()
    val k = d.select(col("source")).distinct().count()
    val fair = total.toDouble / k
    val kept = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(kept.nonEmpty)
    kept.foreach { case (src, n) =>
      // hash-threshold sampling keeps ≈ min(cnt, fair) of each source; allow
      // binomial slack on the small fixture
      assert(n <= fair * 1.35 + 10, s"source $src kept $n, fair share $fair")
    }
    // a source smaller than the fair share is kept whole
    val counts = d.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.filter(_._2 <= fair).foreach { case (src, cnt) =>
      assert(kept.getOrElse(src, 0) == cnt, s"small source $src must be kept whole")
    }
  }

  test("epoch mixing repeats curated sources and downsamples web, exactly") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val curated = Set("src0", "src1", "src2", "src3")
    def grp(s: String) = if (curated(s)) "curated" else "web"
    val tS = d.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val kG = tS.keys.groupBy(grp).view.mapValues(_.size).toMap
    val bTot = d.map(_._3).sum
    def eMilli(s: String): Long = {
      val bp = if (grp(s) == "curated") 4500.0 else 5500.0
      math.min(4000L,
        math.floor((bp / 10.0) * (bTot.toDouble / (kG(grp(s)) * tS(s)).toDouble)).toLong)
    }
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val want = d.flatMap { case (id, s, _) =>
      val em = eMilli(s)
      val reps = em / 1000 + (if (h(id) % 1000 < em % 1000) 1 else 0)
      (1L to reps).map(e => (id, e))
    }.sorted.toSeq
    val out = PipelineOps.mixEpochs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    assert(out == want, "epoch-repeat rows must match the driver-side recompute")
    // the mix must actually move in BOTH directions on this corpus: curated
    // docs run >1 epoch on average, web (20-ish× the curated share budget
    // spread over 16 sources) runs <1 and drops some docs entirely
    val bySrc = out.map(_._1).map(id => d.find(_._1 == id).get._2)
    val nCur = bySrc.count(curated)
    val curDocs = d.count(x => curated(x._2))
    val webDocs = d.size - curDocs
    assert(nCur > curDocs, "curated sources must be upsampled past 1 epoch")
    assert(bySrc.length - nCur < webDocs, "web sources must be downsampled")
    // epochs are contiguous 1..r per doc (a trainer reads them as a count)
    out.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq, s"doc $id epochs")
    }
  }

  test("stratified sample is deterministic and rebalances en vs the rest") {
    val a = PipelineOps.sampleStratified(spark, sfDir).collect()
    val b = PipelineOps.sampleStratified(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq) // stable
    val docs = Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val enRate = sampled.getOrElse("en", 0).toDouble / docs("en")
    val deRate = sampled.getOrElse("de", 0).toDouble / docs("de")
    assert(enRate < deRate, s"en rate $enRate should be below de rate $deRate")
  }

  test("ngram top-k is sorted by count desc with deterministic tie-break") {
    val rows = PipelineOps.ngramTopk(spark, sfDir).collect()
    assert(rows.length == 50)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (n, bg) => (-n, bg) }))
    assert(rows.forall(_.getString(0).contains(" ")))
  }

  test("bucketed join matches plain-join values and avoids shuffle exchanges") {
    val df = Joins.qBucketedJoin(spark, sfDir)
    val got = df.collect().map(_.toSeq)
    val ev = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq)
    assert(got.toSeq == ev.toSeq)
    df.count() // finalize the adaptive plan before inspecting it
    // AQE's toString prints final AND initial plans — inspect only the final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"),
      s"expected bucketed scans in:\n${plan.take(2000)}")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, // only the final groupBy may hash-exchange
      s"bucketed join should not shuffle its inputs; got $shuffles exchanges:\n${plan.take(2000)}")
  }

  test("as-of join plan is join-free (union + one window) and range join is an equi-join") {
    val asof = Joins.qAsofJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!asof.contains("Join"), s"as-of should be union+window:\n${asof.take(1500)}")
    val range = Joins.qRangeJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!range.contains("CartesianProduct") && !range.contains("BroadcastNestedLoop"),
      s"range join must stay an equi-join:\n${range.take(1500)}")
  }

  test("funnel stages are monotonically non-increasing; corpus stats cover all langs") {
    val f = graft.operators.Relational.qFunnel(spark, sfDir).head()
    val (s, v, p) = (f.getLong(0), f.getLong(1), f.getLong(2))
    assert(s >= v && v >= p, s"funnel must narrow: $s >= $v >= $p")
    assert(s > 0)
    val stats = PipelineOps.corpusStats(spark, sfDir).collect()
    val langs = Tables.load(spark, sfDir, "documents")
      .select("lang").distinct().count()
    assert(stats.length == langs)
    stats.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1)))
  }

  test("incremental dedup only reports new-batch docs against corpus dups") {
    val rows = graft.operators.Dedup.dedupIncremental(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 10 == 9)) // only new-batch docs
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getLong(1) % 10 != 9, "dup_of must point into the corpus")
      assert(r.getBoolean(2))
    }
  }

  test("contamination excludes benchmark docs and bounds the ratio") {
    val rows = PipelineOps.contamination(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 97 != 0))
    assert(rows.forall { r =>
      val ratio = r.getDouble(3)
      ratio >= 0.0 && ratio <= 1.0 && r.getLong(2) <= r.getLong(1)
    })
  }

  test("PII redaction fires on every doc and leaves no address behind") {
    val out = PipelineOps.textRedact(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(out.length == docs)
    out.foreach { r =>
      val t = r.getString(1)
      // the salted email+phone must have been replaced, not passed through —
      // this catches a symmetric regex regression the DuckDB parity gate
      // would miss (both sides vacuously matching nothing)
      assert(t.contains("<EMAIL>") && t.contains("<PHONE>"), s"unredacted: $t")
      assert(!t.contains("@") && !t.contains("+1-555"), s"leaked PII: $t")
    }
  }

  test("sequence packing conserves tokens in contiguous per-(lang,shard) windows") {
    val out = PipelineOps.seqPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLang = out.groupBy(_._1)
    val truth = Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("toks"),
        count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang.keySet == truth.keySet)
    // conservation holds per LANGUAGE across its shards: every token and doc
    // lands in exactly one (shard, window)
    byLang.foreach { case (lang, wins) =>
      assert(wins.map(_._5).sum == truth(lang)._1, s"$lang token sum drifted")
      assert(wins.map(_._4).sum == truth(lang)._2, s"$lang doc count drifted")
    }
    // the de-straggler property: the corpus actually spreads over many shards
    // (one sorted task per (lang, shard), not one per lang)
    val shards = out.map(s => (s._1, s._2)).distinct
    assert(shards.length > byLang.size,
      s"sharding inactive: ${shards.length} (lang,shard) groups for ${byLang.size} langs")
    assert(out.forall(s => s._2 >= 0 && s._2 < PipelineOps.SeqPackShards.toLong))
    // contiguity + boundary law now hold within each (lang, shard) sub-stream
    out.groupBy(s => (s._1, s._2)).foreach { case ((lang, shard), wins) =>
      val ids = wins.map(_._3).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"$lang/$shard windows not contiguous from 0: $ids")
      // window w only exists once the running total crossed w·4096, so the
      // cumulative tokens of windows 0..w-1 must reach it
      val sorted = wins.sortBy(_._3)
      sorted.map(_._5).scanLeft(0L)(_ + _).zipWithIndex.drop(1).dropRight(1)
        .foreach { case (cum, w) =>
          assert(cum >= 4096L * w, s"$lang/$shard window $w starts before its boundary")
        }
    }
  }

  test("split leakage equals brute-force pair counting over planted dups") {
    import spark.implicits._
    // the shipped corpus is exact-dup-free, so plant duplicate groups that
    // land in different split cells: texts shared by MANY ids guarantee at
    // least one cross-split pair under the 90/5/5 hash assignment
    val planted = (0L until 60L).map(i => (100000L + i, s"planted dup ${i % 4}"))
    val fixture = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .union(planted.toDF("doc_id", "text"))
    // independent ground truth: collect, group by exact text, count every
    // duplicate pair per split cell with the naive O(k²) loop the operator
    // deliberately avoids
    val docs = fixture
      .select(col("doc_id"), col("text"),
        PipelineOps.splitOf(col("doc_id")).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = scala.collection.mutable.Map[(String, String), Long]()
    docs.groupBy(_._2).values.foreach { g =>
      for (i <- g.indices; j <- i + 1 until g.length) {
        val key = (g(i)._3, g(j)._3)
        expected(key) = expected.getOrElse(key, 0L) + 1
      }
    }
    def cell(a: String, b: String) =
      expected.getOrElse((a, b), 0L) + (if (a != b) expected.getOrElse((b, a), 0L) else 0L)
    val r = PipelineOps.splitLeakageOf(fixture).head()
    val got = Map(
      "train_train" -> r.getLong(r.fieldIndex("train_train")),
      "train_val" -> r.getLong(r.fieldIndex("train_val")),
      "train_test" -> r.getLong(r.fieldIndex("train_test")),
      "val_val" -> r.getLong(r.fieldIndex("val_val")),
      "val_test" -> r.getLong(r.fieldIndex("val_test")),
      "test_test" -> r.getLong(r.fieldIndex("test_test")))
    assert(got("train_train") == cell("train", "train"))
    assert(got("train_val") == cell("train", "val"))
    assert(got("train_test") == cell("train", "test"))
    assert(got("val_val") == cell("val", "val"))
    assert(got("val_test") == cell("val", "test"))
    assert(got("test_test") == cell("test", "test"))
    // the planted groups must produce both intra- and cross-split pairs, so
    // every closed form (n·(n−1)/2 and n_a·n_b) is exercised non-trivially
    assert(got("train_train") > 0, "no intra-train planted pair")
    assert(got("train_val") + got("train_test") + got("val_test") > 0,
      "no cross-split planted pair — leakage path untested")
  }

  test("ngramFlat and ngramRows assemble the same gram multiset") {
    // two assemblies, one truth: the shuffle-free zipped-slice form must
    // emit exactly the window form's (doc_id, gram) bag for any n
    Seq(2, 3, 5).foreach { n =>
      val docs = Tables.load(spark, sfDir, "documents")
      def bag(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val flat = bag(PipelineOps.ngramFlat(docs, n))
      val windowed = bag(PipelineOps.ngramRows(docs, n))
      assert(flat == windowed, s"n=$n divergence: " +
        s"${(flat.keySet diff windowed.keySet).take(3)} vs ${(windowed.keySet diff flat.keySet).take(3)}")
    }
  }

  test("repetition ratio equals a brute-force bigram computation") {
    val got = PipelineOps.textRepetition(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val want = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        if (toks.length < 2) None
        else {
          val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
          val d = grams.distinct.size.toLong
          Some(r.getLong(0) -> (grams.size.toLong, d,
            BigDecimal(1.0 - d.toDouble / grams.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) => assert(v == want(id), s"doc $id: $v vs ${want(id)}") }
    // both counts are row-local: the plan must be a pure map + sort —
    // no Generate (explode), no hash Exchange (aggregation)
    val plan = PipelineOps.textRepetition(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "repetition should not explode")
    assert(!plan.contains("Exchange hashpartitioning"),
      "repetition should not shuffle an aggregation")
  }

  test("temperature mixing keeps the smallest language whole and tracks sqrt shares") {
    val d = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nL = d.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    val nMin = nL.values.min
    // the exact idHash decision, replicated independently
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val want = d.filter { case (id, l) =>
      h(id) % 1000000L < math.floor(1000000.0 * math.sqrt(nMin.toDouble / nL(l))).toLong
    }.map(_._1).toSet
    val out = operators.PipelineOps.mixTemperature(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == want)
    nL.filter(_._2 == nMin).keySet.foreach { l =>
      assert(out.count(_.getString(1) == l) == nMin, s"smallest lang $l must keep all docs")
    }
    assert(out.length < d.length, "dominant languages must be downsampled")
  }

  test("duplicated-span fraction equals a brute-force cross-document count") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // same domain rule as gramSet: <5-token docs own their whole text
    def gramsOf(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set(t) else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val per = docs.map { case (id, t) => id -> gramsOf(t) }.toMap
    val nDocs = per.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val out = operators.PipelineOps.dedupSpans(spark, sfDir).collect()
    assert(out.length == docs.length)
    var anyDup = false
    out.foreach { r =>
      val gs = per(r.getLong(0))
      val dup = gs.count(g => nDocs(g) >= 2)
      assert(r.getLong(1) == gs.size, s"doc ${r.getLong(0)} n_spans")
      assert(r.getLong(2) == dup, s"doc ${r.getLong(0)} n_dup_spans")
      assert(r.getDouble(3) == dup.toDouble / gs.size)
      anyDup |= dup > 0
    }
    assert(anyDup, "fixture has no cross-document span overlap — test is vacuous")
  }

  test("graft_might_contain: no false negatives, bounded false positives") {
    import spark.implicits._
    val keys = (0L until 2000L).map(i => s"key_$i").toDF("k")
    val bloom = keys.select(xxhash64(col("k")).as("xx")).stat.bloomFilter("xx", 2000, 0.01)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    def probe(df: org.apache.spark.sql.DataFrame) = df.filter(
      graft.functions.GraftFunctions.mightContain(spark, bytes, col("k"))).count()
    // every inserted key must hit — the sketch build (stat.bloomFilter over
    // xxhash64 longs) and the probe (XxHash64 wrap) must agree on hashing
    assert(probe(keys) == 2000L)
    val absent = (0L until 2000L).map(i => s"other_$i").toDF("k")
    val fp = probe(absent)
    assert(fp < 100L, s"false-positive rate way over the 1% target: $fp/2000")
  }

  test("contamination_bloom matches the exact broadcast form row for row") {
    val exact = PipelineOps.contamination(spark, sfDir).collect()
    val bloomed = PipelineOps.contaminationBloom(spark, sfDir).collect()
    assert(exact.length == bloomed.length)
    exact.zip(bloomed).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // the probe runs inside the corpus scan (plan-level pin: the bloom
    // expression is present, so the corpus side is filtered before any join)
    val plan = PipelineOps.contaminationBloom(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom probe missing from the physical plan")
  }

  test("dedup_substr removes merged non-owner runs and keeps the owner copy") {
    import spark.implicits._
    // hand-computed ExactSubstr fixtures: doc 0 owns every shared run;
    // doc 1 shares an interior 6-token run (two overlapping marked 5-grams
    // must MERGE to one cut); doc 2 is a full duplicate (everything cut,
    // empty string — not null); doc 3 is sub-5-token (never trimmed);
    // doc 4 is unique; doc 5 shares two DISJOINT runs with a gap that must
    // survive between the cuts
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e f q r s"),
      (2L, "a b c d e f g h"),
      (3L, "p q r s"),
      (4L, "u1 u2 u3 u4 u5 u6"),
      (5L, "a b c d e z z z d e f g h")
    ).toDF("doc_id", "text")
    val got = PipelineOps.dedupSubstrOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(0L) == ((8L, 0L, "a b c d e f g h")), s"owner trimmed: ${got(0L)}")
    assert(got(1L) == ((11L, 6L, "x y q r s")), s"merged run: ${got(1L)}")
    assert(got(2L) == ((8L, 8L, "")), s"full dup: ${got(2L)}")
    assert(got(3L) == ((4L, 0L, "p q r s")), s"short doc: ${got(3L)}")
    assert(got(4L) == ((6L, 0L, "u1 u2 u3 u4 u5 u6")), s"unique: ${got(4L)}")
    assert(got(5L) == ((13L, 10L, "z z z")), s"two disjoint runs: ${got(5L)}")
  }

  test("BPE packing conserves the BPE count and actually uses the BPE measure") {
    val bpeByDoc = graft.operators.TextAnalysis.textTokensBpe(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val out = PipelineOps.seqPackBpe(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // conservation: every BPE token lands in exactly one window
    assert(out.map(_._5).sum == bpeByDoc.values.sum, "BPE token sum drifted")
    val ws = PipelineOps.seqPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    // the measure matters: BPE windows differ from whitespace windows (a
    // multi-symbol word is one whitespace token but several BPE tokens, so
    // windows close earlier under the real count)
    assert(out.map(t => (t._1, t._2, t._3, t._5)).toSet != ws,
      "BPE packing produced identical windows to whitespace packing")
    // same contiguity law as C20, per (lang, shard)
    out.groupBy(t => (t._1, t._2)).foreach { case ((lang, shard), wins) =>
      val ids = wins.map(_._3).sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"$lang/$shard BPE windows not contiguous from 0: $ids")
    }
  }

  test("decontam_substr cuts exactly the benchmark-shared spans") {
    import spark.implicits._
    // bench doc holds span "b1..b5"; train docs share it at different
    // positions, overlap it, sit fully inside it, or are clean; sub-5-token
    // docs are never trimmed; a fully-contaminated doc keeps the empty text
    val bench = Seq((97L, "b1 b2 b3 b4 b5 b6")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x1 x2 b1 b2 b3 b4 b5 y1"),   // mid-doc span -> cut, edges kept
      (2L, "b1 b2 b3 b4 b5"),            // the span IS the doc -> fully cut
      (3L, "b2 b3 b4 b5 b6"),            // bench's second gram -> fully cut
      (4L, "b1 b2 b3 b4"),               // sub-gram prefix, no 5-gram match
      (5L, "c1 c2 c3 c4 c5 c6"),         // clean -> untouched
      (6L, "b1 b2")                      // sub-5-token -> never trimmed
    ).toDF("doc_id", "text")
    val got = PipelineOps.decontamSubstrOn(train, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((8L, 5L, "x1 x2 y1")), s"mid-span: ${got(1L)}")
    assert(got(2L) == ((5L, 5L, "")), s"exact span: ${got(2L)}")
    assert(got(3L) == ((5L, 5L, "")), s"shifted gram: ${got(3L)}")
    assert(got(4L) == ((4L, 0L, "b1 b2 b3 b4")), s"sub-gram: ${got(4L)}")
    assert(got(5L) == ((6L, 0L, "c1 c2 c3 c4 c5 c6")), s"clean: ${got(5L)}")
    assert(got(6L) == ((2L, 0L, "b1 b2")), s"short: ${got(6L)}")
    // the real corpus: bench docs never appear in the output, and the op
    // actually fires (the synthetic corpus plants contaminated docs)
    val out = PipelineOps.decontamSubstr(spark, sfDir).collect()
    assert(out.forall(_.getLong(0) % 97 != 0), "bench doc leaked into output")
    assert(out.exists(_.getLong(2) > 0), "no span cut on the corpus fixture")
    assert(out.exists(_.getLong(2) == 0), "everything cut — fixture degenerate")
    // bloom front is a pure pre-filter: a sketch over a SUPERSET of the
    // bench grams (here: the fixture's own grams + noise entries, the
    // shape benchBloom's gramSet fallback rows create) must leave the cut
    // bit-identical — the exact equi-join kills every false positive
    val noise = Seq((9901L, "n1 n2 n3 n4 n5"), (9902L, "m1")).toDF("doc_id", "text")
    val sketch = {
      val grams = org.apache.spark.sql.functions.split(col("text"), " ")
      val b = bench.union(noise)
        .select(explode(org.apache.spark.sql.functions.transform(
          sequence(lit(1), greatest(size(grams) - 4, lit(1))),
          i => concat_ws(" ", slice(grams, i, lit(5))))).as("g"))
        .distinct()
        .select(org.apache.spark.sql.functions.xxhash64(col("g")).as("xx"))
        .stat.bloomFilter("xx", 64, 0.01)
      val bos = new java.io.ByteArrayOutputStream(); b.writeTo(bos); bos.toByteArray
    }
    val withBloom = PipelineOps.decontamSubstrOn(train, bench,
        bloom = Some((spark, sketch)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val without = PipelineOps.decontamSubstrOn(train, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(withBloom.sortBy(_._1).toSeq == without.sortBy(_._1).toSeq,
      "bloom-fronted cut diverged from the exact-only path")
  }

  test("dedup_lines keeps the first occurrence of every duplicated line") {
    import spark.implicits._
    // planted lined frames (the core takes (doc_id, lines)): doc 1 owns A+B;
    // doc 2 repeats A (cut) and owns C; doc 3 is B+A only (fully cut); doc 4
    // repeats its own line D WITHIN the doc (first occurrence kept — the
    // CCNet global rule dedups intra-doc too); doc 5 is clean
    val lined = Seq(
      (1L, Seq("a1 a2", "b1 b2")),
      (2L, Seq("a1 a2", "c1 c2")),
      (3L, Seq("b1 b2", "a1 a2")),
      (4L, Seq("d1 d2", "d1 d2", "e1")),
      (5L, Seq("f1 f2"))
    ).toDF("doc_id", "lines")
    val got = PipelineOps.dedupLinesOn(lined).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((2L, 0L, "a1 a2 b1 b2")), s"owner doc: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, "c1 c2")), s"cross-doc dup: ${got(2L)}")
    assert(got(3L) == ((2L, 2L, "")), s"fully duplicated doc: ${got(3L)}")
    assert(got(4L) == ((3L, 1L, "d1 d2 e1")), s"within-doc dup: ${got(4L)}")
    assert(got(5L) == ((1L, 0L, "f1 f2")), s"clean doc: ${got(5L)}")
    // the lined view chunks at 10 tokens with a short tail kept
    val view = PipelineOps.linedDocs(
      Seq((7L, (1 to 23).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"))
      .collect()
    val lines = view.head.getSeq[String](1)
    assert(lines.length == 3, s"23 tokens must chunk to 3 lines: $lines")
    assert(lines(0) == (1 to 10).map(i => s"t$i").mkString(" "), lines(0))
    assert(lines(2) == "t21 t22 t23", s"short tail: ${lines(2)}")
    // NEGATIVE doc_ids (hashed 64-bit crawl ids): the packed-decimal
    // keeper must unpack with floor semantics — a truncating % would
    // yield a phantom keeper for negative ids and cut the true first
    // occurrence too. Keeper of the shared line is (-5, 1), the
    // lexicographic min; doc -5's OWN idx-0 line is untouched
    val negGot = PipelineOps.dedupLinesOn(Seq(
        (-5L, Seq("own neg", "shared line")),
        (-2L, Seq("shared line", "other neg")),
        (3L, Seq("shared line", "pos tail"))
      ).toDF("doc_id", "lines")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(negGot(-5L) == ((0L, "own neg shared line")), s"neg keeper: ${negGot(-5L)}")
    assert(negGot(-2L) == ((1L, "other neg")), s"neg dup: ${negGot(-2L)}")
    assert(negGot(3L) == ((1L, "pos tail")), s"pos dup of neg keeper: ${negGot(3L)}")
    // HOT-LINE fixture: one boilerplate line planted in EVERY doc (the
    // cookie-banner shape the two-phase keeper aggregate exists for) —
    // only the lowest (doc_id, idx) occurrence survives, every other doc
    // loses exactly that line, and the per-doc payload stays intact
    val hot = (1L to 200L).map(i => (i, Seq("hot banner", s"own $i")))
      .toDF("doc_id", "lines")
    val hotGot = PipelineOps.dedupLinesOn(hot).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(hotGot(1L) == ((0L, "hot banner own 1")), s"keeper doc: ${hotGot(1L)}")
    (2L to 200L).foreach { i =>
      assert(hotGot(i) == ((1L, s"own $i")), s"hot line survived in doc $i: ${hotGot(i)}")
    }
    // real corpus: the op fires in both directions (planted dups share
    // aligned chunks; clean docs survive untouched)
    val out = PipelineOps.dedupLines(spark, sfDir).collect()
    assert(out.exists(_.getLong(2) > 0), "no line cut on the corpus fixture")
    assert(out.exists(_.getLong(2) == 0), "everything cut — fixture degenerate")
  }

  test("dedup_lines_nl pins literal-newline split semantics (empty/consecutive/trailing)") {
    import spark.implicits._
    // hand-built multi-line text through the REAL literal split (the
    // Pattern.quote("\n"), -1 pairing the C51 scaladoc pins against
    // DuckDB's string_split): doc 1 owns the dup line; doc 2 repeats it
    // around an EMPTY line from consecutive delimiters; doc 3 carries a
    // TRAILING delimiter; doc 4 is only blank lines
    val nl = Seq(
      (1L, "dup line\nunique one"),
      (2L, "dup line\n\ndup line"),
      (3L, "solo three\ndup line\n"),
      (4L, "\n\n")
    ).toDF("doc_id", "nl_text")
    val lined = nl.select(col("doc_id"),
      split(col("nl_text"), java.util.regex.Pattern.quote("\n"), -1).as("lines"))
    // the -1 limit is the load-bearing detail: default split DROPS trailing
    // empties and doc 3 would read 2 lines, misaligning every index vs the
    // oracle's literal split
    val shapes = lined.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(shapes(2L) == Seq("dup line", "", "dup line"), s"consecutive: ${shapes(2L)}")
    assert(shapes(3L) == Seq("solo three", "dup line", ""), s"trailing: ${shapes(3L)}")
    assert(shapes(4L) == Seq("", "", ""), s"all-blank: ${shapes(4L)}")
    val got = PipelineOps.dedupLinesOn(lined, sep = "\n", skipEmpty = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 1 keeps everything (owns "dup line" at (1,0))
    assert(got(1L) == ((2L, 0L, "dup line\nunique one")), s"owner: ${got(1L)}")
    // doc 2 loses BOTH its occurrences; the empty line is structure — never
    // counted as a duplicate, never cut — so exactly it survives
    assert(got(2L) == ((3L, 2L, "")), s"consecutive-delimiter doc: ${got(2L)}")
    // doc 3 loses the dup, keeps its own line and the trailing empty
    assert(got(3L) == ((3L, 1L, "solo three\n")), s"trailing-delimiter doc: ${got(3L)}")
    // doc 4: three empty lines, nothing enters the occurrence stream,
    // nothing is cut — blank structure reassembles intact
    assert(got(4L) == ((3L, 0L, "\n\n")), s"all-blank doc: ${got(4L)}")
    // the salted corpus view plants every branch: real newlines everywhere,
    // an empty line for %5 docs, a trailing empty for %7 docs — and the
    // boilerplate footers actually dedup (both directions on real data)
    val outNl = PipelineOps.dedupLinesNl(spark, sfDir).collect()
    assert(outNl.exists(_.getLong(2) > 0), "no line cut on the salted corpus")
    assert(outNl.exists(_.getLong(2) == 0), "everything cut — salt degenerate")
  }

  test("dedup_lines_df removes over-ceiling lines everywhere and spares the rest") {
    import spark.implicits._
    // LineDfMax = 2: line H lives in 3 docs -> removed from ALL three
    // (keeper included — removal, not dedup); line P lives in exactly 2
    // docs -> kept in both; doc 4 repeats its own line 3 times -> df = 1
    // (distinct doc_id), nothing removed; doc 5 is clean
    val lined = Seq(
      (1L, Seq("h1 h2", "a1 a2")),
      (2L, Seq("h1 h2", "p1 p2")),
      (3L, Seq("b1 b2", "h1 h2")),
      (4L, Seq("d1 d2", "d1 d2", "d1 d2")),
      (5L, Seq("p1 p2", "e1 e2")),
      (6L, Seq("f1 f2"))
    ).toDF("doc_id", "lines")
    val got = PipelineOps.dedupLinesDfOn(lined).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, "a1 a2")), s"boiler removed incl. first doc: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, "p1 p2")), s"df=2 line spared: ${got(2L)}")
    assert(got(3L) == ((2L, 1L, "b1 b2")), s"boiler removed at idx 1: ${got(3L)}")
    assert(got(4L) == ((3L, 0L, "d1 d2 d1 d2 d1 d2")),
      s"within-doc repeats are not boilerplate (df=1): ${got(4L)}")
    assert(got(5L) == ((2L, 0L, "p1 p2 e1 e2")), s"df=2 line spared: ${got(5L)}")
    assert(got(6L) == ((1L, 0L, "f1 f2")), s"clean doc: ${got(6L)}")
    // real corpus: fires in both directions (the sf fixture carries lines
    // shared by up to 6 docs and a long df=1 tail)
    val out = PipelineOps.dedupLinesDf(spark, sfDir).collect()
    assert(out.exists(_.getLong(2) > 0), "no boilerplate line removed on the corpus fixture")
    assert(out.exists(_.getLong(2) == 0), "everything removed — fixture degenerate")
  }

  test("seq_slice geometry: closed-form count, exact windows, full coverage") {
    val w = PipelineOps.SliceTokens; val s = PipelineOps.SliceStride
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val slices = PipelineOps.seqSlice(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(slices.nonEmpty)
    // some doc must actually need >1 slice or the geometry is untested
    assert(slices.keys.exists(_._2 > 0), "no multi-slice doc in fixture")
    docs.foreach { case (id, ts) =>
      val n = ts.length
      val nSlices = 1 + (math.max(0, n - w) + s - 1) / s
      (0 until nSlices).foreach { i =>
        val expect = ts.slice(i * s, i * s + w)
        val (len, text) = slices((id, i.toLong))
        assert(len == expect.length.toLong, s"doc $id slice $i length")
        assert(text == expect.mkString(" "), s"doc $id slice $i text")
      }
      assert(!slices.contains((id, nSlices.toLong)), s"doc $id extra slice")
      // coverage: the final slice reaches the last token
      assert((nSlices - 1) * s + w >= n, s"doc $id tail uncovered")
    }
  }

  test("seq_pack_manifest rolls up to exactly the seq_pack report") {
    val report = PipelineOps.seqPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val manifest = PipelineOps.seqPackManifest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(manifest.nonEmpty)
    // document grain: every doc appears exactly once
    assert(manifest.map(_._3).distinct.length == manifest.length)
    // offsets live inside the window
    assert(manifest.forall(m => m._6 >= 0 && m._6 < 4096L))
    val rolled = manifest.groupBy(m => (m._1, m._2, m._5))
      .map { case (k, ms) => k -> ((ms.length.toLong, ms.map(_._4).sum)) }
    assert(rolled == report,
      "manifest rollup drifted from the packing occupancy report")
  }

  test("prepare_corpus_v2 drives every stage non-vacuously on a planted corpus") {
    import spark.implicits._
    // the portable token hash (TextAnalysis.hexHash's closed form) so the
    // spec can pick words by classifier weight and predict the id sample
    def hex(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def weight(t: String): Long = hex(t) % 1001L - 500L
    def words(prefix: String, sign: Long, n: Int): Seq[String] =
      Iterator.from(0).map(i => s"$prefix$i")
        .filter(t => weight(t) * sign > 0).take(n).toSeq
    val p = words("p", 1, 8) // positive-weight span words
    val q = words("q", 1, 5); val x = words("x", 1, 5); val y = words("y", 1, 5)
    val z = words("z", 1, 4); val g = words("g", 1, 12); val h = words("h", 1, 12)
    val neg = words("n", -1, 5)
    val fillers = (0 until 12).map(i => (20L + i, s"${g(i)} ${h(i)}"))
    val corpus = Seq(
      1L -> p.mkString(" "),                         // owner of the p-span
      2L -> (p.take(5) ++ q).mkString(" "),          // loses p-span, keeps q-span
      3L -> (q ++ p.take(5)).mkString(" "),          // fully covered -> dropped
      4L -> x.mkString(" "), 5L -> y.mkString(" "),  // span owners
      6L -> (x ++ z).mkString(" "),                  // residue = z-span
      7L -> (y ++ z).mkString(" "),                  // SAME residue -> post-cut dup
      8L -> "d1 d2", 9L -> "d1 d2",                  // pre-existing exact dup pair
      10L -> Seq(p(0), p(2), p(0), p(3)).mkString(" "), // unseen bigrams -> LM drop
      11L -> neg.mkString(" ")                       // negative weights -> clf drop
    ) ++ fillers
    // bounded explicit reference (the C40 contract): every text EXCEPT doc
    // 10's, so 10's unigrams are known but its bigrams are not
    val ref = corpus.filter(_._1 != 10L).map { case (id, t) => (id, t) }
      .toDF("doc_id", "text")
    val (uni, bi) = graft.operators.TextAnalysis.lmModelFrom(ref)
    val docs = corpus.map { case (id, t) => (id, "xx", t) }
      .toDF("doc_id", "lang", "text")
    val out = PipelineOps.prepareCorpusV2On(spark, docs, uni, bi).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getString(6))))
      .toMap
    def sampled(id: Long) = hex(id.toString) % 100L < 50L
    val expect = Map[Long, (Long, Long, String)](
      1L -> ((8L, 0L, p.mkString(" "))),
      2L -> ((10L, 5L, q.mkString(" "))),
      4L -> ((5L, 0L, x.mkString(" "))), 5L -> ((5L, 0L, y.mkString(" "))),
      6L -> ((9L, 5L, z.mkString(" "))),
      8L -> ((2L, 0L, "d1 d2"))
    ) ++ fillers.map { case (id, t) => id -> ((2L, 0L, t)) }
    val want = expect.filter(kv => sampled(kv._1))
    assert(out == want.map { case (k, v) => k -> ((v._1, v._2, v._3)) },
      s"composed pipeline drifted: got ${out.keySet.toSeq.sorted}, " +
        s"want ${want.keySet.toSeq.sorted}")
    // every stage provably fired: clf gate (11), LM gate (10), full-cut
    // drop (3), partial cut (2 lost 5 tokens), post-cut digest dedup
    // (7 deduped against 6; 9 against 8), and BOTH sample branches
    Seq(3L, 7L, 9L, 10L, 11L).foreach(id =>
      assert(!out.contains(id), s"doc $id should have been dropped"))
    assert(expect.keySet.exists(sampled), "no doc on the sample-keep branch")
    assert(expect.keySet.exists(id => !sampled(id)), "no doc on the sample-drop branch")
  }

  test("prepare_corpus_v3 folds the semantic tier into the ladder non-vacuously") {
    import spark.implicits._
    // the v2 planted corpus again (same gates/cut/dedup expectations), plus
    // a planted ASSIGNMENT frame: survivors 4 and 5 share a cluster with
    // near-identical vectors (semantic dup -> the higher keeper-rank side,
    // 5, is dropped); survivors 1 and 2 share a cluster but are ORTHOGONAL
    // (below tau -> both kept) — the tier must fire in both directions
    def hex(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def weight(t: String): Long = hex(t) % 1001L - 500L
    def words(prefix: String, sign: Long, n: Int): Seq[String] =
      Iterator.from(0).map(i => s"$prefix$i")
        .filter(t => weight(t) * sign > 0).take(n).toSeq
    val p = words("p", 1, 8)
    val q = words("q", 1, 5); val x = words("x", 1, 5); val y = words("y", 1, 5)
    val z = words("z", 1, 4); val g = words("g", 1, 12); val h = words("h", 1, 12)
    val neg = words("n", -1, 5)
    val fillers = (0 until 12).map(i => (20L + i, s"${g(i)} ${h(i)}"))
    val corpus = Seq(
      1L -> p.mkString(" "), 2L -> (p.take(5) ++ q).mkString(" "),
      3L -> (q ++ p.take(5)).mkString(" "),
      4L -> x.mkString(" "), 5L -> y.mkString(" "),
      6L -> (x ++ z).mkString(" "), 7L -> (y ++ z).mkString(" "),
      8L -> "d1 d2", 9L -> "d1 d2",
      10L -> Seq(p(0), p(2), p(0), p(3)).mkString(" "),
      11L -> neg.mkString(" ")
    ) ++ fillers
    val ref = corpus.filter(_._1 != 10L).toDF("doc_id", "text")
    val (uni, bi) = graft.operators.TextAnalysis.lmModelFrom(ref)
    val docs = corpus.map { case (id, t) => (id, "xx", t) }
      .toDF("doc_id", "lang", "text")
    def unit(axis: Int, eps: Double = 0.0): Seq[Double] = {
      val v = Array.fill(64)(0.0); v(axis) = 1.0
      if (eps != 0.0) v((axis + 1) % 64) = eps
      v.toSeq
    }
    val assigned = (corpus.map(_._1).map { id =>
      val (v, cid) = id match {
        case 4L => (unit(0), 70L)            // keeper (krank 1 in cid 70)
        case 5L => (unit(0, 0.01), 70L)      // near-dup of 4 -> dropped
        case 1L => (unit(10), 71L)           // same cid as 2 but orthogonal
        case 2L => (unit(20), 71L)           // cos 0 < tau -> both kept
        case other => (unit((other % 30).toInt + 30), 100L + other)
      }
      (id, v, cid)
    }).toDF("vec_id", "v", "cid")
    val out = PipelineOps.prepareCorpusV3On(spark, docs, assigned, uni, bi)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))))
      .toMap
    def sampled(id: Long) = hex(id.toString) % 100L < 50L
    // v2's survivor set minus the semantic dup (5), with cid in the frame
    val expect = Map[Long, (Long, Long, Long, String)](
      1L -> ((8L, 0L, 71L, p.mkString(" "))),
      2L -> ((10L, 5L, 71L, q.mkString(" "))),
      4L -> ((5L, 0L, 70L, x.mkString(" "))),
      6L -> ((9L, 5L, 106L, z.mkString(" "))),
      8L -> ((2L, 0L, 108L, "d1 d2"))
    ) ++ fillers.map { case (id, t) => id -> ((2L, 0L, 100L + id, t)) }
    val want = expect.filter(kv => sampled(kv._1))
    assert(out == want,
      s"v3 pipeline drifted: got ${out.keySet.toSeq.sorted}, " +
        s"want ${want.keySet.toSeq.sorted}")
    assert(!out.contains(5L), "semantic dup survived the tier")
    // the sub-tau same-cid pair must NOT be collapsed (both kept modulo
    // the sample rule)
    Seq(1L, 2L).filter(sampled).foreach(id =>
      assert(out.contains(id), s"sub-tau doc $id wrongly dropped"))
  }

  test("prepare_corpus_v4 drives the gopher and line tiers in both directions") {
    import spark.implicits._
    // v4 = gopher gate -> line dedup -> the v2/v3 ladder (whose internals
    // the two tests above already pin over the SAME shared code); this
    // fixture's job is the two NEW tiers plus end-to-end composition. All
    // ladder-visible words are >=5 chars (the gopher mean-word-length
    // floor is 3.0) and picked positive-weight so the clf gate passes
    // wherever the plant doesn't target it.
    def hex(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def weight(t: String): Long = hex(t) % 1001L - 500L
    def words(prefix: String, sign: Long, n: Int): Seq[String] =
      Iterator.from(0).map(i => s"$prefix$i")
        .filter(t => weight(t) * sign > 0).take(n).toSeq
    def blk(prefix: String): Seq[String] = words(prefix, 1, 10)
    val boiler = blk("boiler")
    val a = Seq("alfa", "arbor", "amber", "aspen").map(blk)
    val c = Seq("cedar", "coral", "cobal", "crest").map(blk)
    val d1 = blk("delta"); val d2 = blk("drift")
    val du = words("dunes", 1, 5); val sp = words("spann", 1, 5)
    val d4 = blk("dover"); val d5 = blk("dusty")
    val fa = words("fable", 1, 5)
    val f = Seq("ferry", "flint", "frost", "fjord").map(blk)
    val k119 = Seq("koala", "kiosk", "krill", "kayak", "knoll").map(blk)
    val k122 = Seq("lemur", "lotus", "lilac", "llama", "lunar").map(blk)
    val m124 = Seq("mango", "maple", "mossy", "metro", "minty").map(blk)
    val doc113 = d1 ++ d2 ++ du ++ sp ++ d4 ++ d5
    val doc117 = fa.take(3) ++ sp ++ fa.drop(3) ++ f.flatten
    val corpus = Seq(
      100L -> words("tiny", 1, 10).mkString(" "),          // gopher: <50 words
      101L -> (boiler ++ a.flatten).mkString(" "),         // owns the boiler line
      102L -> (boiler ++ c.flatten).mkString(" "),         // loses line 0 to 101
      103L -> Seq.fill(5)(boiler).flatten.mkString(" "),   // all-boiler: fully cut
      106L -> (0 until 25).flatMap(i =>
        Seq(a(0)(i % 10), d1((i + 1 + i / 10) % 10))).mkString(" "), // LM drop:
        // known unigrams, never-seen cross-block bigrams (the v2 doc-10 rule)
      109L -> words("negw", -1, 50).mkString(" "),         // clf drop
      113L -> doc113.mkString(" "),                        // owns the s-span
      117L -> doc117.mkString(" "),                        // loses s-span to 113
      119L -> k119.flatten.mkString(" "),                  // semantic keeper
      122L -> k122.flatten.mkString(" "),                  // semantic dup of 119
      124L -> m124.flatten.mkString(" "))                  // survives every tier,
      // falls out at the V4 sample draw (id-hash bucket 93 >= 90)
    val ref = corpus.filter(_._1 != 106L).toDF("doc_id", "text")
    val (uni, bi) = graft.operators.TextAnalysis.lmModelFrom(ref)
    val docs = corpus.map { case (id, t) => (id, "xx", t) }
      .toDF("doc_id", "lang", "text")
    // the gopher tier standalone, both directions
    val admitted = graft.operators.TextAnalysis.gopherAdmittedDocs(spark, docs)
      .collect().map(_.getLong(0)).toSet
    assert(!admitted.contains(100L), "sub-50-word doc passed the gopher gate")
    assert(admitted == corpus.map(_._1).toSet - 100L,
      s"gopher gate over-rejected: $admitted")
    def unit(axis: Int, eps: Double = 0.0): Seq[Double] = {
      val v = Array.fill(64)(0.0); v(axis) = 1.0
      if (eps != 0.0) v((axis + 1) % 64) = eps
      v.toSeq
    }
    val assigned = (corpus.map(_._1).map { id =>
      val (v, cid) = id match {
        case 119L => (unit(0), 70L)        // keeper (krank 1 in cid 70)
        case 122L => (unit(0, 0.01), 70L)  // near-dup of 119 -> dropped
        case 101L => (unit(10), 71L)       // same cid as 102 but orthogonal
        case 102L => (unit(20), 71L)       // cos 0 < tau -> both kept
        case other => (unit((other % 30).toInt + 30), 100L + other)
      }
      (id, v, cid)
    }).toDF("vec_id", "v", "cid")
    val out = PipelineOps.prepareCorpusV4On(spark, docs, assigned, uni, bi)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8))))
      .toMap
    // v4's own (wider) draw window — the v2/v3 tests pin the 50-window rule
    def sampled(id: Long) =
      hex(id.toString) % 100L < PipelineOps.V4SampleWindow.toLong
    // survivors before the sample: 101 (line keeper), 102 (line-cut), 113
    // (span owner), 117 (span-cut), 119 (semantic keeper), 124 (clean)
    val expect = Map[Long, (Long, Long, Long, Long, String)](
      101L -> ((50L, 0L, 0L, 71L, (boiler ++ a.flatten).mkString(" "))),
      102L -> ((40L, 0L, 1L, 71L, c.flatten.mkString(" "))),
      113L -> ((50L, 0L, 0L, 213L, doc113.mkString(" "))),
      117L -> ((50L, 5L, 0L, 217L, (fa ++ f.flatten).mkString(" "))),
      119L -> ((50L, 0L, 0L, 70L, k119.flatten.mkString(" "))),
      124L -> ((50L, 0L, 0L, 224L, m124.flatten.mkString(" "))))
    val want = expect.filter(kv => sampled(kv._1))
    assert(out == want,
      s"v4 pipeline drifted: got ${out.keySet.toSeq.sorted} " +
        s"want ${want.keySet.toSeq.sorted}\n$out")
    // both sample branches exercised among the pre-sample survivors
    assert(expect.keySet.exists(sampled) && expect.keySet.exists(id => !sampled(id)),
      "sample rule not exercised in both directions")
    // every tier provably fired: gopher reject (100), line full-cut (103),
    // line partial cut (102), LM gate (106), clf gate (109), substring cut
    // (117 lost the 5-token span), semantic dup (122 — sample-KEEP branch,
    // so its absence is the semantic tier, not the sample)
    Seq(100L, 103L, 106L, 109L, 122L).foreach(id =>
      assert(!out.contains(id), s"doc $id should have been dropped"))
    assert(sampled(122L), "fixture broke: 122 must be on the sample-keep branch")
  }
}
