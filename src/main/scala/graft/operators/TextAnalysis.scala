package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for training-data pipelines (SURVEY §2 C8-C11) over the
  * `documents` table. All ops are pure `functions._` column pipelines — they
  * stay inside whole-stage codegen, shuffle nothing (per-row transforms), and
  * scale linearly with input splits.
  *
  * Cross-engine determinism: counts are exact integers; every ratio is a
  * division of two exact integers (integer/integer promotes to double
  * identically in Spark and DuckDB); regex patterns are restricted to syntax
  * with identical semantics in Java regex and RE2.
  */
object TextAnalysis {

  /** Whitespace token count without split(): `len - len(sans-spaces) + 1` is
    * exact and engine-portable. BIGINT so the dtype matches DuckDB's int64
    * (the driver's hash distinguishes value representations). */
  private def wsTokens(c: Column): Column =
    wsTokenCount(c).cast("bigint").as("ws_tokens")

  private val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Stopword dictionaries for the language-ID heuristic. */
  private val EnStops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val EsStops = Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "es")
  private val DeStops = Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "ist")
  private val FrStops = Seq("le", "la", "de", "et", "un", "il", "ne", "je", "est", "que")

  private[operators] val Alnum =
    ('A' to 'Z').mkString + ('a' to 'z').mkString + ('0' to '9').mkString + " "

  /** Whitespace token count (int form) — the one definition every operator
    * that reasons about document length shares (C9, C10, C17, C18).
    * `translate` not `regexp_replace`: a plain char map strips the spaces
    * without spinning up the regex engine per row, with identical output. */
  private[operators] def wsTokenCount(c: Column): Column =
    length(c) - length(translate(c, " ", "")) + lit(1)

  /** Count of [^A-Za-z0-9 ] chars via translate (plain char-map — a fraction
    * of a regex extract-all's cost). */
  private[operators] def punctCount(c: Column): Column =
    length(translate(c, Alnum, ""))

  /** The C9 quality score: length signal minus punctuation density. C18's
    * corpus-prep gate uses THIS definition — tune it here and both (and
    * their oracles) move together. */
  private[operators] def qualityScore(c: Column): Column =
    least(wsTokenCount(c), lit(200)) / lit(200) - punctCount(c) / length(c)

  /** Portable 32-bit hash in a long: first 8 md5 hex chars — the idiom the
    * fingerprint (C11) and deterministic sampling (C13, C18) share; both
    * engines agree on it byte-for-byte. */
  private[operators] def hexHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  private def stopHitsSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** C10 — token counting: raw chars, whitespace tokens, and a BPE-ish regex
    * token count (letters runs / single digits / single punctuation — the
    * GPT-2-style pre-tokenizer shape). */
  def textTokens(spark: SparkSession, sfDir: String): DataFrame = {
    // pre-sorted input: the kernel map runs ONCE above the range exchange
    // (Tables.loadSorted has the sampling-job argument)
    val d = Tables.loadSorted(spark, sfDir, "documents", "doc_id")
    // count-only native kernel (functions.BpeTokenCount): the regex form
    // materializes every match into an array just to take its length
    d.select(col("doc_id"), length(col("text")).cast("bigint").as("n_chars_calc"),
        wsTokens(col("text")),
        graft.functions.GraftFunctions.bpeCount(spark, col("text")).as("bpe_tokens"))
  }

  val textTokensSql: String =
    s"""SELECT doc_id, length(text) AS n_chars_calc,
       | length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS ws_tokens,
       | len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** The embedded merge table for C10b — six rank-ordered single-level rules
    * over common English bigrams. The set is deliberately CLOSED-FORM
    * CHECKABLE: within each rule left != right, and no rule's right symbol is
    * any rule's left symbol, so two occurrences (of any rules) can never
    * overlap in any text, merged symbols can never feed a later rule, and
    * greedy rank order can never change an outcome — token count collapses
    * to chars-minus-occurrence-counts, which is plain SQL. The KERNEL
    * (functions.BpeMergeTable) implements full greedy BPE with none of these
    * restrictions — multi-level and rank-competing tables are pinned against
    * hand-computed fixtures in FunctionsSpec; this vocab is what keeps the
    * operator in the hash-level oracle gate too. */
  private[graft] val EmbeddedBpeMerges: Seq[(String, String)] =
    Seq("t" -> "h", "i" -> "n", "e" -> "r", "a" -> "n", "o" -> "n", "e" -> "s")

  /** C10b — REAL byte-pair-encoding token count: single-space
    * pre-tokenization, then the standard greedy merge loop under the
    * rank-ordered [[EmbeddedBpeMerges]] table, as one fused kernel call per
    * row (functions.BpeMergeCount — the trained-vocab upgrade of C10's
    * pre-tokenizer emulation). Zero shuffles: a pure projection, like every
    * text kernel. At production vocab sizes the table moves from plan
    * metadata to the NearestCentroidBroadcast-style executor broadcast; the
    * algorithm and the seam are unchanged. */
  def textTokensBpe(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.loadSorted(spark, sfDir, "documents", "doc_id")
    d.select(col("doc_id"),
        length(translate(col("text"), " ", "")).cast("bigint").as("n_symbols"),
        graft.functions.GraftFunctions
          .bpeMergeCount(spark, col("text"), EmbeddedBpeMerges).as("bpe_tokens"))
  }

  /** The C10b count as a closed-form SQL expression over `text` — the form
    * the no-overlap rule set guarantees: initial symbols (non-space chars)
    * minus one per merge-rule occurrence, each occurrence count being
    * (len - len(after removing the 2-char pattern)) integer-divided by 2.
    * ONE definition shared by C10b's oracle and seq_pack_bpe's packing
    * oracle, so a vocab change can never desynchronize them. */
  private[graft] val bpeCountSqlExpr: String = {
    val removed = EmbeddedBpeMerges.map { case (a, b) =>
      s"(length(text) - length(replace(text, '$a$b', ''))) // 2"
    }.mkString(" - ", " - ", "")
    s"length(replace(text, ' ', ''))$removed"
  }

  /** C10b's oracle: [[bpeCountSqlExpr]]'s closed form per document. */
  val textTokensBpeSql: String =
    s"""SELECT doc_id,
       | CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_symbols,
       | CAST($bpeCountSqlExpr AS BIGINT) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** The C9 metric projection over any (doc_id, text) relation — shared by
    * the batch query and D6's streaming gate (a stream is just another
    * unbounded relation to project over; every signal is row-local). */
  private[graft] def qualityProjection(spark: SparkSession, d: DataFrame): DataFrame = {
    val nTok = wsTokenCount(col("text"))
    val nPunct = punctCount(col("text"))
    // native StopwordHits, not the interpreted filter(split) HOF
    val nStop = graft.functions.GraftFunctions.stopHits(spark, col("text"), EnStops)
    val base = d.select(col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_calc"),
      nTok.cast("bigint").as("ws_tokens"),
      nPunct.as("n_punct"), nStop.as("n_stopwords"))
    base.select(col("doc_id"), col("n_chars_calc"), col("ws_tokens"),
      (col("n_punct") / col("n_chars_calc")).as("punct_ratio"),
      (col("n_stopwords") / col("ws_tokens")).as("stopword_ratio"),
      (least(col("ws_tokens"), lit(200)) / lit(200)
        - col("n_punct") / col("n_chars_calc")).as("quality_score"))
  }

  /** C9 — quality scoring: length/punctuation/stopword signals combined into a
    * deterministic [0,1] score (all ratios are int/int → identical doubles). */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    qualityProjection(spark, Tables.loadSorted(spark, sfDir, "documents", "doc_id"))

  /** ONE source for the C9 score SQL — shared by the batch oracle and D6's
    * gated form so a future score change can never desynchronize them. */
  private def qualitySql(where: String): String =
    s"""SELECT doc_id, n_chars_calc, ws_tokens,
       | n_punct / n_chars_calc AS punct_ratio,
       | n_stopwords / ws_tokens AS stopword_ratio,
       | least(ws_tokens, 200) / 200 - n_punct / n_chars_calc AS quality_score
       |FROM (
       | SELECT doc_id, length(text) AS n_chars_calc,
       |  length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS ws_tokens,
       |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
       |  ${stopHitsSql(EnStops)} AS n_stopwords
       | FROM documents) t
       |${where}ORDER BY doc_id""".stripMargin

  /** D6's oracle: C9's SQL with the gate predicate folded in (the stream is
    * stateless, so the drained backlog equals the gated batch query). */
  private[graft] def qualityGateSql(threshold: String): String =
    qualitySql("WHERE least(ws_tokens, 200) / 200" +
      s" - n_punct / n_chars_calc > $threshold\n")

  val textQualitySql: String = qualitySql("")

  /** C8 — language-ID heuristic: stopword-dictionary votes + a CJK character
    * probe; deterministic tie-break en > es > de > fr > und.
    *
    * Shape evolution, fastest last (all three measured at sf0.1):
    * 1. interpreted-HOF `filter(split(...)).size` per dictionary — 4 full
    *    splits/allocs per row through non-codegen lambda machinery (~3×
    *    slower than 2);
    * 2. ONE explode → groupBy(doc) with 4 conditional sums — a corpus-sized
    *    Generate plus the plan's only Exchange;
    * 3. (current) 4 projected StopwordHits native expressions — scoring
    *    stays inside the scan's codegen, the plan is a pure map with no
    *    Generate and NO shuffle (the property that matters at 100 TB: a
    *    language-ID pass is embarrassingly parallel and should plan as one).
    * The CJK probe is a find-first `rlike`, not an extract-all count (only
    * "any match" feeds the decision). */
  def textLangid(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.loadSorted(spark, sfDir, "documents", "doc_id")
    // per-dictionary hit counts as projected native expressions
    // (functions.StopwordHits): scoring never leaves the scan stage, so the
    // whole language-ID pass is a pure map — no Generate, no Exchange. The
    // former explode+groupBy form survives as the semantic reference in
    // FunctionsSpec (langidScoresComposed).
    def score(words: Seq[String]) =
      graft.functions.GraftFunctions.stopHits(spark, col("text"), words)
    val scored = d.select(col("doc_id"),
        col("text").rlike("[\\x{4e00}-\\x{9fff}]").as("has_cjk"),
        score(EnStops).as("en_score"), score(EsStops).as("es_score"),
        score(DeStops).as("de_score"), score(FrStops).as("fr_score"))
    scored.select(col("doc_id"),
        when(col("has_cjk"), "zh")
          .when(col("en_score") === 0 && col("es_score") === 0 &&
            col("de_score") === 0 && col("fr_score") === 0, "und")
          .when(col("en_score") >= col("es_score") &&
            col("en_score") >= col("de_score") &&
            col("en_score") >= col("fr_score"), "en")
          .when(col("es_score") >= col("de_score") &&
            col("es_score") >= col("fr_score"), "es")
          .when(col("de_score") >= col("fr_score"), "de")
          .otherwise("fr").as("predicted_lang"),
        col("en_score"), col("es_score"), col("de_score"), col("fr_score"))
  }

  /** The explode+aggregate scoring form StopwordHits replaces — kept as the
    * executable semantic reference the native kernel is tested against. */
  private[graft] def langidScoresComposed(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    def score(words: Seq[String]) =
      sum(when(col("t").isin(words: _*), 1L).otherwise(0L))
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("doc_id"))
      .agg(score(EnStops).as("en_score"), score(EsStops).as("es_score"),
        score(DeStops).as("de_score"), score(FrStops).as("fr_score"))
  }

  val textLangidSql: String =
    s"""SELECT doc_id,
       | CASE WHEN cjk_chars > 0 THEN 'zh'
       |  WHEN en_score = 0 AND es_score = 0 AND de_score = 0 AND fr_score = 0 THEN 'und'
       |  WHEN en_score >= es_score AND en_score >= de_score AND en_score >= fr_score THEN 'en'
       |  WHEN es_score >= de_score AND es_score >= fr_score THEN 'es'
       |  WHEN de_score >= fr_score THEN 'de'
       |  ELSE 'fr' END AS predicted_lang,
       | en_score, es_score, de_score, fr_score
       |FROM (
       | SELECT doc_id,
       |  ${stopHitsSql(EnStops)} AS en_score,
       |  ${stopHitsSql(EsStops)} AS es_score,
       |  ${stopHitsSql(DeStops)} AS de_score,
       |  ${stopHitsSql(FrStops)} AS fr_score,
       |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk_chars
       | FROM documents) t
       |ORDER BY doc_id""".stripMargin

  /** C11 — document fingerprinting: an order-sensitive polynomial rolling hash
    * over tokens. Per-token hash = first 8 hex chars of md5 (portable: both
    * engines agree on md5), folded with a 31-multiplier mod 1e9+7 — modular so
    * Spark 4's ANSI mode can't overflow, and SQL-expressible so the DuckDB
    * oracle covers it. */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.loadSorted(spark, sfDir, "documents", "doc_id")
    // the fused native expression (functions.TokenFingerprint) — bit-equal to
    // the composed HOF form, which FunctionsSpec keeps pinned as the
    // semantic reference
    d.select(col("doc_id"),
        graft.functions.GraftFunctions.fingerprint(spark, col("text")).as("fingerprint"),
        wsTokens(col("text")))
  }

  /** The composed (interpreted-HOF) form TokenFingerprint replaces — kept as
    * the executable semantic spec the native kernel is tested against. */
  private[graft] def fingerprintComposed(c: Column): Column =
    aggregate(split(c, " "), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + hexHash(t), lit(1000000007L)))

  val textFingerprintSql: String =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(CAST(0 AS BIGINT),
      |     list_transform(string_split(text, ' '),
      |       t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS INT64) AS BIGINT))),
      |   (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint,
      | length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** C34 — hashing-trick linear classifier (fastText-style quality filter):
    * every token hashes to a weight bucket, the document score is the exact
    * integer weight sum normalized by token count, and the keep decision is a
    * threshold on the score. The weight table here is derived from the hash
    * itself (w = h mod 1001 − 500 — see FingerprintHelper.weightSum for why
    * that stands in for trained weights without changing the execution
    * shape); scoring is ONE native fused kernel call per row — no token
    * explode, no weight-table join, no shuffle, the same
    * embarrassingly-parallel pure-map plan as C8/C10/C11, which is the only
    * shape a classifier gate over 100 TB of crawl text can afford.
    * `clf_score` is the division of two exactly-represented integers
    * (|weight_sum| ≤ 500·tokens), so both engines round it identically. */
  def textClassify(spark: SparkSession, sfDir: String): DataFrame =
    classifyProjection(spark, Tables.loadSorted(spark, sfDir, "documents", "doc_id"))

  /** The C34 score projection over any (doc_id, text) relation — shared by
    * the batch query and D9's streaming gate (every signal is row-local, so
    * a stream is just another unbounded relation to project over, exactly
    * like C9/D6). */
  private[graft] def classifyProjection(spark: SparkSession, d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        graft.functions.GraftFunctions.tokenWeight(spark, col("text")).as("weight_sum"),
        wsTokens(col("text")))
      .select(col("doc_id"), col("weight_sum"), col("ws_tokens"),
        (col("weight_sum") / (lit(500L) * col("ws_tokens"))).as("clf_score"))
      .withColumn("kept", col("clf_score") > lit(0.0))

  /** The composed (interpreted-HOF) scoring form TokenWeightSum replaces —
    * kept as the executable semantic spec the native kernel is tested
    * against (FunctionsSpec). */
  private[graft] def weightSumComposed(c: Column): Column =
    aggregate(split(c, " "), lit(0L),
      (acc, t) => acc + pmod(hexHash(t), lit(1001L)) - lit(500L))

  /** ONE source for the C34 score SQL — shared by the batch oracle and D9's
    * gated form (the same single-definition discipline as qualitySql/D6). */
  private def classifySql(where: String): String =
    s"""SELECT doc_id, weight_sum, ws_tokens,
       | weight_sum / (500 * ws_tokens) AS clf_score,
       | weight_sum / (500 * ws_tokens) > 0.0 AS kept
       |FROM (
       | SELECT doc_id,
       |  CAST(list_sum(list_transform(string_split(text, ' '),
       |    t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS INT64) AS BIGINT) % 1001 - 500))
       |   AS BIGINT) AS weight_sum,
       |  length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS ws_tokens
       | FROM documents) t
       |${where}ORDER BY doc_id""".stripMargin

  val textClassifySql: String = classifySql("")

  /** D9's oracle: C34's SQL with the gate predicate folded in (the stream is
    * stateless, so the drained backlog equals the gated batch query). */
  private[graft] def classifyGateSql: String =
    classifySql("WHERE weight_sum / (500 * ws_tokens) > 0.0\n")

  // ----- C40: reference-LM gate (CCNet-style n-gram perplexity family) -----

  // dir -> (documents fingerprint, (uniBlob, biBlob)): the trained LM
  // artifact, cached under the same replace-on-stale rule as the bloom
  // sketch and the codebooks — a regenerated corpus retrains, never reuses
  private val lmModelCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, (String, String))]

  /** Evict the trained LM artifacts AND their executor broadcasts
    * (ColdWarm's cold-path hook — the C40 analog of
    * Similarity.clearCaches, including its broadcast-release leg). */
  def clearLmCache(): Unit = {
    lmModelCache.clear()
    graft.functions.GraftFunctions.clearLmBroadcasts()
  }

  /** Reference-corpus ceiling (docs) for LM training — the bound that makes
    * the CCNet contract enforceable in code: the reference is a FIXED clean
    * corpus (Wikipedia in the paper), so its size — and hence the vocabulary
    * the build collects to the driver and the model the scorer transports —
    * is a deployment CONSTANT, never a function of the corpus being scored.
    * Overridable per deployment (`-Dgraft.lm.ref.max.docs`). */
  private[graft] def lmRefMaxDocs: Long =
    sys.props.get("graft.lm.ref.max.docs").map(_.toLong).getOrElse(1L << 20)

  /** Train a reference bigram LM from an EXPLICIT reference corpus: unigram
    * + bigram counts aggregated distributedly to a VOCAB-sized table;
    * only that table reaches the driver, as newline blobs
    * (`count<SP>gram`). The build REFUSES a reference above [[lmRefMaxDocs]]
    * rather than silently collecting an unbounded vocabulary — with the
    * bound honored, the collect is capped by the reference contract, not by
    * the (growing) scored corpus. Transport of the result is size-switched
    * downstream (GraftFunctions.lmScoreAuto): literal blobs small, executor
    * broadcast large. */
  def lmModelFrom(ref: DataFrame): (String, String) = {
    val nRef = ref.count()
    require(nRef <= lmRefMaxDocs,
      s"LM reference corpus has $nRef docs, above the bounded-reference " +
        s"ceiling $lmRefMaxDocs (-Dgraft.lm.ref.max.docs). The CCNet recipe " +
        "trains on a FIXED clean corpus — pass a bounded reference table, " +
        "not a slice that grows with the corpus being scored.")
    def blob(rows: DataFrame): String = {
      val entries = rows.groupBy(col("g")).agg(count(lit(1)).as("c"))
        .collect().map(r => s"${r.getLong(1)} ${r.getString(0)}")
      require(entries.forall(!_.contains("\n")),
        "LM grams must be newline-free to ride in the blob")
      entries.sorted.mkString("\n")
    }
    (blob(ref.select(explode(split(col("text"), " ")).as("g"))),
      blob(PipelineOps.ngramFlat(ref, 2).select(col("g"))))
  }

  /** The harness's reference binding: the doc_id % 97 slice (C15's
    * eval-suite convention standing in for CCNet's Wikipedia — the oracle
    * rebuilds the model from the same slice), trained through the BOUNDED
    * [[lmModelFrom]] contract and cached once per scale dir. A production
    * deployment calls lmModelFrom with its own fixed reference table. */
  private[graft] def lmModel(spark: SparkSession, sfDir: String): (String, String) = {
    val fp = graft.Tables.fingerprint(sfDir, "documents")
    lmModelCache.get(sfDir).filter(_._1 == fp).map(_._2)
      .getOrElse(this.synchronized {
        lmModelCache.get(sfDir).filter(_._1 == fp).map(_._2).getOrElse {
          // disk-first (StoreFp model blob): the two count blobs are
          // newline-joined `count<SP>gram` lines (newline-free by
          // lmModelFrom's require), so the line codec is the identity —
          // one persisted model per blob, adoption bit-equal to a retrain
          val slug = sfDir.replaceAll("[^A-Za-z0-9]+", "_")
          def ensure(kind: String)(train: => String): String =
            graft.StoreFp.ensureModel(s"lm_$kind$slug", fp) {
              train.split('\n').toSeq
            }.mkString("\n")
          // train ONCE when either blob is missing (lmModelFrom builds both)
          lazy val trained = lmModelFrom(Tables.load(spark, sfDir, "documents")
            .filter(col("doc_id") % 97 === 0))
          val blobs = (ensure("uni")(trained._1), ensure("bi")(trained._2))
          lmModelCache(sfDir) = (fp, blobs)
          blobs
        }
      })
  }

  /** C40 — reference-LM gate (the CCNet recipe, Wenzek et al. 2019,
    * arXiv:1911.00359): score every document by how well a small n-gram LM
    * trained on a clean reference corpus explains it, and flag documents
    * the model cannot explain. The score is the arithmetic-mean add-one-
    * smoothed INVERSE bigram probability — perplexity's sibling statistic
    * (perplexity is the geometric mean of the same per-gram inverse
    * probabilities); the arithmetic form needs no log/exp, so the score is
    * an exact IEEE op sequence both engines compute bit-identically (the
    * kernel's scaladoc has the full argument). One fused kernel call per
    * row (functions.GramLmScore / GramLmScoreBroadcast — C34's shape: the
    * model rides as plan metadata or an executor-broadcast handle,
    * size-switched in GraftFunctions.lmScoreAuto; the corpus never explodes
    * a token or joins a count table), so the whole operator is a
    * zero-shuffle pure map, gated in PlanGateSpec. The model itself is
    * bounded by [[lmModelFrom]]'s fixed-reference contract.
    * `lowq` = mean inverse probability above the vocabulary size V — worse
    * than the uniform-ish baseline, the model sees the doc as noise. */
  def textPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val (uniBlob, biBlob) = lmModel(spark, sfDir)
    lmProjection(spark,
      Tables.loadSorted(spark, sfDir, "documents", "doc_id"), uniBlob, biBlob)
  }

  /** The C40 score projection over any (doc_id, text) relation — shared by
    * the batch query and D13's streaming gate (the model is a plan literal
    * and the score row-local, so a stream is just another unbounded
    * relation to project over, exactly like C34/D9). */
  private[graft] def lmProjection(spark: SparkSession, d: DataFrame,
    uniBlob: String, biBlob: String): DataFrame = {
    // V from the SAME parse the kernel smooths with (distinct map keys) —
    // a second line-count rule here could silently diverge from the V
    // inside every score term if a blob ever carried duplicate entries
    val v = new graft.functions.GramLmModel(uniBlob, biBlob).v
    // domain rule BEFORE the kernel, as a cheap token-count predicate
    // (n_bigrams >= 1 ⟺ tokens >= 2 — the kernel returns
    // max(tokens-1, 0)): a post-kernel filter on s.n_bigrams gets
    // predicate-pushed below the entry point's sort WITH the kernel
    // expression inside it, re-scoring every row in the filter and again
    // in the range sampler (the single-eval plan gate caught this)
    d.filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"),
        // size-switched transport: literal blobs under the threshold,
        // executor broadcast past it — same kernel, same bits either way
        graft.functions.GraftFunctions
          .lmScoreAuto(spark, col("text"), uniBlob, biBlob).as("s"))
      .select(col("doc_id"), col("s.n_bigrams").as("n_bigrams"),
        round(col("s.inv_sum") / col("s.n_bigrams"), 6).as("lm_score"),
        (col("s.inv_sum") / col("s.n_bigrams") > lit(v.toDouble)).as("lowq"))
  }

  /** ONE source for the C40 score SQL — shared by the batch oracle and
    * D13's gated form (the classifySql single-definition discipline). The
    * LM is rebuilt inline from the same reference slice; per-doc scoring is
    * an ORDERED left fold (list_reduce over list_prepend 0.0) of the same
    * map lookups and double divisions the kernel makes, so scores are
    * bit-exact across engines. */
  private def lmSql(where: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |ref AS (SELECT ts FROM toks WHERE doc_id % 97 = 0),
      |uni AS (SELECT t, COUNT(*) AS c
      |        FROM (SELECT unnest(ts) AS t FROM ref) GROUP BY t),
      |bi AS (SELECT g, COUNT(*) AS c FROM (
      |  SELECT unnest(list_transform(range(1, len(ts)),
      |    i -> ts[i] || ' ' || ts[i+1])) AS g FROM ref) GROUP BY g),
      |vv AS (SELECT COUNT(*) AS v FROM uni),
      |um AS (SELECT map(list(t), list(c)) AS m FROM uni),
      |bm AS (SELECT map(list(g), list(c)) AS m FROM bi),
      |scored AS (
      | SELECT t.doc_id, len(t.ts) - 1 AS n_bi,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, len(t.ts)), i ->
      |      CAST(COALESCE(map_extract(um.m, t.ts[i])[1], 0) + vv.v AS DOUBLE)
      |      / CAST(COALESCE(map_extract(bm.m, t.ts[i] || ' ' || t.ts[i+1])[1], 0) + 1 AS DOUBLE))),
      |    (a, b) -> a + b) AS inv_sum,
      |  vv.v AS v
      | FROM toks t, um, bm, vv
      | WHERE len(t.ts) >= 2)
      |SELECT doc_id, CAST(n_bi AS BIGINT) AS n_bigrams,
      | ROUND(inv_sum / n_bi, 6) AS lm_score,
      | (inv_sum / n_bi) > CAST(v AS DOUBLE) AS lowq
      |FROM scored
      |${where}ORDER BY doc_id""".stripMargin

  val textPerplexitySql: String = lmSql("")

  /** C47 — the full Gopher quality-rule bundle (Rae et al. 2021 §A1.1): the
    * word- and LINE-shape rules C9's score does not see — word count in
    * [50, 100k], mean word length in [3, 10], ≥80% of words contain an
    * alphabetic character, ≤90% of lines open with a bullet, ≤30% of lines
    * close with an ellipsis, symbol-to-word ratio ('#' chars + '...' runs)
    * ≤ 0.1 — each emitted as its measured fraction plus the composed admit
    * decision. The synthetic corpus is single-line prose, so deterministic
    * shape salts are folded in FIRST (same construction in the oracle SQL,
    * the C19 salted-PII discipline): bullet/ellipsis lines, numeric-word and
    * '#' floods, and a bullet-flood tail — every rule both passes and FAILS
    * on real corpus runs at every scale, never vacuously.
    *
    * Shape at 100 TB: the word/line stats come from ONE fused byte-pass
    * kernel (functions.GopherStats — a split-explode or HOF-lambda form
    * would allocate every word and line of the corpus and leave codegen);
    * ratios and thresholds are arithmetic over the struct. Zero shuffle,
    * order established on the raw scan (single-eval sort discipline). */
  def textGopher(spark: SparkSession, sfDir: String): DataFrame =
    gopherProjection(spark, Tables.loadSorted(spark, sfDir, "documents", "doc_id"))

  /** The C47 rule bundle over any (doc_id, text) relation — shared by the
    * batch query and D16's streaming gate (every rule is row-local, so a
    * stream is just another unbounded relation to project over; the shape
    * salts key off doc_id and are identical in both engines). */
  private[graft] def gopherProjection(spark: SparkSession, d: DataFrame,
    salt: Boolean = true, keep: Seq[String] = Nil): DataFrame = {
    val salted = if (!salt) col("text") else concat(
      when(pmod(col("doc_id"), lit(7)) === 0, lit("- lead bullet\n")).otherwise(lit("")),
      col("text"),
      when(pmod(col("doc_id"), lit(11)) === 0, lit("\n0123 4567 89 ##")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(17)) === 0,
        concat(lit(" "), repeat(lit("12345 "), 30))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit(" "), repeat(lit("#"), 40))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(23)) === 0,
        concat(lit("\n"), repeat(lit("- b\n"), 20))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("\nto be continued...")).otherwise(lit("")))
    val nEll3 = (length(col("t")) -
      length(call_function("replace", col("t"), lit("..."), lit("")))) / lit(3)
    val nHash = length(col("t")) -
      length(call_function("replace", col("t"), lit("#"), lit("")))
    d.select(Seq(col("doc_id"), salted.as("t"),
        graft.functions.GraftFunctions.gopherStats(spark, salted).as("gs"))
        ++ keep.map(col): _*)
      .select(Seq(col("doc_id"),
        col("gs.n_words").as("n_words"),
        ((length(col("t")) - (col("gs.n_words") - 1)) / col("gs.n_words"))
          .as("mean_word_len"),
        (col("gs.n_alpha_words") / col("gs.n_words")).as("alpha_frac"),
        (col("gs.n_bullet_lines") / col("gs.n_lines")).as("bullet_frac"),
        (col("gs.n_ellipsis_lines") / col("gs.n_lines")).as("ellipsis_frac"),
        ((nHash + nEll3) / col("gs.n_words")).as("symbol_ratio"))
        ++ keep.map(col): _*)
      .withColumn("admit",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("alpha_frac") >= 0.8 && col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 && col("symbol_ratio") <= 0.1)
  }

  /** The C47 admit as a composed-pipeline GATE over the RAW text: the
    * standalone query's shape salts exist only so every rule fires on the
    * single-line synthetic corpus — a pipeline tier must never mutate the
    * text it forwards, so the gate projects the same six rules unsalted
    * (single-sourced through [[gopherProjection]]) and keeps only
    * (doc_id, lang, text) of the admitted documents. On the synthetic
    * corpus the word-count floor alone cuts ~45% of docs, so the tier is
    * non-vacuous at every scale. */
  private[graft] def gopherAdmittedDocs(spark: SparkSession, d: DataFrame): DataFrame =
    gopherProjection(spark, d, salt = false, keep = Seq("lang", "text"))
      .filter(col("admit"))
      .select(col("doc_id"), col("lang"), col("text"))

  /** ONE source for the C47 rule SQL — shared by the batch oracle and D16's
    * gated form so a rule-threshold change can never desynchronize them.
    * The final SELECT is wrapped so the gate's WHERE can reference the
    * composed `admit` alias portably. */
  private def gopherSql(where: String): String =
    s"""WITH s AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN '- lead bullet' || chr(10) ELSE '' END
      |  || text
      |  || CASE WHEN doc_id % 11 = 0 THEN chr(10) || '0123 4567 89 ##' ELSE '' END
      |  || CASE WHEN doc_id % 17 = 0 THEN ' ' || repeat('12345 ', 30) ELSE '' END
      |  || CASE WHEN doc_id % 13 = 0 THEN ' ' || repeat('#', 40) ELSE '' END
      |  || CASE WHEN doc_id % 23 = 0 THEN chr(10) || repeat('- b' || chr(10), 20) ELSE '' END
      |  || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'to be continued...' ELSE '' END AS t
      | FROM documents),
      |$gopherRuleCtesSql
      |SELECT * FROM g
      |${where}ORDER BY doc_id""".stripMargin

  /** The C47 measurement + rule CTEs (`m`, `g`) over a prior CTE `s` with
    * (doc_id, t) — ONE text shared by the standalone/salted oracle above
    * and the composed pipelines' unsalted gate (prepareCorpusV4Sql), which
    * differ only in how they build `s`. Mirrors [[gopherProjection]]. */
  private[graft] val gopherRuleCtesSql: String =
    s"""m AS (
      | SELECT doc_id, t,
      |  len(string_split(t, ' ')) AS n_words,
      |  len(list_filter(string_split(t, ' '),
      |      w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
      |  len(string_split(t, chr(10))) AS n_lines,
      |  len(list_filter(string_split(t, chr(10)),
      |      l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS n_bullet,
      |  len(list_filter(string_split(t, chr(10)),
      |      l -> ends_with(l, '...'))) AS n_ellipsis,
      |  length(t) - length(replace(t, '#', '')) AS n_hash,
      |  (length(t) - length(replace(t, '...', ''))) / 3 AS n_ell3
      | FROM s),
      |g AS (
      | SELECT doc_id, n_words,
      |  (length(t) - (n_words - 1)) / n_words AS mean_word_len,
      |  n_alpha / n_words AS alpha_frac,
      |  n_bullet / n_lines AS bullet_frac,
      |  n_ellipsis / n_lines AS ellipsis_frac,
      |  (n_hash + n_ell3) / n_words AS symbol_ratio,
      |  (n_words BETWEEN 50 AND 100000)
      |   AND (length(t) - (n_words - 1)) / n_words BETWEEN 3.0 AND 10.0
      |   AND n_alpha / n_words >= 0.8 AND n_bullet / n_lines <= 0.9
      |   AND n_ellipsis / n_lines <= 0.3 AND (n_hash + n_ell3) / n_words <= 0.1
      |   AS admit
      | FROM m)""".stripMargin

  val textGopherSql: String = gopherSql("")

  /** D16's oracle: C47's SQL with the composed admit folded in (stateless ⇒
    * the drained backlog equals the gated batch query). */
  private[graft] def gopherGateSql: String = gopherSql("WHERE admit\n")

  /** D13's oracle: C40's SQL with the admit predicate folded in (the stream
    * is stateless, so the drained backlog equals the gated batch query). */
  private[graft] def lmGateSql: String =
    lmSql("WHERE (inv_sum / n_bi) <= CAST(v AS DOUBLE)\n")

  /** C53 — TF-IDF keyword extraction (`text_tfidf`): the top-3 terms per
    * document by tf × rational-idf, the per-doc keyword signal topic
    * labeling, dataset cards and search-side filtering read off a corpus.
    * idf is BM25's idf ARGUMENT, (N − df + 0.5)/(df + 0.5), without the
    * log: ln is strictly monotone so per-TERM rarity ranks identically,
    * and keeping the whole score inside +,−,×,÷ keeps every double on the
    * same IEEE op sequence in the plan and the oracle — C40's
    * transcendental-free discipline (JVM Math.log and DuckDB ln are
    * correctly-rounded only per-libm, not cross-engine).
    *
    * Distributed shape (C50's de-skew discipline applied to df): tf is ONE
    * partial-aggregating HashAggregate over (doc_id, term) — a stopword
    * occurring 10⁸ times collapses map-side to one row per task; df counts
    * the DISTINCT PAIRS tf already produced (never re-scanning the corpus,
    * never shuffling occurrences by term); the score join meets the
    * 1-row-per-term df side as a sort-merge (unique-keyed build side — no
    * per-key buffering under stopword skew), and the corpus size enters as
    * a broadcast 1-row aggregate, never a collect. The only windows run on
    * doc_id — naturally balanced, ≤ vocab-per-doc rows each. */
  def textTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    // The (doc_id, term) tf relation feeds BOTH the df count and the score
    // join; as sibling subtrees each would re-run the scan+explode+aggregate
    // cone (no cross-branch CSE in Catalyst). Materialize it once per
    // invocation — the in-run analog of persisting the tf tier between the
    // two consumers at scale. Recomputed from parquet on every call.
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.select(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfc.hint("merge"), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          (col("n_docs") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score_r"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** C53's oracle: same tf/df derivation (df over the distinct tf pairs),
    * same parenthesization of the rational-idf score, same rank/tie/round
    * rules — term ties break on the term's UTF-8 byte order, identical in
    * Spark's UTF8String compare and DuckDB's default binary collation. */
  val textTfidfSql: String =
    """WITH toks AS (
      | SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
      |scored AS (
      | SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
      |  CAST(tf.tf AS DOUBLE) *
      |   (n.n_docs - CAST(dfc.df AS DOUBLE) + 0.5) /
      |   (CAST(dfc.df AS DOUBLE) + 0.5) AS score
      | FROM tf JOIN dfc USING (term) CROSS JOIN n),
      |rk AS (
      | SELECT doc_id, term, tf, df, score,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      | FROM scored)
      |SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, df,
      | ROUND(score, 6) AS score_r
      |FROM rk WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ----- C59: distributed BPE tokenizer TRAINING (`bpe_train`) -----

  /** Merge-round count — a small deterministic vocab for the graded gate; a
    * production run raises it (`-Dgraft.bpe.train.rounds`). The oracle text
    * and the model-blob fingerprint both derive from this value, so a
    * retune regenerates the SQL and retrains loudly. */
  private[graft] def bpeTrainRounds: Int =
    sys.props.get("graft.bpe.train.rounds").map(_.toInt).getOrElse(8)

  /** Wrapped symbol-sequence string form: every symbol rides between its OWN
    * marker pair (\u0001 sym \u0002), so `replace` of a wrapped pair is
    * exactly BPE's leftmost non-overlapping merge application — a single
    * SHARED separator would consume the delimiter between back-to-back
    * matches ("a a a a" would merge to "aa a a", not "aa aa"). The markers
    * can never collide with symbol text: symbols are [a-z]+ by
    * construction. Same encoding in the oracle (chr(1)/chr(2)). */
  private val SymL = "\u0001"
  private val SymR = "\u0002"

  /** C59's training corpus: the distinct-WORD frequency table — the classic
    * BPE-trainer reduction. ONE corpus-wide shuffle builds it; every merge
    * round thereafter iterates over the vocabulary (bounded by language,
    * not corpus size), which is what makes k rounds affordable at 100 TB. */
  private def bpeWordFreqs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))

  /** The per-round pair-count frame over a (f, s) wrapped-vocab relation:
    * unwrap to the symbol array, pair adjacent symbols row-locally, ONE
    * partial-aggregating hash shuffle on (lhs, rhs) — the C53 de-skew
    * discipline (map-side combine carries one slim row per pair per task).
    * Exposed for the plan gate. */
  private[graft] def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("f"), split(expr("substring(s, 2, length(s) - 2)"),
        SymR + SymL).as("syms"))
      .select(col("f"), explode(expr(
        "transform(slice(syms, 1, size(syms) - 1), (x, i) -> struct(x AS l, syms[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("f")).as("cnt"))

  /** Round-1 pair counts for a dir (the plan-gate entry point). */
  private[graft] def bpePairCountsFor(spark: SparkSession, sfDir: String): DataFrame =
    bpePairCounts(bpeWordFreqs(spark, sfDir)
      .select(col("f"), regexp_replace(col("word"), "(.)", SymL + "$1" + SymR).as("s")))

  // dir -> (fingerprint:rounds tag, merges)
  private val bpeMergesCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, Seq[(Int, String, String, Long)])]

  def clearBpeCache(): Unit = bpeMergesCache.clear()

  /** Train the merges table: `bpeTrainRounds` rounds of global top-pair
    * counting — each round ONE groupBy over the wrapped vocabulary, argmax
    * by (count DESC, lhs, rhs) — then apply the merge to the vocab as one
    * row-local `replace` and localCheckpoint the result (flat plans, the
    * Lloyd discipline: only ONE slim row reaches the driver per round).
    * Persisted as a StoreFp model blob: the trained tokenizer is a corpus
    * artifact, adopted bit-exactly by later sessions (counts and symbols
    * are integers/ASCII — text lines round-trip exactly). */
  def trainBpeMerges(spark: SparkSession, sfDir: String): Seq[(Int, String, String, Long)] = {
    val tag = graft.Tables.fingerprint(sfDir, "documents") + ":r" + bpeTrainRounds
    bpeMergesCache.get(sfDir).filter(_._1 == tag).map(_._2).getOrElse(this.synchronized {
      bpeMergesCache.get(sfDir).filter(_._1 == tag).map(_._2).getOrElse {
        val lines = graft.StoreFp.ensureModel(
          "bpe_merges" + sfDir.replaceAll("[^A-Za-z0-9]+", "_"), tag) {
          trainBpeUncached(spark, sfDir).map { case (rk, l, r, c) => s"$rk $l $r $c" }
        }
        val merges = lines.map { ln =>
          val p = ln.split(' '); (p(0).toInt, p(1), p(2), p(3).toLong)
        }
        bpeMergesCache(sfDir) = (tag, merges)
        merges
      }
    })
  }

  private def trainBpeUncached(spark: SparkSession,
    sfDir: String): Seq[(Int, String, String, Long)] = {
    var vocab = bpeWordFreqs(spark, sfDir)
      .select(col("f"), regexp_replace(col("word"), "(.)", SymL + "$1" + SymR).as("s"))
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rk <- 1 to bpeTrainRounds) {
      val top = bpePairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"bpe_train: vocabulary exhausted at round $rk/$bpeTrainRounds — " +
          "corpus too small for the configured merge count " +
          "(-Dgraft.bpe.train.rounds)")
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((rk, l, r, c))
      vocab = vocab.select(col("f"),
        replace(col("s"), lit(SymL + l + SymR + SymL + r + SymR),
          lit(SymL + l + r + SymR)).as("s"))
        .localCheckpoint()
    }
    out.result()
  }

  /** C59 — the registered query: the rank-ordered merges table (what C10b's
    * tokenizer consumes as its merges input). Tiny by contract — R rows. */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainBpeMerges(spark, sfDir)
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
      .select(col("merge_rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
      .orderBy(col("merge_rank"))
  }

  /** C59's oracle: the full trainer re-derived in SQL — word-frequency CTE,
    * then per round a pair-count CTE (list pairing over the unwrapped
    * symbol list), a LIMIT-1 argmax with the same (cnt DESC, lhs, rhs)
    * tie-break, and the wrapped-string `replace` merge application —
    * integer counts and ASCII symbols throughout, so the compare is exact.
    * A def (init-order rule). */
  def bpeTrainSql: String = {
    val rounds = (1 to bpeTrainRounds).map { i =>
      val prev = s"s${i - 1}"
      // LOUD vocabulary-exhaustion guard, mirroring the Spark trainer's
      // require(): an empty m$i makes its scalar subqueries NULL, and
      // replace(s, NULL, …) would silently NULL the whole vocab — the
      // oracle must fail the same way the trainer does, not degrade
      def g(c: String) = s"COALESCE((SELECT $c FROM m$i), " +
        s"error('bpe_train oracle: vocabulary exhausted at round $i'))"
      s"""r$i AS MATERIALIZED (
         | SELECT p.l AS lhs, p.r AS rhs, CAST(SUM(f) AS BIGINT) AS cnt
         | FROM (
         |  SELECT f, unnest(list_transform(range(1, len(syms)), j ->
         |    struct_pack(l := syms[j], r := syms[j + 1]))) AS p
         |  FROM (SELECT f, string_split(substring(s, 2, length(s) - 2),
         |        chr(2) || chr(1)) AS syms FROM $prev))
         | GROUP BY p.l, p.r),
         |m$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM r$i ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |s$i AS MATERIALIZED (SELECT f, replace(s,
         |   chr(1) || ${g("lhs")} || chr(2) || chr(1) || ${g("rhs")} || chr(2),
         |   chr(1) || ${g("lhs")} || ${g("rhs")} || chr(2)) AS s
         | FROM $prev)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to bpeTrainRounds).map(i =>
      s"SELECT $i AS merge_rank, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count FROM m$i")
      .mkString("\n UNION ALL ")
    s"""WITH wx AS (
       | SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       | FROM documents),
       |w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM wx GROUP BY word),
       |s0 AS MATERIALIZED (SELECT f, regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS s FROM w),
       |$rounds
       |SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, merged, pair_count
       |FROM ($rows)
       |ORDER BY merge_rank""".stripMargin
  }

  // ----- C60: distributed classifier TRAINING (`classifier_train`) -----

  /** Hashing-trick bucket count / training-round count for C60 — small
    * deterministic defaults for the graded gate; a production run raises
    * them (`-Dgraft.clf.buckets` / `-Dgraft.clf.rounds`). Both ride the
    * model-blob fingerprint tag, so a retune regenerates the oracle text
    * and retrains loudly (the C59/:ivfk discipline). */
  private[graft] def clfBuckets: Int =
    sys.props.get("graft.clf.buckets").map(_.toInt).getOrElse(256)
  private[graft] def clfRounds: Int =
    sys.props.get("graft.clf.rounds").map(_.toInt).getOrElse(5)

  /** C60's feature frame: (doc_id, label, bucket list) — label +1 for the
    * planted English documents, −1 otherwise (the is-English quality gate
    * fastText-style classifiers train for), bucket per TOKEN OCCURRENCE via
    * the same md5 hashing trick C34 scores with. Entirely ROW-LOCAL: no
    * explode, no per-doc aggregation, no shuffle — the one corpus pass a
    * 100 TB training sweep can afford, localCheckpointed once and reused
    * by every round. */
  private[graft] def clfFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("lang") === "en", lit(1L)).otherwise(lit(-1L)).as("y"),
        transform(split(col("text"), " "),
          t => pmod(hexHash(t), lit(clfBuckets.toLong)).cast("int")).as("bks"))

  /** One training round's gradient frame under the CURRENT weights: score
    * every document row-locally against the BROADCAST weight vector (a
    * B-element array literal — element_at per token occurrence, no weight-
    * table join), keep the misclassified rows (batch perceptron rule:
    * y·score ≤ 0), and partially aggregate slim (bucket, y) pairs — the
    * round's ONE hash shuffle, ≤ B rows out. Integer weights, counts and
    * updates throughout keep every engine bit-exact (the C26 fixed-point
    * discipline); perceptron loss instead of a logistic sigmoid keeps the
    * update inside +,−,× (transcendentals are not cross-engine stable). */
  private[graft] def clfGrad(feats: DataFrame, w: Array[Long]): DataFrame = {
    val wArr = array(w.map(lit(_)): _*)
    feats
      .select(col("y"), col("bks"),
        aggregate(col("bks"), lit(0L),
          (acc, b) => acc + element_at(wArr, b + 1)).as("score"))
      .filter(col("y") * col("score") <= 0)
      .select(explode(col("bks")).as("bucket"), col("y"))
      .groupBy(col("bucket")).agg(sum(col("y")).as("g"))
  }

  /** The round-1 gradient frame for a dir (the plan-gate entry point:
    * feature build + scoring are one row-local map, the (bucket, y) rollup
    * is the round's single exchange, and there is NO join anywhere). */
  private[graft] def clfGradFor(spark: SparkSession, sfDir: String): DataFrame =
    clfGrad(clfFeatures(spark, sfDir), Array.fill(clfBuckets)(0L))

  // dir -> (fingerprint:buckets:rounds tag, weights)
  private val clfCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, Array[Long])]

  def clearClfCache(): Unit = clfCache.clear()

  /** Train the bucket weights: `clfRounds` batch-perceptron rounds — each
    * round one broadcast-scored misclassification pass, ONE partial-
    * aggregating (bucket, grad) shuffle, and a ≤ B-row collect feeding the
    * next round's broadcast (the Lloyd/C59 round discipline: only slim
    * aggregates ever reach the driver). Weights persist as a StoreFp model
    * blob — integers round-trip text exactly, so later sessions adopt the
    * trained classifier bit-for-bit instead of retraining. */
  def trainClassifier(spark: SparkSession, sfDir: String): Array[Long] = {
    val tag = graft.Tables.fingerprint(sfDir, "documents") +
      s":b$clfBuckets:r$clfRounds"
    clfCache.get(sfDir).filter(_._1 == tag).map(_._2).getOrElse(this.synchronized {
      clfCache.get(sfDir).filter(_._1 == tag).map(_._2).getOrElse {
        val lines = graft.StoreFp.ensureModel(
          "clf_weights" + sfDir.replaceAll("[^A-Za-z0-9]+", "_"), tag) {
          trainClfUncached(spark, sfDir).zipWithIndex
            .map { case (wt, b) => s"$b $wt" }
        }
        val w = Array.fill(clfBuckets)(0L)
        lines.foreach { ln =>
          val p = ln.split(' '); w(p(0).toInt) = p(1).toLong
        }
        clfCache(sfDir) = (tag, w)
        w
      }
    })
  }

  private def trainClfUncached(spark: SparkSession, sfDir: String): Array[Long] = {
    val feats = clfFeatures(spark, sfDir).localCheckpoint()
    val w = Array.fill(clfBuckets)(0L)
    for (_ <- 1 to clfRounds)
      clfGrad(feats, w).collect()
        .foreach(r => w(r.getInt(0)) += r.getLong(1))
    w
  }

  /** C60 — the registered query: the trained nonzero bucket weights (what a
    * re-pointed C34 gate would broadcast in place of its md5-derived
    * stand-in). Tiny by contract — ≤ B rows. */
  def classifierTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainClassifier(spark, sfDir).zipWithIndex
      .collect { case (wt, b) if wt != 0L => (b, wt) }
      .toSeq.toDF("bucket", "weight")
      .select(col("bucket").cast("int"), col("weight"))
      .orderBy(col("bucket"))
  }

  /** C60's oracle: the full trainer re-derived in SQL — the (doc, bucket)
    * occurrence table once, then per round a LEFT-JOIN score CTE against
    * the previous round's weight table, the misclassified-docs gradient
    * rollup, and a FULL OUTER JOIN weight update. Integer sums everywhere
    * (order-independent), so the compare is exact. Every multiply-
    * referenced CTE is MATERIALIZED (DuckDB re-inlines otherwise). A def
    * (init-order rule). */
  def classifierTrainSql: String = {
    val b = clfBuckets
    val rounds = (1 to clfRounds).map { i =>
      val pw = s"w${i - 1}"
      s"""s$i AS MATERIALIZED (
         | SELECT f.doc_id, f.y, COALESCE(SUM(w.wt), 0) AS score
         | FROM f LEFT JOIN $pw w ON f.bucket = w.bucket
         | GROUP BY f.doc_id, f.y),
         |g$i AS MATERIALIZED (
         | SELECT f.bucket, CAST(SUM(f.y) AS BIGINT) AS g
         | FROM f JOIN s$i s ON f.doc_id = s.doc_id
         | WHERE s.y * s.score <= 0
         | GROUP BY f.bucket),
         |w$i AS MATERIALIZED (
         | SELECT COALESCE(w.bucket, g.bucket) AS bucket,
         |        COALESCE(w.wt, 0) + COALESCE(g.g, 0) AS wt
         | FROM $pw w FULL OUTER JOIN g$i g ON w.bucket = g.bucket)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS MATERIALIZED (
       | SELECT doc_id,
       |  CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
       |  string_split(text, ' ') AS toks
       | FROM documents),
       |f AS MATERIALIZED (
       | SELECT doc_id, y,
       |  CAST(((CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS INT64) AS BIGINT) % $b) + $b) % $b AS INT) AS bucket
       | FROM (SELECT doc_id, y, unnest(toks) AS tok FROM d)),
       |w0 AS (SELECT CAST(NULL AS INT) AS bucket, CAST(NULL AS BIGINT) AS wt WHERE FALSE),
       |$rounds
       |SELECT bucket, CAST(wt AS BIGINT) AS weight
       |FROM w${clfRounds} WHERE wt != 0 ORDER BY bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_train" -> (bpeTrain _),
    "classifier_train" -> (classifierTrain _),
    "text_tfidf" -> (textTfidf _),
    "text_tokens" -> (textTokens _),
    "text_tokens_bpe" -> (textTokensBpe _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_perplexity" -> (textPerplexity _),
    "text_classify" -> (textClassify _),
    "text_gopher" -> (textGopher _))

  val oracles: Map[String, String] = Map(
    "bpe_train" -> bpeTrainSql,
    "classifier_train" -> classifierTrainSql,
    "text_tfidf" -> textTfidfSql,
    "text_tokens" -> textTokensSql,
    "text_tokens_bpe" -> textTokensBpeSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_perplexity" -> textPerplexitySql,
    "text_classify" -> textClassifySql,
    "text_gopher" -> textGopherSql)
}
