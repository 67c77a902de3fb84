package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token-fingerprint kernel shared by the interpreted and
  * generated paths of [[TokenFingerprint]]. Semantics are EXACTLY the
  * composed form it replaces (TextAnalysis.textFingerprint's
  * `aggregate(split(text,' '), 0, (acc,t) -> (acc*31 + hexHash(t)) % 1e9+7)`)
  * and its DuckDB oracle:
  *   - tokens are single-space splits with limit -1 (interior AND trailing
  *     empty tokens participate, like Spark's `split`);
  *   - per-token hash = first 4 md5 digest bytes as an unsigned 32-bit value
  *     (identical to parsing the first 8 lowercase hex chars);
  *   - left-to-right polynomial fold, 31 multiplier, mod 1e9+7.
  */
object FingerprintHelper {
  private val Mod = 1000000007L

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    val digest = md.get()
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        digest.reset()
        digest.update(bytes, start, i - start)
        val d = digest.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        acc = (acc * 31 + h) % Mod
        start = i + 1
      }
      i += 1
    }
    acc
  }

  /** Hashing-trick linear-model pass for [[TokenWeightSum]] (C34): each
    * token's weight is derived from its hash — w(t) = (h(t) mod 1001) − 500,
    * an integer in [−500, 500] — and the document score is the exact BIGINT
    * sum of its token weights. Same tokenization and per-token hash as
    * [[fingerprint]] (single-space splits, empties included; first 4 md5
    * bytes unsigned), so the DuckDB oracle reproduces every weight. The
    * byte-walk is deliberately duplicated from [[fingerprint]] rather than
    * folded through a shared higher-order helper — these are the two hottest
    * generated kernels and the fold-free loops keep them trivially JIT-
    * inlinable; the lockstep risk is pinned by FunctionsSpec, which checks
    * BOTH kernels against composed HOF forms that share one hexHash
    * definition (a tokenization fork in either loop fails its spec). The
    * hash-derived table stands in for trained fastText-style weights: in
    * production the md5→bucket step is identical and only the bucket→weight
    * array changes (a broadcast literal), so the kernel's shape — one fused
    * pass, no token explode, no shuffle — is the production shape. */
  def weightSum(s: UTF8String): Long = {
    val bytes = s.getBytes
    val digest = md.get()
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        digest.reset()
        digest.update(bytes, start, i - start)
        val d = digest.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        acc += h % 1001L - 500L
        start = i + 1
      }
      i += 1
    }
    acc
  }
}

/** Token-membership kernel for [[StopwordHits]]: one pass over the document
  * bytes, counting tokens (single-space splits, empties included — the same
  * tokenization as `explode(split(text, ' '))`) that appear in the dictionary.
  * Multiplicity counts, exactly like the `isin` + sum aggregation it
  * replaces. */
object StopwordKernel {
  def hits(s: UTF8String, dict: java.util.HashSet[UTF8String]): Long = {
    val bytes = s.getBytes
    var n = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (dict.contains(UTF8String.fromBytes(bytes, start, i - start))) n += 1
        start = i + 1
      }
      i += 1
    }
    n
  }
}

/** Per-document stopword-hit count as ONE projected expression — the
  * shuffle-free form of language-ID scoring. The composed form explodes every
  * token into a row and aggregates hits back per document: a corpus-sized
  * Generate plus the plan's only Exchange, paid once per dictionary-set scan.
  * This expression keeps scoring inside the scan's whole-stage codegen (the
  * dictionary rides along as a plan reference object), so a 100 TB language-ID
  * pass is a pure map with NO shuffle at all. */
case class StopwordHits(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val dict: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_stop_hits expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_stop_hits"

  override protected def nullSafeEval(input: Any): Any =
    StopwordKernel.hits(input.asInstanceOf[UTF8String], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("stopDict", dict,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StopwordKernel.hits($c, $dictRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Token-start offsets of a document's single-space split (empties
  * included) — the ONE tokenizer every byte-walking kernel shares. Returns
  * (starts, count); starts(0)=0, starts(i) = byte after the (i-1)th space.
  * Factored so a domain tweak (or bounds fix) can never fork the gram
  * domain between kernels the oracles pin. */
private[functions] object TokenStarts {
  def of(bytes: Array[Byte]): (Array[Int], Int) = {
    var starts = new Array[Int](16)
    var n = 1 // starts(0) = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        if (n == starts.length) starts = java.util.Arrays.copyOf(starts, n * 2)
        starts(n) = i + 1
        n += 1
      }
      i += 1
    }
    (starts, n)
  }
}

/** Distinct-bigram kernel for [[DistinctBigrams]]: a word bigram is a
  * CONTIGUOUS byte span of the document (from one token's first byte to the
  * next token's last), so distinct counting needs no string assembly at all —
  * spans wrap the original bytes as UTF8String views in a HashSet. Same
  * bigram domain as `ngramFlat(_, 2)`: single-space splits, empties included,
  * sub-2-token documents have no bigrams. */
object BigramKernel {
  def distinct(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (starts, nStarts) = TokenStarts.of(bytes)
    if (nStarts < 2) return 0L
    val seen = new java.util.HashSet[UTF8String]()
    var t = 0
    while (t < nStarts - 1) {
      // span: token t's first byte .. token t+1's last byte
      val from = starts(t)
      val until = if (t + 2 < nStarts) starts(t + 2) - 1 else bytes.length
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      t += 1
    }
    seen.size.toLong
  }
}

/** Per-document distinct word-bigram count as a projected native expression —
  * the shuffle-free core of the C25 repetition ratio. A bigram never crosses
  * a document boundary, so the distinct count is row-local: computing it via
  * explode + two-phase distinct aggregation shuffles every bigram of the
  * corpus to answer a question each row can answer alone. With this kernel
  * the repetition score is a pure map. */
case class DistinctBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_bigrams expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_distinct_bigrams"

  override protected def nullSafeEval(input: Any): Any =
    BigramKernel.distinct(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramKernel.distinct($c)")

  override protected def withNewChildInternal(newChild: Expression): DistinctBigrams =
    copy(child = newChild)
}

/** Gopher-rule kernel for [[GopherStats]]: ONE byte pass computing the word
  * and line shape stats the Rae et al. 2021 repetition-free quality rules
  * need — word count (single-space splits, empties included: the corpus-wide
  * token convention), words containing an ASCII letter, line count (newline
  * splits), lines opening with a "- "/"* " bullet, lines closing with "...".
  * All probes are ASCII bytes, which never occur inside a UTF-8 multibyte
  * sequence, so byte scanning is multibyte-safe; a newline is NOT a word
  * separator (it stays inside the surrounding word), exactly matching the
  * split-on-space oracle semantics. */
object GopherKernel {
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var nWords = 1L; var nAlpha = 0L
    var nLines = 1L; var nBullet = 0L; var nEllipsis = 0L
    var wordHasAlpha = false
    var lineStart = 0
    var i = 0
    def closeLine(end: Int): Unit = {
      if (end - lineStart >= 2 && bytes(lineStart + 1) == ' ' &&
          (bytes(lineStart) == '-' || bytes(lineStart) == '*')) nBullet += 1
      if (end - lineStart >= 3 && bytes(end - 1) == '.' &&
          bytes(end - 2) == '.' && bytes(end - 3) == '.') nEllipsis += 1
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        if (wordHasAlpha) nAlpha += 1
        wordHasAlpha = false
        nWords += 1
      } else if (b == '\n') {
        closeLine(i)
        lineStart = i + 1
        nLines += 1
      } else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        wordHasAlpha = true
      }
      i += 1
    }
    if (wordHasAlpha) nAlpha += 1
    closeLine(bytes.length)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, nAlpha, nLines, nBullet, nEllipsis))
  }
}

/** Per-document Gopher word/line shape stats as ONE projected struct
  * expression — the C47 quality-rule bundle stays a zero-shuffle pure map
  * (a split-explode or HOF-lambda form would leave codegen and, for the
  * line rules, allocate every line as a string; this allocates nothing). */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gopher_stats expects a string column, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_alpha_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_bullet_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_ellipsis_lines", LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

/** Gram-set kernel for [[GramSetStats]]: one pass over a document's DISTINCT
  * word n-grams (contiguous byte spans, single-space splits with empties —
  * the same domain as PipelineOps.gramSet, including the <n-token whole-text
  * fallback), counting the total and how many are members of a reference
  * gram set. The decontamination decision of C15 made row-local: with the
  * eval-suite grams riding along as a plan reference, a streaming gate needs
  * NO per-doc aggregation and NO join — the property that keeps the tier
  * stateless. */
object GramSetKernel {
  def stats(s: UTF8String, n: Int,
    dict: java.util.HashSet[UTF8String]): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val (starts, nStarts) = TokenStarts.of(bytes)
    val seen = new java.util.HashSet[UTF8String]()
    var hits = 0L
    def add(g: UTF8String): Unit =
      if (seen.add(g) && dict.contains(g)) hits += 1
    if (nStarts < n) add(s)
    else {
      var t = 0
      while (t <= nStarts - n) {
        val until = if (t + n < nStarts) starts(t + n) - 1 else bytes.length
        add(UTF8String.fromBytes(bytes, starts(t), until - starts(t)))
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](seen.size.toLong, hits))
  }
}

/** Per-document distinct-n-gram count + reference-set hit count as ONE
  * projected struct expression. The gram dictionary travels as a
  * newline-delimited blob (grams contain spaces; a gram may never contain a
  * newline — the builder enforces it) and is parsed into a hash set once per
  * plan, not per row. */
case class GramSetStats(child: Expression, n: Int, dictBlob: String)
  extends UnaryExpression {

  @transient private lazy val dict: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    // an empty blob is an EMPTY dictionary — "".split yields Array(""),
    // which would otherwise plant the empty-string gram and wrongly match
    // empty documents' whole-text fallback
    if (dictBlob.nonEmpty)
      dictBlob.split("\n", -1).foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hits expects a string column, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_grams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_contaminated", LongType, nullable = false)))
  override def prettyName: String = "graft_gram_hits"

  override protected def nullSafeEval(input: Any): Any =
    GramSetKernel.stats(input.asInstanceOf[UTF8String], n, dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("gramDict", dict,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramSetKernel.stats($c, $n, $dictRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSetStats =
    copy(child = newChild)
}

/** Positional-gram kernel for [[GramMarkPositions]]: one pass over a
  * document's word n-grams IN POSITION (contiguous byte spans over the
  * single-space token starts — the byte-level mirror of
  * PipelineOps.posGrams' zipped slices, no whole-text fallback: a <n-token
  * document has no positional gram and is never trimmed), emitting the
  * 0-based token index of every gram that is a member of the reference
  * set, ascending. The C45 mark stage made row-local: with the eval-suite
  * grams riding as a plan reference, the streaming cut tier needs NO
  * owner window, NO join and NO per-doc aggregation — D7's statelessness
  * property extended from the gate decision to the cut itself. */
object GramMarkKernel {
  def marks(s: UTF8String, n: Int,
    dict: java.util.HashSet[UTF8String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val (starts, nStarts) = TokenStarts.of(bytes)
    val out = new java.util.ArrayList[Any]()
    var t = 0
    while (t <= nStarts - n) {
      val until = if (t + n < nStarts) starts(t + n) - 1 else bytes.length
      if (dict.contains(UTF8String.fromBytes(bytes, starts(t), until - starts(t))))
        out.add(t)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Marked positional-gram start indexes as ONE projected array expression —
  * the row-local form of C45's mark join (same dictionary transport as
  * [[GramSetStats]]: a newline-delimited blob parsed once per plan). The
  * output feeds the same row-local cut as the batch operator
  * (PipelineOps.cutFromMarked), so stream and batch share one cut
  * definition by construction. */
case class GramMarkPositions(child: Expression, n: Int, dictBlob: String)
  extends UnaryExpression {

  @transient private lazy val dict: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    // an empty blob is an EMPTY dictionary ("".split would plant the
    // empty-string gram — GramSetStats' rule)
    if (dictBlob.nonEmpty)
      dictBlob.split("\n", -1).foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_marks expects a string column, got $other")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_gram_marks"

  override protected def nullSafeEval(input: Any): Any =
    GramMarkKernel.marks(input.asInstanceOf[UTF8String], n, dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("gramDict", dict,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramMarkKernel.marks($c, $n, $dictRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramMarkPositions =
    copy(child = newChild)
}

/** Top-gram kernel for [[TopGramStats]]: one hashing pass over a document's
  * word bigrams (the SAME contiguous-byte-span domain as [[BigramKernel]]:
  * single-space splits, empties included) producing the two Gopher-family
  * repetition maxima —
  *   - `top_count`: occurrences of the document's most frequent bigram;
  *   - `top_chars`: max over bigrams of count × gram CHAR length (the char
  *     mass the worst repeated gram accounts for).
  * Both are maxima of exact integers, so no tie-break rule is needed for
  * cross-engine determinism (ties collapse under max). Sub-2-token documents
  * have no bigrams → (0, 0); operators filter them out before projecting. */
object TopGramKernel {
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val (starts, nStarts) = TokenStarts.of(bytes)
    var topCount = 0L
    var topChars = 0L
    if (nStarts >= 2) {
      // int[1] counter cells: one box per DISTINCT gram, none per occurrence
      val counts = new java.util.HashMap[UTF8String, Array[Int]]()
      var t = 0
      while (t < nStarts - 1) {
        val from = starts(t)
        val until = if (t + 2 < nStarts) starts(t + 2) - 1 else bytes.length
        val g = UTF8String.fromBytes(bytes, from, until - from)
        val cell = counts.get(g)
        if (cell == null) counts.put(g, Array(1)) else cell(0) += 1
        t += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0).toLong
        if (c > topCount) topCount = c
        val cov = c * e.getKey.numChars()
        if (cov > topChars) topChars = cov
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topCount, topChars))
  }
}

/** Per-document top-bigram statistics as ONE projected struct expression —
  * the shuffle-free core of the C31 top-gram coverage rule (the Gopher
  * "fraction of characters in the most common n-gram" family). Like C25's
  * distinct count, both maxima are row-local; the explode + per-gram count +
  * per-doc max pipeline form shuffles every bigram of the corpus twice to
  * answer them. */
case class TopGramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_top_gram expects a string column, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("top_count", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_chars", LongType, nullable = false)))
  override def prettyName: String = "graft_top_gram"

  override protected def nullSafeEval(input: Any): Any =
    TopGramKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopGramKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TopGramStats =
    copy(child = newChild)
}

/** Count-only kernel for [[BpeTokenCount]]: one byte pass emulating
  * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"))` without
  * materializing a single match — a letters RUN counts once, each digit
  * counts, every other non-space character counts once per CODE POINT
  * (Java regex and RE2 both match negated classes per code point, so a
  * 4-byte astral char is ONE match — spec-pinned against the regex form). */
object BpeKernel {
  def count(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    var inLetters = false
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) {
        val isLetter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        if (isLetter) { if (!inLetters) { n += 1; inLetters = true } }
        else {
          inLetters = false
          if (c != ' ') n += 1 // digit or ascii punct: one match each
        }
        i += 1
      } else {
        inLetters = false
        val len = if (c >= 0xf0) 4 else if (c >= 0xe0) 3 else 2
        n += 1 // one non-space code point = one match
        i += len
      }
    }
    n
  }
}

/** BPE-ish token count as a count-only native expression. The regex form
  * allocates and copies every matched token into an array just to take its
  * length; this walks the bytes once inside whole-stage codegen. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** A REAL byte-pair-encoding merge table for [[BpeMergeCount]]: rank-ordered
  * merge rules applied by the standard greedy loop — per whitespace word,
  * repeatedly find the LOWEST-rank rule whose pair is adjacent in the current
  * symbol sequence and merge every (left-to-right, non-overlapping)
  * occurrence, until no rule applies. This is the actual BPE algorithm
  * (Sennrich et al. 2016): it handles multi-level rules (("t","h") then
  * ("th","e")) and rank competition (("h","e") beating ("t","h") on "the"),
  * both of which the count-only regex emulation (BpeKernel) cannot express —
  * FunctionsSpec pins these against hand-computed fixtures.
  *
  * Built once per (driver plan / deserialized task) from the rule strings and
  * reused across rows. The embedded default vocab is a few rules; a
  * production-size table (GPT-2's 50k merges, ~1 MB) travels to executors
  * through the same Broadcast handoff NearestCentroidBroadcast uses rather
  * than as plan metadata — the seam (this class on the expression) is
  * transport-agnostic. */
final class BpeMergeTable(val rules: Seq[(String, String)]) extends Serializable {
  require(rules.nonEmpty, "BpeMergeTable: empty merge table")
  require(rules.forall { case (a, b) => a.nonEmpty && b.nonEmpty &&
    !a.exists(_.isWhitespace) && !b.exists(_.isWhitespace) },
    "BpeMergeTable: merge symbols must be non-empty and whitespace-free " +
      "(pre-tokenization splits on spaces; a rule could never cross one)")

  // (left, right) -> rank; first rule wins on duplicate pairs, like a merges
  // file read top-down
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    rules.zipWithIndex.foreach { case ((a, b), r) =>
      m.putIfAbsent(a + "\u0000" + b, r)
    }
    m
  }

  /** Greedy BPE token count of ONE word (no spaces). Symbols start as code
    * points (an astral char is one symbol, matching how both engines count
    * characters). */
  def countWord(word: String): Long = {
    if (word.isEmpty) return 0L
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-rank adjacent pair present right now
      var best: Integer = null
      var bestKey: String = null
      var j = 0
      while (j < syms.size - 1) {
        val key = syms.get(j) + "\u0000" + syms.get(j + 1)
        val r = ranks.get(key)
        if (r != null && (best == null || r < best)) { best = r; bestKey = key }
        j += 1
      }
      if (best == null) done = true
      else {
        // merge every left-to-right non-overlapping occurrence of that pair
        val sep = bestKey.indexOf('\u0000')
        val l = bestKey.substring(0, sep); val r = bestKey.substring(sep + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var p = 0
        while (p < syms.size) {
          if (p < syms.size - 1 && syms.get(p) == l && syms.get(p + 1) == r) {
            out.add(l + r); p += 2
          } else { out.add(syms.get(p)); p += 1 }
        }
        syms = out
      }
    }
    syms.size.toLong
  }

  /** Token count of a document: single-space pre-tokenization, greedy BPE
    * per word, summed. Public: called from generated code. */
  def countTokens(s: UTF8String): Long = {
    val text = s.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) total += countWord(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** Token COUNT under a real rank-ordered BPE merge table — the trained-vocab
  * upgrade of [[BpeTokenCount]]'s pre-tokenizer emulation (C10b). The merge
  * table is plan metadata (rank-ordered "left right" string literals through
  * the registry builder, the graft_stop_hits contract); rows never carry it.
  * One generated call per row inside whole-stage codegen; the table compiles
  * to a hash map once per task, not per row. */
case class BpeMergeCount(child: Expression, rules: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val table = new BpeMergeTable(rules)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_merge_count expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_merge_count"

  override protected def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$tbl.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeCount =
    copy(child = newChild)
}

/** Native Catalyst expression for the C11 rolling document fingerprint.
  *
  * Why a custom Expression (SURVEY §3 preference (b)): the composed form runs
  * `aggregate`'s interpreted lambda per token, re-evaluating an md5 + conv +
  * substring expression subtree through non-codegen HOF machinery — ~1.5 µs a
  * token of interpreter overhead around a ~0.2 µs hash. This fuses the split,
  * the digest and the fold into ONE generated call per document (a static
  * kernel invocation inside whole-stage codegen), keeping the bit-exact
  * semantics the DuckDB oracle pins.
  */
case class TokenFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintHelper.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintHelper.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

/** Native Catalyst expression for the C34 hashing-trick classifier score
  * ([[FingerprintHelper.weightSum]]): the same fused one-generated-call shape
  * as [[TokenFingerprint]] — the alternative explode(split)→join-weights→sum
  * form would shuffle the entire tokenized corpus just to add integers that a
  * row-local pass produces for free. */
case class TokenWeightSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_weight expects a string column, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_weight"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintHelper.weightSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintHelper.weightSum($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
}

/** Reinterpret a TIMESTAMP_NTZ wall-clock as the UTC instant with that
  * wall-clock — ZONE-INDEPENDENT BY CONSTRUCTION. No built-in can express
  * this safely: `cast(ntz as timestamp)` reads the wall-clock in the session
  * zone resolved at EXECUTION time (a conf pin at load time doesn't protect a
  * plan executed after a later zone change), and `current_timezone()` folds
  * at ANALYSIS time, so the two can disagree. Internally both types carry
  * microseconds-since-epoch longs — NTZ of the wall-clock, TIMESTAMP of the
  * UTC instant — and "wall-clock == UTC instant" makes those the SAME number,
  * so the kernel is the identity on the physical value; only the type
  * changes. TablesSpec pins the plan-then-rezone-then-run ordering. */
case class NtzAsUtcInstant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ntz_utc expects a timestamp_ntz column, got $other")
  }

  override def dataType: DataType = TimestampType
  override def prettyName: String = "graft_ntz_utc"

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzAsUtcInstant =
    copy(child = newChild)
}

/** The portable MinHash hash family — the SINGLE canonical definition, shared
  * by the DataFrame pipeline (operators.Dedup), this row-local kernel and the
  * generated DuckDB oracles: base = md5-derived 31-bit gram hash, member i =
  * (a_i·x + b_i) mod P with P = 2³¹−1 (products < 2⁶², ANSI-safe). */
object MinHashFamily {
  val P = 2147483647L // 2^31 - 1, Mersenne prime
  val NumHashes = 64
  val (a, b) = {
    val rng = new scala.util.Random(1234)
    val as = Array.fill(NumHashes)(1L + math.floorMod(rng.nextLong(), P - 1))
    val bs = Array.fill(NumHashes)(math.floorMod(rng.nextLong(), P))
    (as, bs)
  }
}

/** One-pass MinHash signature kernel for [[MinHashSignature]]: word 3-grams
  * are CONTIGUOUS byte spans of the document (token t's first byte to token
  * t+2's last — the separator is the same single space the gram string would
  * contain, so no string assembly happens at all); each span is md5'd once
  * and folded into all 64 running minima. Semantics are EXACTLY the
  * explode-gram → groupBy(doc) min-aggregate pipeline (Dedup.sigsOf over
  * gramSet): single-space splits with empties, sub-3-token docs hash the
  * whole text as one gram, duplicate grams are harmless under min. */
object MinHashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def signature(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val a = MinHashFamily.a
    val b = MinHashFamily.b
    val P = MinHashFamily.P
    val bytes = s.getBytes
    val (starts, n) = TokenStarts.of(bytes)
    val mins = Array.fill(a.length)(Long.MaxValue)
    val digest = md.get()
    def addGram(from: Int, until: Int): Unit = {
      digest.reset()
      digest.update(bytes, from, until - from)
      val d = digest.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val x = h % P
      var j = 0
      while (j < a.length) {
        val v = (a(j) * x + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (n < 3) addGram(0, bytes.length)
    else {
      var t = 0
      while (t <= n - 3) {
        val until = if (t + 3 < n) starts(t + 3) - 1 else bytes.length
        addGram(starts(t), until)
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** The full 64-wide MinHash signature as ONE projected native expression —
  * the row-local, shuffle-free form of signature building. The pipeline form
  * (explode grams → groupBy(doc) with 64 min aggregates) shuffles a partial
  * row per document per task and pays a corpus-sized Generate; this kernel
  * computes the identical signature inside the scan's whole-stage codegen,
  * which is also the shape a STREAMING near-dedup needs (no aggregation
  * stage before the keyed state). FunctionsSpec pins exact equality with the
  * pipeline form; dedup_minhash_local shares dedup_minhash's DuckDB oracle. */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects a string column, got $other")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** The embedded bigram LM behind [[GramLmScore]] (C40's model artifact):
  * unigram/bigram counts parsed once per (de)serialized instance from the
  * newline-delimited blob literals (line format `count<SP>token[s]` — tokens
  * are single-space splits, so a bigram key holds exactly one interior
  * space). The hash maps are transient and rebuilt per (de)serialization;
  * the blobs' TRANSPORT is the caller's choice of wrapper — plan literals
  * ([[GramLmScore]], the BpeMergeTable pattern, right for small models) or
  * an executor broadcast ([[GramLmScoreBroadcast]], the codebook route a
  * KenLM-sized CCNet model needs), size-switched in
  * GraftFunctions.lmScoreAuto with bit-identical scores either way. */
final class GramLmModel(uniBlob: String, biBlob: String) extends Serializable {

  @transient private lazy val uni: java.util.HashMap[String, Long] = parse(uniBlob)
  @transient private lazy val bi: java.util.HashMap[String, Long] = parse(biBlob)

  /** Vocabulary size V — the add-one smoothing mass, |distinct ref tokens|. */
  @transient lazy val v: Long = uni.size.toLong

  private def parse(blob: String): java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    if (blob.nonEmpty) blob.split("\n", -1).foreach { line =>
      val sep = line.indexOf(' ')
      require(sep > 0, s"GramLmModel: bad blob line '$line'")
      m.put(line.substring(sep + 1), line.substring(0, sep).toLong)
    }
    m
  }

  /** One fused pass: split on single spaces (limit -1, Spark's `split`
    * convention), then a LEFT-TO-RIGHT fold over adjacent token pairs of
    * the add-one-smoothed INVERSE bigram probability
    * `(c(w1) + V) / (c(w1 w2) + 1)` — each term one double division, the
    * sum a sequential double fold, so the score is bit-identical to the
    * oracle's list_reduce over the same map lookups. Returns
    * struct(n_bigrams, inv_sum); sub-2-token docs return n_bigrams = 0 and
    * sum 0.0 (the operator filters them out of the scored domain). */
  def score(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.split(" ", -1)
    var sum = 0.0
    var i = 0
    while (i < toks.length - 1) {
      val c1 = uni.getOrDefault(toks(i), 0L)
      val c12 = bi.getOrDefault(toks(i) + " " + toks(i + 1), 0L)
      sum += (c1 + v).toDouble / (c12 + 1L).toDouble
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](math.max(toks.length - 1, 0).toLong, sum))
  }
}

/** Native Catalyst expression for the C40 n-gram LM gate (CCNet-style): the
  * per-document likelihood statistic under a reference-corpus bigram model,
  * as ONE fused kernel call per row inside whole-stage codegen — no token
  * explode, no count-table join on the corpus side (the model is the small
  * side and rides with the plan, exactly C34's fused-kernel shape).
  *
  * The statistic is the arithmetic mean INVERSE probability: perplexity's
  * sibling (perplexity is the geometric mean of the same per-gram inverse
  * probabilities). Chosen deliberately: it needs only +, ×, ÷ — all
  * correctly-rounded IEEE ops that DuckDB and the JVM agree on bit-for-bit
  * — where log/exp are NOT correctly rounded in either engine, so a true
  * log-perplexity could never be hash-compared across engines. Same
  * gate semantics: high = the reference LM cannot explain the document. */
case class GramLmScore(child: Expression, uniBlob: String, biBlob: String)
  extends UnaryExpression {

  @transient private lazy val model = new GramLmModel(uniBlob, biBlob)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lm_score expects a string column, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("inv_sum",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "graft_lm_score"

  override protected def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lmModel", model, classOf[GramLmModel].getName)
    defineCodeGen(ctx, ev, c => s"$m.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramLmScore =
    copy(child = newChild)
}

/** EXECUTOR-BROADCAST form of [[GramLmScore]] — identical statistic, model
  * transport swapped from plan-literal blobs to a `Broadcast[GramLmModel]`
  * handle (the [[NearestCentroidBroadcast]] route, which the literal form's
  * scaladoc names as the at-scale path). The generated code pulls the model
  * through `m()` on the serialized expression instance — NOT through
  * `addReferenceObj` on the model itself, which would serialize the count
  * tables back into every task batch and defeat the broadcast; only the
  * tiny handle rides with the plan, and the blobs move once per executor
  * JVM over the torrent protocol. Equality is by broadcast id (one handle
  * per (context, blob content) — GraftFunctions memoizes), so plans over
  * one trained model canonicalize equal exactly like the literal form's
  * value equality. FunctionsSpec pins bit-identical scores between the two
  * transports on a shared fixture. */
case class GramLmScoreBroadcast(child: Expression,
  bc: org.apache.spark.broadcast.Broadcast[GramLmModel])
  extends UnaryExpression {

  @transient private lazy val model: GramLmModel = bc.value

  /** Codegen accessor (public: called from generated Java). */
  def m(): GramLmModel = model

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lm_score_bc expects a string column, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("inv_sum",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "graft_lm_score_bc"

  override protected def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lmBc", this,
      classOf[GramLmScoreBroadcast].getName)
    defineCodeGen(ctx, ev, c => s"$self.m().score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramLmScoreBroadcast =
    copy(child = newChild)
}
