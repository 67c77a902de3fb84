package graft

/** The round-12 single-eval rewrite's correctness contract, pinned in-suite:
  * every entry point that moved its output sort BELOW the expensive
  * projection (Tables.loadSorted / sorted media tables / sort-between-join-
  * and-cut) must produce rows IDENTICAL — values AND order — to the classic
  * `project then orderBy` form. The rewrite's argument is that
  * deterministic per-row projections, filters, and in-key-order fan-outs
  * preserve a sort established upstream; this spec is that argument as a
  * regression test, so a future edit that breaks order preservation (a
  * fan-out emitting out of sub-key order, a projection that stops being
  * per-row, a join strategy change under a pre-sorted input) fails HERE
  * with a named query instead of as a driver-side oracle hash mismatch.
  * (PlanGateSpec's aboveSortMarker pins the PLAN shape — kernel above the
  * range exchange; this pins the SEMANTICS.) */
class SortedEntrySpec extends SparkSpec {

  /** The rewired entry's rows vs the SAME rows re-sorted on the DRIVER by
    * the declared keys (numeric, unique per the oracle discipline — the
    * re-sort is total). Driver-side deliberately: re-sorting through
    * Catalyst could be ELIMINATED as redundant (EliminateSorts) and turn
    * the check vacuous; a Scala sort cannot be optimized away. Equality of
    * the ordered sequences proves the entry's emission order IS the
    * declared key order. */
  private def pinned(name: String, keys: String*): Unit =
    test(s"sorted entry point $name emits exactly the project-then-sort rows") {
      val entry = SparkEntry.queries(name)(spark, sfDir)
      val collected = entry.collect().toSeq
      assert(collected.nonEmpty, s"$name returned no rows on the fixture")
      val idx = keys.map(entry.schema.fieldIndex)
      def keyOf(r: org.apache.spark.sql.Row): Seq[Long] =
        idx.map(i => r.get(i).asInstanceOf[Number].longValue)
      val got = collected.map(_.toSeq)
      val classic = collected.sortBy(keyOf)(
        Ordering.Implicits.seqOrdering[Seq, Long]).map(_.toSeq)
      assert(got == classic,
        s"$name: pre-sorted entry order diverged from a driver re-sort " +
          s"on (${keys.mkString(", ")})")
    }

  // the pure-map kernel family (Tables.loadSorted inputs)
  pinned("text_tokens", "doc_id")
  pinned("text_tokens_bpe", "doc_id")
  pinned("text_quality", "doc_id")
  pinned("text_langid", "doc_id")
  pinned("text_fingerprint", "doc_id")
  pinned("text_classify", "doc_id")
  pinned("text_perplexity", "doc_id")
  pinned("text_gopher", "doc_id")
  pinned("text_repetition", "doc_id")
  pinned("text_topgram", "doc_id")
  pinned("text_redact", "doc_id")
  pinned("corpus_split", "doc_id")
  pinned("embed_quantize", "vec_id")
  // fan-outs: the Generate/flatMap must emit the sub-key ascending
  pinned("seq_slice", "doc_id", "slice_id")
  pinned("mm_frame_sample", "media_id", "frame_idx")
  pinned("mm_resize", "doc_id", "ty", "tx")
  // decode pipelines (sorted media tables through the codec seam)
  pinned("mm_pipeline", "media_id")
  pinned("mm_decode_png", "media_id")
  pinned("mm_decode_wav", "media_id")
  // the substring cuts (sort between mark join and cut projection)
  pinned("dedup_substr", "doc_id")
  pinned("decontam_substr", "doc_id")
  pinned("dedup_lines", "doc_id")
}
