package graft

/** Empty-corpus tolerance sweep (★r18) — the third proactive
  * robustness class, after the null-text sweep (NullToleranceSpec)
  * and the ANSI-parity sweep (AnsiParitySpec).
  *
  * At 100 TB a zero-row input is not an edge case: partition pruning,
  * a selective Find predicate, a tenant with no data yet, or a fully
  * forgotten prefix all hand an operator an EMPTY frame with a valid
  * schema. The reference's operators tolerate this everywhere (an
  * Athena query over an empty partition returns zero rows; a Step
  * Functions run over an empty manifest completes with zero objects).
  *
  * Pinned two-sided contract, every gate query against a corpus where
  * EVERY table has its production schema and ZERO rows:
  *
  *  - TRANSFORM / SEARCH / INDEX / AUDIT / SAMPLING operators return
  *    normally — an empty result or a scalar row whose aggregates are
  *    zero/NULL. No NPE, no `NoSuchElementException` on a `.head` of
  *    nothing, no divide-by-zero, no schema-inference crash, no
  *    streaming-gate hang. This includes the corpus-derived samplers
  *    (PPS with zero total weight, quota maps learned from an empty
  *    corpus, DSIR targets with no strata): their SQL oracles produce
  *    the empty frame on the same empty tables, so the operators do
  *    too — fixed in this round's sweep (systematicPps,
  *    capSampleQuotas, dsirScoreStratified, and the q21 staged read
  *    now taking the CATALOG's declared schema instead of file
  *    inference, which has nothing to infer from on zero files).
  *
  *  - MODEL FITS fail LOUDLY with a documented
  *    `IllegalArgumentException` naming the reason. Deliberate: an
  *    empty training frame at 100 TB almost always means a
  *    mis-pointed path or an over-eager upstream filter, and a
  *    silently-empty model (0 centroids, 0 merges, empty codebooks)
  *    flowing into a week of downstream serving is strictly worse
  *    than stopping the pipeline at the fit. The allowlist below pins
  *    EXACTLY which entries are in this class (set equality, both
  *    directions), so a new graceless failure can never hide inside
  *    the allowed class and a fit quietly going silent gets flagged
  *    too.
  */
class EmptyInputSpec extends SparkSpec with SweepHarness {

  /** A clone of sf0.001 where every table keeps its exact schema and
    * holds zero rows (limit(0) preserves the parquet footer schema,
    * including events.ts's physical type, through the write). */
  private lazy val emptyDir: String =
    cloneCorpus("empty-sf")((_, base) => base.limit(0))

  /** The fit-class entries whose gate path TRAINS a model on (or
    * derives its query terms from) the corpus — on an empty corpus
    * each must raise a loud, documented IllegalArgumentException:
    * k-means (q57 and its consumers q58/q61), IVF coarse centroids
    * (q30/q56), PQ/IVF-PQ codebooks (q79–q84), the unigram/bigram LM
    * fits (q88–q90), the quality classifier fit (q91), and the
    * searches whose term/bigram arguments are derived from corpus
    * statistics that don't exist (q75/q77/q86/q87/q98). */
  private val loudFits: Set[String] = Set(
    "q30_ann_ivf", "q56_ann_autotune", "q57_kmeans", "q58_semantic_dedup",
    "q61_mixture_matrix", "q75_bm25", "q77_phrase_search", "q79_pq_encode",
    "q80_pq_search", "q81_ivfpq_encode", "q82_ivfpq_search",
    "q83_pq_refined_tuned", "q84_ivfpq_refined_tuned", "q86_phrase_indexed",
    "q87_proximity_search", "q88_unigram_surprisal", "q89_bigram_surprisal",
    "q90_moore_lewis", "q91_quality_classifier", "q98_hybrid_rrf")

  test("every gate query tolerates a zero-row corpus: transforms " +
    "return empty, fits fail loudly — allowlist pinned exactly",
    Sweeps) {
    sweepGate(emptyDir, "zero-row", loudFits)
  }

  /** A clone of sf0.001 where every table holds exactly ONE row —
    * the fewer-points-than-k shape (k-means k=8 on 1 vector, PQ
    * ksub=8 on 1 training point, IVF-PQ nlist > n): at 100 TB a rare
    * stratum or freshly-onboarded tenant hands the fits exactly
    * this. */
  private lazy val oneRowDir: String =
    cloneCorpus("onerow-sf")((_, base) => base.limit(1))

  /** The one-row loud set is a strict SUBSET of the zero-row one:
    * k-means/IVF degrade to fewer-than-k centroids gracefully, the
    * LM/classifier fits have one document of signal, and the
    * phrase/bigram derivations find a bigram in one text — while the
    * PQ/IVF-PQ codebook fits still require n >= seed centroids (their
    * documented contract) and Moore-Lewis still needs a non-empty
    * background split. q56 (the recall-driven IVF knob walk) is the
    * one entry this sweep FIXED: a 1-row corpus has no non-self
    * neighbors, so the tuning ground truth is empty and min(recall)
    * is NULL — vacuously at target now, was ROW_VALUE_IS_NULL. */
  private val loudFitsOneRow: Set[String] = Set(
    "q75_bm25", "q79_pq_encode", "q80_pq_search", "q81_ivfpq_encode",
    "q82_ivfpq_search", "q83_pq_refined_tuned", "q84_ivfpq_refined_tuned",
    "q87_proximity_search", "q90_moore_lewis", "q98_hybrid_rrf")

  test("every gate query tolerates a ONE-row corpus (fewer points " +
    "than k): fits degrade or fail loudly — allowlist pinned exactly",
    Sweeps) {
    sweepGate(oneRowDir, "one-row", loudFitsOneRow)
  }
}
