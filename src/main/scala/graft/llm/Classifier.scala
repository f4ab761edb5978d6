package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the fastText-style linear classifier
  * every large pretraining pipeline runs after the rule-based pass
  * (CCNet, GPT-3's "looks like the reference corpus" filter): learn a
  * linear scorer from weak labels (here: distilled from the
  * [[TextStats.qualityKeep]] rule, the standard bootstrap), then score
  * the whole corpus with a pure projection.
  *
  * Everything is integer micro-units end to end, for the same reason
  * the LM family is ([[TextStats.unigramSurprisal]]): per-row float
  * work (the sigmoid) is rounded to a micro-unit Long BEFORE any
  * aggregation, so every distributed sum is a Long sum — associative,
  * commutative, independent of partition order — and training is
  * bit-deterministic for a fixed JVM. The learned weights fold to
  * literals, so scoring (and its DuckDB oracle replay) never touches a
  * float at all.
  *
  * Engine shape:
  *  - '''train''': the feature frame is computed ONCE and cached; each
  *    of the `iters` epochs is ONE aggregation with map-side partials
  *    (a k+1-column sum — bytes per partition), nothing else moves.
  *    At 100 TB you train on a bounded deterministic sample
  *    ([[Sampling.deterministicSample]]) and score the full corpus —
  *    the epoch cost is O(sample), the scoring cost one codegen'd
  *    projection over the scan.
  *  - '''score''': shuffle-free narrow projection (plan-asserted in
  *    the spec) — composes with any scan.
  *
  * Reference scope: the reference engine (awslabs/amazon-s3-find-and-
  * forget) has no model-based scoring; this is LLM-brief surface on
  * the `documents` table, after Joulin 2016 (fastText) / Wenzek 2019
  * (CCNet) as public statements.
  */
object Classifier {

  /** A trained linear model: one micro-unit weight per feature of
    * [[featureColumns]], index 0 the bias. real weight = micro/1e6. */
  final case class Model(weightsMicro: IndexedSeq[Long]) {
    require(weightsMicro.size == FeatureNames.size,
      s"expected ${FeatureNames.size} weights, got ${weightsMicro.size}")
  }

  /** The fixed surface-feature family, replicated exactly (integer
    * semantics) by [[featureSqlExprs]]: bias, token count, distinct
    * token count, character count, stopword count. */
  val FeatureNames: Seq[String] =
    Seq("bias", "n_tokens", "n_distinct", "n_chars", "n_stop")

  private def toks(text: Column): Column =
    filter(TextStats.tokens(text), t => length(t) > 0)

  /** The feature vector as Long columns — shared verbatim by train
    * and score so the two can never drift. sizeOrNull, not size: the
    * DuckDB replay reads NULL features for a null text (len(NULL) is
    * NULL), and legacy `size(NULL) = -1` would instead feed the fit a
    * phantom row of −1 counts on an ANSI-off cluster. */
  def featureColumns(text: Column): Seq[Column] = Seq(
    lit(1L),
    TextStats.sizeOrNull(toks(text)).cast("long"),
    TextStats.sizeOrNull(array_distinct(toks(text))).cast("long"),
    length(text).cast("long"),
    TextStats.sizeOrNull(filter(toks(text), t => t.isin(
      TextStats.EnglishStopwords.map(_.asInstanceOf[Any]): _*)))
      .cast("long"))

  /** The SAME features as DuckDB SQL expressions over `textExpr` —
    * all-BIGINT, list_filter/list_distinct mirror the Column
    * filter/array_distinct counts exactly. */
  def featureSqlExprs(textExpr: String): Seq[String] = {
    val t = s"list_filter(string_split($textExpr, ' '), x -> x <> '')"
    val stop = TextStats.EnglishStopwords
      .map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    Seq(
      "CAST(1 AS BIGINT)",
      s"CAST(len($t) AS BIGINT)",
      s"CAST(len(list_distinct($t)) AS BIGINT)",
      s"CAST(length($textExpr) AS BIGINT)",
      s"CAST(len(list_filter($t, x -> x IN ($stop))) AS BIGINT)")
  }

  /** Fit by full-batch PRECONDITIONED gradient descent on the logistic
    * loss, from zero weights: each feature's step divides by Sⱼ = Σfⱼ²
    * (4/Sⱼ·n bounds the Hessian diagonal, since p(1−p) ≤ 1/4), so the
    * update is scale-invariant across raw integer features — bias at 1
    * and char-count at 400 condition identically, where vanilla GD
    * crawls on the small coordinates. Step = lrNum/lrDen of that
    * bound-Newton step.
    *
    * Deterministic: the only float op is the per-row sigmoid (a pure
    * function of the Long margin, rounded straight back to
    * micro-units), so gradients are order-independent Long sums and
    * two fits on the same data are bit-identical. `labelCol` is any
    * boolean Column over `df`'s rows (the gate distills
    * [[TextStats.qualityKeep]]).
    *
    * Overflow bounds (all Long): per-row |residual| ≤ 1e6 and features
    * ≤ ~1e6 for real documents, so a gradient term is ≤ 1e12 and the
    * sum safe to ~9e6 rows per 9.2e18 headroom per 1e12 — train on a
    * bounded sample at scale, which is what you want anyway. */
  def train(df: DataFrame, textCol: String, labelCol: Column,
            iters: Int = 60, lrNum: Long = 1, lrDen: Long = 2): Model = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrNum >= 1 && lrDen >= 1, "learning rate must be positive")
    val k = FeatureNames.size
    // ONE codegen'd corpus pass extracts the integer feature rows
    // (row(0) = y·1e6, row(1..k) = features); epochs then run as
    // treeAggregate jobs over the cached rows — the MLlib GD shape.
    // The per-epoch DataFrame alternative re-analyzes and re-codegens
    // the margin expression every epoch (the weights are folded
    // literals), costing ~130 ms/epoch of fixed overhead at ANY data
    // size; a closure epoch on cached rows is ~10 ms. Long sums stay
    // associative and commutative, so the fit is exactly as
    // partition-order-independent as the aggregation it replaces.
    // A row with a null text or label is EXCLUDED from the fit
    // entirely (features, preconditioner, and n). This is a deliberate
    // semantics choice, not a replication of the former expression
    // epochs: those let the never-null lit(1L) bias column of such a
    // row leak into S_0 while every other term of the row vanished as
    // a null — a phantom half-sample. Whole-row exclusion is the
    // coherent contract (NullToleranceSpec pins fit-without-null-row
    // ≡ fit-with), and fits on null-free corpora are bit-identical to
    // the former epochs either way.
    val feat = df.select(
      (labelCol.cast("long") * lit(1000000L)).as("_ymicro") +:
        featureColumns(col(textCol)).zipWithIndex
          .map { case (c, j) => c.as(s"_f$j") }: _*)
      .rdd.flatMap { r =>
        var anyNull = false
        var j = 0
        while (j <= k) { if (r.isNullAt(j)) anyNull = true; j += 1 }
        if (anyNull) Iterator.empty
        else {
          val a = new Array[Long](k + 1)
          j = 0
          while (j <= k) { a(j) = r.getLong(j); j += 1 }
          Iterator.single(a)
        }
      }.persist()
    try {
      // one pass for n and the preconditioner Sⱼ = Σ fⱼ²
      val (n, s) = feat.treeAggregate((0L, new Array[Long](k)))(
        seqOp = { case ((cnt, sq), row) =>
          var j = 0
          while (j < k) { sq(j) += row(j + 1) * row(j + 1); j += 1 }
          (cnt + 1L, sq)
        },
        combOp = { case ((ca, sa), (cb, sb)) =>
          var j = 0
          while (j < k) { sa(j) += sb(j); j += 1 }
          (ca + cb, sa)
        })
      require(n > 0, "training frame is empty — cannot fit a classifier")
      for (j <- 0 until k) s(j) = math.max(1L, s(j))
      val w = Array.fill(k)(0L)
      for (_ <- 1 to iters) {
        val wCur = w.clone() // stable closure capture for this epoch
        val g = feat.treeAggregate(new Array[Long](k))(
          seqOp = (acc, row) => {
            var m = 0L
            var j = 0
            while (j < k) { m += row(j + 1) * wCur(j); j += 1 }
            val p = 1.0 / (1.0 + math.exp(-m.toDouble / 1e6))
            // Spark round(double) semantics: decimal-string BigDecimal,
            // HALF_UP — keeps the fit bit-identical to the former
            // expression epoch (round(p·1e6) is non-negative, but the
            // exact tie handling must match)
            val r = java.math.BigDecimal.valueOf(p * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .longValue() - row(0)
            j = 0
            while (j < k) { acc(j) += r * row(j + 1); j += 1 }
            acc
          },
          combOp = (a, b) => {
            var j = 0
            while (j < k) { a(j) += b(j); j += 1 }
            a
          })
        // Δwⱼ(micro) = −lr·4·Gⱼ/Sⱼ  (Gⱼ already carries the 1e6 scale)
        for (j <- 0 until k)
          w(j) -= (lrNum * 4L * g(j)) / (lrDen * s(j))
      }
      Model(w.toIndexedSeq)
    } finally { feat.unpersist(); () }
  }

  /** Score every document: `margin_micro` = Σ wⱼ·fⱼ (monotone in the
    * model probability — threshold/rank in micro-units, never compute
    * the sigmoid) and `keep_pred` = 1 iff the margin is positive
    * (p > 0.5). Pure integer projection, no shuffle. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val margin = featureColumns(col(textCol)).zip(model.weightsMicro)
      .map { case (f, wj) => f * lit(wj) }.reduce(_ + _)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), margin.as("margin_micro"),
        // when/otherwise, not a bare cast: a null-text doc has a NULL
        // margin, and the oracle's CASE WHEN dot > 0 THEN 1 ELSE 0
        // maps that NULL to 0 — (NULL > 0).cast("int") would read
        // NULL and hash-diverge from the replay on such a row
        when(margin > 0, lit(1)).otherwise(lit(0)).as("keep_pred"))
  }

  /** DuckDB replay of [[score]] from the weight literals — the same
    * all-BIGINT dot product over [[featureSqlExprs]]. */
  def scoreOracleSql(model: Model, table: String = "documents",
                     idCol: String = "doc_id",
                     textCol: String = "text"): String = {
    val dot = featureSqlExprs(textCol).zip(model.weightsMicro)
      .map { case (f, wj) => s"CAST($wj AS BIGINT) * $f" }
      .mkString(" + ")
    s"""SELECT $idCol, $dot AS margin_micro,
      | CASE WHEN $dot > 0 THEN 1 ELSE 0 END AS keep_pred
      | FROM $table WHERE $idCol IS NOT NULL""".stripMargin
      .replace("\n", " ")
  }
}
