package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand(seed)`-based sampling is NOT reproducible across engines, runs,
  * or even repartitionings (the per-partition generator reseeds by
  * partition index), which breaks the two things a data pipeline needs
  * from a sample: the same subset on every rerun of an experiment, and
  * the ability to recompute the subset membership of one row without the
  * rest of the corpus. Keying the decision on a standard content hash of
  * a stable column gives both — any engine that can md5 a string draws
  * the identical subset.
  */
object Sampling {

  /** Keep a row iff the first 4 hex chars of `md5(key)` sort below the
    * quantized threshold — a map-only, shuffle-free filter; the md5
    * prefix is uniform over [0, 16^4), so the keep rate is
    * `round(fraction * 65536) / 65536` (fraction quantizes to 1/65536
    * steps). Deterministic in the KEY alone: reruns, repartitionings,
    * and other engines (the DuckDB oracle states the same predicate
    * verbatim) select the same rows. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val buckets = math.round(fraction * 65536.0)
    if (buckets >= 65536L) df
    else df.filter(
      substring(md5(col(keyCol).cast("string")), 1, 4) < lit(f"$buckets%04x"))
  }

  /** Per-stratum deterministic sampling: each stratum value draws its
    * own fraction (missing strata keep `defaultFraction`). Same md5
    * predicate as [[deterministicSample]], with the stratum folded into
    * the hash input so the same key can be selected in one stratum and
    * not another. Map-only; the fractions ride a broadcast CASE
    * expression, not a join. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f"))
    def thr(fr: Double) = f"${math.min(65536L, math.round(fr * 65536.0))}%05x"
    val cutoff = fractions.foldLeft(lit(thr(defaultFraction))) {
      case (acc, (k, fr)) =>
        when(col(strataCol).cast("string") === k, lit(thr(fr))).otherwise(acc)
    }
    df.filter(concat(lit("0"),
      substring(md5(concat_ws("#", col(strataCol).cast("string"),
        col(keyCol).cast("string"))), 1, 4)) < cutoff)
  }

  /** Per-stratum CAP sampling — the mixture builder's other half:
    * where [[stratifiedSample]] draws a FRACTION per stratum, this
    * takes EXACTLY `min(n, |stratum|)` rows per stratum ("10k docs per
    * domain"), selected in deterministic md5 order (same
    * `md5(stratum#key)` input as the fraction path, so both sampling
    * modes agree on what "the first rows of a stratum" means; md5
    * ties — practically impossible — break by key).
    *
    * Scale shape: NO per-stratum single-task window. Phase 1 caps each
    * (stratum, input-partition) to its n smallest hashes map-side
    * (groupBy partition id + sorted-slice, the [[Similarity.rankTopK]]
    * two-phase pattern); phase 2 merges ≤ n·P rows per stratum — so a
    * billion-row hot stratum never serializes through one task, which
    * a bare `ROW_NUMBER() OVER (PARTITION BY stratum)` would do.
    *
    * Output: (strataCol, keyCol, `rank` 1..n) — semi-join back on the
    * key for full rows. */
  def capSample(df: DataFrame, keyCol: String, strataCol: String,
                n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val entry = struct(
      md5(concat_ws("#", col(strataCol).cast("string"),
        col(keyCol).cast("string"))).as("h"),
      col(keyCol).as("k"))
    val partial = df
      .groupBy(col(strataCol), spark_partition_id().as("_p"))
      .agg(slice(array_sort(collect_list(entry)), 1, n).as("_top"))
    partial
      .groupBy(col(strataCol))
      .agg(slice(array_sort(flatten(collect_list(col("_top")))), 1, n)
        .as("_top"))
      .select(col(strataCol), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col(strataCol), col("_e.k").as(keyCol),
        (col("_pos") + 1).cast("int").as("rank"))
  }
}
