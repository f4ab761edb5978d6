package graft.streaming

import graft.llm.{Sampling, TextStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of the SELECTION-side models over a STREAM
  * — the monitoring half of [[Sampling.temperatureQuotas]] and
  * [[TextStats.dsirBucketLogProbs]], the way [[StreamingLm]] is the
  * perplexity filter's: keep the per-stratum row counts and the
  * hashed-bigram DSIR bucket counts current over an unbounded document
  * feed, and rebuild the (literal-sized) quota table / bucket LM from
  * a snapshot on demand. A production mixture controller wants exactly
  * this split: the counts refresh continuously, selection always runs
  * against a pinned snapshot.
  *
  * Both maintained surfaces are plain streaming aggregations with
  * BOUNDED state — |strata| rows and `buckets` rows respectively
  * (corpus-property cardinalities, not stream-length ones; the hashed
  * feature space is what bounds the DSIR side, the same reason the
  * batch model is O(buckets)). Rebuilds delegate to the SAME driver
  * folds the batch learners use ([[Sampling.temperatureQuotas]],
  * [[TextStats.dsirLogProbsFromCounts]]), so the spec's differential —
  * snapshot rebuild == batch learner over the rows seen so far — pins
  * both the count convergence and the shared arithmetic.
  */
object StreamingMix {

  /** Continuously-maintained per-stratum row counts (`stratum`, `n`)
    * — [[Sampling.temperatureRebalance]]'s counts aggregation as a
    * streaming query in complete mode; state bounded at |strata|. */
  def stratumCounts(stream: DataFrame, strataCol: String): DataFrame =
    stream.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n"))

  /** Continuously-maintained DSIR bucket counts (`bucket`, `n`) over
    * the stream's hashed `n`-gram features — the batch learner's
    * aggregation ([[TextStats.dsirBucketLogProbs]]) with the same
    * tokenization, gram build, and md5 bucket arithmetic; state
    * bounded at `buckets` rows. */
  def dsirBucketCounts(stream: DataFrame, textCol: String,
                       buckets: Int, n: Int = 2): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    stream
      .select(filter(TextStats.tokens(col(textCol)),
        t => length(t) > 0).as("_ts"))
      .select(explode(TextStats.gramsOf(col("_ts"), n)).as("_g"))
      .groupBy(TextStats.dsirBucket(col("_g"), buckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rebuild temperature quotas from a counts snapshot — the batch
    * fold verbatim. */
  def quotasFromCounts(counts: Seq[(String, Long)], alpha: Double,
                       budget: Long): Map[String, Int] =
    Sampling.temperatureQuotas(counts.toMap, alpha, budget)

  /** Rebuild a DSIR bucket LM from a counts snapshot — the batch
    * smoothing fold verbatim. */
  def dsirFromCounts(counts: Seq[(Int, Long)], buckets: Int)
      : IndexedSeq[Long] =
    TextStats.dsirLogProbsFromCounts(counts.toMap, buckets)
}
