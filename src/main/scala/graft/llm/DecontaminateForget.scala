package graft.llm

import graft.catalog.TableDef
import graft.driver.JobRunner
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontamination-driven forget: the third "X-driven forget"
  * composition onto the engine core (beside [[DedupForget]] and
  * [[PiiForget]]). A benchmark corpus arrives; every training document
  * the contamination screens flag LEAVES THE LAKE through ordinary
  * batched Find/Forget jobs ([[DedupForget.forgetIds]]) — audit
  * events, retry budget, idempotent task commits, versioned rewrites
  * and all. "Decontaminate the training set" is thereby the same
  * operation as "forget these ids": no second rewrite path to
  * maintain or to trust.
  *
  * Two complementary screens run over the SAME train/bench sides
  * (both left×right only — within-corpus pairs never enumerated):
  *
  *   - whole-document n-gram Jaccard ([[Dedup.jaccardJoinExact]],
  *     the q34 shape) — catches documents that largely ARE a
  *     benchmark document;
  *   - token-window collision ([[Dedup.ngramOverlapJoin]], the q43
  *     GPT-3 "13-gram" shape) — catches a verbatim benchmark span
  *     pasted into an otherwise-unrelated document, which whole-doc
  *     Jaccard dilutes below any workable threshold.
  *
  * The union of flagged train ids feeds the batched deletion seam;
  * driver memory stays O(batchSize + one range partition) no matter
  * how contaminated the corpus is.
  */
object DecontaminateForget {

  /** Distinct train-side ids flagged by either screen. Pure DataFrame
    * composition — candidates stay bucketed/banded inside the two
    * joins, ids-only from there. */
  def contaminatedIds(train: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String,
                      shingleLen: Int = 16,
                      jaccardThreshold: Double = 0.8,
                      windowTokens: Int = 13,
                      minShared: Int = 1): DataFrame =
    Dedup.jaccardJoinExact(train, bench, idCol, textCol,
        shingleLen, jaccardThreshold)
      .select(col("id_a"))
      .union(Dedup.ngramOverlapJoin(train, bench, idCol, textCol,
          windowTokens, minShared)
        .select(col("id_a")))
      .distinct()

  /** Screen `table` (the training lake) against `bench` and delete
    * every flagged document through bounded per-batch deletion jobs.
    * Returns the folded [[DedupForget.Run]]. */
  def forgetContaminated(spark: SparkSession, jobId: String,
                         table: TableDef, idCol: String, textCol: String,
                         bench: DataFrame,
                         shingleLen: Int = 16,
                         jaccardThreshold: Double = 0.8,
                         windowTokens: Int = 13,
                         minShared: Int = 1,
                         settings: JobSettings = JobSettings(),
                         batchSize: Int = DedupForget.DefaultBatchSize)
      : DedupForget.Run = {
    val train = JobRunner.readTable(spark, table)
    val ids = contaminatedIds(train, bench, idCol, textCol,
      shingleLen, jaccardThreshold, windowTokens, minShared)
    DedupForget.forgetIds(spark, jobId, table, idCol, ids,
      settings, batchSize)
  }
}
