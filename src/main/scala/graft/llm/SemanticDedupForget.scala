package graft.llm

import graft.catalog.TableDef
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic-dedup-driven forget: the fourth "X-driven forget"
  * composition onto the engine core (beside [[DedupForget]],
  * [[PiiForget]] and [[DecontaminateForget]]). Embeddings are computed
  * offline into their own table — the realistic pipeline shape — and
  * [[Clustering.semanticDedup]]'s DOMINATED rows (a lower-id cluster
  * member at cosine ≥ τ exists) leave the DOCUMENT lake through
  * ordinary batched Find/Forget jobs ([[DedupForget.forgetIds]]):
  * audit events, retry budget, idempotent task commits, versioned
  * rewrites and all. "Semantically dedup the corpus" is thereby the
  * same operation as "forget these ids" — no second rewrite path.
  *
  * Scale shape: the dedup decision never leaves the embedding table
  * (in-cluster pairs only, ids-only from there), and the deletion feed
  * holds O(batchSize + one range partition) driver-side regardless of
  * how redundant the corpus is.
  */
object SemanticDedupForget {

  /** Ids [[Clustering.semanticDedup]] would DROP: cluster members with
    * a lower-id member at cosine ≥ τ. One anti-join against the kept
    * set — ids only. */
  def dominatedIds(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, tau: Double,
                   init: Seq[Array[Float]] = Nil): DataFrame =
    embeddings.select(col(idCol))
      .join(
        Clustering.semanticDedup(embeddings, idCol, vecCol, k, iters,
          tau, init).select(col(idCol)),
        Seq(idCol), "left_anti")

  /** Delete every semantically-dominated document from `table` via
    * bounded per-batch deletion jobs. `embIdCol` values must be the
    * lake's `idCol` values (the embedding table's foreign key into the
    * corpus). Returns the folded [[DedupForget.Run]]. */
  def forgetDominated(spark: SparkSession, jobId: String,
                      table: TableDef, idCol: String,
                      embeddings: DataFrame, embIdCol: String,
                      vecCol: String, k: Int, iters: Int, tau: Double,
                      init: Seq[Array[Float]] = Nil,
                      settings: JobSettings = JobSettings(),
                      batchSize: Int = DedupForget.DefaultBatchSize)
      : DedupForget.Run = {
    val ids = dominatedIds(embeddings, embIdCol, vecCol, k, iters, tau,
      init)
    DedupForget.forgetIds(spark, jobId, table, idCol, ids,
      settings, batchSize)
  }
}
