package graft.llm

import graft.catalog.TableDef
import graft.driver.JobRunner
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-driven forget: the LLM-pipeline operators composed back onto
  * the engine's core Find/Forget machinery. A near/exact-duplicate pair
  * frame closes into clusters ([[Dedup.duplicateClusters]]); every
  * cluster member EXCEPT the keeper (the minimum id) becomes a deletion
  * queue item; one ordinary deletion job then rewrites exactly the
  * objects holding those rows — audit events, retry budget, idempotent
  * task commits and all. "Deduplicate the corpus in place" is thereby
  * the same operation as "forget these users": no second rewrite path
  * to maintain or to trust.
  *
  * The queue is driver-side, like the reference's DynamoDB deletion
  * queue (an API-managed entity list): its size is the number of
  * duplicate copies, not the corpus. Above `inSetMaxKeys` the Find
  * phase automatically switches from the native InSet predicate to the
  * broadcast semi-join (the at-scale path the bench times as
  * `find_join_fallback`); for queues beyond driver memory, feed
  * [[losers]] through in batches — each batch is an independent job.
  */
object DedupForget {

  /** Ids to delete: every clustered doc except its cluster's keeper.
    * Distributed — call `.collect()` only at queue-build time. */
  def losers(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs, aCol, bCol)
    clusters.filter(col(aCol) =!= col("cluster_id")).select(col(aCol))
  }

  /** Run one deletion job removing every non-keeper duplicate from the
    * table. Returns the standard [[JobRunner.JobRun]] (events, stats,
    * terminal status).
    *
    * @param pairs pair frame from any dedup operator over `table`
    *              (id columns `aCol`/`bCol` must hold `idCol` values)
    */
  def forgetDuplicates(spark: SparkSession, jobId: String,
                       table: TableDef, idCol: String,
                       pairs: DataFrame,
                       aCol: String = "id_a", bCol: String = "id_b",
                       settings: JobSettings = JobSettings())
      : JobRunner.JobRun = {
    val ids = losers(pairs, aCol, bCol).collect().map(_.get(0).toString)
    val queue = ids.toSeq.sorted.map(id =>
      DeletionQueueItem(s"dedup-$id", MatchId.Simple(id)))
    val mapper = DataMapper(s"$jobId-m", table.name, Seq(idCol),
      format = table.format)
    JobRunner.run(spark, jobId, Seq(mapper -> table), queue,
      settings = settings)
  }
}
