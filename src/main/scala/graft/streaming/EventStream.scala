package graft.streaming

import graft.jobs.Jobs
import graft.model._
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-Streaming analog of the reference's DynamoDB-stream job
  * processor (SURVEY.md §2.9; reference:
  * backend/lambdas/jobs/stream_processor.py:38-159):
  *
  *   - T1 CDC source — any streaming Dataset[JobEvent] (file source, Kafka,
  *     MemoryStream); non-event records are filtered by type upstream.
  *   - T2 keyed stateful aggregation — `groupByKey(jobId)` +
  *     `mapGroupsWithState`: each micro-batch folds its events (sk-sorted
  *     within the batch, exactly like the reference folds each stream
  *     batch) onto the persisted [[Jobs.JobState]].
  *   - T3 status transition map + terminal lock — [[Jobs.applyEvent]].
  *   - T4 trigger-on-transition — [[needsCleanup]] over each update batch
  *     inside `foreachBatch` (stream_processor.py:54-72: cleanup fires
  *     when a job reaches FORGET_COMPLETED_CLEANUP_IN_PROGRESS).
  *   - T5 watermark cursor — the event feed cursor lives in
  *     [[graft.api.GraftApi.listJobEvents]]; the stream itself is
  *     processing-time, as in the reference.
  *
  * Use `outputMode("update")` when writing the fold.
  */
object EventStream {

  /** Streaming fold: one updated [[Jobs.JobState]] row per job per
    * micro-batch. Works on batch Datasets too (same code path). */
  def foldStream(events: Dataset[JobEvent]): Dataset[Jobs.JobState] =
    events
      .groupByKey(_.jobId)(Encoders.STRING)
      .mapGroupsWithState[Jobs.JobState, Jobs.JobState](
        GroupStateTimeout.NoTimeout) {
        (jobId: String, batch: Iterator[JobEvent],
         state: GroupState[Jobs.JobState]) =>
          val current = state.getOption.getOrElse(Jobs.JobState(jobId))
          val next = batch.toSeq.sortBy(_.sk)
            .foldLeft(current)(Jobs.applyEvent)
          state.update(next)
          next
      }(Encoders.product[Jobs.JobState], Encoders.product[Jobs.JobState])

  /** Jobs whose folded status just reached the cleanup trigger state —
    * evaluate per update batch in `foreachBatch` (T4). */
  def needsCleanup(states: Seq[Jobs.JobState]): Seq[String] =
    states.filter(_.status == JobStatus.ForgetCompletedCleanupInProgress)
      .map(_.jobId)
}
