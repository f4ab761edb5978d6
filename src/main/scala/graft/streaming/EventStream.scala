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
    * micro-batch. Works on batch Datasets too (same code path).
    *
    * @param retentionMs how long a FINISHED job's state survives with no
    *        further events before it is evicted (the streaming analog of
    *        the reference's DynamoDB TTL on `Expires`, boto_utils.py:120-123
    *        — stamped only once a job completes — and of [[Jobs.retain]]).
    *        0 = keep forever, matching `jobDetailsRetentionDays = 0`.
    *        In a long-lived stream an un-evicted terminal job would pin
    *        its state in the store forever; with eviction, a late event
    *        for an expired job re-creates state from QUEUED — exactly
    *        what the reference does after the TTL'd row is gone.
    *
    *        NOTE: with a processing-time timeout Spark constructs
    *        micro-batches CONTINUOUSLY even with no new data (so
    *        wall-clock timeouts can fire;
    *        FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    *        unconditionally true for ProcessingTimeTimeout). Pace the
    *        query with `.trigger(Trigger.ProcessingTime(...))` — at a
    *        minute-scale interval the idle batches are negligible — and
    *        do not use `processAllAvailable`, which never returns on
    *        such a query; await sink output instead. */
  def foldStream(events: Dataset[JobEvent],
                 retentionMs: Long = 0L): Dataset[Jobs.JobState] = {
    val timeoutConf =
      if (retentionMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.jobId)(Encoders.STRING)
      .mapGroupsWithState[Jobs.JobState, Jobs.JobState](timeoutConf) {
        (jobId: String, batch: Iterator[JobEvent],
         state: GroupState[Jobs.JobState]) =>
          if (state.hasTimedOut) {
            // retention expiry: drop the terminal job's state; emit the
            // last known fold once so sinks observe the eviction batch
            val last = state.get
            state.remove()
            last
          } else {
            val current = state.getOption.getOrElse(Jobs.JobState(jobId))
            val next = batch.toSeq.sortBy(_.sk)
              .foldLeft(current)(Jobs.applyEvent)
            state.update(next)
            // the TTL stamps only when the job has finished — RUNNING
            // jobs never expire (stream_processor.py stamps Expires on
            // the job-end transition)
            if (retentionMs > 0L && JobStatus.finished(next.status))
              state.setTimeoutDuration(retentionMs)
            next
          }
      }(Encoders.product[Jobs.JobState], Encoders.product[Jobs.JobState])
  }

  /** Jobs whose folded status just reached the cleanup trigger state —
    * evaluate per update batch in `foreachBatch` (T4). */
  def needsCleanup(states: Seq[Jobs.JobState]): Seq[String] =
    states.filter(_.status == JobStatus.ForgetCompletedCleanupInProgress)
      .map(_.jobId)
}
