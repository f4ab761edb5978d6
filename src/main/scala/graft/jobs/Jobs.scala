package graft.jobs

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Job state engine: folds the event-sourced job log into status + stats.
  *
  * Ports the reference's DynamoDB-stream fold (SURVEY.md §2.9 T2/T3;
  * reference: backend/lambdas/jobs/status_updater.py:19-104 and
  * stats_updater.py:27-72) in two equivalent forms:
  *
  *   - [[Jobs.fold]] — the pure sequential reducer over one job's events in
  *     `sk` order: the exact transition-map + terminal-lock semantics, used
  *     by the driver loop and as the unit-test oracle.
  *   - [[Jobs.report]] — the distributed closed form over a whole event log:
  *     because the lock engages at the FIRST event mapping to a locked
  *     status and nothing applies after it, the final status is "status of
  *     the first locking event, else status of the last status event, else
  *     QUEUED". That makes the fold expressible as window functions + one
  *     aggregation — a single shuffle on jobId, map-side-combinable sums,
  *     no per-group driver loop — which is the shape that survives a
  *     100 TB event log (events per job are bounded by object count).
  *
  * `ForgetPhaseEnded` resolves to FORGET_PARTIALLY_FAILED when the job has
  * seen any QueryFailed/ObjectUpdateFailed before it
  * (status_updater.py:88-104 `job_has_errors` reads the stats accumulated
  * so far), else FORGET_COMPLETED_CLEANUP_IN_PROGRESS.
  */
object Jobs {

  /** EventName → JobStatus (status_updater.py:19-27). ForgetPhaseEnded is
    * resolved per-event against errors-so-far, see class doc. */
  val statusMap: Map[String, String] = Map(
    JobEventName.FindPhaseFailed -> JobStatus.FindFailed,
    JobEventName.ForgetPhaseFailed -> JobStatus.ForgetFailed,
    JobEventName.Exception -> JobStatus.Failed,
    JobEventName.JobStarted -> JobStatus.Running,
    JobEventName.ForgetPhaseEnded -> JobStatus.ForgetCompletedCleanupInProgress,
    JobEventName.CleanupFailed -> JobStatus.CompletedCleanupFailed,
    JobEventName.CleanupSucceeded -> JobStatus.Completed)

  /** Event names that count as job errors for the ForgetPhaseEnded
    * resolution (status_updater.py:96-104: TotalObjectUpdateFailedCount or
    * TotalQueryFailedCount). */
  private val errorEvents =
    Set(JobEventName.QueryFailed, JobEventName.ObjectUpdateFailed)

  /** Folded state of one job. */
  final case class JobState(
      jobId: String,
      status: String = JobStatus.Queued,
      stats: JobStats = JobStats(),
      jobStartTime: Option[Long] = None,
      jobFinishTime: Option[Long] = None)

  /** Per-event stats delta (stats_updater.py:27-72, plus the engine's
    * row-count extension fed by the Forget rewrite results). */
  def statsOf(e: JobEvent): JobStats = e.eventName match {
    case JobEventName.QuerySucceeded => JobStats(
      totalQueryCount = 1, totalQuerySucceededCount = 1,
      totalQueryScannedInBytes = e.bytesScanned,
      totalQueryTimeInMillis = e.timeTakenMs)
    case JobEventName.QueryFailed => JobStats(
      totalQueryCount = 1, totalQueryFailedCount = 1,
      totalQueryScannedInBytes = e.bytesScanned,
      totalQueryTimeInMillis = e.timeTakenMs)
    case JobEventName.ObjectUpdated => JobStats(
      totalObjectUpdatedCount = 1,
      totalRowsProcessedCount = e.statsProcessed,
      totalRowsDeletedCount = e.statsDeleted)
    case JobEventName.ObjectUpdateSkipped =>
      JobStats(totalObjectUpdateSkippedCount = 1)
    case JobEventName.ObjectUpdateFailed =>
      JobStats(totalObjectUpdateFailedCount = 1)
    case JobEventName.ObjectRollbackFailed =>
      JobStats(totalObjectRollbackFailedCount = 1)
    case _ => JobStats()
  }

  /** Resolve one event's mapped status given the state folded so far;
    * None for pure stats/info events. */
  def mappedStatus(state: JobState, eventName: String): Option[String] =
    statusMap.get(eventName).map {
      case JobStatus.ForgetCompletedCleanupInProgress
        if state.stats.totalObjectUpdateFailedCount > 0 ||
           state.stats.totalQueryFailedCount > 0 =>
        JobStatus.ForgetPartiallyFailed
      case s => s
    }

  /** Apply one event: stats always accumulate; the status transition
    * applies only while the current status is unlocked
    * (status_updater.py:66-72); start/finish times stamp on the first
    * APPLIED transition into RUNNING / a finished status
    * (status_updater.py:38-48,74-77). */
  def applyEvent(state: JobState, e: JobEvent): JobState = {
    val withStats = state.copy(stats = state.stats.merge(statsOf(e)))
    mappedStatus(withStats, e.eventName) match {
      case Some(ns) if JobStatus.unlocked(state.status) =>
        withStats.copy(
          status = ns,
          jobStartTime =
            if (ns == JobStatus.Running) state.jobStartTime.orElse(Some(e.createdAt))
            else state.jobStartTime,
          jobFinishTime =
            if (JobStatus.finished(ns)) state.jobFinishTime.orElse(Some(e.createdAt))
            else state.jobFinishTime)
      case _ => withStats
    }
  }

  /** Fold one job's events (any order given; folded in `sk` order). */
  def fold(jobId: String, events: Seq[JobEvent]): JobState =
    events.sortBy(_.sk).foldLeft(JobState(jobId))(applyEvent)

  /** Column set produced by [[report]]. */
  val ReportColumns: Seq[String] = Seq(
    "job_id", "job_status", "job_start_time", "job_finish_time",
    "total_query_count", "total_query_succeeded_count",
    "total_query_failed_count", "total_query_scanned_bytes",
    "total_query_time_ms", "total_object_updated_count",
    "total_object_update_skipped_count", "total_object_update_failed_count",
    "total_object_rollback_failed_count", "total_rows_processed_count",
    "total_rows_deleted_count")

  private def n(name: String): Column =
    when(col("eventName") === name, lit(1L)).otherwise(lit(0L))

  /** Distributed fold over a whole event log (see class doc for the closed
    * form). Input needs the [[graft.model.JobEvent]] columns; events are
    * ordered by `(sk)` within each job — `sk` must be a zero-padded or
    * otherwise lexicographically ordered total-order key.
    */
  def report(events: DataFrame): DataFrame = {
    val byJob = Window.partitionBy(col("jobId"))
    val ordered = byJob.orderBy(col("sk"))
    val before = ordered.rowsBetween(Window.unboundedPreceding, -1)

    val errsBefore = coalesce(
      sum(when(col("eventName").isin(errorEvents.toSeq: _*), 1L)
        .otherwise(0L)).over(before), lit(0L))

    // per-event mapped status (null for stats/info events), with the
    // ForgetPhaseEnded errors-so-far resolution inlined
    val mapped = statusMap.foldLeft(lit(null).cast("string")) {
      case (acc, (ev, st)) =>
        val resolved =
          if (st == JobStatus.ForgetCompletedCleanupInProgress)
            when(errsBefore > 0, JobStatus.ForgetPartiallyFailed)
              .otherwise(JobStatus.ForgetCompletedCleanupInProgress)
          else lit(st)
        when(col("eventName") === ev, resolved).otherwise(acc)
    }

    val tagged = events
      .withColumn("_st", mapped)
      .withColumn("_locked",
        col("_st").isNotNull &&
          !col("_st").isin(JobStatus.unlocked.toSeq: _*))
      .withColumn("_first_locked_sk",
        min(when(col("_locked"), col("sk"))).over(byJob))

    // min/max over (sk, status) structs skip null inputs, giving the
    // "first locking status" / "last status event" without FILTER clauses
    val firstLockedSt =
      min(when(col("_locked"), struct(col("sk"), col("_st"))))
        .getField("_st")
    val lastSt =
      max(when(col("_st").isNotNull, struct(col("sk"), col("_st"))))
        .getField("_st")

    tagged.groupBy(col("jobId").as("job_id")).agg(
      coalesce(firstLockedSt, lastSt, lit(JobStatus.Queued))
        .as("job_status"),
      min(when(col("_st") === JobStatus.Running &&
          (col("_first_locked_sk").isNull ||
            col("sk") < col("_first_locked_sk")), col("createdAt")))
        .as("job_start_time"),
      min(when(col("_locked") && col("sk") === col("_first_locked_sk"),
        col("createdAt"))).as("job_finish_time"),
      sum(n(JobEventName.QuerySucceeded) + n(JobEventName.QueryFailed))
        .as("total_query_count"),
      sum(n(JobEventName.QuerySucceeded)).as("total_query_succeeded_count"),
      sum(n(JobEventName.QueryFailed)).as("total_query_failed_count"),
      sum(when(col("eventName").isin(
        JobEventName.QuerySucceeded, JobEventName.QueryFailed),
        col("bytesScanned")).otherwise(0L)).as("total_query_scanned_bytes"),
      sum(when(col("eventName").isin(
        JobEventName.QuerySucceeded, JobEventName.QueryFailed),
        col("timeTakenMs")).otherwise(0L)).as("total_query_time_ms"),
      sum(n(JobEventName.ObjectUpdated)).as("total_object_updated_count"),
      sum(n(JobEventName.ObjectUpdateSkipped))
        .as("total_object_update_skipped_count"),
      sum(n(JobEventName.ObjectUpdateFailed))
        .as("total_object_update_failed_count"),
      sum(n(JobEventName.ObjectRollbackFailed))
        .as("total_object_rollback_failed_count"),
      sum(when(col("eventName") === JobEventName.ObjectUpdated,
        col("statsProcessed")).otherwise(0L))
        .as("total_rows_processed_count"),
      sum(when(col("eventName") === JobEventName.ObjectUpdated,
        col("statsDeleted")).otherwise(0L)).as("total_rows_deleted_count"))
  }

  /** Typed convenience over a Dataset[JobEvent]. */
  def report(events: Dataset[JobEvent])(implicit d: DummyImplicit): DataFrame =
    report(events.toDF())

  /** Driver-side fold of a full log grouped by job — small-log path used
    * by the orchestration loop and tests (cross-checks [[report]]). */
  def foldAll(events: Seq[JobEvent]): Map[String, JobState] =
    events.groupBy(_.jobId).map { case (id, evs) => id -> fold(id, evs) }

  /** Retention sweep (SURVEY.md §2.9 T6; reference: DynamoDB TTL on the
    * `Expires` epoch attribute, boto_utils.py:120-123): keep only events
    * whose `expires` is absent (NULL or <=0) or in the future. */
  def retain(events: DataFrame, nowEpochMs: Long,
             expiresCol: String = "expiresAt"): DataFrame =
    events.filter(col(expiresCol).isNull ||
      col(expiresCol) <= 0 || col(expiresCol) > nowEpochMs)
}
