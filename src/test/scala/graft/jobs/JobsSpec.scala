package graft.jobs

import graft.SparkSpec
import graft.model._

/** Job fold semantics (reference: status_updater.py:19-104 transition map +
  * terminal lock, stats_updater.py:27-72 sums) and the fold ≡ report
  * equivalence that licenses the distributed closed form.
  */
class JobsSpec extends SparkSpec {

  private var skSeq = 0
  private def ev(name: String, at: Long = 0,
                 processed: Long = 0, deleted: Long = 0,
                 bytes: Long = 0, ms: Long = 0): JobEvent = {
    skSeq += 1
    JobEvent("j", f"$skSeq%012d", name, if (at == 0) skSeq.toLong else at,
      statsProcessed = processed, statsDeleted = deleted,
      bytesScanned = bytes, timeTakenMs = ms)
  }

  test("happy path folds to COMPLETED with times stamped") {
    val s = Jobs.fold("j", Seq(
      ev(JobEventName.JobStarted, at = 100),
      ev(JobEventName.QuerySucceeded, bytes = 10, ms = 5),
      ev(JobEventName.ObjectUpdated, processed = 50, deleted = 3),
      ev(JobEventName.ForgetPhaseEnded),
      ev(JobEventName.CleanupSucceeded, at = 900)))
    assert(s.status == JobStatus.Completed)
    assert(s.jobStartTime.contains(100L))
    assert(s.jobFinishTime.contains(900L))
    assert(s.stats == JobStats(
      totalQueryCount = 1, totalQuerySucceededCount = 1,
      totalQueryScannedInBytes = 10, totalQueryTimeInMillis = 5,
      totalObjectUpdatedCount = 1,
      totalRowsProcessedCount = 50, totalRowsDeletedCount = 3))
  }

  test("every status-mapped event transitions as the reference map says") {
    def statusAfter(name: String) =
      Jobs.fold("j", Seq(ev(name))).status
    assert(statusAfter(JobEventName.JobStarted) == JobStatus.Running)
    assert(statusAfter(JobEventName.FindPhaseFailed) == JobStatus.FindFailed)
    assert(statusAfter(JobEventName.ForgetPhaseFailed) == JobStatus.ForgetFailed)
    assert(statusAfter(JobEventName.Exception) == JobStatus.Failed)
    assert(statusAfter(JobEventName.ForgetPhaseEnded) ==
      JobStatus.ForgetCompletedCleanupInProgress)
    assert(statusAfter(JobEventName.CleanupFailed) ==
      JobStatus.CompletedCleanupFailed)
    assert(statusAfter(JobEventName.CleanupSucceeded) == JobStatus.Completed)
  }

  test("terminal statuses lock: nothing applies after a failure") {
    val s = Jobs.fold("j", Seq(
      ev(JobEventName.JobStarted),
      ev(JobEventName.Exception, at = 50),
      ev(JobEventName.JobStarted),         // must not re-open
      ev(JobEventName.CleanupSucceeded)))  // must not complete
    assert(s.status == JobStatus.Failed)
    assert(s.jobFinishTime.contains(50L))
  }

  test("ForgetPhaseEnded with prior errors resolves to " +
    "FORGET_PARTIALLY_FAILED (status_updater.py:88-104)") {
    val s = Jobs.fold("j", Seq(
      ev(JobEventName.JobStarted),
      ev(JobEventName.ObjectUpdateFailed),
      ev(JobEventName.ForgetPhaseEnded)))
    assert(s.status == JobStatus.ForgetPartiallyFailed)
    assert(s.jobFinishTime.isDefined)

    val q = Jobs.fold("j", Seq(
      ev(JobEventName.JobStarted),
      ev(JobEventName.QueryFailed),
      ev(JobEventName.ForgetPhaseEnded)))
    assert(q.status == JobStatus.ForgetPartiallyFailed)
  }

  test("ForgetPhaseEnded with errors AFTER it stays cleanup-in-progress") {
    val s = Jobs.fold("j", Seq(
      ev(JobEventName.JobStarted),
      ev(JobEventName.ForgetPhaseEnded),
      ev(JobEventName.ObjectUpdateFailed)))
    assert(s.status == JobStatus.ForgetCompletedCleanupInProgress)
  }

  test("stats accumulate even while the status is locked") {
    val s = Jobs.fold("j", Seq(
      ev(JobEventName.Exception),
      ev(JobEventName.ObjectUpdated, processed = 10, deleted = 1),
      ev(JobEventName.ObjectUpdateSkipped),
      ev(JobEventName.ObjectRollbackFailed),
      ev(JobEventName.QueryFailed, bytes = 7, ms = 3)))
    assert(s.status == JobStatus.Failed)
    assert(s.stats.totalObjectUpdatedCount == 1)
    assert(s.stats.totalObjectUpdateSkippedCount == 1)
    assert(s.stats.totalObjectRollbackFailedCount == 1)
    assert(s.stats.totalQueryFailedCount == 1)
    assert(s.stats.totalQueryScannedInBytes == 7)
    assert(s.stats.totalQueryTimeInMillis == 3)
  }

  test("fold is order-insensitive in the input (sorts by sk)") {
    val events = Seq(
      ev(JobEventName.JobStarted),
      ev(JobEventName.ObjectUpdateFailed),
      ev(JobEventName.ForgetPhaseEnded))
    assert(Jobs.fold("j", events.reverse).status ==
      JobStatus.ForgetPartiallyFailed)
  }

  test("distributed report matches the pure fold on a randomized log") {
    import scala.util.Random
    val rnd = new Random(42)
    val names = Seq(
      JobEventName.JobStarted, JobEventName.QuerySucceeded,
      JobEventName.QueryFailed, JobEventName.ObjectUpdated,
      JobEventName.ObjectUpdateFailed, JobEventName.ObjectUpdateSkipped,
      JobEventName.ObjectRollbackFailed, JobEventName.ForgetPhaseEnded,
      JobEventName.CleanupSucceeded, JobEventName.CleanupFailed,
      JobEventName.Exception, JobEventName.FindPhaseStarted)
    val events = (1 to 600).map { i =>
      JobEvent(s"job${rnd.nextInt(8)}", f"$i%012d",
        names(rnd.nextInt(names.size)), i.toLong,
        statsProcessed = rnd.nextInt(100).toLong,
        statsDeleted = rnd.nextInt(10).toLong,
        bytesScanned = rnd.nextInt(1000).toLong,
        timeTakenMs = rnd.nextInt(50).toLong)
    }
    val folded = Jobs.foldAll(events)

    import spark.implicits._
    val reported = Jobs.report(events.toDF()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(reported.keySet == folded.keySet)
    folded.foreach { case (id, st) =>
      val r = reported(id)
      assert(r.getString(1) == st.status, s"status mismatch for $id")
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) == st.jobStartTime,
        s"start mismatch for $id")
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == st.jobFinishTime,
        s"finish mismatch for $id")
      val stats = st.stats
      val expected = Seq(
        stats.totalQueryCount, stats.totalQuerySucceededCount,
        stats.totalQueryFailedCount, stats.totalQueryScannedInBytes,
        stats.totalQueryTimeInMillis, stats.totalObjectUpdatedCount,
        stats.totalObjectUpdateSkippedCount,
        stats.totalObjectUpdateFailedCount,
        stats.totalObjectRollbackFailedCount,
        stats.totalRowsProcessedCount, stats.totalRowsDeletedCount)
      val got = (4 to 14).map(r.getLong)
      assert(got == expected, s"stats mismatch for $id")
    }
  }

  test("retention keeps only unexpired events (T6)") {
    import spark.implicits._
    val d = Seq(("a", 0L), ("b", 50L), ("c", 200L))
      .toDF("jobId", "expiresAt")
    val kept = Jobs.retain(d, nowEpochMs = 100L)
      .select("jobId").as[String].collect().sorted
    assert(kept.toSeq == Seq("a", "c"))
  }
}
