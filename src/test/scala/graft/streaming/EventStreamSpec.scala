package graft.streaming

import graft.SparkSpec
import graft.jobs.Jobs
import graft.model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming job fold (T1-T4): MemoryStream micro-batches must converge to
  * the same state as the batch fold, with the cleanup trigger firing on
  * the transition batch. */
class EventStreamSpec extends SparkSpec {

  test("mapGroupsWithState fold across micro-batches == batch fold, " +
    "cleanup trigger fires on the right batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ev = (sk: Int, name: String) =>
      JobEvent("j1", f"$sk%012d", name, sk.toLong)
    val batch1 = Seq(
      ev(1, JobEventName.JobStarted),
      ev(2, JobEventName.QuerySucceeded),
      ev(3, JobEventName.ObjectUpdated))
    val batch2 = Seq(
      ev(4, JobEventName.ForgetPhaseEnded),
      ev(5, JobEventName.CleanupSucceeded))

    val stream = MemoryStream[JobEvent]
    val states = scala.collection.mutable.ArrayBuffer.empty[Jobs.JobState]
    val cleanupBatches = scala.collection.mutable.ArrayBuffer.empty[Int]

    val query = EventStream.foldStream(stream.toDS())
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Jobs.JobState],
                       id: Long) =>
        val rows = batch.collect().toSeq
        states.synchronized {
          states ++= rows
          if (EventStream.needsCleanup(rows).nonEmpty)
            cleanupBatches += id.toInt
        }
        ()
      }
      .start()
    stream.addData(batch1)
    query.processAllAvailable()
    val afterB1 = states.synchronized(states.last)
    assert(afterB1.status == JobStatus.Running)
    assert(afterB1.stats.totalObjectUpdatedCount == 1)

    stream.addData(batch2)
    query.processAllAvailable()
    query.stop()

    val finalState = states.synchronized(states.last)
    val batchFold = Jobs.fold("j1", batch1 ++ batch2)
    assert(finalState == batchFold)
    assert(finalState.status == JobStatus.Completed)
    // ForgetPhaseEnded and CleanupSucceeded landed in one micro-batch:
    // the fold passes THROUGH cleanup-in-progress to COMPLETED, so the
    // trigger state is visible only when the batches split it. With our
    // two batches the second folds straight to Completed — no trigger.
    assert(cleanupBatches.isEmpty)
  }

  test("file-source CDC stream (T1): json event files fold incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-").toString
    def writeBatch(name: String, events: Seq[JobEvent]): Unit = {
      val lines = events.map(e =>
        s"""{"jobId":"${e.jobId}","sk":"${e.sk}","eventName":"${e.eventName}",""" +
        s""""createdAt":${e.createdAt},"statsProcessed":${e.statsProcessed},""" +
        s""""statsDeleted":${e.statsDeleted},"bytesScanned":${e.bytesScanned},""" +
        s""""timeTakenMs":${e.timeTakenMs},"path":"","error":""}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.json"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val b1 = Seq(
      JobEvent("jf", "000000000001", JobEventName.JobStarted, 1L),
      JobEvent("jf", "000000000002", JobEventName.ObjectUpdated, 2L,
        statsProcessed = 9, statsDeleted = 2))
    writeBatch("b1", b1)

    val schema = implicitly[org.apache.spark.sql.Encoder[JobEvent]].schema
    val stream = spark.readStream.schema(schema).json(dir).as[JobEvent]
    val query = EventStream.foldStream(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_states")
      .start()
    query.processAllAvailable()
    val b2 = Seq(
      JobEvent("jf", "000000000003", JobEventName.ForgetPhaseEnded, 3L),
      JobEvent("jf", "000000000004", JobEventName.CleanupSucceeded, 4L))
    writeBatch("b2", b2)
    query.processAllAvailable()
    query.stop()

    val last = spark.table("cdc_states")
      .orderBy($"jobFinishTime".asc_nulls_first).collect().last
    assert(last.getAs[String]("status") == JobStatus.Completed)
    val batchFold = Jobs.fold("jf", b1 ++ b2)
    assert(batchFold.status == JobStatus.Completed)
    assert(last.getAs[org.apache.spark.sql.Row]("stats")
      .getAs[Long]("totalRowsDeletedCount") ==
      batchFold.stats.totalRowsDeletedCount)
  }

  /** Poll until `cond` yields Some — needed because a query with
    * ProcessingTimeTimeout constructs micro-batches CONTINUOUSLY
    * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true so
    * wall-clock timeouts can fire), which means `processAllAvailable`
    * never returns on such a query; output must be awaited instead. */
  private def eventually[A](timeoutMs: Long, what: String)
                           (cond: => Option[A]): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var r = cond
    while (r.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(50L); r = cond
    }
    r.getOrElse(fail(s"not observed within ${timeoutMs}ms: $what"))
  }

  test("finished jobs are evicted after retention; a late event re-creates " +
    "state from QUEUED (T6 streaming analog of the DynamoDB TTL)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val stream = MemoryStream[JobEvent]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Jobs.JobState]
    val query = EventStream.foldStream(stream.toDS(), retentionMs = 200L)
      .writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Jobs.JobState],
                       _: Long) =>
        val rows = batch.collect().toSeq
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      def j1Rows = emitted.synchronized(emitted.filter(_.jobId == "j1").toSeq)

      // j1 runs to COMPLETED (terminal ⇒ retention timer starts)
      stream.addData(Seq(
        JobEvent("j1", "000000000001", JobEventName.JobStarted, 1L),
        JobEvent("j1", "000000000002", JobEventName.ObjectUpdated, 2L,
          statsProcessed = 5, statsDeleted = 1),
        JobEvent("j1", "000000000003", JobEventName.ForgetPhaseEnded, 3L),
        JobEvent("j1", "000000000004", JobEventName.CleanupSucceeded, 4L)))
      eventually(30000L, "j1 reaches COMPLETED") {
        j1Rows.find(_.status == JobStatus.Completed)
      }
      val afterComplete = j1Rows.size

      // the retention timeout fires with NO further j1 input — the
      // eviction batch re-emits the last fold as it drops the state
      eventually(30000L, "eviction emission for j1") {
        if (j1Rows.size > afterComplete) Some(()) else None
      }

      // a LATE event for the expired job must re-create state from
      // QUEUED (the reference's behavior once the TTL'd row is gone) —
      // were the old state still present, the terminal lock would hold
      // status at COMPLETED and the stats would carry the old counts
      stream.addData(Seq(
        JobEvent("j1", "000000000009", JobEventName.QuerySucceeded, 200L,
          bytesScanned = 42L)))
      val late = eventually(30000L, "late event re-creates j1 from QUEUED") {
        j1Rows.find(s => s.status == JobStatus.Queued &&
          s.stats.totalQueryCount == 1L)
      }
      assert(late.stats.totalQueryScannedInBytes == 42L)
      assert(late.stats.totalObjectUpdatedCount == 0L) // old stats gone
      assert(late.jobStartTime.isEmpty && late.jobFinishTime.isEmpty)
    } finally query.stop()
  }

  test("RUNNING jobs never time out (TTL stamps only on job end)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[JobEvent]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Jobs.JobState]
    val query = EventStream.foldStream(stream.toDS(), retentionMs = 100L)
      .writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Jobs.JobState],
                       _: Long) =>
        val rows = batch.collect().toSeq
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      def jrRows = emitted.synchronized(emitted.filter(_.jobId == "jr").toSeq)
      stream.addData(Seq(
        JobEvent("jr", "000000000001", JobEventName.JobStarted, 1L)))
      eventually(30000L, "jr reaches RUNNING") {
        jrRows.find(_.status == JobStatus.Running)
      }
      val afterRunning = jrRows.size
      // well past retention: a RUNNING job must NOT emit an eviction row
      Thread.sleep(600L)
      assert(jrRows.size == afterRunning,
        s"unexpected extra emissions for a RUNNING job: $jrRows")
      // and a follow-up event continues from the EXISTING state (stats
      // and start time retained)
      stream.addData(Seq(
        JobEvent("jr", "000000000002", JobEventName.ObjectUpdated, 3L,
          statsProcessed = 7, statsDeleted = 2)))
      val s = eventually(30000L, "jr folds the follow-up event") {
        jrRows.find(_.stats.totalRowsDeletedCount == 2L)
      }
      assert(s.status == JobStatus.Running)
      assert(s.jobStartTime.contains(1L))
    } finally query.stop()
  }

  test("cleanup trigger fires when the transition ends a batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[JobEvent]
    val triggered = scala.collection.mutable.ArrayBuffer.empty[String]
    val query = EventStream.foldStream(stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Jobs.JobState],
                       _: Long) =>
        triggered.synchronized {
          triggered ++= EventStream.needsCleanup(batch.collect().toSeq)
        }
        ()
      }
      .start()
    stream.addData(Seq(
      JobEvent("j2", "000000000001", JobEventName.JobStarted, 1L),
      JobEvent("j2", "000000000002", JobEventName.ForgetPhaseEnded, 2L)))
    query.processAllAvailable()
    query.stop()
    assert(triggered.synchronized(triggered.toSeq) == Seq("j2"))
  }

  test("tumbling buckets: the integer-div shape (q52, oracle-gated) is " +
    "EXACTLY Spark's window() semantics — alignment and boundary " +
    "inclusivity agree on epoch-aligned hour windows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hourUs = 3600L * 1000000
    // nanos timestamps straddling two hour boundaries, including the
    // exact boundary instant (belongs to the LATER window) and one
    // nanosecond before it (truncation keeps it in the earlier one)
    val tsNs = Seq(
      0L, 1L, hourUs * 1000 - 1000, // hour 0 (last = boundary - 1us)
      hourUs * 1000,                // exactly on the boundary: hour 1
      hourUs * 1000 + 999,         // sub-micro past it: still hour 1
      2 * hourUs * 1000 + 5)       // hour 2
    val df = tsNs.zipWithIndex
      .map { case (ns, i) => (ns, s"u${i % 2}") }.toDF("ts", "user_id")
    val viaDiv = df
      .withColumn("win", expr("(ts - ts % 1000) div 3600000000000"))
      .groupBy("win").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val viaWindow = df
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("t"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("startUs"), col("n"))
      .as[(Long, Long)].collect()
      .map { case (startUs, n) => (startUs / hourUs, n) }.toMap
    assert(viaDiv == viaWindow, s"div=$viaDiv window=$viaWindow")
    assert(viaDiv == Map(0L -> 3L, 1L -> 2L, 2L -> 1L), viaDiv.toString)
  }
}
