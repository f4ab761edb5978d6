package graft.api

import graft.SparkSpec
import graft.catalog.TableDef
import graft.model._

/** API facade semantics (reference: data_mappers/queue/jobs handlers):
  * overlap rejection, keyset pagination, watermark bounds, one-job-at-a-
  * time, queue cleanup after a completed job.
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(): (String, TableDef) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-api-").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "g"))
      .toDF("customer_id", "x")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    (dir, TableDef("t", s"$dir/t", DataFormat.Parquet,
      spark.read.parquet(s"$dir/t").schema))
  }

  test("putDataMapper validates and rejects overlapping locations") {
    val api = new GraftApi(spark)
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    // same location under a different id → overlap
    intercept[IllegalArgumentException] {
      api.putDataMapper(DataMapper("m2", "t", Seq("customer_id")), table)
    }
    // replacing the SAME id is fine
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id", "x")), table)
    assert(api.listDataMappers().items.map(_.id) == Seq("m1"))
  }

  test("keyset pagination pages the queue in id order with a cursor") {
    val api = new GraftApi(spark)
    api.enqueue((1 to 25).map(i =>
      DeletionQueueItem(f"q$i%03d", MatchId.Simple(i.toString))))
    val p1 = api.listQueue(pageSize = 10)
    assert(p1.items.map(_.id) == (1 to 10).map(i => f"q$i%03d"))
    val p2 = api.listQueue(pageSize = 10, startAt = p1.nextStart)
    assert(p2.items.head.id == "q011")
    val p3 = api.listQueue(pageSize = 10, startAt = p2.nextStart)
    assert(p3.items.size == 5 && p3.nextStart.isEmpty)
  }

  test("enqueue enforces composite scoping rules") {
    val api = new GraftApi(spark)
    intercept[IllegalArgumentException] {
      api.enqueue(Seq(DeletionQueueItem("c",
        MatchId.Composite(Map("a" -> "1"))))) // no mapper scope
    }
  }

  test("full job through the facade: COMPLETED, queue cleared, " +
    "event feed paginated, future watermark rejected") {
    val api = new GraftApi(spark)
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    api.enqueue(Seq(DeletionQueueItem("q1", MatchId.Simple("7"))))
    val run = api.startJob("job1")
    assert(run.state.status == JobStatus.Completed)
    assert(api.listQueue().items.isEmpty) // cleanup cleared it
    assert(api.getJob("job1").map(_.status).contains(JobStatus.Completed))
    assert(api.listJobs().map(_.jobId) == Seq("job1"))

    val page = api.listJobEvents("job1", pageSize = 3)
    assert(page.items.size == 3)
    assert(page.items.map(_.sk) == page.items.map(_.sk).sorted)
    val rest = api.listJobEvents("job1", pageSize = 100,
      startAt = page.nextStart.get)
    assert(rest.items.nonEmpty && rest.nextStart.isEmpty)
    assert((page.items ++ rest.items).map(_.sk) ==
      run.events.map(_.sk).sorted)

    // watermark beyond JobFinishTime+1s → rejected (jobs/handlers.py:135-139)
    val future = (System.currentTimeMillis() + 3600 * 1000L).toString + "#0"
    intercept[IllegalArgumentException] {
      api.listJobEvents("job1", startAt = future)
    }
  }

  test("event log persists to parquet and states rebuild from it (S5)") {
    val api = new GraftApi(spark)
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    api.enqueue(Seq(DeletionQueueItem("q1", MatchId.Simple("7"))))
    val run = api.startJob("jobP")
    val dir = java.nio.file.Files.createTempDirectory("graft-log-").toString
    api.persistEventLog(dir)
    val restored = api.loadJobStates(dir)
    assert(restored.keySet == Set("jobP"))
    assert(restored("jobP") == run.state)
  }

  test("settings round-trip, validation, and snapshot-on-start") {
    val api = new GraftApi(spark)
    assert(api.listSettings == JobSettings()) // defaults listed
    api.putSettings(JobSettings(findQueryMaxRetries = 5,
      deletionTasksMaxNumber = 4, jobDetailsRetentionDays = 30))
    assert(api.listSettings.findQueryMaxRetries == 5)
    intercept[IllegalArgumentException] {
      api.putSettings(JobSettings(deletionTasksMaxNumber = 0))
    }
    assert(api.listSettings.deletionTasksMaxNumber == 4) // rejected put kept old
    // snapshot: the job carries the settings at start
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    api.enqueue(Seq(DeletionQueueItem("q1", MatchId.Simple("7"))))
    val run = api.startJob("jobS")
    assert(run.settings.findQueryMaxRetries == 5)
    assert(run.settings.jobDetailsRetentionDays == 30)
    // retention stamps an expiry ~30 days after job start
    val wantMs = run.state.jobStartTime.get + 30L * 86400000L
    assert(run.expiresAt.contains(wantMs))
  }

  test("persisted event log carries retention expiry and Jobs.retain " +
    "sweeps it (DynamoDB TTL analog)") {
    val api = new GraftApi(spark)
    api.putSettings(JobSettings(jobDetailsRetentionDays = 1))
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    api.enqueue(Seq(DeletionQueueItem("q1", MatchId.Simple("7"))))
    val run = api.startJob("jobR")
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl-").toString
    api.persistEventLog(dir)
    val log = spark.read.parquet(dir)
    import org.apache.spark.sql.functions.col
    assert(log.filter(col("expiresAt") <= 0).count() == 0)
    val now = run.expiresAt.get
    assert(graft.jobs.Jobs.retain(log, now - 1).count() == log.count())
    assert(graft.jobs.Jobs.retain(log, now + 1).count() == 0)
  }

  test("mapper/queue deletion is blocked only while a job runs") {
    val api = new GraftApi(spark)
    val (_, table) = freshLake()
    api.putDataMapper(DataMapper("m1", "t", Seq("customer_id")), table)
    api.enqueue(Seq(DeletionQueueItem("q9", MatchId.Simple("999"))))
    api.deleteQueueItems(Set("q9")) // no job running → allowed
    api.deleteDataMapper("m1")
    assert(api.listDataMappers().items.isEmpty)
  }
}
