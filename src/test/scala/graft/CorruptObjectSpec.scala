package graft

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.catalog.{Catalog, TableDef}
import graft.driver.JobRunner
import graft.find.Finder
import graft.forget.DistributedRewrite
import graft.model._

/** Corrupt-object tolerance sweep (★r19, the ninth proactive
  * robustness class). At 100 TB a truncated upload, a bit-rotted
  * page, or a cut-short gzip member WILL appear. The compliance
  * contract is asymmetric:
  *
  *   - The FIND phase must fail LOUDLY on a corrupt object — never
  *     skip it. `spark.sql.files.ignoreCorruptFiles` stays at its
  *     false default everywhere in the engine: a silently-skipped
  *     object is rows that never reach the deletion queue — PII left
  *     in place while the job reports success, the one failure mode
  *     a find-and-forget engine can never have. The reference gets
  *     the same contract from Athena (a corrupt object fails the
  *     query; the state machine retries then surfaces QueryFailed,
  *     state_machine.yaml retry loop).
  *   - The FORGET phase fails the OBJECT, not the job (the reference
  *     catches per-object and emits ObjectUpdateFailed,
  *     main.py:182-245): one corrupt object among thousands must not
  *     strand the other 999 deletions. The original object's bytes
  *     stay untouched (evidence for the operator), no staged partial
  *     output survives, and the job folds to FORGET_PARTIALLY_FAILED.
  */
class CorruptObjectSpec extends SparkSpec {
  import spark.implicits._

  private def copyInto(src: String, dir: String, name: String): String = {
    val dst = Paths.get(dir, name)
    Files.copy(Paths.get(src), dst, StandardCopyOption.REPLACE_EXISTING)
    dst.toString
  }

  /** Truncate a file to its first half — kills a parquet footer (it
    * lives at the tail) and cuts a gzip member short. */
  private def truncate(path: String): Unit = {
    val bytes = Files.readAllBytes(Paths.get(path))
    Files.write(Paths.get(path), bytes.take(bytes.length / 2),
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Flip bytes mid-file, KEEPING the footer intact — the bit-rot
    * shape that passes open() and dies during page decode. */
  private def bitflip(path: String): Unit = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val mid = bytes.length / 3
    (mid until math.min(mid + 64, bytes.length))
      .foreach(i => bytes(i) = (bytes(i) ^ 0xFF).toByte)
    Files.write(Paths.get(path), bytes,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def mkLake(): (String, TableDef) = {
    val dir = Files.createTempDirectory("graft-corrupt-").toString
    val healthy = stageParquetFile(
      Seq((1L, "alice"), (2L, "bob"), (3L, "carol")).toDF("id", "owner"))
    copyInto(healthy, dir, "good.parquet")
    copyInto(healthy, dir, "bad.parquet")
    (dir, Catalog.tableFromDdl("t", dir, DataFormat.Parquet,
      Seq("id" -> "bigint", "owner" -> "string")))
  }

  test("find phase: a truncated parquet object fails the query " +
    "LOUDLY after retries — FIND_FAILED, zero objects updated, no " +
    "silent skip") {
    val (dir, table) = mkLake()
    truncate(s"$dir/bad.parquet")
    val run = JobRunner.run(spark, "corrupt-find",
      Seq(DataMapper("m", "t", Seq("owner")) -> table),
      Seq(DeletionQueueItem("q", MatchId.Simple("bob"))),
      settings = JobSettings(findQueryMaxRetries = 1))
    assert(run.state.status == JobStatus.FindFailed, run.state.status)
    assert(run.events.count(_.eventName == JobEventName.QueryFailed) == 1)
    assert(run.state.stats.totalObjectUpdatedCount == 0)
    // the engine never opts into silent corrupt-file skipping
    assert(spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false")
  }

  test("forget phase: a corrupt object fails ITSELF, not the job — " +
    "healthy objects still rewritten, original corrupt bytes " +
    "untouched, no staged residue, job folds FORGET_PARTIALLY_FAILED") {
    for (corruptor <- Seq(truncate _, bitflip _)) {
      val (dir, table) = mkLake()
      corruptor(s"$dir/bad.parquet")
      val corruptBefore = Files.readAllBytes(Paths.get(s"$dir/bad.parquet"))

      // the corrupted-AFTER-find race: find planned both objects while
      // they were healthy; the object rotted before its rewrite task
      val groups = Seq(Finder.GroupMatches(
        Finder.ColumnGroup(Seq("owner"), Seq(StringType)),
        Seq(("q", Seq("bob")))))
      val units = Seq("good.parquet", "bad.parquet").map(n =>
        ObjectWorkUnit("corrupt-forget", s"$dir/$n", "m",
          DataFormat.Parquet, true))
      val events = DistributedRewrite.run(spark, "corrupt-forget",
        units, groups)

      val updated = events.filter(_.eventName == JobEventName.ObjectUpdated)
      val failed = events.filter(_.eventName == JobEventName.ObjectUpdateFailed)
      assert(updated.map(_.path) == Seq(s"$dir/good.parquet"),
        updated.map(_.path).mkString(","))
      assert(failed.map(_.path) == Seq(s"$dir/bad.parquet"),
        failed.map(_.path).mkString(","))
      assert(failed.head.error.nonEmpty, "the failure must carry a cause")

      // original corrupt bytes untouched; healthy object rewritten
      assert(Files.readAllBytes(Paths.get(s"$dir/bad.parquet"))
        .sameElements(corruptBefore), "corrupt object must not be modified")
      val survivors = spark.read.parquet(s"$dir/good.parquet")
        .select("owner").as[String].collect().toSet
      assert(survivors == Set("alice", "carol"))

      // no staged partial output anywhere under the lake dir
      val residue = Files.walk(Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        val stray = residue.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.contains("staged") || n.contains("tmp"))
          .toSeq
        assert(stray.isEmpty, s"staged residue: $stray")
      } finally residue.close()

      // the event fold reads the mixed outcome as PARTIALLY failed
      val folded = graft.jobs.Jobs.fold("corrupt-forget",
        JobEvent("corrupt-forget", "0", JobEventName.JobStarted, 1L) +:
          events :+
          JobEvent("corrupt-forget", "zzzz", JobEventName.ForgetPhaseEnded,
            System.currentTimeMillis()))
      assert(folded.status == JobStatus.ForgetPartiallyFailed,
        folded.status)
    }
  }

  test("JSON-lines forget: a truncated gzip member fails the object " +
    "loudly, original bytes untouched") {
    val lines = (1 to 50).map(i => s"""{"id":$i,"owner":"u$i"}""")
    val gz = stageGzipFile(lines.mkString("\n") + "\n")
    truncate(gz)
    val before = Files.readAllBytes(Paths.get(gz))
    val groups = Seq(Finder.GroupMatches(
      Finder.ColumnGroup(Seq("owner"), Seq(StringType)),
      Seq(("q", Seq("u7")))))
    val events = DistributedRewrite.run(spark, "corrupt-json",
      Seq(ObjectWorkUnit("corrupt-json", gz, "m",
        DataFormat.JsonLines, true)), groups)
    val failed = events.filter(_.eventName == JobEventName.ObjectUpdateFailed)
    assert(failed.map(_.path) == Seq(gz) && failed.head.error.nonEmpty,
      events.map(e => (e.eventName, e.error)).mkString(";"))
    assert(Files.readAllBytes(Paths.get(gz)).sameElements(before))
  }
}
