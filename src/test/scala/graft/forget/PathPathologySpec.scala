package graft.forget

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.catalog.TableDef
import graft.driver.JobRunner
import graft.model._

/** Object-name pathology sweep — the tenth robustness class (★r20).
  * Real lakes carry object names with spaces, percent signs, plus
  * signs, unicode, and hash marks (export tools, user uploads,
  * dataset titles). The Find phase addresses objects through
  * `input_file_name()`, which returns the file's URI string —
  * percent-ENCODED — while the Forget task must resolve that string
  * back to the SAME filesystem object. Any round-trip asymmetry
  * (decode missing, double-decode, '#' read as a URI fragment, '+'
  * read as an encoded space) silently breaks deletion for exactly
  * those objects: the Find names them, the Forget can't find them —
  * or worse, rewrites a different path.
  *
  * Contract: for every pathological name, a JobRunner-level
  * Find→Forget converges exactly as it does for a plain name — the
  * matched rows leave THAT object, every other byte of the lake is
  * untouched, and the job folds COMPLETED.
  */
class PathPathologySpec extends SparkSpec {
  import spark.implicits._

  // one object per pathology; each holds one matched row (id 7) and
  // one survivor keyed to the object so cross-contamination is visible
  // no non-ASCII name here: this container's sun.jnu.encoding cannot
  // CREATE such a file (java.nio InvalidPathException before the
  // engine ever sees it) — non-ASCII payload/identifier handling is
  // pinned by UnicodeIdentifierSpec/JsonForgetSpec instead
  private val names = Seq(
    "plain.parquet",
    "with space.parquet",
    "percent%sign.parquet",
    "plus+sign.parquet",
    "hash#mark.parquet",
    "quote'n.parquet",
    "paren(1).parquet")

  test("Find→Forget round-trips pathological object names: matched " +
    "rows deleted in place, survivors byte-keyed per object, job " +
    "COMPLETED") {
    val lake = Files.createTempDirectory("graft-pathpath-").toString
    names.zipWithIndex.foreach { case (name, i) =>
      val part = stageParquetFile(
        Seq((7L, s"match-$i"), (1000L + i, s"keep-$i"))
          .toDF("customer_id", "x"))
      Files.copy(Paths.get(part), Paths.get(lake, name))
    }
    val schema = spark.read.parquet(s"$lake/plain.parquet").schema
    val run = JobRunner.run(spark, "jpath",
      Seq(DataMapper("m", "t", Seq("customer_id")) ->
        TableDef("t", lake, DataFormat.Parquet, schema)),
      Seq(DeletionQueueItem("q", MatchId.Simple("7"))))
    assert(run.state.status == JobStatus.Completed,
      s"status ${run.state.status}; events: " +
        run.events.filter(_.error.nonEmpty).map(e =>
          s"${e.eventName}:${e.error}").mkString(" | "))
    assert(run.state.stats.totalObjectUpdatedCount == names.size.toLong,
      s"updated ${run.state.stats.totalObjectUpdatedCount} of " +
        s"${names.size} objects")
    assert(run.state.stats.totalRowsDeletedCount == names.size.toLong)
    // every object still exists UNDER ITS OWN NAME with its survivor
    names.zipWithIndex.foreach { case (name, i) =>
      assert(Files.exists(Paths.get(lake, name)), s"$name vanished")
      val rows = spark.read.parquet(s"$lake/$name")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1000L + i, s"keep-$i")),
        s"$name holds $rows")
    }
    // no stray decoded/encoded twin objects appeared
    import scala.jdk.CollectionConverters._
    val visible = Files.list(Paths.get(lake)).iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(_.startsWith(".")).toSet
    assert(visible == names.toSet, s"lake names drifted: $visible")
  }
}
