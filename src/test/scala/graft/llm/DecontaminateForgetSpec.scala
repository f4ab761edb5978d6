package graft.llm

import graft.SparkSpec
import graft.catalog.TableDef
import graft.model._

/** Decontamination-driven forget: train docs flagged by EITHER screen
  * (whole-doc Jaccard, token-window collision) leave the lake through
  * the shared batched deletion machinery; clean docs survive intact. */
class DecontaminateForgetSpec extends SparkSpec {
  import spark.implicits._

  private val benchDoc =
    "which planet has the largest volcano in the solar system answer " +
    "olympus mons on mars stands twenty two kilometres tall"

  test("forgetContaminated deletes exactly the flagged docs: a near-copy " +
    "(Jaccard screen) AND a pasted verbatim span the Jaccard screen " +
    "dilutes away (window screen); clean docs untouched") {
    val filler = (1 to 80).map(i => s"filler$i").mkString(" ")
    val train = Seq(
      // near-copy of the bench doc: whole-doc Jaccard >= 0.8
      (1L, benchDoc.replace("tall", "high")),
      // a verbatim 13+-token bench span inside unrelated text: Jaccard
      // tiny (span is ~1/8 of the doc) but the window screen hits
      (2L, s"$filler $benchDoc $filler"),
      (3L, "a perfectly clean training document about spark " * 6),
      (4L, "another clean unrelated training document entirely " * 6))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dc-").toString
    train.repartition(3).write.mode("overwrite").parquet(s"$dir/train")
    val table = TableDef("train", s"$dir/train", DataFormat.Parquet,
      spark.read.parquet(s"$dir/train").schema)
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")

    // the screens individually: Jaccard flags 1 but NOT 2 (dilution);
    // the union flags both — the reason two screens exist
    val jac = Dedup.jaccardJoinExact(
      spark.read.parquet(s"$dir/train"), bench, "doc_id", "text",
      shingleLen = 16, threshold = 0.8)
      .select("id_a").as[Long].collect().toSet
    assert(jac == Set(1L), s"jaccard screen flagged $jac")
    val ids = DecontaminateForget.contaminatedIds(
      spark.read.parquet(s"$dir/train"), bench, "doc_id", "text")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"union flagged $ids")

    // batchSize=1 forces one deletion job per contaminated doc
    val run = DecontaminateForget.forgetContaminated(spark, "dc-job",
      table, "doc_id", "text", bench, batchSize = 1)
    assert(run.status == JobStatus.Completed, run.status)
    assert(run.batches.size == 2, s"${run.batches.size} batches")
    assert(run.stats.totalRowsDeletedCount == 2)

    val survivors = spark.read.parquet(s"$dir/train")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(3L, 4L), s"wrong survivors: $survivors")
  }

  test("a clean lake yields zero batches and a COMPLETED no-op run") {
    val train = Seq((1L, "nothing contaminated here at all " * 8))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dc0-").toString
    train.write.mode("overwrite").parquet(s"$dir/train")
    val table = TableDef("train", s"$dir/train", DataFormat.Parquet,
      spark.read.parquet(s"$dir/train").schema)
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")
    val run = DecontaminateForget.forgetContaminated(spark, "dc0",
      table, "doc_id", "text", bench)
    assert(run.status == JobStatus.Completed && run.batches.isEmpty)
    assert(run.stats.totalRowsDeletedCount == 0)
    assert(spark.read.parquet(s"$dir/train").count() == 1)
  }
}
