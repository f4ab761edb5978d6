package graft.llm

import graft.SparkSpec
import graft.catalog.TableDef
import graft.model._
import org.apache.spark.sql.functions._

/** Dedup-driven forget: cluster losers leave the lake through the
  * ordinary deletion-job machinery; keepers and singletons survive. */
class DedupForgetSpec extends SparkSpec {
  import spark.implicits._

  test("forgetDuplicates removes exactly the non-keeper cluster members " +
    "across multiple objects") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (1L, base),                              // keeper of cluster {1,2,4}
      (2L, base.replace("jumps", "leaps")),    // near-dup of 1
      (3L, "a completely different document about parquet " * 6),
      (4L, base.replace("lazy", "hazy")),      // near-dup of 1
      (5L, "another unrelated singleton text entirely " * 6))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-df-").toString
    docs.repartition(3).write.mode("overwrite").parquet(s"$dir/docs")
    val table = TableDef("docs", s"$dir/docs", DataFormat.Parquet,
      spark.read.parquet(s"$dir/docs").schema)

    val lake = spark.read.parquet(s"$dir/docs")
    val pairs = Dedup.nearDuplicates(lake, "doc_id", "text",
      threshold = 0.5)
    val run = DedupForget.forgetDuplicates(spark, "dedup-job", table,
      "doc_id", pairs)
    assert(run.status == JobStatus.Completed, run.status)
    assert(run.batches.size == 1) // 2 losers, one batch
    assert(run.stats.totalRowsDeletedCount == 2) // docs 2 and 4

    val survivors = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L, 5L),
      s"wrong survivors: $survivors")
  }

  test("a loser set larger than batchSize feeds MULTIPLE bounded jobs " +
    "with exact folded stats — no whole-queue collect") {
    // 30 exact-duplicate clusters of 2 plus one cluster of 11: 40 losers.
    // batchSize=16 → ceil(40/16) = 3 per-batch deletion jobs.
    val texts = (0 until 30).map(c => c -> s"cluster text number $c " * 4)
    val pairRows = texts.map { case (c, _) => (c.toLong, (100 + c).toLong) }
    val bigCluster = (1 to 11).map(i => (1000L, 1000L + i))
    val docs = (
      texts.flatMap { case (c, t) => Seq(c.toLong -> t, (100 + c).toLong -> t) } ++
      (0 to 11).map(i => (1000L + i) -> ("the shared big cluster body " * 4))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dfb-").toString
    docs.repartition(5).write.mode("overwrite").parquet(s"$dir/docs")
    val table = TableDef("docs", s"$dir/docs", DataFormat.Parquet,
      spark.read.parquet(s"$dir/docs").schema)

    val pairs = (pairRows ++ bigCluster).toDF("id_a", "id_b")
    // losers: 100..129 (pair clusters) + 1001..1011 (big cluster) = 41
    val expectedLosers =
      (pairRows.map(_._2) ++ bigCluster.map(_._2)).toSet
    assert(expectedLosers.size == 41)

    val run = DedupForget.forgetDuplicates(spark, "dedup-batch", table,
      "doc_id", pairs, batchSize = 16)
    assert(run.status == JobStatus.Completed, run.status)
    assert(run.batches.size == 3,
      s"expected 3 batches, got ${run.batches.size}")
    // every batch's queue stayed within the bound
    assert(run.batches.forall(_.clearedQueue.size <= 16))
    assert(run.stats.totalRowsDeletedCount == expectedLosers.size)
    assert(run.stats.totalRowsProcessedCount > 0)

    val survivors = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().toSet
    val expectedSurvivors =
      (0 until 30).map(_.toLong).toSet + 1000L
    assert(survivors == expectedSurvivors,
      s"wrong survivors: ${survivors.toSeq.sorted}")
  }

  test("losers is empty on a pair-free corpus (no job needed)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupForget.losers(pairs, "id_a", "id_b").count() == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-dfe-").toString
    Seq((1L, "only doc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    val table = TableDef("docs", s"$dir/docs", DataFormat.Parquet,
      spark.read.parquet(s"$dir/docs").schema)
    val run = DedupForget.forgetDuplicates(spark, "dedup-empty", table,
      "doc_id", pairs)
    assert(run.status == JobStatus.Completed)
    assert(run.batches.isEmpty)
    assert(run.stats == JobStats())
  }
}
