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
    assert(run.state.status == JobStatus.Completed, run.state.status)
    assert(run.state.stats.totalRowsDeletedCount == 2) // docs 2 and 4

    val survivors = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L, 5L),
      s"wrong survivors: $survivors")
  }

  test("losers is empty on a pair-free corpus (no job needed)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupForget.losers(pairs, "id_a", "id_b").count() == 0)
  }
}
