package graft.llm

import graft.SparkSpec
import graft.catalog.TableDef
import graft.model._

/** Semantic-dedup-driven forget: embedding-level duplicate decisions
  * delete the corresponding DOCUMENTS through the shared batched
  * deletion machinery; keepers and distinct docs survive intact. */
class SemanticDedupForgetSpec extends SparkSpec {
  import spark.implicits._

  test("forgetDominated deletes exactly the dominated docs (keeper = " +
    "earliest copy survives); distinct docs untouched; batched jobs " +
    "fold") {
    val rnd = new scala.util.Random(17)
    def v(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(16)(r.nextGaussian().toFloat)
    }
    def near(base: Seq[Float]): Seq[Float] =
      base.map(x => x + (rnd.nextGaussian() * 0.005).toFloat)
    val a = v(1); val b = v(2)
    // 1 is the earliest copy of {1,3,5}; 2 is the earliest of {2,6};
    // 4 is distinct
    val emb = Seq(
      (1L, a), (2L, b), (3L, near(a)), (4L, v(3)), (5L, near(a)),
      (6L, near(b))).toDF("vec_id", "embedding")

    val docs = (1L to 6L).map(i => (i, s"document body number $i " * 6))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sdf-")
      .toString
    docs.repartition(2).write.mode("overwrite").parquet(s"$dir/docs")
    val table = TableDef("docs", s"$dir/docs", DataFormat.Parquet,
      spark.read.parquet(s"$dir/docs").schema)

    val dominated = SemanticDedupForget.dominatedIds(emb, "vec_id",
      "embedding", k = 2, iters = 3, tau = 0.95)
      .as[Long].collect().toSet
    assert(dominated == Set(3L, 5L, 6L), s"dominated=$dominated")

    // batchSize=2 -> two deletion jobs for the three dominated ids
    val run = SemanticDedupForget.forgetDominated(spark, "sdf-job",
      table, "doc_id", emb, "vec_id", "embedding",
      k = 2, iters = 3, tau = 0.95, batchSize = 2)
    assert(run.status == JobStatus.Completed, run.status)
    assert(run.batches.size == 2, s"${run.batches.size} batches")
    assert(run.stats.totalRowsDeletedCount == 3)

    val survivors = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 2L, 4L), s"wrong survivors: $survivors")
  }

  test("a corpus with no semantic duplicates is a COMPLETED no-op") {
    val emb = Seq(
      (1L, Seq.fill(16)(1.0f)),
      (2L, (Seq.fill(8)(1.0f) ++ Seq.fill(8)(-1.0f))))
      .toDF("vec_id", "embedding")
    val docs = Seq((1L, "first doc"), (2L, "second doc"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sdf0-")
      .toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val table = TableDef("docs", s"$dir/docs", DataFormat.Parquet,
      spark.read.parquet(s"$dir/docs").schema)
    val run = SemanticDedupForget.forgetDominated(spark, "sdf0",
      table, "doc_id", emb, "vec_id", "embedding",
      k = 2, iters = 2, tau = 0.95)
    assert(run.status == JobStatus.Completed && run.batches.isEmpty)
    assert(spark.read.parquet(s"$dir/docs").count() == 2)
  }
}
