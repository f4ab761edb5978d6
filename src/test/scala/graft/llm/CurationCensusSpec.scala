package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused census-served screen (gramScreensFromCensus) must be
  * bit-identical to the standalone screens it replaces — q117's gate
  * hash depends on it. */
class CurationCensusSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("gramScreensFromCensus ≡ standalone gramNovelty + refGramOverlap " +
    "on the q117 train/bench split") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val bench = docs.filter(col("doc_id") % 5 === 0)

    val fused = TextStats.gramScreensFromCensus(
      train,
      TextStats.gramCensus(train, "doc_id", "text", n = 8),
      TextStats.gramCensus(bench, "doc_id", "text", n = 8), "doc_id")

    val nov = TextStats.gramNovelty(train, "doc_id", "text", n = 8)
    val ovl = TextStats.refGramOverlap(train, bench, "doc_id", "text", n = 8)
    val expect = nov
      .join(ovl.select(col("doc_id"), col("n_shared"),
        col("overlap_micro")), Seq("doc_id"))
      .select("doc_id", "n_grams", "n_unique", "novelty_micro",
        "n_shared", "overlap_micro")

    assert(fused.count() === train.count(),
      "fused profile must keep one row per train doc")
    assert(fused.exceptAll(expect).isEmpty && expect.exceptAll(fused).isEmpty,
      "fused census profile diverged from the standalone screens")
    // the screens must actually bite on this data (a vacuous
    // equivalence over all-zero profiles would prove nothing)
    assert(fused.filter(col("n_unique") > 0).count() > 0)
    assert(fused.filter(col("n_shared") > 0).count() > 0)
  }

  test("gram-less documents keep a 0/0/0 profile row (roster left-join)") {
    import spark.implicits._
    val docs = Seq((1L, "short text"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val out = TextStats.gramScreensFromCensus(
      docs, TextStats.gramCensus(docs, "doc_id", "text", n = 8),
      TextStats.gramCensus(docs.limit(0), "doc_id", "text", n = 8),
      "doc_id").orderBy("doc_id").collect()
    assert(out.length === 2)
    val short = out(0)
    assert(short.getLong(1) === 0L && short.getLong(3) === 0L &&
      short.getLong(5) === 0L, s"gram-less doc profile: $short")
    val long = out(1)
    assert(long.getLong(1) === 3L, s"10-token doc has 3 distinct 8-grams: $long")
  }
}
