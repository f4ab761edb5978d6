package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Config-parity gate for the r16 bm25ScalarsCdc bug class: under
  * non-ANSI configs some expressions change VALUE rather than error
  * (`size(NULL)` reads −1 with the legacy flag ANSI-off implies,
  * casts return null instead of failing), so an operator that is
  * green under the default ANSI session can silently shift results
  * on a cluster that runs `spark.sql.ansi.enabled=false` — exactly
  * how the bm25 length scalar drifted by −1 per null-text doc until
  * r16 guarded it. This spec runs the null/empty-heavy fixture
  * through the text/index/score family under BOTH settings (plus the
  * legacy sizeOfNull flag the off-mode implies) and requires
  * bit-identical collected results. */
class AnsiParitySpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, null: String),
    (3L, ""),
    (4L, "   "),
    (5L, "the the the the the"),
    (6L, "one"),
    (7L, "a b c d e f g h i j k l m n o p q r s t"))

  /** Collect `mk`'s result under ANSI on, then under ANSI off (+ the
    * legacy sizeOfNull coupling), and require identical row sets. */
  private def parity(name: String)(mk: DataFrame => DataFrame): Unit = {
    val df = fixture.toDF("doc_id", "text")
    def run(): Seq[String] =
      mk(df).collect().map(_.toString).sorted.toSeq
    val ansiOn = spark.conf.get("spark.sql.ansi.enabled")
    val a = run()
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
      val b = run()
      assert(a == b, s"$name diverges across ANSI modes:\n" +
        s"ansi-on:  $a\nansi-off: $b")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", ansiOn)
      spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    }
  }

  test("token/quality scalar family is ANSI-mode independent") {
    parity("scalars") { df =>
      df.select(col("doc_id"),
        TextStats.tokenCount(col("text")).as("n"),
        TextStats.distinctTokenRatio(col("text")).as("dr"),
        TextStats.avgTokenLength(col("text")).as("alen"),
        TextStats.stopwordRatio(col("text")).as("sr"),
        TextStats.qualityScore(col("text")).as("q"),
        TextStats.languageId(col("text")).as("lang"),
        TextStats.fingerprint(col("text")).as("fp"))
    }
  }

  test("quality keep/filter decision is ANSI-mode independent") {
    parity("qualityKeep") { df =>
      df.select(col("doc_id"), TextStats.qualityKeep(col("text")))
    }
  }

  test("inverted + positional index build is ANSI-mode independent") {
    parity("invertedIndex") { df =>
      TextStats.invertedIndex(df, "doc_id", "text",
        minDf = 1, maxDf = 100)
    }
    parity("positionalIndex") { df =>
      TextStats.positionalIndex(df, "doc_id", "text",
        minDf = 1, maxDf = 100)
    }
  }

  test("bm25 scoring is ANSI-mode independent") {
    parity("bm25TopKMicro") { df =>
      TextStats.bm25TopKMicro(df, "doc_id", "text",
        terms = Seq(("the", 500000L), ("fox", 1200000L)), k = 5)
    }
  }

  test("classifier features, jaccard, span-removal counts, and PII " +
    "counts are ANSI-mode independent") {
    parity("featureColumns") { df =>
      df.select(col("doc_id") +: Classifier.featureColumns(col("text"))
        .zipWithIndex.map { case (c, j) => c.as(s"f$j") }: _*)
    }
    parity("jaccardColumn") { df =>
      df.select(col("doc_id"),
        Dedup.jaccard(Dedup.shingles("text", 4),
          Dedup.shingles("text", 4)).as("j"))
    }
    parity("spanRemovalCounts") { df =>
      Dedup.removeRepeatedSpans(df, "doc_id", "text",
        windowTokens = 2, docFreqCap = 1)
    }
    parity("piiCounts") { df =>
      df.select(col("doc_id") +: PiiScrub.countColumns(col("text")): _*)
    }
  }

  test("BPE encode and n-gram census are ANSI-mode independent") {
    val merges = Seq(Bpe.Merge("t", "h"), Bpe.Merge("th", "e"))
    parity("bpeEncode") { df =>
      Bpe.encode(df, "text", merges)
        .select(col("doc_id"), col("n_bpe_tokens"))
    }
    parity("gramCensus") { df =>
      TextStats.gramCensus(df, "doc_id", "text", n = 2)
    }
  }
}
