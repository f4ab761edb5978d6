package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null tolerance of the STREAMING ingest path (★r18, VERDICT r17
  * #4): [[graft.llm.NullToleranceSpec]] pins the batch closures; here
  * a null-TEXT and a null-ID document arrive INSIDE a live feed —
  * dropped as json-lines files mid-stream ([[CdcFeedHarness]], the
  * production ingest shape) — and the final snapshot of every CDC
  * shape must equal the clean feed's snapshot exactly, apart from the
  * contribution the null doc legitimately carries (a null-text doc
  * counts in BM25's N; everything else: nothing). The reference's P7
  * (null/missing tolerance) is exactly this operator class — before
  * the r18 guards a null doc_id crashed the primitive-Long state
  * encoder mid-stream, and a null ts NPE'd the sessionizer.
  *
  * A NULL op, by contrast, is feed corruption — pinned here to FAIL
  * loudly (the ±1-contract rule), never to silently ingest.
  */
class CdcNullToleranceSpec extends SparkSpec {

  private val docSchema = "op INT, doc_id BIGINT, text STRING"

  // clean feed: ingest 4 docs across two drops, forget one
  private val clean: Seq[Seq[String]] = Seq(
    Seq(
      """{"op":1,"doc_id":1,"text":"alpha beta gamma"}""",
      """{"op":1,"doc_id":2,"text":"beta delta"}"""),
    Seq(
      """{"op":1,"doc_id":3,"text":"alpha epsilon"}""",
      """{"op":1,"doc_id":4,"text":"zeta"}"""),
    Seq("""{"op":-1,"doc_id":2,"text":"beta delta"}"""))

  // same feed with a null-text ingest (+ its forget) and a null-id
  // row injected MID-STREAM into batch 1 (and a missing-field id in
  // the forget batch — the json reader reads absent as null)
  private val noisy: Seq[Seq[String]] = Seq(
    clean(0),
    Seq(
      """{"op":1,"doc_id":3,"text":"alpha epsilon"}""",
      """{"op":1,"doc_id":9,"text":null}""",
      """{"op":1,"doc_id":null,"text":"ghost words here"}""",
      """{"op":1,"doc_id":4,"text":"zeta"}"""),
    Seq(
      """{"op":-1,"doc_id":2,"text":"beta delta"}""",
      """{"op":-1,"doc_id":9,"text":null}""",
      """{"op":-1,"text":"more ghost words"}"""))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("inverted CDC: a null-text and null-id doc mid-feed change " +
    "NOTHING in the snapshot") {
    def snap(feed: Seq[Seq[String]]): Seq[String] =
      rows(CdcFeedHarness.maxSeqSnapshot(
        CdcFeedHarness.runJsonFeed(spark, docSchema, feed, "update") {
          df => StreamingIndex.invertedIndexCdc(
            df, "op", "doc_id", "text", maxDf = 10).toDF()
        }).filter(col("df") > 0))
    val a = snap(clean)
    val b = snap(noisy)
    assert(a == b, s"clean:\n${a.mkString("\n")}\nnoisy:\n${b.mkString("\n")}")
    assert(a.exists(_.startsWith("[alpha,2,")), a.mkString("\n"))
  }

  test("positional CDC: a null-text and null-id doc mid-feed change " +
    "NOTHING in the snapshot") {
    def snap(feed: Seq[Seq[String]]): Seq[String] =
      rows(CdcFeedHarness.maxSeqSnapshot(
        CdcFeedHarness.runJsonFeed(spark, docSchema, feed, "update") {
          df => StreamingIndex.positionalIndexCdc(
            df, "op", "doc_id", "text", maxDf = 10).toDF()
        }).filter(col("df") > 0))
    val a = snap(clean)
    val b = snap(noisy)
    assert(a == b, s"clean:\n${a.mkString("\n")}\nnoisy:\n${b.mkString("\n")}")
    assert(a.nonEmpty)
  }

  test("BM25 scalars CDC: the null-text doc counts in N only (the " +
    "batch convention) and nets out on forget; null-id rows with " +
    "text still count (no id is consulted)") {
    def snap(feed: Seq[Seq[String]]): Seq[String] =
      rows(CdcFeedHarness.runJsonFeed(spark, docSchema, feed,
        "complete") { df =>
        StreamingIndex.bm25ScalarsCdc(df, "op", "text")
      })
    // clean net: docs 1 (3 tokens), 3 (2), 4 (1) -> L 6, N 3
    assert(snap(clean) == Seq("[6,3]"))
    // noisy net: +1/−1 of doc 9 (0 tokens) cancels in both L and N;
    // the null-id ingest ("ghost words here", 3 tokens) and the
    // id-less forget ("more ghost words", 3 tokens) also cancel —
    // scalars consult no id, so ops apply as ±(dl, 1)
    assert(snap(noisy) == Seq("[6,3]"))
  }

  test("ngram counts CDC: null-text rows gram to nothing; the " +
    "snapshot nets to the clean feed's") {
    def snap(feed: Seq[Seq[String]]): Seq[String] =
      rows(CdcFeedHarness.runJsonFeed(spark, docSchema, feed,
        "complete") { df =>
        StreamingIndex.ngramCountsCdc(df, "op", "text", n = 1)
          .filter(col("freq") > 0)
      })
    val a = snap(clean)
    val b0 = snap(Seq(clean(0), noisy(1).take(2) :+ noisy(1)(3),
      Seq(clean(2).head, noisy(2)(1))))
    assert(a == b0, s"clean:\n${a.mkString("\n")}\nnoisy:\n${b0.mkString("\n")}")
    assert(a.contains("[alpha,2]"), a.mkString("\n"))
  }

  test("streaming sessionize: a null-user and a null-ts event " +
    "mid-feed change NOTHING in the emitted sessions") {
    val evSchema = "user_id STRING, ts STRING"
    val cleanEvs = Seq(
      Seq(
        """{"user_id":"u1","ts":"2024-01-01 00:00:01"}""",
        """{"user_id":"u2","ts":"2024-01-01 00:00:05"}"""),
      Seq("""{"user_id":"u1","ts":"2024-01-01 00:00:30"}"""),
      Seq("""{"user_id":"u9","ts":"2024-01-02 00:00:00"}"""),
      Seq("""{"user_id":"u9","ts":"2024-01-02 01:00:00"}"""))
    val noisyEvs = Seq(
      cleanEvs(0),
      Seq(
        """{"user_id":"u1","ts":"2024-01-01 00:00:30"}""",
        """{"user_id":null,"ts":"2024-01-01 00:00:31"}""",
        """{"user_id":"u1","ts":null}""",
        """{"ts":"2024-01-01 00:00:32"}"""),
      cleanEvs(2), cleanEvs(3))
    def run(feed: Seq[Seq[String]]): Seq[String] =
      rows(CdcFeedHarness.runJsonFeed(spark, evSchema, feed, "append") {
        df => Sessionize.sessions(df, "user_id", "ts",
          gapMs = 60000L, watermarkDelay = "5 seconds")
      }.filter(col("user_id") =!= "u9"))
    val a = run(cleanEvs)
    val b = run(noisyEvs)
    assert(a == b, s"clean:\n${a.mkString("\n")}\nnoisy:\n${b.mkString("\n")}")
    assert(a.size == 2, a.mkString("\n")) // u1 {1s,30s}, u2 {5s}
  }

  test("a NULL op is feed corruption, not tolerable noise: the " +
    "stream fails loudly (±1-contract rule)") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val bad = Seq(Seq("""{"op":null,"doc_id":1,"text":"w"}"""))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CdcFeedHarness.runJsonFeed(spark, docSchema, bad, "update") { df =>
        StreamingIndex.invertedIndexCdc(
          df, "op", "doc_id", "text", maxDf = 2).toDF()
      }.collect()
    }
    assert(msgs(err).exists(_.contains("CDC op must be +1")),
      err.getMessage)
  }
}
