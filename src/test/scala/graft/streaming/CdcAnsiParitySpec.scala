package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANSI-config parity for the STREAMING/CDC family (★r18, VERDICT r17
  * #3): the r16 bug that motivated [[graft.llm.AnsiParitySpec]] lived
  * in a CDC operator (bm25ScalarsCdc's `size(NULL) = −1` drift under
  * ANSI-off), but that spec covers the batch family only. Here the
  * same null/empty-heavy fixture rides the PRODUCTION ingest shape —
  * json-lines files dropped batch-by-batch into a watched directory
  * ([[CdcFeedHarness]]) — through all four CDC gate shapes plus the
  * streaming sessionizer and the tumbling-window aggregation, under
  * ANSI on and ANSI off (+ the legacy sizeOfNull flag off-mode
  * deployments couple with it). Snapshots must be bit-identical.
  */
class CdcAnsiParitySpec extends SparkSpec {

  // the AnsiParitySpec fixture as ±1 CDC events: nulls, empties,
  // whitespace-only, heavy repetition; "the" overflows maxDf=2 once
  // doc 8 lands, and the forget batch drops a null-text doc too
  private val docSchema = "op INT, doc_id BIGINT, text STRING"
  private val batches: Seq[Seq[String]] = Seq(
    Seq(
      """{"op":1,"doc_id":1,"text":"the quick brown fox jumps over the lazy dog"}""",
      """{"op":1,"doc_id":2,"text":null}""",
      """{"op":1,"doc_id":3,"text":""}""",
      """{"op":1,"doc_id":4,"text":"   "}"""),
    Seq(
      """{"op":1,"doc_id":5,"text":"the the the the the"}""",
      """{"op":1,"doc_id":6,"text":"one"}""",
      """{"op":1,"doc_id":7,"text":"a b c d e f g h i j k l m n o p q r s t"}""",
      """{"op":1,"doc_id":8,"text":"the fox runs"}"""),
    Seq(
      """{"op":-1,"doc_id":5,"text":"the the the the the"}""",
      """{"op":-1,"doc_id":2,"text":null}"""))

  /** Run `mk` under ANSI on, then ANSI off (+ legacy sizeOfNull), and
    * require identical sorted row sets; returns the on-mode rows so
    * callers can assert the fixture has teeth. */
  private def parity(name: String)(run: () => Seq[String]): Seq[String] = {
    val a = run()
    val ansiOn = spark.conf.get("spark.sql.ansi.enabled")
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
    a
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("inverted CDC snapshot is ANSI-mode independent through the " +
    "file feed") {
    val got = parity("invertedIndexCdc") { () =>
      rows(CdcFeedHarness.maxSeqSnapshot(
        CdcFeedHarness.runJsonFeed(spark, docSchema, batches, "update") {
          df => StreamingIndex.invertedIndexCdc(
            df, "op", "doc_id", "text", maxDf = 2).toDF()
        }))
    }
    // teeth: "the" must have overflowed (df 3 then 2 after forget,
    // null postings), and "fox" must list docs 1 and 8
    assert(got.exists(s => s.startsWith("[the,2,") && s.contains("null")),
      got.mkString("\n"))
    assert(got.exists(_.startsWith("[fox,2,")), got.mkString("\n"))
  }

  test("positional CDC snapshot is ANSI-mode independent through the " +
    "file feed") {
    val got = parity("positionalIndexCdc") { () =>
      rows(CdcFeedHarness.maxSeqSnapshot(
        CdcFeedHarness.runJsonFeed(spark, docSchema, batches, "update") {
          df => StreamingIndex.positionalIndexCdc(
            df, "op", "doc_id", "text", maxDf = 2).toDF()
        }))
    }
    assert(got.nonEmpty && got.exists(_.startsWith("[the,2,")),
      got.mkString("\n"))
  }

  test("BM25 scalars CDC are ANSI-mode independent through the file " +
    "feed (the r16 bug's exact site)") {
    val got = parity("bm25ScalarsCdc") { () =>
      rows(CdcFeedHarness.runJsonFeed(spark, docSchema, batches,
        "complete") { df =>
        StreamingIndex.bm25ScalarsCdc(df, "op", "text")
      })
    }
    // net corpus: docs 1 (9 tokens), 3, 4 (0), 6 (1), 7 (20), 8 (3)
    // = L 33; N counts every net doc including null/empty = 6
    assert(got == Seq("[33,6]"), got)
  }

  test("ngram counts CDC are ANSI-mode independent through the file " +
    "feed") {
    val got = parity("ngramCountsCdc") { () =>
      rows(CdcFeedHarness.runJsonFeed(spark, docSchema, batches,
        "complete") { df =>
        StreamingIndex.ngramCountsCdc(df, "op", "text", n = 2)
          .filter(col("freq") > 0)
      })
    }
    assert(got.contains("[the fox,1]") && got.contains("[the quick,1]"),
      got.mkString("\n"))
  }

  test("streaming sessionize is ANSI-mode independent through the " +
    "file feed (try_cast drops a malformed ts identically)") {
    val evSchema = "user_id STRING, ts STRING"
    val evBatches = Seq(
      Seq(
        """{"user_id":"u1","ts":"2024-01-01 00:00:01"}""",
        """{"user_id":"u2","ts":"2024-01-01 00:00:05"}""",
        """{"user_id":"u1","ts":"not-a-timestamp"}"""),
      Seq(
        """{"user_id":"u1","ts":"2024-01-01 00:00:30"}""",
        """{"user_id":"u2","ts":"2024-01-01 00:40:00"}"""),
      // sentinels advance the watermark past end+gap, then let the
      // timeouts fire (the SessionizeSpec pattern)
      Seq("""{"user_id":"u9","ts":"2024-01-02 00:00:00"}"""),
      Seq("""{"user_id":"u9","ts":"2024-01-02 01:00:00"}"""))
    val got = parity("sessionize") { () =>
      rows(CdcFeedHarness.runJsonFeed(spark, evSchema, evBatches,
        "append") { df =>
        Sessionize.sessions(df, "user_id", "ts",
          gapMs = 60000L, watermarkDelay = "5 seconds")
      }.filter(col("user_id") =!= "u9"))
    }
    // u1: one session {1 s, 30 s} (malformed ts dropped, not a
    // session splitter); u2: two singleton sessions 39 min apart
    assert(got.size == 3 && got.exists(_.contains("u1")), got)
  }

  test("tumbling-window aggregation (the q52 shape) is ANSI-mode " +
    "independent on a null-heavy events frame") {
    import spark.implicits._
    val events = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "view", 1000000000000L),
      (2L, "view", 3600000000001L * 1000),
      (3L, null, 7200000000000000L),
      (4L, "click", null))
      .toDF("user_id", "event_type", "ts")
    val got = parity("tumbling") { () =>
      rows(events
        .withColumn("win", expr("(ts - ts % 1000) div 3600000000000"))
        .groupBy(col("win"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users")))
    }
    assert(got.size == 4, got.mkString("\n"))
  }
}
