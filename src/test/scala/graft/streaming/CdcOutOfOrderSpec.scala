package graft.streaming

import graft.SparkSpec

/** Out-of-order CDC delivery tolerance (★r19, VERDICT r18 #7 — the
  * "clock-skewed sequence numbers" candidate). The reference's
  * delivery channel is a STANDARD SQS queue: at-least-once AND
  * unordered by contract — a forget can arrive before the ingest it
  * logically follows, and a batch can carry both signs for one
  * document. This spec pins the arrival-order semantics the operators
  * implement (and [[CdcRedeliverySpec]] left implicit):
  *
  *   - an orphan −1 (doc never ingested, token state absent) creates
  *     NO state and NO tombstone — the stream stays silent;
  *   - a −1/+1 INVERSION across batches converges to the ingested
  *     state: the early forget is a no-op skip, the late ingest
  *     lands — indistinguishable from forget-then-re-ingest, which is
  *     the only consistent reading an unordered queue admits;
  *   - within ONE batch, ingests apply before forgets (the documented
  *     convention): a same-batch ±1 pair nets to ABSENT;
  *   - the signed-scalar operators (BM25 L/N) are exactly-once BY
  *     CONTRACT (blind ± arithmetic, the cmsCountersSigned class): an
  *     orphan −1 drifts them by exactly the phantom row's counts —
  *     asserted, so the documented limitation stays visible instead
  *     of silently assumed away.
  */
class CdcOutOfOrderSpec extends SparkSpec {

  private val docSchema = "op INT, doc_id BIGINT, text STRING"

  private def ing(id: Long, text: String) =
    s"""{"op":1,"doc_id":$id,"text":"$text"}"""
  private def fgt(id: Long, text: String) =
    s"""{"op":-1,"doc_id":$id,"text":"$text"}"""

  private def snapInverted(feed: Seq[Seq[String]]): Seq[String] =
    CdcFeedHarness.maxSeqSnapshot(
      CdcFeedHarness.runJsonFeed(spark, docSchema, feed, "update") {
        df => StreamingIndex.invertedIndexCdc(
          df, "op", "doc_id", "text", maxDf = 10).toDF()
      }).collect().map(_.toString).sorted.toSeq

  private def snapPositional(feed: Seq[Seq[String]]): Seq[String] =
    CdcFeedHarness.maxSeqSnapshot(
      CdcFeedHarness.runJsonFeed(spark, docSchema, feed, "update") {
        df => StreamingIndex.positionalIndexCdc(
          df, "op", "doc_id", "text", maxDf = 10).toDF()
      }).collect().map(_.toString).sorted.toSeq

  test("an orphan -1 on a never-seen token creates no state and no " +
    "tombstone (inverted + positional)") {
    val feed = Seq(Seq(fgt(9, "phantom tokens only")))
    assert(snapInverted(feed).isEmpty,
      "orphan forget materialized inverted state")
    assert(snapPositional(feed).isEmpty,
      "orphan forget materialized positional state")
  }

  test("a -1/+1 inversion across batches converges to the ingested " +
    "state — same snapshot CONTENT as the in-order ingest-only feed") {
    // in-order control: just the ingests
    val control = Seq(
      Seq(ing(1, "alpha beta")),
      Seq(ing(2, "alpha gamma")))
    // skewed: doc 2's forget arrives BEFORE its ingest
    val skewed = Seq(
      Seq(fgt(2, "alpha gamma")),
      Seq(ing(1, "alpha beta")),
      Seq(ing(2, "alpha gamma")))
    // the snapshot reader drops seq, so this is content equality
    // (token, df, postings); the orphan batch emitting no updates is
    // what the first test pins
    assert(snapInverted(control) == snapInverted(skewed),
      "inversion did not converge to the ingested state")
    assert(snapPositional(control) == snapPositional(skewed),
      "positional inversion did not converge")
  }

  test("within one batch ingests apply before forgets: a same-batch " +
    "+1/-1 pair nets to ABSENT (the documented convention)") {
    val sameBatch = Seq(
      Seq(ing(1, "alpha beta")),
      Seq(ing(2, "alpha gamma"), fgt(2, "alpha gamma")))
    val expected = Seq(Seq(ing(1, "alpha beta")))
    // doc 2 flickers in and out inside one batch: alpha's df returns
    // to 1 and gamma's state tombstones — the snapshot (seq already
    // dropped by the reader) must be the control rows plus tombstones
    assert(snapInverted(expected).toSet.subsetOf(
      snapInverted(sameBatch).toSet),
      s"same-batch pair lost the surviving doc:\n" +
        s"${snapInverted(sameBatch).mkString("\n")}")
    val net = snapInverted(sameBatch).toSet --
      snapInverted(expected).toSet
    // anything beyond the control rows must be tombstones (df 0) of
    // the flickered doc's tokens
    assert(net.forall(_.contains(",0,")),
      s"same-batch pair left live residue: $net")
  }

  test("signed scalars (BM25 L/N) drift by EXACTLY the orphan -1's " +
    "counts — the exactly-once contract of the signed-counter class, " +
    "pinned visible") {
    def scalars(feed: Seq[Seq[String]]): (Long, Long) = {
      val r = CdcFeedHarness.runJsonFeed(spark, docSchema, feed,
        "complete") { df =>
        StreamingIndex.bm25ScalarsCdc(df, "op", "text").toDF()
      }.collect()
      val row = r.last
      (row.getLong(row.fieldIndex("_L")), row.getLong(row.fieldIndex("_N")))
    }
    val clean = scalars(Seq(Seq(ing(1, "alpha beta gamma"))))
    assert(clean == ((3L, 1L)), s"clean scalars: $clean")
    // orphan -1 with a 2-token phantom text: L drifts by -2, N by -1
    val drifted = scalars(Seq(
      Seq(ing(1, "alpha beta gamma")),
      Seq(fgt(9, "phantom text"))))
    assert(drifted == ((1L, 0L)),
      s"signed-scalar drift contract changed: $drifted (want (1,0))")
  }
}
