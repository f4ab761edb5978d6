package graft.streaming

import graft.SparkSpec
import graft.llm.TextStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming LM maintenance must rebuild, from a state snapshot, the
  * exact model the batch learner fits on the rows seen so far — the
  * [[StreamingSketchSpec]] differential carried to the LM family:
  * frequency convergence AND shared cost math, pinned in one
  * model-equality assertion per order. */
class StreamingLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat and the cat ran"),
    (2L, "a cat the cat the cat"),
    (3L, "zyx unseen qqq the cat"),
    (4L, "on a mat on a mat on a"),
    (5L, "single"),
    (6L, "the mat ran on a cat"))
  private def batches = Seq(docs.take(2), docs.slice(2, 5), docs.drop(5))

  private def runComplete(mk: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, name: String): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = mk(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
    } finally query.stop()
  }

  private def snapshot(table: String): Seq[(String, Long)] =
    spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("unigram model rebuilt from the streamed frequency snapshot " +
    "equals the batch learner on the rows seen so far") {
    runComplete(StreamingLm.tokenFrequencies(_, "text"), "lm_tok")
    val freqs = snapshot("lm_tok")
    // state is vocabulary-sized: one row per distinct token
    val distinctToks = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .distinct
    assert(freqs.size == distinctToks.size)
    val streamed = StreamingLm.unigramFromFrequencies(freqs, vocabSize = 4)
    val batch = TextStats.unigramLm(docs.toDF("doc_id", "text"),
      "text", vocabSize = 4)
    assert(streamed == batch, s"stream $streamed\nbatch  $batch")
  }

  test("bigram model rebuilt from streamed token + pair snapshots " +
    "equals the batch learner, including the conditioning counts") {
    runComplete(StreamingLm.tokenFrequencies(_, "text"), "lm_tok2")
    runComplete(StreamingLm.pairFrequencies(_, "text"), "lm_pair")
    val pairFreqs = snapshot("lm_pair")
    // state bounded by distinct adjacent pairs
    val distinctPairs = docs.map(_._2.split(" ").filter(_.nonEmpty))
      .flatMap(ts => ts.zip(ts.drop(1))).distinct
    assert(pairFreqs.size == distinctPairs.size)
    val streamed = StreamingLm.bigramFromFrequencies(
      snapshot("lm_tok2"), pairFreqs, vocabSize = 4, bigramSize = 5)
    val batch = TextStats.bigramLm(docs.toDF("doc_id", "text"),
      "text", vocabSize = 4, bigramSize = 5)
    assert(streamed == batch, s"stream $streamed\nbatch  $batch")
  }

  test("mid-stream snapshot equals the batch learner over the prefix " +
    "(the refresh-continuously, score-on-a-pin contract)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = StreamingLm.tokenFrequencies(
        stream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("lm_mid")
      .outputMode("complete").start()
    try {
      stream.addData(docs.take(2)); query.processAllAvailable()
      val mid = StreamingLm.unigramFromFrequencies(
        snapshot("lm_mid"), vocabSize = 3)
      val batchMid = TextStats.unigramLm(
        docs.take(2).toDF("doc_id", "text"), "text", vocabSize = 3)
      assert(mid == batchMid)
      stream.addData(docs.drop(2)); query.processAllAvailable()
      val end = StreamingLm.unigramFromFrequencies(
        snapshot("lm_mid"), vocabSize = 3)
      assert(end == TextStats.unigramLm(docs.toDF("doc_id", "text"),
        "text", vocabSize = 3))
      assert(mid != end, "prefix and full models should differ here")
    } finally query.stop()
  }

  test("empty snapshot fails loudly, like the batch learner") {
    val e = intercept[IllegalArgumentException] {
      StreamingLm.unigramFromFrequencies(Seq.empty, 4)
    }
    assert(e.getMessage.contains("no tokens"))
  }
}
