package graft.streaming

import graft.SparkSpec
import graft.llm.{Sampling, TextStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming mixture maintenance must rebuild, from a state snapshot,
  * exactly what the batch learners produce on the rows seen so far:
  * the temperature quota table and the DSIR bucket LM — the
  * [[StreamingLmSpec]] differential carried to the selection family. */
class StreamingMixSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "web", "the cat sat on the mat and the cat ran"),
    (2L, "web", "a cat the cat the cat"),
    (3L, "books", "zyx unseen qqq the cat"),
    (4L, "web", "on a mat on a mat on a"),
    (5L, "code", "single"),
    (6L, "books", "the mat ran on a cat"),
    (7L, "web", "the mat"))
  private def batches = Seq(docs.take(3), docs.slice(3, 6), docs.drop(6))

  private def runComplete(mk: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, name: String): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val query = mk(stream.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
    } finally query.stop()
  }

  test("temperature quotas rebuilt from the streamed stratum counts " +
    "equal the batch rebalance on the rows seen so far") {
    runComplete(StreamingMix.stratumCounts(_, "source"), "mix_counts")
    val counts = spark.table("mix_counts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // state is |strata|-sized
    assert(counts.size == 3)
    assert(counts.toMap == Map("web" -> 4L, "books" -> 2L, "code" -> 1L))
    val streamed = StreamingMix.quotasFromCounts(counts, 0.5, 5L)
    val batch = Sampling.temperatureRebalance(
      docs.toDF("doc_id", "source", "text"), "doc_id", "source",
      0.5, 5L)._2
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("DSIR bucket LM rebuilt from the streamed bucket counts equals " +
    "the batch learner; state is buckets-bounded") {
    val buckets = 16
    runComplete(StreamingMix.dsirBucketCounts(_, "text", buckets),
      "mix_dsir")
    val counts = spark.table("mix_dsir").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).toSeq
    assert(counts.size <= buckets, "state must stay buckets-bounded")
    val streamed = StreamingMix.dsirFromCounts(counts, buckets)
    val batch = TextStats.dsirBucketLogProbs(
      docs.toDF("doc_id", "source", "text"), "text", buckets)
    assert(streamed == batch, s"stream $streamed\nbatch  $batch")
  }
}
