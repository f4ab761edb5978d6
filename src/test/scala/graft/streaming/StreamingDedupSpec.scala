package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
case class Vec(vec_id: Long, embedding: Seq[Float], ts: java.sql.Timestamp)

/** Streaming exact dedup: first arrival per digest passes, later copies
  * within the watermark drop, state stays bounded by the window. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new java.sql.Timestamp(ms)

  test("firstArrivals keeps one row per content digest across " +
    "micro-batches, drops in-window copies") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = StreamingDedup
      .firstArrivals(stream.toDF(), "text", "ts", "10 minutes")
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(
        Doc(1L, "alpha", t(1000)), Doc(2L, "beta", t(2000)),
        Doc(3L, "alpha", t(3000)))
      query.processAllAvailable()
      stream.addData(
        Doc(4L, "alpha", t(4000)), // still within the watermark: drop
        Doc(5L, "gamma", t(5000))) // new content: pass
      query.processAllAvailable()
      val out = spark.table("dedup_out").as[(Long, String)]
        .collect().sortBy(_._1)
      assert(out.map(_._2).toSeq == Seq("alpha", "beta", "gamma"),
        out.mkString(","))
      assert(out.map(_._1).toSeq == Seq(1L, 2L, 5L), out.mkString(","))
    } finally query.stop()
  }

  test("nearDuplicatePairs finds near-dups planted ACROSS micro-batches " +
    "and matches the batch operator exactly (differential)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val other = "a completely different story about parquet files " * 8
    val third = "yet another unrelated corpus of streaming text " * 8
    val docs = Seq(
      Doc(1L, base, t(1000)),                            // batch 1
      Doc(2L, other, t(2000)),                           // batch 1
      Doc(3L, base.replace("jumps", "leaps"), t(61000)), // batch 2: ~1
      Doc(4L, third, t(62000)),                          // batch 2
      Doc(5L, other.replace("files", "rows"), t(121000)), // batch 3: ~2
      Doc(6L, base.replace("lazy", "hazy"), t(122000)))  // batch 3: ~1
    val batches = Seq(docs.take(2), docs.slice(2, 4), docs.drop(4))

    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val stream = MemoryStream[Doc]
    val query = StreamingDedup
      .nearDuplicatePairs(stream.toDF(), "doc_id", "text", "ts",
        watermarkDelayMs = 10 * 60 * 1000L, threshold = 0.5)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // a pair colliding in several bands emits once per band, always
        // within one micro-batch: batch-local dropDuplicates = exactly-once
        got.synchronized {
          got ++= batch.dropDuplicates("id_a", "id_b")
            .collect().map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }.start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()

    val streamed = got.toSet
    assert(streamed == Set(("1", "3"), ("2", "5"), ("1", "6")),
      s"streamed=$streamed")

    // differential: the batch path over the full static frame must
    // produce the identical pair set (same star-to-representative
    // semantics, same exact verify)
    val batchPairs = StreamingDedup
      .nearDuplicatePairs(docs.toDF(), "doc_id", "text", "ts",
        watermarkDelayMs = 10 * 60 * 1000L, threshold = 0.5)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(batchPairs == streamed,
      s"batch=$batchPairs != streamed=$streamed")
  }

  test("nearDuplicatePairs band state EVICTS past the watermark: a " +
    "near-dup arriving after the window re-admits silently") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "some boilerplate page body repeated again and again " * 8
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val stream = MemoryStream[Doc]
    val query = StreamingDedup
      .nearDuplicatePairs(stream.toDF(), "doc_id", "text", "ts",
        watermarkDelayMs = 60 * 1000L, threshold = 0.5)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.dropDuplicates("id_a", "id_b")
            .collect().map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }.start()
    try {
      stream.addData(Doc(1L, base, t(1000)))
      query.processAllAvailable()
      // push the watermark far past doc 1's band-state timeout
      stream.addData(Doc(2L, "something else entirely unrelated " * 8,
        t(10 * 60 * 1000)))
      query.processAllAvailable()
      // near-dup of doc 1, but its bands' state is long evicted
      stream.addData(Doc(3L, base.replace("again", "anew"),
        t(10 * 60 * 1000 + 1000)))
      query.processAllAvailable()
    } finally query.stop()
    assert(got.toSet == Set.empty,
      s"evicted band state must not pair: $got")
  }

  test("embeddingNearPairs (streaming SemDeDup) finds vector near-dups " +
    "planted ACROSS micro-batches and matches the batch operator " +
    "(differential); unrelated vectors never pair") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(9)
    def v(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(32)(r.nextGaussian().toFloat)
    }
    def perturb(base: Seq[Float]): Seq[Float] =
      base.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
    val a = v(1); val b = v(2); val c = v(3)
    val vecs = Seq(
      Vec(1L, a, t(1000)),            // batch 1
      Vec(2L, b, t(2000)),            // batch 1
      Vec(3L, perturb(a), t(61000)),  // batch 2: near-dup of 1
      Vec(4L, c, t(62000)),           // batch 2
      Vec(5L, perturb(b), t(121000))) // batch 3: near-dup of 2
    val batches = Seq(vecs.take(2), vecs.slice(2, 4), vecs.drop(4))
    val lsh = graft.llm.RandomHyperplaneLsh(dim = 32, bits = 2,
      tables = 24)

    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val stream = MemoryStream[Vec]
    val query = StreamingDedup
      .embeddingNearPairs(stream.toDF(), "vec_id", "embedding", "ts",
        watermarkDelayMs = 10 * 60 * 1000L, lsh = lsh, tau = 0.95)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.dropDuplicates("id_a", "id_b")
            .collect().map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }.start()
    try {
      batches.foreach { bt =>
        stream.addData(bt: _*); query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = got.toSet
    assert(streamed == Set(("1", "3"), ("2", "5")), s"streamed=$streamed")

    val batchPairs = StreamingDedup
      .embeddingNearPairs(vecs.toDF(), "vec_id", "embedding", "ts",
        watermarkDelayMs = 10 * 60 * 1000L, lsh = lsh, tau = 0.95)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(batchPairs == streamed,
      s"batch=$batchPairs != streamed=$streamed")
  }

  test("firstArrivals on a batch frame keeps the EARLIEST row per " +
    "digest, deterministically across partitionings") {
    val df = Seq(
      Doc(2L, "x", t(2000)), Doc(1L, "x", t(1000)), Doc(3L, "y", t(3000)))
      .toDF()
    val out = StreamingDedup.firstArrivals(df, "text", "ts", "10 minutes")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (3L, "y")), out.mkString(","))
    val reparted = StreamingDedup
      .firstArrivals(df.repartition(7), "text", "ts", "10 minutes")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(reparted == out, "batch survivor flapped with partitioning")
  }
}
