package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

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
