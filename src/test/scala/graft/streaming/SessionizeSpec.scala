package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Ev(user_id: Long, ts: java.sql.Timestamp)

/** Streaming gap-sessionization: sessions planted ACROSS micro-batches
  * close exactly once — on the next-session arrival or on event-time
  * timeout — and match the batch (q39-shaped) operator. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new java.sql.Timestamp(ms)
  private val gap = 60 * 1000L // 60 s

  private def runStream(batches: Seq[Seq[Ev]],
                        delay: String = "5 seconds")
      : Set[(String, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val got =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    val stream = MemoryStream[Ev]
    val query = Sessionize
      .sessions(stream.toDF(), "user_id", "ts", gap, delay)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r =>
            (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }.start()
    try {
      batches.foreach { b => stream.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()
    got.toSet
  }

  test("sessions close on next-session arrival AND on event-time " +
    "timeout; result matches the batch operator (differential)") {
    // user 1: two sessions — {1s, 30s} then {200s, 210s}
    // user 2: one chained session {5s, 50s, 95s} (each hop < 60s gap)
    val evs = Seq(
      Ev(1L, t(1000)), Ev(2L, t(5000)),            // batch 1
      Ev(1L, t(30000)), Ev(2L, t(50000)),          // batch 2
      Ev(1L, t(200000)), Ev(2L, t(95000)),         // batch 3 (closes 1's
      Ev(1L, t(210000)))                           //   first session)
    // sentinel user 99 advances the watermark past every end+gap; the
    // second sentinel batch lets the resulting timeouts fire
    val sentinels = Seq(Ev(99L, t(10000000)), Ev(99L, t(10100000)))
    val streamed = runStream(Seq(
      evs.take(2), evs.slice(2, 4), evs.drop(4),
      Seq(sentinels(0)), Seq(sentinels(1))))
      .filter(_._1 != "99")
    val expected = Set(
      ("1", 1000L, 30000L, 2L),
      ("1", 200000L, 210000L, 2L),
      ("2", 5000L, 95000L, 3L))
    assert(streamed == expected, s"streamed=$streamed")

    // differential: the batch path over the full static frame (the q39
    // window shape) must produce the identical session set
    val batch = Sessionize
      .sessions(evs.toDF(), "user_id", "ts", gap, "5 seconds")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(batch == expected, s"batch=$batch")
  }

  test("out-of-order arrival within the gap merges exactly (extends " +
    "the open session backwards); matches batch") {
    // 50s arrives first, then 20s in a LATER micro-batch (30s behind,
    // within the 60s gap and the 2-minute watermark delay)
    val evs = Seq(Ev(7L, t(50000)), Ev(7L, t(20000)))
    val streamed = runStream(Seq(
      Seq(evs(0)), Seq(evs(1)),
      Seq(Ev(99L, t(10000000))), Seq(Ev(99L, t(10100000)))),
      delay = "2 minutes").filter(_._1 != "99")
    assert(streamed == Set(("7", 20000L, 50000L, 2L)),
      s"streamed=$streamed")
    val batch = Sessionize
      .sessions(evs.toDF(), "user_id", "ts", gap, "2 minutes")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("a straggler more than one gap behind the open session emits as " +
    "its own immediately-closed session (documented approximation)") {
    val streamed = runStream(Seq(
      Seq(Ev(3L, t(500000))),
      Seq(Ev(3L, t(100000))), // 400s behind: beyond gap, own session
      Seq(Ev(99L, t(10000000))), Seq(Ev(99L, t(10100000)))),
      delay = "10 minutes").filter(_._1 != "99")
    assert(streamed == Set(
      ("3", 100000L, 100000L, 1L),
      ("3", 500000L, 500000L, 1L)), s"streamed=$streamed")
  }

  test("batch plan shuffles exactly ONCE, on the user key (the window " +
    "and the session aggregation share the partitioning)") {
    // 100 TB contract: per-user window → per-(user, session) groupBy.
    // HashPartitioning(user) satisfies the ClusteredDistribution of the
    // (user, sid) aggregation (subset clustering), so Catalyst must not
    // insert a second exchange — one shuffle for the whole operator.
    val evs = Seq(Ev(1L, t(1000)), Ev(1L, t(30000)), Ev(2L, t(5000)))
    val plan = Sessionize
      .sessions(evs.toDF().repartition(4), "user_id", "ts", gap, "5 seconds")
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("batch path is deterministic across partitionings and handles " +
    "an empty frame") {
    val evs = Seq(Ev(1L, t(1000)), Ev(1L, t(30000)), Ev(1L, t(200000)))
    val a = Sessionize.sessions(evs.toDF(), "user_id", "ts", gap, "5 seconds")
      .as[(String, Long, Long, Long)].collect().toSet
    val b = Sessionize
      .sessions(evs.toDF().repartition(7), "user_id", "ts", gap, "5 seconds")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b && a == Set(
      ("1", 1000L, 30000L, 2L), ("1", 200000L, 200000L, 1L)))
    val empty = Sessionize.sessions(
      Seq.empty[Ev].toDF(), "user_id", "ts", gap, "5 seconds")
    assert(empty.count() == 0)
  }
}
