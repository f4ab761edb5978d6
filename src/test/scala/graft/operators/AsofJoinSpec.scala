package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join: boundary inclusion, no-prior-event probes, (ts, id)
  * tie-break, per-key isolation, partitioning invariance. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(evRows: Seq[(Long, Long, Long, String)],
                  prRows: Seq[(Long, Long, Long)],
                  parts: Int = 1) = {
    val ev = evRows.toDF("user_id", "ts", "event_id", "event_type")
    val pr = prRows.toDF("user_id", "ts", "probe_id")
    AsofJoin.lastEventAsOf(
      if (parts > 1) ev.repartition(parts) else ev,
      if (parts > 1) pr.repartition(parts) else pr,
      "user_id", "ts", tieCols = Seq("event_id"),
      payload = Seq("event_id", "event_type"),
      probeCols = Seq("probe_id"))
      .select("user_id", "probe_id", "probe_ts", "last_ts",
        "last_event_id", "last_event_type", "n_before")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) null else r.getString(5),
        r.getLong(6)))
      .sortBy(r => (r._1, r._2)).toSeq
  }

  test("boundary inclusion, ties by event_id, per-key isolation, " +
    "probe before any event yields null state") {
    val ev = Seq(
      (1L, 10L, 100L, "a"),
      (1L, 20L, 101L, "b"),
      (1L, 20L, 102L, "c"), // same ts: higher id wins the tie
      (1L, 30L, 103L, "d"),
      (2L, 15L, 200L, "x"))
    val pr = Seq(
      (1L, 5L, 1L),   // before any event -> nulls, n_before 0
      (1L, 20L, 2L),  // ON the tie: sees both ts=20 events, id 102 wins
      (1L, 25L, 3L),  // between events
      (2L, 15L, 4L))  // exact-ts boundary on the other key
    val out = run(ev, pr)
    assert(out == Seq(
      (1L, 1L, 5L, -1L, -1L, null, 0L),
      (1L, 2L, 20L, 20L, 102L, "c", 3L),
      (1L, 3L, 25L, 20L, 102L, "c", 3L),
      (2L, 4L, 15L, 15L, 200L, "x", 1L)), out)
    // partitioning invariance
    assert(run(ev, pr, parts = 7) == out)
  }

  test("plan: one key shuffle feeding the window, no cartesian") {
    val ev = Seq((1L, 10L, 100L, "a")).toDF(
      "user_id", "ts", "event_id", "event_type")
    val pr = Seq((1L, 11L, 1L)).toDF("user_id", "ts", "probe_id")
    val plan = AsofJoin.lastEventAsOf(ev, pr, "user_id", "ts",
      Seq("event_id"), Seq("event_id"), Seq("probe_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"$shuffles key shuffles:\n$plan")
  }
}
