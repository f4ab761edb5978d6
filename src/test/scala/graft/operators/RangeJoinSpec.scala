package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed range join: brute-force differential over randomized
  * intervals (boundary-inclusive, bucket-straddling), no-dup
  * guarantee, loud failure on inverted intervals, and the
  * no-nested-loop plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches a brute-force BETWEEN join exactly on randomized " +
    "intervals straddling bucket boundaries; no duplicate pairs") {
    val rnd = new scala.util.Random(23)
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(300).toLong) // spans 0..299, W=100
    }
    val points = (1 to 120).map(j =>
      (1000L + j, rnd.nextInt(1400).toLong - 100))
    val ivDf = intervals.toDF("iv_id", "lo", "hi")
    val ptDf = points.toDF("point_id", "pt")
    val got = RangeJoin.pointInInterval(ptDf, "pt", ivDf, "lo", "hi",
      bucketWidth = 100)
      .select("point_id", "iv_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    val want = for {
      (pid, pt) <- points
      (ivId, lo, hi) <- intervals
      if pt >= lo && pt <= hi
    } yield (pid, ivId)
    assert(got.toSet == want.toSet,
      s"missing=${want.toSet -- got.toSet} extra=${got.toSet -- want.toSet}")
    assert(want.nonEmpty, "test data produced no matches")
  }

  test("inverted interval (lo > hi) fails loudly") {
    val iv = Seq((1L, 10L, 5L)).toDF("iv_id", "lo", "hi")
    val pt = Seq((1L, 7L)).toDF("point_id", "pt")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pt, "pt", iv, "lo", "hi", 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("lo > hi")), e)
  }

  test("plan is a hash equi-join on the bucket id — no " +
    "BroadcastNestedLoop, no Cartesian") {
    val iv = Seq((1L, 0L, 50L)).toDF("iv_id", "lo", "hi")
    val pt = Seq((1L, 7L)).toDF("point_id", "pt")
    val plan = RangeJoin.pointInInterval(pt, "pt", iv, "lo", "hi", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("intervalOverlap matches a brute-force overlap join exactly on " +
    "randomized bucket-straddling intervals — each pair EXACTLY once") {
    val rnd = new scala.util.Random(31)
    val as = (1 to 60).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(350).toLong)
    }
    val bs = (1 to 60).map { j =>
      val lo = rnd.nextInt(1000).toLong - 100
      (100L + j, lo, lo + rnd.nextInt(250).toLong)
    }
    val got = RangeJoin.intervalOverlap(
      as.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
      bs.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi",
      bucketWidth = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "duplicate pairs emitted")
    val want = for {
      (aId, alo, ahi) <- as
      (bId, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (aId, bId)
    assert(got.sorted == want.sorted,
      s"got ${got.size} want ${want.size}")
  }

  test("intervalOverlap: touching endpoints overlap (inclusive); " +
    "disjoint intervals do not; inverted interval fails loudly") {
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 100L, 200L), (11L, 101L, 150L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b,
      "b_lo", "b_hi", 64).select("b_id").as[Long].collect().toSeq
    assert(got == Seq(10L), s"got $got")
    val bad = Seq((2L, 9L, 3L)).toDF("a_id", "a_lo", "a_hi")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(bad, "a_lo", "a_hi", b,
        "b_lo", "b_hi", 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("a_lo > a_hi")), e)
  }

  test("intervalOverlap plan is a hash equi-join — no nested loop") {
    val a = Seq((1L, 0L, 50L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 10L, 60L)).toDF("b_id", "b_lo", "b_hi")
    val plan = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b,
      "b_lo", "b_hi", 100).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }
}
