package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Reciprocal-rank fusion ([[TextStats.rrfFuse]]): integer contribution
  * arithmetic, cross-system id union, and deterministic tie-breaks. */
class RrfSpec extends SparkSpec {

  private def ranking(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "rank")
  }

  private def fused(df: DataFrame): Seq[(Long, Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3))).toSeq

  test("integer contributions sum exactly; union of systems") {
    // scale 1000, kRrf 1: rank r contributes 1000 div (1 + r)
    val a = ranking(10L -> 1, 11L -> 2, 12L -> 3) // 500, 333, 250
    val b = ranking(11L -> 1, 13L -> 2)           // 500, 333
    val out = fused(TextStats.rrfFuse(Seq(a, b), "id",
      kRrf = 1, scale = 1000L, k = 10))
    // 11: 333+500=833 (2 systems); 10: 500; 13: 333; 12: 250
    assert(out === Seq(
      (11L, 2L, 833L, 1), (10L, 1L, 500L, 2),
      (13L, 1L, 333L, 3), (12L, 1L, 250L, 4)))
  }

  test("score ties break by id ascending; k cuts after the sort") {
    val a = ranking(7L -> 1, 3L -> 2)
    val b = ranking(3L -> 1, 7L -> 2) // both ids score 500+333
    val out = fused(TextStats.rrfFuse(Seq(a, b), "id",
      kRrf = 1, scale = 1000L, k = 1))
    assert(out === Seq((3L, 2L, 833L, 1)))
  }

  test("fusing a ranking with itself doubles scores, keeps the order") {
    val a = ranking(1L -> 1, 2L -> 2, 3L -> 3)
    val once = fused(TextStats.rrfFuse(Seq(a), "id",
      kRrf = 60, scale = 1000000000L, k = 10))
    val twice = fused(TextStats.rrfFuse(Seq(a, a), "id",
      kRrf = 60, scale = 1000000000L, k = 10))
    assert(once.map(_._1) === twice.map(_._1))
    assert(twice.map(_._3) === once.map(_._3).map(_ * 2))
    assert(twice.forall(_._2 == 2L))
  }
}
