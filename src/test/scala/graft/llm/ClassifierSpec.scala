package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The linear quality classifier must LEARN (separable rule → perfect
  * training margin signs), be bit-deterministic across fits, take
  * exactly the hand-computed first gradient step, and score as a
  * shuffle-free integer projection matching the literal dot product. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // label = "long document" (>= 6 tokens): linearly separable in the
  // n_tokens feature, so GD must reach 100% training accuracy
  private val separable = Seq(
    (1L, "the cat sat on a mat quietly today"),
    (2L, "a dog ran over the green hill fast"),
    (3L, "the quick brown fox jumps over it"),
    (4L, "cat mat"),
    (5L, "dog ran"),
    (6L, "tiny"),
    (7L, "one two three four five six seven eight"),
    (8L, "短 doc"))

  test("learns a separable length rule to perfect training accuracy") {
    val df = separable.toDF("doc_id", "text")
    val label = size(split(col("text"), " ")) >= 6
    val model = Classifier.train(df, "text", label,
      iters = 80, lrNum = 1, lrDen = 20)
    val scored = Classifier.score(df, "doc_id", "text", model)
      .join(df.select(col("doc_id"), label.cast("int").as("y")), "doc_id")
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(r.getAs[Int]("keep_pred") == r.getAs[Int]("y"),
        s"doc ${r.getAs[Long]("doc_id")} misclassified: $r")
    }
  }

  test("training is bit-deterministic across fits") {
    val df = separable.toDF("doc_id", "text")
    val label = size(split(col("text"), " ")) >= 6
    val a = Classifier.train(df, "text", label, iters = 25)
    val b = Classifier.train(df, "text", label, iters = 25)
    assert(a.weightsMicro == b.weightsMicro)
  }

  test("one gradient step matches the hand-computed update") {
    // two docs, label = first: at w=0 every margin is 0, sigmoid 0.5,
    // residual_micro = 500000 - y_micro
    val df = Seq((1L, "the cat"), (2L, "dog ran far")).toDF("doc_id", "text")
    val model = Classifier.train(df, "text", col("doc_id") === 1L,
      iters = 1, lrNum = 1, lrDen = 2)
    // features: doc1 [1, 2, 2, 7, 1]  (stopword "the"), y=1 -> r=-500000
    //           doc2 [1, 3, 3, 11, 0], y=0 -> r=+500000
    val g = Seq(
      -500000L * 1 + 500000L * 1,
      -500000L * 2 + 500000L * 3,
      -500000L * 2 + 500000L * 3,
      -500000L * 7 + 500000L * 11,
      -500000L * 1 + 500000L * 0)
    val sq = Seq(1L * 1 + 1 * 1, 2L * 2 + 3 * 3, 2L * 2 + 3 * 3,
      7L * 7 + 11 * 11, 1L * 1 + 0 * 0)
    val expected = g.zip(sq).map { case (gj, sj) =>
      -((1L * 4 * gj) / (2L * sj)) }
    assert(model.weightsMicro == expected,
      s"got ${model.weightsMicro}, want $expected")
  }

  test("score is the literal dot product, as a shuffle-free projection") {
    val df = Seq((1L, "the cat"), (2L, "dog ran far")).toDF("doc_id", "text")
    val model = Classifier.Model(IndexedSeq(10L, -3L, 5L, 2L, 100L))
    val scored = Classifier.score(df, "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"scoring must not shuffle:\n$plan")
    val byId = scored.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // doc1 [1,2,2,7,1]: 10 - 6 + 10 + 14 + 100 = 128
    // doc2 [1,3,3,11,0]: 10 - 9 + 15 + 22 + 0 = 38
    assert(byId(1L) == ((128L, 1)))
    assert(byId(2L) == ((38L, 1)))
  }

  test("oracle SQL folds the same weights into the same arithmetic") {
    val model = Classifier.Model(IndexedSeq(10L, -3L, 5L, 2L, 100L))
    val sql = Classifier.scoreOracleSql(model)
    assert(sql.contains("CAST(10 AS BIGINT) * CAST(1 AS BIGINT)"))
    assert(sql.contains("CAST(-3 AS BIGINT)"))
    assert(sql.contains("margin_micro"))
    assert(sql.contains("keep_pred"))
    // stopword literals present in the n_stop feature
    assert(sql.contains("'the'"))
  }

  test("empty training frame fails loudly") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Classifier.train(df, "text", lit(true))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("distillation: the student broadly agrees with the rule teacher") {
    // non-separable teacher (the qualityKeep box rule): the linear
    // student should still agree on a clear majority of rows
    val docs = (1L to 60L).map { i =>
      val n = (i % 12 + 1).toInt * 5
      (i, Seq.tabulate(n)(j => if (j % 4 == 0) "the" else s"w${j % (n / 2 + 1)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val teacher = TextStats.qualityKeep(col("text"))
    val model = Classifier.train(docs, "text", teacher, iters = 80)
    val agree = Classifier.score(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id"), teacher.cast("int").as("y")), "doc_id")
      .select(avg((col("keep_pred") === col("y")).cast("double")))
      .collect()(0).getDouble(0)
    assert(agree >= 0.7, s"student/teacher agreement only $agree")
  }
}
