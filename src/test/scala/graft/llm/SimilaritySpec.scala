package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN operators: exactness of the brute-force baseline, LSH candidate
  * equivalence at recall-tuned parameters, and the no-cartesian plan
  * guarantee for the bucketed path.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine() matches a hand-computed value") {
    val d = Seq((Seq(1f, 0f, 1f), Seq(1f, 1f, 0f))).toDF("a", "b")
    val c = d.select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt2*sqrt2
  }

  test("zero-norm vectors score 0, not NaN") {
    val d = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(d.select(Similarity.cosine(col("a"), col("b")))
      .as[Double].head() == 0.0)
  }

  test("LSH top-k equals brute-force top-k at recall-tuned parameters") {
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val lsh = RandomHyperplaneLsh(64, bits = 2, tables = 32)
      .topK(emb, queries, "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(lsh == brute)
  }

  test("LSH plan contains no cartesian product and broadcasts queries") {
    val plan = RandomHyperplaneLsh(64, 2, 8)
      .topK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast join in:\n$plan")
  }

  test("higher bit-width prunes candidates (fewer than all pairs)") {
    // 12 bits over near-uniform vectors: buckets rarely collide, so the
    // candidate set must be far below N*Q — demonstrates actual pruning
    val lsh = RandomHyperplaneLsh(64, bits = 12, tables = 2)
    val data = emb.withColumn("_bucket", explode(lsh.signature(col("embedding"))))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .withColumn("_bucket", explode(lsh.signature(col("embedding"))))
    val nCand = data.join(broadcast(q.drop("embedding")), "_bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct().count()
    val total = emb.count() * 3
    assert(nCand < total / 4, s"no pruning: $nCand of $total pairs")
  }
}
