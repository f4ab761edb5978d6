package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic k-means + SemDeDup: partitioning invariance (the
  * exact-decimal mean contract), assignment tie-break, cluster
  * coherence on separated data, and the keep-earliest dominance rule.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeans assignments + centroids are IDENTICAL across input " +
    "partitionings (exact-decimal means, seeded init)") {
    val (a1, c1) = Clustering.kmeans(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val (a2, c2) = Clustering.kmeans(emb.repartition(7), "vec_id",
      "embedding", k = 8, iters = 3)
    assert(c1.map(_.toSeq) == c2.map(_.toSeq),
      "centroids must not depend on partitioning")
    val s1 = a1.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), r.getInt(1))).toSeq
    val s2 = a2.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), r.getInt(1))).toSeq
    assert(s1 == s2)
    assert(s1.map(_._2).distinct.size > 1, "more than one cluster used")
  }

  test("kmeans on well-separated direction clusters recovers them " +
    "(every planted group lands in one cluster)") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    val rows = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x =>
        (x + rnd.nextGaussian() * 0.02).toFloat).toSeq)
    }
    val data = rows.toDF("vec_id", "embedding")
    val (assigned, _) = Clustering.kmeans(data, "vec_id", "embedding",
      k = 4, iters = 5)
    // farthest-first init picks one seed per separated group by
    // construction — so full recovery (a bijection between planted
    // groups and learned clusters) is the guaranteed property here,
    // where a one-shot sampled init could split/mix groups
    val groups = assigned.collect()
      .map(r => (r.getLong(0) % 4, r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    groups.foreach { case (g, cs) =>
      assert(cs.size == 1, s"planted group $g split across clusters $cs")
    }
    assert(groups.values.flatten.toSet.size == 4,
      "distinct planted groups must land in distinct clusters")
  }

  test("farthestFirstInit accepts STRING ids (generic Comparable " +
    "tie-break, ADVICE r17) and picks the same centroids as the " +
    "integral-id frame under the aligned order") {
    // vectors chosen so scores tie nowhere except the seed pick —
    // the id order only selects the FIRST centroid; "d01".."d10"
    // sort like 1..10 zero-padded, so both frames must choose the
    // same vector sequence
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 10).map(_ => Array.fill(8)(rnd.nextGaussian().toFloat))
    val longIds = vecs.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v.toSeq) }
      .toDF("id", "vec")
    val strIds = vecs.zipWithIndex
      .map { case (v, i) => (f"d${i + 1}%02d", v.toSeq) }
      .toDF("id", "vec")
    val a = Clustering.farthestFirstInit(longIds, "id", "vec", k = 3)
    val b = Clustering.farthestFirstInit(strIds, "id", "vec", k = 3)
    assert(a.map(_.toSeq) == b.map(_.toSeq),
      "string-id frame must pick the same centroid sequence")
    // and a decidedly non-orderable id column still fails loudly
    val arr = vecs.take(2).zipWithIndex
      .map { case (v, i) => (Seq(i.toLong), v.toSeq) }.toDF("id", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      Clustering.farthestFirstInit(arr, "id", "vec", k = 2)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("orderable")), e.getMessage)
  }

  test("assignClusters ties break to the LOWER cluster index") {
    val data = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    // two identical centroids: cosine ties exactly; first must win
    val out = Clustering.assignClusters(data, "vec_id", "embedding",
      Seq(Array(1f, 0f), Array(1f, 0f), Array(0f, 1f)))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 0)))
  }

  test("semanticDedup keeps the EARLIEST member of a near-duplicate " +
    "group and everything below tau; output clusters match kmeans") {
    val base = Array.fill(16)(1.0f)
    val far = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = Seq(
      (10L, base.toSeq),                       // kept (earliest copy)
      (11L, base.map(x => x * 2.0f).toSeq),    // cosine 1 with 10 -> drop
      (12L, base.toSeq),                       // exact copy -> drop
      (20L, far.toSeq))                        // unrelated -> kept
    val data = rows.toDF("vec_id", "embedding")
    val kept = Clustering.semanticDedup(data, "vec_id", "embedding",
      k = 2, iters = 3, tau = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L), kept)
  }

  test("large-k UDF assignment path ≡ the expression path's argmax " +
    "(differential vs a driver-side replay of the exact formula)") {
    val rnd = new scala.util.Random(3)
    val cents = Seq.fill(Clustering.ExprAssignMaxK + 8)(
      Array.fill(64)(rnd.nextGaussian().toFloat))
    val got = Clustering.assignClusters(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Seq[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val m = math.min(a.length, b.length)
      var i = 0
      while (i < m) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    emb.collect().foreach { r =>
      val v = r.getSeq[Float](1)
      val sims = cents.map(cos(v, _))
      val want = sims.indexOf(sims.max) // first max = lower-index ties
      assert(got(r.getLong(0)) == want)
    }
  }

  test("assignClusters plans as a pure projection: no Exchange, no " +
    "UDF, inside whole-stage codegen") {
    val cents = Seq(Array.fill(64)(0.1f), Array.fill(64)(-0.1f))
    val plan = Clustering.assignClusters(emb, "vec_id", "embedding",
      cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the "*(1)" stage markers are how executedPlan.toString renders
    // whole-stage-codegen membership
    assert(plan.contains("*(1) Project"), plan)
  }

  test("semanticDedup plan: no Window operator and no cartesian — the " +
    "pair stage is a cluster_id equi-join") {
    val plan = Clustering.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 1, tau = 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("oracle SQL embeds exact double literals and one sim per " +
    "centroid (shape check; value parity is the q57/q58 gate)") {
    val sql = Clustering.kmeansOracleSql(
      Seq(Array(0.1f, 2f), Array(3f, 4f)))
    // 0.1f printed as its exact double value, not the float shortest-repr
    assert(sql.contains("0.10000000149011612"), sql)
    // sims built ONCE in the `s` CTE: exactly one cosine per centroid
    assert("list_cosine_similarity".r.findAllIn(sql).size == 2, sql)
    val dd = Clustering.semanticDedupOracleSql(
      Seq(Array(1f, 0f)), tau = 0.42)
    assert(dd.contains("NOT EXISTS") && dd.contains(">= 0.42"), dd)
  }
}
