package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null-text / null-vector tolerance of the per-row closure paths.
  *
  * Spark invokes String- and Seq-typed Scala UDFs (and RDD closures)
  * WITH the null — there is no null-safe wrapping for reference
  * types — so before these guards ONE null-text document crashed the
  * whole encode/band/verify job, and the closure-job model fits
  * NPE'd where the expression plans they replaced silently dropped
  * the row by null propagation. The reference's own contract is null
  * tolerance at every level (SURVEY §2 P7). Pinned semantics:
  *
  *  - null text encodes to ZERO tokens (the SQL oracle's LEFT JOIN +
  *    COALESCE reads such a doc as n_bpe_tokens = 0);
  *  - null text shingles to the EMPTY set (substring of NULL yields
  *    no shingles in the oracle), so its Jaccard is 0.0 and it keys
  *    to no LSH bands — it can never pair with anything;
  *  - a null-vector / null-text row contributes NOTHING to a model
  *    fit: the learned centroids/weights equal the fit on the frame
  *    without the row (exactly what the former expression
  *    aggregations did — sums skip null terms).
  */
class NullToleranceSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(Bpe.Merge("l", "o"), Bpe.Merge("lo", "w"))

  test("Bpe.encode: null text -> zero tokens (oracle's COALESCE(n,0))") {
    val out = Bpe.encode(
      Seq((1L, "low lot"), (2L, null: String)).toDF("id", "text"),
      "text", merges)
      .orderBy("id")
      .select("bpe_tokens", "n_bpe_tokens")
      .as[(Seq[String], Int)].collect().toSeq
    assert(out(0) == ((Seq("low", "lo", "t"), 3)), out(0))
    assert(out(1) == ((Seq.empty[String], 0)), out(1))
  }

  test("textJaccard: null on either side is the empty set -> 0.0") {
    val d = Seq((null: String, "abcdabcd"), ("abcdabcd", null: String),
      (null: String, null: String)).toDF("a", "b")
    val j = d.select(Dedup.textJaccard(4)(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(j == Seq(0.0, 0.0, 0.0), j)
  }

  test("textBandKeys / minhashBandKeys: null (and empty) key to NO " +
    "bands, so shingle-less docs never co-bucket") {
    val d = Seq((1L, null: String), (2L, ""), (3L, "abcdefgh"))
      .toDF("id", "text")
    val tk = d.select(col("id"),
        Dedup.textBandKeys(4, 2, 2)(col("text")).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(tk(1L).isEmpty && tk(2L).isEmpty && tk(3L).nonEmpty, tk)
    val mk = d.select(col("id"),
        Dedup.minhashBandKeys(2, 2)(Dedup.shingles("text", 4)).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(mk(1L).isEmpty && mk(2L).isEmpty && mk(3L).nonEmpty, mk)
  }

  test("jaccardPairsExact: a null-text doc changes NOTHING (same " +
    "pair set as the corpus without it)") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "entirely different words frog moon satellite orbit"))
    val clean = Dedup.jaccardPairsExact(base.toDF("id", "text"),
        "id", "text", shingleLen = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val withNull = Dedup.jaccardPairsExact(
        (base :+ ((4L, null: String))).toDF("id", "text"),
        "id", "text", shingleLen = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clean == Set((1L, 2L)), clean)
    assert(withNull == clean, s"null doc changed pairs: $withNull")
  }

  test("Classifier.train: a null-text row contributes nothing — " +
    "weights identical to the fit without it") {
    val base = Seq(
      ("good long meaningful text with the many words", 1),
      ("bad", 0), ("the the the the stopword soup text", 1),
      ("x y", 0))
    val clean = Classifier.train(base.toDF("text", "y"),
      "text", col("y"), iters = 8)
    val withNull = Classifier.train(
      (base :+ ((null: String, 1))).toDF("text", "y"),
      "text", col("y"), iters = 8)
    assert(withNull == clean,
      s"null row moved the fit: $withNull vs $clean")
  }

  test("ivfTopK / LSH nearPairs / simhash64: null vectors and texts " +
    "index to nothing and crash nothing") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, null: Seq[Float]))
    val d = vecs.toDF("id", "vec")
    // IVF: null data vec lands in no list; null query probes nothing
    val ivf = Similarity.ivfTopK(d, d, "id", "vec",
      nlist = 2, nprobe = 2, k = 2)
    val byQuery = ivf.select("q_id").as[Long].collect().toSet
    assert(!byQuery.contains(4L), "null query returned results")
    assert(ivf.filter(col("id") === 4L).count() == 0,
      "null data vector was indexed")
    // LSH pairs: null vec keys to no buckets -> appears in no pair
    val pairs = RandomHyperplaneLsh(dim = 2, bits = 2, tables = 2)
      .nearPairs(d, "id", "vec", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty && !pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"null vector paired: $pairs")
    // simhash: null ≡ empty text, deterministic, no crash
    val fp = Seq((1L, null: String), (2L, ""))
      .toDF("id", "text")
      .select(Dedup.simhash64()(col("text"))).as[Long].collect().toSeq
    assert(fp(0) == fp(1), s"null and empty text fingerprints differ: $fp")
    // the >ExprAssignMaxK UDF assignment branch: null vec -> null
    // cluster_id, same as the expression branch
    val manyCents = (0 until Clustering.ExprAssignMaxK + 1)
      .map(i => Array(i.toFloat, 1.0f))
    val assigned = Clustering.assignClusters(d, "id", "vec", manyCents)
      .orderBy("id").select("cluster_id").collect().toSeq
    assert(assigned(3).isNullAt(0), s"null vec got a cluster: $assigned")
  }

  test("Classifier.score: null text -> NULL margin but keep_pred 0, " +
    "matching the oracle's CASE WHEN dot > 0 THEN 1 ELSE 0") {
    val m = Classifier.Model(IndexedSeq(1L, 2L, 3L, 4L, 5L))
    val out = Classifier.score(
      Seq((1L, "some words"), (2L, null: String)).toDF("id", "text"),
      "id", "text", m)
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(0).getInt(2) == 1 ||
      out(0).getInt(2) == 0) // non-null doc: defined 0/1
    assert(out(1).isNullAt(1), "null text should have NULL margin")
    assert(out(1).getInt(2) == 0,
      s"null margin must predict keep_pred 0 (oracle's ELSE), got " +
        s"${out(1).get(2)}")
  }

  test("Clustering.kmeans: a null-vector row contributes nothing — " +
    "centroids identical to the fit without it") {
    val base = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)),
      (3L, Seq(5.0f, 5.0f)), (4L, Seq(5.1f, 5.0f)))
    val clean = Clustering.kmeans(base.toDF("id", "vec"),
      "id", "vec", k = 2, iters = 3)._2
    val withNull = Clustering.kmeans(
      (base :+ ((5L, null: Seq[Float]))).toDF("id", "vec"),
      "id", "vec", k = 2, iters = 3)._2
    assert(withNull.map(_.toSeq) == clean.map(_.toSeq),
      s"null vector moved the centroids")
  }
}
