package graft.tools

import graft.llm.{IvfPq, Pq, Similarity, SimilarityEval}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-margin soak for the compressed-ANN family (q79-q84: PQ and
  * IVF-PQ with exact re-rank) — the [[ClusterSoak]] pattern applied to
  * the retrieval index. The growth curve is the evidence, and the soak
  * runs the DOCUMENTED 100 TB scaling rules rather than one fixed
  * configuration:
  *
  *   - codebook size m·ksub is corpus-independent (the whole point of
  *     PQ: m bytes/vector no matter n) — FIXED across scales, which
  *     also soaks the m·ksub codegen'd projection the way the r11
  *     cluster soak caught the k=240 blowup;
  *   - IVF-PQ's coarse `nlist` grows ~sqrt(n) (the IVFADC sizing that
  *     keeps cells near sqrt(n) so probe cost nprobe·n/nlist and cell
  *     count balance);
  *   - the refine knobs are NOT fixed: the tuned operators
  *     ([[Pq.refinedTopKAutoTuned]] / [[IvfPq.refinedSearchAutoTuned]])
  *     walk shortlist (and nprobe) per scale until the probe sample
  *     meets the recall target — recall STABILITY under growth is the
  *     correctness half of the soak, the paid knob values are the cost
  *     half.
  *
  * Corpus: [[ClusterSoak.corpus]] — 64 well-separated gaussian groups
  * (PQ's honest geometry: the near-uniform sf0.1 embeddings are its
  * documented pathological case) plus planted near-dup pairs, fully
  * deterministic and generated per-partition. Queries: the 32 lowest
  * ids (one per group, groups 0..31); the tuners sample the first 16,
  * the reported recall covers ALL 32 — half the queries are held out
  * from tuning.
  *
  * Success criteria: tuned min-recall@10 >= target at EVERY scale
  * (flat under growth), and train/encode/search time ratios at k×
  * scale well under k² (sub-quadratic). One JSON line per scale + a
  * final ratios line. */
object AnnSoak {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    // machine-readable output contract (★r19 default-locale
    // sweep): the f"" interpolator formats through the JVM DEFAULT
    // locale, so a comma-decimal locale (de-DE, tr-TR) would emit
    // "1,234" into the JSON lines the driver parses
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val scales = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val baseVecs = 2000L
    val target = 0.95
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode(SaveMode.Overwrite).save()

    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    scales.foreach { s =>
      val n = baseVecs * s
      val data = ClusterSoak.corpus(spark, n).persist()
      data.count() // materialize outside the timed sections
      val queries = data.filter(col("vec_id") < 32).persist()
      queries.count()

      // ground truth once per scale, ALL 32 queries (the tuners
      // re-derive their own over the 16-query sample; this one also
      // scores the 16 held-out queries)
      val exact = Similarity.bruteForceTopK(data, queries, "vec_id",
        "embedding", k).localCheckpoint(true)
      def minRecall(approx: DataFrame): Double =
        SimilarityEval.recallAtK(approx, exact, "vec_id", k)
          .agg(min(col("recall"))).head().getDouble(0)

      // ---- PQ: fixed-size codebook, tuned shortlist ----
      val (cb, tTrainPq) = timed {
        Pq.train(data, "vec_id", "embedding", m = 16, ksub = 16,
          iters = 3)
      }
      val (_, tEncodePq) = timed {
        Pq.encode(data, "vec_id", "embedding", cb).count()
      }
      val ((pqTop, paidShortlist), tSearchPq) = timed {
        val r = Pq.refinedTopKAutoTuned(data, queries, "vec_id",
          "embedding", cb, k, target, initialShortlist = 100)
        (r._1.localCheckpoint(true), r._2)
      }
      val pqRecall = minRecall(pqTop)

      // ---- IVF-PQ: nlist ~ sqrt(n), tuned (nprobe, shortlist) ----
      val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
      val (model, tTrainIvf) = timed {
        IvfPq.train(data, "vec_id", "embedding", nlist, m = 16,
          ksub = 16, iters = 3)
      }
      val (_, tEncodeIvf) = timed {
        IvfPq.encode(data, "vec_id", "embedding", model).count()
      }
      val ((ivfTop, paidNprobe, paidSl), tSearchIvf) = timed {
        val r = IvfPq.refinedSearchAutoTuned(data, queries, "vec_id",
          "embedding", model, k, target, initialNprobe = 4,
          initialShortlist = 100)
        (r._1.localCheckpoint(true), r._2, r._3)
      }
      val ivfRecall = minRecall(ivfTop)

      data.unpersist(); queries.unpersist()
      require(pqRecall >= target - 0.05,
        s"scale $s: PQ tuned recall $pqRecall eroded below " +
          s"target $target (held-out slack 0.05)")
      require(ivfRecall >= target - 0.05,
        s"scale $s: IVF-PQ tuned recall $ivfRecall eroded below " +
          s"target $target (held-out slack 0.05)")
      results(s) = Map("vecs" -> n.toDouble,
        "pq_train_sec" -> tTrainPq, "pq_encode_sec" -> tEncodePq,
        "pq_search_sec" -> tSearchPq,
        "ivfpq_train_sec" -> tTrainIvf,
        "ivfpq_encode_sec" -> tEncodeIvf,
        "ivfpq_search_sec" -> tSearchIvf)
      println(s"""{"scale":$s,"vecs":$n,"nlist":$nlist,""" +
        s""""pq_train_sec":${f"$tTrainPq%.2f"},""" +
        s""""pq_encode_sec":${f"$tEncodePq%.2f"},""" +
        s""""pq_search_sec":${f"$tSearchPq%.2f"},""" +
        s""""pq_recall":${f"$pqRecall%.3f"},""" +
        s""""pq_shortlist":$paidShortlist,""" +
        s""""ivfpq_train_sec":${f"$tTrainIvf%.2f"},""" +
        s""""ivfpq_encode_sec":${f"$tEncodeIvf%.2f"},""" +
        s""""ivfpq_search_sec":${f"$tSearchIvf%.2f"},""" +
        s""""ivfpq_recall":${f"$ivfRecall%.3f"},""" +
        s""""ivfpq_nprobe":$paidNprobe,""" +
        s""""ivfpq_shortlist":$paidSl}""")
    }

    if (scales.size >= 2) {
      val lo = results(scales.head); val hi = results(scales.last)
      val kRatio = hi("vecs") / lo("vecs")
      def ratio(m: String) = hi(m) / math.max(lo(m), 1e-9)
      println(s"""{"metric":"ann_soak_ratios",""" +
        s""""scale_ratio":$kRatio,""" +
        s""""pq_train_ratio":${f"${ratio("pq_train_sec")}%.2f"},""" +
        s""""pq_encode_ratio":${f"${ratio("pq_encode_sec")}%.2f"},""" +
        s""""pq_search_ratio":${f"${ratio("pq_search_sec")}%.2f"},""" +
        s""""ivfpq_train_ratio":${f"${ratio("ivfpq_train_sec")}%.2f"},""" +
        s""""ivfpq_encode_ratio":${f"${ratio("ivfpq_encode_sec")}%.2f"},""" +
        s""""ivfpq_search_ratio":${f"${ratio("ivfpq_search_sec")}%.2f"}}""")
    }
    spark.stop()
  }
}
