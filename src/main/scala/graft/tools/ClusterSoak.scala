package graft.tools

import graft.llm.Clustering
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-margin soak for the clustering family (q57 k-means, q58
  * SemDeDup) — the growth curve is the evidence, and the soak runs the
  * DOCUMENTED 100 TB scaling rule rather than a fixed configuration:
  * `k` scales with `n` (constant target cluster size), so the
  * in-cluster pair stage stays `n × clusterSize` (linear), not the
  * quadratic blowup a fixed small `k` would give; and at soak-scale
  * `k` the init switches from farthest-first (k scans — the coarse-k
  * tool) to the pre-sampled hash-order init the
  * [[Clustering.farthestFirstInit]] scaladoc prescribes.
  *
  * Planted structure (deterministic, generated per-partition — no
  * driver-side corpus):
  *
  *   - 64 well-separated gaussian direction groups (vector `i` sits on
  *     direction `i % 64` + per-dim noise 0.5): in-group cosine ≈ 0.8,
  *     cross-group ≈ 0 — far below tau, so groups alone dedup nothing.
  *   - a near-duplicate PAIR every 100 ids (`id % 100 == 1` copies
  *     `id-1` with 0.01 noise, cosine ≈ 0.999): exactly n/100 rows
  *     must drop at tau = 0.98, AT EVERY SCALE — output invariance
  *     under growth is the correctness half of the soak.
  *
  * Success criteria: dedup drop count = n/100 (±5% slack for the rare
  * boundary assignment), and time ratios at k× scale well under k²
  * (near-linear) for both the k-means fit and the end-to-end dedup.
  * Scales are multipliers of the 2,000-vector sf0.1 embeddings shape
  * (default "1,10"). One JSON line per scale + a final ratios line. */
object ClusterSoak {

  val Dim = 64
  val Groups = 64

  /** Deterministic planted corpus: (vec_id, embedding). */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    // 64 fixed unit-scale directions from a fixed seed (driver-side,
    // 64×64 floats — broadcast via closure)
    val dirRnd = new java.util.Random(42L)
    val dirs = Array.fill(Groups, Dim)(dirRnd.nextGaussian().toFloat)
    spark.range(n).mapPartitions { ids =>
      ids.map { boxed =>
        val id: Long = boxed
        val isDup = id % 100 == 1
        val baseId = if (isDup) id - 1 else id
        val g = (baseId % Groups).toInt
        val rnd = new java.util.Random(baseId * 0x9e3779b97f4a7c15L)
        val base = Array.tabulate(Dim)(d =>
          dirs(g)(d) + (rnd.nextGaussian() * 0.5).toFloat)
        val vec =
          if (!isDup) base
          else {
            val p = new java.util.Random(id * 0x517cc1b727220a95L)
            base.map(x => x + (p.nextGaussian() * 0.01).toFloat)
          }
        (id, vec.toSeq)
      }
    }.toDF("vec_id", "embedding")
  }

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
      val data = corpus(spark, n).persist()
      data.count() // materialize outside the timed sections

      // the documented rule: k ∝ n (constant ~250-vector clusters);
      // soak-scale k uses the pre-sampled hash-order init, not the
      // k-scan farthest-first
      val k = math.max(8, (n / 250).toInt)
      val init = data
        .orderBy(xxhash64(col("vec_id"), lit(7)), col("vec_id"))
        .limit(k).collect().map(_.getSeq[Float](1).toArray).toSeq

      val (nAssigned, tFit) = timed {
        Clustering.kmeans(data, "vec_id", "embedding", k,
          iters = 3, init = init)._1.count()
      }
      val (nKept, tDedup) = timed {
        Clustering.semanticDedup(data, "vec_id", "embedding", k,
          iters = 3, tau = 0.98, init = init).count()
      }
      data.unpersist()

      val planted = n / 100
      val dropped = n - nKept
      require(nAssigned == n, s"assignment lost rows: $nAssigned/$n")
      require(math.abs(dropped - planted) <= planted / 20 + 1,
        s"scale $s: dropped $dropped, planted $planted — output not " +
          "invariant under growth")
      results(s) = Map("vecs" -> n.toDouble, "k" -> k.toDouble,
        "fit_sec" -> tFit, "dedup_sec" -> tDedup,
        "dropped" -> dropped.toDouble)
      println(s"""{"scale":$s,"vecs":$n,"k":$k,""" +
        s""""fit_sec":${f"$tFit%.2f"},""" +
        s""""dedup_sec":${f"$tDedup%.2f"},""" +
        s""""dropped":$dropped,"planted":$planted}""")
    }

    if (scales.size >= 2) {
      val lo = results(scales.head); val hi = results(scales.last)
      val kRatio = hi("vecs") / lo("vecs")
      def ratio(m: String) = hi(m) / math.max(lo(m), 1e-9)
      println(s"""{"metric":"cluster_soak_ratios",""" +
        s""""scale_ratio":$kRatio,""" +
        s""""fit_time_ratio":${f"${ratio("fit_sec")}%.2f"},""" +
        s""""dedup_time_ratio":${f"${ratio("dedup_sec")}%.2f"}}""")
    }
    spark.stop()
  }
}
