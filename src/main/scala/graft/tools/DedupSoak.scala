package graft.tools

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-margin soak for the three heavy dedup shapes (q29 all-pairs
  * Jaccard, q31 duplicate clusters, q34 cross-corpus decontamination)
  * on a deliberately SKEWED synthetic corpus — the hot-shingle and
  * convergence paths the 100 TB design leans on, exercised at growing
  * scale so the growth curve (not a single point) is the evidence.
  *
  * The corpus plants exactly the two adversarial structures the
  * operators guard against:
  *
  *   - a shared boilerplate prefix on 20% of docs — at 10× that is a
  *     census-scale hot shingle set (tens of thousands of docs per
  *     16-gram key), the shape that melts a naive shingle join; the
  *     AllPairs prefix filter + census salting must keep candidate
  *     counts bounded and output-invariant (no boilerplate pair
  *     crosses the 0.8 threshold: ~65 shared windows of ~285).
  *   - near-duplicate families of 3 (one base + two one-token edits)
  *     every 50 docs, giving clusters whose COUNT grows linearly with
  *     the corpus while each stays constant-size — duplicateClusters'
  *     round count must stay flat (O(log n) bound, measured exactly
  *     via [[Dedup.duplicateClustersWithRounds]]).
  *
  * Sub-quadratic growth criterion: all-pairs Jaccard over k× docs has
  * k² naive pairs, so wall-time ratio t(k×)/t(1×) well under k² (and
  * near k) demonstrates the candidate pruning holds; flat CC rounds
  * demonstrate convergence does not degrade. Scales come from arg 1
  * (comma-separated multipliers of the 5,000-doc sf0.1 documents
  * shape, default "1,10"). Prints one JSON line per scale and a final
  * `ratios` line. */
object DedupSoak {

  /** Deterministic skewed corpus: `n` docs of ~50 six-char tokens.
    * Docs `f, f+1, f+2` for `f % 50 == 0` form a near-dup family
    * (members differ from the base in the LAST token only); docs with
    * `id % 5 == 3` carry the shared boilerplate prefix. Generation is
    * per-partition deterministic (seeded by doc id) — no driver-side
    * materialization, no global RNG. */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val boiler = "standard corpus boilerplate header attached verbatim " +
      "to one in five documents for the hot shingle census path"
    spark.range(n).mapPartitions { ids =>
      ids.map { boxed =>
        val id: Long = boxed
        val family = id - (id % 50) // base doc of the family, if any
        val inFamily = (id % 50) < 3
        val seedId = if (inFamily) family else id
        val rnd = new java.util.Random(seedId * 0x9e3779b97f4a7c15L)
        val toks = Array.fill(50) {
          val w = new Array[Char](6)
          var i = 0
          while (i < 6) { w(i) = ('a' + rnd.nextInt(26)).toChar; i += 1 }
          new String(w)
        }
        // family members perturb the final token (distinct per member)
        if (inFamily && id != family) toks(49) = s"edit${id % 50}xx"
        val body = toks.mkString(" ")
        val text = if (id % 5 == 3) s"$boiler $body" else body
        (id, text)
      }
    }.toDF("doc_id", "text")
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Adversarial VALUE-skew corpus (★r19, VERDICT r18 #4): 10% of
    * docs are BYTE-IDENTICAL (the 100 TB reality of licenses and
    * boilerplate pages), the rest random. Every shingle of the clone
    * text is an ultra-hot key whose census df equals the clone count —
    * the shape that melts an unsalted prefix self-join into one
    * p²-enumerating task. */
  def hotCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val license = "permission is hereby granted free of charge to any " +
      "person obtaining a copy of this software and associated " +
      "documentation files to deal in the software without restriction " +
      "including without limitation the rights to use copy modify merge " +
      "publish distribute sublicense and or sell copies of the software " +
      "and to permit persons to whom the software is furnished to do so"
    spark.range(n).mapPartitions { ids =>
      ids.map { boxed =>
        val id: Long = boxed
        if (id % 10 == 0) (id, license)
        else {
          val rnd = new java.util.Random(id * 0x9e3779b97f4a7c15L)
          val toks = Array.fill(50) {
            val w = new Array[Char](6)
            var i = 0
            while (i < 6) { w(i) = ('a' + rnd.nextInt(26)).toChar; i += 1 }
            new String(w)
          }
          (id, toks.mkString(" "))
        }
      }
    }.toDF("doc_id", "text")
  }

  /** The VALUE-skew tier: asserts, at each scale, that (a) the linear
    * [[Dedup.exactDuplicates]] path collapses the clone mass into one
    * bounded-roster cluster, (b) the salted prefix index keeps every
    * (key, salt) LEFT-side group ~saltBlock regardless of the clone
    * count (max load + the hottest key's salt fan-out, via
    * [[Dedup.saltLoadForProbe]]), and (c) the candidate stage's time
    * scales with its OUTPUT (clone pairs are quadratic in the clone
    * count BY DEFINITION of all-pairs semantics — the claim is
    * per-candidate flatness and bounded groups, not sub-quadratic
    * output). Hard `require`s — a violated bound kills the soak. */
  def hotKeyTier(spark: SparkSession, scales: Seq[Int],
                 baseDocs: Long): Unit = {
    val saltBlock = 2048
    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    scales.foreach { k =>
      val n = baseDocs * k
      val clones = n / 10
      val docs = hotCorpus(spark, n).persist()
      docs.count()

      // (a) the production path for byte-identical mass duplication
      val ((dupClusters, biggest), tExact) = timed {
        val d = Dedup.exactDuplicates(docs, "doc_id", "text").collect()
        (d.length.toLong, d.map(_.getAs[Long]("copies")).max)
      }
      require(biggest == clones,
        s"hotkey($k): exactDuplicates saw $biggest copies, want $clones")

      // (b) salted-group bound: max LEFT load and hottest fan-out
      val (saltRow, tSalt) = timed {
        Dedup.saltLoadForProbe(docs, "doc_id", "text",
            shingleLen = 16, threshold = 0.8, saltBlock = saltBlock)
          .agg(max(col("load")).as("maxload"),
            max(col("_ns")).as("maxns"))
          .head()
      }
      val maxLoad = saltRow.getLong(0)
      val maxNs = saltRow.getInt(1)
      val expNs = math.min(64L, 1L + clones / saltBlock).toInt
      Dedup.releaseCaches()
      require(maxNs == expNs,
        s"hotkey($k): hottest salt fan-out $maxNs, want $expNs")
      require(maxLoad <= 2L * saltBlock,
        s"hotkey($k): max (key,salt) left load $maxLoad breaches " +
          s"2*saltBlock=${2 * saltBlock}")

      // (c) candidate stage over the skewed corpus
      val (nCand, tCand) = timed {
        Dedup.jaccardCandidatesForProbe(docs, "doc_id", "text",
          shingleLen = 16, threshold = 0.8).count()
      }
      Dedup.releaseCaches()
      val clonePairs = clones * (clones - 1) / 2
      require(nCand >= clonePairs && nCand <= clonePairs + n,
        s"hotkey($k): $nCand candidates, want ~$clonePairs")

      docs.unpersist()
      results(k) = Map("docs" -> n.toDouble, "exact_sec" -> tExact,
        "salt_sec" -> tSalt, "max_salt_load" -> maxLoad.toDouble,
        "max_ns" -> maxNs.toDouble, "cand_sec" -> tCand,
        "cand_rows" -> nCand.toDouble)
      println(s"""{"metric":"hotkey","scale":$k,"docs":$n,""" +
        s""""clones":$clones,"exact_sec":${f"$tExact%.2f"},""" +
        s""""dup_clusters":$dupClusters,""" +
        s""""max_salt_load":$maxLoad,"max_ns":$maxNs,""" +
        s""""salt_sec":${f"$tSalt%.2f"},""" +
        s""""cand_rows":$nCand,"cand_sec":${f"$tCand%.2f"}}""")
    }
    if (scales.size >= 2) {
      val lo = results(scales.head); val hi = results(scales.last)
      val candRatio = hi("cand_rows") / math.max(lo("cand_rows"), 1.0)
      val timeRatio = hi("cand_sec") / math.max(lo("cand_sec"), 1e-9)
      // per-candidate flatness: time grows no faster than ~1.5x the
      // output growth (the output IS quadratic in clones by all-pairs
      // semantics; a salted-group failure would show up as
      // time >> output growth when one task serializes the hot key)
      println(s"""{"metric":"hotkey_ratios","cand_ratio":""" +
        s"""${f"$candRatio%.2f"},"time_ratio":${f"$timeRatio%.2f"},""" +
        s""""exact_time_ratio":${
          f"${hi("exact_sec") / math.max(lo("exact_sec"), 1e-9)}%.2f"},""" +
        s""""per_candidate_flat":${timeRatio <= 1.5 * candRatio}}""")
    }
  }

  def main(args: Array[String]): Unit = {
    // machine-readable output contract (★r19 default-locale
    // sweep): the f"" interpolator formats through the JVM DEFAULT
    // locale, so a comma-decimal locale (de-DE, tr-TR) would emit
    // "1,234" into the JSON lines the driver parses
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val scales = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val baseDocs = 5000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: codegen + noop sink
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode(SaveMode.Overwrite).save()

    // `DedupSoak <scales> hotkey` runs ONLY the adversarial value-skew
    // tier (★r19) — its quadratic-output candidate stage is priced
    // separately from the standard growth-curve tiers
    if (args.length > 1 && args(1) == "hotkey") {
      hotKeyTier(spark, scales, baseDocs)
      spark.stop()
      return
    }

    val results = scala.collection.mutable.LinkedHashMap
      .empty[Int, Map[String, Double]]
    scales.foreach { k =>
      val n = baseDocs * k
      val docs = corpus(spark, n).persist()
      docs.count() // materialize OUTSIDE the timed sections

      val ((pairsDf, nPairs), tPairs) = timed {
        val p = Dedup.jaccardPairsExact(docs, "doc_id", "text",
          shingleLen = 16, threshold = 0.8).persist()
        (p, p.count())
      }

      val ((nClusters, rounds), tCc) = timed {
        val (cc, r) = Dedup.duplicateClustersWithRounds(
          pairsDf, "id_a", "id_b")
        (cc.count(), r)
      }

      val (nCross, tCross) = timed {
        Dedup.jaccardJoinExact(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", shingleLen = 16, threshold = 0.8).count()
      }
      pairsDf.unpersist()
      docs.unpersist()
      Dedup.releaseCaches()

      results(k) = Map(
        "docs" -> n.toDouble, "pairs_sec" -> tPairs,
        "pairs_rows" -> nPairs.toDouble,
        "cc_sec" -> tCc, "cc_rounds" -> rounds.toDouble,
        "cc_clusters_rows" -> nClusters.toDouble,
        "cross_sec" -> tCross, "cross_rows" -> nCross.toDouble)
      println(s"""{"scale":$k,"docs":$n,""" +
        s""""pairs_sec":${f"$tPairs%.2f"},"pairs_rows":$nPairs,""" +
        s""""cc_sec":${f"$tCc%.2f"},"cc_rounds":$rounds,""" +
        s""""cc_rows":$nClusters,""" +
        s""""cross_sec":${f"$tCross%.2f"},"cross_rows":$nCross}""")
    }

    // CC round-count growth on the ADVERSARIAL cluster shape: one long
    // CHAIN (diameter n-1, the worst case for star-contraction; the
    // family corpus above converges in 2 rounds regardless of scale).
    // Expect rounds ~ O(log n): doubling the chain adds ~1 round.
    val chainRounds = Seq(1000, 10000, 100000).map { n =>
      val pairs = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val ((rows, rounds), sec) = timed {
        val (cc, r) = Dedup.duplicateClustersWithRounds(
          pairs, "id_a", "id_b")
        (cc.count(), r)
      }
      require(rows == n, s"chain($n) lost members: $rows")
      println(s"""{"metric":"cc_chain","n":$n,"rounds":$rounds,""" +
        s""""sec":${f"$sec%.2f"}}""")
      rounds
    }
    println(s"""{"metric":"cc_chain_rounds","series":""" +
      s"""[${chainRounds.mkString(",")}]}""")

    if (scales.size >= 2) {
      val lo = results(scales.head); val hi = results(scales.last)
      val kRatio = hi("docs") / lo("docs")
      def ratio(m: String) = hi(m) / math.max(lo(m), 1e-9)
      println(s"""{"metric":"soak_ratios","scale_ratio":$kRatio,""" +
        s""""pairs_time_ratio":${f"${ratio("pairs_sec")}%.2f"},""" +
        s""""cross_time_ratio":${f"${ratio("cross_sec")}%.2f"},""" +
        s""""cc_time_ratio":${f"${ratio("cc_sec")}%.2f"},""" +
        s""""cc_rounds_lo":${lo("cc_rounds").toInt},""" +
        s""""cc_rounds_hi":${hi("cc_rounds").toInt},""" +
        s""""subquadratic":${ratio("pairs_sec") < kRatio * kRatio &&
          ratio("cross_sec") < kRatio * kRatio}}""")
    }
    spark.stop()
  }
}
