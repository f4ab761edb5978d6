package graft

import graft.catalog.TableDef
import graft.find.Finder
import graft.forget.DistributedRewrite
import graft.model._
import graft.tools.ParquetStats
import org.apache.spark.sql.{SaveMode, SparkSession}
import scala.util.control.NonFatal

/** Benchmark main. Reports, on ONE JSON line:
  *
  *   - per-query wall time with FULL materialization (noop sink — a bare
  *     `count()` lets Catalyst prune every projection, VERDICT r2 "What's
  *     wrong" #3) and a per-query `ok` flag; any failure exits non-zero.
  *   - BASELINE facet (a): the Find column-scan ratio — bytes of the
  *     identifier column chunks vs the whole table (the reference's
  *     1.3-7% Athena scan claim, docs/COST_OVERVIEW.md:219,241).
  *   - BASELINE facet (b): Forget rewrite throughput — lineitem staged as
  *     64 objects, every object matched and rewritten by ONE
  *     [[DistributedRewrite]] job; objects/min + rows/s.
  */
object Bench {
  /** Non-query facet keys allowed to carry readings in
    * scripts/bench_ledger.json alongside the gate queries (GateLint's
    * stale-key check consults this — a ledger key must be either a
    * SparkEntry.queries entry or one of these). */
  val LedgerFacets: Set[String] =
    Set("find_join_fallback", "model_load_search",
      "forget_rewrite_64obj", "forget_rewrite_1024obj",
      "forget_rewrite_10240obj", "forget_rewrite_40960obj",
      "forget_json_1024obj", "pii_scrub_64obj",
      "media_decode", "dsir_strat_fit")

  /** Entries that are DELIBERATELY long-running scale soaks — they
    * exist to sit far above the noise floor (and, for the forget
    * rungs, to pin obj/min flatness against object count), so they
    * exceed the 8 s per-entry budget BY DESIGN. The budget lint
    * reports them separately (`soak_entries`) instead of counting
    * them in `n_over_budget`, which tracks UNEXPECTED overruns only
    * (★r18: with two soak rungs the old total-count would read 2 on
    * every healthy run and stop signalling anything). */
  val SoakFacets: Set[String] =
    Set("forget_rewrite_10240obj", "forget_rewrite_40960obj")

  def main(args: Array[String]): Unit = {
    // machine-readable output contract (★r19 default-locale
    // sweep): the f"" interpolator formats through the JVM DEFAULT
    // locale, so a comma-decimal locale (de-DE, tr-TR) would emit
    // "1,234" into the JSON lines the driver parses
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JVM/codegen/writer paths + the q21 partitioned
    // staging (a one-time layout cost, not query time)
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode(SaveMode.Overwrite).save()
    spark.read.parquet(s"$sfDir/region.parquet").write
      .format("noop").mode(SaveMode.Overwrite).save()
    graft.catalog.Staging.partitionedCustomer(spark, sfDir)

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val ok = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // Per-entry process-CPU and GC attribution (★r19, VERDICT r18 #1):
    // wall time alone cannot distinguish ambient machine contention
    // from a real regression — the r18 driver run had five entries
    // 3-10× over their same-code floors with every other entry at the
    // global epoch, unadjudicable either way. Each sample now records
    // the JVM's process-CPU-time and collector-time deltas; the entry
    // reports the MEDIAN-WALL sample's cpu and gc (a coherent triple,
    // not three independent medians). Reading it: cpu/wall ≈ effective
    // parallelism when the JVM owns its cores — an entry whose wall
    // inflates while cpu holds the ledger's level (ratio collapsing)
    // is contention; wall AND cpu inflating together is real work.
    val entryCpu = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val entryGc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuNow(): Double = osBean.getProcessCpuTime / 1e9
    def gcNow(): Double = {
      var ms = 0L
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      while (it.hasNext) ms += math.max(0L, it.next().getCollectionTime)
      ms / 1e3
    }
    case class Timed(wall: Double, cpu: Double, gc: Double)
    def timed[A](body: => A): (A, Timed) = {
      val c0 = cpuNow(); val g0 = gcNow(); val t0 = System.nanoTime()
      val a = body
      val w = (System.nanoTime() - t0) / 1e9
      (a, Timed(w, cpuNow() - c0, gcNow() - g0))
    }
    def medianTimed(samples: Seq[Timed]): Timed =
      samples.sortBy(_.wall).apply(samples.size / 2)
    def record(name: String, t: Timed): Unit = {
      times(name) = t.wall; entryCpu(name) = t.cpu; entryGc(name) = t.gc
    }
    // Dev filter for back-to-back A/B timing of one entry (the measured
    // round-over-round noise floor is ±24% — cross-round comparisons
    // cannot attribute small deltas, so perf work times the one entry
    // it touched, twice, in the same JVM state): comma-separated query
    // or facet names; unset = run everything (the driver's mode).
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def wanted(name: String): Boolean = only.isEmpty || only(name)
    // Throughput facets (forget rewrite, PII scrub) run FIRST — before
    // the 117-entry query loop — so their round-over-round readings are
    // immune to in-run contention (r13: pii_scrub_objects_per_min halved
    // with zero code change purely from heap/page-cache pressure of the
    // preceding entries). Their own warm-run protocol (untimed run 0)
    // still covers JIT/writer warmup.
    // facet (b): distributed forget throughput. The rewrite MUTATES its
    // staged objects (rows purged, versions superseded), so every run —
    // warm-up included — gets a FRESH copy of the staged table: a rerun
    // over already-purged objects would measure a no-op job (and replay
    // idempotency markers), which is how the r5-r7 single-shot numbers
    // swung ±2.5x on unchanged code. Protocol per object count: stage
    // once, one untimed warm run, then median of `timedRuns` timed runs.
    val stage = java.nio.file.Files.createTempDirectory("graft-bench-")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val table = TableDef("li", s"$stage/master64", DataFormat.Parquet,
      li.schema)
    val mapper = DataMapper("li", "li", Seq("l_returnflag"))
    val groups = Finder.plan(mapper, table,
      Seq(DeletionQueueItem("q", MatchId.Simple("R"))))

    def listParquet(dir: String): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val p = it.next().toString
          if (p.endsWith(".parquet")) buf += p
        }
        buf.toSeq
      } finally s.close()
    }
    def copyDir(src: String, dst: String): Unit = {
      val from = java.nio.file.Paths.get(src)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      val s = java.nio.file.Files.list(from)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (java.nio.file.Files.isRegularFile(p))
            java.nio.file.Files.copy(p,
              java.nio.file.Paths.get(dst, p.getFileName.toString))
        }
      } finally s.close()
    }

    /** One staged-forget facet: returns (median sec, objects, rowsProcessed,
      * rowsDeleted, allOk) — rows are identical across runs by
      * construction (every run starts from the same master copy).
      *
      * Work units are the staged objects a Find pass MATCHES (untimed,
      * once per staging) — the real pipeline shape: Forget only ever
      * receives Find's matched-file list, and the engine treats a
      * zero-deletion work unit as a hard error by design (reference
      * main.py:182-187). At sf0.1+ every staged object contains an 'R'
      * row so matched == staged; at tiny SFs a few-row object may
      * legitimately hold none, and feeding it would measure (and flag)
      * fictitious failures. The returned object count is the MATCHED
      * count, and throughputs derive from it. */
    def forgetFacet(nObjects: Int, timedRuns: Int,
                    warm: Boolean = true): (Timed, Int, Long, Long, Boolean) = {
      val master = s"$stage/master$nObjects"
      li.repartition(nObjects).write.mode(SaveMode.Overwrite).parquet(master)
      val matchedNames = Finder.matchedFiles(spark,
          spark.read.parquet(master), groups)
        .collect()
        .map(r => new java.io.File(
          graft.forget.Forget.stripScheme(r.getString(0))).getName)
        .toSet
      val nFiles = matchedNames.size
      var allOk = true
      var rowsProcessed = 0L
      var rowsDeleted = 0L
      val samples = scala.collection.mutable.ArrayBuffer.empty[Timed]
      // run 0 is the untimed warm-up (JIT, writer pools, commit paths)
      for (run <- (if (warm) 0 else 1) to timedRuns) {
        val dir = s"$stage/run-$nObjects-$run/lineitem"
        copyDir(master, dir)
        val units = listParquet(dir)
          .filter(p => matchedNames(new java.io.File(p).getName))
          .map(f =>
            ObjectWorkUnit(s"bench-$nObjects-$run", f, "li",
              DataFormat.Parquet, true))
        val (events, tm) = timed(DistributedRewrite.run(spark,
          s"bench-$nObjects-$run", units, groups))
        val updated = events.count(_.eventName == JobEventName.ObjectUpdated)
        if (updated != nFiles) {
          allOk = false
          errors += s"forget_bench_$nObjects(run $run): " +
            s"only $updated/$nFiles objects updated"
        }
        if (run > 0) samples += tm
        rowsProcessed = events.map(_.statsProcessed).sum
        rowsDeleted = events.map(_.statsDeleted).sum
      }
      (medianTimed(samples.toSeq), nFiles,
        rowsProcessed, rowsDeleted, allOk)
    }

    var (forgetSec, forgetObjects, rowsProcessed, rowsDeleted) =
      (0.0, 0, 0L, 0L)
    if (wanted("forget_rewrite_64obj")) {
      val (tm, n, rp, rd, okAll) = forgetFacet(64, timedRuns = 3)
      forgetSec = tm.wall; forgetObjects = n
      rowsProcessed = rp; rowsDeleted = rd
      record("forget_rewrite_64obj", tm)
      ok("forget_rewrite_64obj") = okAll
    }

    // at-scale forget: 1,024 objects in ONE job (the reference's
    // scenario-4 shape — 45k objects through a worker fleet,
    // docs/COST_OVERVIEW.md:288-290 — scaled to the bench box; exercises
    // per-task overhead: footer read, staging commit, version capture)
    var (forget1024Sec, forget1024Objects, rows1024) = (0.0, 0, 0L)
    if (wanted("forget_rewrite_1024obj")) {
      val (tm, n, rp, _, okAll) = forgetFacet(1024, timedRuns = 3)
      forget1024Sec = tm.wall; forget1024Objects = n; rows1024 = rp
      record("forget_rewrite_1024obj", tm)
      ok("forget_rewrite_1024obj") = okAll
    }

    // JSON-lines forget rung (★r18, VERDICT r17 #6): the reference's
    // scenario 5 — gzip JSON objects, row-format table, full-scan
    // Find, byte-preserving raw-line rewrite (159 obj/min on their
    // fleet, docs/COST_OVERVIEW.md:302-322) — previously had NO bench
    // analog, so a regression in the text-mode rewrite path
    // (DistributedRewrite raw-line + gzip in/out) was invisible to
    // the ledger. Stage lineitem as 1,024 gzip JSON-lines objects,
    // Find pass untimed (row-format Find is a full scan by design),
    // fresh staged copy per run (the rewrite mutates its objects).
    var (forgetJsonSec, forgetJsonObjects, rowsJson, rowsJsonDeleted) =
      (0.0, 0, 0L, 0L)
    if (wanted("forget_json_1024obj")) {
      import org.apache.spark.sql.functions.{col, input_file_name}
      val master = s"$stage/json-master1024"
      li.repartition(1024).write.mode(SaveMode.Overwrite)
        .option("compression", "gzip").json(master)
      val jsonTable = TableDef("lij", master, DataFormat.JsonLines,
        li.schema)
      val jsonGroups = Finder.plan(
        DataMapper("lij", "lij", Seq("l_returnflag"),
          format = DataFormat.JsonLines),
        jsonTable, Seq(DeletionQueueItem("q", MatchId.Simple("R"))))
      // full-scan Find (scenario-5 semantics), untimed: declared
      // schema + the json reader, distinct containing files
      val matchedJson = spark.read.schema(li.schema).json(master)
        .withColumn("_f", input_file_name())
        .filter(col("l_returnflag") === "R")
        .select(col("_f")).distinct().collect()
        .map(r => new java.io.File(
          graft.forget.Forget.stripScheme(r.getString(0))).getName)
        .toSet
      forgetJsonObjects = matchedJson.size
      def listJsonGz(dir: String): Seq[String] = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val p = it.next().toString
            if (p.endsWith(".json.gz")) buf += p
          }
          buf.toSeq
        } finally s.close()
      }
      var allOk = true
      val samples = scala.collection.mutable.ArrayBuffer.empty[Timed]
      for (run <- 0 to 3) { // run 0 is the untimed warm-up
        val dir = s"$stage/json-run-$run/lineitem"
        copyDir(master, dir)
        val units = listJsonGz(dir)
          .filter(p => matchedJson(new java.io.File(p).getName))
          .map(f => ObjectWorkUnit(s"json-bench-$run", f, "lij",
            DataFormat.JsonLines, true))
        val (events, tm) = timed(DistributedRewrite.run(spark,
          s"json-bench-$run", units, jsonGroups))
        val updated = events.count(_.eventName == JobEventName.ObjectUpdated)
        if (updated != units.size) {
          allOk = false
          errors += s"forget_json_1024obj(run $run): " +
            s"only $updated/${units.size} objects updated"
        }
        if (run > 0) samples += tm
        rowsJson = events.map(_.statsProcessed).sum
        rowsJsonDeleted = events.map(_.statsDeleted).sum
      }
      val med = medianTimed(samples.toSeq)
      forgetJsonSec = med.wall
      record("forget_json_1024obj", med)
      ok("forget_json_1024obj") = allOk
    }

    // facet (c): PII scrub throughput — the redaction counterpart of
    // facet (b), through the same distributed rewrite machinery. The
    // documents corpus is staged as 64 objects with identifiers
    // planted on ~10% of rows (the corpus itself is PII-free); the
    // scrub is NOT idempotent as a benchmark (a second pass over
    // redacted text is a zero-change hard error by design), so every
    // run — warm-up included — takes a fresh staged copy, and work
    // units come from the Find pass exactly like facet (b).
    var (piiSec, piiObjects, piiRows, piiRedacted) = (0.0, 0, 0L, 0L)
    if (wanted("pii_scrub_64obj")) {
      import graft.llm.PiiForget
      import org.apache.spark.sql.functions.{col, concat, lit, when}
      val master = s"$stage/pii-master"
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"),
              lit(" contact agent@corp.example.net or 555-123-4567")))
            .otherwise(col("text")))
        .repartition(64).write.mode(SaveMode.Overwrite).parquet(master)
      val matched = PiiForget
        .findObjects(spark.read.parquet(master), "text")
        .map(p => new java.io.File(p).getName).toSet
      piiObjects = matched.size
      var allOk = true
      val samples = scala.collection.mutable.ArrayBuffer.empty[Timed]
      for (run <- 0 to 3) {
        val dir = s"$stage/pii-run-$run/documents"
        copyDir(master, dir)
        val units = listParquet(dir)
          .filter(p => matched(new java.io.File(p).getName))
          .map(f => ObjectWorkUnit(s"pii-bench-$run", f, "docs",
            DataFormat.Parquet, true))
        val (events, tm) = timed(graft.llm.PiiForget.scrubObjects(spark,
          s"pii-bench-$run", units, Seq("text")))
        val updated = events.count(_.eventName == JobEventName.ObjectUpdated)
        if (updated != units.size) {
          allOk = false
          errors += s"pii_scrub_64obj(run $run): " +
            s"only $updated/${units.size} objects updated"
        }
        if (run > 0) samples += tm // run 0 is the untimed warm-up
        piiRows = events.map(_.statsProcessed).sum
        piiRedacted = events.map(_.statsDeleted).sum
      }
      val med = medianTimed(samples.toSeq)
      piiSec = med.wall
      record("pii_scrub_64obj", med)
      ok("pii_scrub_64obj") = allOk
    }


    // Eager-stage the write-once shared artifacts (pairs/cluster/span
    // frames, serialized models, CDC feed files) BEFORE any timed
    // sample (★r18, VERDICT r17 #1): a consumer entry's first sample
    // must never pay another entry's one-time artifact build — that is
    // how q31's median read 8.07 s against a 1.79 s floor in r17.
    // Untimed by design (a 100 TB pipeline writes these once, outside
    // any query's cost); skipped when SPARK_GRAFT_ONLY selects no gate
    // query (e.g. forget-facet-only A/B runs).
    if (only.isEmpty || SparkEntry.queries.keySet.exists(only)) {
      val t0 = System.nanoTime()
      SparkEntry.stageSharedArtifacts(spark, sfDir)
      System.err.println(f"[bench] artifact staging (untimed): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      // start the timed loop from a settled heap: the staging pass
      // just churned allocation across every artifact builder, and
      // residue-GC inside a first sample reads as query time (★r19,
      // the soak-isolation discipline of VERDICT r18 #2 applied to
      // the staging pass too)
      System.gc()
    }

    // Median-of-3 per query: single-iteration timings ride on JIT/IO
    // noise (round-over-round ±40% wobble on untouched code paths made
    // regressions unattributable). The median absorbs a one-off slow
    // run without hiding a real slowdown the way min would.
    //
    // Drift convention (★r17, VERDICT r16 #3): entries whose 3-sample
    // median lands under ~2 s are dominated by FIXED overhead (job
    // submit, codegen, file listing), where proportional variance is
    // largest — r16 saw untouched sub-2 s entries read 3× with zero
    // code change. Those entries take 2 extra samples (median-of-5);
    // the per-entry MINIMUM is additionally recorded in the detail
    // file (`query_mins`) as the noise floor — a real regression moves
    // the min, ambient contention only moves the median.
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val cheapEntrySec = 2.0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted(q._1)).foreach { case (name, fn) =>
      val samples = scala.collection.mutable.ArrayBuffer.empty[Timed]
      var failed = false
      var attempts = 0
      var lastElapsed = 0.0
      // latched: the 3→5 extension decision is made ONCE, when the
      // 3rd sample lands. Re-evaluating per iteration let a 4th
      // sample push the running median back over the threshold and
      // stop the loop at 4 samples — recording sorted(2) of 4, an
      // upper-middle value that is neither median-of-3 nor
      // median-of-5.
      var extended = false
      def maxAttempts: Int = {
        if (!extended && samples.size == 3 &&
            samples.map(_.wall).sorted.apply(1) < cheapEntrySec)
          extended = true
        if (extended) 5 else 3
      }
      while (attempts < maxAttempts && !failed) {
        val t0 = System.nanoTime()
        try {
          // only SUCCESSFUL runs enter the median: a failed attempt's
          // duration measures the failure, not the query, and would
          // contaminate `total` with fictitious work
          samples += timed(fn(spark, sfDir).write.format("noop")
            .mode(SaveMode.Overwrite).save())._2
        } catch {
          case NonFatal(e) =>
            failed = true
            lastElapsed = (System.nanoTime() - t0) / 1e9
            errors += s"$name: ${String.valueOf(e.getMessage).take(200)}"
        }
        attempts += 1
        // q29's cached prefix index must not accumulate across
        // iterations (or leak into the next query's timing)
        graft.llm.Dedup.releaseCaches()
      }
      ok(name) = !failed
      if (samples.nonEmpty) {
        record(name, medianTimed(samples.toSeq))
        mins(name) = samples.map(_.wall).min
      } else times(name) = lastElapsed
    }

    // facet (a): identifier-column scan ratio — (i) plan-side from the
    // parquet footers (bytes of the pruned column chunks), (ii) runtime
    // task input bytes actually read by a Find over lineitem. Note the
    // ratio is data-bound: on this 16-column synthetic lineitem the
    // l_orderkey chunk alone is ~24% of the compressed bytes (the
    // reference's 1.3-7% comes from wider production tables); the plan
    // reads exactly the identifier chunks, which IS the optimum.
    val conf = new org.apache.hadoop.conf.Configuration()
    val scanLineitem = ParquetStats.columnBytes(conf,
      s"$sfDir/lineitem.parquet", Seq("l_orderkey"))
    val scanCustomer = ParquetStats.columnBytes(conf,
      s"$sfDir/customer.parquet", Seq("c_custkey", "c_name"))
    val runtimeRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          runtimeRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    val findRuntimeRatio = {
      val liTable = TableDef("li0", s"$sfDir/lineitem.parquet",
        DataFormat.Parquet,
        spark.read.parquet(s"$sfDir/lineitem.parquet").schema)
      val g = Finder.plan(DataMapper("li0", "li0", Seq("l_orderkey")),
        liTable, Seq(DeletionQueueItem("q", MatchId.Simple("7"))))
      spark.sparkContext.addSparkListener(listener)
      try {
        Finder.matchedFiles(spark,
          spark.read.parquet(s"$sfDir/lineitem.parquet"), g)
          .write.format("noop").mode(SaveMode.Overwrite).save()
        Thread.sleep(500) // let the listener bus drain
      } finally spark.sparkContext.removeSparkListener(listener)
      runtimeRead.get().toDouble /
        math.max(1L, new java.io.File(s"$sfDir/lineitem.parquet").length())
    }

    // at-scale Find fallback: a queue larger than InSetMaxKeys forces the
    // broadcast semi-join strategy (ONE scan + exploded keys + broadcast
    // left-semi — FinderSpec pins the plan shape; this facet times it on
    // real sf data). Keys 1..InSetMaxKeys+1 over l_orderkey guarantee
    // real matches.
    if (wanted("find_join_fallback")) {
      val liTable = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val queue = (1 to Finder.InSetMaxKeys + 1).map(i =>
        DeletionQueueItem(s"q$i", MatchId.Simple(i.toString)))
      val g = Finder.plan(
        DataMapper("lifb", "lifb", Seq("l_orderkey")),
        TableDef("lifb", s"$sfDir/lineitem.parquet", DataFormat.Parquet,
          liTable.schema),
        queue)
      try {
        // median-of-3, same rationale as the query loop
        val samples = (1 to 3).map { _ =>
          timed(Finder.matchedFiles(spark, liTable, g)
            .write.format("noop").mode(SaveMode.Overwrite).save())._2
        }
        record("find_join_fallback", medianTimed(samples))
        // untimed sanity count: the fallback must actually find files
        ok("find_join_fallback") =
          Finder.matchedFiles(spark, liTable, g).count() > 0
      } catch {
        case NonFatal(e) =>
          times("find_join_fallback") = 0.0
          ok("find_join_fallback") = false
          errors += s"find_join_fallback: ${String.valueOf(e.getMessage).take(200)}"
      }
    }

    // production model-load path (★r17, VERDICT r16 #4): load the
    // STORED IVF-PQ model frame from disk (the ModelIo round trip,
    // bypassing the in-JVM memo) and run the q82 search on the loaded
    // copy. Training + store are q81's price and happen untimed; the
    // timed span is load + search — the per-run cost of a pipeline
    // that trains once and serves many, previously exercised only
    // under Verify.
    if (wanted("model_load_search")) {
      import org.apache.spark.sql.functions.col
      try {
        SparkEntry.ivfPqModelCached(spark, sfDir) // untimed: train+store
        val path = graft.tools.ArtifactStore.pathOf(s"ivfpq:$sfDir").get
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val samples = (1 to 3).map { _ =>
          timed {
            val m = graft.llm.ModelIo.loadIvfPq(spark.read.parquet(path))
            graft.llm.IvfPq.search(emb, emb.filter(col("vec_id") < 3),
              "vec_id", "embedding", m, nprobe = 2, k = 10)
              .write.format("noop").mode(SaveMode.Overwrite).save()
          }._2
        }
        record("model_load_search", medianTimed(samples))
        ok("model_load_search") = true
      } catch {
        case NonFatal(e) =>
          times("model_load_search") = 0.0
          ok("model_load_search") = false
          errors += s"model_load_search: ${String.valueOf(e.getMessage).take(200)}"
      }
    }

    // media-decode facet (★r19, VERDICT r18 #3): the LIVE
    // synthesis + javax.imageio/javax.sound decode + dHash64
    // fingerprint pass over both modalities — the ingest-time cost
    // q120/q121 no longer carry now that they band the STORED
    // fingerprint artifact (a pipeline fingerprints each media object
    // once, on ingest; the near-dup pass reads the store). One facet
    // prices both codecs so a decoder regression stays ledger-visible.
    if (wanted("media_decode")) {
      try {
        val samples = (1 to 3).map { _ =>
          timed {
            SparkEntry.mkMediaFingerprints(spark, sfDir, "image")
              .write.format("noop").mode(SaveMode.Overwrite).save()
            SparkEntry.mkMediaFingerprints(spark, sfDir, "audio")
              .write.format("noop").mode(SaveMode.Overwrite).save()
          }._2
        }
        record("media_decode", medianTimed(samples))
        ok("media_decode") = true
      } catch {
        case NonFatal(e) =>
          times("media_decode") = 0.0
          ok("media_decode") = false
          errors += s"media_decode: ${String.valueOf(e.getMessage).take(200)}"
      }
    }

    // stratified-DSIR fit facet (★r19, VERDICT r18 #3): the LIVE
    // per-language target fits + raw background fit q122 no longer
    // re-pays per sample (write-once models, memoized like the other
    // learned artifacts; q122 prices the scoring projection). Driver-
    // side result, so the timed span is exactly the two fit jobs.
    if (wanted("dsir_strat_fit")) {
      try {
        val samples = (1 to 3).map { _ =>
          timed(SparkEntry.mkDsirStratModels(spark, sfDir))._2
        }
        record("dsir_strat_fit", medianTimed(samples))
        ok("dsir_strat_fit") = true
      } catch {
        case NonFatal(e) =>
          times("dsir_strat_fit") = 0.0
          ok("dsir_strat_fit") = false
          errors += s"dsir_strat_fit: ${String.valueOf(e.getMessage).take(200)}"
      }
    }

    // facet (d): ANN recall at the BENCH sf. The q23/q30 oracles pin
    // EXACT-equality at the gate's sf0.01 only — this facet measures
    // whether the recall-tuned parameters (LSH bits/tables, IVF
    // nprobe) hold as the corpus scales, the number a production
    // tuning loop would watch. Reported as the MINIMUM recall@10 over
    // the query set (worst query, not an average that hides one).
    // ann_recall_ivf_min is now the AUTO-TUNED operator (the loop a
    // production index runs — target 0.95, nprobe raised until the
    // probe sample hits it), so the facet holds ≥0.95 at any sf by
    // construction; ann_recall_ivf_fixed14_min keeps the raw
    // fixed-nprobe reading (the r10 erosion signal, 1.0 at sf0.01 →
    // 0.9 at sf0.1) and ann_ivf_nprobe reports what the tuner paid.
    var (recallLsh, recallIvf, recallIvfFixed) = (-1.0, -1.0, -1.0)
    var recallPq = -1.0
    var recallPqRefined = -1.0
    var recallPqRefinedFixed = -1.0
    var recallIvfPqRefined = -1.0
    var recallIvfPqRaw = -1.0
    var ivfNprobe = -1
    var pqShortlist = -1
    var ivfPqNprobe = -1
    var ivfPqShortlist = -1
    if (wanted("ann_recall")) {
      import graft.llm.{RandomHyperplaneLsh, Similarity, SimilarityEval}
      import org.apache.spark.sql.functions.col
      try {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val queries = emb.filter(col("vec_id") < 5)
        val exact = Similarity.bruteForceTopK(
          emb, queries, "vec_id", "embedding", 10).cache()
        exact.count()
        def minRecall(approx: org.apache.spark.sql.DataFrame): Double =
          SimilarityEval.recallAtK(approx, exact, "vec_id", 10)
            .agg(org.apache.spark.sql.functions.min(col("recall")))
            .head().getDouble(0)
        recallLsh = minRecall(RandomHyperplaneLsh(dim = 64, bits = 2,
          tables = 32).topK(emb, queries, "vec_id", "embedding", 10))
        recallIvfFixed = minRecall(Similarity.ivfTopK(emb, queries,
          "vec_id", "embedding", 10, nlist = 16, nprobe = 14,
          sampleSeed = 6))
        val (tuned, nprobe) = Similarity.ivfTopKAutoTuned(emb, queries,
          "vec_id", "embedding", 10, nlist = 16, targetRecall = 0.95,
          initialNprobe = 8, sampleSeed = 6)
        recallIvf = minRecall(tuned)
        ivfNprobe = nprobe
        // PQ is LOSSY, and near-uniform synthetic vectors are its
        // pathological case (no cluster structure for the codebook to
        // exploit — same story as IVF's nprobe≈nlist above): the raw
        // reconstruction recall is the honest compression-error
        // signal, the refined number (PQ shortlist + exact re-rank of
        // shortlist/n of the corpus) is what production watches.
        // Tuned by A/B at sf0.01 (refined@100): m=4/ksub=8 0.3,
        // m=8/8 0.6, m=16/8 0.8, m=16/16 0.9 — clustered real
        // embeddings would reach these numbers at far smaller codes.
        val cb = graft.llm.Pq.train(emb, "vec_id", "embedding",
          m = 16, ksub = 16, iters = 3)
        recallPq = minRecall(graft.llm.Pq.reconstructTopK(emb, queries,
          "vec_id", "embedding", cb, 10))
        // fixed shortlist=100: the r12 erosion signal (0.9 at sf0.01
        // → 0.5 at sf0.1) kept as the raw reading; the headline
        // refined facet is now the AUTO-TUNED operator (target 0.95,
        // shortlist doubled until the probe sample hits it — ≥0.95 at
        // any sf by construction), with ann_pq_shortlist reporting
        // what the tuner paid — the r12 verdict's "close the loop".
        recallPqRefinedFixed = minRecall(graft.llm.Pq.refinedTopK(emb,
          queries, "vec_id", "embedding", cb, shortlist = 100, k = 10))
        // ★r14 warm start: seed the walks at the growth rule this
        // corpus' own A/B series measured (paid shortlist ≈ n/5,
        // nprobe ≈ nlist at sf0.1) — the tuner still measures recall,
        // so the facets keep their ≥target guarantee; cold-start
        // doublings were pure re-derivation of a known knob.
        val nEmb = emb.count()
        val seedShortlist = math.max(40L, nEmb / 5).toInt
        val (pqTuned, paidShortlist) = graft.llm.Pq.refinedTopKAutoTuned(
          emb, queries, "vec_id", "embedding", cb, k = 10,
          targetRecall = 0.95, initialShortlist = seedShortlist)
        recallPqRefined = minRecall(pqTuned)
        pqShortlist = paidShortlist
        // IVF-PQ tuned refine (the composed index's production path):
        // nprobe + shortlist walk in lockstep to the same target.
        val model = graft.llm.IvfPq.train(emb, "vec_id", "embedding",
          nlist = 16, m = 16, ksub = 16, iters = 3)
        // raw ADC ranking at a full probe — the composed index's
        // honest lossy signal (PQ-raw's counterpart; isolates the
        // residual-code resolution from any cell-miss effect)
        recallIvfPqRaw = minRecall(graft.llm.IvfPq.search(emb, queries,
          "vec_id", "embedding", model, nprobe = 16, k = 10))
        val (ivfPqTuned, paidNprobe, paidSl) =
          graft.llm.IvfPq.refinedSearchAutoTuned(emb, queries,
            "vec_id", "embedding", model, k = 10, targetRecall = 0.95,
            initialNprobe = 16, initialShortlist = seedShortlist)
        recallIvfPqRefined = minRecall(ivfPqTuned)
        ivfPqNprobe = paidNprobe
        ivfPqShortlist = paidSl
        exact.unpersist()
      } catch {
        case NonFatal(e) => errors += s"ann_recall: ${e.getMessage}"
      }
    }

    // ---- soak rungs run LAST (★r19, VERDICT r18 #2): the 10,240- and
    // 40,960-object rewrites push 50k+ tasks and gigabytes of staging
    // churn through the shared JVM — run FIRST (the r13-r18 order)
    // their heap/GC residue was the prime suspect for the five
    // fit/codec/streaming entries that breached budget ONLY in the
    // driver's recorded runs. Every timed query and facet sample now
    // completes before the first soak task is scheduled; the soaks'
    // own readings are single-shot and 30-100 s by design, far above
    // any residue the query loop could leave in return.
    // soak: 10,240 objects in ONE job — the reference's scenario-3 scale
    // (10k objects, docs/COST_OVERVIEW.md:265-267) run directly. Long
    // enough (~10x the 1024 facet) that a single timed run sits above
    // the noise floor; the smaller facets already warmed every code
    // path, so one run, fresh staging, no median.
    var (forget10240Sec, forget10240Objects, rows10240) = (0.0, 0, 0L)
    if (wanted("forget_rewrite_10240obj")) {
      val (tm, n, rp, _, okAll) =
        forgetFacet(10240, timedRuns = 1, warm = false)
      forget10240Sec = tm.wall; forget10240Objects = n; rows10240 = rp
      record("forget_rewrite_10240obj", tm)
      ok("forget_rewrite_10240obj") = okAll
    }

    // scale rung: 40,960 objects in ONE job (★r18, VERDICT r17 #5 —
    // the shape the reference runs at 45,300 objects,
    // docs/COST_OVERVIEW.md:288). Same total row math as every other
    // rung (the full lineitem), 4× the object count of the 10,240
    // soak at ~1/4 the rows per object — so obj/min flat vs the
    // 10,240 reading pins the per-object overhead (footer read,
    // staging commit, version capture) as the scaling direction, the
    // way the CdcSoak 10× tier pinned state flatness. Deliberately
    // long; reported under `soak_entries`, not `n_over_budget`.
    var (forget40960Sec, forget40960Objects, rows40960) = (0.0, 0, 0L)
    if (wanted("forget_rewrite_40960obj")) {
      val (tm, n, rp, _, okAll) =
        forgetFacet(40960, timedRuns = 1, warm = false)
      forget40960Sec = tm.wall; forget40960Objects = n; rows40960 = rp
      record("forget_rewrite_40960obj", tm)
      ok("forget_rewrite_40960obj") = okAll
    }

    def jd(d: Double): String = f"$d%.4f"
    // ---- self-adjudication against the committed ledger (★r21,
    // VERDICT r20 #6): three rounds running, the round-close ledger vs
    // driver-run wobble has been adjudicated by hand with scripts/
    // check.py's epoch-normalized instrument. The bench now carries
    // the instrument itself, so BENCH_rN arrives pre-adjudicated:
    // `epoch_ratio` (median of per-entry latest/ledger over non-soak
    // entries — robust to any single regressed entry), and per-entry
    // flags with BOTH signals (normalized median vs 1.3x/1.4x, the
    // absolute min floor) plus the work-vs-work cpu_ratio evidence.
    // FAIL needs both signals, the same AND-rule check.py applies.
    def readLedger(name: String): Map[String, Double] =
      try {
        val f = new java.io.File(s"scripts/$name")
        if (!f.exists()) Map.empty
        else {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(f)
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
          }
          b.result()
        }
      } catch { case NonFatal(_) => Map.empty }
    val ledger = readLedger("bench_ledger.json")
    val ledgerMins = readLedger("bench_ledger_mins.json")
    val ledgerCpu = readLedger("bench_ledger_cpu.json")
    // Content fingerprint of the ledger the flags were computed against
    // (★r22, ADVICE r21): check.py used file mtimes to decide whether
    // the embedded adjudication is current, but git checkouts rewrite
    // mtimes arbitrarily. The fingerprint pins the CONTENT.
    val ledgerFingerprint: String =
      try {
        val f = java.nio.file.Paths.get("scripts/bench_ledger.json")
        if (!java.nio.file.Files.exists(f)) ""
        else java.security.MessageDigest.getInstance("SHA-256")
          .digest(java.nio.file.Files.readAllBytes(f))
          .take(8).map(b => f"$b%02x").mkString
      } catch { case NonFatal(_) => "" }
    val epochKeys = times.keys.toSeq.filter(k =>
      !SoakFacets(k) && times(k) > 0 &&
        ledger.get(k).exists(_ > 0)).sorted
    val epochRatio: Double =
      if (epochKeys.isEmpty) -1.0
      else {
        val rs = epochKeys.map(k => times(k) / ledger(k)).sorted
        rs(rs.size / 2)
      }
    /** (level, detail-json) per tripped entry; level 2 = FAIL (both
      * signals), 1 = WARN (one). */
    val perfFlags: Seq[(String, Int, String)] =
      if (epochRatio <= 0) Nil
      else times.keys.toSeq.sorted.flatMap { k =>
        ledger.get(k).filter(_ > 0).flatMap { led =>
          val cur = times(k)
          if (cur <= 0) None
          else {
            val thresh = if (led < 2.0) 1.4 else 1.3
            val norm = cur / epochRatio
            val medTrip = norm > led * thresh
            val minTrip = (mins.get(k), ledgerMins.get(k)) match {
              case (Some(cm), Some(om)) =>
                cm > om * thresh && cm - om > 0.5
              case _ => false
            }
            if (!medTrip && !minTrip) None
            else {
              val cpuR = (entryCpu.get(k), ledgerCpu.get(k)) match {
                case (Some(cc), Some(oc)) if oc > 0 => cc / oc
                case _ => -1.0
              }
              val detail =
                s""""$k":{"level":${if (medTrip && minTrip) 2 else 1},""" +
                s""""med_trip":$medTrip,"min_trip":$minTrip,""" +
                s""""median":${jd(cur)},"ledger":${jd(led)},""" +
                s""""norm":${jd(norm)},""" +
                s""""min":${jd(mins.getOrElse(k, -1.0))},""" +
                s""""min_ledger":${jd(ledgerMins.getOrElse(k, -1.0))},""" +
                s""""cpu":${jd(entryCpu.getOrElse(k, -1.0))},""" +
                s""""cpu_ledger":${jd(ledgerCpu.getOrElse(k, -1.0))},""" +
                s""""cpu_ratio":${jd(cpuR)},""" +
                s""""gc":${jd(entryGc.getOrElse(k, -1.0))}}"""
              Some((k, if (medTrip && minTrip) 2 else 1, detail))
            }
          }
        }
      }
    val perfFlagsJson =
      perfFlags.map(_._3).mkString("{", ",", "}")
    val nPerfFails = perfFlags.count(_._2 == 2)
    val nPerfWarns = perfFlags.count(_._2 == 1)
    val perfFailNames = perfFlags.filter(_._2 == 2).map(f =>
      "\"" + f._1 + "\"").mkString("[", ",", "]")

    // throughputs derive from the MEDIAN time (the published number) and
    // the per-run-identical row/object counts; 0 when a facet was
    // filtered out by SPARK_GRAFT_ONLY
    def rate(n: Double, sec: Double): Double = if (sec > 0) n / sec else 0.0
    val qs = times.map { case (k, v) => s""""$k":${jd(v)}""" }
      .mkString("{", ",", "}")
    val qMins = mins.map { case (k, v) => s""""$k":${jd(v)}""" }
      .mkString("{", ",", "}")
    val qCpus = entryCpu.map { case (k, v) => s""""$k":${jd(v)}""" }
      .mkString("{", ",", "}")
    val qGcs = entryGc.map { case (k, v) => s""""$k":${jd(v)}""" }
      .mkString("{", ",", "}")
    val oks = ok.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" +
      e.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\"").mkString("[", ",", "]")
    val total = times.values.sum
    // per-entry budget lint (VERDICT r13 task 7): nothing used to flag
    // a new census-class entry quietly adding >8 s to the run — by
    // r13 three siblings (q102/q117/q95) had drifted the total to
    // 193 s. A listing here is a WARNING to the author, not a failure:
    // some entries (the 10240-object forget soak) are deliberately
    // long, and the facet makes that spend visible instead of silent.
    val entryBudgetSec = 8.0
    // deliberate soaks (SoakFacets) are long by design — they go to
    // `soak_entries`; `n_over_budget` counts UNEXPECTED overruns only
    val overBudget = times.toSeq
      .filter { case (k, v) => v > entryBudgetSec && !SoakFacets(k) }
      .sortBy(-_._2)
    val overBudgetJson = overBudget
      .map { case (k, v) => s""""$k":${jd(v)}""" }.mkString("{", ",", "}")
    // cpu/wall attribution for exactly the entries the budget lint
    // flags: the adjudication signal VERDICT r18 #1 asked for — an
    // over-budget entry with cpu/wall far below its healthy
    // parallelism was starved of CPU (ambient contention), one whose
    // cpu grew with wall did real extra work.
    val overBudgetCpuJson = overBudget
      .map { case (k, _) =>
        s""""$k":${jd(entryCpu.getOrElse(k, -1.0))}""" }
      .mkString("{", ",", "}")
    val soakJson = times.toSeq.filter(t => SoakFacets(t._1))
      .map { case (k, v) => s""""$k":${jd(v)}""" }.mkString("{", ",", "}")
    // round-over-round comparisons need the query total SEPARATED from
    // deliberate soak spend: adding a soak rung (e.g. the ★r18
    // 40,960-object forget tier, ~74 s by design) moves `value` without
    // any query regressing — `total_ex_soak` is the comparable series
    val totalExSoak = times.toSeq.filterNot(t => SoakFacets(t._1))
      .map(_._2).sum
    val line =
      s"""{"metric":"total","value":${jd(total)},"unit":"sec",""" +
      s""""total_ex_soak":${jd(totalExSoak)},""" +
      s""""queries":$qs,"query_mins":$qMins,""" +
      s""""queries_cpu":$qCpus,"queries_gc":$qGcs,""" +
      s""""ok":$oks,"errors":$errJson,""" +
      s""""entries_over_budget":$overBudgetJson,""" +
      s""""entries_over_budget_cpu":$overBudgetCpuJson,""" +
      s""""n_over_budget":${overBudget.size},""" +
      s""""soak_entries":$soakJson,""" +
      s""""entry_budget_sec":${jd(entryBudgetSec)},""" +
      s""""epoch_ratio":${jd(epochRatio)},""" +
      s""""ledger_fingerprint":"$ledgerFingerprint",""" +
      s""""perf_flags":$perfFlagsJson,""" +
      s""""n_perf_fails":$nPerfFails,"n_perf_warns":$nPerfWarns,""" +
      s""""find_scan_ratio_lineitem":${jd(scanLineitem.ratio)},""" +
      s""""find_scan_ratio_customer":${jd(scanCustomer.ratio)},""" +
      s""""find_runtime_scan_ratio":${jd(findRuntimeRatio)},""" +
      s""""forget_objects":$forgetObjects,""" +
      s""""forget_objects_per_min":${jd(rate(forgetObjects * 60.0, forgetSec))},""" +
      s""""forget_rows_per_sec":${jd(rate(rowsProcessed.toDouble, forgetSec))},""" +
      s""""forget_rows_deleted":$rowsDeleted,""" +
      s""""forget_1024_objects_per_min":${jd(rate(forget1024Objects * 60.0, forget1024Sec))},""" +
      s""""forget_1024_rows_per_sec":${jd(rate(rows1024.toDouble, forget1024Sec))},""" +
      s""""forget_10240_objects_per_min":${jd(rate(forget10240Objects * 60.0, forget10240Sec))},""" +
      s""""forget_10240_rows_per_sec":${jd(rate(rows10240.toDouble, forget10240Sec))},""" +
      s""""forget_40960_objects_per_min":${jd(rate(forget40960Objects * 60.0, forget40960Sec))},""" +
      s""""forget_40960_rows_per_sec":${jd(rate(rows40960.toDouble, forget40960Sec))},""" +
      s""""forget_json_objects_per_min":${jd(rate(forgetJsonObjects * 60.0, forgetJsonSec))},""" +
      s""""forget_json_rows_per_sec":${jd(rate(rowsJson.toDouble, forgetJsonSec))},""" +
      s""""forget_json_rows_deleted":$rowsJsonDeleted,""" +
      s""""pii_scrub_objects_per_min":${jd(rate(piiObjects * 60.0, piiSec))},""" +
      s""""pii_scrub_rows_per_sec":${jd(rate(piiRows.toDouble, piiSec))},""" +
      s""""pii_scrub_rows_redacted":$piiRedacted,""" +
      s""""ann_recall_lsh_min":${jd(recallLsh)},""" +
      s""""ann_recall_ivf_min":${jd(recallIvf)},""" +
      s""""ann_recall_ivf_fixed14_min":${jd(recallIvfFixed)},""" +
      s""""ann_recall_pq_min":${jd(recallPq)},""" +
      s""""ann_recall_pq_refined_min":${jd(recallPqRefined)},""" +
      s""""ann_recall_pq_refined_fixed100_min":${jd(recallPqRefinedFixed)},""" +
      s""""ann_recall_ivfpq_min":${jd(recallIvfPqRaw)},""" +
      s""""ann_recall_ivfpq_refined_min":${jd(recallIvfPqRefined)},""" +
      s""""ann_ivf_nprobe":$ivfNprobe,""" +
      s""""ann_pq_shortlist":$pqShortlist,""" +
      s""""ann_ivfpq_nprobe":$ivfPqNprobe,""" +
      s""""ann_ivfpq_shortlist":$ivfPqShortlist,""" +
      s""""sf":"$sfDir"}"""
    // The FULL per-query series goes to the file only: the driver
    // captures a bounded tail of stdout, and at 60 entries the full
    // line overflows it (BENCH_r09/r10 both came back truncated →
    // parsed:null). stdout gets a ≲1 KB summary — total, counts, the
    // headline facets, and only the top-8 most expensive queries —
    // printed as the BARE LAST line so the driver's JSON parse always
    // lands.
    try {
      val out = java.nio.file.Paths.get("target/bench-latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] could not write bench-latest.json: $e")
    }
    // ★r22 (VERDICT r21 #2): the old fixed top-8 starved the driver's
    // round-over-round comparison (PERF_r21: n_common=4, phantom
    // "dropped_from_bench" rows as the top-8 window rotated). The full
    // 140-entry map cannot arrive intact — the driver keeps only the
    // LAST 2000 stdout chars (measured: every BENCH_rN tail is exactly
    // 2000 chars; r09/r10 proved an overflowing line parses to null —
    // names alone are ~4 KB) — so fill `queries` with as many entries
    // as keep the WHOLE line inside a conservative 1900-char budget:
    // ~40 entries in DESCENDING cost order, a strict superset of any
    // previous round's top-8, so nothing ever "drops" between rounds
    // and the expensive (comparison-relevant) entries always land.
    val compactPrefix =
      s"""{"metric":"total","value":${jd(total)},"unit":"sec",""" +
      s""""total_ex_soak":${jd(totalExSoak)},""" +
      s""""n_queries":${times.size},"n_ok":${ok.values.count(identity)},""" +
      s""""n_errors":${errors.size},"queries":"""
    val compactSuffix =
      s""""n_over_budget":${overBudget.size},""" +
      s""""entries_over_budget_cpu":$overBudgetCpuJson,""" +
      s""""epoch_ratio":${jd(epochRatio)},""" +
      s""""n_perf_fails":$nPerfFails,"n_perf_warns":$nPerfWarns,""" +
      s""""perf_fails":$perfFailNames,""" +
      s""""find_runtime_scan_ratio":${jd(findRuntimeRatio)},""" +
      s""""forget_10240_objects_per_min":${jd(rate(forget10240Objects * 60.0, forget10240Sec))},""" +
      s""""forget_40960_objects_per_min":${jd(rate(forget40960Objects * 60.0, forget40960Sec))},""" +
      s""""forget_json_objects_per_min":${jd(rate(forgetJsonObjects * 60.0, forgetJsonSec))},""" +
      s""""pii_scrub_objects_per_min":${jd(rate(piiObjects * 60.0, piiSec))},""" +
      s""""ann_recall_lsh_min":${jd(recallLsh)},""" +
      s""""ann_recall_ivf_min":${jd(recallIvf)},""" +
      s""""ann_recall_pq_min":${jd(recallPq)},""" +
      s""""ann_recall_pq_refined_min":${jd(recallPqRefined)},""" +
      s""""ann_recall_ivfpq_min":${jd(recallIvfPqRaw)},""" +
      s""""ann_recall_ivfpq_refined_min":${jd(recallIvfPqRefined)},""" +
      s""""ann_ivf_nprobe":$ivfNprobe,""" +
      s""""ann_pq_shortlist":$pqShortlist,""" +
      s""""ann_ivfpq_nprobe":$ivfPqNprobe,""" +
      s""""ann_ivfpq_shortlist":$ivfPqShortlist,""" +
      s""""ledger_fingerprint":"$ledgerFingerprint",""" +
      s""""detail":"target/bench-latest.json","sf":"$sfDir"}"""
    val lineBudget = 1900
    val qsBudget = lineBudget - compactPrefix.length -
      compactSuffix.length - 3 // "{", "}," around the queries map
    val topQsBuf = new StringBuilder
    times.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val s = s""""$k":${jd(v)}"""
      val add = s.length + (if (topQsBuf.nonEmpty) 1 else 0)
      if (topQsBuf.length + add <= qsBudget) {
        if (topQsBuf.nonEmpty) topQsBuf.append(',')
        topQsBuf.append(s)
      }
    }
    val compact = compactPrefix + "{" + topQsBuf + "}," + compactSuffix
    println(compact)
    spark.stop()
    if (ok.values.exists(v => !v)) sys.exit(1)
  }
}
