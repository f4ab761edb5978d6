package graft

/** Hard gate for the q51/q69/q70/q72 bug class: every gate row's
  * OUTPUT schema must be scalar hash-safe types only, and every
  * oracle `sum(` must be CAST-wrapped (see [[GateLint]]). Runs the
  * real `SparkEntry.queries` builders at sf0.001 — the same frames
  * the driver gate hashes at sf0.01. */
class GateLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("no gate query emits a float/decimal/array/map/struct column") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, dir).schema
          catch { case e: Throwable =>
            fail(s"$name failed to build on $dir: ${e.getMessage}")
          }
        GateLint.schemaViolations(name, schema)
    }
    assert(violations.isEmpty,
      s"gate-output type latitude:\n  ${violations.mkString("\n  ")}")
  }

  test("no oracle SQL carries a bare (un-CAST) sum aggregate") {
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, dir)
      catch { case e: Throwable =>
        fail(s"dynamic oracle generation failed: ${e.getMessage}")
      }
    val violations = (SparkEntry.oracleSql ++ dynamic).toSeq
      .sortBy(_._1)
      .flatMap { case (name, sql) => GateLint.oracleViolations(name, sql) }
    assert(violations.isEmpty,
      s"oracle sum-widening hazards:\n  ${violations.mkString("\n  ")}")
  }

  test("every oracle row has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every gate query has a RECORDED sf0.1 bench reading in " +
    "scripts/bench_ledger.json (the commit-time budget gate)") {
    // The r14 q125 lesson: a gate row landed with no bench reading
    // and turned out to cost 91.9 s (32% of the whole bench). This
    // lint makes the reading a precondition: a new queries key fails
    // the suite until its sf0.1 entry-seconds is measured and
    // recorded (SPARK_GRAFT_ONLY=<name> bench run, then update the
    // ledger). Budget OVERRUNS stay the bench facet's job
    // (n_over_budget) — this gate only refuses UNMEASURED entries.
    val ledgerPath = java.nio.file.Paths.get("scripts/bench_ledger.json")
    assert(java.nio.file.Files.exists(ledgerPath),
      "scripts/bench_ledger.json missing")
    val ledger = ujsonKeys(new String(
      java.nio.file.Files.readAllBytes(ledgerPath), "UTF-8"))
    val unmeasured = SparkEntry.queries.keySet -- ledger
    assert(unmeasured.isEmpty,
      s"gate entries with NO recorded sf0.1 bench reading: " +
        s"${unmeasured.toSeq.sorted.mkString(", ")} — run " +
        s"SPARK_GRAFT_ONLY=<name> graft.Bench at sf0.1 and record " +
        s"the seconds in scripts/bench_ledger.json before shipping")
    val stale = ledger -- SparkEntry.queries.keySet -- Bench.LedgerFacets
    assert(stale.isEmpty,
      s"ledger rows without a queries entry (stale): $stale")
    // facets declared ledger-worthy must actually carry readings —
    // otherwise a facet can ship priced-nowhere exactly like a gate row
    val unmeasuredFacets = Bench.LedgerFacets -- ledger
    assert(unmeasuredFacets.isEmpty,
      s"declared ledger facets with NO recorded reading: $unmeasuredFacets")
  }

  /** Top-level keys of a flat JSON object {"name": 1.23, ...} without
    * a JSON dependency: good enough for the ledger's fixed shape. */
  private def ujsonKeys(s: String): Set[String] =
    "\"([^\"]+)\"\\s*:".r.findAllMatchIn(s).map(_.group(1)).toSet
}
