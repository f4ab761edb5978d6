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
}
