package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pathological-token sweep (★r19 — the seventh proactive robustness
  * class). At corpus scale, "text" includes values that are not prose:
  * base64 payloads pasted into documents (one giant token in the
  * email-detector's character set — the exact shape that made the
  * unbounded PII email regex quadratic: 403 s for ONE 200k value),
  * minified sources (kilobyte tokens), and degenerate repetition (one
  * token duplicated tens of thousands of times). Every text kernel —
  * tokenizers, shinglers, detectors, BPE, the index builders, the CDC
  * ingest — must stay near-linear and crash-free on them.
  *
  * The sweep runs every gate query against a clone of sf0.001 where
  * the documents table carries all three shapes (giant single token in
  * email charset, kilobyte tokens, massive single-token repetition) on
  * ~3% of docs. Contract: NO graceless crash, loud set pinned EMPTY by
  * set equality, and the whole 130-query sweep completes inside a
  * generous wall ceiling — a rebound of any quadratic kernel (the PII
  * regex class) blows the ceiling loudly instead of walling a 100 TB
  * job silently.
  */
class PathologicalTokenSpec extends SparkSpec with SweepHarness {

  private lazy val pathoDir: String = {
    // deterministic 20k-char run of email-charset bytes, no '@' — the
    // backtracking-bomb shape (kept at 20k so the pre-fix behavior is
    // seconds-per-row, not minutes; the ceiling still catches it
    // across the 130-query sweep)
    val cs = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "0123456789+."
    val rnd = new java.util.Random(13)
    val blob = {
      val sb = new StringBuilder(20000)
      (0 until 20000).foreach(_ => sb.append(cs(rnd.nextInt(cs.length))))
      sb.toString
    }
    val kiloToken = "x" * 1024
    val repeated = ("tok " * 20000).trim
    cloneCorpus("pathotoken") {
      case ("documents", base) =>
        base.withColumn("text",
          when(col("doc_id") % 97 === 0, lit(blob))
            .when(col("doc_id") % 89 === 0, lit(repeated))
            .when(col("doc_id") % 83 === 0,
              concat(lit(kiloToken), lit(" normal tail words "),
                col("text")))
            .otherwise(col("text")))
      case (_, base) => base
    }
  }

  test("every gate query tolerates pathological tokens (base64-shaped " +
    "blob, kilobyte tokens, 20k-fold repetition): no graceless crash, " +
    "loud set pinned EMPTY, sweep inside the linearity ceiling",
    Sweeps) {
    val sec = sweepGate(pathoDir, "pathological-token", Set.empty)
    // generous linearity ceiling: the clean-corpus sweep runs in a
    // few minutes; a quadratic kernel rebound (the PII regex class —
    // seconds PER ROW at 20k chars across several pii/text entries)
    // blows this by an order of magnitude
    assert(sec < 1200.0,
      f"pathological-token sweep took $sec%.0f s — a text kernel has " +
        "gone superlinear")
  }
}
