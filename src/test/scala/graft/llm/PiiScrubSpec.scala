package graft.llm

import graft.SparkSpec

/** PII find/forget over free text: planted identifiers are found
  * (audit shape), redacted exactly (rewrite shape), and the operation
  * is idempotent; overlap order is pinned. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact jane.doe+test@mail.example.org or call 555-123-4567 now"),
    (2L, "ssn 123-45-6789 on file, server at 10.0.254.3 port 443"),
    (3L, "phones: (555) 123-4567 and +1 555-987-6543; also 555.111.2222"),
    (4L, "clean document with no identifiers at all"),
    (5L, "")).toDF("doc_id", "text")

  test("scrubDocs redacts every planted identifier with exact counts; " +
    "clean and empty docs pass through untouched") {
    val out = PiiScrub.scrubDocs(docs, "text")
      .orderBy("doc_id")
      .select("doc_id", "text", "n_email", "n_ssn", "n_phone", "n_ipv4",
        "n_pii")
      .as[(Long, String, Int, Int, Int, Int, Int)].collect().toSeq
    assert(out(0) == ((1L,
      "contact [EMAIL] or call [PHONE] now", 1, 0, 1, 0, 2)))
    assert(out(1) == ((2L,
      "ssn [SSN] on file, server at [IP] port 443", 0, 1, 0, 1, 2)))
    assert(out(2) == ((3L,
      "phones: [PHONE] and [PHONE]; also [PHONE]", 0, 0, 3, 0, 3)))
    assert(out(3) == ((4L,
      "clean document with no identifiers at all", 0, 0, 0, 0, 0)))
    assert(out(4) == ((5L, "", 0, 0, 0, 0, 0)))
  }

  test("scrub is idempotent and order-safe: an SSN is never half-eaten " +
    "as a phone, a digit run never matches mid-number") {
    val once = PiiScrub.scrubDocs(docs, "text").select("doc_id", "text")
    val twice = PiiScrub.scrubDocs(once, "text").select("doc_id", "text")
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
    // 3-2-4 digits is an SSN, not a phone prefix; 11 digits with no
    // separators is neither
    val tricky = Seq((1L, "id 999-88-7777 and raw 19991234567 stay"))
      .toDF("doc_id", "text")
    val row = PiiScrub.scrubDocs(tricky, "text")
      .select("text", "n_ssn", "n_phone").collect()(0)
    assert(row.getString(0) == "id [SSN] and raw 19991234567 stay")
    assert(row.getInt(1) == 1 && row.getInt(2) == 0)
  }

  test("findings emits the audit manifest: one (doc, kind, value) row " +
    "per occurrence, rows proportional to matches not documents") {
    val got = PiiScrub.findings(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "email", "jane.doe+test@mail.example.org"),
      (1L, "phone", "555-123-4567"),
      (2L, "ssn", "123-45-6789"),
      (2L, "ipv4", "10.0.254.3"),
      (3L, "phone", "(555) 123-4567"),
      // the matched span includes the +1 country prefix — the whole
      // identifier is the finding (and the redacted region)
      (3L, "phone", "+1 555-987-6543"),
      (3L, "phone", "555.111.2222")))
  }

  test("scrubDocs is a stateless projection: it runs unchanged on a " +
    "STREAMING frame (per-record redaction at ingest, no state store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(Long, String)]
    val query = PiiScrub
      .scrubDocs(stream.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "text", "n_pii")
      .writeStream.format("memory").queryName("pii_stream_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, "mail me: a@b.example.com"), (2L, "clean"))
      query.processAllAvailable()
      stream.addData((3L, "ssn 123-45-6789"))
      query.processAllAvailable()
      val out = spark.table("pii_stream_out")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(out == Seq((1L, "mail me: [EMAIL]", 1), (2L, "clean", 0),
        (3L, "ssn [SSN]", 1)))
    } finally query.stop()
  }

  test("batch ≡ streaming differential: identical frames redact to " +
    "identical FULL rows (text + every per-kind count) across " +
    "micro-batch boundaries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // one doc per detector kind, one multi-kind doc, one clean, one
    // pathological overlap (digit run beside an SSN)
    val frames = Seq(
      Seq((1L, "reach ops@svc.example.org or cfo@hq.example.com"),
        (2L, "ssn 987-65-4320 stored"), (3L, "dial (555) 234-5678 x9")),
      Seq((4L, "host 192.168.7.250 then 10.1.2.3"),
        (5L, "mixed: a@b.example.net, 555-111-2222, 172.16.0.9"),
        (6L, "perfectly clean prose"),
        (7L, "id 123-45-67890 is NOT an ssn; 123-45-6789 is")))
    val batchOut = PiiScrub
      .scrubDocs(frames.flatten.toDF("doc_id", "text"), "text")
      .collect().map(r => r.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val stream = MemoryStream[(Long, String)]
    val query = PiiScrub
      .scrubDocs(stream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("pii_diff_out")
      .outputMode("append").start()
    try {
      frames.foreach { f =>
        stream.addData(f: _*) // one micro-batch per frame
        query.processAllAvailable()
      }
      val streamOut = spark.table("pii_diff_out")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(streamOut.toSeq == batchOut.toSeq,
        s"stream:\n${streamOut.mkString("\n")}\nbatch:\n" +
          batchOut.mkString("\n"))
    } finally query.stop()
  }

  test("plan is one codegen'd projection — no shuffle, no UDF") {
    val plan = PiiScrub.scrubDocs(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }

  test("backtracking bomb defused (★r19): a 200k-char email-charset " +
    "blob with no '@' scrubs in bounded time; real emails unchanged") {
    // The unbounded `[class]+@` email detector measured 403 s on ONE
    // such value (O(L²) Java backtracking — base64 blobs and minified
    // JS are mostly email-charset bytes); the RFC-bounded pattern
    // measured 0.23 s. Assert a generous ceiling so a rebound is a
    // loud unit failure, not a walled 100 TB scrub job.
    val cs = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "0123456789+."
    val rnd = new java.util.Random(7)
    val blob = {
      val sb = new StringBuilder(200000)
      (0 until 200000).foreach(_ => sb.append(cs(rnd.nextInt(cs.length))))
      sb.toString
    }
    val t0 = System.nanoTime()
    // both engines: the codegen'd Column path and the task-side
    // compiled Redactor must stay linear-ish
    val viaCol = {
      import spark.implicits._
      Seq((1L, blob)).toDF("doc_id", "text")
        .select(PiiScrub.scrub(org.apache.spark.sql.functions.col("text"))
          .as("t")).head().getString(0)
    }
    val viaRedactor = new PiiForget.Redactor().apply(blob)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(viaCol == blob && viaRedactor == blob,
      "charset blob without '@' must not be redacted")
    assert(sec < 30.0, f"pathological blob took $sec%.1f s — the " +
      "email detector is backtracking again")
    // real addresses still match end-to-end, including a max-length
    // RFC local part (64 chars)
    val local64 = "a" * 64
    val txt = s"reach me at $local64@corp.example.net or x@y.io thanks"
    val out = new PiiForget.Redactor().apply(txt)
    assert(out == "reach me at [EMAIL] or [EMAIL] thanks", out)
  }
}
