package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.catalog.{Catalog, TableDef}
import graft.driver.JobRunner
import graft.find.Finder
import graft.model._

/** Unicode-normalization identifier contract (★r19, the schema-drift
  * sweep's sibling): the reference matches identifiers by BINARY
  * string equality — Athena's `=`, the JSON handler's decoded-string
  * compare — so a composed id (NFC, "é" as U+00E9) and its decomposed
  * twin (NFD, "e" + U+0301) are DIFFERENT identifiers even though
  * every renderer draws them identically. The engine must neither
  * cross-match them (silently forgetting a stranger's rows) nor
  * normalize on write (the JSON raw-line passthrough keeps original
  * bytes, ★r19 non-UTF-8 tier). DuckDB's `=` is binary too, so the
  * oracle replay agrees by construction.
  *
  * This is a CONTRACT pin, not a tolerance sweep: at 100 TB both
  * forms WILL appear (macOS filenames arrive NFD, most web text NFC)
  * and the correct engine behavior is exact-bytes matching — a
  * pipeline wanting normalization-insensitive forget must normalize
  * at INGEST, not in the match engine.
  */
class UnicodeIdentifierSpec extends SparkSpec {
  import spark.implicits._

  private val nfc = Normalizer.normalize("café", Normalizer.Form.NFC)
  private val nfd = Normalizer.normalize(nfc, Normalizer.Form.NFD)

  test("NFC and NFD forms are distinct identifiers end-to-end: a " +
    "queue item in one form matches ONLY rows stored in that form") {
    assert(nfc != nfd && nfc.length == 4 && nfd.length == 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-uni-")
      .toString
    Seq((1L, nfc), (2L, nfd), (3L, "cafe"))
      .toDF("id", "owner").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t")
    val table = Catalog.tableFromDdl("uni", s"$dir/t",
      DataFormat.Parquet, Seq("id" -> "bigint", "owner" -> "string"))
    val mapper = DataMapper("m", "uni", Seq("owner"))
    val groups = Finder.plan(mapper, table,
      Seq(DeletionQueueItem("q", MatchId.Simple(nfc))))
    val data = JobRunner.readTable(spark, table)
    val matched = Finder.matchedRows(spark, data, groups)
      .select("id").as[Long].collect().toSeq
    assert(matched == Seq(1L),
      s"NFC must match only the NFC row, got $matched")

    // and the forget side: survivors keep the NFD + ASCII rows intact
    val survivors = Finder.survivors(spark, data, groups)
      .orderBy("id").select("owner").as[String].collect().toSeq
    assert(survivors == Seq(nfd, "cafe"))
    // the surviving NFD id's BYTES are untouched (no silent
    // normalization on the read path)
    assert(survivors.head.codePoints().toArray.toSeq ==
      Seq(0x63, 0x61, 0x66, 0x65, 0x301))
  }

  test("JSON-lines forget: a matched NFC id deletes only the NFC " +
    "line; the surviving NFD line round-trips byte-identically") {
    val lines = Seq(
      s"""{"id":1,"owner":"$nfc"}""",
      s"""{"id":2,"owner":"$nfd"}""",
      s"""{"id":3,"owner":"cafe"}""")
    val path = stageTextFile(lines.mkString("\n") + "\n")
    val units = Seq(ObjectWorkUnit("uni-json", path, "t",
      DataFormat.JsonLines, true))
    val groups = Seq(Finder.GroupMatches(
      Finder.ColumnGroup(Seq("owner"),
        Seq(org.apache.spark.sql.types.StringType)),
      Seq(("q", Seq(nfc)))))
    val events = graft.forget.DistributedRewrite.run(spark, "uni-json",
      units, groups)
    assert(events.count(_.eventName == JobEventName.ObjectUpdated) == 1)
    val after = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8")
    assert(after == lines(1) + "\n" + lines(2) + "\n",
      s"NFD + ASCII lines byte-identical, got: $after")
  }
}
