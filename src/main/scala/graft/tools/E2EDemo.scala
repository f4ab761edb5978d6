package graft.tools

import graft.catalog.{Catalog, TableDef}
import graft.find.Finder
import graft.forget.Forget
import graft.model._
import org.apache.spark.sql.{SaveMode, SparkSession}
import java.nio.file.{Files, Paths}

/** End-to-end demonstration/verification driver: stages a private copy of
  * the customer table (parquet + a derived JSON-lines object), runs a full
  * Find → Forget deletion job against it, and prints observable before /
  * after evidence. Also probes the two planner/engine error invariants
  * (MatchIdCastingError, ZeroDeletionError).
  *
  * Usage: runMain graft.tools.E2EDemo [sfDir]
  */
object E2EDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lake = Files.createTempDirectory("graft-lake-").toString
    println(s"== staging lake at $lake")
    // one parquet object + one json-lines object with the same rows
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    src.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$lake/customer_pq")
    src.coalesce(1).write.mode(SaveMode.Overwrite)
      .json(s"$lake/customer_json")

    val pqFile = Files.list(Paths.get(s"$lake/customer_pq"))
      .filter(_.toString.endsWith(".parquet")).findFirst.get.toString
    val jsonFile = Files.list(Paths.get(s"$lake/customer_json"))
      .filter(_.toString.endsWith(".json")).findFirst.get.toString

    val queue = Seq(
      DeletionQueueItem("s1", MatchId.Simple("7")),
      DeletionQueueItem("s2", MatchId.Simple("23")),
      DeletionQueueItem("c1", MatchId.Composite(
        Map("c_mktsegment" -> "FURNITURE", "c_nationkey" -> "2")),
        dataMappers = Seq("m1")))

    val table = TableDef("customer", s"$lake/customer_pq",
      DataFormat.Parquet, src.schema)
    val mapper = DataMapper("m1", "customer",
      Seq("c_custkey", "c_mktsegment", "c_nationkey"))
    Catalog.validateMapper(mapper, table)
    val groups = Finder.plan(mapper, table, queue)
    println(s"== planned ${groups.size} column groups: " +
      groups.map(g => s"${g.group.key}(${g.rows.size})").mkString(", "))

    // FIND
    val data = spark.read.parquet(table.location)
    val found = Finder.matchedFiles(spark, data, groups)
      .collect().map(_.getString(0))
    println(s"== find: ${found.length} matched object(s)")
    found.foreach(p => println(s"   $p"))

    val before = spark.read.parquet(pqFile).count()
    val expectDeleted = Finder.matchedRows(spark, data, groups).count()

    // FORGET (parquet)
    val units = found.map(p =>
      ObjectWorkUnit("job1", p, mapper.id, DataFormat.Parquet,
        deleteOldVersions = true))
    val events = Forget.run(spark, "job1", units.toSeq, groups)
    events.foreach(e => println(
      s"== event ${e.eventName} path=${e.path} processed=" +
        s"${e.statsProcessed} deleted=${e.statsDeleted}"))

    val after = spark.read.parquet(pqFile).count()
    println(s"== parquet rows: before=$before after=$after " +
      s"(expected deleted=$expectDeleted)")
    val survivorsMatched =
      Finder.matchedRows(spark, spark.read.parquet(pqFile), groups).count()
    println(s"== survivors still matching: $survivorsMatched (want 0)")

    // FORGET (json-lines, raw-line preserving)
    val jBefore = spark.read.textFile(jsonFile).count()
    val jr = Forget.rewriteJsonLines(spark, jsonFile, groups)
    val jAfter = spark.read.textFile(jsonFile).count()
    println(s"== json rows: before=$jBefore after=$jAfter " +
      s"deleted=${jr.deletedRows}")

    // PROBE 1: zero-deletion invariant — rewriting an already-clean object
    try {
      Forget.rewriteParquet(spark, pqFile, groups)
      println("!! probe1 FAILED: expected ZeroDeletionError")
    } catch {
      case _: ZeroDeletionError => println("== probe1 OK: ZeroDeletionError")
    }

    // PROBE 2: uncastable match id on an int column ⇒ planning error
    try {
      val badQueue = Seq(DeletionQueueItem("bad", MatchId.Simple("not-a-number")))
      val badGroups = Finder.plan(
        DataMapper("m2", "customer", Seq("c_custkey")), table, badQueue)
      Finder.matchedFiles(spark, data, badGroups).collect()
      println("!! probe2 FAILED: expected MatchIdCastingError")
    } catch {
      case _: MatchIdCastingError =>
        println("== probe2 OK: MatchIdCastingError")
    }

    val pass = after == before - expectDeleted && survivorsMatched == 0 &&
      jAfter == jBefore - jr.deletedRows && jr.deletedRows == expectDeleted
    println(if (pass) "== E2E PASS" else "== E2E FAIL")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
