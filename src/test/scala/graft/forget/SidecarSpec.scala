package graft.forget

import graft.SparkSpec
import graft.catalog.TableDef
import graft.find.Finder
import graft.model._
import org.apache.hadoop.fs.{Path => HPath}

/** The ★r21 local-FS fast path writes rewritten objects through
  * java.nio (no ChecksumFileSystem), so an object that arrived WITH a
  * valid `.name.crc` sidecar (e.g. staged by a Spark write) must have
  * that now-stale sidecar REMOVED by the commit — otherwise the next
  * checksummed read (any Spark scan of the rewritten object) dies
  * with ChecksumException. */
class SidecarSpec extends SparkSpec {
  import spark.implicits._

  test("rewrite of an object carrying a valid .crc sidecar drops the " +
    "stale sidecar and stays readable through ChecksumFileSystem") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sidecar-")
    val table = s"$dir/t"
    val conf = spark.sparkContext.hadoopConfiguration
    // a CHECKSUMMED write (Hadoop LocalFileSystem), the way the bench's
    // Spark-staged masters arrive: data file + valid .crc sidecar
    val src = new HPath(s"$table/obj.parquet")
    val fs = src.getFileSystem(conf)
    assert(fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem])
    val tmp = s"$dir/stage"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("customer_id", "name")
      .coalesce(1).write.parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    fs.mkdirs(new HPath(table))
    // copyFromLocalFile through the checksummed fs writes the sidecar
    fs.copyFromLocalFile(new HPath(part.toString), src)
    val sidecar = java.nio.file.Paths.get(s"$table/.obj.parquet.crc")
    assert(java.nio.file.Files.exists(sidecar), "precondition: sidecar")

    val schema = spark.read.parquet(src.toString).schema
    val groups = Finder.plan(
      DataMapper("m", "t", Seq("customer_id")),
      TableDef("t", table, DataFormat.Parquet, schema),
      Seq(DeletionQueueItem("q", MatchId.Simple("2"))))
    val events = DistributedRewrite.run(spark, "job-sidecar",
      Seq(ObjectWorkUnit("j", src.toString, "m", DataFormat.Parquet, true)),
      groups)
    assert(events.map(_.eventName) == Seq(JobEventName.ObjectUpdated))

    // stale sidecar must be gone…
    assert(!java.nio.file.Files.exists(sidecar),
      "stale .crc sidecar survived the swap")
    // …and both a checksummed byte read and a Spark scan must succeed
    val in = fs.open(src)
    try in.readAllBytes() finally in.close()
    val rows = spark.read.parquet(src.toString)
      .select($"customer_id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 3L))
  }
}
