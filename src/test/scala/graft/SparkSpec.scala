package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** One shared local session for the whole test run (suites would otherwise
  * pay ~10 s of JVM/codegen warmup each). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1's checksum checkpoint manager livelocks its worker
      // threads under mapGroupsWithState timeout batches on local[4]
      // (tasks parked forever in ChecksumCancellableFSDataOutputStream
      // .close → awaitResult, checksum threads spinning); checkpoint
      // checksums add nothing to local-FS tests
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  val spark: SparkSession = TestSpark.spark

  /** Write `df` as ONE parquet object in a fresh temp dir; returns the
    * part-file path. */
  def stageParquetFile(df: DataFrame,
                       options: Map[String, String] = Map.empty): String = {
    val dir = Files.createTempDirectory("graft-test-").toString
    val w = df.coalesce(1).write.mode("overwrite")
    options.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .parquet(s"$dir/t")
    firstFile(s"$dir/t", ".parquet")
  }

  /** Write raw lines (exact bytes + '\n' between, trailing newline
    * controlled by caller) to a temp file; returns the path. */
  def stageTextFile(content: String, suffix: String = ".json"): String = {
    val p = Files.createTempFile("graft-test-", suffix)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  def stageByteFile(content: Array[Byte], suffix: String = ".json")
      : String = {
    val p = Files.createTempFile("graft-test-", suffix)
    Files.write(p, content)
    p.toString
  }

  def stageGzipBytes(content: Array[Byte]): String = {
    import java.util.zip.GZIPOutputStream
    val p = Files.createTempFile("graft-test-", ".json.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    try out.write(content) finally out.close()
    p.toString
  }

  def readGzipBytes(p: String): Array[Byte] = {
    import java.util.zip.GZIPInputStream
    val in = new GZIPInputStream(Files.newInputStream(Paths.get(p)))
    try in.readAllBytes() finally in.close()
  }

  def stageGzipFile(content: String): String = {
    import java.util.zip.GZIPOutputStream
    val p = Files.createTempFile("graft-test-", ".json.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(p))
    try out.write(content.getBytes("UTF-8")) finally out.close()
    p.toString
  }

  def firstFile(dir: String, suffix: String): String =
    Files.list(Paths.get(dir)).iterator().asScala
      .find(_.toString.endsWith(suffix))
      .getOrElse(fail(s"no $suffix file in $dir")).toString

  def readFileBytes(p: String): Array[Byte] = Files.readAllBytes(Paths.get(p))

  def readGzip(p: String): String = {
    import java.util.zip.GZIPInputStream
    val in = new GZIPInputStream(Files.newInputStream(Paths.get(p)))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
