package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native cosine Expression: equivalence with the builtin composition,
  * null/zero handling, codegen execution, and the SparkSessionExtensions
  * injection route. */
class FloatVectorCosineSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the builtin composition bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val d = rows.toDF("a", "b")
    val got = d.select(
      GraftFunctions.cosine(col("a"), col("b")).as("native"),
      Similarity.cosine(col("a"), col("b")).as("builtin"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, b) => assert(n == b, s"$n != $b") }
  }

  test("null inputs -> null; zero norm -> 0.0; length mismatch -> null " +
    "(★r19 dimension-drift sweep: the old clamp gave a truncated " +
    "vector a valid-looking prefix cosine that disagreed with the " +
    "zip_with composition this kernel claims to match)") {
    GraftFunctions.register(spark)
    val d = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f))),
      (None, Some(Seq(1f, 2f))),
      (Some(Seq(0f, 0f)), Some(Seq(1f, 2f))),
      (Some(Seq(1f, 0f, 9f)), Some(Seq(1f, 0f))))
      .toDF("a", "b")
    val got = d.select(GraftFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(got(0).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(got(1).isEmpty)
    assert(got(2).contains(0.0))
    assert(got(3).isEmpty) // mismatch = no cosine, same as the builtin
    // and the builtin composition agrees on the mismatch shape
    val twin = d.select(Similarity.cosine(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(twin(3).isEmpty)
    // the zero-norm-AND-mismatch edge: NULL (mismatch wins) on BOTH
    // engines — the builtin's n === 0 branch must not turn a
    // mismatched pair into a rankable 0.0
    val zn = Seq((Seq(0f, 0f), Seq(0f, 0f, 0f)))
      .toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")).as("k"),
        Similarity.cosine(col("a"), col("b")).as("t"))
      .as[(Option[Double], Option[Double])].collect().head
    assert(zn._1.isEmpty && zn._2.isEmpty, s"$zn")
  }

  test("null ELEMENTS -> null, agreeing with the zip_with composition; " +
    "parquet-backed so containsNull is true and the branch is emitted") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(1, Seq(1f, 2f), Seq(1f, 2f)),
      Row(2, Seq[Any](1f, null), Seq(1f, 2f)),
      Row(3, Seq(1f, 2f), Seq[Any](null, 2f)))
    val file = stageParquetFile(spark.createDataFrame(rows, schema))
    val df = spark.read.parquet(file).orderBy("id")
    val native = df.select(GraftFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    val builtin = df.select(Similarity.cosine(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(native == builtin, s"$native != $builtin")
    assert(native.count(_.isEmpty) == 2 && native.count(_.isDefined) == 1)
  }

  test("runs inside whole-stage codegen (no eval fallback)") {
    GraftFunctions.register(spark)
    // non-literal input from a file scan, or Catalyst constant-folds the
    // whole projection at optimize time
    val file = stageParquetFile(
      Seq((Seq(1f, 2f), Seq(2f, 1f))).toDF("a", "b"))
    val df = spark.read.parquet(file)
      .select(GraftFunctions.cosine(col("a"), col("b")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"no codegen span in:\n$plan")
    assert(plan.contains("graft_cosine"), s"expression absent in:\n$plan")
  }

  test("SQL resolution through the function registry; extensions class " +
    "injects without error") {
    // spark.sql.extensions is a STATIC conf (applies only at first-session
    // creation), so the injection route is smoke-tested directly and SQL
    // resolution is proven via the runtime registration
    GraftFunctions.register(spark)
    val one = spark.sql(
      "SELECT graft_cosine(array(cast(1 as float), cast(0 as float)), " +
        "array(cast(1 as float), cast(0 as float)))")
      .collect().head.getDouble(0)
    assert(one == 1.0)
    // must not throw
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
  }
}
