package graft

import graft.catalog.TableDef
import graft.find.Finder
import graft.forget.DistributedRewrite
import graft.model._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based Find/Forget consistency (SURVEY.md §7.4 risk 3 — the
  * typed-vs-stringified match surface "ScalaCheck this"):
  *
  * For random data (nulls, decimals, floats incl. NaN/-0.0, quoted and
  * non-ASCII strings) and random match sets, the TWO independent Forget
  * implementations must agree exactly — the Catalyst predicate path
  * ([[Finder.survivors]]) and the task-side parquet-mr Group evaluation
  * ([[DistributedRewrite]]) — and both must be consistent with Find: a
  * found object loses exactly the matched rows; an unmatched object is
  * never touched and surfaces the zero-deletion error.
  *
  * Cases are drawn from ScalaCheck generators with a fixed seed, so the
  * suite is deterministic while still exploring the value space.
  */
class FindForgetPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("bal", DecimalType(12, 2)),
    StructField("f", DoubleType)))

  private val genRow: Gen[Row] = for {
    id <- Gen.option(Gen.choose(0L, 30L))
    name <- Gen.option(Gen.oneOf("alice", "bob", "carol", "d'oh", "Ünïcode"))
    bal <- Gen.option(Gen.choose(0, 9999).map(c =>
      new java.math.BigDecimal(c).movePointLeft(2).setScale(2)))
    f <- Gen.option(Gen.oneOf(0.0, -0.0, 1.5, 2.25, Double.NaN))
  } yield Row(id.orNull, name.orNull, bal.orNull, f.orNull)

  private val genCase: Gen[(List[Row], List[(String, String)])] = for {
    rows <- Gen.listOfN(40, genRow)
    nMatches <- Gen.choose(1, 4)
    matches <- Gen.listOfN(nMatches, for {
      column <- Gen.oneOf("id", "name", "bal", "f")
      value <- column match {
        case "id" => Gen.choose(0L, 30L).map(_.toString)
        case "name" => Gen.oneOf("alice", "bob", "carol", "d'oh", "zz")
        case "bal" => Gen.oneOf("1.5", "0.07", "12.34", "99.990")
        // '-0.0' is excluded here: its Find(varchar) vs Forget(native)
        // behavior intentionally diverges, faithful to the reference
        // (Python float('-0.0') == 0.0 while Athena varchar differs) —
        // pinned by the dedicated test below
        case "f" => Gen.oneOf("1.5", "NaN", "2.25")
      }
    } yield (column, value))
  } yield (rows, matches)

  test("task-side parquet rewrite agrees with the Catalyst predicate on " +
    "randomized data and match sets (12 seeded cases)") {
    val params = Gen.Parameters.default
    (1 to 12).foreach { i =>
      val (rows, matches) = genCase.pureApply(params, Seed(42L + i))
      val clue = s"[case $i matches=$matches]"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val file = stageParquetFile(df)
      val data = spark.read.parquet(file)
      val table = TableDef("t", file, DataFormat.Parquet, schema)
      // one mapper per matched column so each value applies only where
      // it casts
      val groups = matches.groupBy(_._1).toSeq.flatMap { case (c, ms) =>
        Finder.plan(DataMapper(s"m_$c", "t", Seq(c)), table,
          ms.zipWithIndex.map { case ((_, v), j) =>
            DeletionQueueItem(s"q$c$j", MatchId.Simple(v),
              dataMappers = Seq(s"m_$c"))
          })
      }

      val expectMatched = Finder.matchedRows(spark, data, groups).count()
      val expectSurvive = Finder.survivors(spark, data, groups).count()
      val total = data.count()
      assert(expectMatched + expectSurvive == total, clue)

      val events = DistributedRewrite.run(spark, "p",
        Seq(ObjectWorkUnit("p", file, "m", DataFormat.Parquet, true)),
        groups)
      val e = events.head
      if (expectMatched == 0) {
        assert(e.eventName == JobEventName.ObjectUpdateFailed,
          s"$clue zero-deletion must fail, got $e")
        assert(spark.read.parquet(file).count() == total,
          s"$clue unmatched object was modified")
      } else {
        assert(e.eventName == JobEventName.ObjectUpdated, s"$clue $e")
        assert(e.statsProcessed == total, clue)
        assert(e.statsDeleted == expectMatched,
          s"$clue task deleted ${e.statsDeleted}, predicate matched " +
            s"$expectMatched")
        assert(spark.read.parquet(file).count() == expectSurvive, clue)
        assert(Finder.matchedRows(spark,
          spark.read.parquet(file), groups).count() == 0L,
          s"$clue survivors still match")
      }
    }
  }

  test("-0.0 deviation pinned: Find matches only '-0.0'-rendered rows, " +
    "Forget deletes the whole native ==0.0 class (reference parity)") {
    import spark.implicits._
    val df = Seq(1.5, 0.0, -0.0, 2.5).toDF("f")
    val file = stageParquetFile(df)
    val data = spark.read.parquet(file)
    val table = TableDef("t", file, DataFormat.Parquet, data.schema)
    val groups = Finder.plan(DataMapper("m", "t", Seq("f")), table,
      Seq(DeletionQueueItem("q", MatchId.Simple("-0.0"))))
    // Find: varchar contract — only the -0.0 row renders '-0.0'
    assert(Finder.matchedRows(spark, data, groups).count() == 1L)
    // Forget: native equality — Python float('-0.0') == 0.0, so BOTH
    // zero rows go (reference parquet_handler `in set` semantics)
    assert(Finder.survivors(spark, data, groups).count() == 2L)
    val events = DistributedRewrite.run(spark, "z",
      Seq(ObjectWorkUnit("z", file, "m", DataFormat.Parquet, true)), groups)
    assert(events.head.statsDeleted == 2L)
    assert(spark.read.parquet(file).count() == 2L)
  }
}
