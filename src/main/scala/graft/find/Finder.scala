package graft.find

import graft.catalog.TableDef
import graft.model._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Find-phase planner: turns (mapper, deletion queue) into
  *   1. a per-column-group match "manifest" DataFrame, and
  *   2. the find plan — a broadcast left-semi join per column group over a
  *      pruned projection, unioned, yielding the DISTINCT set of file paths
  *      containing at least one match.
  *
  * Re-expresses the reference's generated Athena SQL (SURVEY.md §2.3;
  * reference: backend/lambdas/tasks/generate_queries.py and
  * execute_query.py:30-137) as a Catalyst plan:
  *
  *   - data side key: `cast(col as string)` — single-column groups — or
  *     `concat(cast(c1 as string), TOKEN, cast(c2 as string), …)` over the
  *     lexicographically sorted columns for composite groups
  *     (execute_query.py:90-122). `concat` (null-propagating) is used, not
  *     `concat_ws`, to mirror Athena's null semantics: a null in any
  *     composite column means the row cannot match.
  *   - manifest side: match values cast to the column type then back to
  *     string *by Spark itself*, so both join sides use identical cast
  *     rendering (the reference pre-stringifies in Python,
  *     generate_queries.py:93-113 — same contract, one cast engine).
  *   - the manifest is tiny (queue-sized): always `broadcast()`.
  *
  * Scale notes (100 TB target): each column-group branch projects ONLY its
  * identifier columns + the file path, so the parquet scan reads ~1-7% of
  * the table bytes (BASELINE.md "column-scan ratio"); the semi-join is a
  * BroadcastHashJoin with no shuffle of the probe side; `.distinct()` on
  * the surviving paths shuffles only (paths × matched-files) rows.
  */
object Finder {

  /** Sentinel joining composite key parts; same role as the reference's
    * `_S3F2COMP_` token (generate_queries.py:27). */
  val CompositeToken = "_GRAFTCOMP_"

  /** Output column holding the source file path. */
  val PathCol = "_file_path"

  /** A canonical column group: lexicographically sorted identifier
    * column dot-paths + their resolved leaf types. */
  final case class ColumnGroup(columns: Seq[String], types: Seq[DataType]) {
    require(columns == columns.sorted, s"group not canonical: $columns")
    def key: String = columns.mkString(CompositeToken)
  }

  /** Matches for one column group: (queueItemId, raw string values aligned
    * with group.columns). */
  final case class GroupMatches(
      group: ColumnGroup, rows: Seq[(String, Seq[String])])

  /** Scope queue items to a mapper and group them by canonical column
    * group (reference: generate_queries.py:167-215). Simple matches fan
    * out to every identifier column of the mapper; Composite matches use
    * their own (sorted) column set, which must be a subset of the mapper's
    * identifier columns.
    */
  def plan(mapper: DataMapper, table: TableDef,
           queue: Seq[DeletionQueueItem]): Seq[GroupMatches] = {
    import graft.catalog.Catalog.resolveIdentifier
    val applicable = queue.filter(i =>
      i.dataMappers.isEmpty || i.dataMappers.contains(mapper.id))

    val simple = applicable.collect {
      case DeletionQueueItem(id, MatchId.Simple(v), _, _, _) => (id, v)
    }
    val composite = applicable.collect {
      case DeletionQueueItem(id, MatchId.Composite(pairs), _, _, _) =>
        (id, pairs)
    }

    val simpleGroups = if (simple.isEmpty) Nil else mapper.columns.map { c =>
      val t = resolveIdentifier(table.schema, c)
      GroupMatches(ColumnGroup(Seq(c), Seq(t)),
        simple.map { case (id, v) => (id, Seq(v)) })
    }

    val compositeGroups = composite
      .map { case (id, pairs) =>
        val cols = pairs.keys.toSeq.sorted // canonical order, gq.py:197
        val unknown = cols.filterNot(mapper.columns.contains)
        require(unknown.isEmpty,
          s"Composite match $id references non-identifier columns $unknown")
        (cols, (id, cols.map(pairs)))
      }
      .groupBy(_._1)
      .map { case (cols, rows) =>
        GroupMatches(
          ColumnGroup(cols, cols.map(resolveIdentifier(table.schema, _))),
          rows.map(_._2))
      }
      .toSeq

    (simpleGroups ++ compositeGroups).filter(_.rows.nonEmpty)
  }

  /** Build the manifest DataFrame for one column group:
    * `(item_id, columns_key, match_key)` with `match_key` computed by
    * casting each raw value to the column's type and back to string —
    * Spark-rendered, so it agrees byte-for-byte with the data-side key.
    *
    * Fails with [[MatchIdCastingError]] when a value does not cast
    * (reference: generate_queries.py:495-519).
    */
  def manifest(spark: SparkSession, gm: GroupMatches): DataFrame = {
    import spark.implicits._
    val g = gm.group
    val raw = gm.rows.toDF("item_id", "vals")
    val castParts: Seq[Column] = g.types.zipWithIndex.map { case (t, i) =>
      try_cast(element_at($"vals", i + 1), t)
    }
    // validation pass: any non-null raw value whose cast is null ⇒ error
    val bad = raw
      .filter(castParts.zipWithIndex
        .map { case (c, i) =>
          element_at($"vals", i + 1).isNotNull && c.isNull }
        .reduce(_ || _))
      .select($"item_id", $"vals")
      .take(1)
    if (bad.nonEmpty) {
      val r = bad.head
      throw new MatchIdCastingError(
        s"Match id ${r.getSeq[String](1).mkString(",")} (item " +
          s"${r.getString(0)}) cannot be cast to types ${g.types.mkString(",")}")
    }
    val keyParts = castParts.map(_.cast(StringType))
    val key =
      if (keyParts.size == 1) keyParts.head
      else concat(interleave(keyParts, lit(CompositeToken)): _*)
    raw.select($"item_id", lit(g.key).as("columns_key"), key.as("match_key"))
  }

  /** try_cast wrapper: Spark 4 runs ANSI mode by default, where `cast`
    * throws mid-query; planning-time validation wants null-on-failure. */
  private def try_cast(c: Column, t: DataType): Column =
    c.try_cast(t.sql)

  private def interleave(parts: Seq[Column], sep: Column): Seq[Column] =
    parts.flatMap(p => Seq(p, sep)).dropRight(1)

  /** Data-side join key for a group over `df`'s columns
    * (execute_query.py:90-122 semantics — see class doc). */
  def dataKey(g: ColumnGroup): Column = {
    val parts = g.columns.map(c => col(c).cast(StringType))
    if (parts.size == 1) parts.head
    else concat(interleave(parts, lit(CompositeToken)): _*)
  }

  /** The Find query for one mapper: DISTINCT file paths containing ≥1
    * matching row. One pruned-projection broadcast semi-join per column
    * group, unioned (the Spark form of the reference's UNION ALL of
    * per-group subqueries, execute_query.py:105-137).
    *
    * @param data the mapper's table as a DataFrame (already
    *             partition-filtered if the mapper scopes partitions)
    */
  def matchedFiles(spark: SparkSession, data: DataFrame,
                   groups: Seq[GroupMatches]): DataFrame = {
    import spark.implicits._
    require(groups.nonEmpty, "no match groups — nothing to find")
    val branches = groups.map { gm =>
      val keyed = data.select(
        input_file_name().as(PathCol), dataKey(gm.group).as("_key"))
      val m = manifest(spark, gm).select($"match_key")
      keyed
        .join(broadcast(m), $"_key" === $"match_key", "left_semi")
        .select(col(PathCol))
    }
    branches.reduce(_ union _).distinct()
  }

  /** The matched ROWS (not just files) — used by oracle-checked queries
    * and as the probe side of row-level reporting. Same plan shape as
    * [[matchedFiles]] but keeps the data columns. */
  def matchedRows(spark: SparkSession, data: DataFrame,
                  groups: Seq[GroupMatches]): DataFrame = {
    import spark.implicits._
    val branches = groups.map { gm =>
      val m = manifest(spark, gm).select($"match_key")
      data.join(broadcast(m),
        dataKey(gm.group) === $"match_key", "left_semi")
    }
    branches.reduce(_ union _).distinct()
  }

  /** Typed matches DataFrame for the Forget phase: group values cast to
    * native column types (reference compares native types in Forget, NOT
    * strings — generate_queries.py:102-109, main.py:97-129). Columns are
    * named `_m0.._mk` aligned with group.columns. */
  def typedMatches(spark: SparkSession, gm: GroupMatches): DataFrame = {
    import spark.implicits._
    val raw = gm.rows.map(_._2).toDF("vals")
    val cols = gm.group.types.zipWithIndex.map { case (t, i) =>
      try_cast(element_at($"vals", i + 1), t).as(s"_m$i")
    }
    raw.select(cols: _*).distinct()
  }

  /** Row-match predicate for Forget, as an anti-join chain: returns the
    * surviving rows of `fileDf` after removing every row matching any
    * group (left_anti per group — null-safe: a null column never equals,
    * so null rows survive, matching reference semantics). */
  def survivors(spark: SparkSession, fileDf: DataFrame,
                groups: Seq[GroupMatches]): DataFrame =
    groups.foldLeft(fileDf) { (df, gm) =>
      val m = typedMatches(spark, gm)
      val cond = gm.group.columns.zipWithIndex
        .map { case (c, i) => df(c) === m(s"_m$i") }
        .reduce(_ && _)
      df.join(broadcast(m), cond, "left_anti")
    }
}
