package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the temporal-state lookup Spark has no native operator
  * for ("what was the latest event for this key at time T?"), built by
  * COMPOSING existing operators (the brief's preferred extension
  * order): probes and events union into one keyed stream, a single
  * per-key window computes the running last-event state, and probe
  * rows carry it out. One shuffle on the key, windows parallel across
  * keys (never a global window), payload carried as ONE struct so the
  * running aggregate is a single buffer per row.
  *
  * Deterministic contract: "last" means the maximum `(ts, tieCols...)`
  * event at or before the probe's timestamp — a TOTAL order when the
  * tie columns make events unique (e.g. an event id), so equal-ts
  * events never flap between runs or engines. Probes at exactly an
  * event's timestamp SEE that event (events sort before probes at
  * equal ts). Probes with no prior event emit null state and
  * `n_before` 0.
  *
  * Scale: the union is map-side; the window partitions by `keyCol` —
  * state per key is O(1) (a running struct max + count), rows stream
  * through sorted runs. A hot key serializes its own rows through one
  * task — inherent to per-key ordered semantics (same bound as
  * sessionization); keys are the parallelism unit.
  */
object AsofJoin {

  /** For each probe row: the latest event (by `(tsCol, tieCols)`) at
    * or before the probe's `tsCol`, plus `n_before` = how many events
    * preceded it.
    *
    * @param events   event rows: (keyCol, tsCol, payload...)
    * @param probes   probe rows: (keyCol, tsCol, probeCols...)
    * @param tieCols  event columns completing the total order
    * @param payload  event columns to carry (each emitted as
    *                 `last_<name>`)
    * @param probeCols probe columns to carry through unchanged
    * Output: (keyCol, probeCols..., `probe_ts`, `last_ts`,
    *          `last_<payload>`..., `n_before`). */
  def lastEventAsOf(events: DataFrame, probes: DataFrame,
                    keyCol: String, tsCol: String,
                    tieCols: Seq[String], payload: Seq[String],
                    probeCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty,
      "tieCols must complete the event total order (e.g. an event id)")
    val payCols = (tsCol +: tieCols ++: payload).distinct
    val ev = events.select(
      col(keyCol) +:
        col(tsCol).as("_ts") +:
        lit(0).as("_kind") +:
        struct(payCols.map(col): _*).as("_pay") +:
        probeCols.map(c => lit(null).cast(
          probes.schema(c).dataType).as(c)): _*)
    val pr = probes.select(
      col(keyCol) +:
        col(tsCol).as("_ts") +:
        lit(1).as("_kind") +:
        lit(null).cast(ev.schema("_pay").dataType).as("_pay") +:
        probeCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts"), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(pr)
      .withColumn("_last", max(col("_pay")).over(w))
      .withColumn("_n", count(col("_pay")).over(w))
      .filter(col("_kind") === 1)
      .select(
        col(keyCol) +:
          probeCols.map(col) ++:
          col("_ts").as("probe_ts") +:
          col(s"_last.`$tsCol`").as("last_ts") +:
          payload.map(p => col(s"_last.`$p`").as(s"last_$p")) ++:
          col("_n").as("n_before") +: Nil: _*)
  }
}
