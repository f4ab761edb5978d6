package graft.forget

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.find.Finder.GroupMatches
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Raw-JSON match predicate for the JSON-lines Forget path.
  *
  * The reference evaluates matches on PARSED lines while writing the RAW
  * line through untouched (json_handler.py:41-74), with:
  *   - case-insensitive key lookup at every nesting level
  *     (json_handler.py:11-24);
  *   - missing key ⇒ no match (get_value → None, json_handler.py:26-38);
  *   - composite: a tuple built from only the PRESENT columns, compared
  *     against the full match tuple — equivalent to "all columns present
  *     and equal" (json_handler.py:58-64; SURVEY.md §7.4 risk 4);
  *   - native-typed comparison (int match 1234 equals JSON number 1234 but
  *     NOT JSON string "1234"; numeric cross-type compares numerically,
  *     mirroring Python `==` — generate_queries.py:102-109).
  *
  * Implemented as a Scala UDF over the raw line. This sits outside
  * whole-stage codegen, but the JSON parse itself dominates the cost (the
  * reference pays the same parse per line); the scan stays a single pass.
  */
object JsonMatch {

  /** A match value with the declared column type applied (planning cast,
    * generate_queries.py:495-513): int-family → Long, float-family →
    * Double, decimal → BigDecimal, else String. */
  sealed trait TypedVal extends Serializable
  final case class LongVal(v: Long) extends TypedVal
  final case class DoubleVal(v: Double) extends TypedVal
  final case class DecimalVal(v: BigDecimal) extends TypedVal
  final case class StringVal(v: String) extends TypedVal

  /** @throws graft.model.MatchIdCastingError on unparseable values —
    *         unified with the planner contract
    *         (generate_queries.py:495-519). */
  def cast(raw: String, t: DataType): TypedVal =
    try t match {
      case ByteType | ShortType | IntegerType | LongType => LongVal(raw.toLong)
      case FloatType | DoubleType                        => DoubleVal(raw.toDouble)
      case d: DecimalType =>
        DecimalVal(BigDecimal(raw).setScale(d.scale, BigDecimal.RoundingMode.HALF_UP))
      case _                                             => StringVal(raw)
    } catch {
      case e: NumberFormatException =>
        throw new graft.model.MatchIdCastingError(
          s"Match id '$raw' cannot be cast to $t: ${e.getMessage}")
    }

  /** One group's data, fully serializable for executor-side evaluation. */
  final case class GroupSpec(paths: Seq[Seq[String]],
                             tuples: Set[Seq[TypedVal]]) extends Serializable

  def spec(gm: GroupMatches): GroupSpec = GroupSpec(
    gm.group.columns.map(_.split('.').toSeq),
    gm.rows.map { case (_, vals) =>
      vals.zip(gm.group.types).map { case (v, t) => cast(v, t) }
    }.toSet)

  /** Case-insensitive dot-path lookup over a parsed JSON node; None when
    * any segment is missing or a non-object is traversed. */
  def getValue(node: JsonNode, path: Seq[String]): Option[JsonNode] =
    path.foldLeft(Option(node)) {
      case (Some(n), seg) if n.isObject =>
        val it = n.properties().iterator()
        var found: Option[JsonNode] = None
        while (found.isEmpty && it.hasNext) {
          val e = it.next()
          if (e.getKey.equalsIgnoreCase(seg)) found = Some(e.getValue)
        }
        found
      case _ => None
    }.filter(n => !n.isNull && !n.isMissingNode)

  /** Python-`==`-style comparison between a JSON leaf and a typed match
    * value: numerics compare numerically across types; strings compare as
    * strings; anything else is unequal. */
  def valueEquals(node: JsonNode, m: TypedVal): Boolean = (m match {
    case LongVal(v)    => node.isNumber && decimalOf(node).compare(BigDecimal(v)) == 0
    case DoubleVal(v)  => node.isNumber && decimalOf(node).compare(BigDecimal(v)) == 0
    case DecimalVal(v) => node.isNumber && decimalOf(node).compare(v) == 0
    case StringVal(v)  => node.isTextual && node.asText() == v
  })

  private def decimalOf(n: JsonNode): BigDecimal = BigDecimal(n.decimalValue())

  final class Evaluator(specs: Seq[GroupSpec]) extends Serializable {
    @transient private lazy val mapper = new ObjectMapper()
    def matches(line: String): Boolean = {
      val node =
        try mapper.readTree(line)
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"Malformed JSON line: ${line.take(200)}", e)
        }
      specs.exists { g =>
        val values = g.paths.map(getValue(node, _))
        values.forall(_.isDefined) && g.tuples.exists(t =>
          t.zip(values).forall { case (m, Some(v)) => valueEquals(v, m)
                                 case _            => false })
      }
    }
  }

  /** Column-level predicate: true when the raw JSON line matches any
    * group's match set. */
  def predicate(groups: Seq[GroupMatches]): Column => Column = {
    val ev = new Evaluator(groups.map(spec))
    val f = udf((line: String) => ev.matches(line))
    (c: Column) => f(c)
  }
}
