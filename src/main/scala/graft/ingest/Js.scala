package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Thin null-safe view over Jackson's `JsonNode` (jackson-databind is
  * on Spark's classpath; no extra dependency). Plays the role of the
  * reference's `item.get(k, default)` ladders
  * (ethical_crawler.py:384–405 etc.) — every accessor is total.
  */
final class Js(private val node: JsonNode) extends AnyVal {

  def apply(field: String): Js =
    new Js(if (node == null) null else node.get(field))

  def isMissing: Boolean = node == null || node.isNull

  def str: Option[String] =
    if (isMissing || !node.isTextual) None else Some(node.asText)

  /** Textual or numeric → string (NYC ids/dates arrive as either). */
  def strOrNum: Option[String] =
    if (isMissing) None
    else if (node.isTextual || node.isNumber) Some(node.asText)
    else None

  def long: Option[Long] =
    if (isMissing || !node.isNumber) None else Some(node.asLong)

  def int: Option[Int] = long.map(_.toInt)

  def arr: Seq[Js] =
    if (isMissing || !node.isArray) Seq.empty
    else node.elements.asScala.map(new Js(_)).toSeq

  def strings: Seq[String] = arr.flatMap(_.str)

  def size: Int = if (isMissing || !node.isArray) 0 else node.size

  /** Raw JSON text of this subtree ("" for missing). */
  def rawJson: String = if (node == null) "" else node.toString
}

object Js {
  private val mapper = new ObjectMapper()

  def parse(json: String): Js = new Js(mapper.readTree(json))

  /** Serialize a simple Map/Seq/primitive tree to a JSON string (the
    * `json.dumps(record.metadata)` boundary, ethical_crawler.py:928).
    */
  def render(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.map { case (k, x) => quote(k.toString) + ": " + render(x) }
        .mkString("{", ", ", "}")
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case s: String => quote(s)
    case o: Option[_] => o.map(render).getOrElse("null")
    case b: Boolean => b.toString
    case n: Js => if (n.isMissing) "null" else n.rawJson
    case other => other.toString
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
