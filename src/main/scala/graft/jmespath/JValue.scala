package graft.jmespath

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._

/** Runtime value model for the JMESPath engine.
  *
  * Mirrors the JSON data model of the reference's query language
  * (reference: vendor/github.com/jmespath/go-jmespath/functions.go:19-29):
  * all numbers are IEEE-754 doubles, arrays are ordered and heterogeneous,
  * objects preserve insertion order (the reference iterates Go maps in
  * nondeterministic order; we keep insertion order and sort keys where the
  * reference's output would otherwise be nondeterministic — documented
  * deviation, SURVEY.md §2.6.7).
  */
sealed trait JValue {
  /** JMESPath truthiness (reference: util.go:13-45): false ⇔
    * `false`, `null`, `""`, `[]`, `{}`. Everything else (incl. 0) is true. */
  def truthy: Boolean = this match {
    case JNull        => false
    case JBool(b)     => b
    case JStr(s)      => s.nonEmpty
    case JArr(xs)     => xs.nonEmpty
    case JObj(fields) => fields.nonEmpty
    case _            => true
  }
  def typeName: String = this match {
    case JNull    => "null"
    case _: JBool => "boolean"
    case _: JNum  => "number"
    case _: JStr  => "string"
    case _: JArr  => "array"
    case _: JObj  => "object"
  }
}
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JNum(d: Double) extends JValue
final case class JStr(s: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
/** Insertion-ordered object; `get` is by key. */
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  lazy val asMap: Map[String, JValue] = fields.toMap
  def get(key: String): Option[JValue] = asMap.get(key)
}

object JValue {
  private val mapper = new ObjectMapper()
    .configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)

  /** Parse a JSON document into the engine's value model. Throws on malformed input. */
  def parse(json: String): JValue = fromJackson(mapper.readTree(json))

  def parseOpt(json: String): Option[JValue] =
    try Some(parse(json)) catch { case _: Exception => None }

  /** Parse directly from UTF-8 bytes (no String decode of the document). */
  def parseOpt(json: Array[Byte]): Option[JValue] =
    try Some(fromJackson(mapper.readTree(json))) catch { case _: Exception => None }

  def fromJackson(n: JsonNode): JValue = n match {
    case null                  => JNull
    case _ if n.isNull         => JNull
    case b: BooleanNode        => JBool(b.booleanValue())
    case _ if n.isNumber       => JNum(n.doubleValue())
    case t: TextNode           => JStr(t.textValue())
    case a: ArrayNode          => JArr(a.elements().asScala.map(fromJackson).toVector)
    case o: ObjectNode         =>
      JObj(o.fields().asScala.map(e => e.getKey -> fromJackson(e.getValue)).toVector)
    case other => throw new IllegalArgumentException(s"unsupported JSON node: $other")
  }

  /** Deep structural equality (reference: util.go:50-52 reflect.DeepEqual).
    * Doubles compare by value; NaN != NaN, matching Go. */
  def deepEqual(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JNum(x), JNum(y)) => x == y
    case (JArr(xs), JArr(ys)) =>
      xs.length == ys.length && xs.iterator.zip(ys.iterator).forall { case (l, r) => deepEqual(l, r) }
    case (JObj(xs), JObj(ys)) =>
      xs.length == ys.length && {
        val ym = ys.toMap
        xs.forall { case (k, v) => ym.get(k).exists(deepEqual(v, _)) }
      }
    case _ => a == b
  }

  /** Compact JSON serialization. Object keys are emitted in sorted order,
    * matching Go's `encoding/json` map marshaling (what the reference's
    * `to_string` produces, functions.go:799-808). */
  def serialize(v: JValue): String = {
    val sb = new StringBuilder
    write(v, sb, sortKeys = true)
    sb.toString
  }

  /** Compact JSON preserving object insertion order (used for engine output
    * where we want stable, input-faithful key order). */
  def serializeOrdered(v: JValue): String = {
    val sb = new StringBuilder
    write(v, sb, sortKeys = false)
    sb.toString
  }

  private def write(v: JValue, sb: StringBuilder, sortKeys: Boolean): Unit = v match {
    case JNull    => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(d)  => sb.append(formatNumber(d))
    case JStr(s)  => writeString(s, sb)
    case JArr(xs) =>
      sb.append('[')
      var first = true
      xs.foreach { x => if (!first) sb.append(','); first = false; write(x, sb, sortKeys) }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      val fs = if (sortKeys) fields.sortBy(_._1) else fields
      var first = true
      fs.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); write(x, sb, sortKeys)
      }
      sb.append('}')
  }

  /** Go encoding/json-compatible float formatting: integral doubles print
    * without a fraction ("87" not "87.0"); shortest round-trip otherwise. */
  def formatNumber(d: Double): String = {
    if (d.isNaN || d.isInfinite) return "null" // JSON has no NaN/Inf; Go errors — we emit null
    if (d == Math.floor(d) && Math.abs(d) < 1e15) {
      d.toLong.toString
    } else {
      val s = d.toString // Java shortest repr, e.g. "1.5", "1.0E21"
      if (s.contains('E')) {
        // Go style: 1e+21 / 1e-07
        val i = s.indexOf('E')
        val mant0 = s.substring(0, i)
        val mant = if (mant0.endsWith(".0")) mant0.dropRight(2) else mant0
        // Go strconv 'g' pads exponents to two digits: 1e+21, 1e-07
        val exp0 = s.substring(i + 1)
        val (sign, digits) =
          if (exp0.startsWith("-")) ("-", exp0.drop(1)) else ("+", exp0)
        val padded = if (digits.length < 2) "0" * (2 - digits.length) + digits else digits
        s"${mant}e$sign$padded"
      } else s
    }
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
