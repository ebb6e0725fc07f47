package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{JArr, JNull, JObj, JStr, JValue}

/** VALUE-context emission for the lowered JMESPath subset (SURVEY §4.2):
  * turns the raw-text extraction machinery ([[JsonPathRaw]]) into the
  * engine's OUTPUT convention — the convention [[graft.functions.JmesPathEval]]
  * pins (reference main.go:94-101 prints the marshaled result):
  * JMESPath `null` → SQL NULL, string results unquoted, every other result
  * re-serialized through the interpreter's own canonical serializer
  * (`JValue.serializeOrdered`: Go-style number formatting, insertion-ordered
  * object keys).
  *
  * Only the EXTRACTED subtree is ever tree-materialized — the full document
  * is still navigated in a single streaming pass, which is the whole point
  * of lowering the value path instead of wrapping the interpreter in a UDF.
  */
object ValueEmit {
  /** Escape-free quoted string (`"…"` with no backslash): unquoting is a
    * substring, no parse needed. */
  private def isPlainString(raw: String): Boolean =
    raw.length >= 2 && raw.charAt(0) == '"' && raw.indexOf('\\') < 0

  /** Integer token short enough (≤ 15 digits) that the double round-trip the
    * parse path would take is the identity — pass the text through.
    * `-0` is excluded: the parse path emits `0` ((-0.0).toLong), not `-0`. */
  private def isSmallInt(raw: String): Boolean = {
    if (raw == "-0") return false
    val start = if (raw.charAt(0) == '-') 1 else 0
    val digits = raw.length - start
    if (digits < 1 || digits > 15) return false
    var i = start
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** JmesPathEval output convention for a raw JSON subtree. The common
    * scalar shapes (plain strings, small integers, booleans) skip the
    * parse+reserialize round-trip — it is the identity for them, and on
    * ~100 B documents it dominates the per-record cost of the fused scan
    * (round-7 verdict #7). */
  def fromRaw(raw: String): String =
    if (raw == null) null
    else if (isPlainString(raw)) raw.substring(1, raw.length - 1)
    else if (raw == "true" || raw == "false") raw
    else if (raw == "null") null
    else if (isSmallInt(raw)) raw
    else JValue.parseOpt(raw) match {
      case None | Some(JNull) => null
      case Some(JStr(s))      => s
      case Some(v)            => JValue.serializeOrdered(v)
    }

  /** Parsed value of a raw subtree; a missing/unreadable subtree is the
    * JMESPath `null` value (never-throw navigation). */
  def parsedOrNull(raw: String): JValue =
    if (raw == null) JNull
    else JValue.parseOpt(raw).getOrElse(JNull)
}

/** Canonical engine-output text of the value at a field/index path
  * (empty path = the whole document): NULL for a missing path, a JMESPath
  * `null` result, a NULL document, or malformed input — exactly
  * [[graft.functions.JmesPathEval]] over a lowerable path expression. */
case class JsonPathValue(child: Expression, steps: Seq[PathStep])
    extends JsonComputeExpr {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_path_value"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    val out = ValueEmit.fromRaw(JsonPathRaw.extractU8Raw(doc, steps))
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonPathValue =
    copy(child = newChild)
}

/** Serialized array of the elements surviving a lowered (filter-)projection —
  * the VALUE twin of [[JsonProjectionCount]] (same single traversal, shared
  * via `JsonProjectionCount.collect`): `"[e1,e2]"` with each element the
  * canonical serialization of the `sub`-path value, `"[]"` when nothing
  * survives, SQL NULL when the base path is missing / not a container
  * (projection over a non-array is JMESPath `null`) or the document is
  * NULL/malformed. */
case class JsonProjectionEmit(child: Expression, steps: Seq[PathStep],
                              pred: Option[RPred], sub: Seq[PathStep],
                              objectValues: Boolean = false,
                              flatten: Boolean = false,
                              slice: Option[(Option[Int], Option[Int], Option[Int])] = None)
    extends JsonComputeExpr {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_projection_emit"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    val raws = JsonProjectionCount.collect(doc, steps, pred, sub,
      objectValues, flatten, slice)
    if (raws == null) null
    else UTF8String.fromString(
      JValue.serializeOrdered(JArr(raws.map(ValueEmit.parsedOrNull))))
  }

  override protected def withNewChildInternal(newChild: Expression): JsonProjectionEmit =
    copy(child = newChild)
}

/** One item of a lowered multi-select: a relative path or a literal. */
sealed trait MSItem
final case class MSPath(steps: Seq[PathStep]) extends MSItem
final case class MSConst(v: JValue) extends MSItem

/** Lowered multi-select list/hash over an optional path prefix
  * (`a.b.[x, y.z]` / `{k1: x, k2: y}`): items are evaluated against the
  * prefix value and — unlike projections — null results are KEPT
  * (interpreter.go:202-240; our Interpreter.scala MultiSelect arms). NULL
  * when the prefix value is missing or JSON null (multi-select over `null`
  * is `null`), or the document is NULL/malformed. */
case class JsonMultiSelect(child: Expression, prefix: Seq[PathStep],
                           items: Seq[MSItem], hashKeys: Option[Seq[String]])
    extends JsonComputeExpr {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_multi_select"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    val prefixRaw = JsonPathRaw.extractU8Raw(doc, prefix)
    if (prefixRaw == null) return null
    val vals = items.map {
      case MSPath(steps) => ValueEmit.parsedOrNull(JsonPathRaw.extract(prefixRaw, steps))
      case MSConst(v)    => v
    }
    val result: JValue = hashKeys match {
      case None       => JArr(vals.toVector)
      case Some(keys) => JObj(keys.iterator.zip(vals.iterator).toVector)
    }
    UTF8String.fromString(JValue.serializeOrdered(result))
  }

  override protected def withNewChildInternal(newChild: Expression): JsonMultiSelect =
    copy(child = newChild)
}

/** True iff the document parses AND is not the JSON `null` literal — the
  * truthiness precondition of a top-level multi-select (a multi-select over
  * `null` is `null`, hence falsy; over anything else it is a non-empty
  * container, hence truthy). */
case class JsonIsNonNullValue(child: Expression)
    extends JsonComputeExpr {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_is_non_null_value"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING input, got ${child.dataType.sql}")
  override def compute(doc: UTF8String): Any =
    java.lang.Boolean.valueOf(
      doc != null && JValue.parseOpt(doc.getBytes).exists(_ != JNull))
  override protected def withNewChildInternal(newChild: Expression): JsonIsNonNullValue =
    copy(child = newChild)
}
