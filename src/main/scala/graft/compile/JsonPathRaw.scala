package graft.compile

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One navigation step of a lowered JMESPath field/index chain. */
sealed trait PathStep
final case class FieldStep(name: String) extends PathStep
/** Array index; negatives count from the end (single-pass ring buffer). */
final case class IndexStep(i: Int) extends PathStep

/** Streaming raw-JSON path extractor: returns the RAW JSON text of the value
  * at a field/index path — numbers unchanged ("87", "1.5e3"), strings WITH
  * their quotes ("\"abc\""), containers re-serialized compact. SQL NULL for a
  * missing path, a JSON null, or malformed input.
  *
  * This is the lowering primitive for the hot JMESPath subset: unlike
  * `get_json_object` (which erases JSON types by unquoting strings, making
  * `"5"` and `5` indistinguishable), the raw form preserves enough type
  * information for EXACT JMESPath comparator/truthiness semantics
  * (reference: interpreter.go:33-65, util.go:13-45).
  *
  * Single SAX-style pass per record (Jackson streaming over the document's
  * UTF-8 bytes — the full document is never decoded to a java.lang.String),
  * no tree materialization — the same execution strategy as Spark's own JSON
  * path reader, replacing the reference's full `json.Unmarshal` per record
  * (main.go:89-90). Duplicate object keys resolve to the LAST occurrence,
  * matching Go map unmarshaling.
  */
case class JsonPathRaw(child: Expression, steps: Seq[PathStep])
    extends JsonComputeExpr {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_path_raw"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any =
    if (doc == null) null else JsonPathRaw.extractU8(doc, steps)

  override protected def withNewChildInternal(newChild: Expression): JsonPathRaw =
    copy(child = newChild)
}

/** True iff the document parses as JSON under the SAME parser configuration
  * the interpreted evaluator uses (JValue.parseOpt) — the guard that keeps
  * lowered malformed-insensitive rewrites (negation, literals, null-equality)
  * faithful to the interpreted malformed-input semantics. NULL → false. */
case class JsonIsValid(child: Expression) extends JsonComputeExpr {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_is_valid"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING input, got ${child.dataType.sql}")
  override def compute(doc: UTF8String): Any =
    java.lang.Boolean.valueOf(
      doc != null && graft.jmespath.JValue.parseOpt(doc.getBytes).isDefined)
  override protected def withNewChildInternal(newChild: Expression): JsonIsValid =
    copy(child = newChild)
}

/** JMESPath deep equality over two RAW-extracted JSON values (util.go:50-52
  * reflect.DeepEqual): SQL NULL inputs mean JMESPath `null` (missing path /
  * JSON null), so NULL == NULL is TRUE — never returns SQL NULL itself.
  * Canonical-text equality is the fast path; otherwise both (small, already
  * extracted) subtrees parse and compare structurally, so object key order
  * and number formatting ("1.0" vs "1") don't produce false negatives.
  * Composes with [[ScanFusion]]: its children are plain raw-producing
  * expressions that the fusion rewrites onto shared scan slots. */
case class JsonRawEquals(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_raw_equals"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING (raw JSON) inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def eval(input: InternalRow): Any =
    java.lang.Boolean.valueOf(JsonRawEquals.equalRaw(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = JsonRawEquals.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.value} = $cls.equalRaw(
        ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonRawEquals =
    copy(left = newLeft, right = newRight)
}

object JsonRawEquals {
  import graft.jmespath.{JNull, JValue}
  private val NaNToken = UTF8String.fromString("NaN")
  private val InfToken = UTF8String.fromString("Infinity")
  private def parsed(raw: UTF8String): JValue =
    JValue.parseOpt(raw.getBytes).getOrElse(JNull)
  def equalRaw(a: UTF8String, b: UTF8String): Boolean =
    if (a == null || b == null) a == null && b == null // both JMESPath null
    else if (a.equals(b) && !a.contains(NaNToken) && !a.contains(InfToken))
      true // identical canonical text, and no non-finite token that could
           // make textual equality diverge from Go == (NaN != NaN)
    else JValue.deepEqual(parsed(a), parsed(b))
}

object JsonPathRaw {
  /** Shared parser/generator config for the whole lowered json_* family.
    * NaN/Infinity handling matches the interpreter's JValue mapper exactly
    * (JValue.scala:49-50): non-numeric numbers PARSE (so a document the
    * interpreter accepts never flips to null under lowering) and are written
    * back unquoted, so `try_cast(raw AS double)` yields NaN/Infinity just as
    * the interpreter's JNum does. */
  private[compile] val factory = {
    val f = new JsonFactory()
    f.enable(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS)
    f.disable(com.fasterxml.jackson.core.JsonGenerator.Feature.QUOTE_NON_NUMERIC_NUMBERS)
    f
  }

  /** Raw JSON text at `steps` in a String document, or null. */
  def extract(doc: String, steps: Seq[PathStep]): String =
    try extractImpl(() => factory.createParser(doc), steps)
    catch { case _: Exception => null }

  /** Raw JSON text at `steps`, parsing the document's UTF-8 bytes directly
    * (no String decode of the document). */
  def extractU8Raw(doc: UTF8String, steps: Seq[PathStep]): String =
    try extractImpl(() => factory.createParser(doc.getBytes), steps)
    catch { case _: Exception => null }

  def extractU8(doc: UTF8String, steps: Seq[PathStep]): UTF8String = {
    val out = extractU8Raw(doc, steps)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** Cost note: the FULL document is parsed exactly once (the first step);
    * each later step re-parses only the previously-extracted subtree, which
    * shrinks monotonically — the buffering is what makes duplicate-key
    * last-wins resolution possible in a streaming pass. `newDocParser` is
    * invoked exactly once. */
  private def extractImpl(newDocParser: () => JsonParser, steps: Seq[PathStep]): String = {
    var current: String = null // null = still at the (unbuffered) document
    for (step <- steps) {
      val p = if (current == null) newDocParser() else factory.createParser(current)
      val next = try one(p, step) finally p.close()
      if (next == null) return null
      current = next
    }
    // normalize: a bare JSON null (or whitespace variants) → SQL NULL
    val p = if (current == null) newDocParser() else factory.createParser(current)
    try {
      val t = p.nextToken()
      if (t == null || t == JsonToken.VALUE_NULL) return null
      CapturePool.copyCurrent(p)
    } finally p.close()
  }

  /** Apply a single step from an open parser; null if not found/mismatched. */
  private def one(p: JsonParser, step: PathStep): String = {
    val t = p.nextToken()
    step match {
      case FieldStep(name) =>
        if (t != JsonToken.START_OBJECT) return null
        var last: String = null
        var ft = p.nextToken()
        while (ft != JsonToken.END_OBJECT) {
          val fn = p.currentName()
          p.nextToken() // move onto the value
          if (fn == name) last = copyCurrent(p) // last occurrence wins
          else p.skipChildren() // no-op for scalars
          ft = p.nextToken()
        }
        last
      case IndexStep(i) if i >= 0 =>
        if (t != JsonToken.START_ARRAY) return null
        var idx = 0
        var vt = p.nextToken()
        while (vt != JsonToken.END_ARRAY) {
          if (idx == i) return copyCurrent(p)
          p.skipChildren()
          idx += 1
          vt = p.nextToken()
        }
        null
      case IndexStep(i) => // negative: element len+i via a ring of size -i
        if (t != JsonToken.START_ARRAY) return null
        val k = -i
        val ring = new Array[String](k)
        var cnt = 0
        var vt = p.nextToken()
        while (vt != JsonToken.END_ARRAY) {
          ring(cnt % k) = copyCurrent(p)
          cnt += 1
          vt = p.nextToken()
        }
        if (cnt >= k) ring(cnt % k) else null
    }
  }

  private def copyCurrent(p: JsonParser): String = CapturePool.copyCurrent(p)
}
