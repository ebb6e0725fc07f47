package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType, DoubleType, BooleanType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.bridge

import graft.compile.JsonComputeExpr

import graft.jmespath.{Parser, JValue, JNull, JStr, JNum, JBool, JmesRuntimeError, JmesSyntaxError}

/** Catalyst expression evaluating a compiled JMESPath expression against a
  * JSON document column (StringType → StringType holding the compact-JSON
  * result; a JMESPath `null` result → SQL NULL).
  *
  * This replaces the reference's per-record re-lex/re-parse + tree-walk
  * (main.go:91, vendor/.../go-jmespath/api.go:41-48): the expression is
  * compiled ONCE at plan construction and shipped to executors serialized.
  * Evaluation is interpreted (CodegenFallback) but sits inside whole-stage
  * codegen pipelines as a leaf call — the surrounding plan still codegens.
  */
case class JmesPathEval(child: Expression, expression: String)
    extends JsonComputeExpr {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")
    // surface JMESPath syntax errors at analysis time, not per-task
    try { Parser.parse(expression); TypeCheckResult.TypeCheckSuccess }
    catch { case e: JmesSyntaxError =>
      TypeCheckResult.TypeCheckFailure(s"invalid JMESPath expression: ${e.getMessage}") }
  }

  @transient private lazy val compiled = Parser.compile(expression)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "jmespath"

  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    JValue.parseOpt(doc.getBytes) match {
      case None => null // malformed payload → null, matching never-throw navigation
      case Some(jv) =>
        try {
          compiled.search(jv) match {
            case JNull       => null
            case JStr(s)     => UTF8String.fromString(s)
            case other       => UTF8String.fromString(JValue.serializeOrdered(other))
          }
        } catch {
          // runtime errors (invalid-type etc.) → null in the columnar setting;
          // syntax errors were already raised at plan time via `compiled`
          case _: JmesRuntimeError => null
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JmesPathEval =
    copy(child = newChild)
}

/** Typed variant: JMESPath result coerced to a double (JMESPath numbers are
  * IEEE doubles — reference functions.go:352-355); non-numeric results → NULL. */
case class JmesPathEvalDouble(child: Expression, expression: String)
    extends JsonComputeExpr {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")
    // surface JMESPath syntax errors at analysis time, not per-task
    try { Parser.parse(expression); TypeCheckResult.TypeCheckSuccess }
    catch { case e: JmesSyntaxError =>
      TypeCheckResult.TypeCheckFailure(s"invalid JMESPath expression: ${e.getMessage}") }
  }
  @transient private lazy val compiled = Parser.compile(expression)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jmespath_double"
  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    JValue.parseOpt(doc.getBytes) match {
      case None => null
      case Some(jv) =>
        try compiled.search(jv) match {
          case JNum(d) => java.lang.Double.valueOf(d)
          case _       => null
        } catch { case _: JmesRuntimeError => null }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): JmesPathEvalDouble =
    copy(child = newChild)
}

/** Combined filter+project: the serialized JMESPath result when it is
  * JMESPath-truthy, else NULL — one parse and one tree walk per record where
  * `when(jmesTruthy(doc, e), jmespath(doc, e))` would do two of each. Used by
  * the framed sink's `-filter` path. */
case class JmesPathFiltered(child: Expression, expression: String)
    extends JsonComputeExpr {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")
    try { Parser.parse(expression); TypeCheckResult.TypeCheckSuccess }
    catch { case e: JmesSyntaxError =>
      TypeCheckResult.TypeCheckFailure(s"invalid JMESPath expression: ${e.getMessage}") }
  }
  @transient private lazy val compiled = Parser.compile(expression)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "jmespath_filtered"
  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    JValue.parseOpt(doc.getBytes) match {
      case None => null
      case Some(jv) =>
        try {
          val r = compiled.search(jv)
          if (!r.truthy) null
          else r match {
            case JStr(s) => UTF8String.fromString(s)
            case other   => UTF8String.fromString(JValue.serializeOrdered(other))
          }
        } catch { case _: JmesRuntimeError => null }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): JmesPathFiltered =
    copy(child = newChild)
}

/** Typed variant: JMESPath truthiness of the result (reference util.go:13-45:
  * false ⇔ false/null/""/[]/{}; 0 is TRUE). Never NULL — matches `-filter`
  * predicate semantics. */
case class JmesTruthy(child: Expression, expression: String)
    extends JsonComputeExpr {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")
    // surface JMESPath syntax errors at analysis time, not per-task
    try { Parser.parse(expression); TypeCheckResult.TypeCheckSuccess }
    catch { case e: JmesSyntaxError =>
      TypeCheckResult.TypeCheckFailure(s"invalid JMESPath expression: ${e.getMessage}") }
  }
  @transient private lazy val compiled = Parser.compile(expression)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "jmes_truthy"
  // A NULL document is "no match" (falsy, non-null result), the same way
  // the reference treats an unparsable payload in `-filter`.
  override def compute(doc: UTF8String): Any = {
    if (doc == null) return java.lang.Boolean.FALSE
    JValue.parseOpt(doc.getBytes) match {
      case None => java.lang.Boolean.FALSE
      case Some(jv) =>
        try java.lang.Boolean.valueOf(compiled.search(jv).truthy)
        catch { case _: JmesRuntimeError => java.lang.Boolean.FALSE }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): JmesTruthy =
    copy(child = newChild)
}

/** Column-API entry points. */
object jmes {
  /** Evaluate `expression` against a JSON-string column; result is the
    * compact-JSON text of the JMESPath result (strings unquoted, null → NULL). */
  def jmespath(col: Column, expression: String): Column =
    bridge.column(JmesPathEval(bridge.expression(col), expression))

  def jmespathDouble(col: Column, expression: String): Column =
    bridge.column(JmesPathEvalDouble(bridge.expression(col), expression))

  def jmesTruthy(col: Column, expression: String): Column =
    bridge.column(JmesTruthy(bridge.expression(col), expression))

  /** Serialized result when truthy, NULL otherwise (single evaluation). */
  def jmesFiltered(col: Column, expression: String): Column =
    bridge.column(JmesPathFiltered(bridge.expression(col), expression))

  /** True iff the column parses as JSON under the ENGINE's parser — the
    * dead-letter routing predicate ([[graft.engine.Quarantine]]). */
  def jsonValid(col: Column): Column =
    bridge.column(graft.compile.JsonIsValid(bridge.expression(col)))
}
