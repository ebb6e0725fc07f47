package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{Ast, Functions, JNull, JNum, JStr, JValue, JmesRuntimeError}

/** Lowered JMESPath function-call IR (SURVEY §4.2; round-6 verdict item #2).
  *
  * A function call lowers when every argument is a field/index path, a
  * literal, an expression reference (`&expr`), or a nested lowerable call.
  * Path arguments are extracted with the streaming [[JsonPathRaw]] navigator
  * and only the (small) extracted subtree is tree-materialized; the function
  * itself is the SAME corpus-validated [[graft.jmespath.Functions]] dispatch
  * the interpreter uses — so `-filter 'length(tags) > \`2\`'` no longer
  * full-tree-parses every record (reference anti-pattern
  * vendor/.../go-jmespath/api.go:41-48), it streams to `tags` and runs
  * `length` on that subtree alone.
  */
sealed trait FnArgIR
/** Field/index chain evaluated against the document (missing → JMESPath null). */
final case class FnPathArg(steps: Seq[PathStep]) extends FnArgIR
final case class FnLitArg(v: JValue) extends FnArgIR
final case class FnNestedArg(call: FnCallIR) extends FnArgIR
/** `&expr` — handed to the function, which interprets it per element of the
  * (already extracted, small) argument subtree. */
final case class FnRefArg(ast: Ast) extends FnArgIR

final case class FnCallIR(name: String, args: Seq[FnArgIR])

object FnCallIR {
  /** Result of the call against a raw JSON document; path arguments are
    * extracted streamingly. Throws [[JmesRuntimeError]] exactly like the
    * interpreter (invalid-type / invalid-arity / unknown-function). */
  def eval(doc: UTF8String, c: FnCallIR): JValue =
    evalResolved(c, steps => JsonPathRaw.extractU8Raw(doc, steps))

  /** Same, with path-argument extraction delegated to `resolve` — the fused
    * path ([[ScanFusion]]) resolves from its shared one-pass scan slots so a
    * function call costs zero additional document traversals. `resolve`
    * returns the raw JSON text of the path (null for missing/malformed),
    * exactly the extractU8Raw contract.
    *
    * The hottest single-path calls skip subtree tree-materialization
    * entirely: `length(arr)`/`length(obj)` count delimiters in the CANONICAL
    * raw text (our own generator emits it — compact, escapes intact), and
    * `to_number(path)` parses a bare number token directly. String/other
    * operands keep the generic dispatch (rune semantics, type errors). */
  def evalResolved(c: FnCallIR, resolve: Seq[PathStep] => String): JValue = c match {
    case FnCallIR(name @ ("length" | "to_number"), Seq(FnPathArg(steps))) =>
      val raw = resolve(steps)
      val fast: JValue =
        if (raw == null || raw.isEmpty) null
        else (name, raw.charAt(0)) match {
          case ("length", '[') => JNum(countCanonical(raw, ','))
          case ("length", '{') => JNum(countCanonical(raw, ':'))
          case ("to_number", c0)
              if c0 != '"' && c0 != '[' && c0 != '{' && c0 != 't' && c0 != 'f' =>
            try JNum(java.lang.Double.parseDouble(raw))
            catch { case _: NumberFormatException => null }
          case _ => null
        }
      if (fast != null) fast
      else Functions.call(name, Vector(Functions.FVal(ValueEmit.parsedOrNull(raw))))
    case _ =>
      Functions.call(c.name, c.args.map {
        case FnPathArg(steps) =>
          Functions.FVal(ValueEmit.parsedOrNull(resolve(steps)))
        case FnLitArg(v)    => Functions.FVal(v)
        case FnNestedArg(n) => Functions.FVal(evalResolved(n, resolve))
        case FnRefArg(ast)  => Functions.FRef(ast)
      }.toVector)
  }

  /** Count of top-level array elements (`delim` = ',') or object keys
    * (`delim` = ':') in canonical compact raw JSON: occurrences of the
    * delimiter at nesting depth 1 outside strings (+1 for the element
    * count of a non-empty array). Exact on generator-canonical input. */
  private def countCanonical(raw: String, delim: Char): Int = {
    if (raw.length >= 2 && (raw.charAt(1) == ']' || raw.charAt(1) == '}')) return 0
    var depth = 0; var inStr = false; var esc = false; var hits = 0
    var i = 0
    while (i < raw.length) {
      val ch = raw.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"'       => inStr = true
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case c0 if c0 == delim && depth == 1 => hits += 1
        case _ => ()
      }
      i += 1
    }
    if (delim == ',') hits + 1 else hits
  }

  private def evalPinned(c: FnCallIR): JValue =
    Functions.call(c.name, c.args.map {
      case FnPathArg(_)   => Functions.FVal(JNull)
      case FnLitArg(v)    => Functions.FVal(v)
      case FnNestedArg(n) => Functions.FVal(evalPinned(n))
      case FnRefArg(ast)  => Functions.FRef(ast)
    }.toVector)

  /** The lowered form's result over a MALFORMED document: every path
    * extraction yields JMESPath null (JsonPathRaw never throws), errors
    * collapse to null at the top — the exact runtime behavior of
    * [[JsonFunctionEval]] on an unparsable input. Computed once at lowering
    * time to decide whether a parse-validity guard is required (the
    * interpreted engine returns null/false for malformed documents, so a
    * pinned non-null/truthy result means the lowered form must be guarded). */
  def pinned(c: FnCallIR): JValue =
    try evalPinned(c) catch { case _: JmesRuntimeError => JNull }
}

/** Catalyst evaluation of a lowered JMESPath function call, in one of the
  * three lowering contexts (same output conventions as the interpreted
  * [[graft.functions.JmesPathEval]] family):
  *  - [[JsonFunctionEval.Value]]  → StringType engine output (null → NULL,
  *    strings unquoted, containers canonical);
  *  - [[JsonFunctionEval.Truthy]] → non-null BooleanType truthiness;
  *  - [[JsonFunctionEval.Num]]    → DoubleType, NULL for non-numbers.
  * Runtime errors (invalid-type etc.) → null/false, matching JmesPathEval. */
case class JsonFunctionEval(child: Expression, call: FnCallIR, mode: String)
    extends JsonComputeExpr {
  override def dataType: DataType = JsonFunctionEval.dataTypeOf(mode)
  override def nullable: Boolean = mode != JsonFunctionEval.Truthy
  override def prettyName: String = s"json_function_$mode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  // truthy mode keeps its non-null contract on a NULL document (falsy),
  // like JmesTruthy; the other modes return SQL NULL
  override def compute(doc: UTF8String): Any =
    if (doc == null)
      JsonFunctionEval.runResolved(call, mode, null)
    else
      JsonFunctionEval.runResolved(call, mode,
        steps => JsonPathRaw.extractU8Raw(doc, steps))

  override protected def withNewChildInternal(newChild: Expression): JsonFunctionEval =
    copy(child = newChild)
}

/** Hybrid prefix-streamed evaluation (the nested-projection tail of SURVEY
  * §4.2): stream-extract the longest pure field/index PREFIX of the
  * expression ([[JsonPathRaw]] / a shared scan slot), parse only that
  * subtree, and run the corpus-validated interpreter on the RESIDUAL AST
  * with the subtree as context. Exact by JMESPath's own evaluation rule —
  * `eval(Subexpression(l, r), doc) = eval(r, eval(l, doc))` — including a
  * missing prefix (context = null, NOT a pinned null result: the residual
  * may still produce a value, e.g. a multi-select over null).
  *
  * This lowers `a.b.c[].d[].e`-style nested projections: the document is
  * traversed once to `a.b.c` and only that subtree is materialized, vs the
  * interpreter's full-document parse (go-jmespath api.go:41-48). */
case class JsonSubInterp(child: Expression, prefix: Seq[PathStep],
                         residual: Ast, mode: String)
    extends JsonComputeExpr {
  require(prefix.nonEmpty, "empty prefix would be full interpretation")
  override def dataType: DataType = JsonFunctionEval.dataTypeOf(mode)
  override def nullable: Boolean = mode != JsonFunctionEval.Truthy
  override def prettyName: String = s"json_subinterp_$mode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any =
    JsonSubInterp.run(prefix, residual, mode,
      if (doc == null) null else steps => JsonPathRaw.extractU8Raw(doc, steps))

  override protected def withNewChildInternal(newChild: Expression): JsonSubInterp =
    copy(child = newChild)
}

/** Whole-document interpreted evaluation of an already-parsed AST — the
  * runtime fallback leg of [[Lowering]]'s general pipe composition for
  * documents carrying NaN/Infinity tokens, which the intermediate
  * serialize/reparse would pin to null ([[JValue.formatNumber]]).
  * Conventions match [[graft.functions.JmesPathEval]] exactly: NULL or
  * malformed document → NULL, JMESPath null → NULL, string results
  * unquoted, runtime errors → NULL. */
case class JsonFullInterp(child: Expression, ast: Ast)
    extends JsonComputeExpr {
  import graft.jmespath.Interpreter
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_fullinterp"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING (JSON) input, got ${child.dataType.sql}")

  override def compute(doc: UTF8String): Any = {
    if (doc == null) return null
    JValue.parseOpt(doc.getBytes) match {
      case None => null
      case Some(jv) =>
        JsonFunctionEval.convert(
          try Interpreter.eval(ast, jv)
          catch { case _: JmesRuntimeError => JNull },
          JsonFunctionEval.Value)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonFullInterp =
    copy(child = newChild)
}

object JsonSubInterp {
  import graft.jmespath.Interpreter

  /** Residual result over the extracted-prefix context; `resolve` = null
    * means a NULL document (truthy → FALSE, other modes → NULL). */
  def run(prefix: Seq[PathStep], residual: Ast, mode: String,
          resolve: Seq[PathStep] => String): Any = {
    if (resolve == null)
      return if (mode == JsonFunctionEval.Truthy) java.lang.Boolean.FALSE else null
    JsonFunctionEval.convert(evalCtx(prefix, residual, resolve), mode)
  }

  /** The JValue result (shared across modes by the fused evaluator). */
  def evalCtx(prefix: Seq[PathStep], residual: Ast,
              resolve: Seq[PathStep] => String): JValue = {
    val raw = resolve(prefix)
    val ctx = if (raw == null) JNull else JValue.parseOpt(raw).getOrElse(JNull)
    try Interpreter.eval(residual, ctx) catch { case _: JmesRuntimeError => JNull }
  }
}

object JsonFunctionEval {
  val Value = "value"
  val Truthy = "truthy"
  val Num = "double"

  def dataTypeOf(mode: String): DataType = mode match {
    case Truthy => BooleanType
    case Num    => DoubleType
    case _      => StringType
  }

  /** Shared evaluation body: call result mapped to the mode's output
    * convention. `resolve` = null means a NULL document (truthy → FALSE,
    * other modes → NULL, matching the interpreted family). */
  def runResolved(call: FnCallIR, mode: String,
                  resolve: Seq[PathStep] => String): Any = {
    if (resolve == null)
      return if (mode == Truthy) java.lang.Boolean.FALSE else null
    convert(try FnCallIR.evalResolved(call, resolve)
            catch { case _: JmesRuntimeError => JNull }, mode)
  }

  /** Output convention of each mode over an already-computed call result —
    * split out so [[JsonFusedEval]] can evaluate a call ONCE per record and
    * project all its requested modes from the same JValue (a lowered
    * gate+value pair references the same call in up to three modes). */
  def convert(r: JValue, mode: String): Any = mode match {
    case Truthy => java.lang.Boolean.valueOf(r.truthy)
    case Num =>
      r match { case JNum(d) => java.lang.Double.valueOf(d); case _ => null }
    case _ => r match {
      case JNull   => null
      case JStr(s) => UTF8String.fromString(s)
      case other   => UTF8String.fromString(JValue.serializeOrdered(other))
    }
  }
}
