package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal => CLit, _}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{Ast, Interpreter, JBool, JNull, JNum, JStr, JValue, JmesRuntimeError, Parser}
import graft.functions.jmes

/** Native Catalyst lowering of the hot JMESPath subset (SURVEY.md §4.2,
  * build step 3): translates field/index chains, literals, comparators and
  * boolean combinators into resolved Expression trees built on
  * [[JsonPathRaw]], with the interpreted [[graft.functions.JmesPathEval]]
  * family as the automatic fallback for everything else.
  *
  * Exactness contract (validated case-by-case against the compliance corpus
  * in LoweringSpec):
  *  - `double(...)`: numeric value of a path — EXACT (raw preserves JSON
  *    types, so a quoted "5" correctly yields NULL, unlike get_json_object);
  *  - `truthy(...)`: predicate semantics (util.go:13-45) — EXACT for the
  *    lowered subset: comparator results that are JMESPath `null` lower to
  *    SQL NULL→false matching null-is-falsy, and `&&`/`||`/`!` value
  *    semantics collapse to boolean and/or/not under truthiness;
  *  - structural equality lowers only against scalar literals; path-vs-path
  *    equality falls back (raw text does not canonicalize object key order).
  */
object Lowering {
  import Ast._

  private val False = CLit(false, BooleanType)
  private def str(s: String) = CLit(UTF8String.fromString(s), StringType)
  // Jackson-canonical string encoding: JsonPathRaw re-serializes extracted
  // values through a Jackson generator, so literal comparisons must use the
  // SAME escaping (JValue.writeString differs on control-char escapes)
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def jacksonString(s: String): String = jsonMapper.writeValueAsString(s)
  private def tryCastD(e: Expression) = Cast(e, DoubleType, None, EvalMode.TRY)

  /** Field/index navigation chain, if the AST is one. */
  def pathOf(ast: Ast): Option[Seq[PathStep]] = ast match {
    case Identity | CurrentNode => Some(Nil)
    case Field(name)            => Some(Seq(FieldStep(name)))
    case Subexpression(l, r)    => for (a <- pathOf(l); b <- pathOf(r)) yield a ++ b
    case Pipe(l, r)             => for (a <- pathOf(l); b <- pathOf(r)) yield a ++ b
    case IndexExpr(l, Index(i)) => pathOf(l).map(_ :+ IndexStep(i))
    case _                      => None
  }

  private def rawOf(doc: Expression, ast: Ast): Option[Expression] =
    pathOf(ast).filter(_.nonEmpty).map(steps => JsonPathRaw(doc, steps))

  // --- prefix-streamed residual interpretation (nested projections etc.) ---

  /** Longest pure field/index PREFIX of the expression and the residual AST
    * with that prefix replaced by the current node. Exact by JMESPath's own
    * evaluation rule: `eval(Subexpression(l, r), doc) = eval(r, eval(l,
    * doc))`, and projections/flattens/filters evaluate their lhs first.
    * `(Nil, ast)` when nothing splits. */
  private def splitPrefix(ast: Ast): (Seq[PathStep], Ast) = ast match {
    case Field(n) => (Seq(FieldStep(n)), CurrentNode)
    case Subexpression(l, r) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast)
      else if (lr == CurrentNode) {
        val (p2, rr) = splitPrefix(r)
        if (p2.isEmpty) (p, r) else (p ++ p2, rr)
      } else (p, Subexpression(lr, r))
    case Pipe(l, r) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast)
      else if (lr == CurrentNode) (p, r) // Pipe(@, r) ≡ r over the context
      else (p, Pipe(lr, r))
    case IndexExpr(l, Index(i)) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast)
      else if (lr == CurrentNode) (p :+ IndexStep(i), CurrentNode)
      else (p, IndexExpr(lr, Index(i)))
    case IndexExpr(l, s) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast) else (p, IndexExpr(lr, s))
    case Projection(l, rhs) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast) else (p, Projection(lr, rhs))
    case ValueProjection(l, rhs) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast) else (p, ValueProjection(lr, rhs))
    case FilterProjection(l, rhs, cond) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast) else (p, FilterProjection(lr, rhs, cond))
    case Flatten(l) =>
      val (p, lr) = splitPrefix(l)
      if (p.isEmpty) (Nil, ast) else (p, Flatten(lr))
    case _ => (Nil, ast)
  }

  /** Hybrid lowering for expressions outside the fully-native subset with a
    * non-empty pure-path prefix: stream to the prefix, interpret the
    * residual over the (small) extracted subtree. */
  private def subInterpOf(doc: Expression, ast: Ast, mode: String): Option[Expression] = {
    val (p, residual) = splitPrefix(ast)
    if (p.isEmpty) None else Some(JsonSubInterp(doc, p, residual, mode))
  }

  /** Residual result when the prefix is pinned null (malformed/absent doc):
    * what the lowered hybrid would produce where the interpreter fails the
    * parse and yields null. None when the AST has no splittable prefix. */
  private def subPinned(ast: Ast): Option[JValue] = {
    val (p, residual) = splitPrefix(ast)
    if (p.isEmpty) None
    else Some(try Interpreter.eval(residual, JNull)
              catch { case _: JmesRuntimeError => JNull })
  }

  /** Plan-time result of a LITERAL-ROOTED expression (`` `{"a":1}`.a ``,
    * `` `[0,1,2]`[1] ``, projections/pipes over a literal): the leftmost data
    * source is a backtick literal, so the whole evaluation is
    * document-independent and folds to a constant via the corpus-validated
    * interpreter. (Top-level bare literals keep their dedicated arms.) */
  private def constOf(ast: Ast): Option[JValue] = {
    def litRooted(a: Ast): Boolean = a match {
      case Literal(_)                => true
      case Subexpression(l, _)       => litRooted(l)
      case Pipe(l, _)                => litRooted(l)
      case IndexExpr(l, _)           => litRooted(l)
      case Projection(l, _)          => litRooted(l)
      case ValueProjection(l, _)     => litRooted(l)
      case FilterProjection(l, _, _) => litRooted(l)
      case Flatten(l)                => litRooted(l)
      case _                         => false
    }
    ast match {
      case Literal(_) => None // dedicated arms handle the bare-literal forms
      case a if litRooted(a) =>
        Some(try Interpreter.eval(a, JNull) catch { case _: JmesRuntimeError => JNull })
      case _ => None
    }
  }

  // --- function calls (round-7: the §2.3 library lowers when every argument
  // is a path / literal / expref / nested lowerable call; path arguments are
  // prefixed when the call sits under a pure-path Pipe/Subexpression, which
  // is exact because field/index navigation composes) -----------------------

  private def fnArgOf(ast: Ast, prefix: Seq[PathStep]): Option[FnArgIR] = ast match {
    case Literal(v)       => Some(FnLitArg(v))
    case ExpRef(e)        => Some(FnRefArg(e))
    case fc: FunctionCall => fnCallOf(fc, prefix).map(FnNestedArg)
    case p                => pathOf(p).map(steps => FnPathArg(prefix ++ steps))
  }

  private def fnCallOf(fc: FunctionCall, prefix: Seq[PathStep] = Nil): Option[FnCallIR] = {
    val args = fc.args.map(fnArgOf(_, prefix))
    if (args.forall(_.isDefined)) Some(FnCallIR(fc.name, args.map(_.get))) else None
  }

  /** The lowered IR of a (possibly path-prefixed) function-call AST. */
  private def fnIROf(ast: Ast): Option[FnCallIR] = ast match {
    case fc: FunctionCall                   => fnCallOf(fc)
    case Subexpression(l, fc: FunctionCall) => pathOf(l).flatMap(p => fnCallOf(fc, p))
    case Pipe(l, fc: FunctionCall)          => pathOf(l).flatMap(p => fnCallOf(fc, p))
    case _                                  => None
  }

  /** Pinned (all paths → null) numeric result — the lowered form's value over
    * a malformed document. Defined only for forms numOf lowers non-path-wise. */
  private def pinnedNum(ast: Ast): Option[Double] = ast match {
    case Literal(JNum(d)) => Some(d)
    case a if constOf(a).isDefined => constOf(a).collect { case JNum(d) => d }
    case _ => fnIROf(ast).flatMap(c => FnCallIR.pinned(c) match {
      case JNum(d) => Some(d)
      case _       => None
    }).orElse(
      if (pathOf(ast).isDefined) None
      else subPinned(ast).collect { case JNum(d) => d })
  }

  /** Numeric (double) value of the AST; NULL for non-numbers. Fully-native
    * lowering first, then the prefix-streamed hybrid. */
  def numOf(doc: Expression, ast: Ast): Option[Expression] =
    numNative(doc, ast).orElse(subInterpOf(doc, ast, JsonFunctionEval.Num))

  private def numNative(doc: Expression, ast: Ast): Option[Expression] = ast match {
    case Literal(JNum(d)) => Some(CLit(d, DoubleType))
    case a if constOf(a).isDefined => constOf(a).map {
      case JNum(d) => CLit(d, DoubleType)
      case _       => CLit(null, DoubleType)
    }
    case _ => fnIROf(ast) match {
      case Some(c) => Some(JsonFunctionEval(doc, c, JsonFunctionEval.Num))
      case None    => rawOf(doc, ast).map(tryCastD)
    }
  }

  /** No NaN/Infinity anywhere in the value — the precondition for comparing
    * against its canonical serialization (formatNumber maps non-finite to
    * "null", which would not round-trip). */
  private def allFinite(v: JValue): Boolean = v match {
    case JNum(d)                 => !d.isNaN && !d.isInfinite
    case graft.jmespath.JArr(xs) => xs.forall(allFinite)
    case graft.jmespath.JObj(fs) => fs.forall(f => allFinite(f._2))
    case _                       => true
  }

  /** Whether evaluating this AST can raise a JmesRuntimeError at runtime
    * (function calls: unknown name, wrong arity, invalid argument types —
    * SURVEY §2.6.2's only runtime error sources; step-0 slices are rejected
    * at parse time). The interpreter aborts the WHOLE expression on such an
    * error, while the lowered forms collapse the erroring node to
    * falsy/null — equivalent in direct/And/Or-right/comparator position,
    * but divergent under NotExpr (collapse flips to TRUE) and in the left
    * arm of OrExpr (the abort preempts the right arm). Those arms refuse
    * the native route when this predicate holds (ADVICE r7 #3). */
  private def canError(ast: Ast): Boolean = ast match {
    case FunctionCall(_, _)        => true
    // `[::0]` parses but throws at eval time (Interpreter.sliceVector) —
    // the SECOND runtime error source beside calls
    case Slice(_, _, Some(0))      => true
    case Subexpression(l, r)       => canError(l) || canError(r)
    case IndexExpr(l, r)           => canError(l) || canError(r)
    case Projection(l, r)          => canError(l) || canError(r)
    case ValueProjection(l, r)     => canError(l) || canError(r)
    case FilterProjection(l, r, c) => canError(l) || canError(r) || canError(c)
    case Flatten(c)                => canError(c)
    case MultiSelectList(items)    => items.exists(canError)
    case MultiSelectHash(items)    => items.exists(p => canError(p._2))
    case Comparator(_, l, r)       => canError(l) || canError(r)
    case OrExpr(l, r)              => canError(l) || canError(r)
    case AndExpr(l, r)             => canError(l) || canError(r)
    case NotExpr(c)                => canError(c)
    case Pipe(l, r)                => canError(l) || canError(r)
    case ExpRef(c)                 => canError(c)
    case _                         => false
  }

  /** Equality of a path against a scalar or (finite) container literal. */
  private def eqCol(doc: Expression, path: Ast, literal: JValue): Option[Expression] = {
    val raw = rawOf(doc, path).getOrElse(return None)
    literal match {
      case JNum(d) if d.isNaN =>
        // Go ==: NaN equals nothing (deepEqual via float64 ==); Spark's
        // EqualTo says NaN = NaN, so pin the result instead of comparing
        Some(False)
      case JNum(d) =>
        Some(Coalesce(Seq(EqualTo(tryCastD(raw), CLit(d, DoubleType)), False)))
      case JStr(s) =>
        Some(Coalesce(Seq(EqualTo(raw, str(jacksonString(s))), False)))
      case JBool(b) =>
        Some(Coalesce(Seq(EqualTo(raw, str(if (b) "true" else "false")), False)))
      case JNull => Some(IsNull(raw))
      case c if allFinite(c) =>
        // container literal: deep equality against its canonical text
        // (JsonRawEquals parses both sides, so key order / number formatting
        // in the document can't produce false negatives)
        Some(JsonRawEquals(raw, str(JValue.serializeOrdered(c))))
      case _ => None // non-finite container literal → fallback
    }
  }

  /** Truthiness of the AST as a non-null BooleanType Expression, or None if
    * the AST is outside the lowered subset. Fully-native lowering first,
    * then the prefix-streamed hybrid. */
  def truthyOf(doc: Expression, ast: Ast): Option[Expression] =
    truthyNative(doc, ast).orElse(subInterpOf(doc, ast, JsonFunctionEval.Truthy))

  private def truthyNative(doc: Expression, ast: Ast): Option[Expression] = ast match {
    case Literal(v)    => Some(CLit(v.truthy, BooleanType))
    case a if constOf(a).isDefined => constOf(a).map(v => CLit(v.truthy, BooleanType))
    case AndExpr(l, r) => for (a <- truthyOf(doc, l); b <- truthyOf(doc, r)) yield And(a, b)
    // an erroring LEFT arm aborts the whole interpreted expression before
    // the right arm can win, but the lowered error→falsy collapse would let
    // it — refuse (an erroring RIGHT arm only runs when the left is falsy,
    // where collapse and abort agree on falsy)
    case OrExpr(l, r) if canError(l) => None
    case OrExpr(l, r)  => for (a <- truthyOf(doc, l); b <- truthyOf(doc, r)) yield Or(a, b)
    // Not flips the error→falsy collapse to TRUE while the interpreter
    // aborts to FALSE — refuse when anything below can error
    case NotExpr(c) if canError(c) => None
    case NotExpr(c)    => truthyOf(doc, c).map(Not)
    case Comparator(op, l, r) => op match {
      case "==" | "!=" =>
        // equality of a lowerable function CALL against a NUMBER literal
        // rides the numeric route: a null / non-numeric / erroring call can
        // never equal a number, which Coalesce(…, False) reproduces. ONLY
        // for `==`: under `!=` the Not would flip an erroring call (falsy
        // for the interpreter, e.g. `length(missing) != \`2\``) to TRUE.
        def callNumEq(a: Ast, v: JValue): Option[Expression] = (op, v) match {
          case ("==", JNum(d)) if d.isNaN => fnIROf(a).map(_ => False) // NaN equals nothing
          case ("==", JNum(d)) => fnIROf(a).map(c => Coalesce(Seq(EqualTo(
            JsonFunctionEval(doc, c, JsonFunctionEval.Num), CLit(d, DoubleType)), False)))
          case _ => None
        }
        val eq = (l, r) match {
          case (p, Literal(v)) => eqCol(doc, p, v).orElse(callNumEq(p, v))
          case (Literal(v), p) => eqCol(doc, p, v).orElse(callNumEq(p, v))
          case (a, b) =>
            // path-vs-path deep equality (`first == last`): both raws come
            // from the same shared scan after fusion; @ lowers to the
            // whole-document canonical raw
            for (pa <- pathOf(a); pb <- pathOf(b))
              yield JsonRawEquals(JsonPathRaw(doc, pa), JsonPathRaw(doc, pb))
        }
        eq.map(e => if (op == "==") e else Not(e))
      case _ =>
        // ordering is numbers-only; a non-number operand → JMESPath null →
        // falsy, which SQL NULL-propagation + coalesce reproduces exactly.
        // NaN needs a guard: Spark's SQL ordering ranks NaN above every
        // number (NaN >= x is TRUE), but Go float64 comparisons are IEEE
        // (always false) — interpreter semantics.
        for (a <- numOf(doc, l); b <- numOf(doc, r)) yield
          Coalesce(Seq(If(Or(IsNaN(a), IsNaN(b)), False, op match {
            case "<"  => LessThan(a, b)
            case "<=" => LessThanOrEqual(a, b)
            case ">"  => GreaterThan(a, b)
            case ">=" => GreaterThanOrEqual(a, b)
          }), False))
    }
    // (filter-)projection truthiness: non-empty result after null-dropping →
    // any surviving element (JsonProjectionExists, streaming with first-hit
    // early exit); the per-element predicate mirrors the top-level
    // comparator/truthy forms
    case Projection(Flatten(inner), rhs) => // `arr[]` one-level flatten
      for (base <- pathOf(inner); sub <- pathOf(rhs))
        yield JsonProjectionExists(doc, base, None, sub, flatten = true)
    // slice projection (`arr[a:b:c]`) — must precede the generic arm.
    // step 0 throws at eval time in the interpreter (whole-expression
    // abort); sliceIndices would silently yield Nil — refuse, the
    // prefix-streamed hybrid's residual interpretation reproduces the
    // abort exactly
    case Projection(IndexExpr(lhs, Slice(a, b, st)), rhs) if !st.contains(0) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionExists(doc, base, None, sub, slice = Some((a, b, st)))
    case Projection(lhs, rhs) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionExists(doc, base, None, sub)
    case FilterProjection(lhs, rhs, cond) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs); p <- rpredOf(cond))
        yield JsonProjectionExists(doc, base, Some(p), sub)
    // object-value projection (`obj.*`) — iterate field values instead
    case ValueProjection(lhs, rhs) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionExists(doc, base, None, sub, objectValues = true)
    // multi-selects always yield a non-empty container for a non-null,
    // parsable input (parser requires >=1 item), so their truthiness is just
    // input validity AND the input not being the JSON `null` value (a
    // multi-select over `null` is `null` — Interpreter MultiSelect arms);
    // under a path prefix it is path presence
    case MultiSelectList(_) | MultiSelectHash(_) =>
      Some(CaseWhen(Seq((IsNull(doc), False)), Some(JsonIsNonNullValue(doc))))
    case Subexpression(l, MultiSelectList(_)) if pathOf(l).exists(_.nonEmpty) =>
      Some(IsNotNull(JsonPathRaw(doc, pathOf(l).get)))
    case Subexpression(l, MultiSelectHash(_)) if pathOf(l).exists(_.nonEmpty) =>
      Some(IsNotNull(JsonPathRaw(doc, pathOf(l).get)))
    case _ => fnIROf(ast) match {
      case Some(c) => Some(JsonFunctionEval(doc, c, JsonFunctionEval.Truthy))
      case None =>
        rawOf(doc, ast).map { raw =>
          CaseWhen(Seq((IsNull(raw), False)),
            Some(Not(In(raw, Seq(str("\"\""), str("false"), str("[]"), str("{}"))))))
        }
    }
  }

  // ---------------------------------------------------------------------
  // VALUE context (SURVEY §4.2 step 4): the serialized engine OUTPUT of the
  // expression under JmesPathEval's convention — null → SQL NULL, strings
  // unquoted, everything else canonical compact JSON. This is the CLI
  // `-filter` hot path (FramedSink.lineCol), the reference's flagship use
  // (main.go:88-101).
  // ---------------------------------------------------------------------

  private val NullStr = CLit(null, StringType)

  /** Engine-output constant for a JMESPath literal. */
  private def constValue(v: JValue): Expression = v match {
    case JNull   => NullStr
    case JStr(s) => str(s)
    case other   => str(JValue.serializeOrdered(other))
  }

  /** Any NaN/Infinity inside a literal of the subtree — such a value would
    * not survive the general pipe composition's serialize/reparse
    * (formatNumber pins it to null), and the document-token runtime probe
    * cannot see plan-time literals. */
  private def hasSpecialNumLiteral(ast: Ast): Boolean = {
    def inVal(v: JValue): Boolean = v match {
      case JNum(d)  => d.isNaN || d.isInfinite
      case graft.jmespath.JArr(xs) => xs.exists(inVal)
      case graft.jmespath.JObj(fs) => fs.exists(f => inVal(f._2))
      case _        => false
    }
    def walk(a: Ast): Boolean = a match {
      case Literal(v) => inVal(v)
      case other: Product => other.productIterator.exists {
        case c: Ast => walk(c)
        case s: Seq[_] => s.exists {
          case c: Ast => walk(c)
          case (_, c: Ast) => walk(c)
          case _ => false
        }
        case (_, c: Ast) => walk(c)
        case _ => false
      }
      case _ => false
    }
    walk(ast)
  }

  /** Any sum()/avg() call inside the subtree — the only JMESPath functions
    * that can PRODUCE a non-finite double from finite inputs (overflow
    * near 1e308). Such a value would not survive the general pipe
    * composition's serialize/reparse (formatNumber pins it to null
    * mid-pipe), and the document-token probe cannot see it because the
    * tokens themselves are finite. */
  private def hasOverflowCapableFn(ast: Ast): Boolean = {
    def walk(a: Ast): Boolean = a match {
      case FunctionCall(n, args) =>
        n == "sum" || n == "avg" || args.exists(walk)
      case other: Product => other.productIterator.exists {
        case c: Ast => walk(c)
        case s: Seq[_] => s.exists {
          case c: Ast => walk(c)
          case (_, c: Ast) => walk(c)
          case _ => false
        }
        case (_, c: Ast) => walk(c)
        case _ => false
      }
      case _ => false
    }
    walk(ast)
  }

  private def msItemsOf(items: Seq[Ast]): Option[Seq[MSItem]] = {
    val lowered = items.map {
      case Literal(v) => Some(MSConst(v))
      case p          => pathOf(p).map(MSPath)
    }
    if (lowered.forall(_.isDefined)) Some(lowered.map(_.get)) else None
  }

  /** Serialized engine output (StringType) of the AST, or None if outside
    * the lowered value subset. NULL-document/malformed-document conventions
    * are added by [[valueNullSafe]]. Fully-native lowering first, then the
    * prefix-streamed hybrid. */
  def valueOf(doc: Expression, ast: Ast): Option[Expression] =
    valueNative(doc, ast).orElse(subInterpOf(doc, ast, JsonFunctionEval.Value))

  private def valueNative(doc: Expression, ast: Ast): Option[Expression] = ast match {
    case Literal(v) => Some(constValue(v))
    case a if constOf(a).isDefined => constOf(a).map(constValue)

    // boolean-valued combinators serialize their JBool/JNull result
    // (same Not/Or-left error guards as the truthy arms: the interpreter's
    // whole-expression abort yields null, which Not would turn into "true")
    case NotExpr(c) if canError(c) => None
    case NotExpr(c) =>
      truthyOf(doc, c).map(t => If(t, str("false"), str("true")))
    case Comparator(op, l, r) => op match {
      case "==" | "!=" =>
        // eqCol is total (Coalesce → false) over PATH operands, matching
        // deepEqual's JBool. A function-call operand must NOT lower here:
        // its truthy equality conflates an erroring call with false — fine
        // for truthiness (error is falsy) but the VALUE of an erroring
        // expression is null, not false.
        def pathOrLit(a: Ast): Boolean = a match {
          case Literal(_) => true
          case _          => pathOf(a).isDefined
        }
        if (pathOrLit(l) && pathOrLit(r))
          truthyOf(doc, ast).map(t => If(t, str("true"), str("false")))
        else None
      case _ =>
        // ordering is numbers-only: a non-number operand → JMESPath null.
        // NaN guard as in the truthy arm: IEEE (Go) comparisons with NaN are
        // false, Spark's SQL ordering says NaN is the largest double.
        for (a <- numOf(doc, l); b <- numOf(doc, r)) yield {
          val cmp = If(Or(IsNaN(a), IsNaN(b)), False, op match {
            case "<"  => LessThan(a, b)
            case "<=" => LessThanOrEqual(a, b)
            case ">"  => GreaterThan(a, b)
            case ">=" => GreaterThanOrEqual(a, b)
          })
          CaseWhen(Seq((Or(IsNull(a), IsNull(b)), NullStr)),
            Some(If(cmp, str("true"), str("false"))))
        }
    }

    // `&&`/`||` return operand VALUES selected by truthiness (util.go:13-45)
    case AndExpr(l, r) =>
      for (lt <- truthyOf(doc, l); lv <- valueOf(doc, l); rv <- valueOf(doc, r))
        yield If(lt, rv, lv)
    case OrExpr(l, r) if canError(l) => None
    case OrExpr(l, r) =>
      for (lt <- truthyOf(doc, l); lv <- valueOf(doc, l); rv <- valueOf(doc, r))
        yield If(lt, lv, rv)

    // (filter-)projections: same traversal as the truthy COUNT lowering,
    // emitting the surviving `sub` values instead of counting them
    case Projection(Flatten(inner), rhs) =>
      (for (base <- pathOf(inner); sub <- pathOf(rhs))
        yield JsonProjectionEmit(doc, base, None, sub, flatten = true))
        .orElse(inner match {
          // non-path lhs (e.g. `sort_by(...)[].field`): by the projection
          // evaluation rule, Projection(Flatten(x), r) ≡
          // Pipe(x, Projection(Flatten(@), r)) over x's VALUE — the
          // general pipe composition takes it from there (with all its
          // container/NaN/pinned-null soundness guards)
          case Identity | CurrentNode => None // base arm already covers it
          case _ =>
            valueNative(doc, Pipe(inner, Projection(Flatten(CurrentNode), rhs)))
        })
    // step 0 refused as in the truthy arm: interpreter aborts, Nil would lie
    case Projection(IndexExpr(lhs, Slice(a, b, st)), rhs) if !st.contains(0) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionEmit(doc, base, None, sub, slice = Some((a, b, st)))
    case Projection(lhs, rhs) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionEmit(doc, base, None, sub)
    case FilterProjection(lhs, rhs, cond) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs); p <- rpredOf(cond))
        yield JsonProjectionEmit(doc, base, Some(p), sub)
    case ValueProjection(lhs, rhs) =>
      for (base <- pathOf(lhs); sub <- pathOf(rhs))
        yield JsonProjectionEmit(doc, base, None, sub, objectValues = true)

    // multi-selects (top-level or under a lowerable path prefix)
    case MultiSelectList(items) =>
      msItemsOf(items).map(JsonMultiSelect(doc, Nil, _, None))
    case MultiSelectHash(pairs) =>
      msItemsOf(pairs.map(_._2))
        .map(JsonMultiSelect(doc, Nil, _, Some(pairs.map(_._1))))
    case Subexpression(l, MultiSelectList(items)) =>
      for (prefix <- pathOf(l); ms <- msItemsOf(items))
        yield JsonMultiSelect(doc, prefix, ms, None)
    case Subexpression(l, MultiSelectHash(pairs)) =>
      for (prefix <- pathOf(l); ms <- msItemsOf(pairs.map(_._2)))
        yield JsonMultiSelect(doc, prefix, ms, Some(pairs.map(_._1)))
    // pipes: the specialized pure-path-prefix forms first (no reserialize
    // roundtrip), then fn-call/path pipes as in the fallthrough arm, then
    // the GENERAL composition — the serialized LHS value IS the document
    // the lowered RHS consumes (our serialization is canonical JSON, and a
    // NULL LHS flows through the RHS exactly like the interpreter's JNull
    // context: raw extraction over a NULL doc is NULL, constants ignore
    // it). Errors stay interpreter territory: an erroring side aborts the
    // WHOLE expression there, which no per-side composition reproduces.
    case p @ Pipe(l, r) =>
      val specialized = r match {
        case MultiSelectList(items) =>
          for (prefix <- pathOf(l); ms <- msItemsOf(items))
            yield JsonMultiSelect(doc, prefix, ms, None)
        case MultiSelectHash(pairs) =>
          for (prefix <- pathOf(l); ms <- msItemsOf(pairs.map(_._2)))
            yield JsonMultiSelect(doc, prefix, ms, Some(pairs.map(_._1)))
        case _ => None
      }
      specialized
        .orElse(fnIROf(p).map(c => JsonFunctionEval(doc, c, JsonFunctionEval.Value)))
        .orElse(pathOf(p).map(steps => JsonPathValue(doc, steps)))
        .orElse {
          // Soundness of the roundtrip, piece by piece:
          //  - stage 1 must root a CONTAINER (multi-select/projection):
          //    containers serialize to canonical JSON (strings quoted);
          //    a bare JStr result serializes UNQUOTED and would not
          //    re-parse as stage 2's document
          //  - a NULL intermediate means the interpreter runs stage 2
          //    over a JNull CONTEXT (not a null document), so that case
          //    pins to the constant `eval(r, JNull)` — the subPinned rule
          //  - formatNumber pins NaN/Infinity to null, so a document (or
          //    a stage-1 literal) that could carry one through falls back
          //    to full interpretation — the textual token probe
          //    over-triggers on strings containing "NaN", which only
          //    costs the interpreted path, never a wrong answer; and a
          //    stage 1 containing sum()/avg() (the only calls that can
          //    PRODUCE a non-finite from finite tokens, by overflow)
          //    falls back statically, since no token probe can see an
          //    Infinity that doesn't exist until the fold runs
          //  - an erroring stage 1 aborts the WHOLE expression in the
          //    interpreter (null) but surfaces here as a NULL
          //    intermediate, indistinguishable from a legitimate null
          //    context — composable only when both legs agree, i.e. the
          //    pinned constant is itself null. An erroring stage 2 needs
          //    no guard: every valueNative arm is interpreter-exact over
          //    its own document, errors included
          def containerRoot(a: Ast): Boolean = a match {
            case MultiSelectList(_) | MultiSelectHash(_) => true
            case Projection(_, _) | FilterProjection(_, _, _) |
                 ValueProjection(_, _) | Flatten(_) => true
            // functions whose spec return type is a container (or error →
            // whole-expression null → the pinned-NULL leg) — never a bare
            // string that would serialize unquoted
            case FunctionCall(n, _) =>
              Set("keys", "values", "map", "sort", "sort_by", "to_array",
                "merge").contains(n)
            case Subexpression(_, rr) => containerRoot(rr)
            case Pipe(_, rr) => containerRoot(rr)
            case _ => false
          }
          val pinnedJ =
            try Interpreter.eval(r, JNull)
            catch { case _: JmesRuntimeError => JNull }
          if (!containerRoot(l) || hasSpecialNumLiteral(l) ||
              hasOverflowCapableFn(l) ||
              (canError(l) && pinnedJ != JNull)) None
          else for (lv <- valueNative(doc, l); rv <- valueNative(lv, r)) yield {
            val special = Or(Contains(doc, str("NaN")),
              Contains(doc, str("Infinity")))
            If(special, JsonFullInterp(doc, p),
              If(IsNull(lv), constValue(pinnedJ), rv))
          }
        }

    // function calls (possibly under a pure-path Pipe/Subexpression prefix)
    // and plain field/index chains (incl. identity: canonical whole document)
    case _ => fnIROf(ast) match {
      case Some(c) => Some(JsonFunctionEval(doc, c, JsonFunctionEval.Value))
      case None    => pathOf(ast).map(steps => JsonPathValue(doc, steps))
    }
  }

  /** Forms whose lowered VALUE can be non-NULL over a malformed document
    * where the interpreter (which fails the parse) returns null: anything
    * producing constants or total booleans, and function calls whose pinned
    * (all-paths-null) result is non-null. Pure path/projection/multi-select
    * extraction already yields NULL on malformed input. */
  private def valueMalformedSensitive(ast: Ast): Boolean = ast match {
    case Literal(_) | NotExpr(_) | Comparator(_, _, _) => true
    case a if constOf(a).isDefined => constOf(a).get != JNull
    case AndExpr(l, r) => valueMalformedSensitive(l) || valueMalformedSensitive(r)
    case OrExpr(l, r)  => valueMalformedSensitive(l) || valueMalformedSensitive(r)
    // general pipe composition (neither a pure-path nor a fn-call pipe):
    // a malformed doc makes stage 1 NULL, which the composition pins to
    // eval(r, JNull) — sensitive whenever that pinned constant is non-null
    // (plus the conservative per-stage checks; over-guarding only adds a
    // parse-validity probe, never a wrong answer)
    case Pipe(l, r) if fnIROf(ast).isEmpty && pathOf(ast).isEmpty =>
      valueMalformedSensitive(l) || valueMalformedSensitive(r) ||
        (try Interpreter.eval(r, JNull)
         catch { case _: JmesRuntimeError => JNull }) != JNull
    case _ => fnIROf(ast) match {
      case Some(c) => FnCallIR.pinned(c) != JNull
      // prefix-streamed hybrid: sensitive iff the residual over a pinned-null
      // context yields non-null (pure paths stay insensitive: residual @)
      case None => pathOf(ast).isEmpty && subPinned(ast).exists(_ != JNull)
    }
  }

  private def valueGuarded(doc: Expression, ast: Ast): Option[Expression] =
    valueOf(doc, ast).map { e =>
      val guarded =
        if (valueMalformedSensitive(ast)) If(JsonIsValid(doc), e, NullStr) else e
      If(IsNull(doc), NullStr, guarded)
    }

  /** [[valueOf]] with the engine's NULL-document and malformed-document
    * conventions pinned (both → NULL, matching JmesPathEval), and all plain
    * path scans fused into one streaming pass ([[ScanFusion]]). */
  def valueNullSafe(doc: Expression, ast: Ast): Option[Expression] =
    valueGuarded(doc, ast).map(ScanFusion.fuse(doc, _))

  /** Lowered twin of [[graft.functions.JmesPathFiltered]]: the serialized
    * result when JMESPath-truthy, else NULL. Gate and value are built over
    * the SAME fused single-pass scan ([[ScanFusion.fuse]]) — one document
    * traversal serves both, closing the double-evaluation the pre-fusion
    * lowering paid on the CLI `-filter` hot path. */
  def filteredNullSafe(doc: Expression, ast: Ast): Option[Expression] =
    for (t <- truthyGuarded(doc, ast); v <- valueGuarded(doc, ast))
      yield ScanFusion.fuse(doc, If(t, v, NullStr))

  /** Restricted per-element predicate for lowered filter-projections. */
  private def rpredOf(ast: Ast): Option[RPred] = ast match {
    case Literal(v)    => Some(RConst(v.truthy))
    case NotExpr(c)    => rpredOf(c).map(RNot)
    case AndExpr(l, r) => for (a <- rpredOf(l); b <- rpredOf(r)) yield RAnd(a, b)
    case OrExpr(l, r)  => for (a <- rpredOf(l); b <- rpredOf(r)) yield ROr(a, b)
    case Comparator(op, l, r) =>
      // ordering is numbers-only at the top level too (numOf on a non-number
      // literal does not lower) — mirror that here; ==/!= accept any literal
      // (containers compare via deepEqual)
      def ok(v: JValue) = (op == "==" || op == "!=") || v.isInstanceOf[JNum]
      (l, r) match {
        case (p, Literal(v)) if ok(v) => pathOf(p).map(RCmp(_, op, v))
        case (Literal(v), p) if ok(v) =>
          val flipped = op match {
            case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
            case other => other
          }
          pathOf(p).map(RCmp(_, flipped, v))
        // ordering against a NON-number literal is JMESPath null (numbers-
        // only ordering, Interpreter.scala Comparator arm) — falsy, so the
        // element is always excluded regardless of the other operand's
        // value (which, being error-free, need not be evaluated at all)
        case (a, Literal(v)) if !ok(v) && !canError(a) => Some(RConst(false))
        case (Literal(v), a) if !ok(v) && !canError(a) => Some(RConst(false))
        case (a, b) => // path-vs-path within the element
          for (pa <- pathOf(a); pb <- pathOf(b)) yield RCmpPath(pa, op, pb)
      }
    case p => pathOf(p).map(RTruthy)
  }

  /** True if the lowered form could return TRUE / non-null for a MALFORMED
    * document where the interpreted evaluator returns false/null: raw
    * extraction yields SQL NULL for both a missing path and an unparsable
    * document, so constructs that flip or invert the falsy default (negation,
    * `!=`, `== null`, literal truthiness) need a parse-validity guard. Plain
    * paths, ordering comparators, and non-null equality are falsy on NULL raw
    * and need none. */
  private def malformedSensitive(ast: Ast): Boolean = ast match {
    case Literal(_)             => true
    case a if constOf(a).isDefined => constOf(a).get.truthy
    case NotExpr(_)             => true
    case AndExpr(l, r)          => malformedSensitive(l) || malformedSensitive(r)
    case OrExpr(l, r)           => malformedSensitive(l) || malformedSensitive(r)
    case Comparator("!=", _, _) => true
    case Comparator("==", l, r) => (l, r) match {
      case (a, Literal(v)) => v == JNull || pinnedEqNum(a, v)
      case (Literal(v), a) => v == JNull || pinnedEqNum(a, v)
      case _               => true // path-vs-path: both-missing is TRUE
    }
    // an ordering comparator whose operands BOTH stay numeric with every path
    // pinned to null (literals, pinned-numeric function calls) evaluates to a
    // real boolean over a malformed document, where the interpreter is false
    case Comparator(_, l, r)    => pinnedNum(l).isDefined && pinnedNum(r).isDefined
    // a function call whose pinned result is truthy (e.g. `length(`"ab"`)`,
    // `contains(`[1]`, `1`)`) is truthy-lowered non-false on malformed input
    case _ => fnIROf(ast) match {
      case Some(c) => FnCallIR.pinned(c).truthy
      case None    => pathOf(ast).isEmpty && subPinned(ast).exists(_.truthy)
    }
  }

  /** The call==number lowering evaluates TRUE over a malformed document iff
    * the call's pinned (all-paths-null) result is exactly that number —
    * the equality twin of the ordering comparator's pinnedNum guard. */
  private def pinnedEqNum(a: Ast, v: JValue): Boolean = v match {
    case JNum(d) => fnIROf(a).exists(c => FnCallIR.pinned(c) == JNum(d))
    case _       => false
  }

  private def truthyGuarded(doc: Expression, ast: Ast): Option[Expression] =
    truthyOf(doc, ast).map { e =>
      val guarded = if (malformedSensitive(ast)) And(JsonIsValid(doc), e) else e
      If(IsNull(doc), False, guarded)
    }

  /** [[truthyOf]] with the engine's NULL- and malformed-document conventions
    * pinned (both → false, matching JmesTruthy), scans fused. */
  def truthyNullSafe(doc: Expression, ast: Ast): Option[Expression] =
    truthyGuarded(doc, ast).map(ScanFusion.fuse(doc, _))

  /** [[numOf]] with NULL/malformed doc → NULL pinned (matching
    * JmesPathEvalDouble; only pinned-numeric expressions — literals and
    * pinned-numeric function calls — are sensitive: path extraction already
    * yields NULL on malformed input). Scans fused. */
  def numNullSafe(doc: Expression, ast: Ast): Option[Expression] =
    numOf(doc, ast).map { e =>
      val nullD = CLit(null, DoubleType)
      val guarded = ast match {
        case Literal(_)                       => If(JsonIsValid(doc), e, nullD)
        case a if pinnedNum(a).isDefined      => If(JsonIsValid(doc), e, nullD)
        case _                                => e
      }
      ScanFusion.fuse(doc, If(IsNull(doc), nullD, guarded))
    }

  /** Public API: lowered-when-possible column builders (interpreted
    * fallback otherwise — same result types as the jmes._ entry points). */
  def truthy(doc: Column, expression: String): Column =
    truthyNullSafe(bridge.expression(doc), Parser.parse(expression))
      .map(bridge.column)
      .getOrElse(jmes.jmesTruthy(doc, expression))

  def double(doc: Column, expression: String): Column =
    numNullSafe(bridge.expression(doc), Parser.parse(expression))
      .map(bridge.column)
      .getOrElse(jmes.jmespathDouble(doc, expression))

  def value(doc: Column, expression: String): Column =
    valueNullSafe(bridge.expression(doc), Parser.parse(expression))
      .map(bridge.column)
      .getOrElse(jmes.jmespath(doc, expression))

  /** True if `truthy(expression)` / `double(expression)` / `value(expression)`
    * lower natively. */
  def lowersTruthy(expression: String): Boolean =
    truthyOf(CLit(UTF8String.fromString(""), StringType), Parser.parse(expression)).isDefined
  def lowersDouble(expression: String): Boolean =
    numOf(CLit(UTF8String.fromString(""), StringType), Parser.parse(expression)).isDefined
  def lowersValue(expression: String): Boolean =
    valueOf(CLit(UTF8String.fromString(""), StringType), Parser.parse(expression)).isDefined
}
