package graft.jmespath

import Ast._

/** Tree-walking evaluator for JMESPath over [[JValue]].
  *
  * Semantics follow the public spec (jmespath.org/specification.html) and the
  * reference's interpreter (vendor/.../go-jmespath/interpreter.go:31-315),
  * validated against the vendored 862-case compliance corpus. Cross-cutting
  * rules (SURVEY.md §2.6): never-throw null navigation, projections drop
  * nulls, `&&`/`||` return operand values (not booleans), numbers are
  * doubles, deep structural equality for `==`.
  *
  * One deliberate deviation: object-value projections (`obj.*`) and
  * `keys`/`values` iterate in document insertion order — the reference
  * iterates Go maps in nondeterministic order (interpreter.go:294-301).
  */
object Interpreter {

  def search(expression: String, doc: JValue): JValue =
    eval(Parser.parse(expression), doc)

  def eval(ast: Ast, value: JValue): JValue = ast match {
    case Identity    => value
    case CurrentNode => value
    case Literal(v)  => v

    case Field(name) => value match {
      case o: JObj => o.get(name).getOrElse(JNull)
      case _       => JNull
    }

    case Subexpression(l, r) => eval(r, eval(l, value))
    case IndexExpr(l, r)     => eval(r, eval(l, value))
    case Pipe(l, r)          => eval(r, eval(l, value))

    case Index(i) => value match {
      case JArr(xs) =>
        val idx = if (i < 0) xs.length + i else i
        if (idx >= 0 && idx < xs.length) xs(idx) else JNull
      case _ => JNull
    }

    case Slice(start, stop, step) => value match {
      case JArr(xs) => JArr(sliceVector(xs, start, stop, step))
      case _        => JNull
    }

    case Projection(l, r) => eval(l, value) match {
      case JArr(xs) =>
        val b = Vector.newBuilder[JValue]
        xs.foreach { x => val v = eval(r, x); if (v != JNull) b += v }
        JArr(b.result())
      case _ => JNull
    }

    case ValueProjection(l, r) => eval(l, value) match {
      case JObj(fields) =>
        val b = Vector.newBuilder[JValue]
        fields.foreach { case (_, x) => val v = eval(r, x); if (v != JNull) b += v }
        JArr(b.result())
      case _ => JNull
    }

    case FilterProjection(l, rhs, cond) => eval(l, value) match {
      case JArr(xs) =>
        val b = Vector.newBuilder[JValue]
        xs.foreach { x =>
          if (eval(cond, x).truthy) {
            val v = eval(rhs, x)
            if (v != JNull) b += v
          }
        }
        JArr(b.result())
      case _ => JNull
    }

    case Flatten(child) => eval(child, value) match {
      case JArr(xs) =>
        val b = Vector.newBuilder[JValue]
        xs.foreach {
          case JArr(ys) => b ++= ys
          case other    => b += other
        }
        JArr(b.result())
      case _ => JNull
    }

    case MultiSelectList(items) =>
      if (value == JNull) JNull
      else JArr(items.map(eval(_, value)))

    case MultiSelectHash(items) =>
      if (value == JNull) JNull
      else JObj(items.map { case (k, a) => k -> eval(a, value) })

    case Comparator(op, l, r) =>
      val lv = eval(l, value)
      val rv = eval(r, value)
      op match {
        case "==" => JBool(JValue.deepEqual(lv, rv))
        case "!=" => JBool(!JValue.deepEqual(lv, rv))
        case _ => (lv, rv) match {
          // ordering comparisons are defined for numbers only; anything else → null
          case (JNum(a), JNum(b)) =>
            JBool(op match {
              case "<"  => a < b
              case "<=" => a <= b
              case ">"  => a > b
              case ">=" => a >= b
            })
          case _ => JNull
        }
      }

    case OrExpr(l, r) =>
      val lv = eval(l, value)
      if (lv.truthy) lv else eval(r, value)

    case AndExpr(l, r) =>
      val lv = eval(l, value)
      if (lv.truthy) eval(r, value) else lv

    case NotExpr(c) => JBool(!eval(c, value).truthy)

    case ExpRef(_) =>
      // An expression reference is only meaningful as a function argument.
      throw new JmesRuntimeError("invalid-type", "expression reference used as a value")

    case FunctionCall(name, args) =>
      val fargs: Vector[Functions.FArg] = args.map {
        case ExpRef(c) => Functions.FRef(c)
        case a         => Functions.FVal(eval(a, value))
      }
      Functions.call(name, fargs)
  }

  /** Python slice semantics (clamping, negative indices/step); step 0 is an
    * error (reference: util.go:57-138, error at util.go:87). */
  def sliceVector(xs: Vector[JValue], startO: Option[Int], stopO: Option[Int],
                  stepO: Option[Int]): Vector[JValue] = {
    val n = xs.length
    val step = stepO.getOrElse(1)
    if (step == 0) throw new JmesRuntimeError("invalid-value", "slice step cannot be 0")
    def clamp(vO: Option[Int], isStart: Boolean): Int = vO match {
      case Some(v0) =>
        var v = v0
        if (v < 0) { v += n; if (v < 0) v = if (step > 0) 0 else -1 }
        else if (v >= n) v = if (step > 0) n else n - 1
        v
      case None => if (step > 0) { if (isStart) 0 else n } else { if (isStart) n - 1 else -1 }
    }
    val start = clamp(startO, isStart = true)
    val stop = clamp(stopO, isStart = false)
    val b = Vector.newBuilder[JValue]
    var i = start
    if (step > 0) while (i < stop) { b += xs(i); i += step }
    else while (i > stop) { b += xs(i); i += step }
    b.result()
  }
}
