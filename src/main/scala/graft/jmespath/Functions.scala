package graft.jmespath

/** JMESPath built-in function library — the 26 functions of the spec
  * (jmespath.org/specification.html#built-in-functions; reference table at
  * vendor/.../go-jmespath/functions.go:127-322, dispatch + runtime type
  * checking functions.go:326-402).
  *
  * Errors use the compliance corpus taxonomy: unknown-function,
  * invalid-arity, invalid-type, invalid-value.
  */
object Functions {
  sealed trait FArg
  final case class FVal(v: JValue) extends FArg
  final case class FRef(ast: Ast) extends FArg

  // --- argument type specs ---------------------------------------------
  sealed trait PType { def accepts(a: FArg): Boolean }
  case object PNumber extends PType { def accepts(a: FArg) = a match { case FVal(_: JNum) => true; case _ => false } }
  case object PString extends PType { def accepts(a: FArg) = a match { case FVal(_: JStr) => true; case _ => false } }
  case object PArray extends PType { def accepts(a: FArg) = a match { case FVal(_: JArr) => true; case _ => false } }
  case object PObject extends PType { def accepts(a: FArg) = a match { case FVal(_: JObj) => true; case _ => false } }
  case object PAny extends PType { def accepts(a: FArg) = a match { case FVal(_) => true; case _ => false } }
  case object PExpref extends PType { def accepts(a: FArg) = a.isInstanceOf[FRef] }
  case object PArrayNumber extends PType {
    def accepts(a: FArg) = a match { case FVal(JArr(xs)) => xs.forall(_.isInstanceOf[JNum]); case _ => false }
  }
  case object PArrayString extends PType {
    def accepts(a: FArg) = a match { case FVal(JArr(xs)) => xs.forall(_.isInstanceOf[JStr]); case _ => false }
  }

  private final case class Sig(args: Vector[Set[PType]], variadic: Boolean = false)

  private val signatures: Map[String, Sig] = Map(
    "abs"         -> Sig(Vector(Set(PNumber))),
    "avg"         -> Sig(Vector(Set(PArrayNumber))),
    "ceil"        -> Sig(Vector(Set(PNumber))),
    "contains"    -> Sig(Vector(Set(PArray, PString), Set(PAny))),
    "ends_with"   -> Sig(Vector(Set(PString), Set(PString))),
    "floor"       -> Sig(Vector(Set(PNumber))),
    "join"        -> Sig(Vector(Set(PString), Set(PArrayString))),
    "keys"        -> Sig(Vector(Set(PObject))),
    "length"      -> Sig(Vector(Set(PString, PArray, PObject))),
    "map"         -> Sig(Vector(Set(PExpref), Set(PArray))),
    "max"         -> Sig(Vector(Set(PArrayNumber, PArrayString))),
    "max_by"      -> Sig(Vector(Set(PArray), Set(PExpref))),
    "merge"       -> Sig(Vector(Set(PObject)), variadic = true),
    "min"         -> Sig(Vector(Set(PArrayNumber, PArrayString))),
    "min_by"      -> Sig(Vector(Set(PArray), Set(PExpref))),
    "not_null"    -> Sig(Vector(Set(PAny)), variadic = true),
    "reverse"     -> Sig(Vector(Set(PArray, PString))),
    "sort"        -> Sig(Vector(Set(PArrayNumber, PArrayString))),
    "sort_by"     -> Sig(Vector(Set(PArray), Set(PExpref))),
    "starts_with" -> Sig(Vector(Set(PString), Set(PString))),
    "sum"         -> Sig(Vector(Set(PArrayNumber))),
    "to_array"    -> Sig(Vector(Set(PAny))),
    "to_string"   -> Sig(Vector(Set(PAny))),
    "to_number"   -> Sig(Vector(Set(PAny))),
    "type"        -> Sig(Vector(Set(PAny))),
    "values"      -> Sig(Vector(Set(PObject))),
  )

  def call(name: String, args: Vector[FArg]): JValue = {
    val sig = signatures.getOrElse(name,
      throw new JmesRuntimeError("unknown-function", s"unknown function: $name"))
    // arity
    if (sig.variadic) {
      if (args.length < sig.args.length)
        throw new JmesRuntimeError("invalid-arity", s"$name expects at least ${sig.args.length} args")
    } else if (args.length != sig.args.length) {
      throw new JmesRuntimeError("invalid-arity", s"$name expects ${sig.args.length} args, got ${args.length}")
    }
    // types (variadic tail checked against last spec)
    args.zipWithIndex.foreach { case (a, i) =>
      val spec = sig.args(math.min(i, sig.args.length - 1))
      if (!spec.exists(_.accepts(a)))
        throw new JmesRuntimeError("invalid-type", s"$name: invalid type for argument $i")
    }
    dispatch(name, args)
  }

  private def value(a: FArg): JValue = a.asInstanceOf[FVal].v
  private def ref(a: FArg): Ast = a.asInstanceOf[FRef].ast

  private def dispatch(name: String, args: Vector[FArg]): JValue = name match {
    case "abs" => JNum(math.abs(num(args(0))))
    case "avg" =>
      val xs = arr(args(0)).map { case JNum(d) => d; case _ => 0.0 }
      // reference: sum/len, empty → NaN (functions.go:428-438)
      JNum(xs.sum / xs.length)
    case "ceil"  => JNum(math.ceil(num(args(0))))
    case "floor" => JNum(math.floor(num(args(0))))
    case "contains" =>
      (value(args(0)), value(args(1))) match {
        case (JStr(s), JStr(sub)) => JBool(s.contains(sub))
        case (JStr(_), _)         => JBool(false) // non-string needle on string haystack
        case (JArr(xs), el)       => JBool(xs.exists(JValue.deepEqual(_, el)))
        case _                    => JBool(false)
      }
    case "ends_with"   => JBool(str(args(0)).endsWith(str(args(1))))
    case "starts_with" => JBool(str(args(0)).startsWith(str(args(1))))
    case "join" =>
      val glue = str(args(0))
      JStr(arr(args(1)).map { case JStr(s) => s; case _ => "" }.mkString(glue))
    case "keys"   => JArr(obj(args(0)).fields.map(f => JStr(f._1)))
    case "values" => JArr(obj(args(0)).fields.map(_._2))
    case "length" => value(args(0)) match {
      case JStr(s)  => JNum(s.codePointCount(0, s.length).toDouble) // rune count
      case JArr(xs) => JNum(xs.length.toDouble)
      case JObj(fs) => JNum(fs.length.toDouble)
      case _        => throw new JmesRuntimeError("invalid-type", "length: invalid type")
    }
    case "map" =>
      // keeps nulls, unlike projections (functions.go:470-484)
      JArr(arr(args(1)).map(x => Interpreter.eval(ref(args(0)), x)))
    case "max" => minOrMax(arr(args(0)), isMax = true)
    case "min" => minOrMax(arr(args(0)), isMax = false)
    case "max_by" => byKey(arr(args(0)), ref(args(1)), isMax = true)
    case "min_by" => byKey(arr(args(0)), ref(args(1)), isMax = false)
    case "merge" =>
      // right-most wins; preserve first-seen key positions
      val order = scala.collection.mutable.LinkedHashMap[String, JValue]()
      args.foreach { a => obj(a).fields.foreach { case (k, v) => order.update(k, v) } }
      JObj(order.toVector)
    case "not_null" =>
      args.map(value).find(_ != JNull).getOrElse(JNull)
    case "reverse" => value(args(0)) match {
      case JArr(xs) => JArr(xs.reverse)
      case JStr(s) =>
        // reverse by code points (runes), matching the reference (functions.go:777-792)
        val cps = s.codePoints().toArray.reverse
        JStr(new String(cps, 0, cps.length))
      case _ => throw new JmesRuntimeError("invalid-type", "reverse: invalid type")
    }
    case "sort" =>
      val xs = arr(args(0))
      if (xs.forall(_.isInstanceOf[JNum]))
        JArr(xs.sortBy { case JNum(d) => d; case _ => 0.0 })
      else
        JArr(xs.sortBy { case JStr(s) => s; case _ => "" })
    case "sort_by" =>
      val xs = arr(args(0))
      if (xs.isEmpty) JArr(xs)
      else {
        val keyed = keysFor(xs, ref(args(1)), "sort_by")
        keyed.head._2 match {
          case _: JNum => JArr(keyed.sortBy { case (_, JNum(d)) => d; case _ => 0.0 }.map(_._1))
          case _       => JArr(keyed.sortBy { case (_, JStr(s)) => s; case _ => "" }.map(_._1))
        }
      }
    case "sum" =>
      JNum(arr(args(0)).map { case JNum(d) => d; case _ => 0.0 }.sum)
    case "to_array" => value(args(0)) match {
      case a: JArr => a
      case other   => JArr(Vector(other))
    }
    case "to_string" => value(args(0)) match {
      case s: JStr => s
      case other   => JStr(JValue.serialize(other)) // compact JSON, sorted keys (Go encoding/json)
    }
    case "to_number" => value(args(0)) match {
      case n: JNum => n
      case JStr(s) =>
        try JNum(java.lang.Double.parseDouble(s.trim))
        catch { case _: NumberFormatException => JNull }
      case _ => JNull
    }
    case "type" => JStr(value(args(0)).typeName)
    case other =>
      throw new JmesRuntimeError("unknown-function", s"unknown function: $other")
  }

  private def num(a: FArg): Double = value(a).asInstanceOf[JNum].d
  private def str(a: FArg): String = value(a).asInstanceOf[JStr].s
  private def arr(a: FArg): Vector[JValue] = value(a).asInstanceOf[JArr].items
  private def obj(a: FArg): JObj = value(a).asInstanceOf[JObj]

  private def minOrMax(xs: Vector[JValue], isMax: Boolean): JValue = {
    if (xs.isEmpty) return JNull
    xs.head match {
      case _: JNum =>
        val ds = xs.map(_.asInstanceOf[JNum].d)
        JNum(if (isMax) ds.max else ds.min)
      case _ =>
        val ss = xs.map(_.asInstanceOf[JStr].s)
        JStr(if (isMax) ss.max else ss.min)
    }
  }

  /** Evaluate a sort key per element; keys must be homogeneous number-or-string
    * (reference: functions.go:527-581). */
  private def keysFor(xs: Vector[JValue], keyExpr: Ast, fn: String): Vector[(JValue, JValue)] = {
    val keyed = xs.map(x => x -> Interpreter.eval(keyExpr, x))
    val headType = keyed.head._2 match {
      case _: JNum => "number"
      case _: JStr => "string"
      case other =>
        throw new JmesRuntimeError("invalid-type", s"$fn: key must be number or string, got ${other.typeName}")
    }
    keyed.foreach { case (_, k) =>
      if (k.typeName != headType)
        throw new JmesRuntimeError("invalid-type", s"$fn: inconsistent key types")
    }
    keyed
  }

  private def byKey(xs: Vector[JValue], keyExpr: Ast, isMax: Boolean): JValue = {
    if (xs.isEmpty) return JNull
    val keyed = keysFor(xs, keyExpr, if (isMax) "max_by" else "min_by")
    val best = keyed.head._2 match {
      case _: JNum =>
        if (isMax) keyed.maxBy { case (_, JNum(d)) => d; case _ => 0.0 }
        else keyed.minBy { case (_, JNum(d)) => d; case _ => 0.0 }
      case _ =>
        if (isMax) keyed.maxBy { case (_, JStr(s)) => s; case _ => "" }
        else keyed.minBy { case (_, JStr(s)) => s; case _ => "" }
    }
    best._1
  }
}
