package graft.jmespath

/** JMESPath AST (grammar: jmespath.org/specification.html; node set mirrors
  * the reference's parser, vendor/.../go-jmespath/parser.go:13-37). */
sealed trait Ast
object Ast {
  case object Identity extends Ast
  case object CurrentNode extends Ast
  final case class Field(name: String) extends Ast
  final case class Subexpression(lhs: Ast, rhs: Ast) extends Ast
  final case class Index(i: Int) extends Ast
  final case class Slice(start: Option[Int], stop: Option[Int], step: Option[Int]) extends Ast
  /** IndexExpression — left then index/slice applied (parser.go pairs these). */
  final case class IndexExpr(lhs: Ast, rhs: Ast) extends Ast
  /** Array projection: eval rhs per element of lhs's array result, dropping nulls. */
  final case class Projection(lhs: Ast, rhs: Ast) extends Ast
  /** Object-value projection (`obj.*`): map over values. */
  final case class ValueProjection(lhs: Ast, rhs: Ast) extends Ast
  /** `lhs[?cond]` then project rhs, dropping nulls. */
  final case class FilterProjection(lhs: Ast, rhs: Ast, cond: Ast) extends Ast
  /** `[]` — flatten one level (becomes the lhs of a Projection). */
  final case class Flatten(child: Ast) extends Ast
  final case class MultiSelectList(items: Vector[Ast]) extends Ast
  final case class MultiSelectHash(items: Vector[(String, Ast)]) extends Ast
  final case class Comparator(op: String, lhs: Ast, rhs: Ast) extends Ast
  final case class OrExpr(lhs: Ast, rhs: Ast) extends Ast
  final case class AndExpr(lhs: Ast, rhs: Ast) extends Ast
  final case class NotExpr(child: Ast) extends Ast
  final case class Pipe(lhs: Ast, rhs: Ast) extends Ast
  final case class Literal(value: JValue) extends Ast
  final case class ExpRef(child: Ast) extends Ast
  final case class FunctionCall(name: String, args: Vector[Ast]) extends Ast
}

/** Errors matching the reference's taxonomy (compliance corpus `error` field):
  * "syntax", "invalid-type", "invalid-arity", "unknown-function", "invalid-value". */
final class JmesSyntaxError(msg: String) extends RuntimeException(msg)
final class JmesRuntimeError(val kind: String, msg: String) extends RuntimeException(msg)
