package graft.jmespath

import Lexer._
import Ast._

/** Pratt (top-down operator precedence) parser for JMESPath.
  *
  * Grammar and binding powers follow the public spec
  * (jmespath.org/specification.html); the reference implementation is the
  * vendored Go parser (vendor/.../go-jmespath/parser.go:80-109 binding
  * powers, parser.go:145-163 main loop).
  */
object Parser {
  def parse(expression: String): Ast = {
    val p = new Parser(Lexer.tokenize(expression), expression)
    val ast = p.expression(0)
    if (p.peek.typ != TEOF) p.fail(s"unexpected token ${p.peek.value}")
    ast
  }

  def compile(expression: String): Compiled = new Compiled(expression, parse(expression))

  /** A parsed, reusable expression (the reference re-parses per record,
    * main.go:91 — we compile once at plan time). */
  final class Compiled(val expression: String, val ast: Ast) extends Serializable {
    def search(doc: JValue): JValue = Interpreter.eval(ast, doc)
  }

  private val bindingPowers: Map[TokType, Int] = Map[TokType, Int](
    TPipe -> 1, TOr -> 2, TAnd -> 3,
    TEq -> 5, TNe -> 5, TLt -> 5, TLte -> 5, TGt -> 5, TGte -> 5,
    TFlatten -> 9, TStar -> 20, TFilter -> 21, TDot -> 40, TNot -> 45,
    TLbrace -> 50, TLbracket -> 55, TLparen -> 60,
  ).withDefaultValue(0)
}

private final class Parser(tokens: Vector[Lexer.Token], expr: String) {
  import Parser.bindingPowers
  private var pos = 0
  def peek: Token = tokens(pos)
  private def peek2: Token = if (pos + 1 < tokens.length) tokens(pos + 1) else tokens.last
  private def advance(): Token = { val t = tokens(pos); if (pos < tokens.length - 1) pos += 1; t }
  private def expect(t: TokType): Token = {
    if (peek.typ != t) fail(s"expected $t but found ${peek.typ} '${peek.value}'")
    advance()
  }
  def fail(msg: String): Nothing = throw new JmesSyntaxError(s"$msg in '$expr'")

  def expression(rbp: Int): Ast = {
    var left = nud(advance())
    while (rbp < bindingPowers(peek.typ)) left = led(advance(), left)
    left
  }

  private def nud(t: Token): Ast = t.typ match {
    case TJsonLiteral =>
      JValue.parseOpt(t.value) match {
        case Some(v) => Literal(v)
        case None    => fail(s"invalid JSON literal `${t.value}`")
      }
    case TRawString => Literal(JStr(t.value))
    case TUnquoted =>
      if (peek.typ == TLparen) parseFunction(t.value)
      else Field(t.value)
    case TQuoted =>
      if (peek.typ == TLparen) fail("quoted identifier cannot be a function name")
      Field(t.value)
    case TStar =>
      // bare `*` — value projection over the current node
      ValueProjection(Identity, parseProjectionRHS(bindingPowers(TStar)))
    case TFilter => parseFilter(Identity)
    case TLbrace => parseMultiSelectHash()
    case TFlatten =>
      Projection(Flatten(Identity), parseProjectionRHS(bindingPowers(TFlatten)))
    case TLbracket =>
      peek.typ match {
        case TNumber | TColon =>
          val idx = parseIndexExpression()
          projectIfSlice(Identity, idx)
        case TStar if peek2.typ == TRbracket =>
          advance(); advance()
          Projection(Identity, parseProjectionRHS(bindingPowers(TStar)))
        case _ => parseMultiSelectList()
      }
    case TCurrent => CurrentNode
    case TExpref  => ExpRef(expression(bindingPowers(TExpref)))
    case TNot     => NotExpr(expression(bindingPowers(TNot)))
    case TLparen =>
      val e = expression(0)
      expect(TRparen)
      e
    case other => fail(s"unexpected token $other '${t.value}'")
  }

  private def led(t: Token, left: Ast): Ast = t.typ match {
    case TDot =>
      if (peek.typ == TStar) {
        advance()
        ValueProjection(left, parseProjectionRHS(bindingPowers(TDot)))
      } else Subexpression(left, parseDotRHS(bindingPowers(TDot)))
    case TPipe => Pipe(left, expression(bindingPowers(TPipe)))
    case TOr   => OrExpr(left, expression(bindingPowers(TOr)))
    case TAnd  => AndExpr(left, expression(bindingPowers(TAnd)))
    case TLparen => fail("function call on non-identifier")
    case TFlatten =>
      Projection(Flatten(left), parseProjectionRHS(bindingPowers(TFlatten)))
    case TFilter => parseFilter(left)
    case TEq | TNe | TLt | TLte | TGt | TGte =>
      Comparator(t.value, left, expression(bindingPowers(t.typ)))
    case TLbracket =>
      peek.typ match {
        case TNumber | TColon =>
          val idx = parseIndexExpression()
          projectIfSlice(left, idx)
        case _ =>
          // foo[*]
          expect(TStar)
          expect(TRbracket)
          Projection(left, parseProjectionRHS(bindingPowers(TStar)))
      }
    case other => fail(s"unexpected led token $other '${t.value}'")
  }

  private def parseFunction(name: String): Ast = {
    expect(TLparen)
    val args = Vector.newBuilder[Ast]
    if (peek.typ != TRparen) {
      args += expression(0)
      while (peek.typ == TComma) { advance(); args += expression(0) }
    }
    expect(TRparen)
    FunctionCall(name, args.result())
  }

  private def parseFilter(left: Ast): Ast = {
    val cond = expression(0)
    expect(TRbracket)
    val rhs =
      if (bindingPowers(peek.typ) < 10) Identity
      else parseProjectionRHS(bindingPowers(TFilter))
    FilterProjection(left, rhs, cond)
  }

  /** Out-of-int-range index literals are a syntax error, matching the
    * reference's strconv.Atoi failure mapping (parser.go:182-210). */
  private def parseIntTok(s: String): Int =
    try s.toInt
    catch { case _: NumberFormatException => fail(s"invalid index number '$s'") }

  /** `[n]` or `[a:b:c]` — returns Index or Slice node. */
  private def parseIndexExpression(): Ast = {
    if (peek.typ == TNumber && peek2.typ == TRbracket) {
      val n = parseIntTok(advance().value)
      expect(TRbracket)
      Index(n)
    } else {
      // slice: up to 3 parts separated by colons
      val parts = Array[Option[Int]](None, None, None)
      var idx = 0
      while (peek.typ != TRbracket) {
        peek.typ match {
          case TColon =>
            idx += 1
            if (idx > 2) fail("too many colons in slice")
            advance()
          case TNumber => parts(idx) = Some(parseIntTok(advance().value))
          case other   => fail(s"unexpected token in slice: $other")
        }
      }
      expect(TRbracket)
      if (idx == 0) fail("slice must contain a colon")
      Slice(parts(0), parts(1), parts(2))
    }
  }

  /** Slices create projections; plain indices don't (parser.go:485-498). */
  private def projectIfSlice(left: Ast, idx: Ast): Ast = idx match {
    case _: Slice =>
      Projection(IndexExpr(left, idx), parseProjectionRHS(bindingPowers(TStar)))
    case _ => IndexExpr(left, idx)
  }

  private def parseDotRHS(rbp: Int): Ast = peek.typ match {
    case TUnquoted | TQuoted | TStar => expression(rbp)
    case TLbracket                   => advance(); parseMultiSelectList()
    case TLbrace                     => advance(); parseMultiSelectHash()
    case other                       => fail(s"unexpected token after '.': $other")
  }

  private def parseProjectionRHS(rbp: Int): Ast = {
    if (bindingPowers(peek.typ) < 10) Identity
    else peek.typ match {
      case TLbracket | TFilter => expression(rbp)
      case TDot                => advance(); parseDotRHS(rbp)
      // the reference rejects e.g. `foo[*](bar)` — keep error-taxonomy parity
      case other               => fail(s"unexpected token in projection: $other")
    }
  }

  private def parseMultiSelectList(): Ast = {
    val items = Vector.newBuilder[Ast]
    items += expression(0)
    while (peek.typ == TComma) {
      advance()
      if (peek.typ == TRbracket) fail("trailing comma in multi-select list")
      items += expression(0)
    }
    expect(TRbracket)
    MultiSelectList(items.result())
  }

  private def parseMultiSelectHash(): Ast = {
    val items = Vector.newBuilder[(String, Ast)]
    def keyVal(): Unit = {
      val k = peek.typ match {
        case TUnquoted | TQuoted => advance().value
        case other               => fail(s"expected identifier key in multi-select hash, got $other")
      }
      expect(TColon)
      items += (k -> expression(0))
    }
    keyVal()
    while (peek.typ == TComma) { advance(); keyVal() }
    expect(TRbrace)
    MultiSelectHash(items.result())
  }
}
