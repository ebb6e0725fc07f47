package graft.jmespath

/** JMESPath tokenizer (grammar: jmespath.org/specification.html; token set
  * mirrors the reference's lexer, vendor/.../go-jmespath/lexer.go:52-97). */
object Lexer {
  sealed trait TokType
  case object TUnquoted extends TokType    // identifier
  case object TQuoted extends TokType      // "identifier"
  case object TRawString extends TokType   // 'raw'
  case object TJsonLiteral extends TokType // `json`
  case object TNumber extends TokType
  case object TDot extends TokType
  case object TStar extends TokType
  case object TLparen extends TokType
  case object TRparen extends TokType
  case object TLbracket extends TokType
  case object TRbracket extends TokType
  case object TFlatten extends TokType     // []
  case object TFilter extends TokType      // [?
  case object TLbrace extends TokType
  case object TRbrace extends TokType
  case object TComma extends TokType
  case object TColon extends TokType
  case object TCurrent extends TokType     // @
  case object TExpref extends TokType      // &
  case object TAnd extends TokType         // &&
  case object TPipe extends TokType        // |
  case object TOr extends TokType          // ||
  case object TNot extends TokType         // !
  case object TNe extends TokType          // !=
  case object TEq extends TokType          // ==
  case object TLt extends TokType
  case object TLte extends TokType
  case object TGt extends TokType
  case object TGte extends TokType
  case object TEOF extends TokType

  final case class Token(typ: TokType, value: String, pos: Int)

  def tokenize(expr: String): Vector[Token] = {
    val toks = Vector.newBuilder[Token]
    var i = 0
    val n = expr.length
    def err(msg: String) = throw new JmesSyntaxError(s"$msg at position $i in '$expr'")
    while (i < n) {
      val c = expr.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '.' => toks += Token(TDot, ".", i); i += 1
        case '*' => toks += Token(TStar, "*", i); i += 1
        case '(' => toks += Token(TLparen, "(", i); i += 1
        case ')' => toks += Token(TRparen, ")", i); i += 1
        case '{' => toks += Token(TLbrace, "{", i); i += 1
        case '}' => toks += Token(TRbrace, "}", i); i += 1
        case ',' => toks += Token(TComma, ",", i); i += 1
        case ':' => toks += Token(TColon, ":", i); i += 1
        case '@' => toks += Token(TCurrent, "@", i); i += 1
        case ']' => toks += Token(TRbracket, "]", i); i += 1
        case '[' =>
          if (i + 1 < n && expr.charAt(i + 1) == ']') { toks += Token(TFlatten, "[]", i); i += 2 }
          else if (i + 1 < n && expr.charAt(i + 1) == '?') { toks += Token(TFilter, "[?", i); i += 2 }
          else { toks += Token(TLbracket, "[", i); i += 1 }
        case '&' =>
          if (i + 1 < n && expr.charAt(i + 1) == '&') { toks += Token(TAnd, "&&", i); i += 2 }
          else { toks += Token(TExpref, "&", i); i += 1 }
        case '|' =>
          if (i + 1 < n && expr.charAt(i + 1) == '|') { toks += Token(TOr, "||", i); i += 2 }
          else { toks += Token(TPipe, "|", i); i += 1 }
        case '!' =>
          if (i + 1 < n && expr.charAt(i + 1) == '=') { toks += Token(TNe, "!=", i); i += 2 }
          else { toks += Token(TNot, "!", i); i += 1 }
        case '=' =>
          if (i + 1 < n && expr.charAt(i + 1) == '=') { toks += Token(TEq, "==", i); i += 2 }
          else err("unexpected '='")
        case '<' =>
          if (i + 1 < n && expr.charAt(i + 1) == '=') { toks += Token(TLte, "<=", i); i += 2 }
          else { toks += Token(TLt, "<", i); i += 1 }
        case '>' =>
          if (i + 1 < n && expr.charAt(i + 1) == '=') { toks += Token(TGte, ">=", i); i += 2 }
          else { toks += Token(TGt, ">", i); i += 1 }
        case '"' =>
          val start = i
          i += 1
          val sb = new StringBuilder("\"")
          var closed = false
          while (i < n && !closed) {
            val ch = expr.charAt(i)
            if (ch == '\\' && i + 1 < n) { sb.append(ch).append(expr.charAt(i + 1)); i += 2 }
            else if (ch == '"') { closed = true; i += 1 }
            else { sb.append(ch); i += 1 }
          }
          if (!closed) err("unterminated quoted identifier")
          sb.append('"')
          val decoded = decodeJsonString(sb.toString).getOrElse(err("invalid quoted identifier"))
          toks += Token(TQuoted, decoded, start)
        case '\'' =>
          val start = i
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val ch = expr.charAt(i)
            if (ch == '\\' && i + 1 < n && expr.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else if (ch == '\'') { closed = true; i += 1 }
            else { sb.append(ch); i += 1 }
          }
          if (!closed) err("unterminated raw string")
          toks += Token(TRawString, sb.toString, start)
        case '`' =>
          val start = i
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val ch = expr.charAt(i)
            if (ch == '\\' && i + 1 < n && expr.charAt(i + 1) == '`') { sb.append('`'); i += 2 }
            else if (ch == '\\' && i + 1 < n) { sb.append(ch).append(expr.charAt(i + 1)); i += 2 }
            else if (ch == '`') { closed = true; i += 1 }
            else { sb.append(ch); i += 1 }
          }
          if (!closed) err("unterminated literal")
          toks += Token(TJsonLiteral, sb.toString, start)
        case '-' =>
          val start = i
          i += 1
          if (i >= n || !expr.charAt(i).isDigit) err("expected digit after '-'")
          while (i < n && expr.charAt(i).isDigit) i += 1
          toks += Token(TNumber, expr.substring(start, i), start)
        case d if d.isDigit =>
          val start = i
          while (i < n && expr.charAt(i).isDigit) i += 1
          toks += Token(TNumber, expr.substring(start, i), start)
        case a if (a >= 'a' && a <= 'z') || (a >= 'A' && a <= 'Z') || a == '_' =>
          val start = i
          while (i < n && {
            val ch = expr.charAt(i)
            (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9') || ch == '_'
          }) i += 1
          toks += Token(TUnquoted, expr.substring(start, i), start)
        case other => err(s"unexpected character '$other'")
      }
    }
    toks += Token(TEOF, "", n)
    toks.result()
  }

  /** Decode a JSON-quoted string (including surrounding quotes). */
  private[jmespath] def decodeJsonString(quoted: String): Option[String] =
    JValue.parseOpt(quoted) match {
      case Some(JStr(s)) => Some(s)
      case _             => None
    }
}
