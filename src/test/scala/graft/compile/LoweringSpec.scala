package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{Interpreter, JNull, JNum, JStr, JValue, Parser}

/** Re-runs the 862-case compliance corpus through the LOWERED path: every
  * case whose expression the translator accepts is evaluated natively
  * (JsonPathRaw + Column trees, no JMESPath interpreter) and compared to the
  * golden corpus under the lowering's contract (truthiness / numeric value).
  * The interpreted and lowered paths must agree on every translatable case.
  */
class LoweringSpec extends AnyFunSuite {
  private val dir = "/root/reference/vendor/github.com/jmespath/go-jmespath/compliance"
  private val files = Seq(
    "basic", "boolean", "current", "escape", "filters", "functions",
    "identifiers", "indices", "literal", "multiselect", "ormatch", "pipe",
    "slice", "syntax", "unicode", "wildcard")
  private val mapper = new ObjectMapper()

  private val docRef = BoundReference(0, StringType, nullable = true)
  private def evalCol(e: org.apache.spark.sql.catalyst.expressions.Expression, doc: String): Any =
    e.eval(InternalRow(UTF8String.fromString(doc)))

  /** JmesPathEval's output convention for an interpreter result (null → SQL
    * NULL, strings unquoted, containers canonical). */
  private def valueConvention(v: JValue): Any = v match {
    case JNull   => null
    case JStr(s) => UTF8String.fromString(s)
    case other   => UTF8String.fromString(JValue.serializeOrdered(other))
  }

  test("lowered truthy/double agree with the golden corpus on all translatable cases") {
    var loweredTruthy = 0; var loweredNum = 0; var loweredValue = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (file <- files) {
      val root = mapper.readTree(new java.io.File(s"$dir/$file.json"))
      root.elements().asScala.foreach { suite =>
        val given = JValue.fromJackson(suite.get("given"))
        val docJson = JValue.serializeOrdered(given)
        suite.get("cases").elements().asScala.foreach { c =>
          if (!c.has("error")) {
            val exprStr = c.get("expression").asText()
            val expected = JValue.fromJackson(c.get("result"))
            val ast = try Parser.parse(exprStr) catch { case _: Exception => null }
            if (ast != null) {
              Lowering.truthyOf(docRef, ast).foreach { col =>
                loweredTruthy += 1
                try {
                  val got = evalCol(col, docJson)
                  if (got != expected.truthy)
                    failures += s"[$file/$exprStr] truthy: got $got expected ${expected.truthy}"
                } catch {
                  case e: Exception => failures += s"[$file/$exprStr] truthy threw: $e"
                }
              }
              Lowering.numOf(docRef, ast).foreach { col =>
                loweredNum += 1
                try {
                  val got = evalCol(col, docJson)
                  val exp = expected match { case JNum(d) => d; case _ => null }
                  if (got != exp)
                    failures += s"[$file/$exprStr] num: got $got expected $exp"
                } catch {
                  case e: Exception => failures += s"[$file/$exprStr] num threw: $e"
                }
              }
              // VALUE context: compare against the interpreter's own result
              // under JmesPathEval's convention (the interpreter itself is
              // corpus-validated in ComplianceSpec; comparing serialized text
              // against the interpreter avoids key-order false alarms on
              // deep-equal corpus results)
              Lowering.valueOf(docRef, ast).foreach { col =>
                loweredValue += 1
                try {
                  val got = evalCol(col, docJson)
                  val exp = valueConvention(Interpreter.eval(ast, given))
                  if (got != exp)
                    failures += s"[$file/$exprStr] value: got $got expected $exp"
                } catch {
                  case e: Exception => failures += s"[$file/$exprStr] value threw: $e"
                }
              }
            }
          }
        }
      }
    }
    info(s"lowered: $loweredTruthy truthy, $loweredNum numeric, $loweredValue value cases")
    assert(loweredTruthy > 100, "the lowered subset should cover a substantial slice")
    assert(loweredValue > 100, "the value subset should cover a substantial slice")
    assert(failures.isEmpty, s"\n${failures.size} failed:\n${failures.take(25).mkString("\n")}")
  }

  test("lowered and interpreted paths agree on generated field/compare expressions") {
    val docs = Seq(
      """{"k": 87, "s": "5", "t": "", "b": false, "arr": [1,2,3], "o": {"x": 1}}""",
      """{"k": 0, "s": "abc", "t": "x", "b": true, "arr": [], "o": {}}""",
      """{"nested": {"deep": {"v": -3.5}}}""",
      """{"k": null}""", """{}""",
      """{"arr": [null, 0, "x"], "objs": [{"x": 1}, {"y": 2}, {"x": 0, "y": 3}, {"name": "a"}]}""",
      """{"nest": [1, [2, null], null, [[3]]], "empties": [[], null]}""",
      """null""", """42""", """"str"""", """[1, 2]""")
    val exprs = Seq(
      "k", "s", "t", "b", "arr", "o", "missing", "nested.deep.v", "arr[0]", "arr[2]",
      "k > `50`", "k >= `0`", "k < `100`", "s == '5'", "s != '5'", "s > `3`",
      "k == `87`", "k != `87`", "b == `false`", "missing == `null`",
      "k && s", "k || missing", "!k", "!(k > `10`)", "t && b || k >= `0`",
      // (filter-)projections in truthy context
      "arr[*]", "objs[*].x", "objs[*].y", "arr[?@ > `1`]", "arr[?@ >= `99`]",
      "objs[?x > `0`].x", "objs[?x == `1` || y].y", "objs[?!x]", "missing[*]",
      "k[*]", "objs[?x != `1`]", "objs[?name == 'a']",
      "o.*", "nested.*", "k.*", "missing.*", "*",
      "nest[]", "nest[].x", "k[]", "missing[]", "empties[]",
      "arr[::2]", "arr[1:]", "arr[::-1]", "arr[5:]", "arr[:0]", "k[1:]",
      "objs[1:3].x", "[arr[0], missing]", "{a: k}", "o.[x]", "missing.[x]", "o.{v: x}",
      // value-context shapes: identity, multi-selects with literals, operand
      // values through &&/||, comparator serialization
      "@", "[k, missing, `7`]", "{a: k, b: `\"lit\"`, c: `[1]`}",
      "o | [x]", "o | {v: x}", "missing || k", "k || `\"dflt\"`",
      "k >= `50` && k", "s == '5' || k", "nested.deep.v < `0`")
    for (doc <- docs; e <- exprs) {
      val ast = Parser.parse(e)
      val jv = JValue.parse(doc)
      Lowering.truthyOf(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = Interpreter.eval(ast, jv).truthy
        assert(got == exp, s"truthy[$e] over $doc: lowered $got vs interpreted $exp")
      }
      Lowering.numOf(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = Interpreter.eval(ast, jv) match { case JNum(d) => d; case _ => null }
        assert(got == exp, s"num[$e] over $doc: lowered $got vs interpreted $exp")
      }
      Lowering.valueOf(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = valueConvention(Interpreter.eval(ast, jv))
        assert(got == exp, s"value[$e] over $doc: lowered $got vs interpreted $exp")
      }
    }
  }

  test("lowered function calls: NullSafe forms match engine semantics incl. malformed docs") {
    import graft.jmespath.JmesRuntimeError
    val docs = Seq(
      """{"tags": ["a", "b", "c"], "name": "hello", "n": "42", "o": {"a": 1, "b": 2}, "objs": [{"x": 2}, {"x": 1}]}""",
      """{"tags": [], "name": "", "n": "x", "o": {}, "objs": []}""",
      """{"tags": "notanarray", "n": 7}""",
      // NaN/Infinity parse in the interpreter's JValue mapper; the lowered
      // factory must accept them too (ADVICE r6 #3)
      """{"n": NaN, "tags": [NaN, 1], "name": "x"}""",
      """{}""", "not json", "{broken", """null""", """[1, 2, 3]""", """42""")
    val exprs = Seq(
      // the flagship hot shapes
      "length(tags)", "length(name)", "length(missing)", "length(@)",
      "length(tags) > `2`", "length(tags) >= `3`", "length(missing) > `0`",
      "to_number(n)", "to_number(name)", "to_number(n) > `40`",
      "contains(tags, 'a')", "contains(name, 'ell')", "contains(`[1,2]`, `2`)",
      "starts_with(name, 'he')", "ends_with(name, 'lo')",
      "not_null(missing, n, `5`)", "not_null(missing)",
      // call == number-literal equality (the `==`-only numeric route; `!=`
      // stays interpreted because an erroring call must not invert to TRUE)
      "length(tags) == `3`", "length(tags) == `0`", "length(missing) == `2`",
      "`3` == length(tags)", "to_number(n) == `42`", "to_number(name) == `0`",
      "length(name) == `5` && length(tags) == `3`", "length(tags) != `3`",
      // pinned-result guard: not_null(null, 2) == 2 is TRUE with all paths
      // null, so the malformed-document guard must fire for it
      "not_null(missing, `2`) == `2`", "sum(`[1, 1]`) == `2`",
      // error-abort composition (ADVICE r7 #3): an erroring call under Not
      // or in an Or LEFT arm aborts the whole interpreted expression; the
      // lowered error→falsy collapse must not flip these (they refuse the
      // native route and stay interpreted — the A/B still runs both paths)
      "!(length(missing) == `2`)", "!length(missing)", "!(n && length(missing))",
      "length(missing) == `2` || n", "length(missing) || name",
      "(length(missing) == `2`) || length(tags) == `3`",
      "!(length(missing) == `2`) && name", "length(missing) > `0` || n",
      // right-arm / And positions stay lowerable (collapse == abort there)
      "n || length(missing)", "length(missing) && n",
      // step-0 slices: the OTHER runtime error source (parses, throws at
      // eval) — direct use aborts via the hybrid's residual interpretation;
      // Not/Or-left composition must refuse like erroring calls
      "tags[::0]", "!(tags[::0])", "tags[::0] || name", "name || tags[::0]",
      "tags[::0] && name",
      "abs(`-3`)", "ceil(`1.2`)", "floor(to_number(n))",
      // the rest of the §2.3 library over lowered args
      "join(', ', tags)", "keys(o)", "values(o)", "reverse(tags)", "reverse(name)",
      "sort(tags)", "to_string(tags)", "to_string(missing)", "to_array(name)",
      "type(tags)", "type(missing)", "max(tags)", "min(tags)",
      "sum(`[1, 2]`)", "avg(`[2, 4]`)", """merge(o, `{"c": 3}`)""",
      "map(&x, objs)", "sort_by(objs, &x)", "max_by(objs, &x)", "min_by(objs, &x)",
      // nested + path-prefixed calls
      "length(to_string(o))", "o | keys(@)", "o.a | to_string(@)",
      "to_number(n) > `40` && name", "length(tags) || name",
      // prefix-streamed residual interpretation (JsonSubInterp): nested
      // projections / pipes with a pure-path prefix, incl. malformed docs
      "objs[*].x", "objs[*].x | [0]", "o.* | [1]", "objs[?x > `1`].x | [0]",
      "objs[].x", "tags[0] | @", "o.{m: a, n: b}", "objs[*].x | length(@)",
      "o.* | [0] > `1`", "tags[::2] | [0]")
    for (doc <- docs; e <- exprs) {
      val ast = Parser.parse(e)
      val jvOpt = JValue.parseOpt(doc)
      def interp: Option[JValue] = jvOpt.map { jv =>
        try Interpreter.eval(ast, jv) catch { case _: JmesRuntimeError => JNull }
      }
      def interpTruthy: Boolean = jvOpt.exists { jv =>
        try Interpreter.eval(ast, jv).truthy catch { case _: JmesRuntimeError => false }
      }
      Lowering.truthyNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        assert(got == interpTruthy, s"truthy[$e] over $doc: lowered $got vs $interpTruthy")
      }
      Lowering.numNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = interp match { case Some(JNum(d)) => d; case _ => null }
        // java.lang.Double.equals is NaN-aware (NaN == NaN there), unlike ==
        val same = (got, exp) match {
          case (g: java.lang.Double, x: java.lang.Double) => g.equals(x)
          case _                                          => got == exp
        }
        assert(same, s"num[$e] over $doc: lowered $got vs $exp")
      }
      Lowering.valueNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = interp.map(valueConvention).orNull
        assert(got == exp, s"value[$e] over $doc: lowered $got vs $exp")
      }
    }
    // the headline shapes must actually lower (coverage regression guard)
    assert(Lowering.lowersTruthy("length(tags) > `2`"))
    assert(Lowering.lowersValue("not_null(missing, n, `5`)"))
    assert(Lowering.lowersDouble("to_number(n)"))
    assert(Lowering.lowersValue("sort_by(objs, &x)"))
    // error-capable calls under Not / Or-left REFUSE the native route …
    assert(!Lowering.lowersTruthy("!(length(missing) == `2`)"))
    assert(!Lowering.lowersTruthy("!length(missing)"))
    assert(!Lowering.lowersTruthy("length(missing) == `2` || n"))
    assert(!Lowering.lowersValue("!(length(missing) == `2`)"))
    // … while Or-right / And positions (where collapse == abort) still lower
    assert(Lowering.lowersTruthy("n || length(missing)"))
    assert(Lowering.lowersTruthy("length(missing) && n"))
    // step-0 slices are error-capable too: refused under Not, and the
    // native slice arms never emit a silently-empty projection for them
    assert(!Lowering.lowersTruthy("!(tags[::0])"))
    assert(!Lowering.lowersValue("!(tags[::0])"))
  }

  test("general pipe composition refuses stage-1 sum/avg (overflow-produced non-finites)") {
    // over {"a": [1.7e308, 1.7e308]} stage 1 produces [Infinity] from
    // FINITE tokens; the composition's serialize/reparse would pin it to
    // null mid-pipe while the interpreter keeps the element — and the
    // document-token NaN/Infinity probe cannot see a value that doesn't
    // exist until the fold runs. So any stage-1 sum/avg refuses the
    // native route (ADVICE r12 #3).
    assert(!Lowering.lowersValue("[sum(a)] | [?@ > `5`]"))
    assert(!Lowering.lowersValue("[avg(a)] | [0]"))
    // the call can hide arbitrarily deep inside stage 1
    assert(!Lowering.lowersValue("[[sum(a)], k] | [0]"))
    assert(!Lowering.lowersValue("{s: sum(a)} | s"))
    // interpreter ground truth for the failure scenario the guard closes:
    // sum overflows to +Infinity and the filter keeps it
    val ast = Parser.parse("[sum(a)] | [?@ > `5`]")
    val jv = JValue.parseOpt("""{"a": [1.7e308, 1.7e308]}""").get
    Interpreter.eval(ast, jv) match {
      case graft.jmespath.JArr(Vector(JNum(d))) => assert(d.isPosInfinity)
      case other => fail(s"expected [Infinity], got $other")
    }
    // sibling stage-1 shapes without sum/avg still compose natively
    assert(Lowering.lowersValue("[a] | [?@ > `5`]"))
    assert(Lowering.lowersValue("[a, k] | [0]"))
    assert(Lowering.lowersValue("{s: a} | s"))
  }

  test("scan fusion: fused NullSafe trees agree with the interpreter; fusion fires") {
    import graft.jmespath.JmesRuntimeError
    val docs = Seq(
      """{"k": 87, "a": {"b": 1, "c": [1, 2, 3]}, "arr": [1, 2, 3, 4]}""",
      """{"a": {"b": 1}, "a": {"c": 2}}""", // duplicate keys: last occurrence wins deeply
      """{"a": {"b": {"x": 1}}, "k": 1, "a": 2}""",
      """{"k": null, "a": null}""", """{"k": "50"}""",
      """{"k": NaN, "a": {"b": Infinity, "c": -Infinity}, "arr": [NaN, 2]}""",
      """{"arr": []}""", """{}""", "not json", "{broken", """null""", """[5, 6]""", """42""")
    val exprs = Seq(
      "k >= `50` && k", "k == `87` || a.b", "a && a.b", "a.b && a.c",
      "!k && !a", "k != `1` && k", "arr[-1] && arr[0]", "arr[-1] > arr[1]",
      "[k, a.b, arr[-2]]", "{x: a.b, y: a.c, z: k}", "a.b || a.c || k",
      "missing == `null` && k", "a.b == `1` && a.c[0]", "arr[0] < arr[-1] && arr")
    for (doc <- docs; e <- exprs) {
      val ast = Parser.parse(e)
      val jvOpt = JValue.parseOpt(doc)
      def interp: Option[JValue] = jvOpt.map { jv =>
        try Interpreter.eval(ast, jv) catch { case _: JmesRuntimeError => JNull }
      }
      Lowering.truthyNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = interp.exists(_.truthy)
        assert(got == exp, s"fused truthy[$e] over $doc: $got vs $exp")
      }
      Lowering.valueNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = interp.map(valueConvention).orNull
        assert(got == exp, s"fused value[$e] over $doc: $got vs $exp")
      }
      Lowering.filteredNullSafe(docRef, ast).foreach { col =>
        val got = evalCol(col, doc)
        val exp = interp match {
          case Some(r) if r.truthy => valueConvention(r)
          case _                   => null
        }
        assert(got == exp, s"fused filtered[$e] over $doc: $got vs $exp")
      }
    }
    // the flagship CLI shape must actually fuse into a single-pass scan
    val fused = Lowering.filteredNullSafe(docRef, Parser.parse("k >= `50` && k")).get
    assert(fused.isInstanceOf[JsonFusedEval], s"expected JsonFusedEval root, got ${fused.getClass}")
    // NULL document through the fused path stays the engine convention
    assert(evalCol(fused, null) == null)
    val fusedTruthy = Lowering.truthyNullSafe(docRef, Parser.parse("k >= `50` && k")).get
    assert(evalCol(fusedTruthy, null) == false)
  }

  test("lowered filtered form agrees with JmesPathFiltered semantics") {
    val docs = Seq(
      """{"k": 87}""", """{"k": 3}""", """{"k": 0}""", """{"k": "x"}""",
      """{}""", "not json", """null""")
    // the CLI `-filter` flagship shapes (FramedSink.lineCol)
    for (e <- Seq("k >= `50` && k", "k", "k == `3`", "[k, `1`]")) {
      val ast = Parser.parse(e)
      val lowered = Lowering.filteredNullSafe(docRef, ast)
      assert(lowered.isDefined, s"$e should lower in filtered context")
      for (doc <- docs) {
        val got = evalCol(lowered.get, doc)
        val exp = JValue.parseOpt(doc) match {
          case None => null
          case Some(jv) =>
            val r = Interpreter.eval(ast, jv)
            if (!r.truthy) null else valueConvention(r)
        }
        assert(got == exp, s"filtered[$e] over $doc: lowered $got vs interpreted $exp")
      }
    }
  }
}
