package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{Interpreter, JNum, JValue, Parser}

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

  test("lowered truthy/double agree with the golden corpus on all translatable cases") {
    var loweredTruthy = 0; var loweredNum = 0
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
            }
          }
        }
      }
    }
    info(s"lowered: $loweredTruthy truthy cases, $loweredNum numeric cases")
    assert(loweredTruthy > 100, "the lowered subset should cover a substantial slice")
    assert(failures.isEmpty, s"\n${failures.size} failed:\n${failures.take(25).mkString("\n")}")
  }

  test("lowered and interpreted paths agree on generated field/compare expressions") {
    val docs = Seq(
      """{"k": 87, "s": "5", "t": "", "b": false, "arr": [1,2,3], "o": {"x": 1}}""",
      """{"k": 0, "s": "abc", "t": "x", "b": true, "arr": [], "o": {}}""",
      """{"nested": {"deep": {"v": -3.5}}}""",
      """{"k": null}""", """{}""",
      """{"arr": [null, 0, "x"], "objs": [{"x": 1}, {"y": 2}, {"x": 0, "y": 3}, {"name": "a"}]}""",
      """{"nest": [1, [2, null], null, [[3]]], "empties": [[], null]}""")
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
      "objs[1:3].x", "[arr[0], missing]", "{a: k}", "o.[x]", "missing.[x]", "o.{v: x}")
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
    }
  }
}
