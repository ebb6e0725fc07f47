package graft.jmespath

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Golden test: the vendored JMESPath compliance corpus (862 cases across 16
  * files; whitelist mirrors the reference's compliance_test.go:26-43). The
  * corpus JSON files are read as test fixtures from the read-only reference
  * checkout. */
class ComplianceSpec extends AnyFunSuite {
  private val dir = "/root/reference/vendor/github.com/jmespath/go-jmespath/compliance"
  private val files = Seq(
    "basic", "boolean", "current", "escape", "filters", "functions",
    "identifiers", "indices", "literal", "multiselect", "ormatch", "pipe",
    "slice", "syntax", "unicode", "wildcard")
  private val mapper = new ObjectMapper()

  for (file <- files) {
    test(s"compliance corpus: $file.json") {
      val root = mapper.readTree(new java.io.File(s"$dir/$file.json"))
      val failures = scala.collection.mutable.ListBuffer[String]()
      var total = 0
      root.elements().asScala.foreach { suite =>
        val given = JValue.fromJackson(suite.get("given"))
        suite.get("cases").elements().asScala.foreach { c =>
          total += 1
          val expr = c.get("expression").asText()
          if (c.has("error")) {
            val kind = c.get("error").asText()
            try {
              val got = Interpreter.search(expr, given)
              failures += s"[$expr] expected error '$kind' but got ${JValue.serialize(got)}"
            } catch {
              case _: JmesSyntaxError | _: JmesRuntimeError => // expected
              case e: Exception =>
                failures += s"[$expr] expected error '$kind' but threw unexpected ${e.getClass.getSimpleName}: ${e.getMessage}"
            }
          } else {
            val expected = JValue.fromJackson(c.get("result"))
            try {
              val got = Interpreter.search(expr, given)
              if (!JValue.deepEqual(got, expected))
                failures += s"[$expr] expected ${JValue.serialize(expected)} got ${JValue.serialize(got)}"
            } catch {
              case e: Exception =>
                failures += s"[$expr] threw ${e.getClass.getSimpleName}: ${e.getMessage}"
            }
          }
        }
      }
      assert(failures.isEmpty,
        s"\n${failures.size}/$total failed:\n${failures.take(25).mkString("\n")}")
    }
  }
}
