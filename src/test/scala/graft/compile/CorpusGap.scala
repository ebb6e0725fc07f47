package graft.compile

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType

import graft.jmespath.{Ast, Parser}

/** Diagnostic: categorize the corpus expressions that do NOT lower in value
  * context, by root AST shape. Run: Test/runMain graft.compile.CorpusGap */
object CorpusGap {
  def main(args: Array[String]): Unit = {
    val dir = "/root/reference/vendor/github.com/jmespath/go-jmespath/compliance"
    val files = Seq(
      "basic", "boolean", "current", "escape", "filters", "functions",
      "identifiers", "indices", "literal", "multiselect", "ormatch", "pipe",
      "slice", "syntax", "unicode", "wildcard")
    val mapper = new ObjectMapper()
    val docRef = BoundReference(0, StringType, nullable = true)
    val byShape = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val samples = scala.collection.mutable.Map[String, List[String]]().withDefaultValue(Nil)
    var total = 0; var lowered = 0
    def shape(a: Ast): String = a match {
      case Ast.FunctionCall(n, _) => s"fn:$n"
      case Ast.Projection(l, r) => s"proj(${l.getClass.getSimpleName}->${r.getClass.getSimpleName})"
      case Ast.FilterProjection(_, r, c) => s"filter(->${r.getClass.getSimpleName}, ${c.getClass.getSimpleName})"
      case Ast.ValueProjection(_, r) => s"vproj(->${r.getClass.getSimpleName})"
      case other => other.getClass.getSimpleName
    }
    for (file <- files) {
      val root = mapper.readTree(new java.io.File(s"$dir/$file.json"))
      root.elements().asScala.foreach { suite =>
        suite.get("cases").elements().asScala.foreach { c =>
          if (!c.has("error")) {
            val exprStr = c.get("expression").asText()
            val ast = try Parser.parse(exprStr) catch { case _: Exception => null }
            if (ast != null) {
              total += 1
              if (Lowering.valueOf(docRef, ast).isDefined) lowered += 1
              else {
                val k = s"$file/${shape(ast)}"
                byShape(k) += 1
                if (samples(k).length < 3) samples(k) = exprStr :: samples(k)
              }
            }
          }
        }
      }
    }
    println(s"total parsed: $total, value-lowered: $lowered, gap: ${total - lowered}")
    byShape.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(f"$n%4d  $k%-42s  e.g. ${samples(k).take(2).mkString(" | ")}")
    }
  }
}
