package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, AnalysisException}
import org.apache.spark.sql.functions._
import graft.functions.jmes._

class JmesSparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("jmespath column evaluates against JSON documents") {
    import spark.implicits._
    val df = Seq(
      """{"a": {"b": [1, 2, 3]}}""",
      """{"a": {"b": []}}""",
      """{"other": 1}""").toDF("doc")
    val out = df.select(jmespath($"doc", "a.b[0]").as("r")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("1", null, null))
  }

  test("jmespathDouble + jmesTruthy typed variants") {
    import spark.implicits._
    val df = Seq("""{"k": 87}""", """{"k": 0}""", """{"j": 1}""").toDF("doc")
    val d = df.select(jmespathDouble($"doc", "k").as("k")).collect().map(r => Option(r.get(0)))
    assert(d.toSeq == Seq(Some(87.0), Some(0.0), None))
    // truthiness: 0 is TRUE in JMESPath (util.go:13-45); missing → null → false
    val t = df.select(jmesTruthy($"doc", "k").as("t")).collect().map(_.getBoolean(0))
    assert(t.toSeq == Seq(true, true, false))
  }

  test("syntax error surfaces at analysis time, not execution") {
    import spark.implicits._
    val df = Seq("""{"a": 1}""").toDF("doc")
    val e = intercept[AnalysisException] {
      df.select(jmespath($"doc", "a.[invalid")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("jmespath"))
  }

  test("jmesTruthy on a NULL document column is FALSE (nullable=false contract)") {
    import spark.implicits._
    val df = Seq(Some("""{"k": 1}"""), None, Some("""{"j": 2}""")).toDF("doc")
    // filter through the optimizer: with nullable=false Catalyst may rewrite
    // around null checks, so a null row must still come out as non-matching
    val kept = df.where(jmesTruthy($"doc", "k")).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("""{"k": 1}"""))
    val t = df.select(jmesTruthy($"doc", "k").as("t")).collect().map(_.getBoolean(0))
    assert(t.toSeq == Seq(true, false, false))
  }

  test("malformed JSON payload yields NULL, not an error") {
    import spark.implicits._
    val df = Seq("""not json at all""").toDF("doc")
    val out = df.select(jmespath($"doc", "a")).collect()
    assert(out.head.isNullAt(0))
  }

  test("SparkEntry.entry flagship query returns rows (driver smoke contract)") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.forall(!_.isNullAt(1))) // every surviving row carries a line
  }

  test("complex result serializes as compact JSON") {
    import spark.implicits._
    val df = Seq("""{"people": [{"name": "b", "age": 2}, {"name": "a", "age": 1}]}""").toDF("doc")
    val out = df.select(jmespath($"doc", "sort_by(people, &age)[].name").as("r"))
      .collect().head.getString(0)
    assert(out == """["a","b"]""")
  }
}
