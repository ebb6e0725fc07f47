package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}

import graft.functions.jmes._
import graft.jmespath.{Interpreter, JNull, JStr, JValue, JmesRuntimeError}

/** Cross-column single-parse fusion ([[FuseProjectScans]]): a multi-column
  * JMESPath select must (a) keep exactly the per-column interpreted
  * semantics and (b) collapse to ONE shared document scan in the optimized
  * plan — through the REAL production injection path
  * ([[graft.ProdSession]]: `Builder.withExtensions(new GraftExtensions)`,
  * the same code `spark.sql.extensions` runs), so the rules sit in the
  * preCBO batch exactly as in Bench/Verify/production. */
class CrossColumnFusionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.ProdSession.spark

  private def docsDf: DataFrame = {
    import spark.implicits._
    val docs = Seq(
      Some("""{"k": 87, "tags": ["a", "b", "c"], "name": "hello", "o": {"x": 1, "y": 2}}"""),
      Some("""{"k": 3, "tags": [], "name": "", "o": {}}"""),
      Some("""{"k": "50", "tags": "notanarray"}"""),
      Some("""{"k": NaN, "tags": [NaN, 1]}"""),
      Some("""{}"""), Some("not json"), Some("{broken"), Some("null"),
      Some("""[1, 2, 3]"""), None)
    // parquet-backed so ConvertToLocalRelation can't evaluate driver-side
    val pq = java.nio.file.Files.createTempDirectory("xcol").toString + "/docs"
    docs.zipWithIndex.map { case (d, i) => (i, d.orNull) }.toDF("id", "doc")
      .coalesce(1).write.parquet(pq)
    spark.read.parquet(pq).orderBy("id")
  }

  /** Interpreted-engine reference under JmesPathEval's output convention. */
  private def interpValue(doc: String, e: String): Option[String] =
    Option(doc).flatMap(JValue.parseOpt).flatMap { jv =>
      (try Interpreter.search(e, jv) catch { case _: JmesRuntimeError => JNull }) match {
        case JNull   => None
        case JStr(s) => Some(s)
        case other   => Some(JValue.serializeOrdered(other))
      }
    }
  private def interpTruthy(doc: String, e: String): Boolean =
    Option(doc).flatMap(JValue.parseOpt).exists { jv =>
      try Interpreter.search(e, jv).truthy catch { case _: JmesRuntimeError => false }
    }

  private def fusedEvals(df: DataFrame): Seq[JsonFusedEval] =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case j: JsonFusedEval => j })
    }.flatten

  test("multi-column select fuses to one scan and matches the interpreter") {
    val exprs = Seq(
      "k",                      // value: plain path
      "o.x",                    // value: nested path
      "k >= `50` && k",         // filtered gate+value (its own fused tree)
      "length(tags)",           // function call
      "[k, o.y]")               // multi-select over shared paths
    val df = docsDf
    val q = df.select(
      col("id") +:
        exprs.zipWithIndex.map { case (e, i) => jmespath(col("doc"), e).as(s"v$i") } :+
        jmesTruthy(col("doc"), "k == `87` || o.x").as("t") :+
        jmespathDouble(col("doc"), "to_number(k)").as("d"): _*)

    // plan shape: every lowered scan merged into ONE JsonFusedEval
    val fused = fusedEvals(q)
    assert(fused.length == 1,
      s"expected one fused scan, got ${fused.length}:\n${q.queryExecution.optimizedPlan}")
    assert(q.queryExecution.optimizedPlan.toString.contains("_jmes_scan"))

    // semantics: per-row agreement with the interpreted engine
    val rows = q.collect()
    val docs = df.collect().map(r => r.getAs[String]("doc"))
    assert(rows.length == docs.length)
    rows.zip(docs).foreach { case (row, doc) =>
      exprs.zipWithIndex.foreach { case (e, i) =>
        val got = Option(row.getAs[String](s"v$i"))
        assert(got == interpValue(doc, e), s"[$e] over $doc")
      }
      assert(row.getAs[Boolean]("t") == interpTruthy(doc, "k == `87` || o.x"),
        s"[truthy] over $doc")
      val gotD = if (row.isNullAt(row.fieldIndex("d"))) None else Some(row.getAs[Double]("d"))
      val expD = Option(doc).flatMap(JValue.parseOpt).flatMap { jv =>
        (try Interpreter.search("to_number(k)", jv)
         catch { case _: JmesRuntimeError => JNull }) match {
          case graft.jmespath.JNum(d) => Some(d)
          case _                      => None
        }
      }
      // NaN-aware compare (Scala's == says NaN != NaN)
      assert(gotD.map(java.lang.Double.doubleToLongBits) ==
        expD.map(java.lang.Double.doubleToLongBits),
        s"[to_number(k)] over $doc: $gotD vs $expD")
    }
  }

  test("filter + select over a table column share ONE scan below the filter") {
    // the CLI pipeline shape: -filter gate + multi-column -format extraction
    // over the same stored document column — the reference parses each
    // record once END-TO-END (main.go:89-104), so must we
    val df = docsDf
    val q = df
      .where(jmesTruthy(col("doc"), "k > `50` && length(tags) == `3`"))
      .select(col("id"),
        jmespathDouble(col("doc"), "k").as("k"),
        jmespath(col("doc"), "tags[0]").as("tag0"))
    val fused = fusedEvals(q)
    assert(fused.length == 1,
      s"expected one shared scan for gate+outputs, got ${fused.length}:\n${q.queryExecution.optimizedPlan}")
    // the Filter must consume the shared scan, not run its own
    val filters = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    assert(filters.nonEmpty &&
      filters.forall(_.collect { case j: JsonFusedEval => j }.isEmpty),
      s"filter still evaluates its own scan:\n${q.queryExecution.optimizedPlan}")
    // semantics vs the interpreter
    val got = q.collect().map(r => (r.getInt(0),
      Option(if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))),
      Option(r.getAs[String]("tag0")))).toSeq
    val exp = docsDf.collect().toSeq.flatMap { r =>
      val doc = r.getAs[String]("doc")
      if (interpTruthy(doc, "k > `50` && length(tags) == `3`"))
        Some((r.getInt(0),
          interpValue(doc, "k").map(_.toDouble).map(java.lang.Double.valueOf),
          interpValue(doc, "tags[0]")))
      else None
    }
    assert(got == exp)
  }

  test("bare multi-scan filter hoists one shared scan and keeps the schema") {
    val df = docsDf
    val q = df.where(
      jmesTruthy(col("doc"), "k > `50`") || jmesTruthy(col("doc"), "length(tags) == `3`"))
    assert(fusedEvals(q).length == 1,
      s"expected one shared scan:\n${q.queryExecution.optimizedPlan}")
    assert(q.columns.toSeq == df.columns.toSeq) // schema preserved
    val got = q.collect().map(_.getInt(0)).toSet
    val exp = docsDf.collect().flatMap { r =>
      val doc = r.getAs[String]("doc")
      if (interpTruthy(doc, "k > `50`") || interpTruthy(doc, "length(tags) == `3`"))
        Some(r.getInt(0)) else None
    }.toSet
    assert(got == exp)
  }

  test("CollapseProject does not re-inline the hoisted scan") {
    val q = docsDf.select(
      jmespath(col("doc"), "k").as("a"),
      jmespath(col("doc"), "o.x").as("b"))
    val optimized = q.queryExecution.optimizedPlan
    assert(fusedEvals(q).length == 1, s"expected one fused scan:\n$optimized")
    val collapsed = org.apache.spark.sql.catalyst.optimizer.CollapseProject(optimized)
    val after = collapsed.collect { case p =>
      p.expressions.flatMap(_.collect { case j: JsonFusedEval => j })
    }.flatten
    assert(after.length == 1, s"CollapseProject duplicated the scan:\n$collapsed")
  }

  test("columns mixing other attributes fuse their pure-scan parts only") {
    val q = docsDf.select(
      concat(jmespath(col("doc"), "name"), lit("#"), col("id")).as("mix"),
      jmespathDouble(col("doc"), "k").as("k"))
    assert(fusedEvals(q).length == 1,
      s"expected one fused scan:\n${q.queryExecution.optimizedPlan}")
    val rows = q.collect()
    val docs = docsDf.collect().map(r => r.getAs[String]("doc"))
    rows.zip(docs.zipWithIndex).foreach { case (row, (doc, i)) =>
      val exp = interpValue(doc, "name").map(n => s"$n#$i")
      assert(Option(row.getAs[String]("mix")) == exp, s"[mix] over $doc")
    }
  }

  test("identical expressions across columns share one struct field") {
    val q = docsDf.select(
      jmespathDouble(col("doc"), "k").as("k1"),
      jmespathDouble(col("doc"), "k").as("k2"),
      jmespath(col("doc"), "name").as("n"))
    val fused = fusedEvals(q)
    assert(fused.length == 1)
    // 2 distinct nodes -> 2 struct fields (k lowered twice dedupes to one)
    assert(fused.head.template.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.length == 2, s"expected dedup to 2 fields:\n${fused.head.template.dataType}")
    q.collect().foreach { row =>
      val (a, b) = (row.get(row.fieldIndex("k1")), row.get(row.fieldIndex("k2")))
      // java equals is NaN-aware, unlike Scala's numeric ==
      assert(if (a == null) b == null else a.equals(b), s"$a vs $b")
    }
  }

  test("two document columns form two independent fused scans") {
    import org.apache.spark.sql.functions.concat
    val two = docsDf.select(col("id"), col("doc"),
      concat(lit("""{"w": """), col("id"), lit("}")).as("doc2"))
    val q = two.select(
      jmespathDouble(col("doc"), "k").as("a"),
      jmespath(col("doc"), "name").as("b"),
      jmespathDouble(col("doc2"), "w").as("c"),
      jmesTruthy(col("doc2"), "w >= `5`").as("d"))
    val fused = fusedEvals(q)
    assert(fused.length == 2, s"one scan per document column:\n${q.queryExecution.optimizedPlan}")
    val rows = q.collect()
    val src = two.collect()
    rows.zip(src).foreach { case (row, s) =>
      val (doc, id) = (s.getAs[String]("doc"), s.getAs[Int]("id"))
      val expA = Option(doc).flatMap(JValue.parseOpt).flatMap { jv =>
        (try Interpreter.search("k", jv) catch { case _: JmesRuntimeError => JNull }) match {
          case graft.jmespath.JNum(d) => Some(d) // double context: numbers only
          case _                      => None
        }
      }
      val gotA = if (row.isNullAt(0)) None else Some(row.getDouble(0))
      assert(gotA.map(java.lang.Double.doubleToLongBits) ==
        expA.map(java.lang.Double.doubleToLongBits), s"[k] over $doc")
      assert(row.getDouble(2) == id.toDouble && row.getBoolean(3) == (id >= 5))
    }
  }

  test("interp opt-out conf keeps expressions interpreted") {
    spark.conf.set(LowerJmesPathRule.LowerConfKey, "false")
    try {
      val q = docsDf.select(
        jmespathDouble(col("doc"), "k").as("a"),
        jmespath(col("doc"), "name").as("b"))
      assert(fusedEvals(q).isEmpty)
      val s = q.queryExecution.optimizedPlan.toString
      assert(s.contains("jmespath"), s"expected interpreted expressions:\n$s")
    } finally spark.conf.set(LowerJmesPathRule.LowerConfKey, "true")
  }
}
