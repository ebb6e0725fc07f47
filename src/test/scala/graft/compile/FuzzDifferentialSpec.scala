package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.jmespath.{Interpreter, JNull, JNum, JStr, JValue, JmesRuntimeError, Parser}

/** Seeded randomized differential test of the LOWERED (+fused) evaluation
  * path against the interpreter: random expression strings (paths, calls,
  * comparators, combinators, projections, multi-selects, pipes, slices) ×
  * random documents (nested, malformed, NaN-bearing, null, scalar roots).
  * Every expression the translator accepts must agree with the interpreter
  * in all three output contracts on every document — the systematic
  * generalization of the hand-listed A/B cases in [[LoweringSpec]] (the
  * round-7 Not/Or error-abort divergence is exactly the class of bug this
  * sweep catches). Deterministic: fixed seed chain, no flake surface. */
class FuzzDifferentialSpec extends AnyFunSuite {

  private val docRef = BoundReference(0, StringType, nullable = true)
  private def evalCol(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      doc: String): Any =
    e.eval(InternalRow(if (doc == null) null else UTF8String.fromString(doc)))

  private def valueConvention(v: JValue): Any = v match {
    case JNull   => null
    case JStr(s) => UTF8String.fromString(s)
    case other   => UTF8String.fromString(JValue.serializeOrdered(other))
  }

  // --- generators ---------------------------------------------------------

  private val keys = Seq("a", "b", "c", "tags", "k", "name", "n")

  private def jsonGen(depth: Int): Gen[String] = {
    val scalar = Gen.oneOf(
      Gen.oneOf("0", "1", "-1", "2.5", "87", "1e2", "-0.5", "NaN", "Infinity"),
      Gen.oneOf("\"\"", "\"x\"", "\"user-7\"", "\"a\\\"q\"", "\"τ\""),
      Gen.oneOf("true", "false", "null"))
    if (depth <= 0) scalar
    else Gen.frequency(
      4 -> scalar,
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, jsonGen(depth - 1)).map(_.mkString("[", ",", "]"))),
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.oneOf(keys), jsonGen(depth - 1)))
          .map(_.map { case (k, v) => s""""$k":$v""" }.distinctBy(_.takeWhile(_ != ':'))
            .mkString("{", ",", "}"))))
  }

  private val docGen: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf(keys), jsonGen(2)))
        .map(_.map { case (k, v) => s""""$k":$v""" }.distinctBy(_.takeWhile(_ != ':'))
          .mkString("{", ",", "}"))),
    1 -> Gen.oneOf("[1,2,3]", "[]", "42", "\"top\"", "null", "true"),
    1 -> Gen.oneOf("not json", "{broken", "", "[1,"))

  private val pathGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    segs <- Gen.listOfN(n, Gen.oneOf(keys))
    idx <- Gen.option(Gen.choose(-2, 2))
  } yield segs.mkString(".") + idx.map(i => s"[$i]").getOrElse("")

  private val litGen: Gen[String] = Gen.oneOf(
    "`0`", "`1`", "`2.5`", "`-1`", "`87`", "'x'", "'user-7'", "`null`",
    "`true`", "`[1,2]`", "`{\"a\": 1}`", "`\"\"`")

  private val callGen: Gen[String] = Gen.oneOf(
    pathGen.map(p => s"length($p)"),
    pathGen.map(p => s"to_number($p)"),
    pathGen.map(p => s"contains($p, 'x')"),
    Gen.zip(pathGen, pathGen).map { case (a, b) => s"not_null($a, $b)" },
    pathGen.map(p => s"sort($p)"),
    pathGen.map(p => s"keys($p)"),
    pathGen.map(p => s"max($p)"),
    pathGen.map(p => s"type($p)"),
    pathGen.map(p => s"starts_with($p, 'u')"),
    pathGen.map(p => s"abs(to_number($p))"))

  private val cmpOp = Gen.oneOf("==", "!=", "<", "<=", ">", ">=")

  private val projGen: Gen[String] = Gen.oneOf(
    Gen.zip(pathGen, pathGen).map { case (b, s) => s"$b[*].$s" },
    pathGen.map(b => s"$b[*]"),
    pathGen.map(b => s"$b[]"),
    pathGen.map(b => s"$b.*"),
    Gen.zip(pathGen, Gen.oneOf(keys), cmpOp, Gen.oneOf("`1`", "'x'", "`null`"))
      .map { case (b, f, op, l) => s"$b[?$f $op $l]" },
    Gen.zip(pathGen, Gen.choose(-3, 3), Gen.choose(-3, 3))
      .map { case (b, x, y) => s"$b[$x:$y]" },
    // step 0 included deliberately: it parses but throws at eval time —
    // the interpreter aborts the whole expression, and the lowering must
    // refuse rather than return an empty projection
    Gen.zip(pathGen, Gen.choose(-3, 3)).map { case (b, st) => s"$b[::$st]" })

  private val msGen: Gen[String] = Gen.oneOf(
    Gen.zip(pathGen, pathGen).map { case (a, b) => s"[$a, $b]" },
    Gen.zip(pathGen, pathGen).map { case (a, b) => s"{x: $a, y: $b}" })

  private def exprGen(depth: Int): Gen[String] = {
    val atom = Gen.frequency(
      4 -> pathGen, 2 -> callGen, 2 -> projGen, 1 -> msGen, 1 -> litGen,
      1 -> Gen.zip(pathGen, Gen.oneOf(exprLeafForPipe)).map { case (p, r) => s"$p | $r" },
      // container-rooted pipes: the general serialize/reparse composition
      // (round 12) — multi-select/projection stage 1, arbitrary stage 2
      1 -> Gen.zip(Gen.oneOf(msGen, projGen), Gen.oneOf(containerPipeRhs))
        .map { case (p, r) => s"$p | $r" })
    if (depth <= 0) atom
    else Gen.frequency(
      3 -> atom,
      2 -> Gen.zip(exprGen(depth - 1), cmpOp,
        Gen.frequency(3 -> litGen, 1 -> pathGen)).map { case (l, op, r) => s"($l) $op $r" },
      2 -> Gen.zip(exprGen(depth - 1), exprGen(depth - 1))
        .map { case (a, b) => s"($a) && ($b)" },
      2 -> Gen.zip(exprGen(depth - 1), exprGen(depth - 1))
        .map { case (a, b) => s"($a) || ($b)" },
      1 -> exprGen(depth - 1).map(e => s"!($e)"))
  }
  private val exprLeafForPipe = Seq("[0]", "keys(@)", "length(@)", "@", "[x, k]")
  // stage-2 shapes for container-rooted pipes: index/path access, nested
  // containers, truthy-ish forms, and a NULL-pinned projection
  private val containerPipeRhs = Seq(
    "[0]", "[-1]", "x", "y", "@", "[*]", "[].x", "{v: [0]}", "[x, [1]]",
    "keys(@)", "length(@)", "!@", "[0] > `1`", "[1:]", "sort(@)")

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    // override for ad-hoc alternate-seed sweeps (env vars reach the forked
    // test JVM): GRAFT_FUZZ_SEED=<n> GRAFT_FUZZ_SAMPLES=<n> sbt "testOnly ..."
    var seed = org.scalacheck.rng.Seed(
      sys.env.getOrElse("GRAFT_FUZZ_SEED", "20260813").toLong)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  // --- the differential ---------------------------------------------------

  test("random expressions × random documents: lowered == interpreted in all contexts") {
    var lowered = 0
    var pairs = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    forSamples(Gen.zip(exprGen(2), Gen.listOfN(6, docGen)),
      sys.env.getOrElse("GRAFT_FUZZ_SAMPLES", "600").toInt) { case (e, docs) =>
      val ast = try Parser.parse(e) catch { case _: Exception => null }
      if (ast != null) {
        val tCol = Lowering.truthyNullSafe(docRef, ast)
        val nCol = Lowering.numNullSafe(docRef, ast)
        val vCol = Lowering.valueNullSafe(docRef, ast)
        if (tCol.isDefined || nCol.isDefined || vCol.isDefined) lowered += 1
        for (doc <- docs) {
          pairs += 1
          val jvOpt = JValue.parseOpt(doc)
          def interp: Option[JValue] = jvOpt.map { jv =>
            try Interpreter.eval(ast, jv) catch { case _: JmesRuntimeError => JNull }
          }
          tCol.foreach { col =>
            val got = evalCol(col, doc)
            val exp = jvOpt.exists { jv =>
              try Interpreter.eval(ast, jv).truthy catch { case _: JmesRuntimeError => false }
            }
            if (got != exp) failures += s"truthy[$e] over <$doc>: lowered $got vs $exp"
          }
          nCol.foreach { col =>
            val got = evalCol(col, doc)
            val exp = interp match { case Some(JNum(d)) => d; case _ => null }
            val same = (got, exp) match {
              case (g: java.lang.Double, x: java.lang.Double) => g.equals(x)
              case _                                          => got == exp
            }
            if (!same) failures += s"num[$e] over <$doc>: lowered $got vs $exp"
          }
          vCol.foreach { col =>
            val got = evalCol(col, doc)
            val exp = interp.map(valueConvention).orNull
            if (got != exp) failures += s"value[$e] over <$doc>: lowered $got vs $exp"
          }
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} divergences (of $pairs pairs):\n${failures.take(25).mkString("\n")}")
    // the sweep must actually exercise the lowered path, not vacuously pass
    assert(lowered >= 150, s"only $lowered of the generated expressions lowered")
    info(s"$lowered lowered expressions, $pairs (expr, doc) evaluations, 0 divergences")
  }
}
