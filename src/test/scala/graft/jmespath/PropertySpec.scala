package graft.jmespath

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.compile.{FieldStep, IndexStep, JsonPathRaw, PathStep}

/** Property-based tests (SURVEY §5 plan item c): slice math vs an
  * independent CPython-slice reference, truthiness/equality laws, number
  * formatting round-trips, and a differential check of the native
  * JsonPathRaw extractor against the tree interpreter on random documents. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatest-scalacheck bridge in the dep set):
    * walks a fixed seed chain, applying `f` to each generated value. */
  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  /** CPython slice.indices() semantics (the reference's util.go:57-138
    * reimplements exactly this contract). */
  private def pySlice(n: Int, start: Option[Int], stop: Option[Int], step: Option[Int]): Seq[Int] = {
    val st = step.getOrElse(1)
    require(st != 0)
    def clamp(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
    val (defStart, defStop) = if (st > 0) (0, n) else (n - 1, -n - 1)
    def norm(vOpt: Option[Int], dflt: Int): Int = vOpt match {
      case None => dflt
      case Some(v) if v < 0 => if (st > 0) clamp(v + n, 0, n) else clamp(v + n, -1, n - 1)
      case Some(v) => if (st > 0) clamp(v, 0, n) else clamp(v, -1, n - 1)
    }
    val s0 = norm(start, defStart)
    val e0 = norm(stop, defStop)
    val b = Iterator.iterate(s0)(_ + st).takeWhile(i => if (st > 0) i < e0 else i > e0)
    b.filter(i => i >= 0 && i < n).toSeq
  }

  test("slice: full Python semantics against an independent reference") {
    val part = Gen.option(Gen.choose(-12, 12))
    val stepG = Gen.option(Gen.choose(-5, 5).suchThat(_ != 0))
    val arrG = Gen.choose(0, 9).map(n => Vector.tabulate(n)(i => JNum(i)))
    forSamples(Gen.zip(arrG, part, part, stepG)) {
      case (arr: Vector[JNum], a: Option[Int], b: Option[Int], st: Option[Int]) =>
        val expr = s"[${a.getOrElse("")}:${b.getOrElse("")}:${st.getOrElse("")}]"
        val got = Interpreter.search(expr, JArr(arr)) match {
          case JArr(xs) => xs.map { case JNum(d) => d.toInt; case _ => fail() }
          case other    => fail(s"expected array, got $other")
        }
        val exp = pySlice(arr.length, a, b, st)
        assert(got == exp, s"$expr over ${arr.length} elems: got $got expected $exp")
    }
  }

  private val jvalueGen: Gen[JValue] = {
    val scalar: Gen[JValue] = Gen.oneOf(
      Gen.const(JNull),
      Gen.oneOf(true, false).map(JBool),
      Gen.choose(-1000, 1000).map(i => JNum(i.toDouble)),
      Gen.choose(-10.0, 10.0).map(JNum),
      Gen.alphaNumStr.map(s => JStr(s.take(8))))
    def sized(depth: Int): Gen[JValue] =
      if (depth <= 0) scalar
      else Gen.frequency(
        3 -> scalar,
        1 -> Gen.listOfN(3, sized(depth - 1)).map(xs => JArr(xs.toVector)),
        1 -> Gen.listOfN(3, Gen.zip(Gen.identifier.map(_.take(5)), sized(depth - 1)))
          .map(kvs => JObj(kvs.toVector.distinctBy(_._1))))
    sized(3)
  }

  test("truthiness: false iff false/null/empty-string/empty-array/empty-object") {
    forSamples(jvalueGen) { (v: JValue) =>
      val expectFalsy = v match {
        case JNull | JBool(false) | JStr("") => true
        case JArr(xs) => xs.isEmpty
        case JObj(fs) => fs.isEmpty
        case _        => false
      }
      assert(v.truthy == !expectFalsy)
    }
  }

  test("deep equality: reflexive after serialization round-trip; NaN is not equal to itself") {
    forSamples(jvalueGen) { (v: JValue) =>
      val round = JValue.parse(JValue.serializeOrdered(v))
      assert(JValue.deepEqual(v, round))
    }
    assert(!JValue.deepEqual(JNum(Double.NaN), JNum(Double.NaN)))
  }

  test("formatNumber round-trips finite doubles") {
    forSamples(Gen.oneOf(
      Gen.choose(-1e14.toLong, 1e14.toLong).map(_.toDouble),
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1e-6, 1e-6),
      Gen.oneOf(0.0, -0.0, 1e21, 1.5e-7))) { (d: Double) =>
      val s = JValue.formatNumber(d)
      val back = JValue.parse(s) match { case JNum(x) => x; case _ => fail() }
      assert(back == d || (d == 0.0 && back == 0.0), s"$d -> $s -> $back")
    }
  }

  test("JsonPathRaw differential: native extraction == interpreter on random docs") {
    val docGen = jvalueGen.suchThat(v => v.isInstanceOf[JObj] || v.isInstanceOf[JArr])
    val stepGen: Gen[PathStep] = Gen.oneOf(
      Gen.identifier.map(s => FieldStep(s.take(5))),
      Gen.choose(-4, 4).map(IndexStep))
    forSamples(Gen.zip(docGen, Gen.listOfN(2, stepGen))) { case (doc: JValue, steps: List[PathStep]) =>
      val raw = JsonPathRaw.extract(JValue.serializeOrdered(doc), steps)
      val interpreted = steps.foldLeft(doc) {
        case (JObj(fs), FieldStep(name)) => fs.toMap.getOrElse(name, JNull)
        case (JArr(xs), IndexStep(i)) =>
          val idx = if (i < 0) xs.length + i else i
          if (idx >= 0 && idx < xs.length) xs(idx) else JNull
        case _ => JNull
      }
      (raw, interpreted) match {
        case (null, JNull) => // both miss
        case (null, other) => fail(s"native null, interpreter ${JValue.serialize(other)}")
        case (r, exp) =>
          val parsed = JValue.parse(r)
          assert(JValue.deepEqual(parsed, exp),
            s"native ${r} vs interpreter ${JValue.serializeOrdered(exp)}")
      }
    }
  }
}
