package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r18 bench-artifact hardening (VERDICT r17 #1 + ADVICE r17 #1):
  * the floor file parse/merge must key the guard by (sf, cpus), treat
  * legacy files as local[32], and stay monotone under min-merge. The
  * incremental-flush behaviour itself is exercised by any bench run
  * (bench.json exists from the first warm-up on); these pin the pure
  * decision logic a kill cannot interrupt. */
class BenchArtifactSpec extends AnyFunSuite {

  test("parseFloor reads sf, cpus and floors from a current-format file") {
    val (sf, cp, floors) = Bench.parseFloor(
      """{"sf":"0.1","cpus":"32","q1_agg":0.123,"ann_lsh":0.646}""")
    assert(sf.contains("0.1"))
    assert(cp.contains("32"))
    assert(floors === Map("q1_agg" -> 0.123, "ann_lsh" -> 0.646))
  }

  test("parseFloor attributes a legacy file (no cpus key) to local[32]") {
    val (sf, cp, floors) = Bench.parseFloor("""{"sf":"0.1","q1_agg":0.123}""")
    assert(sf.contains("0.1"))
    assert(cp.contains("32"), "pre-r18 floors were all recorded at local[32]")
    assert(floors === Map("q1_agg" -> 0.123))
  }

  test("parseFloor on an empty/missing file yields no labels and no floors") {
    val (sf, cp, floors) = Bench.parseFloor("")
    assert(sf.isEmpty && cp.isEmpty && floors.isEmpty)
  }

  test("parseFloor never mistakes the sf/cpus labels for query floors") {
    val (_, _, floors) = Bench.parseFloor(
      """{"sf":"0.1","cpus":"32","sfq":1.5}""")
    assert(!floors.contains("sf") && !floors.contains("cpus"))
    assert(floors === Map("sfq" -> 1.5))
  }

  test("mergeFloor is monotone: a contended value never raises a floor") {
    val prev = Map("a" -> 0.5, "b" -> 1.0)
    val merged = Bench.mergeFloor(prev, Seq("a" -> 3.0, "b" -> 0.8, "c" -> 2.0))
    assert(merged === Map("a" -> 0.5, "b" -> 0.8, "c" -> 2.0))
  }

  test("mergeFloor ignores failed (-1) and zero readings") {
    val merged = Bench.mergeFloor(Map("a" -> 0.5), Seq("a" -> -1.0, "b" -> 0.0))
    assert(merged === Map("a" -> 0.5))
  }
}
