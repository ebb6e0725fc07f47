package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MgSketch]] / [[Freq.heavyHitters]]: the superset guarantee on an
  * adversarial stream where pruning MUST fire, exactness of the two-pass
  * output against brute force, partitioning invariance, and the plan
  * properties (bounded partial aggregation, candidate-filtered recount). */
class FreqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.ProdSession.spark
  import spark.implicits._

  // 5 heavy items (1000 each) buried in a 30k-distinct filler flood: with
  // m = 100 the sketch holds ≤ 200 of 30_005 distinct terms, so pruning
  // fires constantly, and n/(m+1) = 35000/101 ≈ 347 < 1000 puts every
  // heavy item under the unconditional survival guarantee.
  private val heavy = (1 to 5).flatMap(h => Seq.fill(1000)(s"h$h"))
  private val fill = (1 to 30000).map(i => s"f$i")
  private val n = heavy.size + fill.size // 35_000
  private lazy val terms =
    spark.createDataset(new scala.util.Random(42).shuffle(heavy ++ fill))(
      org.apache.spark.sql.Encoders.STRING).toDF("term").repartition(7)

  test("MG sketch: every item above n/(m+1) survives pruning") {
    val mg = udaf(new MgSketch(100), org.apache.spark.sql.Encoders.STRING)
    val sketch = terms.agg(mg(col("term"))).head().getMap[String, Long](0)
    assert(sketch.size <= 200, s"sketch must stay bounded, got ${sketch.size}")
    assert(sketch.size < 30005, "pruning never fired — the test is vacuous")
    for (h <- 1 to 5)
      assert(sketch.contains(s"h$h"), s"heavy item h$h pruned — guarantee broken")
  }

  test("heavyHitters == brute-force groupBy, on any partitioning") {
    val expected = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 100 > lit(n.toLong))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(expected.map(_._1) == (1 to 5).map(h => s"h$h"),
      "the constructed corpus must have exactly the 5 heavy items above n/m")
    for (parts <- Seq(1, 7, 32)) {
      val got = Freq.heavyHitters(terms.repartition(parts), m = 100)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"two-pass output diverged at $parts partitions")
    }
  }

  test("heavyHitters recount plan: candidate filter before ONE aggregation exchange") {
    // parquet-backed domain (a LocalRelation would fold the filter away at
    // plan time and hide what this test pins): the gate query's own shape
    val docs = graft.SparkEntry.table(spark, "/root/testdata/sf0.001", "documents")
    val p: SparkPlan = Freq.heavyHitters(Freq.trigrams(docs), m = 4096)
      .queryExecution.executedPlan
    def cnt(pf: PartialFunction[SparkPlan, Unit]): Int =
      p.collect { case n if pf.isDefinedAt(n) => n }.size
    // one shuffle: the candidate-only groupBy (plus nothing corpus-wide)
    assert(cnt { case _: ShuffleExchangeExec => } == 1,
      s"expected exactly the recount exchange:\n$p")
    assert(cnt { case _: HashAggregateExec => } == 2,
      s"expected partial+final recount HashAggregate:\n$p")
    // the scan-time candidate-membership filter keeps non-candidates off
    // the wire (>10 candidates optimizes to an INSET hash probe)
    val s = p.toString
    assert(s.contains("INSET") || s.contains(" IN "),
      s"expected a candidate-membership filter below the recount:\n$p")
  }

  test("trigram domain matches the oracle's windowing on short docs") {
    val docs = Seq("a b c d", "a b", "", "x y z").toDF("text")
    val got = Freq.trigrams(docs).as[String].collect().sorted.toSeq
    assert(got == Seq("a b c", "b c d", "x y z"))
  }
}
