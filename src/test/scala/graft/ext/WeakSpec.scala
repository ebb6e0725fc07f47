package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ProdSession

/** [[Weak]]: the majority-vote label model — a JVM differential over a
  * MULTI-CLASS fixture (the driver gate only exercises the binary case),
  * the strict-winner/abstain tie rule, the LF report's counter algebra,
  * and the zero-shuffle plan contract for per-row labeling. */
class WeakSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark

  // labels drawn from {0,1,2} ∪ abstain, three LFs with disjoint rules
  private def fixture = {
    import spark.implicits._
    (0L until 300L).map { i =>
      (i,
        if (i % 7 == 0) None else Some(i % 3),
        if (i % 5 == 0) None else Some((i / 2) % 3),
        if (i % 2 == 0) None else Some((i / 5) % 3))
    }.toDF("id", "a", "b", "c")
  }

  test("labelVote: multi-class majority equals the JVM rule; ties abstain") {
    val lfs = Seq[(String, org.apache.spark.sql.Column)](
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    val got = Weak.labelVote(fixture, col("id"), lfs).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)), Option(r.get(5))))).toMap // (n_votes, vote)
    val want = fixture.collect().map { r =>
      val votes = Seq(1, 2, 3).flatMap(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
      val counts = votes.groupBy(identity).view.mapValues(_.size).toMap
      val vote =
        if (counts.isEmpty) None
        else {
          val mx = counts.values.max
          val winners = counts.filter(_._2 == mx).keys
          if (winners.size == 1) Some(winners.head) else None
        }
      r.getLong(0) -> ((Option(votes.size.toLong: Any), vote.map(_.asInstanceOf[Any])))
    }.toMap
    assert(got.size == 300)
    got.foreach { case (id, (n, v)) =>
      assert(n == want(id)._1, s"n_votes of row $id")
      assert(v == want(id)._2, s"vote of row $id")
    }
    // the fixture must actually contain ties and abstains for this to gate
    assert(got.values.exists(_._2.isEmpty), "fixture should produce abstains")
    assert(got.values.exists(v => v._1.contains(3L) && v._2.isEmpty),
      "fixture should produce a full-participation tie")
  }

  test("lfReport: counters equal the JVM fold; coverage sums fired over n") {
    val lfs = Seq[(String, org.apache.spark.sql.Column)](
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"))
    val voted = Weak.labelVote(fixture, col("id"), lfs).collect()
      .map(r => (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(5))))
    val report = Weak.lfReport(fixture, col("id"), lfs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    Seq(("a", 0), ("b", 1), ("c", 2)).foreach { case (name, i) =>
      def lf(t: (Option[Any], Option[Any], Option[Any], Option[Any])) =
        i match { case 0 => t._1; case 1 => t._2; case _ => t._3 }
      val fired = voted.count(lf(_).isDefined).toLong
      val agree = voted.count(t => lf(t).isDefined && t._4 == lf(t)).toLong
      val conflict = voted.count(t =>
        lf(t).isDefined && t._4.isDefined && t._4 != lf(t)).toLong
      val unresolved = voted.count(t => lf(t).isDefined && t._4.isEmpty).toLong
      val (gf, ga, gc, gu, cov) = report(name)
      assert((gf, ga, gc, gu) == ((fired, agree, conflict, unresolved)), s"LF $name")
      assert(cov == fired.toDouble / 300.0, s"coverage of $name")
      assert(ga + gc + gu == gf, s"counter algebra of $name")
    }
  }

  test("label_vote plan: per-row labeling is narrow — zero shuffles") {
    val p = graft.SparkEntry.queries("label_vote")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val shuffles = p.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"label assignment must ride the scan:\n$p")
  }
}
