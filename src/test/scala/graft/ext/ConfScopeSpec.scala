package graft.ext

import graft.ProdSession
import org.scalatest.funsuite.AnyFunSuite

/** ConfScope session-clone machinery: memoization and the r17 stacking
  * contract (ADVICE r16 #3 — re-scoping an already-scoped frame must
  * COMPOSE the overrides from the root session, outer scope winning per
  * key, instead of silently dropping the inner scope). */
class ConfScopeSpec extends AnyFunSuite {
  lazy val spark = ProdSession.spark

  test("stacked scopes compose: inner override survives, outer wins on shared keys") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val inner = ConfScope(df,
      "spark.sql.optimizer.excludedRules" -> ConfScope.RedundantInferRules,
      "spark.sql.autoBroadcastJoinThreshold" -> "12345")
    val outer = ConfScope(inner,
      "spark.sql.autoBroadcastJoinThreshold" -> "54321")
    val s = outer.sparkSession
    // outer wins on the shared key
    assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") == "54321")
    // the inner scope's unrelated override survives the re-scope
    assert(s.conf.get("spark.sql.optimizer.excludedRules") ==
      ConfScope.RedundantInferRules)
    // neither scope leaked into the base session
    assert(spark.conf.getOption("spark.sql.optimizer.excludedRules").forall(_.isEmpty))
    // the data rides through untouched
    assert(outer.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("scoped clones are memoized per (root, flattened confs)") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val a = ConfScope(df, "spark.sql.autoBroadcastJoinThreshold" -> "777")
    val b = ConfScope(df, "spark.sql.autoBroadcastJoinThreshold" -> "777")
    assert(a.sparkSession eq b.sparkSession)
    // stacking a no-op scope re-lands on the SAME flattened clone
    val c = ConfScope(a, "spark.sql.autoBroadcastJoinThreshold" -> "777")
    assert(c.sparkSession eq a.sparkSession)
  }
}
