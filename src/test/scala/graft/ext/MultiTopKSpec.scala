package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.ProdSession

/** [[MultiTopKAgg]] (one aggregation state carrying every ranking leg —
  * the r14 mrl_recall fusion) must equal per-leg [[TopKAgg]] exactly:
  * same (score desc, id asc) order, same tie handling, and NaN scores
  * (PrefixCosineSims' zero-norm slot) dropped from their leg only. */
class MultiTopKSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  import spark.implicits._

  test("MultiTopKAgg == one TopKAgg per leg (ties, dups, NaN drop)") {
    // deterministic scores with deliberate ties across ids and a NaN lane
    val rows = (0 until 200).map { i =>
      val id = i.toLong
      val s0 = (i % 13).toDouble           // many ties → id tiebreak matters
      val s1 = ((i * 7) % 19).toDouble / 3.0
      val s2 = if (i % 17 == 0) Double.NaN else -((i % 5).toDouble) // NaN lane
      (i % 4, id, Seq(s0, s1, s2))
    }
    val df = rows.toDF("q", "id", "scores")
    val k = 5
    val multi = udaf(new MultiTopKAgg(k, 3), ExpressionEncoder[MultiScored]())
    val single = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())

    val got = df.groupBy("q").agg(multi(col("id"), col("scores")).as("nb"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[scala.collection.Seq[org.apache.spark.sql.Row]](1))
      .toMap
    for (leg <- 0 until 3) {
      val exp = df
        .select(col("q"), col("id"), element_at(col("scores"), leg + 1).as("s"))
        .where(!isnan(col("s"))) // TopKAgg's `score > bound` guard drops NaN
        .groupBy("q").agg(single(col("id"), col("s")).as("nb"))
        .collect().map(r => r.getInt(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1))))
        .toMap
      for (q <- exp.keys) {
        val g = got(q)(leg).map(x => (x.getLong(0), x.getDouble(1))).toSeq
        assert(g == exp(q).toSeq, s"leg $leg q=$q: multi=$g single=${exp(q)}")
      }
    }
  }
}
