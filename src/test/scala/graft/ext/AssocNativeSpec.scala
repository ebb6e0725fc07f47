package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ProdSession

/** [[graft.functions.CoocStructs]] (the r15 native basket-statistic
  * generator) must emit EXACTLY the rows of the HOF chain it replaces —
  * same kinds, same (a, b) pairs, same order — and the routed
  * [[Assoc.itemCooc]] must stay equal between BIGINT (native) and STRING
  * (HOF) item encodings of the same baskets. */
class AssocNativeSpec extends AnyFunSuite {
  private lazy val spark = ProdSession.spark
  import spark.implicits._

  test("CoocStructs == the HOF concat/flatten/transform chain, in order") {
    // r19: the kind tag no longer rides the structs — it is a bijection of
    // the (a, b) null pattern, derived after the count aggregation
    val baskets = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(7L),
      Seq.empty[Long],
      (1L to 40L).toSeq // a larger basket: 780 pairs
    ).toDF("items")
    val nullItem = lit(null).cast("long")
    val hof = concat(
      flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))), b =>
          struct(a.as("a"), b.as("b"))))),
      transform(col("items"), a =>
        struct(a.as("a"), nullItem.as("b"))),
      array(struct(nullItem.as("a"), nullItem.as("b"))))
    val rows = baskets.select(
      graft.functions.CoocStructs.coocStructs(col("items")).as("nat"),
      hof.as("hof")).collect()
    def norm(r: Row, i: Int): Seq[(Any, Any)] =
      r.getSeq[Row](i).map(x => (x.get(0), x.get(1))).toSeq
    rows.foreach { r =>
      assert(norm(r, 0) == norm(r, 1), s"native=${norm(r, 0)}\nhof=${norm(r, 1)}")
    }
  }

  test("itemCooc: BIGINT (native) and STRING (HOF) item routes agree") {
    val rows = (0 until 400).map { i => (i % 60, (i * 13) % 25) }
      .toDF("basket", "item")
    val long = Assoc.itemCooc(rows, col("basket"), col("item").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8))).toSet
    val str = Assoc.itemCooc(rows, col("basket"),
        format_string("%02d", col("item")))
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8))).toSet
    assert(long == str)
    assert(long.nonEmpty)
  }
}
