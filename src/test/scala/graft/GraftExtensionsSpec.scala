package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL-surface test: native expressions callable from spark.sql after
  * registration (same builders as the spark.sql.extensions injection path). */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("jmespath family via SQL") {
    import spark.implicits._
    Seq("""{"k": 87, "tags": ["a", "b"]}""", """{"k": 0}""")
      .toDF("doc").createOrReplaceTempView("docs")
    val r = spark.sql(
      """SELECT jmespath(doc, 'tags[0]') AS t,
        |       jmespath_double(doc, 'k') AS k,
        |       jmes_truthy(doc, 'k > `50`') AS big
        |FROM docs""".stripMargin).collect()
    assert(r(0).getString(0) == "a" && r(0).getDouble(1) == 87.0 && r(0).getBoolean(2))
    assert(r(1).isNullAt(0) && r(1).getDouble(1) == 0.0 && !r(1).getBoolean(2))
  }

  test("vector family via SQL") {
    import spark.implicits._
    Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      """SELECT cosine_sim(a, b) AS c,
        |       simhash64(array('x', 'y')) AS sh,
        |       size(minhash_sig(array('x', 'y'), 16)) AS msz
        |FROM vecs""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 16)
  }

  test("non-literal JMESPath expression argument is rejected") {
    import spark.implicits._
    Seq(("{}", "k")).toDF("doc", "e").createOrReplaceTempView("d2")
    val err = intercept[Exception] {
      spark.sql("SELECT jmespath(doc, e) FROM d2").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
