package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.jmes._

/** Driver-oracle coverage for every JMESPath AST operator (SURVEY.md §2.2
  * J3–J20) and all 26 functions (§2.3).
  *
  * Pattern: build a compact JSON document per `events` row out of small
  * derived integers (a = event_id%10, b = user_id%7, c = (event_id+user_id)%5)
  * plus the event_type string, evaluate JMESPath over it on the Spark side,
  * and have the DuckDB oracle compute the expected result *arithmetically*
  * from the same derived columns — the oracle never needs a JMESPath engine.
  *
  * The document (insertion order = construction order; all numbers integral
  * except `half`, so Go-style serialization is byte-stable on both sides):
  *
  * {{{
  * {"arr":[a,b,c], "nest":[[a],[b,c]], "mix":[a,[b,c]],
  *  "objs":[{"x":a},{"y":b},{"x":c,"y":a}],
  *  "objs2":[{"k":2a,"v":1},{"k":2b+1,"v":2}],      // keys always distinct
  *  "o":{"u":a,"v":b}, "et":"<event_type>", "neg":-(a+1),
  *  "half":a.5, "nstr":"<a>", "tags":["x<a>","y<b>"]}
  * }}}
  *
  * Reference semantics: interpreter.go:31-315, functions.go:127-322,
  * util.go:13-45 (truthiness), util.go:57-138 (slices).
  */
object JmesCoverage {
  private type Q = (SparkSession, String) => DataFrame

  private def base(s: SparkSession, dir: String): DataFrame =
    SparkEntry.table(s, dir, "events").select(
      col("event_id"),
      (col("event_id") % 10).cast("long").as("a"),
      (col("user_id") % 7).cast("long").as("b"),
      ((col("event_id") + col("user_id")) % 5).cast("long").as("c"),
      col("event_type").as("et"))

  /** The per-row JSON document (kept byte-identical to the oracle's SQL
    * concatenation in [[docSql]]). */
  private def docCol: Column = concat(
    lit("{\"arr\":["), col("a"), lit(","), col("b"), lit(","), col("c"),
    lit("],\"nest\":[["), col("a"), lit("],["), col("b"), lit(","), col("c"),
    lit("]],\"mix\":["), col("a"), lit(",["), col("b"), lit(","), col("c"),
    lit("]],\"objs\":[{\"x\":"), col("a"), lit("},{\"y\":"), col("b"),
    lit("},{\"x\":"), col("c"), lit(",\"y\":"), col("a"),
    lit("}],\"objs2\":[{\"k\":"), col("a") * 2, lit(",\"v\":1},{\"k\":"), col("b") * 2 + 1,
    lit(",\"v\":2}],\"o\":{\"u\":"), col("a"), lit(",\"v\":"), col("b"),
    lit("},\"et\":\""), col("et"),
    lit("\",\"neg\":-"), col("a") + 1,
    lit(",\"half\":"), col("a"), lit(".5,\"nstr\":\""), col("a"),
    lit("\",\"tags\":[\"x"), col("a"), lit("\",\"y"), col("b"), lit("\"]}"))

  /** Same document as a DuckDB SQL concatenation over t(a,b,c,et). */
  private val docSql: String =
    """'{"arr":[' || a || ',' || b || ',' || c ||
      |'],"nest":[[' || a || '],[' || b || ',' || c ||
      |']],"mix":[' || a || ',[' || b || ',' || c ||
      |']],"objs":[{"x":' || a || '},{"y":' || b ||
      |'},{"x":' || c || ',"y":' || a ||
      |'}],"objs2":[{"k":' || (a*2) || ',"v":1},{"k":' || (b*2+1) ||
      |',"v":2}],"o":{"u":' || a || ',"v":' || b ||
      |'},"et":"' || et ||
      |'","neg":-' || (a+1) ||
      |',"half":' || a || '.5,"nstr":"' || a ||
      |'","tags":["x' || a || '","y' || b || '"]}'""".stripMargin.replace("\n", " ")

  // shorthand: evaluate over the doc column
  private def js(e: String) = jmespath(col("doc"), e)       // compact-JSON string
  private def jd(e: String) = jmespathDouble(col("doc"), e) // numeric result
  private def jt(e: String) = jmesTruthy(col("doc"), e)     // truthiness

  private def docQ(outs: (String, Column)*): Q = (s, dir) =>
    base(s, dir).withColumn("doc", docCol)
      .select(col("event_id") +: outs.map { case (n, cc) => cc.as(n) }: _*)

  private def o(cols: String): String =
    "WITH t AS (SELECT event_id, event_id % 10 AS a, user_id % 7 AS b, " +
      "(event_id + user_id) % 5 AS c, event_type AS et FROM events) " +
      s"SELECT event_id, $cols FROM t"

  val queries: Map[String, Q] = Map(
    // J3 — index, negative index, nested, OOB→null (interpreter.go:147-170)
    "j3_index" -> docQ(
      "i1" -> jd("arr[1]"), "i2" -> jd("arr[-1]"), "i3" -> jd("nest[1][0]"),
      "oob_null" -> js("arr[5]").isNull),
    // J4 — Python slice semantics incl. negative step (util.go:57-138)
    "j4_slice" -> docQ(
      "s1" -> js("arr[::2]"), "s2" -> js("arr[1:]"),
      "s3" -> js("arr[::-1]"), "s4" -> js("arr[:2]")),
    // J5 — projections drop null results (interpreter.go:242-265)
    "j5_projection" -> docQ(
      "p1" -> js("objs[*].x"), "p2" -> js("objs[*].y")),
    // J6 — object-value projection; insertion order (documented deviation)
    "j6_value_projection" -> docQ(
      "v1" -> js("o.*"), "v2" -> jd("o.* | [1]")),
    // J7 — filter projection over truthiness of the condition
    "j7_filter_projection" -> docQ(
      "f1" -> js("arr[?@ >= `3`]"), "f2" -> js("objs[?x > `2`].x")),
    // J8 — flatten one level; non-array elements kept (interpreter.go:114-144)
    "j8_flatten" -> docQ(
      "fl1" -> js("nest[]"), "fl2" -> js("mix[]")),
    // J9 — multi-select list
    "j9_multiselect_list" -> docQ(
      "m1" -> js("[arr[0], o.v, et]")),
    // J10 — multi-select hash (insertion-ordered output)
    "j10_multiselect_hash" -> docQ(
      "h1" -> js("{lo: arr[0], hi: arr[-1], tag: et}")),
    // J11 — deep equality + number-only ordering (interpreter.go:33-65)
    "j11_comparators" -> docQ(
      "ceq" -> jt("arr == arr"), "cne" -> jt("arr[0] != arr[1]"),
      "clt" -> jt("arr[0] < arr[1]"), "cge" -> jt("arr[0] >= arr[2]"),
      "cstr_null" -> js("et < `5`").isNull),
    // J12 — `||` returns first truthy operand VALUE (0 is truthy!)
    "j12_or" -> docQ(
      "o1" -> jd("missing || arr[1]"), "o2" -> jd("arr[0] || arr[1]"),
      "o3" -> js("`\"\"` || et")),
    // J13 — `&&` returns lhs if falsy else rhs (value semantics)
    "j13_and" -> docQ(
      "a1" -> jd("arr && arr[1]"), "a2" -> js("`[]` && et"),
      "a3" -> jd("arr[0] && arr[2]")),
    // J14 — `!` truthiness negation
    "j14_not" -> docQ(
      "n1" -> js("!(arr[0] > `4`)"), "n2" -> jt("!et")),
    // J15 — pipe stops projections
    "j15_pipe" -> docQ(
      "pi1" -> jd("arr | [1]"), "pi2" -> jd("objs[*].x | [1]"),
      "pi3" -> jd("o | u")),
    // J16 — backtick JSON literals + raw strings
    "j16_literal" -> docQ(
      "l1" -> jd("`{\"x\": 42}`.x"), "l2" -> js("'raw str'"),
      "l3" -> jd("`[1,2,3]`[1]")),
    // J17 — `@` current node (in filters and function args)
    "j17_current_node" -> docQ(
      "cn1" -> jd("sum(arr[?@ >= `0`])"), "cn2" -> jd("arr[?@ >= `0`] | [-1]")),
    // J18 — identity: `@` over the root re-serializes the whole document
    "j18_identity" -> docQ(
      "id_doc" -> js("@")),

    // §2.3 functions — one entry each (J19 expref via *_by/sort_by/map;
    // J20 function dispatch via all of them)
    "fn_abs" -> docQ("ab1" -> jd("abs(neg)"), "ab2" -> jd("abs(arr[0])")),
    "fn_avg" -> docQ("av1" -> jd("avg(arr)")),
    "fn_ceil" -> docQ("ce1" -> jd("ceil(half)"), "ce2" -> jd("ceil(arr[0])")),
    "fn_floor" -> docQ("flr1" -> jd("floor(half)")),
    "fn_contains" -> docQ(
      "co1" -> jt("contains(et, 'ck')"), "co2" -> jt("contains(arr, `3`)")),
    "fn_starts_with" -> docQ("sw" -> jt("starts_with(et, 'p')")),
    "fn_ends_with" -> docQ("ew" -> jt("ends_with(et, 'w')")),
    "fn_join" -> docQ("jo" -> js("join('-', tags)")),
    "fn_keys" -> docQ("ke" -> js("keys(o)")),
    "fn_values" -> docQ("va" -> js("values(o)")),
    "fn_length" -> docQ(
      "le1" -> jd("length(et)"), "le2" -> jd("length(arr)"), "le3" -> jd("length(o)")),
    "fn_map" -> docQ("ma" -> js("map(&x, objs)")),
    "fn_max" -> docQ("mx1" -> jd("max(arr)"), "mx2" -> js("max(tags)")),
    "fn_min" -> docQ("mn1" -> jd("min(arr)")),
    "fn_max_by" -> docQ("mb" -> jd("max_by(objs2, &k).v")),
    "fn_min_by" -> docQ("nb" -> jd("min_by(objs2, &k).v")),
    "fn_merge" -> docQ("me" -> js("merge(o, `{\"v\": -1}`)")),
    "fn_not_null" -> docQ("nn" -> jd("not_null(missing, arr[5], arr[1], arr[2])")),
    "fn_reverse" -> docQ("rv1" -> js("reverse(arr)"), "rv2" -> js("reverse(et)")),
    "fn_sort" -> docQ("so" -> js("sort(arr)")),
    "fn_sort_by" -> docQ("sb" -> js("sort_by(objs2, &k)[*].v")),
    "fn_sum" -> docQ("su1" -> jd("sum(arr)"), "su2" -> jd("sum(`[]`)")),
    "fn_to_array" -> docQ("ta1" -> js("to_array(arr[0])"), "ta2" -> js("to_array(arr)")),
    "fn_to_string" -> docQ("ts1" -> js("to_string(arr[0])"), "ts2" -> js("to_string(o)")),
    "fn_to_number" -> docQ(
      "tn1" -> jd("to_number(nstr)"), "tn2" -> js("to_number(et)").isNull),
    "fn_type" -> docQ(
      "ty" -> js("[type(@), type(arr), type(arr[0]), type(et), type(missing), type(`true`)]")),
  )

  val oracleSql: Map[String, String] = Map(
    "j3_index" -> o(
      "CAST(b AS DOUBLE) AS i1, CAST(c AS DOUBLE) AS i2, CAST(b AS DOUBLE) AS i3, TRUE AS oob_null"),
    "j4_slice" -> o(
      "'[' || a || ',' || c || ']' AS s1, '[' || b || ',' || c || ']' AS s2, " +
      "'[' || c || ',' || b || ',' || a || ']' AS s3, '[' || a || ',' || b || ']' AS s4"),
    "j5_projection" -> o(
      "'[' || a || ',' || c || ']' AS p1, '[' || b || ',' || a || ']' AS p2"),
    "j6_value_projection" -> o(
      "'[' || a || ',' || b || ']' AS v1, CAST(b AS DOUBLE) AS v2"),
    "j7_filter_projection" -> o(
      "'[' || concat_ws(',', CASE WHEN a>=3 THEN a END, CASE WHEN b>=3 THEN b END, CASE WHEN c>=3 THEN c END) || ']' AS f1, " +
      "'[' || concat_ws(',', CASE WHEN a>2 THEN a END, CASE WHEN c>2 THEN c END) || ']' AS f2"),
    "j8_flatten" -> o(
      "'[' || a || ',' || b || ',' || c || ']' AS fl1, " +
      "'[' || a || ',' || b || ',' || c || ']' AS fl2"),
    "j9_multiselect_list" -> o(
      "'[' || a || ',' || b || ',\"' || et || '\"]' AS m1"),
    "j10_multiselect_hash" -> o(
      "'{\"lo\":' || a || ',\"hi\":' || c || ',\"tag\":\"' || et || '\"}' AS h1"),
    "j11_comparators" -> o(
      "TRUE AS ceq, a <> b AS cne, a < b AS clt, a >= c AS cge, TRUE AS cstr_null"),
    "j12_or" -> o(
      "CAST(b AS DOUBLE) AS o1, CAST(a AS DOUBLE) AS o2, et AS o3"),
    "j13_and" -> o(
      "CAST(b AS DOUBLE) AS a1, '[]' AS a2, CAST(c AS DOUBLE) AS a3"),
    "j14_not" -> o(
      "CASE WHEN a > 4 THEN 'false' ELSE 'true' END AS n1, FALSE AS n2"),
    "j15_pipe" -> o(
      "CAST(b AS DOUBLE) AS pi1, CAST(c AS DOUBLE) AS pi2, CAST(a AS DOUBLE) AS pi3"),
    "j16_literal" -> o(
      "CAST(42 AS DOUBLE) AS l1, 'raw str' AS l2, CAST(2 AS DOUBLE) AS l3"),
    "j17_current_node" -> o(
      "CAST(a + b + c AS DOUBLE) AS cn1, CAST(c AS DOUBLE) AS cn2"),
    "j18_identity" -> o(s"$docSql AS id_doc"),

    "fn_abs" -> o("CAST(a + 1 AS DOUBLE) AS ab1, CAST(a AS DOUBLE) AS ab2"),
    "fn_avg" -> o("(a + b + c) / 3.0 AS av1"),
    "fn_ceil" -> o("CAST(a + 1 AS DOUBLE) AS ce1, CAST(a AS DOUBLE) AS ce2"),
    "fn_floor" -> o("CAST(a AS DOUBLE) AS flr1"),
    "fn_contains" -> o(
      "contains(et, 'ck') AS co1, (a = 3 OR b = 3 OR c = 3) AS co2"),
    "fn_starts_with" -> o("starts_with(et, 'p') AS sw"),
    "fn_ends_with" -> o("ends_with(et, 'w') AS ew"),
    "fn_join" -> o("'x' || a || '-y' || b AS jo"),
    "fn_keys" -> o("'[\"u\",\"v\"]' AS ke"),
    "fn_values" -> o("'[' || a || ',' || b || ']' AS va"),
    "fn_length" -> o(
      "CAST(length(et) AS DOUBLE) AS le1, CAST(3 AS DOUBLE) AS le2, CAST(2 AS DOUBLE) AS le3"),
    "fn_map" -> o("'[' || a || ',null,' || c || ']' AS ma"),
    "fn_max" -> o("CAST(greatest(a,b,c) AS DOUBLE) AS mx1, 'y' || b AS mx2"),
    "fn_min" -> o("CAST(least(a,b,c) AS DOUBLE) AS mn1"),
    "fn_max_by" -> o("CAST(CASE WHEN b*2+1 > a*2 THEN 2 ELSE 1 END AS DOUBLE) AS mb"),
    "fn_min_by" -> o("CAST(CASE WHEN b*2+1 < a*2 THEN 2 ELSE 1 END AS DOUBLE) AS nb"),
    "fn_merge" -> o("'{\"u\":' || a || ',\"v\":-1}' AS me"),
    "fn_not_null" -> o("CAST(b AS DOUBLE) AS nn"),
    "fn_reverse" -> o(
      "'[' || c || ',' || b || ',' || a || ']' AS rv1, reverse(et) AS rv2"),
    "fn_sort" -> o(
      "'[' || least(a,b,c) || ',' || (a+b+c-least(a,b,c)-greatest(a,b,c)) || ',' || greatest(a,b,c) || ']' AS so"),
    "fn_sort_by" -> o("CASE WHEN b*2+1 < a*2 THEN '[2,1]' ELSE '[1,2]' END AS sb"),
    "fn_sum" -> o("CAST(a + b + c AS DOUBLE) AS su1, CAST(0 AS DOUBLE) AS su2"),
    "fn_to_array" -> o(
      "'[' || a || ']' AS ta1, '[' || a || ',' || b || ',' || c || ']' AS ta2"),
    "fn_to_string" -> o(
      "CAST(a AS VARCHAR) AS ts1, '{\"u\":' || a || ',\"v\":' || b || '}' AS ts2"),
    "fn_to_number" -> o("CAST(a AS DOUBLE) AS tn1, TRUE AS tn2"),
    "fn_type" -> o(
      "'[\"object\",\"array\",\"number\",\"string\",\"null\",\"boolean\"]' AS ty"),
  )
}
