package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** The per-basket sufficient-statistic structs of `Assoc.coocCounts` in one
  * native pass: for a sorted distinct BIGINT item array, emits
  * `array<struct<a: bigint, b: bigint>>` holding every `{(a,b) : a < b}`
  * pair, one marginal per item (b NULL), and the basket marker (both
  * NULL) — the exact rows the previous
  * `concat(flatten(transform(…, transform(slice(…)))), …)` chain produced,
  * in the same order (AssocNativeSpec pins equality). The row KIND is a
  * bijection of the null pattern (items are non-null by construction —
  * collect_set drops nulls), so it is derived AFTER the count aggregation
  * instead of riding the ~1.7M-row exchange: the former tinyint tag
  * occupied a full 8-byte UnsafeRow slot and a third grouping column
  * (r19, guide §2.3 narrower shuffle keys). Higher-order functions
  * evaluate their lambdas interpreted per element; at ~1.7M emitted
  * structs over the sf0.1 lineitem baskets the lambda machinery was the
  * explosion's dominant cost. Long items only — [[graft.ext.Assoc]]
  * routes non-BIGINT item types through the HOF form. */
case class CoocStructs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(CoocStructs.elementType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cooc_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got ${other.sql}")
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // n ≤ maxBasketItems (the caller's skew cap), so n(n-1)/2 + n + 1 is small
    val out = new Array[Any](n * (n - 1) / 2 + n + 1)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, arr.getLong(j)); idx += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < n) {
      out(idx) = InternalRow(arr.getLong(i), null); idx += 1
      i += 1
    }
    out(idx) = InternalRow(null, null)
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("coocStructs", this, classOf[CoocStructs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CoocStructs =
    copy(child = newChild)
}

object CoocStructs {
  val elementType: StructType = StructType(Seq(
    StructField("a", LongType, nullable = true),
    StructField("b", LongType, nullable = true)))

  def coocStructs(items: Column): Column =
    bridge.column(CoocStructs(bridge.expression(items)))
}
