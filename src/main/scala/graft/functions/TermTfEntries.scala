package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in one native pass: for a token array,
  * emits `array<struct<term: string, tf: bigint>>` with one entry per
  * DISTINCT token (term-sorted, binary UTF8 order) and its occurrence
  * count — the exact multiset the previous
  * `explode(toks) → groupBy(doc_id, term).count()` stage produced, minus
  * its exchange (r19, guide §2.3/§2.4): every (doc_id, term) group lives
  * entirely inside its source row, so that shuffle moved corpus-sized
  * token pairs only to confirm counts partial aggregation had already
  * finished. With the counts emitted row-locally, the one remaining
  * per-term aggregation partial-aggregates to |vocab| rows per task
  * before its exchange. The CoocStructs posture: a hand-rolled generator
  * because higher-order functions evaluate their lambdas interpreted per
  * element. */
case class TermTfEntries(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(TermTfEntries.elementType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "term_tf_entries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.sql}")
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    var m = 0
    while (i < n) { // null tokens cannot occur from split(); drop defensively
      if (!arr.isNullAt(i)) { toks(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(toks, 0, m,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && toks(j).equals(toks(i))) j += 1
      out += InternalRow(toks(i), (j - i).toLong)
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("termTfEntries", this,
      classOf[TermTfEntries].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermTfEntries =
    copy(child = newChild)
}

object TermTfEntries {
  val elementType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false)))

  def termTfEntries(toks: Column): Column =
    bridge.column(TermTfEntries(bridge.expression(toks)))
}
