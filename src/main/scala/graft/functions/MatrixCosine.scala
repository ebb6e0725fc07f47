package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Cosine similarity of one embedding against EVERY row of a plan-baked
  * float matrix, in matrix order — the narrow half of the fused exact
  * bitext miner (`Similarity.bitextMine`): instead of a broadcast
  * nested-loop join materializing |src|·|tgt| joined rows (each copying
  * both embeddings into an UnsafeRow) and exploding 2 structs per pair
  * into an aggregation, ONE codegen'd per-row loop emits the full cosine
  * vector, and the two ranking directions read it without the matrix ever
  * becoming rows.
  *
  * Each slot is the IDENTICAL sequential fold of [[CosineSim]] (dot/normA/
  * normB accumulated per dimension, `sqrt(na)*sqrt(nb)` denominator) so
  * every value is bit-equal to the join-form's `cosine_sim` — the SQL
  * oracle is unchanged. An UNDEFINED slot (length mismatch, empty row,
  * zero norm — exactly [[CosineSim]]'s null cases) is NaN, which every
  * consumer's `score > bound` guard drops just as it dropped NULL; NaN
  * instead of NULL lets the vector return as
  * `UnsafeArrayData.fromPrimitiveArray` — at |src|=10⁴ legs the boxed
  * `GenericArrayData` form allocated 10⁸ `java.lang.Double`s per scan
  * (the r15 ScaleProbe constant) where this form allocates one primitive
  * array per row.
  *
  * Scale bound: the matrix ships with the plan (|rows|·dim·4 bytes), the
  * same driver-bounded posture as the `broadcast(src)` it replaces — the
  * exact miner is the DECLARED small-|src| baseline; `bitextMineIvf` is
  * the scale path. */
case class CosineSimsAll(child: Expression, mat: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sims_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>, got ${other.sql}")
  }

  def compute(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      out(r) = if (row.length == n && n != 0) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val xv = row(i).toDouble
          val yv = x.getFloat(i).toDouble
          dot += xv * yv; na += xv * xv; nb += yv * yv
          i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) Double.NaN else dot / denom
      } else Double.NaN
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cosineSimsAll", this, classOf[CosineSimsAll].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineSimsAll =
    copy(child = newChild)
}

/** Per-row top-k over a cosine vector aligned with a plan-baked id array:
  * returns `array<struct<id: bigint, score: double>>` ordered (score desc,
  * id asc) — [[TopKBuffer]] semantics, so NULL and NaN slots (and scores at
  * or below `minScoreExclusive`) never enter, exactly like [[NativeTopK]].
  * This is the BACKWARD direction of the fused bitext miner: each target
  * row's nearest sources fall out of its own cosine vector with no
  * aggregation at all. */
case class ArgTopKLit(child: Expression, ids: Array[Long], k: Int,
                      minScoreExclusive: Double = Double.NegativeInfinity)
    extends UnaryExpression {
  require(k >= 1, "top-k needs k >= 1")

  override def dataType: DataType =
    ArrayType(TopKBuffer.elementType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "arg_top_k_lit"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<DOUBLE>, got ${other.sql}")
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    require(n == ids.length,
      s"$prettyName: ${ids.length} ids but $n scores")
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getDouble(i)
        if (s > minScoreExclusive) buf.insert(ids(i), s)
      }
      i += 1
    }
    buf.toArrayData
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("argTopKLit", this, classOf[ArgTopKLit].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgTopKLit =
    copy(child = newChild)
}

object matrix {
  def cosineSimsAll(emb: Column, mat: Array[Array[Float]]): Column =
    bridge.column(CosineSimsAll(bridge.expression(emb), mat))
  def argTopKLit(scores: Column, ids: Array[Long], k: Int,
                 minScoreExclusive: Double = Double.NegativeInfinity): Column =
    bridge.column(ArgTopKLit(bridge.expression(scores), ids, k, minScoreExclusive))
}
