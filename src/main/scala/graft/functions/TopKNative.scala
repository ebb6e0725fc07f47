package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native top-k aggregation state: `k`-bounded arrays of primitive
  * `(id: Long, score: Double)` pairs kept sorted by (score desc, id asc).
  *
  * This is the buffer behind [[NativeTopK]] / [[NativeMultiTopK]], the
  * `TypedImperativeAggregate` replacements for the typed-`Aggregator` UDAFs
  * (`graft.ext.TopKAgg` / `graft.ext.MultiTopKAgg`, retained as the
  * differential reference): the UDAF route deserializes every input row into
  * a `Scored` case object and re-encodes the whole `Seq[Scored]` buffer per
  * row — ~4M encoder round-trips on the bitext sim matrix — where this
  * buffer is two primitive arrays, one branch, and (amortized) one
  * `System.arraycopy` per accepted row, with NO per-row allocation on the
  * reject fast path (the common case once the buffer has warmed: a candidate
  * not beating the current k-th is dropped on one comparison).
  *
  * Ordering, tie, and bound semantics are EXACTLY the UDAF's, pinned by
  * `NativeTopKSpec`:
  *   - rank by (score desc, id asc) with `java.lang.Double.compare`, so
  *     `0.0` ranks above `-0.0` just as the `Ordering.by(-score)` key did;
  *   - an input enters only if `score > minScoreExclusive` — NaN (and
  *     -Infinity at the default bound) fail this guard and never enter;
  *   - ties insert AFTER existing equals (the stable-sort rule), so a
  *     candidate equal to the current k-th of a full buffer is dropped.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  /** <0 iff (s1,i1) ranks strictly before (s2,i2): score desc, id asc. */
  @inline private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = java.lang.Double.compare(s2, s1)
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  def insert(id: Long, score: Double): Unit = {
    if (n == k) {
      // not strictly better than the current worst → drop (stable-tie rule)
      if (k == 0 || cmp(score, id, scores(n - 1), ids(n - 1)) >= 0) return
      n -= 1
    }
    // upper bound: first slot whose element ranks strictly after the input
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(scores(mid), ids(mid), score, id) <= 0) lo = mid + 1 else hi = mid
    }
    System.arraycopy(ids, lo, ids, lo + 1, n - lo)
    System.arraycopy(scores, lo, scores, lo + 1, n - lo)
    ids(lo) = id; scores(lo) = score
    n += 1
  }

  /** Stable two-pointer merge (this side wins ties — the `(a ++ b).sorted`
    * rule of the UDAF it replaces), truncated at k, into a fresh buffer. */
  def mergedWith(b: TopKBuffer): TopKBuffer = {
    val out = new TopKBuffer(k)
    var i = 0; var j = 0
    while (out.n < k && (i < n || j < b.n)) {
      val takeA = j >= b.n ||
        (i < n && cmp(scores(i), ids(i), b.scores(j), b.ids(j)) <= 0)
      if (takeA) { out.ids(out.n) = ids(i); out.scores(out.n) = scores(i); i += 1 }
      else { out.ids(out.n) = b.ids(j); out.scores(out.n) = b.scores(j); j += 1 }
      out.n += 1
    }
    out
  }

  def writeTo(bb: ByteBuffer): Unit = {
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
  }

  def byteSize: Int = 4 + n * 16

  def toArrayData: ArrayData = {
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) { rows(i) = InternalRow(ids(i), scores(i)); i += 1 }
    new GenericArrayData(rows)
  }
}

object TopKBuffer {
  val elementType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  def readFrom(bb: ByteBuffer, k: Int): TopKBuffer = {
    val buf = new TopKBuffer(k)
    buf.n = bb.getInt()
    var i = 0
    while (i < buf.n) { buf.ids(i) = bb.getLong(); buf.scores(i) = bb.getDouble(); i += 1 }
    buf
  }
}

/** Distributed top-k per group as a NATIVE `TypedImperativeAggregate` over
  * `array<struct<id: bigint, score: double>>` — partial aggregation reduces
  * every input partition to ≤ k rows per group BEFORE the shuffle (the
  * `ObjectHashAggregateExec` partial+final pair the PlanSpec pins), and the
  * buffer is primitive arrays serialized as one `binary` blob, not a typed
  * Scala object crossing the encoder boundary per input row.
  *
  * Null semantics (a deliberate strengthening over the UDAF it replaces,
  * whose `Scored` deserializer threw on a NULL score): a NULL id or score
  * simply does not enter the buffer — a zero-norm embedding's NULL cosine
  * ranks nowhere instead of failing the job. Spec-pinned.
  */
case class NativeTopK(
    left: Expression,
    right: Expression,
    k: Int,
    minScoreExclusive: Double = Double.NegativeInfinity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 1, "top-k needs k >= 1")

  override def prettyName: String = "native_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(TopKBuffer.elementType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT id, DOUBLE score), got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idv = left.eval(input)
    if (idv != null) {
      val scv = right.eval(input)
      if (scv != null) {
        val s = scv.asInstanceOf[Double]
        // NaN fails the > guard, exactly as the UDAF's bound check did
        if (s > minScoreExclusive) buf.insert(idv.asInstanceOf[Long], s)
      }
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = a.mergedWith(b)

  override def eval(buf: TopKBuffer): Any = buf.toArrayData

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.byteSize)
    buf.writeTo(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.readFrom(ByteBuffer.wrap(bytes), k)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeTopK =
    copy(left = newLeft, right = newRight)
}

/** [[NativeTopK]] for `legs` parallel rankings of the same candidate stream
  * in ONE aggregation state (the `mrl_recall` fusion): leg i maintains its
  * own top-k over `scores(i)`. One buffer, one binary blob, ≤ legs·k rows
  * per partition cross the wire. A NULL or NaN slot never enters its leg
  * (the `PrefixCosineSims` zero-norm slot is NaN by design). */
case class NativeMultiTopK(
    left: Expression,
    right: Expression,
    k: Int,
    legs: Int,
    minScoreExclusive: Double = Double.NegativeInfinity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[TopKBuffer]] with BinaryLike[Expression] {

  require(k >= 1 && legs >= 1, "multi top-k needs k >= 1 and legs >= 1")

  override def prettyName: String = "native_multi_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(TopKBuffer.elementType, containsNull = false),
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(DoubleType, _) if left.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT id, ARRAY<DOUBLE> scores), got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def createAggregationBuffer(): Array[TopKBuffer] =
    Array.fill(legs)(new TopKBuffer(k))

  override def update(bufs: Array[TopKBuffer], input: InternalRow): Array[TopKBuffer] = {
    val idv = left.eval(input)
    if (idv != null) {
      val arrv = right.eval(input)
      if (arrv != null) {
        val arr = arrv.asInstanceOf[ArrayData]
        require(arr.numElements() == legs,
          s"$prettyName: expected $legs score slots, got ${arr.numElements()}")
        val id = idv.asInstanceOf[Long]
        var i = 0
        while (i < legs) {
          if (!arr.isNullAt(i)) {
            val s = arr.getDouble(i)
            if (s > minScoreExclusive) bufs(i).insert(id, s)
          }
          i += 1
        }
      }
    }
    bufs
  }

  override def merge(a: Array[TopKBuffer], b: Array[TopKBuffer]): Array[TopKBuffer] = {
    val out = new Array[TopKBuffer](legs)
    var i = 0
    while (i < legs) { out(i) = a(i).mergedWith(b(i)); i += 1 }
    out
  }

  override def eval(bufs: Array[TopKBuffer]): Any =
    new GenericArrayData(bufs.map(_.toArrayData: Any))

  override def serialize(bufs: Array[TopKBuffer]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufs.map(_.byteSize).sum)
    bufs.foreach(_.writeTo(bb))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[TopKBuffer] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(legs)(TopKBuffer.readFrom(bb, k))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeMultiTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeMultiTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeMultiTopK =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native top-k aggregates. The casts are
  * no-ops when inputs already are BIGINT / DOUBLE (Catalyst elides them). */
object topk {
  def topK(k: Int, minScoreExclusive: Double = Double.NegativeInfinity)
      : (Column, Column) => Column =
    (id, score) => bridge.column(NativeTopK(
      bridge.expression(id.cast("long")),
      bridge.expression(score.cast("double")),
      k, minScoreExclusive).toAggregateExpression())

  def multiTopK(k: Int, legs: Int,
                minScoreExclusive: Double = Double.NegativeInfinity)
      : (Column, Column) => Column =
    (id, scores) => bridge.column(NativeMultiTopK(
      bridge.expression(id.cast("long")),
      bridge.expression(scores),
      k, legs, minScoreExclusive).toAggregateExpression())
}
