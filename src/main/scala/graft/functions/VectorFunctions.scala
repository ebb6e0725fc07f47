package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Vector / hashing expressions for the LLM-data-pipeline operators
  * (SURVEY.md §7 north-star extensions). All are native Catalyst expressions
  * with `doGenCode`, so they stay inside whole-stage codegen — no UDF
  * serialization, no boxing per row.
  */

/** Cosine similarity of two equal-length numeric arrays, computed in double
  * precision with a single sequential left-fold pass (deterministic — the
  * DuckDB oracle's double-cast `list_cosine_similarity` is bit-identical).
  * NULL when lengths differ, arrays are empty, or a norm is zero. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  private def getter(dt: DataType): String =
    if (dt.asInstanceOf[ArrayType].elementType == FloatType) "getFloat" else "getDouble"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    val lf = getter(left.dataType) == "getFloat"
    val rf = getter(right.dataType) == "getFloat"
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      val gx = getter(left.dataType); val gy = getter(right.dataType)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.$gx($i);
         |    double $yv = (double) $b.$gy($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Cosine similarity at several PREFIX lengths in ONE fold (the
  * Matryoshka-serving measurement, [[graft.ext.Similarity.mrlRecall]]): for
  * each requested prefix length d, the cosine of the first min(d, n)
  * elements — `Int.MaxValue` means the full length. One left-to-right
  * accumulation with checkpoints, so every returned value is bit-identical
  * to `CosineSim(slice(a, 1, d), slice(b, 1, d))` (same partial sums, same
  * division) while touching each element once instead of once per prefix
  * and allocating NO sliced arrays. NULL when lengths differ or the arrays
  * are empty (CosineSim's rule); a zero-norm prefix yields NaN in that slot
  * (the TopK aggregators' `score > bound` guard is false for NaN, so such a
  * pair can never enter a top-k — CosineSim's null slot behaves the same
  * way under any comparison). */
case class PrefixCosineSims(left: Expression, right: Expression, prefixes: Seq[Int])
    extends BinaryExpression {
  require(prefixes.nonEmpty && prefixes.forall(_ >= 1), "need positive prefix lengths")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_cosine_sims"

  /** Distinct checkpoint lengths in ascending fold order. */
  private val sorted: Array[Int] = prefixes.distinct.sorted.toArray
  /** Output slot j reads fold checkpoint slotOf(j). */
  private val slotOf: Array[Int] = prefixes.map(d => sorted.indexOf(d)).toArray

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    val c = sorted.length
    val dots = new Array[Double](c); val nas = new Array[Double](c); val nbs = new Array[Double](c)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var ck = 0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
      while (ck < c && sorted(ck) == i) { dots(ck) = dot; nas(ck) = na; nbs(ck) = nb; ck += 1 }
    }
    while (ck < c) { dots(ck) = dot; nas(ck) = na; nbs(ck) = nb; ck += 1 } // d >= n: full
    val out = new Array[Any](slotOf.length)
    var j = 0
    while (j < slotOf.length) {
      val s = slotOf(j)
      val denom = math.sqrt(nas(s)) * math.sqrt(nbs(s))
      out(j) = if (denom == 0.0) Double.NaN else dots(s) / denom
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sortedRef = ctx.addReferenceObj("prefixSorted", sorted, "int[]")
    val slotRef = ctx.addReferenceObj("prefixSlots", slotOf, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val ck = ctx.freshName("ck"); val c = ctx.freshName("c")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val dots = ctx.freshName("dots"); val nas = ctx.freshName("nas"); val nbs = ctx.freshName("nbs")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val out = ctx.freshName("out"); val s = ctx.freshName("s"); val denom = ctx.freshName("denom")
      val gx = if (isFloat(left.dataType)) "getFloat" else "getDouble"
      val gy = if (isFloat(right.dataType)) "getFloat" else "getDouble"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $c = $sortedRef.length;
         |  double[] $dots = new double[$c]; double[] $nas = new double[$c]; double[] $nbs = new double[$c];
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  int $ck = 0;
         |  for (int $i = 0; $i < $n; ) {
         |    double $xv = (double) $a.$gx($i);
         |    double $yv = (double) $b.$gy($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |    $i++;
         |    while ($ck < $c && $sortedRef[$ck] == $i) { $dots[$ck] = $dot; $nas[$ck] = $na; $nbs[$ck] = $nb; $ck++; }
         |  }
         |  while ($ck < $c) { $dots[$ck] = $dot; $nas[$ck] = $na; $nbs[$ck] = $nb; $ck++; }
         |  double[] $out = new double[$slotRef.length];
         |  for (int $j = 0; $j < $slotRef.length; $j++) {
         |    int $s = $slotRef[$j];
         |    double $denom = Math.sqrt($nas[$s]) * Math.sqrt($nbs[$s]);
         |    $out[$j] = ($denom == 0.0) ? Double.NaN : $dots[$s] / $denom;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PrefixCosineSims =
    copy(left = l, right = r)
}

/** 64-bit SimHash of a token array (near-dup fingerprint): per token, the
  * xxhash64 bits vote +1/-1 into 64 counters; the sign of each counter is the
  * output bit. Hamming distance between SimHashes approximates angular
  * distance between the documents' token-frequency vectors. */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  final val Seed = 42L
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** MinHash signature: array of `numHashes` minima of per-seed xxhash64 over
  * the input token/shingle set — one pass over the input for all seeds
  * (vs. numHashes separate `transform`+`array_min` passes in pure SQL). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, "numHashes in (0, 512]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def compute(tokens: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUTF8String(t, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct k-word shingles of a space-separated text, ascending binary
  * order. One pass over the UTF-8 bytes: a k-shingle re-joined with single
  * spaces equals the SOURCE SUBSTRING spanning tokens i..i+k−1 (the corpus
  * separator is a single 0x20, which can never occur inside a multi-byte
  * UTF-8 sequence), so each shingle is a byte-range slice — no per-token
  * allocation, no interpreted lambda tree. Replaces the
  * split→transform→slice→concat_ws→array_distinct pipeline, whose
  * interpreted higher-order evaluation dominated CPU in the near-dup
  * operators. Texts with fewer than k tokens yield the whole text (same
  * fallback as the SQL formulation). */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleArray.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(text: UTF8String, k: Int): ArrayData = {
    val nBytes = text.numBytes()
    // token start offsets (token i spans [starts(i), starts(i+1) - 1))
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    // Defensive copy: the input may point into a reused row/page buffer, so
    // neither the <k fallback nor the shingle slices may alias it. getBytes
    // copies UNLESS the string spans its entire backing array — in that case
    // (detected by base identity; clone() has the same hole) force the copy.
    // Exactly one copy either way; slices alias only the fresh owned array.
    val b0 = text.getBytes
    val bytes = if (b0.asInstanceOf[AnyRef] eq text.getBaseObject) b0.clone() else b0
    if (nTokens < k) return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes)))
    val seen = new java.util.HashSet[UTF8String]()
    val out = new java.util.ArrayList[UTF8String]()
    var t = 0
    while (t + k <= nTokens) {
      val from = starts.get(t)
      val until = if (t + k < nTokens) starts.get(t + k) - 1 else nBytes
      val slice = UTF8String.fromBytes(bytes, from, until - from)
      if (seen.add(slice)) out.add(slice)
      t += 1
    }
    val arr: Array[AnyRef] = out.toArray(new Array[UTF8String](out.size()))
      .asInstanceOf[Array[AnyRef]]
    java.util.Arrays.sort(arr,
      (a: AnyRef, b: AnyRef) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    new GenericArrayData(arr)
  }
}

/** Word k-grams of a text in ONE byte scan — the native twin of
  * `transform(sequence(1, size(w) - (k-1)), i => array_join(slice(w, i, k),
  * " "))` over `w = split(text, " ")` (Hygiene's `ngramsOf`), which
  * evaluates through INTERPRETED higher-order-function lambdas. Each gram
  * string equals the original BYTE SPAN from its first token's start to
  * its last token's end: split is on the single space byte, so rejoining
  * consecutive tokens with " " reproduces the span verbatim (empty tokens
  * from doubled spaces included) — no per-gram join/slice allocation, the
  * output strings are zero-copy views over one defensively-copied buffer.
  * Fewer than k tokens → EMPTY array (the `when(size(w) >= k, …)` guard's
  * shape — unlike [[ShingleArray]]'s whole-text fallback, and unsorted:
  * grams keep occurrence order). `distinct = true` keeps first occurrences
  * (the `array_distinct(ngramsOf(…))` composition). */
case class WordGrams(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.compute($c, $k, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(text: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val nBytes = text.numBytes()
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens < k) return new GenericArrayData(new Array[Any](0))
    // Defensive copy, the ShingleArray discipline: the input may point into
    // a reused row/page buffer and the output slices must not alias it.
    val b0 = text.getBytes
    val bytes = if (b0.asInstanceOf[AnyRef] eq text.getBaseObject) b0.clone() else b0
    val out = new java.util.ArrayList[UTF8String]()
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var t = 0
    while (t + k <= nTokens) {
      val from = starts.get(t)
      val until = if (t + k < nTokens) starts.get(t + k) - 1 else nBytes
      val slice = UTF8String.fromBytes(bytes, from, until - from)
      if (seen == null || seen.add(slice)) out.add(slice)
      t += 1
    }
    new GenericArrayData(
      out.toArray(new Array[UTF8String](out.size())).asInstanceOf[Array[AnyRef]])
  }
}

/** Length of the longest run of EQUAL strings after sorting — the modal
  * multiplicity of an array (how many times its most frequent element
  * appears), used by [[graft.ext.Hygiene.repetitionStats]]' modal-2-gram
  * fraction. The HOF form it replaces (`aggregate(array_sort(arr),
  * struct-fold)`) allocated a 3-field struct per element through an
  * interpreted lambda; this sorts token views (binary UTF8 order, same as
  * `array_sort`) and scans once. Empty array → 0 (the fold's zero). */
case class ModalRunLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "modal_run_length"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ModalRunLength.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ModalRunLength.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): ModalRunLength =
    copy(child = newChild)
}

object ModalRunLength {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) { a(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    var best = 1L; var run = 1L
    i = 1
    while (i < n) {
      if (a(i) == a(i - 1) || a(i).equals(a(i - 1))) { run += 1; if (run > best) best = run }
      else run = 1L
      i += 1
    }
    best
  }
}

/** xxhash64 of every n-gram of a token ARRAY in one pass — the native
  * twin of `transform(sequence(1, size(t) - (n-1)), i =>
  * xxhash64(concat_ws("", slice(t, i, n))))` ([[graft.ext.Quality
  * .bleuCorpus]]'s gram keying), which allocated the joined gram STRING
  * per gram through interpreted lambdas before hashing it. Bit-compatible:
  * the hash input is the gram's tokens joined by 0x01 (built once in a
  * reused scratch buffer), seed 42 (single-arg `xxhash64`). Fewer than n
  * tokens → empty (the `when(size(t) < n, …)` guard); duplicates kept in
  * order (the counts downstream need multiplicity). */
case class ArrayGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_gram_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ArrayGramHashes.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayGramHashes.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ArrayGramHashes =
    copy(child = newChild)
}

object ArrayGramHashes {
  import org.apache.spark.unsafe.types.UTF8String
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 12))

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(new Array[Long](0))
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](len - n + 1)
    var buf = scratch.get()
    var t = 0
    while (t + n <= len) {
      var need = n - 1
      var j = 0
      while (j < n) { need += toks(t + j).numBytes(); j += 1 }
      if (buf.length < need) { // grow ≥2×, overflow-safe for huge grams
        buf = new Array[Byte](math.max(need, math.min(buf.length.toLong * 2,
          Int.MaxValue - 8L).toInt))
        scratch.set(buf)
      }
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = 0x01; off += 1 }
        val tok = toks(t + j)
        tok.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += tok.numBytes()
        j += 1
      }
      out(t) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, off, 42L)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document term-frequency vector over a FIXED term list, plus the
  * document length, in ONE byte scan — the retrieval scoring primitive
  * ([[graft.ext.Retrieval]]): slot i (1-based) counts occurrences of
  * `terms(i-1)` among the NON-EMPTY whitespace tokens (the
  * `filter(split(text, " "), length > 0)` tokenization), and the LAST
  * slot is the non-empty token count (BM25's dl). Replaces a
  * `size(filter(toks, x === term))` scan per query term per document —
  * interpreted closures, O(tokens · terms) — with one tokenize +
  * hash-lookup pass. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  // terms MAY be empty (ADVICE r14 #5): the vector degenerates to the one
  // dl slot, and the retrieval rankers fall through to their historical
  // empty-result shape instead of an IllegalArgumentException
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  @transient private lazy val termMap = TermCounts.buildMap(terms)
  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      termMap, terms.length)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("termMap", termMap,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermCounts.compute($c, $mapRef, ${terms.length})")
  }
  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  import org.apache.spark.unsafe.types.UTF8String
  def buildMap(terms: Seq[String]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) => m.put(UTF8String.fromString(t), i) }
    m
  }
  def compute(text: UTF8String,
              termMap: java.util.HashMap[UTF8String, Integer],
              nTerms: Int): ArrayData = {
    val nBytes = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val counts = new Array[Long](nTerms + 1)
    var tokStart = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || text.getByte(i) == ' '.toByte) {
        if (i > tokStart) { // non-empty token
          counts(nTerms) += 1
          // transient zero-copy view — used only for the map probe
          val idx = termMap.get(UTF8String.fromAddress(base, off + tokStart, i - tokStart))
          if (idx != null) counts(idx) += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** GloVe windowed co-occurrence pairs ([[graft.ext.TextAnalysis
  * .cooccurrence]]) in ONE native pass — replaces the nested
  * flatten/transform HOF explosion (interpreted closures and an
  * element_at per pair). For every token position i and distance
  * d ∈ [1, window] with i+d in range: the canonically-ordered pair
  * (min, max by binary UTF8 order — Spark's string comparison) and the
  * integer-scaled GloVe weight `scale / d`. Output order is (i asc,
  * d asc), exactly the flattened HOF order; strings are zero-copy views
  * over one defensively-copied buffer. Fewer than 2 tokens → empty. */
case class CoocPairs(child: Expression, window: Int, scale: Long)
    extends UnaryExpression {
  require(window >= 1, "window must be positive")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("ws", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cooc_pairs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    CoocPairs.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CoocPairs.compute($c, $window, ${scale}L)")
  override protected def withNewChildInternal(newChild: Expression): CoocPairs =
    copy(child = newChild)
}

object CoocPairs {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(text: UTF8String, window: Int, scale: Long): ArrayData = {
    val nBytes = text.numBytes()
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens < 2) return new GenericArrayData(new Array[Any](0))
    val b0 = text.getBytes
    val bytes = if (b0.asInstanceOf[AnyRef] eq text.getBaseObject) b0.clone() else b0
    val toks = new Array[UTF8String](nTokens)
    var t = 0
    while (t < nTokens) {
      val from = starts.get(t)
      val until = if (t + 1 < nTokens) starts.get(t + 1) - 1 else nBytes
      toks(t) = UTF8String.fromBytes(bytes, from, until - from)
      t += 1
    }
    var nPairs = 0L
    var p = 0
    while (p < nTokens - 1) { nPairs += math.min(window, nTokens - 1 - p); p += 1 }
    val out = new Array[Any](nPairs.toInt)
    var j = 0
    var a = 0
    while (a < nTokens - 1) {
      var d = 1
      val dMax = math.min(window, nTokens - 1 - a)
      while (d <= dMax) {
        val x = toks(a); val y = toks(a + d)
        val (lo, hi) = if (x.compareTo(y) <= 0) (x, y) else (y, x)
        out(j) = org.apache.spark.sql.catalyst.InternalRow(lo, hi, scale / d)
        j += 1; d += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}

/** Adjacent-window lexical cosines for semantic chunking
  * ([[graft.ext.TextAnalysis.semanticBoundaries]]) in ONE native pass —
  * replaces a per-joint interpreted HOF chain that recounted each distinct
  * word with a `size(filter(...))` scan (O(window²) closure calls per
  * joint). Windows are fixed `window`-token slices (last one may be
  * short); for each adjacent pair the dot and squared norms are INTEGER
  * sums of per-token counts (order-independent — bit-exactness needs no
  * fold discipline) and the cosine is the fixed chain
  * `dot / (√n1 · √n2)` with the zero-norm → 0.0 guard. Returns
  * `array<struct<boundary_tok: bigint, cos: double>>`; documents of
  * ≤ window tokens → empty (the `where(size(w) > window)` shape). */
case class WindowBoundaryCos(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 2, "window must be at least 2 tokens")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("boundary_tok", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "window_boundary_cos"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WindowBoundaryCos.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowBoundaryCos.compute($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): WindowBoundaryCos =
    copy(child = newChild)
}

object WindowBoundaryCos {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(text: UTF8String, window: Int): ArrayData = {
    val nBytes = text.numBytes()
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens <= window) return new GenericArrayData(new Array[Any](0))
    // token views over one defensive copy (map keys outlive the loop)
    val b0 = text.getBytes
    val bytes = if (b0.asInstanceOf[AnyRef] eq text.getBaseObject) b0.clone() else b0
    def token(t: Int): UTF8String = {
      val from = starts.get(t)
      val until = if (t + 1 < nTokens) starts.get(t + 1) - 1 else nBytes
      UTF8String.fromBytes(bytes, from, until - from)
    }
    def countsOf(from: Int, until: Int): java.util.HashMap[UTF8String, Long] = {
      val m = new java.util.HashMap[UTF8String, Long]()
      var t = from
      while (t < until) { m.merge(token(t), 1L, (a, b) => a + b); t += 1 }
      m
    }
    val nWin = math.ceil(nTokens / window.toDouble).toInt
    val out = new Array[Any](nWin - 1)
    var prev = countsOf(0, math.min(window, nTokens))
    var j = 1
    while (j < nWin) {
      val cur = countsOf(j * window, math.min((j + 1) * window, nTokens))
      var dot = 0L; var n1 = 0L; var n2 = 0L
      val it1 = prev.values().iterator()
      while (it1.hasNext) { val c = it1.next(); n1 += c * c }
      val it2 = cur.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val c2 = e.getValue
        n2 += c2 * c2
        val c1 = prev.get(e.getKey)
        if (c1 != null) dot += c1 * c2
      }
      val cos = if (n1 == 0L || n2 == 0L) 0.0
        else dot.toDouble / (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble))
      out(j - 1) = org.apache.spark.sql.catalyst.InternalRow((j.toLong) * window, cos)
      prev = cur
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003) in ONE
  * native pass — the fused twin of [[graft.ext.TextAnalysis.winnow]]'s
  * interpreted chain (word k-grams via HOF concat, per-gram
  * `conv(substring(sha2(g, 256), 1, 8), 16, 10)` — a 64-char hex STRING
  * allocated and re-parsed per gram — then an O(n·w) nested-aggregate
  * argmin per window). Bit-compatible by construction: gram strings are
  * the byte spans [[WordGrams]] proves equal to the joined-token form, the
  * hash is the first 4 sha256 bytes as an unsigned 32-bit value (≡ first
  * 8 hex chars parsed base-16), selection order (hash ASC, pos DESC) —
  * min hash, rightmost on ties — as an explicit two-field comparison,
  * exact at any document length (ADVICE r14 #2: the packed `h·2²⁰ − pos`
  * key this replaces lost uniqueness past 2²⁰ grams; under that bound
  * the two select identically, which keeps the SQL oracle's packed-key
  * mirror valid on the gate corpora), windows of `w` keys, selected
  * positions deduplicated in first-window order. The per-window argmin here is a
  * monotonic deque — O(n) total, not O(n·w). Returns
  * `array<struct<pos: bigint, fp: bigint>>`; fewer than w+k−1 tokens →
  * empty (no full window exists). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "gram size and window must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.unsafe.types.UTF8String
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nBytes = text.numBytes()
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    val nGrams = nTokens - k + 1
    if (nGrams < w) return new GenericArrayData(new Array[Any](0))
    val bytes = text.getBytes // hashing only — aliasing a reused buffer is fine
    val md = digests.get()
    // h(g) = first 4 sha256 bytes unsigned (== conv(substring(hex,1,8),16,10))
    val hs = new Array[Long](nGrams)
    var t = 0
    while (t < nGrams) {
      val from = starts.get(t)
      val until = if (t + k < nTokens) starts.get(t + k) - 1 else nBytes
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      hs(t) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      t += 1
    }
    // selection order: (hash ASC, pos DESC) as an explicit TWO-FIELD
    // comparison — exact and unique at ANY document length (ADVICE r14
    // #2: the replaced packed key h·2²⁰ − pos broke ordering once
    // positions crossed the 2²⁰ stride, ~1M tokens; for documents under
    // that bound the two forms select identically, so the SQL oracle's
    // packed-key mirror is unchanged on the gate corpora)
    @inline def less(a: Int, b: Int): Boolean =
      hs(a) < hs(b) || (hs(a) == hs(b) && a > b)
    // monotonic deque sliding-window min (keys are unique, so the min is
    // the same element the left-to-right strict-< fold selected)
    val deque = new java.util.ArrayDeque[Int]()
    val selected = new java.util.LinkedHashSet[Integer]()
    var p = 0
    while (p < nGrams) {
      while (!deque.isEmpty && less(p, deque.peekLast())) deque.pollLast()
      deque.addLast(p)
      if (deque.peekFirst() <= p - w) deque.pollFirst()
      if (p >= w - 1) selected.add(deque.peekFirst())
      p += 1
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) {
      val pos = it.next().intValue()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(pos.toLong, hs(pos))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram hashes of a text in ONE byte scan — the native
  * twin of `array_distinct(transform(sequence(1, size(w) - (n-1)), i =>
  * xxhash64(element_at(w, i), …, element_at(w, i+n-1))))` over
  * `w = split(text, " ")`, which evaluates through INTERPRETED
  * higher-order-function lambdas (no codegen, one closure call per word
  * per gram — the measured constant on the source_overlap corpus pass).
  * Bit-compatible by construction: tokens are the byte spans between
  * 0x20 bytes (split-with-negative-limit semantics, empty tokens kept at
  * both ends), each gram's hash is the chained XXH64 Spark's multi-arg
  * `xxhash64` computes (seed 42, each word hashed with the previous
  * hash as seed), distinct keeps first occurrence. Fewer than n tokens →
  * empty array (the `when(size(w) >= n, …)` guard's shape). */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGramHashes.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

object WordGramHashes {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(text: UTF8String, n: Int): ArrayData = {
    val nBytes = text.numBytes()
    // token start offsets (token i spans [starts(i), starts(i+1) - 1))
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < nBytes) {
      if (text.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens < n) return new GenericArrayData(new Array[Long](0))
    // hash word byte-spans IN PLACE off the string's backing buffer
    // (XXH64 only reads), chaining like Spark's multi-arg xxhash64 —
    // hashUTF8String(s, seed) is hashUnsafeBytes over s's span
    val base = text.getBaseObject
    val off = text.getBaseOffset
    def tokenEnd(t: Int): Int = if (t + 1 < nTokens) starts.get(t + 1) - 1 else nBytes
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var t = 0
    while (t + n <= nTokens) {
      var h = 42L
      var j = 0
      while (j < n) {
        val from = starts.get(t + j)
        h = XXH64.hashUnsafeBytes(base, off + from, tokenEnd(t + j) - from, h)
        j += 1
      }
      seen.add(h)
      t += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** Membership probe of a 64-bit key against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (the public sketch API —
  * `DataFrameStatFunctions.bloomFilter` builds one distributed). The filter
  * ships to executors ONCE as the expression's byte payload and is
  * deserialized lazily per task thread; the probe itself stays inside
  * whole-stage codegen. No false negatives (a key that was inserted always
  * probes true), so `NOT bloom_might_contain(...)` is a sound
  * "definitely new" scan-time filter — the pruning half of the exact
  * bloom-then-verify dedup in [[graft.ext.Dedup.bloomNewDocs]]. */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT (a 64-bit key), got ${dt.sql}")
  }
  @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bf.mightContainLong(input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}


/** Length of the longest common subsequence of two token arrays — the
  * statistic behind ROUGE-L (Lin 2004 §3.1). Classic two-row O(n·m) DP in
  * a static helper shared by interpreted eval and generated code (the
  * [[SimHash]] pattern); per-row state is min(n,m)+1 ints. NULL elements
  * match nothing (each is treated as unequal to everything, including
  * another NULL — the conservative eval-metric reading). */
case class LcsLength(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsLength.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcsLength =
    copy(left = l, right = r)
}

object LcsLength {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    // iterate the LONGER side outer so the DP rows are min(n, m)+1 wide
    val (outer, inner, oLen, iLen) =
      if (n >= m) (a, b, n, m) else (b, a, m, n)
    var prev = new Array[Long](iLen + 1)
    var cur = new Array[Long](iLen + 1)
    var i = 0
    while (i < oLen) {
      val oNull = outer.isNullAt(i)
      val ov = if (oNull) null else outer.getUTF8String(i)
      var j = 0
      while (j < iLen) {
        val matches = !oNull && !inner.isNullAt(j) &&
          ov.equals(inner.getUTF8String(j))
        cur(j + 1) =
          if (matches) prev(j) + 1L
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      cur(0) = 0L
      i += 1
    }
    prev(iLen)
  }
}

/** Per-order character-n-gram multiset statistics for chrF (Popović 2015):
  * for n = 1..`maxN`, the triple (matched, cand_total, ref_total) of the
  * two strings' char-n-gram multisets, flattened to a 3·maxN long array
  * `[m1, ct1, rt1, m2, ct2, rt2, …]`. Candidate and reference live in the
  * SAME row, so the intersection is row-local JVM compute — this replaces
  * a gram-explode + corpus-wide full-outer join that shuffled ~len·maxN
  * rows per document per side (measured 17 s vs the oracle's 1.2 s at
  * sf0.1; this shape is one scan, zero exchanges).
  *
  * Grams are 64-bit FNV-1a hashes over CODE POINTS (substr-by-character
  * semantics, matching the oracle's slice-by-character); per order the
  * two hash arrays are sorted and merge-counted — a multiset intersection
  * with primitive-array constants and no collision-chain bookkeeping. A
  * hash collision only perturbs one count and the driver oracle would
  * catch it (the established gram-hashing discipline). NULL on either
  * side → NULL (the column layer coalesces and filters). */
case class ChrfStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chrf_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if maxN >= 1 && maxN <= 8 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (STRING, STRING) with 1 <= maxN <= 8, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}, maxN = $maxN")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ChrfStats.compute(a.toString, b.toString, maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ChrfStats.compute($a.toString(), $b.toString(), $maxN)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChrfStats =
    copy(left = l, right = r)
}

object ChrfStats {
  /** FNV-1a over the code-point window [i, i+n). Recomputed per window —
    * O(len·maxN²) total, bounded by document length, cheaper than rolling
    * for maxN <= 8. */
  private def gramHash(cps: Array[Int], i: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var k = i
    val end = i + n
    while (k < end) { h = (h ^ cps(k)) * 0x100000001b3L; k += 1 }
    h
  }

  /** Sort-and-merge multiset intersection of two pre-hashed gram arrays
    * (destructive: sorts its inputs). */
  private[functions] def merged(ha: Array[Long], hb: Array[Long]): Long = {
    java.util.Arrays.sort(ha)
    java.util.Arrays.sort(hb)
    var m = 0L; var x = 0; var y = 0
    while (x < ha.length && y < hb.length) {
      val c = java.lang.Long.compare(ha(x), hb(y))
      if (c < 0) x += 1
      else if (c > 0) y += 1
      else { m += 1L; x += 1; y += 1 }
    }
    m
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(aS: String, bS: String, maxN: Int): ArrayData = {
    val a = aS.codePoints().toArray
    val b = bS.codePoints().toArray
    val out = new Array[Long](3 * maxN)
    var n = 1
    while (n <= maxN) {
      val ct = math.max(0, a.length - n + 1)
      val rt = math.max(0, b.length - n + 1)
      var m = 0L
      if (ct > 0 && rt > 0) {
        val ha = new Array[Long](ct)
        val hb = new Array[Long](rt)
        var i = 0
        while (i < ct) { ha(i) = gramHash(a, i, n); i += 1 }
        i = 0
        while (i < rt) { hb(i) = gramHash(b, i, n); i += 1 }
        m = merged(ha, hb)
      }
      val o = 3 * (n - 1)
      out(o) = m; out(o + 1) = ct.toLong; out(o + 2) = rt.toLong
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** [[ChrfStats]]'s twin over TOKEN arrays: per-order word-n-gram multiset
  * statistics `[m1, ct1, rt1, …]` for n = 1..maxN — the word-order half
  * of chrF++ (Popović 2017). Same row-local sort-merge discipline; token
  * n-grams hash as an order-sensitive polynomial over per-token FNV-1a
  * hashes. NULL tokens hash as the empty token (they cannot collide with
  * real text; Spark's split() never yields null elements anyway). */
case class TokenGramStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_stats"
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType) && maxN >= 1 && maxN <= 8)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, ARRAY<STRING>) with 1 <= maxN <= 8, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}, maxN = $maxN")
  override def nullSafeEval(a: Any, b: Any): Any =
    TokenGramStats.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TokenGramStats.compute($a, $b, $maxN)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenGramStats =
    copy(left = l, right = r)
}

object TokenGramStats {
  private def tokenHashes(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) 0xcbf29ce484222325L
        else {
          val s = a.getUTF8String(i).toString
          var h = 0xcbf29ce484222325L
          var k = 0
          while (k < s.length) { h = (h ^ s.charAt(k)) * 0x100000001b3L; k += 1 }
          h
        }
      i += 1
    }
    out
  }

  private def windowHash(th: Array[Long], i: Int, n: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var k = i
    val end = i + n
    while (k < end) { h = h * 0xff51afd7ed558ccdL + th(k); k += 1 }
    h
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(aArr: ArrayData, bArr: ArrayData, maxN: Int): ArrayData = {
    val a = tokenHashes(aArr)
    val b = tokenHashes(bArr)
    val out = new Array[Long](3 * maxN)
    var n = 1
    while (n <= maxN) {
      val ct = math.max(0, a.length - n + 1)
      val rt = math.max(0, b.length - n + 1)
      var m = 0L
      if (ct > 0 && rt > 0) {
        val ha = new Array[Long](ct)
        val hb = new Array[Long](rt)
        var i = 0
        while (i < ct) { ha(i) = windowHash(a, i, n); i += 1 }
        i = 0
        while (i < rt) { hb(i) = windowHash(b, i, n); i += 1 }
        m = ChrfStats.merged(ha, hb)
      }
      val o = 3 * (n - 1)
      out(o) = m; out(o + 1) = ct.toLong; out(o + 2) = rt.toLong
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API entry points. */
object vectors {
  def cosineSim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))
  def prefixCosineSims(a: Column, b: Column, prefixes: Seq[Int]): Column =
    bridge.column(PrefixCosineSims(bridge.expression(a), bridge.expression(b), prefixes))
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash(bridge.expression(tokens)))
  def minhashSig(tokens: Column, numHashes: Int): Column =
    bridge.column(MinHashSig(bridge.expression(tokens), numHashes))
  def shingleArray(text: Column, k: Int): Column =
    bridge.column(ShingleArray(bridge.expression(text), k))
  def wordGramHashes(text: Column, n: Int): Column =
    bridge.column(WordGramHashes(bridge.expression(text), n))
  def wordGrams(text: Column, k: Int, distinct: Boolean = false): Column =
    bridge.column(WordGrams(bridge.expression(text), k, distinct))
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    bridge.column(WinnowFingerprints(bridge.expression(text), k, w))
  def windowBoundaryCos(text: Column, window: Int): Column =
    bridge.column(WindowBoundaryCos(bridge.expression(text), window))
  def coocPairs(text: Column, window: Int, scale: Long): Column =
    bridge.column(CoocPairs(bridge.expression(text), window, scale))
  def termCounts(text: Column, terms: Seq[String]): Column =
    bridge.column(TermCounts(bridge.expression(text), terms))
  def arrayGramHashes(arr: Column, n: Int): Column =
    bridge.column(ArrayGramHashes(bridge.expression(arr), n))
  def modalRunLength(arr: Column): Column =
    bridge.column(ModalRunLength(bridge.expression(arr)))
  def bloomMightContain(bloomBytes: Array[Byte], key: Column): Column =
    bridge.column(BloomMightContain(bloomBytes, bridge.expression(key)))
  def lcsLength(a: Column, b: Column): Column =
    bridge.column(LcsLength(bridge.expression(a), bridge.expression(b)))
  def chrfStats(cand: Column, ref: Column, maxN: Int): Column =
    bridge.column(ChrfStats(bridge.expression(cand), bridge.expression(ref), maxN))
  def tokenGramStats(cand: Column, ref: Column, maxN: Int): Column =
    bridge.column(TokenGramStats(bridge.expression(cand), bridge.expression(ref), maxN))
}
