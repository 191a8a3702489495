package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst kernels for the fixed-point vector math the
 * similarity/dedup plane previously expressed with built-in
 * higher-order functions (`aggregate(zip_with(...))`,
 * `array_min(transform(...))`). The HOF forms are correct but evaluate
 * their lambdas INTERPRETED, PER ELEMENT — a 64-d squared distance is
 * 64 boxed lambda invocations plus a materialized zip array per row
 * (and the PQ encode was 8×16 of those per row). Each kernel below is
 * the IDENTICAL arithmetic — same operand order, same integer ops,
 * same IEEE double fold order, same tie-breaking — in one tight JVM
 * loop per row, so every query that switches over returns
 * bit-identical results (pinned by VectorKernelsSpec, which asserts
 * equality against the original HOF expression on randomized inputs,
 * including the null/length-mismatch edge semantics).
 *
 * Null semantics mirror the HOF originals:
 * `aggregate(zip_with(a, b, f), 0, +)` yields NULL when the lengths
 * differ (zip_with pads with null and the sum absorbs it) or when any
 * element is null — so do [[SqDistFp]] / [[DotFp]] / [[CosineFd]].
 * `transform` maps null elements to null — so do [[FixedPoint1e6]] and
 * [[Sq8Encode]]. Two DELIBERATE divergences, both unreachable from the
 * operators (embeddings are non-null fixed-width arrays, fixed-pointed
 * at ~1e6 so every sum fits a long): (a) the argmin family
 * ([[ArgminCell]]/[[ProbeCells]]/[[PqEncode]]/[[PqAdc]]) returns NULL
 * for a null element or width mismatch, where the HOF form fell into
 * null-field struct ordering (array_min over a struct with a null `d`
 * — an accident, not a contract); (b) arithmetic is unchecked JVM
 * (wrapping), where ANSI mode threw on overflow — in-range inputs are
 * bit-identical, out-of-range inputs were never valid.
 * Model-state operands (codebooks, centroids, quantizer ranges) are
 * Scala constructor values, not child expressions: they are broadcast
 * plan literals by construction and decode to flat primitive arrays
 * exactly once per executor instead of per row.
 */
object VectorKernels {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.GraftExpr

  // Column-level constructors (GraftExpr bridges Column <-> Expression)
  def fp1e6(c: Column): Column = GraftExpr.column(FixedPoint1e6(GraftExpr.expression(c)))
  def sqdistFp(a: Column, b: Column): Column =
    GraftExpr.column(SqDistFp(GraftExpr.expression(a), GraftExpr.expression(b)))
  def dotFp(a: Column, b: Column): Column =
    GraftExpr.column(DotFp(GraftExpr.expression(a), GraftExpr.expression(b)))
  def cosineFd(a: Column, b: Column): Column =
    GraftExpr.column(CosineFd(GraftExpr.expression(a), GraftExpr.expression(b)))
  def argminCell(fp: Column, cells: Seq[Seq[Long]]): Column = {
    require(cells.nonEmpty, "argminCell needs at least one cell")
    GraftExpr.column(ArgminCell(GraftExpr.expression(fp),
      cells.flatten.toArray, cells.head.size))
  }
  def probeCells(fp: Column, cells: Seq[Seq[Long]], nprobe: Int): Column = {
    require(cells.nonEmpty, "probeCells needs at least one cell")
    GraftExpr.column(ProbeCells(GraftExpr.expression(fp),
      cells.flatten.toArray, cells.head.size, nprobe))
  }
  def pqEncode(fp: Column, cb: Seq[Seq[Seq[Long]]]): Column = {
    require(cb.nonEmpty && cb.head.nonEmpty, "pqEncode needs a non-empty codebook")
    GraftExpr.column(PqEncode(GraftExpr.expression(fp),
      cb.flatten.flatten.toArray, cb.size, cb.head.size))
  }
  def pqAdc(qfp: Column, codes: Column, cb: Seq[Seq[Seq[Long]]]): Column = {
    require(cb.nonEmpty && cb.head.nonEmpty, "pqAdc needs a non-empty codebook")
    GraftExpr.column(PqAdc(GraftExpr.expression(qfp), GraftExpr.expression(codes),
      cb.flatten.flatten.toArray, cb.size, cb.head.size))
  }
  def sq8Encode(fp: Column, los: Seq[Long], spans: Seq[Long]): Column =
    GraftExpr.column(Sq8Encode(GraftExpr.expression(fp), los.toArray, spans.toArray))
  def wordNgrams(words: Column, n: Int, distinct: Boolean): Column =
    GraftExpr.column(WordNgrams(GraftExpr.expression(words), n, distinct))
  def maxFreq(arr: Column): Column =
    GraftExpr.column(MaxFreq(GraftExpr.expression(arr)))

  /** Shared: Σ (a[i]-b[i])² over equal-length non-null long arrays. */
  private[functions] def sqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** True when any element of `arr` is null (the argmin-family kernels
    * return NULL then — see the header's divergence note). */
  private[functions] def anyNull(arr: ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  private[functions] def sqDistFlat(
      fp: ArrayData, flat: Array[Long], off: Int, len: Int, fpOff: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < len) {
      val d = fp.getLong(fpOff + i) - flat(off + i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `array<float|double>` → `array<long>`: per element
  * `cast(floor(cast(x AS double) * 1000000) AS bigint)` — the corpus
  * fixed-point projection every similarity operator starts from. */
final case class FixedPoint1e6(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"fp1e6 expects array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
        out(i) = java.lang.Long.valueOf(math.floor(d * 1000000.0).toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "fp1e6"
  override protected def withNewChildInternal(newChild: Expression): FixedPoint1e6 =
    copy(child = newChild)
}

/** Integer squared L2: `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)`.
  * Implements `doGenCode` (not CodegenFallback): this kernel sits inside
  * the s01/s08 candidate-join projections, and a fallback expression
  * splits the whole-stage-codegen span at exactly the hottest operator
  * (r16 verdict item 6). The generated loop is the same arithmetic in
  * the same order as [[nullSafeEval]]. */
final case class SqDistFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sqdist_fp expects two array<long>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override def prettyName: String = "sqdist_fp"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistFp =
    copy(left = l, right = r)
}

/** Integer dot product: `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)`.
  * Generates whole-stage-codegen-friendly code like [[SqDistFp]] — it
  * sits inside the d07/semantic-dedup pair join's projection. */
final case class DotFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"dot_fp expects two array<long>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_fp"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFp =
    copy(left = l, right = r)
}

/** Double cosine similarity with the exact fold order of the original
  * `aggregate(zip_with(...)) / (sqrt(aggregate(...)) * sqrt(aggregate(...)))`
  * pipeline: dot, norm-a and norm-b each accumulate left-to-right in
  * element order, so the IEEE result is bit-identical. */
final case class CosineFd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsDouble(dt: DataType) = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val leftDouble = elemIsDouble(left.dataType)
  private lazy val rightDouble = elemIsDouble(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cosine_fd expects two array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    // one fused pass: each accumulator still folds left-to-right in
    // element order, so the IEEE results are identical to three passes
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  // same fused loop under whole-stage codegen (it rides the d05/d07
  // candidate-pair projections): element getters are resolved at
  // codegen time from the static child types, accumulators fold in
  // element order so the IEEE result matches nullSafeEval bit-for-bit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      def get(arr: String, idx: String, isDouble: Boolean): String =
        if (isDouble) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0d; double $na = 0.0d; double $nb = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = ${get(a, i, leftDouble)};
         |    final double $yv = ${get(b, i, rightDouble)};
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override def prettyName: String = "cosine_fd"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineFd =
    copy(left = l, right = r)
}

/** Argmin assignment against a flat centroid/cell matrix: returns
  * `struct<d: bigint, idx: int>` — the minimal squared distance and the
  * FIRST index attaining it (ties → lowest index, the `array_min` over
  * `struct(d, idx)` convention). `cells` is row-major `nCells × dims`. */
final case class ArgminCell(child: Expression, cells: Array[Long], dims: Int)
    extends UnaryExpression with CodegenFallback {

  private val nCells = cells.length / dims
  require(nCells * dims == cells.length, "cells length must be a multiple of dims")

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("idx", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"argmin_cell expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[ArrayData]
    if (fp.numElements() != dims || VectorKernels.anyNull(fp)) return null
    var best = Long.MaxValue
    var bestIdx = -1
    var cc = 0
    while (cc < nCells) {
      val d = VectorKernels.sqDistFlat(fp, cells, cc * dims, dims, 0)
      if (d < best) { best = d; bestIdx = cc }
      cc += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestIdx)
  }

  override def prettyName: String = "argmin_cell"
  override protected def withNewChildInternal(newChild: Expression): ArgminCell =
    copy(child = newChild)
}

/** The `nprobe` nearest cell indices ordered by (distance, index)
  * ascending — the probe-list shape `slice(array_sort(transform(...)))`
  * produced. Returns `array<int>`. */
final case class ProbeCells(child: Expression, cells: Array[Long], dims: Int, nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  private val nCells = cells.length / dims
  require(nCells * dims == cells.length, "cells length must be a multiple of dims")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"probe_cells expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[ArrayData]
    if (fp.numElements() != dims || VectorKernels.anyNull(fp)) return null
    val ds = new Array[Long](nCells)
    var cc = 0
    while (cc < nCells) {
      ds(cc) = VectorKernels.sqDistFlat(fp, cells, cc * dims, dims, 0)
      cc += 1
    }
    val order = (0 until nCells).sortBy(cc => (ds(cc), cc))
    new GenericArrayData(order.take(math.min(nprobe, nCells)).toArray[Any])
  }

  override def prettyName: String = "probe_cells"
  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

/** Product-quantization encode: per subspace `m`, the codeword index
  * minimizing the integer squared distance of `fp`'s m-th subvector to
  * `cb[m][kk]` (ties → lowest kk). `cb` is row-major
  * `subspaces × codewords × subDim`. Returns `array<int>` of codes. */
final case class PqEncode(child: Expression, cb: Array[Long], subspaces: Int, codewords: Int)
    extends UnaryExpression with CodegenFallback {

  private val subDim = cb.length / (subspaces * codewords)
  require(subDim * subspaces * codewords == cb.length, "cb length mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[ArrayData]
    if (fp.numElements() != subspaces * subDim || VectorKernels.anyNull(fp)) return null
    val codes = new Array[Any](subspaces)
    var m = 0
    while (m < subspaces) {
      var best = Long.MaxValue
      var bestKk = -1
      var kk = 0
      while (kk < codewords) {
        val d = VectorKernels.sqDistFlat(fp, cb, (m * codewords + kk) * subDim, subDim, m * subDim)
        if (d < best) { best = d; bestKk = kk }
        kk += 1
      }
      codes(m) = bestKk
      m += 1
    }
    new GenericArrayData(codes)
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ asymmetric distance: Σ_m ‖q_fp[m·subDim ..] − cb[m][codes[m]]‖²
  * — the ADC sum the ranking join computes per (query, neighbor) pair. */
final case class PqAdc(left: Expression, right: Expression,
    cb: Array[Long], subspaces: Int, codewords: Int)
    extends BinaryExpression with CodegenFallback {

  private val subDim = cb.length / (subspaces * codewords)
  require(subDim * subspaces * codewords == cb.length, "cb length mismatch")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<long> q_fp, array<int> codes), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qfp = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (qfp.numElements() != subspaces * subDim || codes.numElements() != subspaces ||
      VectorKernels.anyNull(qfp)) return null
    var acc = 0L
    var m = 0
    while (m < subspaces) {
      if (codes.isNullAt(m)) return null
      acc += VectorKernels.sqDistFlat(
        qfp, cb, (m * codewords + codes.getInt(m)) * subDim, subDim, m * subDim)
      m += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** SQ8 encode: per dimension `((fp[i] - lo[i]) * 255) div span[i]` with
  * the corpus-trained (lo, span) ranges as flat model state. Operands
  * are non-negative by construction (lo = corpus min, span ≥ 1), so
  * plain long division matches Spark's `div` exactly. */
final case class Sq8Encode(child: Expression, los: Array[Long], spans: Array[Long])
    extends UnaryExpression with CodegenFallback {

  require(los.length == spans.length, "los/spans length mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sq8_encode expects array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val fp = input.asInstanceOf[ArrayData]
    val n = los.length
    val m = fp.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // per-element null mirror of transform(sequence(0, n-1), ...):
      // a null or out-of-range fp[i] yields a null CODE element
      if (i < m && !fp.isNullAt(i))
        out(i) = java.lang.Long.valueOf((fp.getLong(i) - los(i)) * 255L / spans(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "sq8_encode"
  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Word n-grams joined by single spaces, one pass:
  * `transform(sequence(0, size(words)-n), i -> concat_ws(' ', slice(words, i+1, n)))`,
  * optionally wrapped in `array_distinct` (first-occurrence order). Null
  * elements are skipped inside a gram exactly like `concat_ws`. */
final case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val total = words.numElements()
    // sequence(0, size-n) is non-empty for size >= n (callers filter
    // size >= n); for size < n the original would be an invalid
    // descending sequence — callers guard, but emit empty to be safe
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    def gramAt(i: Int): org.apache.spark.unsafe.types.UTF8String = {
      var j = 0
      while (j < n) {
        parts(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
    }
    val count = total - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      var i = 0
      while (i < count) { seen.add(gramAt(i)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = gramAt(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def prettyName: String = "word_ngrams"
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Count of the most frequent element:
  * `cast(array_max(transform(array_distinct(arr), d -> size(filter(arr, x -> x = d)))) AS bigint)`
  * in one hash-counting pass. Empty array → null (array_max of an empty
  * array); null elements mirror the original (a null `d` never equals
  * anything under `=`, so it contributes a 0 count). */
final case class MaxFreq(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"max_freq expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    if (total == 0) return null
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int]()
    var sawNull = false
    var i = 0
    while (i < total) {
      if (arr.isNullAt(i)) sawNull = true
      else counts.merge(arr.getUTF8String(i), 1, Integer.sum)
      i += 1
    }
    var best = if (sawNull) 0 else Int.MinValue
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > best) best = v }
    if (best == Int.MinValue) null else java.lang.Long.valueOf(best.toLong)
  }

  override def prettyName: String = "max_freq"
  override protected def withNewChildInternal(newChild: Expression): MaxFreq =
    copy(child = newChild)
}
