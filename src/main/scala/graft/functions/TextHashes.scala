package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hash-heavy dedup kernels. The
 * same math is expressible with built-in HOFs (`transform`/`aggregate`),
 * but lambda evaluation is interpreted PER ELEMENT (~µs each): a 64-perm
 * MinHash over a 100-word document costs thousands of boxed lambda
 * calls per row. These evaluate once per ROW in a tight JVM loop over
 * the same XXH64 primitive Spark's `xxhash64` uses — 10-50× faster and
 * the per-row fallback overhead is negligible at any corpus size.
 */

/** 64-perm MinHash signature of an array<string> of shingles, via
  * standard double hashing (Broder): perm p's hash of shingle s is
  * h1(s) + p·h2(s), so each shingle is hashed twice, not 64 times. */
final case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1337L)
        var p = 0
        var h = h1
        while (p < perms) {
          if (h < mins(p)) mins(p) = h
          h += h2
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> of tokens: per-bit vote of each
  * token's XXH64 (seed 42, identical to SQL `xxhash64(tok)`), bit set
  * where the vote is positive. */
final case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Banded random-hyperplane LSH signatures of a float/double vector:
  * `tables` independent signatures, each from `planes` hyperplanes,
  * returned as array<long> of length `tables` (bit p of table t set
  * where the dot product with pseudo-random plane (t·planes+p) is
  * positive). Plane weights derive deterministically from
  * XXH64(dim, seed=planeIndex) — no materialized plane matrix, and
  * the bucket key space (2^planes per table) GROWS with the corpus:
  * the caller sizes `planes` ~ log2(N), so in-bucket candidate
  * generation stays linear instead of the fixed-256-bucket N² shape. */
final case class HyperplaneSigs(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression with CodegenFallback {

  require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elementIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs expects array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val vec = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      vec(d) = if (arr.isNullAt(d)) 0.0
               else if (elementIsDouble) arr.getDouble(d) else arr.getFloat(d).toDouble
      d += 1
    }
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val q = t * planes + p
        var dot = 0.0
        var i = 0
        while (i < dims) {
          // deterministic pseudo-random weight in [-1, 1]
          val w = (java.lang.Math.floorMod(XXH64.hashLong(i.toLong, q.toLong), 2001L) - 1000L) / 1000.0
          dot += vec(i) * w
          i += 1
        }
        if (dot > 0) sig |= 1L << p
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override def prettyName: String = "hyperplane_sigs"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object TextHashes {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** Register `minhash_sig(arr)`, `simhash64(arr)` and
    * `hyperplane_sigs(vec, tables, planes)` for SQL/expr use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, 64))
    reg.registerFunction(
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head))
    reg.registerFunction(
      FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (exprs: Seq[Expression]) => {
        def lit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_sigs $what must be an int literal, got $other")
        }
        HyperplaneSigs(exprs.head, lit(exprs(1), "tables"), lit(exprs(2), "planes"))
      })
    reg.registerFunction(
      FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (exprs: Seq[Expression]) => {
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"iceberg_bucket count must be an int literal, got $other")
        }
        IcebergBucket(exprs.head, n)
      })
  }
}
