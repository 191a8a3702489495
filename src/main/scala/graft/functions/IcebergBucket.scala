package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Iceberg `bucket[N]` transform hashing, per the Iceberg table spec
 * (Appendix B "32-bit Hash Requirements"): Murmur3 x86 32-bit, seed 0,
 * over the type's single-value binary form — int/long/date/timestamp
 * as the 8-byte little-endian long, string as its UTF-8 bytes. The
 * bucket is `(hash & Int.MaxValue) % N`, so tables written here hash
 * identically to every spec-conforming Iceberg engine.
 */
object IcebergMurmur3 {

  /** Murmur3 x86 32-bit (Austin Appleby's public-domain algorithm). */
  def hashBytes(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(i * 4) & 0xff) |
        ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) |
        ((data(i * 4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    val rem = data.length & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Spec rule: int/long/date/time/timestamp all hash as the 8-byte
    * little-endian long (so `bucket(34: int) == bucket(34L)`). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def bucketOf(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  /** Driver-side bucket of a typed value (scan pruning). */
  def bucketValue(dt: DataType, v: String, n: Int): Int = {
    val h = dt match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType =>
        hashLong(v.trim.toLong)
      case StringType => hashBytes(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case other => throw new IllegalArgumentException(s"bucket transform on $other")
    }
    bucketOf(h, n)
  }
}

/** `iceberg_bucket(col, N)` — the transform as a per-row expression. */
final case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket expects int/long/date/timestamp/string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val h = child.dataType match {
      case IntegerType | DateType => IcebergMurmur3.hashLong(input.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType =>
        IcebergMurmur3.hashLong(input.asInstanceOf[Long])
      case StringType =>
        IcebergMurmur3.hashBytes(input.asInstanceOf[UTF8String].getBytes)
      case other => throw new IllegalStateException(s"iceberg_bucket on $other")
    }
    IcebergMurmur3.bucketOf(h, numBuckets)
  }

  override def prettyName: String = "iceberg_bucket"
  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
