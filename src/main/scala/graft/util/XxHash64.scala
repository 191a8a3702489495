package graft.util

/**
 * XXHash64 — the public xxHash algorithm (Yann Collet's specification,
 * https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md),
 * implemented from the spec. Hudi's metadata-table index IDs
 * (ColumnIndexID / PartitionIndexID / FileIndexID) are the seed-0
 * XXHash64 of the name's UTF-8 bytes, base64-encoded big-endian —
 * `HashID.hash(message, BITS_64)` in Hudi's util package; this class
 * reproduces those keys without a Hudi runtime.
 */
object XxHash64 {

  private val Prime1 = 0x9E3779B185EBCA87L
  private val Prime2 = 0xC2B2AE3D27D4EB4FL
  private val Prime3 = 0x165667B19E3779F9L
  private val Prime4 = 0x85EBCA77C2B2AE63L
  private val Prime5 = 0x27D4EB2F165667C5L

  private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  private def readIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  private def round(acc: Long, input: Long): Long = {
    val a = acc + input * Prime2
    java.lang.Long.rotateLeft(a, 31) * Prime1
  }

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * Prime1 + Prime4

  def hash(input: Array[Byte], seed: Long = 0L): Long = {
    val len = input.length
    var i = 0
    var h: Long =
      if (len >= 32) {
        var v1 = seed + Prime1 + Prime2
        var v2 = seed + Prime2
        var v3 = seed
        var v4 = seed - Prime1
        while (i + 32 <= len) {
          v1 = round(v1, readLongLE(input, i))
          v2 = round(v2, readLongLE(input, i + 8))
          v3 = round(v3, readLongLE(input, i + 16))
          v4 = round(v4, readLongLE(input, i + 24))
          i += 32
        }
        var acc = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        acc = mergeRound(acc, v1); acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3); acc = mergeRound(acc, v4)
        acc
      } else seed + Prime5
    h += len
    while (i + 8 <= len) {
      h = java.lang.Long.rotateLeft(h ^ round(0L, readLongLE(input, i)), 27) * Prime1 + Prime4
      i += 8
    }
    if (i + 4 <= len) {
      h = java.lang.Long.rotateLeft(h ^ (readIntLE(input, i) * Prime1), 23) * Prime2 + Prime3
      i += 4
    }
    while (i < len) {
      h = java.lang.Long.rotateLeft(h ^ ((input(i) & 0xffL) * Prime5), 11) * Prime1
      i += 1
    }
    h ^= h >>> 33; h *= Prime2; h ^= h >>> 29; h *= Prime3; h ^= h >>> 32
    h
  }

  /** Hudi index-ID form: base64 of the 8-byte big-endian seed-0 hash of
    * the name's UTF-8 bytes. */
  def indexId(name: String): String = {
    val h = hash(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bytes = java.nio.ByteBuffer.allocate(8).putLong(h).array()
    java.util.Base64.getEncoder.encodeToString(bytes)
  }
}
