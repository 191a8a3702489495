package graft.delta

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Codec-level coverage of the native deletion-vector implementation:
  * Z85 (spec alphabet + reference vector), RoaringBitmapArray portable
  * round trips across all container kinds, and the .bin sidecar layout
  * with CRC verification. */
class DeletionVectorsSpec extends AnyFunSuite {

  // ------------------------------------------------------------------ Z85

  test("z85 matches the published reference vector") {
    // the ZeroMQ spec's canonical test case
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(Z85.encode(bytes) == "HelloWorld")
    assert(Z85.decode("HelloWorld", 8).toSeq == bytes.toSeq)
  }

  test("z85 uuid round trip is 20 chars") {
    val u = UUID.fromString("0a7a7bcf-2c41-4f6a-9f14-8ad64afcbd14")
    val enc = Z85.encodeUuid(u)
    assert(enc.length == 20)
    assert(Z85.decodeUuid(enc) == u)
  }

  test("z85 pads non-multiple-of-4 input and truncates on decode") {
    val bytes = Array[Byte](1, 2, 3, 4, 5, 6)
    val enc = Z85.encode(bytes)
    assert(enc.length == 10)
    assert(Z85.decode(enc, 6).toSeq == bytes.toSeq)
  }

  // ------------------------------------------------- RoaringBitmapArray

  test("roaring round trip: array containers, multiple 32-bit keys") {
    val positions = Array[Long](0L, 1L, 5L, 65536L, 65537L, (1L << 32) + 7, (1L << 32) + 9)
    val ser = RoaringBitmapArray.serialize(positions)
    assert(RoaringBitmapArray.deserialize(ser).toSeq == positions.sorted.toSeq)
  }

  test("roaring round trip: bitmap container above 4096 cardinality") {
    val positions = (0L until 10000L by 2).toArray // 5000 values in one container
    val ser = RoaringBitmapArray.serialize(positions)
    assert(RoaringBitmapArray.deserialize(ser).toSeq == positions.toSeq)
  }

  test("roaring handles unsorted input with duplicates") {
    val positions = Array[Long](9, 3, 3, 70000, 9, 1)
    assert(RoaringBitmapArray.deserialize(RoaringBitmapArray.serialize(positions)).toSeq ==
      Seq(1L, 3L, 9L, 70000L))
  }

  test("roaring reads the run-container format other writers emit") {
    // hand-build: magic + 1 bitmap key 0, cookie 12347 with 1 container,
    // run flag set, card 6 (values 10..15), no offsets (n < 4), 1 run
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 4 + 1 + 4 + 2 + 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RoaringBitmapArray.Magic)
    bb.putLong(1L)
    bb.putInt(0) // key
    bb.putInt(12347 | (0 << 16)) // cookie, containerCount-1 = 0
    bb.put(1.toByte) // run flag bitset
    bb.putShort(0.toShort) // container key
    bb.putShort(5.toShort) // cardinality-1
    bb.putShort(1.toShort) // numRuns
    bb.putShort(10.toShort) // run start
    bb.putShort(5.toShort) // run length (10..15)
    assert(RoaringBitmapArray.deserialize(bb.array()).toSeq == (10L to 15L))
  }

  // ------------------------------------------------------- sidecar store

  test("bin sidecar: version byte, offsets, CRC round trip; bad CRC rejected") {
    val dir = java.nio.file.Files.createTempDirectory("dvstore").toString
    val path = new Path(dir, "deletion_vector_test.bin")
    val fs = path.getFileSystem(new Configuration())
    val a = RoaringBitmapArray.serialize(Array(1L, 2L, 3L))
    val b = RoaringBitmapArray.serialize((0L until 5000L).toArray)
    val offs = DeletionVectorStore.writeFile(fs, path, Seq(a, b))
    assert(offs.head._1 == 1) // first blob right after the version byte
    assert(offs.map(_._2) == Seq(a.length, b.length))
    offs.zip(Seq(a, b)).foreach { case ((off, size), expect) =>
      assert(DeletionVectorStore.readBlob(fs, path, off, size).toSeq == expect.toSeq)
    }
    // corrupt one data byte -> checksum failure
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path.toUri.getPath))
    raw(5) = (raw(5) ^ 0xff).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(path.toUri.getPath), raw)
    // detected either by our CRC or (on LocalFileSystem) Hadoop's own .crc
    val ex = intercept[Exception] {
      DeletionVectorStore.readBlob(fs, path, offs.head._1, offs.head._2)
    }
    assert(ex.isInstanceOf[IllegalArgumentException] ||
      ex.isInstanceOf[org.apache.hadoop.fs.ChecksumException])
  }

  // --------------------------------------------------------- descriptor

  test("descriptor resolves u-storage paths with and without prefix") {
    val u = UUID.fromString("0a7a7bcf-2c41-4f6a-9f14-8ad64afcbd14")
    val plain = DeletionVectorDescriptor("u", Z85.encodeUuid(u), Some(1), 10, 2L)
    assert(plain.absolutePath("/tbl").get == s"/tbl/deletion_vector_$u.bin")
    val prefixed = DeletionVectorDescriptor("u", "ab" + Z85.encodeUuid(u), Some(1), 10, 2L)
    assert(prefixed.absolutePath("/tbl").get == s"/tbl/ab/deletion_vector_$u.bin")
  }

  test("inline descriptor decodes positions without touching a filesystem") {
    val data = RoaringBitmapArray.serialize(Array(4L, 8L, 15L))
    val d = DeletionVectorDescriptor("i", Z85.encode(data), None, data.length, 3L)
    assert(d.positions("/nowhere", new Configuration()).toSeq == Seq(4L, 8L, 15L))
  }
}
