package graft.hudi

import org.scalatest.funsuite.AnyFunSuite

/** Lock-provider resolution: the FileLock must never silently lock a
  * junk CWD-relative file for a remote-scheme table (it would grant no
  * exclusion for the actual table); the Auto default dispatches by
  * scheme so direct `syncCommit` callers are safe out of the box. */
class HudiLockProviderSpec extends AnyFunSuite {

  test("FileLock refuses a remote-scheme table path loudly") {
    val e = intercept[IllegalArgumentException](
      HudiLockProvider.FileLock.withLock("s3a://bucket/warehouse/t") { fail("must not run") })
    assert(e.getMessage.contains("local"), e.getMessage)
    assert(!new java.io.File("s3a:").exists(),
      "no CWD-relative junk lock directory may be created")
  }

  test("Auto dispatches: file lock locally (lock file appears), in-process remotely") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lock").toString
    var ran = false
    HudiLockProvider.Auto.withLock(dir) { ran = true }
    assert(ran)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, ".hoodie", ".graft_sync.lock")),
      "local path must take the cross-process file lock")
    // remote scheme: body still runs (in-process monitor), nothing local created
    var ranRemote = false
    HudiLockProvider.Auto.withLock("s3a://bucket/warehouse/t2") { ranRemote = true }
    assert(ranRemote)
  }
}
