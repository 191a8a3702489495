package graft.hudi

import scala.jdk.CollectionConverters._

import graft.SparkTestBase

/**
 * Cross-PROCESS Hudi writer race: two forked JVMs append concurrently
 * to one table. In-JVM races (ConcurrencySpec) are partly serialized by
 * the per-table AtomicLong instant allocator; across processes the
 * documented claim (HudiTimeline.scala nextInstantTime doc) is that
 * collisions resolve via completed-file put-if-absent + rebase — this
 * spec is that claim under test.
 */
class HudiCrossProcessSpec extends SparkTestBase {

  private val AppendsPerProcess = 6

  test("two OS processes appending concurrently: every commit lands, instants unique") {
    val dir = tmpDir("hudi_xproc")
    val tp = s"$dir/t"
    import spark.implicits._
    HudiTable.create(spark, tp, Seq(("seed", 0L)).toDF("k", "v"))

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    // Spark-on-JDK17 module opens (same list as build.sbt — runtime
    // introspection can miss them when sbt passes options indirectly)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def launch(tag: String): Process = {
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.hudi.HudiRaceMain", tp, tag, AppendsPerProcess.toString)
      new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.to(
          new java.io.File(s"$dir/race-$tag.log")))
        .start()
    }
    val p1 = launch("a")
    val p2 = launch("b")
    def await(p: Process, tag: String): Unit = {
      assert(p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES),
        s"process $tag did not finish")
      val log = scala.io.Source.fromFile(s"$dir/race-$tag.log").mkString
      assert(p.exitValue == 0, s"process $tag failed:\n${log.takeRight(4000)}")
      assert(log.contains(s"RACE-DONE $tag"), s"process $tag incomplete")
    }
    await(p1, "a")
    await(p2, "b")

    val t = HudiTable.forPath(spark, tp)
    // every commit landed, no instant-time collision, timeline readable
    assert(t.instants.size == 1 + 2 * AppendsPerProcess,
      s"expected ${1 + 2 * AppendsPerProcess} instants, got ${t.instants.size}")
    assert(t.instants.distinct.size == t.instants.size, "instant times must be unique")
    val rows = t.toDF()
    assert(rows.count() == 1 + 2 * AppendsPerProcess)
    assert(rows.filter($"k".startsWith("a-")).count() == AppendsPerProcess)
    assert(rows.filter($"k".startsWith("b-")).count() == AppendsPerProcess)
    // the metadata-table listing agrees with the commit metadata replay
    val listing = HudiMetadataTable.readFiles(
      new org.apache.hadoop.fs.Path(tp).getFileSystem(spark.sparkContext.hadoopConfiguration),
      spark.sparkContext.hadoopConfiguration, tp)
    assert(listing.values.map(_.size).sum == 1 + 2 * AppendsPerProcess)
  }
}
