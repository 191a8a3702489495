package graft.hudi

/**
 * Forked-JVM appender for the cross-process Hudi writer race test
 * (ConcurrencySpec races threads in ONE JVM, where the per-table
 * AtomicLong high-water mark serializes instant allocation; this main
 * runs in its own process, so collisions must resolve through the
 * on-disk protocol alone: marker put-if-absent + completed-file
 * put-if-absent + rebase-on-collision).
 */
object HudiRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, tag, countStr) = args
    val spark = graft.GraftSession.local(2)
    try {
      import spark.implicits._
      val n = countStr.toInt
      (0 until n).foreach { i =>
        val df = Seq((s"$tag-$i", i.toLong)).toDF("k", "v")
        HudiTable.forPath(spark, tablePath).append(df)
      }
      // scalastyle:off println
      println(s"RACE-DONE $tag")
      // scalastyle:on println
    } finally spark.stop()
  }
}
