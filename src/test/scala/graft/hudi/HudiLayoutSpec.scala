package graft.hudi

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.PartitionTransform

/** DIR_HIERARCHY_PARTITION_VALUES layout + keygen matrix (ref
  * `api/.../storage/DataLayoutStrategy.java:29-33`,
  * `core/.../hudi/HudiTableManager.java:123-152`,
  * `core/.../hudi/HudiPartitionValuesExtractor.java:47-118`). */
class HudiLayoutSpec extends SparkTestBase {

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("non-hive layout: partition dirs are raw values, rows identical, pruning exact") {
    val dir = tmpDir("hudi_nonhive")
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val t = HudiTable.create(spark, s"$dir/t", src, Seq("l_returnflag"),
      hiveStylePartitioning = false)
    assert(!t.hiveStyleLayout)
    // physical dirs are bare values — no `l_returnflag=` prefix anywhere
    val partDirs = fs.listStatus(new Path(s"$dir/t")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).filterNot(_.startsWith("."))
    assert(partDirs.nonEmpty && partDirs.forall(!_.contains("=")), partDirs.toString)
    assert(partDirs.toSet == src.select("l_returnflag").distinct()
      .collect().map(_.getString(0)).toSet)
    // read back full fidelity
    val back = t.toDF()
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    // partition pruning prunes the manifest and keeps rows exact
    val all = t.scan.files().count()
    val pruned = t.scan.partitionIn("l_returnflag", Set("A")).files().count()
    assert(pruned < all, s"expected pruning: $pruned < $all")
    val rows = t.scan.partitionIn("l_returnflag", Set("A")).toDF()
    assert(rows.count() == src.filter(col("l_returnflag") === "A").count())
  }

  test("non-hive layout: appends inherit the layout; multi-field paths parse positionally") {
    val dir = tmpDir("hudi_nonhive_multi")
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val t = HudiTable.create(spark, s"$dir/t", src.filter(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag", "l_linestatus"), hiveStylePartitioning = false)
    t.append(src.filter(col("l_orderkey") % 2 === 1))
    val back = t.toDF()
    assert(back.count() == src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    // two-level value-only dirs: A/F, N/O, R/F
    val lvl1 = fs.listStatus(new Path(s"$dir/t")).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.startsWith("."))
    assert(lvl1.forall(!_.contains("=")))
    // pruning on the SECOND field uses its positional segment
    val rows = t.scan.partitionIn("l_linestatus", Set("O")).toDF()
    assert(rows.count() == src.filter(col("l_linestatus") === "O").count())
  }

  test("non-hive layout round-trips through sync metadata (internalDataFiles values)") {
    val dir = tmpDir("hudi_nonhive_files")
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")).cast("string"))
    val t = HudiTable.create(spark, s"$dir/t", src, Seq("o_year"),
      hiveStylePartitioning = false)
    val vals = t.snapshotDataFiles().flatMap(_.partitionValues.get("o_year")).toSet
    assert(vals == src.select("o_year").distinct().collect().map(_.getString(0)).toSet)
  }

  test("parsePartitionPath handles hive, value-only, mixed and default-partition paths") {
    val cols = Seq("a", "b")
    assert(HudiTable.parsePartitionPath("a=1/b=2", cols) == Map("a" -> "1", "b" -> "2"))
    assert(HudiTable.parsePartitionPath("1/2", cols) == Map("a" -> "1", "b" -> "2"))
    assert(HudiTable.parsePartitionPath("a=1/2", cols) == Map("a" -> "1", "b" -> "2"))
    assert(HudiTable.parsePartitionPath("__HIVE_DEFAULT_PARTITION__/2", cols) ==
      Map("a" -> null, "b" -> "2"))
    // a single partition field swallows slashes (custom partition logic,
    // ref HudiPartitionValuesExtractor.java:96-103)
    assert(HudiTable.parsePartitionPath("2023/10/05", Seq("dt")) == Map("dt" -> "2023/10/05"))
    assert(HudiTable.parsePartitionPath("", cols) == Map.empty)
  }

  test("build→parse round trip: both layouts, every hostile-value pair") {
    val hostile = Seq("plain", "a=b", "x:y", "50%", "a,b", "sp ace", "%41",
      "a/b", "q=", "2023-10-05", "__HIVE_DEFAULT_PARTITION__")
    for (v1 <- hostile; v2 <- hostile; hive <- Seq(true, false)) {
      val cols = Seq("p", "q")
      val vals = Map("p" -> v1, "q" -> v2)
      val pp = HudiTable.buildPartitionPath(vals, cols, hive)
      val parsed = HudiTable.parsePartitionPath(pp, cols)
      val expected = vals.map { case (k, v) =>
        k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else v)
      }
      assert(parsed == expected, s"v1=$v1 v2=$v2 pp=$pp hive=$hive")
    }
    // single-field tables additionally round-trip raw (unescaped-slash)
    // values when PARSING foreign paths (custom partition logic);
    // engine-built paths escape the slash, so both spellings parse
    assert(HudiTable.parsePartitionPath(
      HudiTable.buildPartitionPath(Map("dt" -> "2023/10/05"), Seq("dt"), false),
      Seq("dt")) == Map("dt" -> "2023/10/05"))
  }

  test("keygen matrix matches the reference's class choices") {
    def defs(specs: String*) = PartitionTransform.parseAll(specs.toSeq)
    val kg = HudiTable.keyGeneratorClass _
    assert(kg(Nil, Nil) == "org.apache.hudi.keygen.NonpartitionedKeyGenerator")
    assert(kg(Nil, Seq("id")) == "org.apache.hudi.keygen.NonpartitionedKeyGenerator")
    assert(kg(defs("c"), Seq("id")) == "org.apache.hudi.keygen.SimpleKeyGenerator")
    assert(kg(defs("c"), Nil) == "org.apache.hudi.keygen.SimpleKeyGenerator")
    assert(kg(defs("c", "d"), Seq("id")) == "org.apache.hudi.keygen.ComplexKeyGenerator")
    assert(kg(defs("c"), Seq("id", "id2")) == "org.apache.hudi.keygen.ComplexKeyGenerator")
    assert(kg(defs("month(ts)"), Seq("id")) ==
      "org.apache.hudi.keygen.TimestampBasedKeyGenerator")
    assert(kg(defs("month(ts)", "c"), Seq("id")) ==
      "org.apache.hudi.keygen.CustomKeyGenerator")
  }

  test("created tables stamp hoodie.table.keygenerator.class") {
    val dir = tmpDir("hudi_keygen")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    val flat = HudiTable.create(spark, s"$dir/flat", src)
    assert(flat.properties("hoodie.table.keygenerator.class") ==
      "org.apache.hudi.keygen.NonpartitionedKeyGenerator")
    val part = HudiTable.create(spark, s"$dir/part",
      spark.read.parquet(s"$sf0001/nation.parquet"), Seq("n_regionkey"))
    assert(part.properties("hoodie.table.keygenerator.class") ==
      "org.apache.hudi.keygen.SimpleKeyGenerator")
    val mor = HudiTable.createMor(spark, s"$dir/mor",
      spark.read.parquet(s"$sf0001/nation.parquet"), "n_nationkey", Seq("n_regionkey"))
    assert(mor.properties("hoodie.table.keygenerator.class") ==
      "org.apache.hudi.keygen.SimpleKeyGenerator")
  }
}
