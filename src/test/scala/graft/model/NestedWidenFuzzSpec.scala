package graft.model

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.delta.DeltaTable
import graft.hudi.HudiTable
import graft.iceberg.IcebergTable
import graft.sync.SyncEngine

/**
 * Seeded widen-sequence fuzzer over the FULL promotion surface — the
 * dimensions the main cross-format fuzzer's flat int→long widen op
 * does not reach: nested paths (struct field / array element / map
 * value / struct-in-array) and the float→double + decimal-precision
 * promotions, in random multi-step sequences (byte→short→int→long can
 * widen one rank at a time, in any interleaving with appends), applied
 * to all three formats in lockstep and compared after every op. A
 * final sync chain (delta → iceberg → hudi) replays the widened table
 * cross-format and must agree exactly.
 */
class NestedWidenFuzzSpec extends SparkTestBase {

  // widenable slots: dot-path -> promotion ladder. The ladder floor is
  // INT because Avro (Hudi's schema channel) represents byte/short as
  // int — the lockstep contract is the intersection every format
  // DECLARES; sub-int widths fuzz Delta/Iceberg via NestedWidenSpec.
  private val ladders: Seq[(String, Seq[DataType])] = Seq(
    "s.x" -> Seq(IntegerType, LongType),
    "arr.element" -> Seq(IntegerType, LongType),
    "m.value" -> Seq(FloatType, DoubleType),
    "aos.element.q" -> Seq(IntegerType, LongType),
    "d" -> Seq(DecimalType(6, 2), DecimalType(10, 2), DecimalType(18, 2)))

  private def narrowSchemaDf(tag: Int, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val id = tag * 1000L + i
      (id, ((id % 100).toByte, s"y$id"), Seq(i, i + 1), Map(s"k$i" -> (i + 0.5f)),
        Seq(((id % 30000).toShort, s"r$id")), BigDecimal(id % 1000) / 100)
    }
    rows.toDF("id", "s", "arr", "m", "aos", "d")
      .select($"id",
        $"s".cast("struct<x:int,y:string>").as("s"),
        $"arr", $"m",
        $"aos".cast("array<struct<q:int,r:string>>").as("aos"),
        $"d".cast(DecimalType(6, 2)).as("d"))
  }

  /** A batch shaped to the CURRENT declared schema (narrow batches are
    * legal after any widen; the writers up-cast). */
  private def batchFor(schema: StructType, tag: Int, n: Int): DataFrame = {
    val df = narrowSchemaDf(tag, n)
    df.select(schema.fieldNames.map(c => col(c).cast(schema(c).dataType)): _*)
  }

  private def checksum(df: DataFrame): Long = {
    // canonical presentation: widen every numeric to its ladder top so
    // format-side width differences cannot alias the comparison
    val canon = df.select(
      col("id"),
      col("s").cast("struct<x:bigint,y:string>"),
      col("arr").cast("array<bigint>"),
      // hash() rejects MapType: present the map as sorted entries
      array_sort(map_entries(col("m").cast("map<string,double>"))).as("m"),
      col("aos").cast("array<struct<q:bigint,r:string>>"),
      col("d").cast(DecimalType(18, 2)))
    canon.select(sum(hash(canon.columns.map(col): _*)).cast("long"))
      .collect()(0).getLong(0)
  }

  private abstract class T(val fmt: String) {
    def schema: StructType
    def widen(path: String, to: DataType): Unit
    def append(df: DataFrame): Unit
    def df: DataFrame
  }

  private def seeds: Seq[Int] =
    1 to math.min(sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(6), 12)

  for (seed <- seeds)
  test(s"nested widen fuzz seed=$seed") {
    val rng = new Random(seed * 7919)
    val dir = tmpDir(s"nwfuzz_$seed")
    val init = narrowSchemaDf(0, 24)
    val td = DeltaTable.create(spark, s"$dir/delta", init)
    val ti = IcebergTable.create(spark, s"$dir/ice", init)
    val th = HudiTable.create(spark, s"$dir/hudi", init)
    val tables: Seq[T] = Seq(
      new T("delta") {
        def schema = td.schemaAt(None)._1
        def widen(p: String, to: DataType): Unit = td.widenColumn(p, to)
        def append(df: DataFrame): Unit = td.append(df, Seq.empty)
        def df = td.toDF()
      },
      new T("iceberg") {
        def schema = ti.currentMetadata.schema
        def widen(p: String, to: DataType): Unit = ti.widenColumn(p, to)
        def append(df: DataFrame): Unit = ti.append(df)
        def df = ti.toDF()
      },
      new T("hudi") {
        def schema = th.schemaAt(None)
        def widen(p: String, to: DataType): Unit = th.widenColumn(p, to)
        def append(df: DataFrame): Unit = th.append(df, Seq.empty)
        def df = th.toDF()
      })

    def typeAt(schema: StructType, path: String): DataType =
      path.split('.').foldLeft(schema: DataType) {
        case (s: StructType, seg) if s.fieldNames.contains(seg) => s(seg).dataType
        case (a: ArrayType, "element") => a.elementType
        case (m: MapType, "value") => m.valueType
        case (t, seg) => fail(s"bad path seg $seg under ${t.simpleString}")
      }

    val trace = new StringBuilder(s"seed=$seed:")
    def compareAll(at: String): Unit = {
      val sums = tables.map(t => t.fmt -> checksum(t.df))
      assert(sums.map(_._2).distinct.size == 1,
        s"formats diverged after $at ($trace): $sums")
    }

    compareAll("init")
    val nOps = 6 + rng.nextInt(4)
    for (i <- 1 to nOps) {
      if (rng.nextInt(3) == 0) {
        trace.append(s" $i:append")
        val b = batchFor(tables.head.schema, i, 8)
        tables.foreach(_.append(b))
      } else {
        // pick a slot that can still climb; widen ONE rung (or skip
        // rungs occasionally — promotion is transitive)
        val open = ladders.filter { case (p, ladder) =>
          ladder.indexOf(typeAt(tables.head.schema, p)) < ladder.size - 1
        }
        if (open.isEmpty) {
          trace.append(s" $i:append(full)")
          tables.foreach(_.append(batchFor(tables.head.schema, i, 8)))
        } else {
          val (path, ladder) = open(rng.nextInt(open.size))
          val cur = ladder.indexOf(typeAt(tables.head.schema, path))
          val to = ladder(cur + 1 + rng.nextInt(ladder.size - cur - 1))
          trace.append(s" $i:widen($path->${to.simpleString})")
          tables.foreach(_.widen(path, to))
          // every format declares the same widened type at the path
          tables.foreach(t => assert(typeAt(t.schema, path) == to,
            s"${t.fmt} declares ${typeAt(t.schema, path)} at $path, wanted $to ($trace)"))
          // a mixed-width follow-up: narrow-shaped rows after the widen
          tables.foreach(_.append(batchFor(narrowSchemaDf(0, 1).schema, 100 + i, 4)))
        }
      }
      compareAll(s"op $i")
    }
    // cross-format replay of the widened nested schema: sync the delta
    // table through iceberg into hudi targets and compare end-to-end
    SyncEngine.sync(SyncEngine.deltaSource(td), SyncEngine.icebergTarget(spark, s"$dir/ice2"))
    SyncEngine.sync(
      SyncEngine.icebergSource(IcebergTable.forPath(spark, s"$dir/ice2")),
      SyncEngine.hudiTarget(spark, s"$dir/hudi2"))
    val srcSum = checksum(td.toDF())
    assert(checksum(IcebergTable.forPath(spark, s"$dir/ice2").toDF()) == srcSum,
      s"delta->iceberg sync diverged ($trace)")
    assert(checksum(HudiTable.forPath(spark, s"$dir/hudi2").toDF()) == srcSum,
      s"iceberg->hudi chained sync diverged ($trace)")
  }
}
