package graft.delta

import org.scalatest.funsuite.AnyFunSuite

class DeltaActionCodecSpec extends AnyFunSuite {

  private def roundTrip(a: DeltaAction): DeltaAction =
    DeltaActionCodec.fromJsonLine(DeltaActionCodec.toJsonLine(a)).get

  test("protocol round-trips") {
    assert(roundTrip(Protocol(1, 4)) == Protocol(1, 4))
  }

  test("metaData round-trips with configuration and partition columns") {
    val m = DeltaMetadata(
      id = "abc", schemaString = """{"type":"struct","fields":[]}""",
      partitionColumns = Seq("year", "month"),
      configuration = Map("k1" -> "v1", "k2" -> "v2"),
      createdTime = 123L, name = Some("t"))
    assert(roundTrip(m) == m)
  }

  test("add round-trips with stats and partition values") {
    val a = AddFile(
      path = "year=2021/part-0.parquet",
      partitionValues = Map("year" -> "2021"),
      size = 1024L, modificationTime = 99L, dataChange = true,
      stats = Some("""{"numRecords":10}"""))
    assert(roundTrip(a) == a)
  }

  test("add with null partition value survives") {
    val a = AddFile("p.parquet", Map("year" -> null), 1L, 2L, dataChange = true)
    assert(roundTrip(a) == a)
  }

  test("remove round-trips") {
    val r = RemoveFile("p.parquet", 77L, dataChange = true)
    assert(roundTrip(r) == r)
  }

  test("commitInfo round-trips") {
    val c = CommitInfo(5L, "APPEND", Map("mode" -> "Append"))
    assert(roundTrip(c) == c)
  }

  test("unknown action lines are ignored") {
    assert(DeltaActionCodec.fromJsonLine("""{"txn":{"appId":"x"}}""").isEmpty)
  }
}
