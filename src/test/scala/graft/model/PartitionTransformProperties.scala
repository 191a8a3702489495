package graft.model

import java.time.{LocalDateTime, ZoneOffset}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property round-trips for the shared partition-transform machinery
 * (SURVEY.md §2.7): spec strings, the reference CLI form, Delta
 * generated-column expressions, Iceberg ordinals, and predicate
 * truncation — the conversions the reference implements 3× and tests
 * with examples (ref `DeltaPartitionExtractor.java:104-524`,
 * `IcebergPartitionValueConverter.java:74-238`).
 */
object PartitionTransformProperties extends Properties("PartitionTransform") {

  private val colGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)).map("c_" + _)
  private val granGen: Gen[TimeGranularity] = Gen.oneOf(TimeGranularity.all)
  private val defGen: Gen[PartitionFieldDef] = for {
    c <- colGen
    t <- Gen.oneOf("identity" +: TimeGranularity.all.map(_.name))
    n <- Gen.option(colGen.map("p_" + _))
  } yield PartitionFieldDef(c, t, if (t == "identity") None else n)

  property("spec string round-trips through parse") = forAll(defGen) { d =>
    PartitionTransform.parse(d.spec) == d ||
      // an override equal to the default name is normalized away
      (d.nameOverride.contains(s"${d.sourceColumn}_${d.transform}") &&
        PartitionTransform.parse(d.spec) == d.copy(nameOverride = None))
  }

  property("reference CLI form path:TYPE[:format] parses") =
    forAll(colGen, granGen) { (c, g) =>
      PartitionTransform.parse(s"$c:${g.name.toUpperCase}") ==
        PartitionFieldDef(c, g.name) &&
        PartitionTransform.parse(s"$c:${g.name.toUpperCase}:${g.pattern}") ==
          PartitionFieldDef(c, g.name) &&
        PartitionTransform.parse(s"$c:VALUE") == PartitionFieldDef(c, "identity")
    }

  property("delta generation expression round-trips") = forAll(defGen) { d =>
    d.isIdentity || {
      val back = PartitionTransform.parseDeltaGenerationExpr(
        d.fieldName, PartitionTransform.deltaGenerationExpr(d))
      back.exists(b => b.sourceColumn == d.sourceColumn && b.transform == d.transform &&
        b.fieldName == d.fieldName)
    }
  }

  // ordinals spanning 1900..2199 for every granularity
  private val ordCase: Gen[(TimeGranularity, Int)] = granGen.flatMap {
    case g @ TimeGranularity.Year  => Gen.choose(-70, 229).map((g, _))
    case g @ TimeGranularity.Month => Gen.choose(-70 * 12, 230 * 12 - 1).map((g, _))
    case g @ TimeGranularity.Day   => Gen.choose(-25567, 83964).map((g, _))
    case g @ TimeGranularity.Hour  => Gen.choose(-25567 * 24, 83964 * 24).map((g, _))
  }

  property("iceberg ordinal round-trips through the canonical string") =
    forAll(ordCase) { case (g, ord) =>
      PartitionTransform.toOrdinal(g, PartitionTransform.fromOrdinal(g, ord)) == ord
    }

  private val microsGen: Gen[Long] =
    Gen.choose(-2208988800L, 7258118399L).map(_ * 1000000L) // 1900..2199, whole seconds

  property("truncate agrees across literal and epoch-micros forms") =
    forAll(granGen, microsGen) { (g, micros) =>
      val dt = LocalDateTime.ofEpochSecond(micros / 1000000L, 0, ZoneOffset.UTC)
      val literal = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
        f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
      val a = PartitionTransform.truncate(g, literal)
      val b = PartitionTransform.truncate(g, micros.toString)
      a == b && PartitionTransform.fromOrdinal(g, PartitionTransform.toOrdinal(g, a)) == a
    }
}
