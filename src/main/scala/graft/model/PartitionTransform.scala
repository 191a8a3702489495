package graft.model

import java.time.{LocalDate, LocalDateTime, YearMonth}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Time-based partition transforms — the machinery both format codecs and
 * the sync engine share (ref `core/.../delta/DeltaPartitionExtractor.java:104-524`,
 * `core/.../iceberg/IcebergPartitionValueConverter.java:74-238`, and the
 * `path:type:format` specs of `api/.../model/schema/OnePartitionField.java`).
 *
 * Canonical (cross-format) partition VALUE form is the human string of
 * the granularity's pattern — `yyyy`, `yyyy-MM`, `yyyy-MM-dd`,
 * `yyyy-MM-dd-HH` — which is also what hive-style directory names carry.
 * Delta stores that string directly (its generated-column serialization);
 * Iceberg converts it to/from the spec's ordinal ints (years/months since
 * 1970, days/hours since epoch) at its codec boundary. All four forms
 * order lexicographically within a granularity, so string range compare
 * is a correct prune.
 */
sealed abstract class TimeGranularity(val name: String, val pattern: String)

object TimeGranularity {
  case object Year  extends TimeGranularity("year", "yyyy")
  case object Month extends TimeGranularity("month", "yyyy-MM")
  case object Day   extends TimeGranularity("day", "yyyy-MM-dd")
  case object Hour  extends TimeGranularity("hour", "yyyy-MM-dd-HH")
  val all: Seq[TimeGranularity] = Seq(Year, Month, Day, Hour)
  def forName(n: String): TimeGranularity = all.find(_.name == n)
    .getOrElse(throw new IllegalArgumentException(s"unknown time granularity: $n"))
}

/** One parsed partition field: identity column, or a time transform of a
  * source column materialized under `fieldName`. */
final case class PartitionFieldDef(
    sourceColumn: String,
    transform: String,
    nameOverride: Option[String] = None) {

  def isIdentity: Boolean = transform == "identity"
  def isTime: Boolean = TimeGranularity.all.exists(_.name == transform)
  /** Iceberg-only transforms (spec strings `bucket[N]` / `truncate[W]`;
    * the reference rejects them — `IcebergPartitionSpecExtractor
    * .java:81-108` — this engine supports them for Iceberg tables). */
  def isBucket: Boolean = transform.startsWith("bucket[")
  def isTruncate: Boolean = transform.startsWith("truncate[")
  /** N of bucket[N] / W of truncate[W]. */
  def transformParam: Int =
    "\\[(\\d+)\\]".r.findFirstMatchIn(transform).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"no [param] in $transform"))
  def granularity: TimeGranularity = {
    require(isTime, s"'$transform' is not a time transform (bucket/truncate " +
      "partition transforms are Iceberg-only and carry no time granularity)")
    TimeGranularity.forName(transform)
  }
  def fieldName: String =
    nameOverride.getOrElse(
      if (isIdentity) sourceColumn
      else if (isBucket) s"${sourceColumn}_bucket"
      else if (isTruncate) s"${sourceColumn}_trunc"
      else s"${sourceColumn}_$transform")
  /** Spec string form, `src` / `month(src)` / `month(src) as name`. */
  def spec: String =
    if (isIdentity) sourceColumn
    else {
      val base = s"$transform($sourceColumn)"
      if (nameOverride.forall(_ == fieldName) && fieldName == defaultName) base
      else s"$base as $fieldName"
    }
  private def defaultName: String = copy(nameOverride = None).fieldName
}

object PartitionTransform {

  private val SpecRe = """(?i)\s*(year|month|day|hour)\s*\(\s*([^)\s]+)\s*\)\s*(?:as\s+(\S+))?\s*""".r
  private val ParamRe = """(?i)\s*(bucket|truncate)\s*\[\s*(\d+)\s*\]\s*\(\s*([^)\s]+)\s*\)\s*(?:as\s+(\S+))?\s*""".r
  private val IdentityRe = """(?i)\s*identity\s*\(\s*([^)\s]+)\s*\)\s*""".r
  // the reference CLI's `path:type:format` shape (ref
  // `api/.../model/schema/OnePartitionField` spec strings), e.g.
  // `o_orderdate:MONTH:yyyy-MM` or `region:VALUE`
  private val CliRe = """\s*([^:()\s]+):(?i:(VALUE|YEAR|MONTH|DAY|HOUR))(?::([^:\s]+))?\s*""".r

  /** Parse `col`, `identity(col)`, `year(col)` … `hour(col) as name`,
    * plus the reference CLI form `path:type[:format]`. */
  def parse(spec: String): PartitionFieldDef = spec match {
    case SpecRe(t, c, n)     => PartitionFieldDef(c, t.toLowerCase, Option(n))
    case ParamRe(t, p, c, n) =>
      require(p.toInt > 0, s"$t width must be positive: $spec")
      PartitionFieldDef(c, s"${t.toLowerCase}[${p.toInt}]", Option(n))
    case IdentityRe(c)       => PartitionFieldDef(c, "identity")
    case CliRe(c, t, fmt) =>
      if (t.equalsIgnoreCase("VALUE")) PartitionFieldDef(c, "identity")
      else {
        val g = TimeGranularity.forName(t.toLowerCase)
        require(fmt == null || fmt == g.pattern,
          s"format '$fmt' does not match ${g.name}'s canonical '${g.pattern}'")
        PartitionFieldDef(c, g.name)
      }
    case c => PartitionFieldDef(c.trim, "identity")
  }

  def parseAll(specs: Seq[String]): Seq[PartitionFieldDef] = specs.map(parse)

  /** Column producing the canonical value string from the source column
    * (codegen'd `date_format` / substring; native murmur3 for bucket —
    * no UDF). */
  def valueExpr(d: PartitionFieldDef): Column =
    if (d.isIdentity) col(d.sourceColumn)
    else if (d.isBucket)
      expr(s"iceberg_bucket(`${d.sourceColumn}`, ${d.transformParam})")
    else if (d.isTruncate) substring(col(d.sourceColumn), 1, d.transformParam)
    else date_format(col(d.sourceColumn), d.granularity.pattern)

  /** Delta generated-column expression for this transform — the
    * reference's emission convention (ref
    * `DeltaPartitionExtractor.java:227-323`). */
  def deltaGenerationExpr(d: PartitionFieldDef): String =
    s"DATE_FORMAT(${d.sourceColumn}, '${d.granularity.pattern}')"

  private val GenYearRe  = """(?i)\s*YEAR\s*\(\s*([^)\s]+)\s*\)\s*""".r
  private val GenFmtRe   = """(?i)\s*DATE_FORMAT\s*\(\s*([^,\s]+)\s*,\s*'([^']+)'\s*\)\s*""".r
  private val GenCastRe  = """(?i)\s*CAST\s*\(\s*([^)\s]+)\s+AS\s+DATE\s*\)\s*""".r

  /** Inverse of [[deltaGenerationExpr]] (+ the `CAST(c AS DATE)` day
    * form real Delta writers emit): expression → transform, or None if
    * the expression isn't a recognized time transform. */
  def parseDeltaGenerationExpr(name: String, e: String): Option[PartitionFieldDef] = e match {
    case GenYearRe(c) => Some(PartitionFieldDef(c, "year", Some(name)))
    case GenCastRe(c) => Some(PartitionFieldDef(c, "day", Some(name)))
    case GenFmtRe(c, p) =>
      TimeGranularity.all.find(_.pattern == p).map(g =>
        PartitionFieldDef(c, g.name, Some(name)))
    case _ => None
  }

  // --------------------------------------------- value form conversions

  private def fmt(g: TimeGranularity) = DateTimeFormatter.ofPattern(g.pattern)

  /** Canonical string → Iceberg ordinal (years/months since 1970,
    * days/hours since epoch — Iceberg spec Appendix; ref
    * `IcebergPartitionValueConverter.java:74-137`). */
  def toOrdinal(g: TimeGranularity, s: String): Int = g match {
    case TimeGranularity.Year  => s.toInt - 1970
    case TimeGranularity.Month =>
      val ym = YearMonth.parse(s, fmt(g)); (ym.getYear - 1970) * 12 + ym.getMonthValue - 1
    case TimeGranularity.Day   => LocalDate.parse(s, fmt(g)).toEpochDay.toInt
    case TimeGranularity.Hour  =>
      val dt = LocalDateTime.parse(s, fmt(g))
      (dt.toLocalDate.toEpochDay * 24 + dt.getHour).toInt
  }

  /** Iceberg ordinal → canonical string. */
  def fromOrdinal(g: TimeGranularity, ord: Int): String = g match {
    case TimeGranularity.Year  => (ord + 1970).toString
    case TimeGranularity.Month =>
      YearMonth.of(1970 + Math.floorDiv(ord, 12), Math.floorMod(ord, 12) + 1).format(fmt(g))
    case TimeGranularity.Day   => LocalDate.ofEpochDay(ord.toLong).format(fmt(g))
    case TimeGranularity.Hour  =>
      LocalDateTime.ofEpochSecond(ord.toLong * 3600, 0, java.time.ZoneOffset.UTC).format(fmt(g))
  }

  /** Truncate a timestamp/date literal (`yyyy-MM-dd[ HH[:mm[:ss]]]`, or
    * epoch-micros for canonical stat strings) to this granularity's
    * canonical string — how a range predicate on the SOURCE column maps
    * to a partition-value range. */
  def truncate(g: TimeGranularity, v: String): String = {
    val t = v.trim
    val dt: LocalDateTime =
      if (t.matches("-?\\d{10,}")) // canonical epoch-micros
        LocalDateTime.ofEpochSecond(Math.floorDiv(t.toLong, 1000000L),
          (Math.floorMod(t.toLong, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      else if (t.matches("\\d{4}")) LocalDate.of(t.toInt, 1, 1).atStartOfDay
      else if (t.matches("\\d{4}-\\d{2}")) YearMonth.parse(t).atDay(1).atStartOfDay
      else if (t.length <= 10) LocalDate.parse(t).atStartOfDay
      else LocalDateTime.parse(t.replace(' ', 'T').take(19))
    dt.format(fmt(g))
  }
}
