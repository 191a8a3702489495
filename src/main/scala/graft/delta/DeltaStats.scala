package graft.delta

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._

import graft.model.ColumnStatRow
import graft.stats.FileFooterStats

/**
 * Delta `add.stats` JSON emission: `{"numRecords":N,"minValues":{...},
 * "maxValues":{...},"nullCount":{...}}`, typed per the table schema.
 * Mirrors the reference's stats serialization incl. the scalar-only rule
 * (ref `core/.../delta/DeltaStatsExtractor.java:60-74,83-174` — nested
 * map/array/struct fields carry no stats) and the canonical value forms
 * of `DeltaValueConverter.convertToDeltaColumnStatValue` (timestamps as
 * ISO-8601 UTC, dates as yyyy-MM-dd).
 */
object DeltaStats {
  private val mapper = new ObjectMapper()
  private val tsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXXX").withZone(ZoneOffset.UTC)

  private def isScalar(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType | BinaryType => false
    case _ => true
  }

  def toJson(st: FileFooterStats, dataSchema: StructType): String = {
    val root = mapper.createObjectNode()
    root.put("numRecords", st.recordCount)
    val minN = root.putObject("minValues")
    val maxN = root.putObject("maxValues")
    val nullN = root.putObject("nullCount")
    val byName = st.columns.map(c => c.column -> c).toMap
    dataSchema.fields.filter(f => isScalar(f.dataType)).foreach { f =>
      byName.get(f.name).foreach { c =>
        if (c.numNulls >= 0) nullN.put(f.name, c.numNulls)
        def emit(node: com.fasterxml.jackson.databind.node.ObjectNode, v: String): Unit =
          f.dataType match {
            case LongType | IntegerType | ShortType | ByteType => node.put(f.name, v.toLong)
            case DoubleType => node.put(f.name, v.toDouble)
            case FloatType  => node.put(f.name, v.toFloat)
            case BooleanType => node.put(f.name, v.toBoolean)
            case _: DecimalType => node.put(f.name, new java.math.BigDecimal(v))
            case TimestampType | TimestampNTZType =>
              // canonical epoch-micros -> ISO-8601 UTC
              val micros = v.toLong
              node.put(f.name, tsFormat.format(
                Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
                  Math.floorMod(micros, 1000000L) * 1000L)))
            case DateType =>
              node.put(f.name, LocalDate.ofEpochDay(v.toLong).toString)
            case _ => node.put(f.name, v)
          }
        c.minValue.foreach(emit(minN, _))
        c.maxValue.foreach(emit(maxN, _))
      }
    }
    mapper.writeValueAsString(root)
  }

  /**
   * Inverse of [[toJson]]: parse an `add.stats` JSON back into the
   * engine's canonical stat-string forms (dates → epoch-days,
   * timestamps → epoch-micros) so stats can be TRANSLATED into another
   * format's metadata without re-reading parquet footers — the
   * reference's sync contract (ref
   * `core/.../delta/DeltaValueConverter.java:57-94`).
   */
  def fromJson(json: String, dataSchema: StructType): (Long, Seq[ColumnStatRow]) = {
    val root = mapper.readTree(json)
    val numRecords = Option(root.get("numRecords")).map(_.asLong()).getOrElse(-1L)
    val minN = root.get("minValues")
    val maxN = root.get("maxValues")
    val nullN = root.get("nullCount")
    def canonical(f: StructField, n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
      if (n == null || n.isNull) None
      else Some(f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => n.asLong().toString
        case DoubleType | FloatType => n.asDouble().toString
        case BooleanType => n.asBoolean().toString
        case _: DecimalType => n.decimalValue().toPlainString
        case TimestampType | TimestampNTZType =>
          val i = java.time.OffsetDateTime.parse(n.asText()).toInstant
          (Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
            i.getNano / 1000L)).toString
        case DateType => LocalDate.parse(n.asText()).toEpochDay.toString
        case _ => n.asText()
      })
    // recurse into structs: Delta nests stats under the struct key, the
    // canonical model wants flat dot-paths (ref `DeltaStatsExtractor
    // .java:215-240` flattenStatMap); arrays/maps carry no stats
    // (scalar-only eligibility, ref `FIELD_TYPES_WITH_STATS_SUPPORT`)
    type Node = com.fasterxml.jackson.databind.JsonNode
    def sub(n: Node, name: String): Node = if (n == null) null else n.get(name)
    def walk(fields: Seq[StructField], prefix: String,
        mnN: Node, mxN: Node, nlN: Node): Seq[ColumnStatRow] =
      fields.flatMap { f =>
        val path = prefix + f.name
        f.dataType match {
          case st: StructType =>
            walk(st.fields.toSeq, path + ".", sub(mnN, f.name), sub(mxN, f.name), sub(nlN, f.name))
          case _: ArrayType | _: MapType => Seq.empty
          case _ =>
            val mn = canonical(f, sub(mnN, f.name))
            val mx = canonical(f, sub(mxN, f.name))
            val nulls = if (sub(nlN, f.name) == null) -1L else sub(nlN, f.name).asLong()
            if (mn.isEmpty && mx.isEmpty && nulls < 0) Seq.empty
            else Seq(ColumnStatRow(
              column = path, minValue = mn, maxValue = mx,
              numNulls = nulls,
              // TOTAL value count including nulls — what parquet footers
              // carry and what Iceberg's value_counts means
              numValues = numRecords,
              totalSize = 0L))
        }
      }
    (numRecords, walk(dataSchema.fields.toSeq, "", minN, maxN, nullN))
  }
}
