package graft.model

import org.apache.spark.sql.types._

/**
 * Additive schema evolution shared by the Delta and Hudi write paths
 * (Iceberg has its own id-stamped variant in `IcebergSchemas.evolveSchema`):
 *
 *  - existing columns keep their position, metadata, and declared type;
 *  - a type change is legal only along the WIDENING order ([[widens]]:
 *    byte→short→int→long, float→double, decimal precision growth at the
 *    same scale — the promotion set every format in the sync plane can
 *    represent: Iceberg spec v2 "Schema Evolution", Delta's typeWidening
 *    table feature, Avro schema resolution for Hudi). A wider incoming
 *    type evolves the schema; a NARROWER incoming type keeps the wider
 *    declared type (the reader widens the physical values — Spark 4's
 *    parquet reader does this natively); anything else is rejected;
 *  - nullability only ever RELAXES (an append can never mark a column
 *    required over historical files that hold nulls);
 *  - an append missing an existing REQUIRED column is rejected — its
 *    files would lack a column the schema declares non-null;
 *  - columns new in the append join at the end.
 */
object SchemaMerge {

  /** Type equality ignoring nullability at every nesting level. */
  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = normalize(f.dataType), nullable = true, metadata = Metadata.empty)))
    case a: ArrayType => ArrayType(normalize(a.elementType), containsNull = true)
    case m: MapType => MapType(normalize(m.keyType), normalize(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Integer-widening rank; -1 for non-integers. */
  private def intRank(dt: DataType): Int = dt match {
    case ByteType => 0
    case ShortType => 1
    case IntegerType => 2
    case LongType => 3
    case _ => -1
  }

  /**
   * The cross-format type-promotion order: `from` values are exactly
   * representable as `to`. Intersection of Iceberg spec v2 promotions,
   * Delta typeWidening, and Avro resolution — so a widen at any sync
   * source is applicable at every target:
   * byte→short→int→long, float→double, decimal(p,s)→decimal(p',s) p'>p.
   * Strict: `widens(t, t)` is false.
   */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if intRank(f) >= 0 && intRank(t) >= 0 => intRank(f) < intRank(t)
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      f.scale == t.scale && f.precision < t.precision && t.precision <= 38
    case _ => false
  }

  /** Recursive type merge along the widening order: equal → existing;
    * incoming wider → incoming; incoming narrower → existing (never
    * narrow a declared schema); unrelated → reject. Structs merge
    * fieldwise on the shared fields; arrays/maps merge their element/
    * value types. */
  private def promote(ex: DataType, in: DataType, path: String, context: String): DataType =
    (ex, in) match {
      case (es: StructType, is: StructType) =>
        // shared nested fields promote; fields on either side only are
        // validated by the caller's top-level rules (nested adds ride
        // additive's equality today — keep nested field SETS equal)
        require(es.fieldNames.sorted.sameElements(is.fieldNames.sorted),
          s"append changes nested fields of $path on $context")
        StructType(es.fields.map { ef =>
          val inF = is.fields.find(_.name == ef.name).get
          ef.copy(dataType = promote(ef.dataType, inF.dataType, s"$path.${ef.name}", context))
        })
      case (ea: ArrayType, ia: ArrayType) =>
        ea.copy(elementType = promote(ea.elementType, ia.elementType, s"$path.element", context))
      case (em: MapType, im: MapType) =>
        require(normalize(em.keyType) == normalize(im.keyType),
          s"append changes map key type of $path on $context")
        em.copy(valueType = promote(em.valueType, im.valueType, s"$path.value", context))
      case _ if normalize(ex) == normalize(in) => ex
      case _ if widens(in, ex) => ex // narrower write into a widened column
      case _ if widens(ex, in) => in // widening evolution
      case _ => throw new IllegalArgumentException(
        s"append changes type of $path: ${ex.simpleString} -> ${in.simpleString} on $context")
    }

  def additive(existing: StructType, incoming: StructType, context: String): StructType = {
    existing.fields.foreach { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(_) => ()
        case None =>
          require(f.nullable,
            s"append is missing required column ${f.name} on $context")
      }
    }
    StructType(
      existing.fields.map { f =>
        incoming.fields.find(_.name == f.name) match {
          case Some(inF) => f.copy(
            dataType = promote(f.dataType, inF.dataType, f.name, context),
            nullable = f.nullable || inF.nullable)
          case None => f
        }
      } ++ incoming.fields.filterNot(x => existing.fieldNames.contains(x.name)))
  }
}
