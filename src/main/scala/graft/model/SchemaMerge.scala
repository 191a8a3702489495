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

  /**
   * Widen the primitive at a dot-path anywhere in the schema along the
   * promotion order — the shared walker behind every format's nested
   * `widenColumn` (ref `IcebergSchemaSync.java:46-217` is fully
   * recursive through struct/list/map; a real table widens
   * `order.total` as often as `total`). Path grammar: struct fields by
   * name, array elements as `element`, map values as `value` (map KEYS
   * never widen — key identity is equality/partitioning-sensitive).
   *
   * `stamp` is invoked on the deepest StructField ancestor of the
   * widened primitive — AFTER its subtree was widened — with the
   * original narrow type and the container-tail fieldPath below that
   * field ("" when the field itself widened, "element"/"value" chains
   * otherwise). Delta hangs its `delta.typeChanges` history there (the
   * real feature's "nearest struct field" rule); Iceberg/Hudi pass the
   * default identity stamp. Field metadata (ids, histories) is
   * preserved on every field along the path.
   */
  def widenAt(schema: StructType, dotPath: String, to: DataType, context: String)(
      stamp: (StructField, DataType, String) => StructField = (f, _, _) => f): StructType = {
    val segs = dotPath.split('.').toSeq
    require(segs.nonEmpty && segs.forall(_.nonEmpty),
      s"bad column path '$dotPath' on $context")
    def requireWidens(from: DataType, at: String): Unit =
      require(widens(from, to),
        s"cannot widen $at of $context: ${from.simpleString} -> " +
          s"${to.simpleString} is not a supported type promotion")
    // descend a container chain; Some((from, fieldPath)) when the target
    // primitive was reached through containers only — the CALLING struct
    // field is then the stamp anchor; None when a deeper struct took it
    def descend(dt: DataType, rest: Seq[String], tail: Vector[String],
        at: String): (DataType, Option[(DataType, String)]) = (dt, rest) match {
      case (s: StructType, _) => (inStruct(s, rest, at), None)
      case (a: ArrayType, "element" +: more) =>
        if (more.isEmpty) {
          requireWidens(a.elementType, s"$at.element")
          (a.copy(elementType = to), Some((a.elementType, (tail :+ "element").mkString("."))))
        } else {
          val (nt, info) = descend(a.elementType, more, tail :+ "element", s"$at.element")
          (a.copy(elementType = nt), info)
        }
      case (m: MapType, "value" +: more) =>
        if (more.isEmpty) {
          requireWidens(m.valueType, s"$at.value")
          (m.copy(valueType = to), Some((m.valueType, (tail :+ "value").mkString("."))))
        } else {
          val (nt, info) = descend(m.valueType, more, tail :+ "value", s"$at.value")
          (m.copy(valueType = nt), info)
        }
      case _ => throw new IllegalArgumentException(
        s"bad column path '$dotPath' on $context: cannot descend '${rest.head}' " +
          s"into ${dt.simpleString} at $at")
    }
    def inStruct(st: StructType, segs: Seq[String], at: String): StructType = {
      val name = segs.head
      val here = if (at.isEmpty) name else s"$at.$name"
      val idx = st.fieldNames.indexOf(name)
      require(idx >= 0, s"no column $here in $context")
      val f = st.fields(idx)
      val nf =
        if (segs.tail.isEmpty) {
          requireWidens(f.dataType, here)
          stamp(f.copy(dataType = to), f.dataType, "")
        } else descend(f.dataType, segs.tail, Vector.empty, here) match {
          case (nt, Some((from, fp))) => stamp(f.copy(dataType = nt), from, fp)
          case (nt, None) => f.copy(dataType = nt)
        }
      StructType(st.fields.updated(idx, nf))
    }
    inStruct(schema, segs, "")
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
