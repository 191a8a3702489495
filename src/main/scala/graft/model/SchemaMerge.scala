package graft.model

import org.apache.spark.sql.types._

/**
 * Additive schema evolution shared by the Delta and Hudi write paths
 * (Iceberg has its own id-stamped variant in `IcebergSchemas.evolveSchema`):
 *
 *  - existing columns keep their position, metadata, and declared type;
 *  - a type change (ignoring nullability) is rejected;
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

  def additive(existing: StructType, incoming: StructType, context: String): StructType = {
    existing.fields.foreach { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(inF) =>
          require(normalize(inF.dataType) == normalize(f.dataType),
            s"append changes type of ${f.name}: ${f.dataType.simpleString} -> " +
              s"${inF.dataType.simpleString} on $context")
        case None =>
          require(f.nullable,
            s"append is missing required column ${f.name} on $context")
      }
    }
    StructType(
      existing.fields.map { f =>
        incoming.fields.find(_.name == f.name) match {
          case Some(inF) => f.copy(nullable = f.nullable || inF.nullable)
          case None => f
        }
      } ++ incoming.fields.filterNot(x => existing.fieldNames.contains(x.name)))
  }
}
