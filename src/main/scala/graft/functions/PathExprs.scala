package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `unescape_path(col)` — Hive partition-path %XX unescaping as a plan
 * expression: the distributed twin of [[graft.util.PathCodec.unescapePathName]]
 * (same semantics: only a '%' followed by exactly two hex digits decodes;
 * '+' stays literal). Used by partition pruning over value-only Hudi
 * layouts so the plan-side filter compares DECODED segment values with
 * the raw wanted values — exactly what the driver-side parse does (ref
 * `core/.../hudi/HudiPartitionValuesExtractor.java:47-70`).
 */
final case class UnescapePath(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unescape_path needs a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.util.PathCodec.unescapePathName(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.util.PathCodec.unescapePathName($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UnescapePath =
    copy(child = newChild)
}
