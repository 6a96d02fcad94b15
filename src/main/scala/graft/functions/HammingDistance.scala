package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `hamming_distance(a BIGINT, b BIGINT) → BIGINT` — popcount(a XOR b).
  *
  * The SimHash near-dup pairing primitive (SURVEY §7.6.5 extensions). A
  * native Catalyst expression with `doGenCode` so it stays inside
  * whole-stage codegen on the hot pair-join path — one xor + one
  * `Long.bitCount` intrinsic per row, vs a boxed round trip for a Scala
  * UDF. Registered as SQL function `hamming_distance` by
  * [[graft.GraftExtensions]].
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hamming_distance requires BIGINT arguments, got (${left.dataType}, ${right.dataType})")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(long) java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
