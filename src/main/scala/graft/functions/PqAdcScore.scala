package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `pq_adc_score(codes ARRAY<INT>, lut ARRAY<ARRAY<DOUBLE>>) → DOUBLE` —
  * asymmetric-distance (ADC) table scoring for product-quantized vectors
  * (Jégou et al., TPAMI 2011 §IV.A): with a per-query lookup table
  * `lut[j][c] = <centroid_{j,c}, q_j>` precomputed ONCE per query on the
  * broadcast side, a candidate's approximate dot product is just
  * `Σ_j lut[j][codes[j]]` — m table reads and adds per row instead of
  * reconstructing and re-dotting a full dim-length vector (m=8 adds vs
  * 64 multiplies + a concat allocation per candidate row).
  *
  * The same expression also scores the reconstruction's squared norm when
  * handed the query-independent table `lut[j][c] = |centroid_{j,c}|²`
  * (a plan literal), so the cosine denominator costs another m adds.
  *
  * Null semantics: null input, `codes`/`lut` length mismatch, null element,
  * or an out-of-range code → NULL (never an exception — a corrupt code is
  * data, not a crash).
  */
case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score requires (ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != lut.numElements()) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || lut.isNullAt(j)) return null
      val c = codes.getInt(j)
      val sub = lut.getArray(j)
      if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
      acc += sub.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc")
      val arrayData = classOf[ArrayData].getName
      s"""
        int $m = $a.numElements();
        if ($m != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $j = 0; $j < $m; $j++) {
            if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
            int $c = $a.getInt($j);
            $arrayData $sub = $b.getArray($j);
            if ($c < 0 || $c >= $sub.numElements() || $sub.isNullAt($c)) {
              ${ev.isNull} = true; break;
            }
            $acc += $sub.getDouble($c);
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
