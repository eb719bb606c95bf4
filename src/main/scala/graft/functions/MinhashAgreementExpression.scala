package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native minhash-agreement: fraction of equal components of two
  * signature arrays, in one primitive loop — replacing the
  * `zip_with` + `aggregate` HOF pair that materialized a boxed
  * 0/1 array per candidate PAIR before folding it (the band joins
  * score millions of pairs; JobProfile r21 measured the scoring
  * stages of one fold at ~17 CPU-seconds at sf0.1).
  *
  * Value-identical to the HOF form: components beyond the shorter
  * array's length can never be equal (zip_with padded with nulls and
  * the `when` yielded 0), null elements are never equal, and the
  * divisor is the LEFT signature's length, exactly as before. NULL in
  * either array column yields NULL.
  */
case class MinhashAgreementExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_agreement requires two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[ArrayData]
    val sb = b.asInstanceOf[ArrayData]
    val na = sa.numElements()
    val n = math.min(na, sb.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (!sa.isNullAt(i) && !sb.isNullAt(i) && sa.getLong(i) == sb.getLong(i))
        eq += 1
      i += 1
    }
    eq.toDouble / na.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sa, sb) => {
      val na = ctx.freshName("na"); val n = ctx.freshName("n")
      val eq = ctx.freshName("eq"); val i = ctx.freshName("i")
      s"""
         |int $na = $sa.numElements();
         |int $n = java.lang.Math.min($na, $sb.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$sa.isNullAt($i) && !$sb.isNullAt($i) &&
         |      $sa.getLong($i) == $sb.getLong($i)) $eq++;
         |}
         |${ev.value} = (double) $eq / (double) $na;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinhashAgreementExpression {
  def minhashAgreementNative(sigA: Column, sigB: Column): Column =
    ColumnBridge.column(MinhashAgreementExpr(
      ColumnBridge.expression(sigA), ColumnBridge.expression(sigB)))
}
