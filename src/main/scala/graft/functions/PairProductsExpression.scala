package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Upper-triangle pair products of a quantized vector — the dim²/2
  * hot loop of the embedding covariance matrix
  * ([[graft.operators.Profiling.embeddingCovariance]]), as ONE native
  * expression: input `array<long>` w, output
  * `array<struct<i:int, j:int, wij:long>>` with one entry per i < j
  * and `wij = w(i)·w(j)`.
  *
  * The HOF spelling — nested `transform` over index `sequence`s with
  * `element_at`, then `flatten` — is semantically identical but pays
  * interpreted-lambda and boxing overhead per ELEMENT of the dim²/2
  * expansion (higher-order functions don't participate in whole-stage
  * codegen), which made the covariance query the most expensive in
  * the bench. This expression is the same two nested loops in
  * straight-line Java (and a matching interpreted eval), feeding
  * Spark's codegen'd `explode`. Equality with the HOF composition is
  * spec-pinned.
  *
  * Null array → null; any null element → null (HOF parity: a null
  * element poisons every product it touches; the covariance contract
  * requires dense vectors, so poisoning the row loudly beats a
  * silently sparser matrix).
  */
case class UpperTrianglePairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_products requires array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("wij", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val wi = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](i, j, wi * arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrayDataCls = classOf[GenericArrayData].getName
    val rowCls = classOf[GenericInternalRow].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val wi = ctx.freshName("wi"); val out = ctx.freshName("out")
      val bad = ctx.freshName("hasNull")
      s"""
         |int $n = $arr.numElements();
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  Object[] $out = new Object[$n * ($n - 1) / 2];
         |  int $k = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $wi = $arr.getLong($i);
         |    for (int $j = $i + 1; $j < $n; $j++) {
         |      $out[$k++] = new $rowCls(new Object[] {
         |        java.lang.Integer.valueOf($i), java.lang.Integer.valueOf($j),
         |        java.lang.Long.valueOf($wi * $arr.getLong($j)) });
         |    }
         |  }
         |  ${ev.value} = new $arrayDataCls($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UpperTrianglePairs {
  def apply(c: Column): Column = ColumnBridge.column(
    UpperTrianglePairs(ColumnBridge.expression(c)))
}
