package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-bit SimHash from a token-hash array: one pass updating
  * 64 bit-counters in a primitive int[], replacing 64 `aggregate`
  * HOF folds (each re-walking the boxed array) per row.
  *
  * Bit-identical to `Dedup.simhashFromHashes`: counter j sums ±1 by
  * bit j of each hash; result bit j set iff the sum is positive.
  * Null array → null; null elements are skipped (the HOF's `+ when`
  * never sees them in practice — tokens are never null).
  */
case class SimhashFromHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_from_hashes requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var j = 0
        while (j < 64) {
          counts(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hashes => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val counts = ctx.freshName("counts"); val sim = ctx.freshName("sim")
      s"""
         |int $n = $hashes.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hashes.isNullAt($i)) {
         |    long $h = $hashes.getLong($i);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $counts[$j] += ((($h >>> $j) & 1L) != 0L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sim = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sim |= (1L << $j);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpression {
  def simhashFromHashesNative(hashes: Column): Column =
    ColumnBridge.column(SimhashFromHashesExpr(ColumnBridge.expression(hashes)))
}
