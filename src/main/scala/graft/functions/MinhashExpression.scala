package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-MinHash from a base-hash array: one pass over the
  * elements updating all k minima in a primitive long[] — replaces k
  * separate `transform`+`array_min` HOF passes (k array allocations
  * and k×n boxed longs per row).
  *
  * Identical results to the HOF composition on all reachable inputs:
  * min over (aᵢ·h + bᵢ) mod p is iteration-order independent, and the
  * affine math is the same 64-bit integer arithmetic (h < p < 2³¹ so
  * aᵢ·h + bᵢ < 2⁶², no overflow). Null/empty input array → null.
  */
case class MinhashFromBase(
    child: Expression,
    coeffA: Array[Long],
    coeffB: Array[Long],
    prime: Long)
    extends UnaryExpression {

  require(coeffA.length == coeffB.length && coeffA.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_from_base requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val base = input.asInstanceOf[ArrayData]
    val n = base.numElements()
    if (n == 0) return null
    val k = coeffA.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!base.isNullAt(i)) {
        val h = base.getLong(i)
        var j = 0
        while (j < k) {
          val v = (coeffA(j) * h + coeffB(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    val arrayDataCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, base => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $base.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[${coeffA.length}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$base.isNullAt($i)) {
         |      long $h = $base.getLong($i);
         |      for (int $j = 0; $j < ${coeffA.length}; $j++) {
         |        long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |        if ($v < $mins[$j]) $mins[$j] = $v;
         |      }
         |    }
         |  }
         |  if ($mins[0] == Long.MAX_VALUE) { ${ev.isNull} = true; }
         |  else { ${ev.value} = new $arrayDataCls($mins); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashExpression {
  /** Column wrapper over precomputed base hashes (see
    * DqFunctions.minhashBaseHashes).
    */
  def minhashFromBaseNative(baseHashes: Column, k: Int): Column = {
    val coeffs = DqFunctions.minhashCoeffs(k)
    ColumnBridge.column(MinhashFromBase(
      ColumnBridge.expression(baseHashes),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray,
      DqFunctions.MinhashPrime))
  }
}
