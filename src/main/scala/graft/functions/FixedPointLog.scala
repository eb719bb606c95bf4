package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact fixed-point base-2 logarithm — the portability device that
  * lets log-probability sums live on HASHED oracle surfaces.
  *
  * The engine's no-transcendental rule (BASELINE.md: libm `ln` differs
  * by ulps between JVM and DuckDB, and one ulp breaks an exact-compare
  * gate) would normally ban LM log-probabilities outright. This
  * sidesteps it: `log2fpQ16(n)` ≈ log2(n)·2¹⁶ computed by a 16-step
  * INTEGER square-and-compare dag — deterministic truncating integer
  * arithmetic only, so DuckDB replays it bit-identically in a
  * recursive CTE (HUGEINT `//`), and any engine with 128-bit integer
  * multiply agrees exactly. Error vs true log2 is < 2⁻¹⁶ + truncation
  * — irrelevant for scoring; EXACTNESS of the stated dag is the point.
  *
  * Stated algorithm (n ≥ 1):
  *  - e = floor(log2 n) via bit length
  *  - x = trunc(n·2³² / 2ᵉ)  — n normalized into [1,2) in Q32
  *  - 16 times: x ← trunc(x²/2³²); if x ≥ 2³³ then x ← trunc(x/2),
  *    emit bit 1, else emit bit 0
  *  - result = e·2¹⁶ + (the 16 emitted bits)
  */
object FixedPointLog {

  /** log2(n) in Q16 fixed point. Requires n ≥ 1. */
  def log2fpQ16(n: Long): Long = {
    require(n >= 1L, s"log2fpQ16 requires n >= 1, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (e <= 32) n << (32 - e) else n >>> (e - 32)
    var frac = 0L
    var i = 0
    while (i < 16) {
      // x < 2^33 so x*x < 2^66: recover the 128-bit product's middle
      // 34 bits via multiplyHigh (values positive, no sign issues)
      val hi = java.lang.Math.multiplyHigh(x, x)
      val lo = x * x
      var y = (hi << 32) | (lo >>> 32)
      if (y >= 8589934592L) { y >>= 1; frac = frac * 2 + 1 }
      else frac = frac * 2
      x = y
      i += 1
    }
    e.toLong * 65536L + frac
  }

  /** log2(0.4) in the same Q16 scheme: e = −2, x₀ = trunc(1.6·2³²) =
    * 6871947673, then the identical 16-step dag. The Stupid-Backoff
    * discount literal shared with the oracle SQL. */
  val Log2Of04Q16: Long = -2L * 65536L + {
    var x = 6871947673L
    var frac = 0L
    var i = 0
    while (i < 16) {
      val hi = java.lang.Math.multiplyHigh(x, x)
      val lo = x * x
      var y = (hi << 32) | (lo >>> 32)
      if (y >= 8589934592L) { y >>= 1; frac = frac * 2 + 1 }
      else frac = frac * 2
      x = y
      i += 1
    }
    frac
  }

  /** The same algorithm as a DuckDB WITH-clause fragment: maps a
    * relation `nums(n)` (positive BIGINTs) to `lg(n, lq)`. `pw` is a
    * 63-row powers-of-two table (exact integer floor-log2 — no float
    * log anywhere near the surface); the recursion is the 16-step dag
    * on HUGEINT with truncating `//`.
    */
  def log2fpSqlCtes: String =
    s"""pw AS (
       |      SELECT CAST(p AS INTEGER) AS e,
       |        CAST(CAST(1 AS BIGINT) << p AS HUGEINT) AS v
       |      FROM (SELECT unnest(generate_series(0, 62)) AS p)),
       |    lgnorm AS (
       |      SELECT n, pe.e,
       |        CASE WHEN pe.e <= 32
       |          THEN CAST(n AS HUGEINT) * CAST(CAST(1 AS BIGINT) << (32 - pe.e) AS HUGEINT)
       |          ELSE CAST(n AS HUGEINT) // CAST(CAST(1 AS BIGINT) << (pe.e - 32) AS HUGEINT)
       |        END AS x0
       |      FROM nums
       |      JOIN LATERAL (SELECT max(e) AS e FROM pw WHERE v <= CAST(n AS HUGEINT)) pe ON true),
       |    lgiter(n, e, x, frac, i) AS (
       |      SELECT n, e, x0, CAST(0 AS BIGINT), 0 FROM lgnorm
       |      UNION ALL
       |      SELECT n, e,
       |        CASE WHEN (x*x) // 4294967296 >= 8589934592
       |          THEN ((x*x) // 4294967296) // 2 ELSE (x*x) // 4294967296 END,
       |        CASE WHEN (x*x) // 4294967296 >= 8589934592
       |          THEN frac*2 + 1 ELSE frac*2 END,
       |        i + 1
       |      FROM lgiter WHERE i < 16),
       |    lg AS (
       |      SELECT n, CAST(e AS BIGINT)*65536 + frac AS lq
       |      FROM lgiter WHERE i = 16)""".stripMargin
}

/** Column form of [[FixedPointLog.log2fpQ16]] — long in, long out,
  * null-propagating; whole-stage codegen via a static call. */
case class Log2FpQ16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"log2fp_q16 requires a bigint input, got ${child.dataType.simpleString}")
  override def nullSafeEval(n: Any): Any =
    FixedPointLog.log2fpQ16(n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FixedPointLog.log2fpQ16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Log2FpQ16 {
  def apply(c: Column): Column =
    ColumnBridge.column(Log2FpQ16(ColumnBridge.expression(c)))
}
