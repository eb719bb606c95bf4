package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-n-gram hashes of a string in ONE pass over its
  * UTF-8 bytes: walks code-point boundaries, hashes each n-char
  * window's byte slice in place (no substring copies, no string hash
  * set), sorts, dedups.
  *
  * Hash-equal to the composed pipeline
  * `transform(charShingles(text, n), g => xxhash64(g))` — both hash
  * the identical UTF-8 byte slices with XXH64 seed 42 — so swapping
  * it into the set-similarity join changes no result (spec-pinned as
  * sets). Short-input edge matches `charShingles`: fewer than n chars
  * → one hash of the whole (possibly empty) string.
  */
case class DistinctNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_ngram_hashes requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramHash.distinctHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramHash.distinctHashes($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHash {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Byte offset of each code-point start, plus an end sentinel —
    * the window-boundary walk shared with [[Md5Prefix.ngramHashes]]
    * so the `charShingles` windowing contract lives in one place.
    */
  def codePointStarts(bytes: Array[Byte], numChars: Int): Array[Int] = {
    val starts = new Array[Int](numChars + 1)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      starts(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    starts(numChars) = bytes.length
    starts
  }

  /** Core loop, shared by eval and generated code. */
  def distinctHashes(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars <= n)
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)))
    val starts = codePointStarts(bytes, numChars)
    val count = numChars - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      out(j) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + starts(j), starts(j + n) - starts(j), Seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    var m = 0
    var k = 0
    while (k < count) {
      if (k == 0 || out(k) != out(k - 1)) { out(m) = out(k); m += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object NgramHashExpression {
  /** Column wrapper: distinct n-gram XXH64 hashes of a string. */
  def distinctNgramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(DistinctNgramHashes(ColumnBridge.expression(text), n))
}
