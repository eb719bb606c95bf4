package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hashing for the PORTABLE (oracle-checkable)
  * dedup paths.
  *
  * The compositional form — `conv(substring(md5(s), 1, h), 16, 10)`
  * — renders a 32-char hex string, substrings it, and parses it back
  * through string radix conversion, per shingle. These expressions
  * compute the identical value straight from the digest bytes: the
  * first h hex digits of md5 are the first ⌈h/2⌉ bytes big-endian
  * (shifted right 4 bits when h is odd). Bit-equal by construction —
  * DuckDB oracles stating `CAST(('0x' || substr(md5(x), 1, h)) AS
  * UBIGINT)` keep matching exactly.
  */
object Md5Prefix {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Value of the first `hexDigits` hex chars of md5(bytes[off,len)),
    * then `% mod` when mod > 0. hexDigits ≤ 15 keeps it nonnegative
    * in a signed long.
    */
  def hash(bytes: Array[Byte], off: Int, len: Int, hexDigits: Int, mod: Long): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val nBytes = (hexDigits + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    if ((hexDigits & 1) == 1) v >>>= 4
    if (mod > 0) v % mod else v
  }

  def hashString(s: UTF8String, hexDigits: Int, mod: Long): Long = {
    val b = s.getBytes
    hash(b, 0, b.length, hexDigits, mod)
  }

  /** All character n-gram hashes of `s` (with multiplicity — minhash
    * minima are multiplicity-invariant, so no dedup pass is needed),
    * windows over code points, one UTF-8 byte copy per row. Matches
    * `charShingles` short-text semantics: < n chars → one hash of the
    * whole (possibly empty) string.
    */
  def ngramHashes(s: UTF8String, n: Int, hexDigits: Int, mod: Long): GenericArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars <= n)
      return new GenericArrayData(Array(hash(bytes, 0, bytes.length, hexDigits, mod)))
    val starts = NgramHash.codePointStarts(bytes, numChars)
    val count = numChars - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      out(j) = hash(bytes, starts(j), starts(j + n) - starts(j), hexDigits, mod)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Scalar: first-h-hex-digits-of-md5 as long (mod optional). */
case class Md5PrefixLong(child: Expression, hexDigits: Int, mod: Long)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15, "1..15 hex digits fit a nonnegative long")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix_long requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.hashString(input.asInstanceOf[UTF8String], hexDigits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix.hashString($s, $hexDigits, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Array: md5-prefix hashes of every character n-gram window. */
case class NgramMd5Hashes(child: Expression, n: Int, hexDigits: Int, mod: Long)
    extends UnaryExpression {
  require(n >= 1 && hexDigits >= 1 && hexDigits <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_md5_hashes requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.ngramHashes(input.asInstanceOf[UTF8String], n, hexDigits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix.ngramHashes($s, $n, $hexDigits, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Expressions {
  def md5PrefixLong(s: Column, hexDigits: Int, mod: Long = 0L): Column =
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(s), hexDigits, mod))

  def ngramMd5Hashes(text: Column, n: Int, hexDigits: Int, mod: Long = 0L): Column =
    ColumnBridge.column(NgramMd5Hashes(ColumnBridge.expression(text), n, hexDigits, mod))
}
