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

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** All WORD n-gram hashes of `s` (Broder w-shingling, with
    * multiplicity): whitespace-run tokenization, each n-token window
    * hashed as its canonical single-space join — the exact string
    * `array_to_string(tokens[i:i+n-1], ' ')` a DuckDB oracle states,
    * and the same window strings `DqFunctions.wordShingles` builds
    * (minus the distinct pass; minhash minima are
    * multiplicity-invariant). Short-text convention mirrors both:
    * fewer than n tokens → ONE hash of the whole token join (empty /
    * all-whitespace text → hash of the empty string). Windows whose
    * source bytes are already single-space-joined hash the original
    * byte span with zero copies — the corpus norm; multi-whitespace
    * gaps take the canonical-join slow path.
    */
  def wordNgramHashes(s: UTF8String, n: Int, hexDigits: Int, mod: Long): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token spans: starts(k) inclusive, ends(k) exclusive
    var numTokens = 0
    var i = 0
    var cap = 8
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (numTokens == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(numTokens) = st; ends(numTokens) = i
        numTokens += 1
      }
    }
    def joinHash(from: Int, until: Int): Long = {
      // single-space fast path: the byte span IS the canonical join.
      // The gap must be 1 byte wide AND that byte must be a literal
      // space — a lone '\t'/'\n' separator is the same width but needs
      // the canonical re-join (the raw span would hash non-portably).
      var singleSpaced = true
      var k = from
      while (singleSpaced && k < until - 1) {
        if (starts(k + 1) != ends(k) + 1 || bytes(ends(k)) != ' ') singleSpaced = false
        k += 1
      }
      if (from >= until) hash(bytes, 0, 0, hexDigits, mod)
      else if (singleSpaced)
        hash(bytes, starts(from), ends(until - 1) - starts(from), hexDigits, mod)
      else {
        var sz = until - from - 1 // the joining spaces
        k = from
        while (k < until) { sz += ends(k) - starts(k); k += 1 }
        val buf = new Array[Byte](sz)
        var o = 0
        k = from
        while (k < until) {
          if (k > from) { buf(o) = ' '; o += 1 }
          val tl = ends(k) - starts(k)
          System.arraycopy(bytes, starts(k), buf, o, tl)
          o += tl
          k += 1
        }
        hash(buf, 0, sz, hexDigits, mod)
      }
    }
    if (numTokens <= n)
      return new GenericArrayData(Array(joinHash(0, numTokens)))
    val count = numTokens - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) { out(j) = joinHash(j, j + n); j += 1 }
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

/** Array: md5-prefix hashes of every WORD n-gram window (Broder
  * w-shingling; see [[Md5Prefix.wordNgramHashes]]).
  */
case class WordNgramMd5Hashes(child: Expression, n: Int, hexDigits: Int, mod: Long)
    extends UnaryExpression {
  require(n >= 1 && hexDigits >= 1 && hexDigits <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngram_md5_hashes requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.wordNgramHashes(input.asInstanceOf[UTF8String], n, hexDigits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix.wordNgramHashes($s, $n, $hexDigits, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Expressions {
  def md5PrefixLong(s: Column, hexDigits: Int, mod: Long = 0L): Column =
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(s), hexDigits, mod))

  def ngramMd5Hashes(text: Column, n: Int, hexDigits: Int, mod: Long = 0L): Column =
    ColumnBridge.column(NgramMd5Hashes(ColumnBridge.expression(text), n, hexDigits, mod))

  def wordNgramMd5Hashes(text: Column, n: Int, hexDigits: Int, mod: Long = 0L): Column =
    ColumnBridge.column(WordNgramMd5Hashes(ColumnBridge.expression(text), n, hexDigits, mod))
}
