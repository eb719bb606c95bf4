package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair encoding applied as a column operator.
  *
  * Tokenization = pre-tokenize (lowercase, `[[BpeVocab.PretokenRegex]]`)
  * then per word run the standard BPE merge loop: repeatedly find the
  * adjacent symbol pair with the LOWEST merge rank and merge all its
  * occurrences left-to-right non-overlapping, until no listed pair
  * remains. The merge list is the vocabulary ([[BpeVocab]] trains and
  * documents the default).
  *
  * 100 TB design: a map-side whole-stage-codegen expression — no
  * shuffle, no dictionary materialization. The distinct-word
  * dictionary trick (words are Zipf-distributed, so per-word work
  * repeats constantly) is realized as a bounded PER-THREAD memo
  * inside the encoder instead of a groupBy: dictionary-speed without
  * paying a corpus-wide shuffle, and executor-local so a 1000-node
  * cluster needs no coordination. The encoder object travels with the
  * serialized plan (codegen pins it via `addReferenceObj`).
  */
final class BpeEncoder(val merges: Seq[(String, String)]) extends Serializable {

  // refuse ill-ordered tables at construction: the engine's
  // all-occurrences-per-pass loop and the oracle's lowest-rank-replace
  // replay agree exactly ONLY on rank-well-formed tables
  BpeVocab.validateMerges(merges)

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      // a symbol never contains a space (the pre-tokenizer strips
      // whitespace), so "a b" is an unambiguous pair key
      m.put(a + " " + b, Int.box(i))
    }
    m
  }
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  @transient private lazy val pretoken =
    java.util.regex.Pattern.compile(BpeVocab.PretokenRegex)

  /** Per-thread bounded word→tokens memo (Zipf ⇒ high hit rate). */
  @transient private lazy val memo =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean =
            size() > 65536
        }
    }

  /** BPE merge loop over one pre-token (no memo — [[encodeWord]]). */
  private def mergeLoop(w: String): Array[String] = {
    // initial symbols: code points (matches the oracle's regexp '.')
    var syms = new Array[String](w.codePointCount(0, w.length))
    var ci = 0; var si = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      syms(si) = new String(Character.toChars(cp))
      si += 1; ci += Character.charCount(cp)
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = mergeArr(bestRank)
        val out = new java.util.ArrayList[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out.add(a + b); j += 2
          } else { out.add(syms(j)); j += 1 }
        }
        syms = out.toArray(new Array[String](out.size()))
        done = syms.length < 2
      }
    }
    syms
  }

  /** Tokens of ONE pre-token (memoized). */
  def encodeWord(w: String): Array[String] = {
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) hit
    else { val t = mergeLoop(w); m.put(w, t); t }
  }

  /** All BPE tokens of a text (pre-tokenize, then encode each word). */
  def encode(text: String): Array[String] = {
    val out = new java.util.ArrayList[String]()
    val m = pretoken.matcher(text.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) {
      val toks = encodeWord(m.group())
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    out.toArray(new Array[String](out.size()))
  }

  /** Token count of a text — the hot path (no token array built). */
  def tokenCount(text: UTF8String): Int = {
    var n = 0
    val m = pretoken.matcher(text.toString.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) n += encodeWord(m.group()).length
    n
  }

  /** Tokens as Catalyst array data (the [[BpeTokens]] codegen call). */
  def tokensArray(text: UTF8String): GenericArrayData =
    new GenericArrayData(
      encode(text.toString).map(UTF8String.fromString(_): Any))
}

/** Shared shape of the two BPE expressions: string input, encoder
  * reference pinned into generated code. */
sealed abstract class BpeExpressionBase extends UnaryExpression {
  def merges: Seq[(String, String)]

  @transient protected lazy val encoder = new BpeEncoder(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BPE expressions require a string input, got ${child.dataType.simpleString}")

  /** The generated-code call on the pinned encoder reference. */
  protected def call(enc: String, c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => call(enc, c))
  }
}

/** Number of real BPE tokens in a string column. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends BpeExpressionBase {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(s: Any): Any =
    encoder.tokenCount(s.asInstanceOf[UTF8String])
  override protected def call(enc: String, c: String): String =
    s"$enc.tokenCount($c)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The BPE token sequence of a string column (array<string>). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends BpeExpressionBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    encoder.tokensArray(s.asInstanceOf[UTF8String])
  override protected def call(enc: String, c: String): String =
    s"$enc.tokensArray($c)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bpe {
  /** Real BPE token count (default = the embedded trained vocab). */
  def bpeTokenCount(text: Column,
      merges: Seq[(String, String)] = BpeVocab.default): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), merges))

  /** Real BPE token sequence. */
  def bpeTokens(text: Column,
      merges: Seq[(String, String)] = BpeVocab.default): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text), merges))
}

/** Per-row Stupid Backoff score of a string column against a collected
  * [[graft.operators.LmScorer]] — struct(n_tokens int, score_q16
  * bigint). The scorer travels with the serialized plan (codegen pins
  * it via `addReferenceObj`), which is why its size is loudly guarded
  * at collect time. */
case class LmScoreExpr(child: Expression,
    scorer: graft.operators.LmScorer) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("score_q16", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lm_score requires a string input, got ${child.dataType.simpleString}")
  override def nullSafeEval(s: Any): Any =
    scorer.scoreRow(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("lmScorer", scorer,
      classOf[graft.operators.LmScorer].getName)
    defineCodeGen(ctx, ev, c => s"$sc.scoreRow($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LmScoreExpr {
  def apply(text: Column, scorer: graft.operators.LmScorer): Column =
    ColumnBridge.column(LmScoreExpr(ColumnBridge.expression(text), scorer))
}
