package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DistinctNgramHashes, Md5PrefixLong, MinhashFromBase, NgramMd5Hashes, SimhashFromHashesExpr, SortedIntersectCount, VectorDotProduct}
import graft.functions.DqFunctions

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions as SQL functions at session build time, so a cluster
  * enables the whole surface with configuration only —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * — no driver-side `registerAll` call required (that path,
  * [[graft.functions.GraftFunctionRegistry]], remains for notebook
  * sessions that already exist). Injection happens before analysis,
  * so the functions resolve in views, streaming queries, and
  * thriftserver SQL alike.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Foldable int/long argument (accepts any SQL integral literal).
    * Foldability is checked BEFORE eval: eval() on a column reference
    * throws an opaque unresolved/unsupported-operation error at
    * function-build time instead of the intended message.
    */
  private def foldedArg(e: Expression, what: String): Number = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be an integer literal, got expression ${e.sql}")
    e.eval() match {
      case n: Number => n
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
  }
  private def intArg(e: Expression, what: String): Int = foldedArg(e, what).intValue()
  private def longArg(e: Expression, what: String): Long = foldedArg(e, what).longValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL-callable check surface: `CALL graft.<check>(k => 'v', ...)`
    // — see graft.sql.GraftSqlParser / graft.sql.GraftChecks
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))

    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - double dot product of two numeric arrays"),
      (exprs: Seq[Expression]) => VectorDotProduct(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A ∩ B| for ascending-sorted bigint arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("distinct_ngram_hashes"),
      info("distinct_ngram_hashes",
        "distinct_ngram_hashes(text, n) - distinct n-gram XXH64 hashes, one pass"),
      (exprs: Seq[Expression]) => DistinctNgramHashes(exprs(0),
        intArg(exprs(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("md5_prefix_long"),
      info("md5_prefix_long",
        "md5_prefix_long(s, hexDigits[, mod]) - first hex digits of md5 as bigint, optionally mod"),
      (exprs: Seq[Expression]) => Md5PrefixLong(exprs(0),
        intArg(exprs(1), "hexDigits"),
        if (exprs.length > 2) longArg(exprs(2), "mod") else 0L)))

    ext.injectFunction((
      FunctionIdentifier("ngram_md5_hashes"),
      info("ngram_md5_hashes",
        "ngram_md5_hashes(text, n, hexDigits[, mod]) - md5-prefix hash per character n-gram window"),
      (exprs: Seq[Expression]) => NgramMd5Hashes(exprs(0),
        intArg(exprs(1), "n"),
        intArg(exprs(2), "hexDigits"),
        if (exprs.length > 3) longArg(exprs(3), "mod") else 0L)))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit simhash of a bigint token-hash array"),
      (exprs: Seq[Expression]) => SimhashFromHashesExpr(exprs(0))))

    ext.injectFunction((
      FunctionIdentifier("minhash64"),
      info("minhash64", "minhash64(baseHashes) - 64-component minhash signature"),
      (exprs: Seq[Expression]) => {
        val coeffs = DqFunctions.minhashCoeffs(64)
        MinhashFromBase(exprs(0), coeffs.map(_._1).toArray,
          coeffs.map(_._2).toArray, DqFunctions.MinhashPrime)
      }))

    // Real BPE tokenization (the embedded trained vocabulary; custom
    // merge tables go through the Scala API, which takes them per call)
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count",
        "bpe_token_count(text) - real BPE token count (embedded trained vocab)"),
      (exprs: Seq[Expression]) =>
        graft.functions.BpeTokenCount(exprs(0), graft.functions.BpeVocab.default)))

    ext.injectFunction((
      FunctionIdentifier("bpe_tokens"),
      info("bpe_tokens",
        "bpe_tokens(text) - BPE token sequence (embedded trained vocab)"),
      (exprs: Seq[Expression]) =>
        graft.functions.BpeTokens(exprs(0), graft.functions.BpeVocab.default)))

    ext.injectFunction((
      FunctionIdentifier("log2fp_q16"),
      info("log2fp_q16",
        "log2fp_q16(n) - exact fixed-point log2(n)*65536 (integer dag, engine-portable)"),
      (exprs: Seq[Expression]) => graft.functions.Log2FpQ16(exprs(0))))
  }
}
