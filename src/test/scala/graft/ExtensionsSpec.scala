package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Config-only deployment path: `spark.sql.extensions=
  * graft.GraftExtensions` must expose the native expressions to SQL
  * with no driver-side registration call.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injection exposes the native functions to SQL") {
    val base = TestSpark.spark // shared context must already exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions=graft.GraftExtensions` is a STATIC conf —
    // read from the SparkContext conf at first-session build (i.e. at
    // spark-submit time on a real cluster). With the suite's context
    // already running, the builder's withExtensions hook is the same
    // injection path, exercised in-JVM:
    val ext = SparkSession.builder()
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate() // fresh session over the SAME SparkContext
    try {
      val r = ext.sql(
        """SELECT
          |  vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c,
          |  simhash64(array(7L)) AS s,
          |  size(minhash64(array(123L))) AS k,
          |  size(distinct_ngram_hashes('abcab', 3)) AS g,
          |  md5_prefix_long('abc', 8) AS m,
          |  size(ngram_md5_hashes('abcd', 3, 8)) AS ng,
          |  bpe_token_count('the fast scan') AS bc,
          |  bpe_tokens('spark') AS bt,
          |  log2fp_q16(1000L) AS lq""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == 2L)
      assert(r.getLong(2) == 7L, "single token hash: its own bits win every vote")
      assert(r.getInt(3) == 64)
      assert(r.getInt(4) == 3, "abc, bca, cab — all distinct trigrams of 'abcab'")
      // 0x90015098 = first 8 hex digits of md5('abc')
      assert(r.getLong(5) == 0x90015098L)
      assert(r.getInt(6) == 2, "two trigram windows in 'abcd'")
      assert(r.getInt(7) == new graft.functions.BpeEncoder(
        graft.functions.BpeVocab.default).encode("the fast scan").length)
      assert(r.getSeq[String](8) == new graft.functions.BpeEncoder(
        graft.functions.BpeVocab.default).encode("spark").toSeq)
      assert(r.getLong(9) == 653117L)
    } finally {
      // never ext.stop() — it shares the suite-wide SparkContext
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
