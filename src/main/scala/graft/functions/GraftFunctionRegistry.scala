package graft.functions

import org.apache.spark.sql.SparkSession

/** Optional SQL-surface registration (SURVEY.md §7.3): makes the
  * engine's functions callable from `spark.sql(...)` text, e.g.
  *
  * {{{
  *   GraftFunctionRegistry.registerAll(spark)
  *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT horizontal_stddev(c1, c2, c3), date_ordinal(d) FROM t")
  * }}}
  *
  * `vector_dot` binds the native Catalyst expression; the composed
  * functions register as SQL scalar UDFs (inlined into the plan at
  * analysis time — still fully codegen'd, no closure overhead). The
  * spec pins them value-equal to the Scala Column builders.
  */
object GraftFunctionRegistry {

  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDotProduct(exprs(0), exprs(1)), "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_text", exprs => NormalizeText(exprs(0)), "scala_udf")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compression_ratio", exprs => CompressionRatio(exprs(0)), "scala_udf")

    // pandas-std(axis=1) semantics: ddof=1, skipna (DCC:140)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION horizontal_stddev(
        |  x1 DOUBLE, x2 DOUBLE, x3 DOUBLE) RETURNS DOUBLE RETURN
        |CASE WHEN size(filter(array(x1, x2, x3), x -> x IS NOT NULL)) >= 2 THEN
        |  sqrt(greatest(
        |    (aggregate(filter(array(x1, x2, x3), x -> x IS NOT NULL), 0D, (a, x) -> a + x * x)
        |     - pow(aggregate(filter(array(x1, x2, x3), x -> x IS NOT NULL), 0D, (a, x) -> a + x), 2)
        |       / size(filter(array(x1, x2, x3), x -> x IS NOT NULL)))
        |    / (size(filter(array(x1, x2, x3), x -> x IS NOT NULL)) - 1), 0D))
        |END""".stripMargin)

    // proleptic-Gregorian toordinal (DCC:136-138)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION date_ordinal(d DATE)
        |RETURNS INT RETURN CAST(datediff(d, DATE '0001-01-01') + 1 AS INT)""".stripMargin)

    // media token costing (the q201/q203 rules) as SQL scalar
    // functions, so token expressions passed to CALL graft.mixture_plan
    // can price image/audio/video rows; negative inputs NULL out (the
    // Multimodal guard, stated identically here)
    val P = graft.operators.Multimodal.DefaultPatchSize
    val R = graft.operators.Multimodal.DefaultAudioTokensPerSecond
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION patch_tokens(
        |  w BIGINT, h BIGINT) RETURNS BIGINT RETURN
        |CASE WHEN w >= 0 AND h >= 0 THEN
        |  CAST(floor((w + ${P - 1}) / $P.0) * floor((h + ${P - 1}) / $P.0)
        |    + 1 AS BIGINT)
        |END""".stripMargin)

    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION audio_tokens(
        |  ms BIGINT) RETURNS BIGINT RETURN
        |CASE WHEN ms >= 0 THEN
        |  CAST(floor((ms * $R + 999) / 1000.0) AS BIGINT)
        |END""".stripMargin)

    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity(
        |  a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN
        |CASE WHEN aggregate(a, 0D, (acc, x) -> acc + x * x) > 0
        |      AND aggregate(b, 0D, (acc, x) -> acc + x * x) > 0 THEN
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
        |    / (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
        |       * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))
        |END""".stripMargin)
  }
}
