package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond parquet: ORC, CSV, JSON-lines.
  * Each round-trips a frame with the types the engine's operators
  * care about (longs, doubles, strings, dates, nulls) and pins the
  * fidelity contract: ORC is schema-full like parquet; CSV and JSON
  * need an explicit read schema to come back type-identical (CSV has
  * no types at all, JSON has no integer width) — so the loaders here
  * always pass one, and the spec shows why.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
      (1L, "alpha", 1.5, "2024-01-02", Some(10L)),
      (2L, "beta, with comma", -2.25, "2024-06-30", None),
      (3L, "quote\"and\nnewline", 0.0, "2023-12-31", Some(-7L)))
    .toDF("id", "name", "score", "d", "opt")
    .withColumn("d", to_date($"d"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"fmt_$tag").toString + "/t"

  private def assertSame(
      a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    // names + types; nullability intentionally excluded — file
    // sources always read nullable regardless of writer-side flags
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(a) === shape(b), "schema fidelity")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("ORC round-trip: schema-full, value-identical") {
    val dir = tmp("orc")
    fixture.write.mode("overwrite").orc(dir)
    assertSame(fixture, spark.read.orc(dir))
  }

  test("CSV round-trip: explicit schema restores types through quoting/escapes") {
    val dir = tmp("csv")
    fixture.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("d", DateType),
      StructField("opt", LongType)))
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").csv(dir)
    assertSame(fixture, back)
    // and WITHOUT the schema the frame comes back stringly/inferred —
    // the reason every CSV loader in this engine takes one
    val inferred = spark.read.option("header", "true").csv(dir)
    assert(inferred.schema("id").dataType === StringType)
  }

  test("JSON-lines round-trip: explicit schema restores integer width and dates") {
    val dir = tmp("json")
    fixture.write.mode("overwrite").json(dir)
    val schema = fixture.schema
    assertSame(fixture, spark.read.schema(schema).json(dir))
    // inference widens: dates come back as strings, the documented trap
    val inferred = spark.read.json(dir)
    assert(inferred.schema("d").dataType === StringType)
  }
}
