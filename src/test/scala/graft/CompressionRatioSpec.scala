package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CompressionRatio.compressionRatio

/** compression_ratio — the deflate boilerplate signal. Deflate bytes
  * are a function of the zlib build, so these pin ORDERING properties
  * (template ≪ prose ≪ random), run determinism, eval==codegen, and
  * edge handling — never exact stream bytes.
  */
class CompressionRatioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratio(s: String): Double =
    Seq(Tuple1(s)).toDF("t").select(compressionRatio($"t")).head().getDouble(0)

  test("template text compresses far below natural prose, prose below noise") {
    val template = "click here to subscribe now! " * 200
    val prose = "the quick brown fox jumps over the lazy dog while a calm " +
      "river flows past an old stone bridge and the quiet village sleeps " +
      "under a wide summer sky full of slow white clouds drifting east " * 3
    // hex of distinct hashes ≈ incompressible high-entropy text
    val noise = (0 until 200).map(i =>
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString).mkString(" ")
    val (rt, rp, rn) = (ratio(template), ratio(prose), ratio(noise))
    assert(rt < 0.1, s"template ratio $rt")
    assert(rp > rt && rp < rn, s"ordering violated: $rt < $rp < $rn")
    assert(rn > 0.4, s"noise ratio $rn")
  }

  test("edges: empty is 1.0, null propagates, ratio is positive and bounded") {
    assert(ratio("") == 1.0)
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(compressionRatio($"t")).head()
    assert(r.isNullAt(0))
    // deflate overhead can push tiny inputs above 1.0, never wildly
    val tiny = ratio("a")
    assert(tiny > 0.0 && tiny < 20.0)
  }

  test("deterministic across evaluations; interpreted eval equals codegen") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(100)
    val once = docs.select($"doc_id", compressionRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val again = docs.select($"doc_id", compressionRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == again)
    docs.select($"doc_id", $"text").collect().foreach { row =>
      val interp = graft.functions.CompressionRatio.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(row.getString(1)))
      assert(once(row.getLong(0)) == interp)
    }
  }

  test("SQL registry: compression_ratio and normalize_text callable from SQL text") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    val r = spark.sql(
      "SELECT compression_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS cr, " +
      "normalize_text('  Hello\t WORLD  ') AS nt").head()
    assert(r.getDouble(0) < 0.5)
    assert(r.getString(1) == "hello world")
  }
}
