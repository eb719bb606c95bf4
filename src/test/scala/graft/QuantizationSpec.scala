package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantization

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codes are genuine int8 and cover the range on the corpus") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val codes = Quantization.quantize(emb, "vec_id", "embedding")
    assert(codes.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true))
    val mm = codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head()
    // per-dimension min maps to -128 and max to 127 by construction
    assert(mm.getByte(0) == -128 && mm.getByte(1) == 127)
  }

  test("reconstruction report equals explicit decode-of-encode comparison") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val report = Quantization.reconstructionReport(emb, "vec_id", "embedding", 64)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val stats = Quantization.dimStats(emb, "embedding")
    val decoded = Quantization.dequantize(
      Quantization.quantize(emb, "vec_id", "embedding"), stats, "vec_id")
    val explicitErr = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(decoded, "vec_id")
      .select(col("vec_id"),
        zip_with(col("v"), col("vec"), (a, b) => abs(a - b)).as("errs"))
      .select(col("vec_id"), array_max(col("errs")).as("mx"),
        (aggregate(col("errs"), lit(0.0), (a, b) => a + b) / lit(64.0)).as("mean"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(report.keySet == explicitErr.keySet)
    report.foreach { case (id, (mx, mean)) =>
      assert(mx == explicitErr(id)._1 && mean == explicitErr(id)._2,
        s"vec $id: report ($mx,$mean) != explicit ${explicitErr(id)}")
    }
  }

  test("error bounded by half a quantization step per dimension") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val maxScale = Quantization.dimStats(emb, "embedding")
      .select(array_max(col("scales"))).head().getDouble(0)
    val worst = Quantization.reconstructionReport(emb, "vec_id", "embedding", 64)
      .agg(max(col("max_abs_err"))).head().getDouble(0)
    assert(worst <= maxScale / 2.0 + 1e-12,
      s"max err $worst exceeds half-step ${maxScale / 2.0}")
  }

  test("constant dimensions reconstruct exactly") {
    val df = Seq(
      (0L, Array(1.0f, 5.0f, -2.0f)),
      (1L, Array(1.0f, 7.0f, -2.0f)),
      (2L, Array(1.0f, 6.0f, -2.0f))
    ).toDF("vec_id", "embedding")
    val rep = Quantization.reconstructionReport(df, "vec_id", "embedding", 3)
      .collect()
    // dims 0 and 2 are constant (scale 0) → zero error there; dim 1
    // spans [5,7] and its endpoints land exactly on code boundaries
    rep.foreach { r =>
      assert(r.getDouble(1) <= (7.0 - 5.0) / 255.0 / 2.0 + 1e-12)
    }
  }
}
