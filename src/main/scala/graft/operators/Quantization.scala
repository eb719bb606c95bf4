package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: per-dimension affine int8 codes for
  * 100 TB-scale vector storage (4× smaller than float32 at rest;
  * the codes column is what a vector-serving tier ships and what
  * IVF cell files store).
  *
  * Per-channel (per-dimension) min/max quantization: dimension d maps
  * x → round((x − min_d) / scale_d) − 128 with
  * scale_d = (max_d − min_d)/255, clamped to [−128, 127] — the
  * standard symmetric-range affine scheme. The dimension stats are a
  * ONE-ROW table (dim-sized, config-scale) computed in a single
  * posexplode + 64-group aggregate pass and broadcast onto the
  * corpus; quantization itself is a pure projection.
  *
  * All arithmetic is deterministic and engine-portable: half-even
  * rounding (bround ↔ round_even), strict left-fold error sums, and
  * float32 → float64 exact widening — the reconstruction-error
  * report is oracle hash-checkable (q56).
  */
object Quantization {

  /** One row: (mins ARRAY<DOUBLE>, scales ARRAY<DOUBLE>) ordered by
    * dimension. The collect_list is dim-sized (not data-sized); the
    * per-dimension minima/maxima aggregate map-side first.
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(transform(col(vecCol), x => x.cast("double"))))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx")))).as("s"))
      .select(
        transform(col("s"), x => x.getField("mn")).as("mins"),
        transform(col("s"), x => (x.getField("mx") - x.getField("mn")) / lit(255.0))
          .as("scales"))

  /** (mn, scale) pairs zipped for element-wise lambdas. */
  private def msPairs: Column =
    zip_with(col("mins"), col("scales"), (m, s) => struct(m.as("mn"), s.as("sc")))

  private def clampedLevel(x: Column, ms: Column): Column =
    least(greatest(bround((x - ms.getField("mn")) / ms.getField("sc")), lit(0)), lit(255))

  /** (id, codes ARRAY<TINYINT>): the stored representation. A
    * constant dimension (scale 0) codes to −128 and reconstructs to
    * its constant exactly.
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.crossJoin(broadcast(dimStats(df, vecCol)))
      .select(col(idCol),
        zip_with(transform(col(vecCol), x => x.cast("double")), msPairs,
          (x, ms) => when(ms.getField("sc") > 0,
              clampedLevel(x, ms) - lit(128))
            .otherwise(lit(-128)).cast("tinyint")).as("codes"))

  /** Per-vector reconstruction error of the int8 codes:
    * (id, max_abs_err, mean_abs_err). The error arithmetic mirrors
    * decode-of-encode exactly (including the −128/+128 shift), so
    * it equals comparing against [[dequantize]] output.
    */
  def reconstructionReport(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame =
    df.crossJoin(broadcast(dimStats(df, vecCol)))
      .select(col(idCol),
        zip_with(transform(col(vecCol), x => x.cast("double")), msPairs,
          (x, ms) => when(ms.getField("sc") > 0,
              abs(x - (ms.getField("mn") +
                (clampedLevel(x, ms) - lit(128) + lit(128)) * ms.getField("sc"))))
            .otherwise(lit(0.0))).as("errs"))
      .select(col(idCol),
        array_max(col("errs")).as("max_abs_err"),
        (aggregate(col("errs"), lit(0.0), (a, b) => a + b) / lit(dim.toDouble))
          .as("mean_abs_err"))

  /** (id, vec ARRAY<DOUBLE>): decode int8 codes back with the same
    * stats row used to encode.
    */
  def dequantize(codes: DataFrame, stats: DataFrame, idCol: String): DataFrame =
    codes.crossJoin(broadcast(stats))
      .select(col(idCol),
        zip_with(col("codes"), msPairs,
          (q, ms) => ms.getField("mn") +
            (q.cast("double") + lit(128.0)) * ms.getField("sc")).as("vec"))
}
