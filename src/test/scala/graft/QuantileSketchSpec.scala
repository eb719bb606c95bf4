package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.map(i => (i, i.toDouble)).toDF("id", "v")

  private def sketchSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("sketch is a pure function of the multiset: any sharding merges to the single-pass sketch") {
    val data = rows(1L to 500L)
    val k = 32
    val single = sketchSet(
      QuantileSketch.sketchPartials(data, $"v", $"id", k))
    assert(single.size == k)
    // three disjoint shards, merged in two different tree shapes
    val shards = (0 to 2).map(m =>
      QuantileSketch.sketchPartials(data.filter($"id" % 3 === m), $"v", $"id", k))
    val mergedFlat = sketchSet(QuantileSketch.merge(k, shards: _*))
    val mergedTree = sketchSet(QuantileSketch.merge(k,
      QuantileSketch.merge(k, shards(2), shards(0)), shards(1)))
    assert(mergedFlat == single, "flat merge must equal the single pass")
    assert(mergedTree == single, "merge is order/tree-shape free")
    // re-merging a sketch with itself changes nothing (idempotent)
    val again = sketchSet(QuantileSketch.merge(k,
      QuantileSketch.merge(k, shards: _*), QuantileSketch.merge(k, shards: _*)))
    assert(again == single)
  }

  test("null/NaN values and null ids are excluded; corpus smaller than k keeps everything") {
    val df = Seq(
      (Some(1L), Some(1.0)), (Some(2L), Some(2.0)),
      (Some(3L), None), (Some(4L), Some(Double.NaN)),
      (None, Some(9.0)))
      .toDF("id", "v")
    val sk = QuantileSketch.sketchPartials(df, $"v", $"id", k = 100)
    assert(sk.count() == 2L, "only the two well-defined rows survive")
    assert(sk.select(sum($"v")).head().getDouble(0) == 3.0)
  }

  test("quantiles read the rank-max(1, ceil(p·n)) order statistic; n < k reported") {
    val df = rows(1L to 10L) // values 1..10, all kept (k > n)
    val sk = QuantileSketch.sketchPartials(df, $"v", $"id", k = 100)
    val q = QuantileSketch.quantiles(sk, Seq(0.01, 0.5, 0.99, 1.0))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(q.values.forall(_._2 == 10L), "n is the true sketch size, not k")
    assert(q(0.01) == ((1.0, 10L)), "rank floor: max(1, ceil(0.1)) = 1")
    assert(q(0.5) == ((5.0, 10L)), "p50 = value at rank 5")
    assert(q(0.99) == ((10.0, 10L)), "rank ceil(9.9) = 10")
    assert(q(1.0) == ((10.0, 10L)), "p100 = max")
  }

  test("bounded rank error: k=1024 sample of 10k puts p50 within the DKW band") {
    val df = rows(1L to 10000L)
    val sk = QuantileSketch.sketchPartials(df, $"v", $"id", k = 1024)
    val p50 = QuantileSketch.quantiles(sk, Seq(0.5)).head().getDouble(1)
    // DKW at k=1024, δ=1e-4: ε = sqrt(ln(2/δ)/2k) ≈ 0.070 rank error
    assert(math.abs(p50 - 5000.0) < 0.08 * 10000.0,
      s"p50 estimate $p50 outside the rank-error band")
  }

  test("sketchKs: disjoint sketches score D = 1; identical sketches score 0") {
    val a = QuantileSketch.sketchPartials(rows(1L to 100L), $"v", $"id", 64)
    val b = QuantileSketch.sketchPartials(
      rows(1L to 100L).select($"id" + 1000L as "id", $"v" + 1000.0 as "v"),
      $"v", $"id", 64)
    assert(QuantileSketch.sketchKs(a, b).head().getAs[Double]("ks_stat") == 1.0)
    assert(QuantileSketch.sketchKs(a, a).head().getAs[Double]("ks_stat") == 0.0)
  }

  test("streaming quantile sink: merged log equals the single-pass sketch of everything arrived") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_qsk").toString
    val (log, ckpt) = (s"$scratch/qsk", s"$scratch/ckpt")
    val k = 16

    val stream = MemoryStream[(Long, Double)]
    val sq = StreamingSketch.quantileSink(
      stream.toDF().toDF("id", "v"), col("v"), col("id"), k, log, ckpt)
    val batch1 = (1L to 120L).map(i => (i, i.toDouble))
    val batch2 = (121L to 200L).map(i => (i, i.toDouble))
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()

    val single = sketchSet(QuantileSketch.sketchPartials(
      (batch1 ++ batch2).toDF("id", "v"), $"v", $"id", k))
    assert(sketchSet(StreamingSketch.readQuantileSketch(spark, log, k)) == single,
      "the merged per-batch sketch log must equal the single-pass sketch")
    // and the quantile read works over the log end to end
    val p50 = StreamingSketch.readQuantiles(spark, log, k, Seq(0.5))
      .head().getDouble(1)
    assert(p50 >= 1.0 && p50 <= 200.0)
  }
}
