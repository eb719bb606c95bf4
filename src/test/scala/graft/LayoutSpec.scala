package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Provenance}

/** Z-order clustering: Morton-code correctness and the actual
  * data-skipping payoff — a Z-ordered layout prunes files on BOTH
  * dimensions, a linear layout only on its sort key.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }

  test("zorder2 matches the reference Morton interleave across the coordinate range") {
    val coords = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      (2147483647L, 0L), (0L, 2147483647L), (2147483647L, 2147483647L))
    val out = coords.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorder2 rejects out-of-range coordinates loudly") {
    val bad = Seq((-1L, 0L)).toDF("x", "y")
    val e = intercept[Exception] {
      bad.select(Layout.zorder2(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.contains("zorder2 coordinate out of"))
  }

  test("zorder2 is monotone within a quadrant (locality property)") {
    // within the same power-of-two cell, growing both coordinates
    // grows the code; distinct pairs get distinct codes
    val pairs = for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y)
    val codes = pairs.toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(codes.distinct.length === pairs.length, "Morton codes must be injective")
    assert(codes.max === mortonRef(31L, 31L))
  }

  test("Z-ordered layout prunes files on BOTH dimensions; linear layout only on its key") {
    // 32×32 grid, one row per cell; 16 files either way
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val base = s"target/layout/pid-${ProcessHandle.current().pid()}"
    val zDir = s"$base/zorder"
    val linDir = s"$base/linear"
    Layout.writeClustered(grid, zDir, Layout.zorder2(col("x"), col("y")), 16)
    Layout.writeClustered(grid, linDir, col("x"), 16)

    def survivors(dir: String, colName: String, v: Long): Long = {
      val manifest = Provenance.fileManifest(spark.read.parquet(dir), Seq("x", "y"))
      Provenance.filesPossiblyContaining(manifest, colName, lit(v)).count()
    }
    val nFiles = Provenance
      .fileManifest(spark.read.parquet(zDir), Seq("x")).count()
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")

    // linear-by-x: x-point prunes hard, y-point prunes NOTHING
    assert(survivors(linDir, "x", 7L) <= 2)
    assert(survivors(linDir, "y", 7L) === nFiles,
      "a linear layout cannot skip on the secondary dimension")
    // z-order: BOTH dimensions prune to a strict subset
    val zx = survivors(zDir, "x", 7L)
    val zy = survivors(zDir, "y", 7L)
    assert(zx <= nFiles / 2, s"x-point should skip at least half the z-ordered files, survived $zx/$nFiles")
    assert(zy <= nFiles / 2, s"y-point should skip at least half the z-ordered files, survived $zy/$nFiles")
  }

  test("pruningEstimate: clustered layout predicts hard skips; estimate is a sound upper bound") {
    val rows = (0L until 1024L).map(i => Tuple1(i)).toDF("v")
    val base = s"target/layout/pid-${ProcessHandle.current().pid()}"
    val cDir = s"$base/prune_clustered"
    Layout.writeClustered(rows, cDir, col("v"), 16)
    val manifest = Provenance.fileManifest(spark.read.parquet(cDir), Seq("v"))
    val est = Provenance.pruningEstimate(manifest, "v", lit(100L), lit(163L)).head()
    assert(est.getLong(0) == 16L, "16-file layout")
    // a 64-value range over 64-row files touches at most 3 envelopes
    assert(est.getLong(1) <= 3L,
      s"clustered layout must localize the range, scanned ${est.getLong(1)} files")
    assert(est.getLong(2) == 1024L)
    // soundness: the estimate upper-bounds the true matching rows
    val truth = spark.read.parquet(cDir)
      .filter(col("v") >= 100L && col("v") <= 163L).count()
    assert(truth == 64L && est.getLong(3) >= truth)
    assert(est.getDouble(4) == 1.0 - est.getLong(1).toDouble / 16.0)
    assert(est.getDouble(5) == 1.0 - est.getLong(3).toDouble / 1024.0)
    // an empty range (hi < lo) scans nothing
    val none = Provenance.pruningEstimate(manifest, "v", lit(5000L), lit(6000L)).head()
    assert(none.getLong(1) == 0L && none.getDouble(4) == 1.0)
  }
}
